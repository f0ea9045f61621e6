"""Fused SGRAF-SGR *eval* kernel: alignment + graph reasoning in one grid.

Reference semantics: ref itr/modalmodule/Fusionmodule.py:406-451 (per-pair
similarity), :564-597 (GraphReasoning steps), :632-664 (SCAN_attention) —
the full per-(caption, image) SGR score, minus the final sim_eval_w Linear
(left in XLA: it is one (rows, S) x (S, 1) matmul).

Why a separate eval kernel: at eval the two-kernel train path
(itrx/ops/pallas/sgraf_align.py + sgr.py) still round-trips the
(C*Ni, L+1, 256) node tensor through HBM four times per chunk — the
alignment write, the XLA concat with the global node, the SGR read, and
the SGR kernel's per-step saves (needed only by the backward).  A 1K-test
eval scores ~5M pairs, so those intermediates total hundreds of GB of HBM
traffic.  Eval needs no VJP, so one grid step here runs the whole chain —
alignment, node assembly, every reasoning step — on a (caption-block,
image) pair in VMEM and writes only the final node-0 vector (bc * 256
floats) to HBM.

The last reasoning step is additionally trimmed to node 0: callers use
only `sim_emb[:, 0, :]` (itrx/models/sgraf.py), and step outputs never
feed anything else at eval, so the final step computes one query row and
one context row instead of L+1 (the key/value projections still cover all
nodes).  Row-0 of a matmul is the same numbers as the full matmul's row 0,
so this is exact, not an approximation.

Matmul precision follows the production sim_bf16 path: bf16 operands with
fp32 accumulation; fp32 operands use HIGHEST for interpret-mode parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sgraf_align import _chain_fwd, _dot, _pick_block_c, _prep, _vmem_limit

NEG_INF = -1e18


def _bdot(a, b, contract, bf16, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, batch),
        precision=None if bf16 else jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _sgr_step_full(s, nmask, wq, bq, wk, bk, wg, bg, bf16):
    """One full GraphReasoning step on (rb, n, d) nodes (itrx XLA path:
    models/sgraf.py GraphReasoning; kernel twin: ops/pallas/sgr.py)."""
    rb, n, d = s.shape
    s2 = s.reshape(rb * n, d)
    q = (_dot(s2, wq, bf16) + bq).astype(s.dtype).reshape(rb, n, d)
    k = (_dot(s2, wk, bf16) + bk).astype(s.dtype).reshape(rb, n, d)
    e = _bdot(q, k, ((2,), (2,)), bf16)  # (rb, n, n) fp32
    e = jnp.where(nmask[:, None, :] > 0, e, NEG_INF)
    a = jax.nn.softmax(e, axis=-1)
    ctx = _bdot(a.astype(s.dtype), s, ((2,), (1,)), bf16)
    g = _dot(ctx.astype(s.dtype).reshape(rb * n, d), wg, bf16) + bg
    return jnp.maximum(g, 0.0).astype(s.dtype).reshape(rb, n, d)


def _sgr_step_node0(s, nmask, wq, bq, wk, bk, wg, bg, bf16):
    """Final step trimmed to node 0: one query/context row per pair.

    The one-row edge/context products run on the VPU as fp32
    broadcast-multiply-reduces instead of singleton batched dots:
    Mosaic's layout inference rejects the (rb, n) -> (rb, 1, n) shape
    cast the batched-dot lift needs when n is not lane-aligned
    ("infer-vector-layout: unsupported shape cast", n = L+8 = 24 at
    production bucket shapes), and at one query row the MXU is ~99%
    padding anyway.  The fp32 products equal the MXU path's bf16-operand /
    fp32-accumulate results within bf16 operand-rounding error (strictly
    MORE precise — operands are no longer rounded to bf16 first — so
    expect ulp-level diffs, not bit parity; tests use tolerances)."""
    rb, n, d = s.shape
    s2 = s.reshape(rb * n, d)
    k = (_dot(s2, wk, bf16) + bk).astype(s.dtype).reshape(rb, n, d)
    q0 = (_dot(s[:, 0, :], wq, bf16) + bq).astype(s.dtype)  # (rb, d)
    e = jnp.sum(
        k.astype(jnp.float32) * q0[:, None, :].astype(jnp.float32), axis=2
    )  # (rb, n) = edge row 0
    e = jnp.where(nmask > 0, e, NEG_INF)
    a = jax.nn.softmax(e, axis=-1)
    ctx = jnp.sum(s.astype(jnp.float32) * a[:, :, None], axis=1)  # (rb, d)
    g = _dot(ctx.astype(s.dtype), wg, bf16) + bg
    return jnp.maximum(g, 0.0)  # (rb, d) fp32


def _assemble_nodes(cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref,
                    glo_ref, *, bc, l, bf16):
    """Alignment chain + node assembly: (bc, L+8, S) padded node tensor and
    its (bc, L+8) mask, all in VMEM."""
    *_, y, yinv = _chain_fwd(
        cap_ref[:], imgr_ref[0], mask_ref[:], colm_ref[:],
        w_ref[:], b_ref[:], bc=bc, l=l, bf16=bf16,
    )
    s_dim = y.shape[1]
    dt = jnp.bfloat16 if bf16 else jnp.float32
    sim_loc = (y * yinv).astype(dt).reshape(bc, l, s_dim)
    glo = glo_ref[:].reshape(bc, 1, s_dim).astype(dt)
    # nodes padded to a sublane multiple; padded nodes masked out
    nodes = jnp.concatenate(
        [glo, sim_loc, jnp.zeros((bc, 7, s_dim), dt)], axis=1
    )
    m = mask_ref[:].reshape(bc, l)
    nmask = jnp.concatenate(
        [jnp.ones((bc, 1), jnp.float32), m, jnp.zeros((bc, 7), jnp.float32)],
        axis=1,
    )
    return nodes, nmask


def _eval_kernel(cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref,
                 glo_ref, wq_ref, bq_ref, wk_ref, bk_ref, wg_ref, bg_ref,
                 out_ref, *, bc, l, steps, bf16):
    nodes, nmask = _assemble_nodes(
        cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref, glo_ref,
        bc=bc, l=l, bf16=bf16,
    )
    s_dim = nodes.shape[2]
    for i in range(steps - 1):
        nodes = _sgr_step_full(
            nodes, nmask, wq_ref[i], bq_ref[i], wk_ref[i], bk_ref[i],
            wg_ref[i], bg_ref[i], bf16,
        )
    out0 = _sgr_step_node0(
        nodes, nmask, wq_ref[steps - 1], bq_ref[steps - 1],
        wk_ref[steps - 1], bk_ref[steps - 1], wg_ref[steps - 1],
        bg_ref[steps - 1], bf16,
    )
    out_ref[:] = out0.reshape(bc, 1, 1, s_dim).astype(out_ref.dtype)


def _eval_saf_kernel(cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref,
                     glo_ref, awf_ref, abf_ref, out_ref, *, bc, l, bf16):
    """SAF filtration (ref Fusionmodule.py:600-629, eval mode): the
    single-channel BatchNorm's running-stat affine is folded into the
    attention Linear by the caller (awf/abf), so the kernel runs
    sigmoid-gated l1-norm pooling over the nodes in fp32."""
    nodes, nmask = _assemble_nodes(
        cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref, glo_ref,
        bc=bc, l=l, bf16=bf16,
    )
    s_dim = nodes.shape[2]
    nf = nodes.astype(jnp.float32)
    attn = jnp.sum(nf * awf_ref[0][None, None, :], axis=2) + abf_ref[0, 0]
    attn = jax.nn.sigmoid(attn) * nmask  # (bc, n)
    attn = attn / (jnp.sum(jnp.abs(attn), axis=1, keepdims=True) + 1e-8)
    n = nodes.shape[1]
    # rank-3 lift: Mosaic cannot parse batched dots with a rank-2 operand
    attn3 = (attn.astype(nodes.dtype) if bf16 else attn).reshape(bc, 1, n)
    saf = _bdot(attn3, nodes, bf16=bf16, contract=((2,), (1,)))[:, 0]
    sq = jnp.sum(saf * saf, axis=1, keepdims=True)
    out = saf / (jnp.sqrt(jnp.maximum(sq, 1e-16)) + 1e-8)
    out_ref[:] = out.reshape(bc, 1, 1, s_dim).astype(out_ref.dtype)


def _eval_vmem(bc, l, d, s_dim, rp, steps):
    base = _vmem_limit(bc, l, d, s_dim, rp, bwd=False)
    n = l + 8
    sgr = 8 * bc * n * s_dim * 4 + steps * 3 * s_dim * s_dim * 6
    sgr += 2 * bc * n * n * 4  # edge + softmax
    return int(min(base + sgr * 1.25, 100 << 20))


def sgraf_eval_score(cap, mask, img, w, b, glo, wq, bq, wk, bk, wg, bg,
                     block_c: int | None = None, interpret: bool = False):
    """Fused eval-time SGR similarity vectors.

    cap (Nc, L, D) word embeddings (L % 8 == 0); mask (Nc, L);
    img (Ni, R, D); w (D, S) / b (S,) — sim_tranloc_w; glo (Nc, Ni, S) —
    the XLA-computed global-alignment node (sim_tranglo_w output);
    wq/wk/wg (steps, S, S), bq/bk/bg (steps, S) — per-step GraphReasoning
    Linears in flax (in, out) layout.  Returns (Nc, Ni, S): the node-0
    vector after all reasoning steps (feed to sim_eval_w + sigmoid).
    """
    nc, l, d = cap.shape
    ni = img.shape[0]
    s_dim = w.shape[1]
    steps = wq.shape[0]
    bf16 = cap.dtype == jnp.bfloat16
    if block_c is None:
        block_c = _pick_block_c(nc, l)
    cap2d, maskf, imgr, colm, nc_pad, rp = _prep(cap, mask, img, block_c)
    wk_ = w.astype(cap.dtype)
    bk_ = b.reshape(1, s_dim).astype(jnp.float32)
    dt = cap.dtype
    glo4 = glo.astype(dt).reshape(nc, ni, 1, s_dim)
    if nc_pad != nc:
        glo4 = jnp.pad(glo4, ((0, nc_pad - nc), (0, 0), (0, 0), (0, 0)))
    bcl = block_c * l
    grid = (nc_pad // block_c, ni)

    wspec = pl.BlockSpec((steps, s_dim, s_dim), lambda c, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((steps, s_dim), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_eval_kernel, bc=block_c, l=l, steps=steps,
                          bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bcl, d), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, d), lambda c, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bcl, 1), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, s_dim), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_dim), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, 1, 1, s_dim), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, bspec, wspec, bspec, wspec, bspec,
        ],
        out_specs=pl.BlockSpec(
            (block_c, 1, 1, s_dim), lambda c, i: (c, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nc_pad, ni, 1, s_dim), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_eval_vmem(block_c, l, d, s_dim, rp, steps)
        ),
    )(
        cap2d, imgr, maskf, colm, wk_, bk_, glo4,
        wq.astype(dt), bq.astype(jnp.float32),
        wk.astype(dt), bk.astype(jnp.float32),
        wg.astype(dt), bg.astype(jnp.float32),
    )
    return out[:nc, :, 0, :]


def sgraf_eval_saf_score(cap, mask, img, w, b, glo, awf, abf,
                         block_c: int | None = None,
                         interpret: bool = False):
    """Fused eval-time SAF similarity vectors.

    Same alignment inputs as `sgraf_eval_score`; awf (1, S) and abf (1, S)
    are the SAF attention Linear's weight/bias with the eval-mode
    BatchNorm1d(1) affine pre-folded by the caller:
    awf = kernel.T * scale/sqrt(var+eps), abf = bias_lin * that + shifted
    BN bias (scalar, broadcast over lanes).  Returns (Nc, Ni, S).
    """
    nc, l, d = cap.shape
    ni = img.shape[0]
    s_dim = w.shape[1]
    bf16 = cap.dtype == jnp.bfloat16
    if block_c is None:
        block_c = _pick_block_c(nc, l)
    cap2d, maskf, imgr, colm, nc_pad, rp = _prep(cap, mask, img, block_c)
    wk_ = w.astype(cap.dtype)
    bk_ = b.reshape(1, s_dim).astype(jnp.float32)
    dt = cap.dtype
    glo4 = glo.astype(dt).reshape(nc, ni, 1, s_dim)
    if nc_pad != nc:
        glo4 = jnp.pad(glo4, ((0, nc_pad - nc), (0, 0), (0, 0), (0, 0)))
    bcl = block_c * l
    grid = (nc_pad // block_c, ni)

    out = pl.pallas_call(
        functools.partial(_eval_saf_kernel, bc=block_c, l=l, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bcl, d), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, d), lambda c, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bcl, 1), lambda c, i: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, s_dim), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_dim), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, 1, 1, s_dim), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_dim), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_dim), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_c, 1, 1, s_dim), lambda c, i: (c, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nc_pad, ni, 1, s_dim), dt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_eval_vmem(block_c, l, d, s_dim, rp, 1)
        ),
    )(
        cap2d, imgr, maskf, colm, wk_, bk_, glo4,
        awf.astype(jnp.float32), abf.astype(jnp.float32),
    )
    return out[:nc, :, 0, :]


def sgraf_eval_saf_auto(cap, mask, img, glo, w, b, awf, abf,
                        block_c: int | None = None):
    """Routing entry for the SAF eval kernel (mirrors sgraf_eval_auto)."""
    from . import interpret_mode, record_dispatch, shard_mesh

    interpret = interpret_mode()
    mesh = shard_mesh()
    if mesh is None:
        record_dispatch("sgraf_eval_saf_fused")
        return sgraf_eval_saf_score(cap, mask, img, w, b, glo, awf, abf,
                                    block_c, interpret)

    from jax.sharding import PartitionSpec as P

    record_dispatch("sgraf_eval_saf_fused_sharded")
    ndp = mesh.shape["dp"]
    ni = img.shape[0]
    ni_pad = ((ni + ndp - 1) // ndp) * ndp
    if ni_pad != ni:
        img = jnp.pad(img, ((0, ni_pad - ni), (0, 0), (0, 0)))
        glo = jnp.pad(glo, ((0, 0), (0, ni_pad - ni), (0, 0)))

    out = jax.shard_map(
        lambda c_, m_, i_, g_, w_, b_, aw_, ab_: sgraf_eval_saf_score(
            c_, m_, i_, w_, b_, g_, aw_, ab_, block_c, interpret
        ),
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P(None, "dp"), P(), P(), P(), P()),
        out_specs=P(None, "dp"),
        check_vma=False,
    )(cap, mask, img, glo, w, b, awf, abf)
    return out[:, :ni]


def sgraf_eval_auto(cap, mask, img, glo, w, b, wq, bq, wk, bk, wg, bg,
                    block_c: int | None = None):
    """Routing entry: resolves interpret mode; shard_maps the image axis
    when a mesh is active (the grid's image axis is embarrassingly
    parallel, matching the alignment kernel's sharding).  glo arrives
    (Nc, Ni, S), sharded on axis 1 with the images.
    """
    from . import interpret_mode, record_dispatch, shard_mesh

    interpret = interpret_mode()
    mesh = shard_mesh()
    if mesh is None:
        record_dispatch("sgraf_eval_fused")
        return sgraf_eval_score(
            cap, mask, img, w, b, glo, wq, bq, wk, bk, wg, bg,
            block_c, interpret,
        )

    from jax.sharding import PartitionSpec as P

    record_dispatch("sgraf_eval_fused_sharded")
    ndp = mesh.shape["dp"]
    ni = img.shape[0]
    ni_pad = ((ni + ndp - 1) // ndp) * ndp
    if ni_pad != ni:
        img = jnp.pad(img, ((0, ni_pad - ni), (0, 0), (0, 0)))
        glo = jnp.pad(glo, ((0, 0), (0, ni_pad - ni), (0, 0)))

    out = jax.shard_map(
        lambda c_, m_, i_, g_, *w_: sgraf_eval_score(
            c_, m_, i_, w_[0], w_[1], g_, *w_[2:], block_c, interpret
        ),
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P(None, "dp"),
                  P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(None, "dp"),
        check_vma=False,
    )(cap, mask, img, glo, w, b, wq, bq, wk, bk, wg, bg)
    return out[:, :ni]
