"""Fused SGRAF *eval* kernel: global node + alignment + graph reasoning +
score epilogue in one grid.

Reference semantics: ref itr/modalmodule/Fusionmodule.py:406-451 (per-pair
similarity: sim_glo + sim_loc node set, reasoning, sim_eval_w + sigmoid),
:564-597 (GraphReasoning steps), :600-629 (SAF filtration), :632-664
(SCAN_attention).

Why a separate eval kernel: at eval the two-kernel train path
(itrx/ops/pallas/sgraf_align.py + sgr.py) still round-trips the
(C*Ni, L+1, 256) node tensor through HBM four times per chunk — the
alignment write, the XLA concat with the global node, the SGR read, and
the SGR kernel's per-step saves (needed only by the backward).  A 1K-test
eval scores ~5M pairs, so those intermediates total hundreds of GB of HBM
traffic.  Eval needs no VJP, so one grid step here runs the whole chain —
global-alignment node, local alignment, every reasoning step, the final
sim_eval_w Linear + sigmoid — on a (caption-block, image) pair in VMEM and
writes only the final per-pair score to HBM.  Round-4 profiling showed the
kernel at 91% of eval wall-clock, so round 5 cut its FLOPs two ways
(all exact math, not approximations):

1. **q/k fold.**  The reasoning edge logits e_ij = q_i . k_j with
   q = S Wq + bq, k = S Wk + bk expand to
   S (Wq Wk^T) S^T + (S Wq bk)_i + (S Wk bq)_j + bq.bk.  Softmax over j is
   invariant to per-row(i) constants, so the (S Wq bk)_i and bq.bk terms
   drop entirely; M = Wq Wk^T and v = Wk bq are formed once per eval by the
   wrapper (S x S, trivial).  Each full step then runs ONE node projection
   (S M) instead of the reference's q/k pair, and the node-0-trimmed last
   step needs no projection of the key set at all — together ~25% of the
   reasoning FLOPs.  (Numerics: same bf16-operand / fp32-accumulate dots,
   associated differently, so results agree to bf16 rounding, not bitwise.)

2. **In-kernel global node + epilogue.**  sim_glo
   (ref :427, l2norm(Linear((img_glo - cap_glo)^2))) is computed from the
   raw (Nc, D)/(Ni, D) global embeddings inside the grid step — the
   (Nc, Ni, S) tensor the XLA glue used to stream in (2.6GB/eval at
   f30k-1K) never exists — and the final sim_eval_w Linear + sigmoid
   (ref :433) runs as a VPU epilogue, shrinking the kernel output from
   (Nc, Ni, S) vectors (2.6GB) to per-pair fp32 scores.

The last reasoning step is additionally trimmed to node 0: callers use
only the global node's vector (ref :433), and step outputs never feed
anything else at eval, so the final step computes one query row per pair.
Row 0 of the full edge/context product is the same numbers as the trimmed
product, so this is exact, not an approximation.

Matmul precision follows the production sim_bf16 path: bf16 operands with
fp32 accumulation; fp32 operands use HIGHEST for interpret-mode parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sgraf_align import EPS, _chain_fwd, _dot, _pick_block_c, _prep, _vmem_limit

NEG_INF = -1e18


def _bdot(a, b, contract, bf16, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, batch),
        precision=None if bf16 else jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _assemble_nodes(cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref,
                    gloc_ref, imgglo_ref, gw_ref, gb_ref, *, bc, l, bf16):
    """Alignment chain + in-kernel global node + node assembly:
    (bc, L+8, S) padded node tensor and its (bc, L+8) mask, all in VMEM.

    The concatenated sublane-padded layout is deliberate: a round-5
    split-node variant (global row off the MXU, no zero-pad nodes) cut
    ~9% of the FLOPs but ran 3.3x SLOWER on chip — the dozen
    low-lane-utilization VPU broadcast/reduce passes it needs cost far
    more than the dense MXU work they save.  Keep the reasoning on fat
    matmuls."""
    *_, y, yinv = _chain_fwd(
        cap_ref[:], imgr_ref[0], mask_ref[:], colm_ref[:],
        w_ref[:], b_ref[:], bc=bc, l=l, bf16=bf16,
    )
    s_dim = y.shape[1]
    dt = jnp.bfloat16 if bf16 else jnp.float32
    sim_loc = (y * yinv).astype(dt).reshape(bc, l, s_dim)
    # global-alignment node (ref Fusionmodule.py:427-432): squared diff of
    # the global embeddings -> sim_tranglo_w Linear -> l2norm, per pair
    diff = gloc_ref[:, 0, :].astype(dt) - imgglo_ref[0, 0].astype(dt)[None, :]
    gy = _dot(diff * diff, gw_ref[:], bf16) + gb_ref[:]
    gsq = jnp.sum(gy * gy, axis=1, keepdims=True)
    ginv = 1.0 / (jnp.sqrt(jnp.maximum(gsq, 0.0)) + EPS)
    glo = (gy * ginv).astype(dt).reshape(bc, 1, s_dim)
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


def _sgr_step_full(s, nmask, m, vv, wg, bg, bf16):
    """One full GraphReasoning step on (rb, n, d) nodes (itrx XLA path:
    models/sgraf.py GraphReasoning; kernel twin: ops/pallas/sgr.py).

    m = Wq Wk^T (S, S) and vv = Wk bq (S,) replace the reference's q/k
    projection pair (module docstring point 1): one node projection (s m)
    instead of two, the key-side bias vv folded in as a per-key VPU
    reduce, the query-side bias dropped (softmax row-shift invariance)."""
    rb, n, d = s.shape
    s2 = s.reshape(rb * n, d)
    sm = _dot(s2, m, bf16).astype(s.dtype).reshape(rb, n, d)
    sv = jnp.sum(
        s2.astype(jnp.float32) * vv[None, :], axis=1
    ).reshape(rb, n)  # key-side bias s_j . (Wk bq)
    e = _bdot(sm, s, ((2,), (2,)), bf16) + sv[:, None, :]  # (rb, n, n) fp32
    e = jnp.where(nmask[:, None, :] > 0, e, NEG_INF)
    a = jax.nn.softmax(e, axis=-1)
    ctx = _bdot(a.astype(s.dtype), s, ((2,), (1,)), bf16)
    g = _dot(ctx.astype(s.dtype).reshape(rb * n, d), wg, bf16) + bg
    return jnp.maximum(g, 0.0).astype(s.dtype).reshape(rb, n, d)


def _sgr_step_node0(s, nmask, m, vv, wg, bg, bf16):
    """Final step trimmed to node 0: one edge/context row per pair.

    The one-row products run on the VPU as fp32 broadcast-multiply-reduces
    instead of singleton batched dots: Mosaic's layout inference rejects
    the (rb, n) -> (rb, 1, n) shape cast the batched-dot lift needs when n
    is not lane-aligned, and at one query row the MXU is ~99% padding
    anyway.  With the q/k fold the key set needs NO projection here (the
    reference's k = S Wk + bk matmul over all n nodes is gone): the edge
    row is sum_d (s_0 M)_d s_j,d + s_j . v.  The fp32 products equal the
    MXU path's bf16-operand / fp32-accumulate results within bf16
    operand-rounding error (strictly MORE precise — operands are no longer
    rounded to bf16 first — so expect ulp-level diffs, not bit parity;
    tests use tolerances)."""
    rb, n, d = s.shape
    sm0 = _dot(s[:, 0, :], m, bf16).astype(s.dtype)  # (rb, d)
    sv = jnp.sum(
        s.astype(jnp.float32) * vv[None, None, :], axis=2
    )  # (rb, n)
    e = jnp.sum(
        s.astype(jnp.float32) * sm0[:, None, :].astype(jnp.float32), axis=2
    ) + sv  # (rb, n) = edge row 0
    e = jnp.where(nmask > 0, e, NEG_INF)
    a = jax.nn.softmax(e, axis=-1)
    ctx = jnp.sum(s.astype(jnp.float32) * a[:, :, None], axis=1)  # (rb, d)
    g = _dot(ctx.astype(s.dtype), wg, bf16) + bg
    return jnp.maximum(g, 0.0)  # (rb, d) fp32


def _epilogue(vec, ew_ref, eb_ref):
    """sim_eval_w Linear + sigmoid (ref Fusionmodule.py:433) on the final
    (bc, S) fp32 similarity vectors -> per-pair scores, broadcast over the
    8-lane output block."""
    z = jnp.sum(vec * ew_ref[0][None, :], axis=1) + eb_ref[0, 0]
    sig = jax.nn.sigmoid(z)  # (bc,) fp32
    bc = vec.shape[0]
    return jnp.broadcast_to(sig[:, None], (bc, 8)).reshape(bc, 1, 1, 8)


def _eval_kernel(cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref,
                 gloc_ref, imgglo_ref, gw_ref, gb_ref,
                 m_ref, vv_ref, wg_ref, bg_ref, ew_ref, eb_ref,
                 out_ref, *, bc, l, steps, bf16):
    nodes, nmask = _assemble_nodes(
        cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref,
        gloc_ref, imgglo_ref, gw_ref, gb_ref, bc=bc, l=l, bf16=bf16,
    )
    for i in range(steps - 1):
        nodes = _sgr_step_full(
            nodes, nmask, m_ref[i], vv_ref[i], wg_ref[i], bg_ref[i], bf16,
        )
    out0 = _sgr_step_node0(
        nodes, nmask, m_ref[steps - 1], vv_ref[steps - 1],
        wg_ref[steps - 1], bg_ref[steps - 1], bf16,
    )
    out_ref[:] = _epilogue(out0, ew_ref, eb_ref)


def _eval_saf_kernel(cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref,
                     gloc_ref, imgglo_ref, gw_ref, gb_ref,
                     awf_ref, abf_ref, ew_ref, eb_ref, out_ref,
                     *, bc, l, bf16):
    """SAF filtration (ref Fusionmodule.py:600-629, eval mode): the
    single-channel BatchNorm's running-stat affine is folded into the
    attention Linear by the caller (awf/abf), so the kernel runs
    sigmoid-gated l1-norm pooling over the nodes in fp32, then the
    sim_eval_w epilogue."""
    nodes, nmask = _assemble_nodes(
        cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref,
        gloc_ref, imgglo_ref, gw_ref, gb_ref, bc=bc, l=l, bf16=bf16,
    )
    s_dim = nodes.shape[2]
    bf16_ = nodes.dtype == jnp.bfloat16
    nf = nodes.astype(jnp.float32)
    attn = jnp.sum(nf * awf_ref[0][None, None, :], axis=2) + abf_ref[0, 0]
    attn = jax.nn.sigmoid(attn) * nmask  # (bc, n)
    attn = attn / (jnp.sum(jnp.abs(attn), axis=1, keepdims=True) + EPS)
    n = nodes.shape[1]
    # rank-3 lift: Mosaic cannot parse batched dots with a rank-2 operand
    attn3 = (attn.astype(nodes.dtype) if bf16_ else attn).reshape(bc, 1, n)
    saf = _bdot(attn3, nodes, bf16=bf16, contract=((2,), (1,)))[:, 0]
    sq = jnp.sum(saf * saf, axis=1, keepdims=True)
    out = saf / (jnp.sqrt(jnp.maximum(sq, 1e-16)) + EPS)
    out_ref[:] = _epilogue(out, ew_ref, eb_ref)


def _eval_vmem(bc, l, d, s_dim, rp, steps):
    base = _vmem_limit(bc, l, d, s_dim, rp, bwd=False)
    n = l + 8
    sgr = 8 * bc * n * s_dim * 4 + steps * 2 * s_dim * s_dim * 6
    sgr += 2 * bc * n * n * 4  # edge + softmax
    sgr += 4 * bc * d * 4      # global-node diff/proj rows
    return int(min(base + sgr * 1.25, 100 << 20))


def _common_specs(block_c, l, d, s_dim, rp):
    """Input block specs shared by the SGR and SAF eval kernels: alignment
    inputs + the global-node inputs (cap-side globals grid-indexed by c,
    the image global row by i)."""
    bcl = block_c * l
    return [
        pl.BlockSpec((bcl, d), lambda c, i: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rp, d), lambda c, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bcl, 1), lambda c, i: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rp), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, s_dim), lambda c, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_dim), lambda c, i: (0, 0),
                     memory_space=pltpu.VMEM),
        # the global embeddings ride as (Nc, 1, D)/(Ni, 1, D) so block_c /
        # the image row count land in batch dims, not non-divisible
        # sublane dims (block_c can be 38 at l=40)
        pl.BlockSpec((block_c, 1, d), lambda c, i: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), lambda c, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, s_dim), lambda c, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_dim), lambda c, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _vec_spec(s_dim):
    return pl.BlockSpec((1, s_dim), lambda c, i: (0, 0),
                        memory_space=pltpu.VMEM)


_SCALAR_SPEC = pl.BlockSpec((1, 1), lambda c, i: (0, 0),
                            memory_space=pltpu.VMEM)


def _out_spec(block_c):
    return pl.BlockSpec((block_c, 1, 1, 8), lambda c, i: (c, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _prep_globals(gloc, imgglo, gw, gb, ew, eb, dt, nc, nc_pad, s_dim):
    glocp = gloc.astype(dt)
    if nc_pad != nc:
        glocp = jnp.pad(glocp, ((0, nc_pad - nc), (0, 0)))
    return (
        glocp[:, None, :], imgglo.astype(dt)[:, None, :], gw.astype(dt),
        gb.reshape(1, s_dim).astype(jnp.float32),
        ew.reshape(1, s_dim).astype(jnp.float32),
        eb.reshape(1, 1).astype(jnp.float32),
    )


def sgraf_eval_score(cap, mask, img, w, b, gloc, imgglo, gw, gb,
                     wq, bq, wk, bk, wg, bg, ew, eb,
                     block_c: int | None = None, interpret: bool = False):
    """Fused eval-time SGR similarity scores.

    cap (Nc, L, D) word embeddings (L % 8 == 0); mask (Nc, L);
    img (Ni, R, D); w (D, S) / b (S,) — sim_tranloc_w; gloc (Nc, D) /
    imgglo (Ni, D) — the raw TextSA/VisualSA global embeddings; gw/gb —
    sim_tranglo_w; wq/bq/wk/bk/wg/bg (steps, S, S)/(steps, S) — per-step
    GraphReasoning Linears in flax (in, out) layout (q/k folded to
    M = Wq Wk^T / v = Wk bq here, see module docstring); ew (S, 1) /
    eb (1,) — sim_eval_w.  Returns (Nc, Ni) fp32 sigmoid scores.
    """
    nc, l, d = cap.shape
    ni = img.shape[0]
    s_dim = w.shape[1]
    steps = wq.shape[0]
    bf16 = cap.dtype == jnp.bfloat16
    if block_c is None:
        block_c = _pick_block_c(nc, l)
    cap2d, maskf, imgr, colm, nc_pad, rp = _prep(cap, mask, img, block_c)
    dt = cap.dtype
    f32 = jnp.float32
    # q/k fold (module docstring point 1), once per eval in fp32
    mm = jnp.einsum("sao,sbo->sab", wq.astype(f32), wk.astype(f32))
    vv = jnp.einsum("sbo,so->sb", wk.astype(f32), bq.astype(f32))
    glocp, imgglop, gwp, gbp, ewp, ebp = _prep_globals(
        gloc, imgglo, gw, gb, ew, eb, dt, nc, nc_pad, s_dim,
    )
    grid = (nc_pad // block_c, ni)

    wspec = pl.BlockSpec((steps, s_dim, s_dim), lambda c, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((steps, s_dim), lambda c, i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_eval_kernel, bc=block_c, l=l, steps=steps,
                          bf16=bf16),
        grid=grid,
        in_specs=_common_specs(block_c, l, d, s_dim, rp)
        + [wspec, bspec, wspec, bspec, _vec_spec(s_dim), _SCALAR_SPEC],
        out_specs=_out_spec(block_c),
        out_shape=jax.ShapeDtypeStruct((nc_pad, ni, 1, 8), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_eval_vmem(block_c, l, d, s_dim, rp, steps)
        ),
    )(
        cap2d, imgr, maskf, colm, w.astype(dt),
        b.reshape(1, s_dim).astype(f32),
        glocp, imgglop, gwp, gbp,
        mm.astype(dt), vv, wg.astype(dt), bg.astype(f32), ewp, ebp,
    )
    return out[:nc, :, 0, 0]


def sgraf_eval_saf_score(cap, mask, img, w, b, gloc, imgglo, gw, gb,
                         awf, abf, ew, eb,
                         block_c: int | None = None,
                         interpret: bool = False):
    """Fused eval-time SAF similarity scores.

    Same alignment/global inputs as `sgraf_eval_score`; awf (1, S) and
    abf (1, S) are the SAF attention Linear's weight/bias with the
    eval-mode BatchNorm1d(1) affine pre-folded by the caller; ew/eb —
    sim_eval_w.  Returns (Nc, Ni) fp32 sigmoid scores.
    """
    nc, l, d = cap.shape
    ni = img.shape[0]
    s_dim = w.shape[1]
    bf16 = cap.dtype == jnp.bfloat16
    if block_c is None:
        block_c = _pick_block_c(nc, l)
    cap2d, maskf, imgr, colm, nc_pad, rp = _prep(cap, mask, img, block_c)
    dt = cap.dtype
    f32 = jnp.float32
    glocp, imgglop, gwp, gbp, ewp, ebp = _prep_globals(
        gloc, imgglo, gw, gb, ew, eb, dt, nc, nc_pad, s_dim,
    )
    grid = (nc_pad // block_c, ni)

    out = pl.pallas_call(
        functools.partial(_eval_saf_kernel, bc=block_c, l=l, bf16=bf16),
        grid=grid,
        in_specs=_common_specs(block_c, l, d, s_dim, rp)
        + [_vec_spec(s_dim), _vec_spec(s_dim), _vec_spec(s_dim),
           _SCALAR_SPEC],
        out_specs=_out_spec(block_c),
        out_shape=jax.ShapeDtypeStruct((nc_pad, ni, 1, 8), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_eval_vmem(block_c, l, d, s_dim, rp, 1)
        ),
    )(
        cap2d, imgr, maskf, colm, w.astype(dt),
        b.reshape(1, s_dim).astype(f32),
        glocp, imgglop, gwp, gbp,
        awf.astype(f32), abf.astype(f32), ewp, ebp,
    )
    return out[:nc, :, 0, 0]


def sgraf_eval_saf_auto(cap, mask, img, gloc, imgglo, w, b, gw, gb,
                        awf, abf, ew, eb, block_c: int | None = None):
    """Routing entry for the SAF eval kernel (mirrors sgraf_eval_auto)."""
    from . import interpret_mode, record_dispatch, shard_mesh

    interpret = interpret_mode()
    mesh = shard_mesh()
    if mesh is None:
        record_dispatch("sgraf_eval_saf_fused")
        return sgraf_eval_saf_score(cap, mask, img, w, b, gloc, imgglo,
                                    gw, gb, awf, abf, ew, eb,
                                    block_c, interpret)

    from jax.sharding import PartitionSpec as P

    record_dispatch("sgraf_eval_saf_fused_sharded")
    ndp = mesh.shape["dp"]
    ni = img.shape[0]
    ni_pad = ((ni + ndp - 1) // ndp) * ndp
    if ni_pad != ni:
        img = jnp.pad(img, ((0, ni_pad - ni), (0, 0), (0, 0)))
        imgglo = jnp.pad(imgglo, ((0, ni_pad - ni), (0, 0)))

    out = jax.shard_map(
        lambda c_, m_, i_, g_, ig_, *w_: sgraf_eval_saf_score(
            c_, m_, i_, w_[0], w_[1], g_, ig_, *w_[2:], block_c, interpret
        ),
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P(), P("dp"),
                  P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(None, "dp"),
        check_vma=False,
    )(cap, mask, img, gloc, imgglo, w, b, gw, gb, awf, abf, ew, eb)
    return out[:, :ni]


def sgraf_eval_auto(cap, mask, img, gloc, imgglo, w, b, gw, gb,
                    wq, bq, wk, bk, wg, bg, ew, eb,
                    block_c: int | None = None):
    """Routing entry: resolves interpret mode; shard_maps the image axis
    when a mesh is active (the grid's image axis is embarrassingly
    parallel, matching the alignment kernel's sharding).  imgglo shards
    with the images; caption-side inputs are replicated.
    """
    from . import interpret_mode, record_dispatch, shard_mesh

    interpret = interpret_mode()
    mesh = shard_mesh()
    if mesh is None:
        record_dispatch("sgraf_eval_fused")
        return sgraf_eval_score(
            cap, mask, img, w, b, gloc, imgglo, gw, gb,
            wq, bq, wk, bk, wg, bg, ew, eb, block_c, interpret,
        )

    from jax.sharding import PartitionSpec as P

    record_dispatch("sgraf_eval_fused_sharded")
    ndp = mesh.shape["dp"]
    ni = img.shape[0]
    ni_pad = ((ni + ndp - 1) // ndp) * ndp
    if ni_pad != ni:
        img = jnp.pad(img, ((0, ni_pad - ni), (0, 0), (0, 0)))
        imgglo = jnp.pad(imgglo, ((0, ni_pad - ni), (0, 0)))

    out = jax.shard_map(
        lambda c_, m_, i_, g_, ig_, *w_: sgraf_eval_score(
            c_, m_, i_, w_[0], w_[1], g_, ig_, *w_[2:], block_c, interpret
        ),
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P(), P("dp"),
                  P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(None, "dp"),
        check_vma=False,
    )(cap, mask, img, gloc, imgglo, w, b, gw, gb,
      wq, bq, wk, bk, wg, bg, ew, eb)
    return out[:, :ni]
