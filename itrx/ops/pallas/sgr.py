"""Fused SGRAF graph-reasoning (SGR) chain — Pallas TPU kernel, custom VJP.

Reference semantics: ref Fusionmodule.py:564-597 (GraphReasoning), applied
`sgr_step` times over the (L+1)-node alignment sequence (ref :420-427);
itrx XLA path: itrx/models/sgraf.py GraphReasoning.

Why a kernel: profiled at batch 128 (rows = cap_chunk*Ni = 4096, N = L+1 =
49 nodes, D = 256), the XLA chain is ~70ms of the SGRAF train step — not
FLOPs (the per-step matmuls are ~0.5 TFLOP total) but HBM traffic: every
q/k/edge/softmax/context/relu hop reads and writes a ~100MB (rows, N, D)
tensor, and the XLA convolution layouts force physical transposes between
{2,1,0} and {2,0,1} tilings on top.  Here a grid step loads one row-block
into VMEM and runs ALL sgr_step reasoning steps on it — HBM sees one read
of the input and one write per saved step, nothing else.

Mosaic lowers batched `dot_general` (verified on v5e), so the per-row
(N, D) x (D, N) edge products and (N, N) x (N, D) context products run as
native batched MXU ops, no block-diagonal tricks needed.

The backward recomputes the edge softmax per step from the forward-saved
step inputs (s0..s_{S-1}) — recompute is MXU-cheap; avoiding the saves'
HBM round trip is what matters — and accumulates the weight/bias
cotangents in VMEM scratch across the whole grid, writing them once at the
final grid step.

Round 5 q/k fold (same exact math as the eval kernel,
itrx/ops/pallas/sgraf_eval.py): the edge logits
e = (S Wq + bq)(S Wk + bk)^T collapse to S (Wq Wk^T) S^T + (S Wk bq)_key
plus per-row constants that softmax drops, so the kernels see only
M = Wq Wk^T and v = Wk bq — ONE node projection per step instead of q+k
in the forward, and the backward accumulates dM/dv instead of
dWq/dbq/dWk/dbk (5 projections/step instead of 8).  The wrapper converts:
dWq = dM Wk, dWk = dM^T Wq + dv (x) bq, dbq = dv Wk, and dbk = 0 — which
is exact, not an approximation: bk enters the logits only through per-row
constants, so its gradient through the softmax is identically zero (the
reference's autodiff produces the same zero up to fp noise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e18


def _dot2(a, b):
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32)


def _bdot(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, batch),
        preferred_element_type=jnp.float32,
    )


def _smea(s, mask, m_i, v_i):
    """One step's folded node projection + edge softmax — shared by forward
    and backward.  sm = s M; e = sm s^T + (s v)_key-side."""
    rb, n, d = s.shape
    s2 = s.reshape(rb * n, d)
    sm = _dot2(s2, m_i).astype(s.dtype).reshape(rb, n, d)
    # broadcast-multiply-reduce on the 3D shape: a (rb*n,) <-> (rb, n)
    # reshape is NOT lane-aligned for n=56 and dies in infer-vector-layout
    # ("unsupported shape cast") on the 2026-08 Mosaic.
    sv = jnp.sum(s.astype(jnp.float32) * v_i[None, None, :], axis=2)
    e = _bdot(sm, s, ((2,), (2,))) + sv[:, None, :]  # (rb, n, n) fp32
    e = jnp.where(mask[:, None, :] > 0, e, NEG_INF)
    a = jax.nn.softmax(e, axis=-1)
    return sm, a


def _fwd_kernel(s0_ref, mask_ref, m_ref, v_ref, wg_ref,
                bg_ref, *out_refs, steps):
    s = s0_ref[:]
    mask = mask_ref[:]
    rb, n, d = s.shape
    for i in range(steps):
        _, a = _smea(s, mask, m_ref[i], v_ref[i])
        ctx = _bdot(a.astype(s.dtype), s, ((2,), (1,)))  # (rb, n, d)
        g = _dot2(ctx.astype(s.dtype).reshape(rb * n, d), wg_ref[i]) + bg_ref[i]
        s = jnp.maximum(g, 0.0).astype(s.dtype).reshape(rb, n, d)
        out_refs[i][:] = s


def _bwd_kernel(s_refs, mask_ref, g_out_ref, m_ref, v_ref,
                wg_ref, bg_ref, g_s0_ref, dm_ref, dv_ref,
                dwg_ref, dbg_ref, dm_s, dv_s, dwg_s, dbg_s,
                *, steps, grid_n):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        for ref in (dm_s, dv_s, dwg_s, dbg_s):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    mask = mask_ref[:]
    g = g_out_ref[:].astype(jnp.float32)  # d(loss)/d(s_steps)
    for i in reversed(range(steps)):
        s_in = s_refs[i][:]  # input of step i (bf16)
        s_out = s_refs[i + 1][:]  # relu output of step i
        rb, n, d = s_in.shape
        sm, a = _smea(s_in, mask, m_ref[i], v_ref[i])
        ab = a.astype(s_in.dtype)
        ctx = _bdot(ab, s_in, ((2,), (1,))).astype(s_in.dtype)  # (rb, n, d)

        # relu adjoint, fp32 (bf16 cmpf is unsupported on the VPU)
        g_pre = jnp.where(s_out.astype(jnp.float32) > 0, g, 0.0)
        gp2 = g_pre.reshape(rb * n, d).astype(s_in.dtype)
        ctx2 = ctx.reshape(rb * n, d)
        dwg_s[i] += _bdot(ctx2, gp2, ((0,), (0,)), ((), ()))  # (d, d)
        dbg_s[i] += jnp.sum(g_pre.reshape(rb * n, d), axis=0)
        g_ctx = _bdot(gp2, wg_ref[i], ((1,), (1,)), ((), ())).reshape(
            rb, n, d
        )  # fp32
        gcb = g_ctx.astype(s_in.dtype)

        g_a = _bdot(gcb, s_in, ((2,), (2,)))  # (rb, n, m) fp32
        g_sin = _bdot(ab, gcb, ((1,), (1,)))  # (rb, m, d) fp32

        # softmax adjoint (masked cols have a == 0, so their g_e vanishes)
        g_e = a * (g_a - jnp.sum(g_a * a, axis=-1, keepdims=True))
        geb = g_e.astype(s_in.dtype)
        # e = sm s^T + (s v)_key: adjoints of the folded form
        g_sm = _bdot(geb, s_in, ((2,), (1,)))  # (rb, n, d) fp32
        g_sin = g_sin + _bdot(geb, sm, ((1,), (1,)))  # += g_e^T sm

        s2 = s_in.reshape(rb * n, d)
        gsm2 = g_sm.reshape(rb * n, d).astype(s_in.dtype)
        dm_s[i] += _bdot(s2, gsm2, ((0,), (0,)), ((), ()))  # (d, d)
        # sv adjoints: column sums of g_e feed dv and the rank-1 ds term
        # (3D broadcast-reduce; see _smea for why no (rb*n, 1) reshape)
        colsum = jnp.sum(g_e, axis=1)  # (rb, n)
        dv_s[i] += jnp.sum(
            colsum[:, :, None] * s_in.astype(jnp.float32), axis=(0, 1)
        )
        g_sin = g_sin + colsum[:, :, None] * v_ref[i][None, None, :]

        g_sin = g_sin + _bdot(
            gsm2, m_ref[i], ((1,), (1,)), ((), ())
        ).reshape(rb, n, d)
        g = g_sin
    g_s0_ref[:] = g.astype(g_s0_ref.dtype)

    @pl.when(l == grid_n - 1)
    def _():
        dm_ref[:] = dm_s[:]
        dv_ref[:] = dv_s[:]
        dwg_ref[:] = dwg_s[:]
        dbg_ref[:] = dbg_s[:]


def _pad_axis(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


_ROW_BLOCK = 64


def _vmem_params(rb, np_, d, steps):
    # blocks: s0 + steps saves (double-buffered) + weights + fp32 transients
    block = rb * np_ * d * 2
    budget = (steps + 2) * 2 * block + steps * 3 * d * d * 2
    budget += 5 * rb * np_ * max(np_, d) * 4 + steps * 3 * d * d * 4
    budget += 12 << 20
    return pltpu.CompilerParams(vmem_limit_bytes=int(budget))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def sgr_reason(s0, mask, wq, bq, wk, bk, wg, bg, interpret: bool = False):
    """Run `steps = wq.shape[0]` SGR reasoning steps fused in VMEM.

    s0 (B, N, D) bf16 alignment nodes; mask (B, N) valid-node mask;
    wq/wk/wg (S, D, D) and bq/bk/bg (S, D) per-step Linear params (torch
    layout transposed to (in, out) — i.e. flax kernel layout).  Returns the
    final node sequence (B, N, D); callers take node 0 (the global node) as
    the reasoned similarity vector.
    """
    out, _ = _fwd_impl(s0, mask, wq, bq, wk, bk, wg, bg, interpret)
    return out


def _fold_qk(wq, bq, wk):
    """M = Wq Wk^T, v = Wk bq per step, fp32 (module docstring: the q/k
    fold; bk drops out of the folded logits entirely)."""
    f32 = jnp.float32
    mm = jnp.einsum("sao,sbo->sab", wq.astype(f32), wk.astype(f32))
    vv = jnp.einsum("sbo,so->sb", wk.astype(f32), bq.astype(f32))
    return mm, vv


def _fwd_impl(s0, mask, wq, bq, wk, bk, wg, bg, interpret):
    b, n, d = s0.shape
    steps = wq.shape[0]
    np_ = ((n + 7) // 8) * 8
    bp = ((b + _ROW_BLOCK - 1) // _ROW_BLOCK) * _ROW_BLOCK
    s0p = _pad_axis(_pad_axis(s0, np_, 1), bp, 0)
    maskp = _pad_axis(_pad_axis(mask.astype(jnp.float32), np_, 1), bp, 0)
    wdt = s0.dtype
    grid = bp // _ROW_BLOCK
    mm, vv = _fold_qk(wq, bq, wk)

    row_spec = pl.BlockSpec(
        (_ROW_BLOCK, np_, d), lambda l: (l, 0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, steps=steps),
        grid=(grid,),
        in_specs=[
            row_spec,
            pl.BlockSpec((_ROW_BLOCK, np_), lambda l: (l, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, d, d), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, d), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, d, d), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, d), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec] * steps,
        out_shape=[jax.ShapeDtypeStruct((bp, np_, d), wdt)] * steps,
        interpret=interpret,
        compiler_params=_vmem_params(_ROW_BLOCK, np_, d, steps),
    )(
        s0p, maskp,
        mm.astype(wdt), vv,
        wg.astype(wdt), bg.astype(jnp.float32),
    )
    return outs[-1][:b, :n], (s0p, maskp, outs)


def _sgr_fwd(s0, mask, wq, bq, wk, bk, wg, bg, interpret):
    out, (s0p, maskp, saves) = _fwd_impl(
        s0, mask, wq, bq, wk, bk, wg, bg, interpret
    )
    return out, (s0p, maskp, saves, wq, bq, wk, bk, wg, bg, s0.shape)


def _sgr_bwd(interpret, res, g_out):
    s0p, maskp, saves, wq, bq, wk, bk, wg, bg, s0_shape = res
    b, n, d = s0_shape
    steps = wq.shape[0]
    bp, np_, _ = s0p.shape
    grid = bp // _ROW_BLOCK
    wdt = s0p.dtype
    g_out_p = _pad_axis(_pad_axis(g_out.astype(wdt), np_, 1), bp, 0)

    row_spec = pl.BlockSpec(
        (_ROW_BLOCK, np_, d), lambda l: (l, 0, 0), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec((steps, d, d), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((steps, d), lambda l: (0, 0),
                         memory_space=pltpu.VMEM)

    def kernel(*refs):
        s_refs = refs[: steps + 1]
        rest = refs[steps + 1:]
        _bwd_kernel(s_refs, *rest, steps=steps, grid_n=grid)

    mm, vv = _fold_qk(wq, bq, wk)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=(
            [row_spec] * (steps + 1)  # s0 + saves[:-1] + saves[-1]
            + [
                pl.BlockSpec((_ROW_BLOCK, np_), lambda l: (l, 0),
                             memory_space=pltpu.VMEM),
                row_spec,  # g_out
                wspec, bspec, wspec, bspec,
            ]
        ),
        out_specs=[
            row_spec,
            pl.BlockSpec((steps, d, d), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, d), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, d, d), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, d), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, np_, d), wdt),
            jax.ShapeDtypeStruct((steps, d, d), jnp.float32),
            jax.ShapeDtypeStruct((steps, d), jnp.float32),
            jax.ShapeDtypeStruct((steps, d, d), jnp.float32),
            jax.ShapeDtypeStruct((steps, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((steps, d, d), jnp.float32),
            pltpu.VMEM((steps, d), jnp.float32),
            pltpu.VMEM((steps, d, d), jnp.float32),
            pltpu.VMEM((steps, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(_ROW_BLOCK, np_, d, steps),
    )(
        s0p, *saves[:-1], saves[-1], maskp, g_out_p,
        mm.astype(wdt), vv,
        wg.astype(wdt), bg.astype(jnp.float32),
    )
    g_s0, dmm, dvv, dwg, dbg = outs
    # convert the folded cotangents back to the checkpoint layout
    # (module docstring): dWq = dM Wk, dWk = dM^T Wq + dv (x) bq,
    # dbq = dv Wk, dbk = 0 (exact).
    f32 = jnp.float32
    dwq = jnp.einsum("sab,sbo->sao", dmm, wk.astype(f32))
    dwk = jnp.einsum("sab,sao->sbo", dmm, wq.astype(f32)) + jnp.einsum(
        "sb,so->sbo", dvv, bq.astype(f32)
    )
    dbq = jnp.einsum("sb,sbo->so", dvv, wk.astype(f32))
    return (
        g_s0[:b, :n].astype(wdt),
        jnp.zeros((b, n), jnp.float32),
        dwq.astype(wq.dtype), dbq.astype(bq.dtype),
        dwk.astype(wk.dtype), jnp.zeros_like(bk),
        dwg.astype(wg.dtype), dbg.astype(bg.dtype),
    )


sgr_reason.defvjp(_sgr_fwd, _sgr_bwd)


def sgr_reason_auto(s0, mask, wq, bq, wk, bk, wg, bg, cap_rows: int = 1):
    """Routing entry: resolves interpret mode; shard_maps over the image
    axis when a mesh is active.

    Rows arrive caption-major, `cap_rows` captions x Ni images flattened.
    Under a mesh the wrapper regroups to (C, Ni, N, D), shards Ni over
    'dp' (matching the upstream alignment kernel's image sharding, so no
    resharding between them), runs the kernel per shard, and the weight
    cotangents are psummed by the shard_map transpose (check_vma=False).
    Images are zero-padded to a 'dp' multiple; padded rows have all-zero
    masks (uniform softmax over -inf columns stays finite) and are sliced.
    """
    from . import interpret_mode, record_dispatch, shard_mesh

    interpret = interpret_mode()
    mesh = shard_mesh()
    if mesh is None:
        record_dispatch("sgr_fused")
        return sgr_reason(s0, mask, wq, bq, wk, bk, wg, bg, interpret)

    from jax.sharding import PartitionSpec as P

    record_dispatch("sgr_fused_sharded")
    b, n, d = s0.shape
    c = cap_rows
    ni = b // c
    ndp = mesh.shape["dp"]
    nip = ((ni + ndp - 1) // ndp) * ndp
    s4 = s0.reshape(c, ni, n, d)
    m4 = mask.reshape(c, ni, n)
    if nip != ni:
        s4 = jnp.pad(s4, ((0, 0), (0, nip - ni), (0, 0), (0, 0)))
        m4 = jnp.pad(m4, ((0, 0), (0, nip - ni), (0, 0)))

    def body(s_, m_, *w):
        cc, nn = s_.shape[0], s_.shape[1]
        out = sgr_reason(
            s_.reshape(cc * nn, n, d), m_.reshape(cc * nn, n), *w, interpret
        )
        return out.reshape(cc, nn, n, d)

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, "dp"), P(None, "dp"), P(), P(), P(), P(), P(), P()),
        out_specs=P(None, "dp"),
        check_vma=False,
    )(s4, m4, wq, bq, wk, bk, wg, bg)
    return out[:, :ni].reshape(b, n, d)
