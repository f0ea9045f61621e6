"""Fused CAMERA AGSA gated attention — Pallas TPU kernel, custom VJP.

Reference semantics: itr/modalmodule/camera_.py:14-54 (GatedQueryAttLayer
body after the q/k/v projections): per-head element gates
``m = sigmoid(fc_g(fc_q(q) * fc_k(k)))``, gated scaled-dot-product scores,
softmax, attention-weighted values.  itrx XLA path:
itrx/models/agsa.py:GatedQueryAttLayer.

Why a kernel: at CAMERA's reference shapes (B=128, h=64 heads, N=36 regions
or 32 tokens, d_k=32) the per-head tensors have 32/36-wide minor dims —
every XLA op on them pads (8,128) tiles 4x and the chain shatters into
dozens of ~0.2ms fusions plus physical layout copies: profiled at 10.3 of
CAMERA's 27 ms/step (round 3).  Here one grid step loads a batch block of
q/k/v into VMEM and runs the whole gate+score+softmax+AV chain there; HBM
sees one read of q/k/v and one write of the output.

The head axis rides batched ``dot_general`` (lowers natively on v5e —
CLAUDE.md); the shared (d_k, d_k) gate projections flatten to single MXU
matmuls over (block*h*N, d_k).  fc_g's (d_k, 2 d_k) weight is passed as two
(d_k, d_k) halves so the kernel never lane-slices.

The backward recomputes gates/scores/softmax from q/k/v (MXU-cheap; no
forward saves round-trip HBM) and accumulates the six weight/bias
cotangents in fp32 VMEM scratch across the grid, writing them at the last
grid step.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot2(a, b):
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32)


def _bdot(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, batch),
        preferred_element_type=jnp.float32,
    )


def _gates(q2, k2, wq, bq, wk, bk, wg1, bg1, wg2, bg2):
    """Shared by forward and backward: gate pre-activations and sigmoids.

    q2/k2: (rows*N, d_k) in the compute dtype.  Returns fp32 tensors.
    """
    gq = _dot2(q2, wq[:]) + bq[:]
    gk = _dot2(k2, wk[:]) + bk[:]
    gg = gq * gk
    ggc = gg.astype(q2.dtype)
    m1 = jax.nn.sigmoid(_dot2(ggc, wg1[:]) + bg1[:])
    m2 = jax.nn.sigmoid(_dot2(ggc, wg2[:]) + bg2[:])
    return gq, gk, gg, m1, m2


def _fwd_kernel(q_ref, k_ref, v_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wg1_ref, bg1_ref, wg2_ref, bg2_ref, out_ref):
    q = q_ref[:]  # (bb, h, N, dk)
    k = k_ref[:]
    v = v_ref[:]
    bb, h, n, dk = q.shape
    rows = bb * h
    inv = 1.0 / math.sqrt(dk)
    q2 = q.reshape(rows * n, dk)
    k2 = k.reshape(rows * n, dk)
    _, _, _, m1, m2 = _gates(
        q2, k2, wq_ref, bq_ref, wk_ref, bk_ref,
        wg1_ref, bg1_ref, wg2_ref, bg2_ref,
    )
    qm = (q2.astype(jnp.float32) * m1 * inv).astype(q.dtype).reshape(rows, n, dk)
    km = (k2.astype(jnp.float32) * m2).astype(q.dtype).reshape(rows, n, dk)
    s = _bdot(qm, km, ((2,), (2,)))  # (rows, n, n) fp32
    p = jax.nn.softmax(s, axis=-1)
    out = _bdot(p.astype(q.dtype), v.reshape(rows, n, dk), ((2,), (1,)))
    out_ref[:] = out.astype(q.dtype).reshape(bb, h, n, dk)


def _bwd_kernel(q_ref, k_ref, v_ref, g_out_ref, wq_ref, bq_ref, wk_ref,
                bk_ref, wg1_ref, bg1_ref, wg2_ref, bg2_ref,
                gq_out, gk_out, gv_out, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                dwg1_ref, dbg1_ref, dwg2_ref, dbg2_ref,
                dwq_s, dbq_s, dwk_s, dbk_s, dwg1_s, dbg1_s, dwg2_s, dbg2_s,
                *, grid_n):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        for ref in (dwq_s, dbq_s, dwk_s, dbk_s,
                    dwg1_s, dbg1_s, dwg2_s, dbg2_s):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    bb, h, n, dk = q.shape
    rows = bb * h
    inv = 1.0 / math.sqrt(dk)
    dt = q.dtype
    q2 = q.reshape(rows * n, dk)
    k2 = k.reshape(rows * n, dk)
    gq, gk, gg, m1, m2 = _gates(
        q2, k2, wq_ref, bq_ref, wk_ref, bk_ref,
        wg1_ref, bg1_ref, wg2_ref, bg2_ref,
    )
    q2f = q2.astype(jnp.float32)
    k2f = k2.astype(jnp.float32)
    qm = (q2f * m1 * inv).astype(dt).reshape(rows, n, dk)
    km = (k2f * m2).astype(dt).reshape(rows, n, dk)
    s = _bdot(qm, km, ((2,), (2,)))
    p = jax.nn.softmax(s, axis=-1)
    pb = p.astype(dt)
    v3 = v.reshape(rows, n, dk)
    go3 = g_out_ref[:].reshape(rows, n, dk)

    # attention adjoints
    g_v = _bdot(pb, go3, ((1,), (1,)))               # (rows, n_k, dk) fp32
    g_p = _bdot(go3, v3, ((2,), (2,)))               # (rows, n_q, n_k) fp32
    g_s = p * (g_p - jnp.sum(g_p * p, axis=-1, keepdims=True))
    gsb = g_s.astype(dt)
    g_qm = _bdot(gsb, km, ((2,), (1,)))              # (rows, n_q, dk) fp32
    g_km = _bdot(gsb, qm, ((1,), (1,)))              # (rows, n_k, dk) fp32

    # gate adjoints (elementwise, fp32)
    g_qm2 = g_qm.reshape(rows * n, dk)
    g_km2 = g_km.reshape(rows * n, dk)
    g_m1 = g_qm2 * q2f * inv
    g_q = g_qm2 * m1 * inv
    g_m2 = g_km2 * k2f
    g_k = g_km2 * m2
    g_z1 = g_m1 * m1 * (1.0 - m1)
    g_z2 = g_m2 * m2 * (1.0 - m2)

    ggc = gg.astype(dt)
    gz1c = g_z1.astype(dt)
    gz2c = g_z2.astype(dt)
    dwg1_s[:] += _bdot(ggc, gz1c, ((0,), (0,)), ((), ()))
    dbg1_s[:] += jnp.sum(g_z1, axis=0, keepdims=True)
    dwg2_s[:] += _bdot(ggc, gz2c, ((0,), (0,)), ((), ()))
    dbg2_s[:] += jnp.sum(g_z2, axis=0, keepdims=True)

    g_gg = (
        _bdot(gz1c, wg1_ref[:], ((1,), (1,)), ((), ()))
        + _bdot(gz2c, wg2_ref[:], ((1,), (1,)), ((), ()))
    )
    g_gq = g_gg * gk
    g_gk = g_gg * gq
    ggq_c = g_gq.astype(dt)
    ggk_c = g_gk.astype(dt)
    dwq_s[:] += _bdot(q2, ggq_c, ((0,), (0,)), ((), ()))
    dbq_s[:] += jnp.sum(g_gq, axis=0, keepdims=True)
    dwk_s[:] += _bdot(k2, ggk_c, ((0,), (0,)), ((), ()))
    dbk_s[:] += jnp.sum(g_gk, axis=0, keepdims=True)

    g_q = g_q + _bdot(ggq_c, wq_ref[:], ((1,), (1,)), ((), ()))
    g_k = g_k + _bdot(ggk_c, wk_ref[:], ((1,), (1,)), ((), ()))

    gq_out[:] = g_q.astype(dt).reshape(bb, h, n, dk)
    gk_out[:] = g_k.astype(dt).reshape(bb, h, n, dk)
    gv_out[:] = g_v.astype(dt).reshape(bb, h, n, dk)

    @pl.when(l == grid_n - 1)
    def _():
        dwq_ref[:] = dwq_s[:]
        dbq_ref[:] = dbq_s[:]
        dwk_ref[:] = dwk_s[:]
        dbk_ref[:] = dbk_s[:]
        dwg1_ref[:] = dwg1_s[:]
        dbg1_ref[:] = dbg1_s[:]
        dwg2_ref[:] = dwg2_s[:]
        dbg2_ref[:] = dbg2_s[:]


def _block_b(h: int, bwd: bool = False) -> int:
    # ~256 batched-dot rows per forward grid step keeps the MXU pipeline fed
    # without blowing the VMEM stack (the dk-lane tiles pad 32 -> 128); the
    # backward holds ~2x the fp32 transients (measured 116MB at 256 rows on
    # v5e), so it halves the block
    rows = 128 if bwd else 256
    return max(1, rows // h)


def _vmem_params():
    # v5e has 128MB VMEM/core; the 16MB scoped default is an XLA default.
    # Block sizes above are chosen so the measured stack stays under this.
    return pltpu.CompilerParams(vmem_limit_bytes=100 << 20)


def _pad_b(x, bp):
    if x.shape[0] == bp:
        return x
    return jnp.pad(x, ((0, bp - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def agsa_attention(q, k, v, wq, bq, wk, bk, wg1, bg1, wg2, bg2,
                   interpret: bool = False):
    """Gated multi-head attention, fused.

    q/k/v: (B, h, N, d_k) — the head-split projections (the (B, N, D) ->
    (B, h, N, d_k) transpose is XLA's, one fused copy).  wq/wk: (d_k, d_k)
    fc_q/fc_k kernels; wg1/wg2: the (d_k, d_k) halves of fc_g's
    (d_k, 2 d_k) kernel; biases likewise.  Returns (B, h, N, d_k).
    """
    return _fwd_call(q, k, v, wq, bq, wk, bk, wg1, bg1, wg2, bg2, interpret)


def _specs(bb, h, n, dk):
    blk = pl.BlockSpec((bb, h, n, dk), lambda l: (l, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((dk, dk), lambda l: (0, 0), memory_space=pltpu.VMEM)
    # biases ride as (1, dk): Mosaic rejects 1D refs (established pattern —
    # see sgr.py/sgraf_align.py, all of whose biases are 2D)
    bspec = pl.BlockSpec((1, dk), lambda l: (0, 0), memory_space=pltpu.VMEM)
    return blk, wspec, bspec


def _fwd_call(q, k, v, wq, bq, wk, bk, wg1, bg1, wg2, bg2, interpret):
    b, h, n, dk = q.shape
    bb = _block_b(h)
    bp = ((b + bb - 1) // bb) * bb
    grid = bp // bb
    blk, wspec, bspec = _specs(bb, h, n, dk)
    wdt = q.dtype
    f32 = jnp.float32
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[blk, blk, blk] + [wspec, bspec] * 4,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((bp, h, n, dk), wdt),
        interpret=interpret,
        compiler_params=_vmem_params(),
    )(
        _pad_b(q, bp), _pad_b(k, bp), _pad_b(v, bp),
        wq.astype(wdt), bq.astype(f32).reshape(1, -1),
        wk.astype(wdt), bk.astype(f32).reshape(1, -1),
        wg1.astype(wdt), bg1.astype(f32).reshape(1, -1),
        wg2.astype(wdt), bg2.astype(f32).reshape(1, -1),
    )
    return out[:b]


def _agsa_fwd(q, k, v, wq, bq, wk, bk, wg1, bg1, wg2, bg2, interpret):
    out = _fwd_call(q, k, v, wq, bq, wk, bk, wg1, bg1, wg2, bg2, interpret)
    return out, (q, k, v, wq, bq, wk, bk, wg1, bg1, wg2, bg2)


def _agsa_bwd(interpret, res, g_out):
    q, k, v, wq, bq, wk, bk, wg1, bg1, wg2, bg2 = res
    b, h, n, dk = q.shape
    bb = _block_b(h, bwd=True)
    bp = ((b + bb - 1) // bb) * bb
    grid = bp // bb
    blk, wspec, bspec = _specs(bb, h, n, dk)
    wdt = q.dtype
    f32 = jnp.float32
    wshape = jax.ShapeDtypeStruct((dk, dk), f32)
    bshape = jax.ShapeDtypeStruct((1, dk), f32)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, grid_n=grid),
        grid=(grid,),
        in_specs=[blk, blk, blk, blk] + [wspec, bspec] * 4,
        out_specs=(
            [blk, blk, blk]
            + [wspec, bspec] * 4
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((bp, h, n, dk), wdt)] * 3
            + [wshape, bshape] * 4
        ),
        scratch_shapes=[
            pltpu.VMEM((dk, dk), f32), pltpu.VMEM((1, dk), f32),
        ] * 4,
        interpret=interpret,
        compiler_params=_vmem_params(),
    )(
        _pad_b(q, bp), _pad_b(k, bp), _pad_b(v, bp),
        _pad_b(g_out.astype(wdt), bp),
        wq.astype(wdt), bq.astype(f32).reshape(1, -1),
        wk.astype(wdt), bk.astype(f32).reshape(1, -1),
        wg1.astype(wdt), bg1.astype(f32).reshape(1, -1),
        wg2.astype(wdt), bg2.astype(f32).reshape(1, -1),
    )
    g_q, g_k, g_v, dwq, dbq, dwk, dbk, dwg1, dbg1, dwg2, dbg2 = outs
    return (
        g_q[:b], g_k[:b], g_v[:b],
        dwq.astype(wq.dtype), dbq[0].astype(bq.dtype),
        dwk.astype(wk.dtype), dbk[0].astype(bk.dtype),
        dwg1.astype(wg1.dtype), dbg1[0].astype(bg1.dtype),
        dwg2.astype(wg2.dtype), dbg2[0].astype(bg2.dtype),
    )


agsa_attention.defvjp(_agsa_fwd, _agsa_bwd)


def agsa_attention_auto(q, k, v, wq, bq, wk, bk, wg1, bg1, wg2, bg2):
    """Routing entry: resolves interpret mode; shard_maps the batch axis
    over 'dp' when a mesh is active (weight cotangents psummed by the
    shard_map transpose).  Padded batch rows are zeros — their softmax is
    uniform but their outputs are sliced away and their cotangents are zero,
    so the weight grads are exact."""
    from . import interpret_mode, record_dispatch, shard_mesh

    interpret = interpret_mode()
    mesh = shard_mesh()
    if mesh is None:
        record_dispatch("agsa_fused")
        return agsa_attention(
            q, k, v, wq, bq, wk, bk, wg1, bg1, wg2, bg2, interpret
        )

    from jax.sharding import PartitionSpec as P

    record_dispatch("agsa_fused_sharded")
    b = q.shape[0]
    ndp = mesh.shape["dp"]
    bp = ((b + ndp - 1) // ndp) * ndp
    qp, kp, vp = _pad_b(q, bp), _pad_b(k, bp), _pad_b(v, bp)

    def body(q_, k_, v_, *w):
        return agsa_attention(q_, k_, v_, *w, interpret)

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp")) + (P(),) * 8,
        out_specs=P("dp"),
        check_vma=False,
    )(qp, kp, vp, wq, bq, wk, bk, wg1, bg1, wg2, bg2)
    return out[:b]
