"""Fused VSRN caption-decoder recurrence — Pallas TPU kernel, custom VJP.

Reference semantics: itr/modalmodule/Fusionmodule.py:206-301 (DecoderRNN
teacher forcing) — per step: additive attention over the encoder outputs
(:112-146), context dropout, GRU cell, with the word-half of the input
projection and the vocab projection hoisted (itrx/models/vsrn_decoder.py).

Why a kernel: the decode loop is the last latency-bound `lax.scan` in the
tree.  Each of the ~59 sequential steps is a handful of small matmuls
((B,H)x(H,H) attention query, (B,H)x(H,3H) context/recurrent projections at
H=512) plus VPU gate math — per-iteration launch overhead and the carry's
HBM round trip dominate, twice (the scan's backward replays the loop).
Here the whole teacher-forced decode is one Pallas grid over timesteps: the
carry lives in a VMEM scratch, every weight is VMEM-resident, and the
attention tensor (B, R, H) never touches HBM.

The backward is a second grid in reverse order: attention and gates are
recomputed from the forward-saved carry sequence (h_{t-1}) and recurrent
pre-activations, the carry cotangent stays in VMEM, and all weight and
encoder-side cotangents accumulate directly in their constant-index output
blocks across the grid (zeroed at step 0, flushed to HBM once at the end —
no scratch duplication of the ~26MB accumulator set).

Inputs are pre-arranged by the caller (itrx/models/vsrn_decoder.py):
  gxw      (T, B, 3H) fp32 — words @ W_word^T + b_ih, hoisted
  cmask    (T, B, H)  fp32 — pre-scaled context-dropout masks (ones in eval)
  enc_out  (B, R, H)  — encoder outputs (attention values)
  enc_att  (B, R, H)  fp32 — enc_out @ att_w1[:H] + att_b1, hoisted
  h0       (B, H)    fp32 — encoder final hidden
  watt     (H, H)  — att_w1[H:] (the decoder-state half of the concat)
  w2       (1, H)  — att_w2^T (additive-attention scorer)
  wctxT    (H, 3H) — w_ih[:, W:]^T (context half of the input projection)
  whhT     (H, 3H) — w_hh^T
  bhh      (1, 3H) fp32
Returns hs (T, B, H) fp32 — the decoder states (h_1..h_T), which feed the
hoisted vocab projection outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    return jax.lax.dot(a, b, preferred_element_type=jnp.float32)


def _rowdot(a, b):
    """(N, K), (N, M) -> (K, M): contract the row axis (weight cotangents)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _attend(h, enca, enco_f32, w2b, watt_ref, dt):
    """Shared fwd/bwd recompute.  Returns (o, alpha, ctx_raw)."""
    hq = _dot(h.astype(dt), watt_ref[:])              # (BP, H) fp32
    o = jnp.tanh(enca + hq[:, None, :])               # (BP, R, H) fp32
    e = jnp.sum(o * w2b, axis=-1)                     # (BP, R)
    alpha = jax.nn.softmax(e, axis=-1)
    ctx_raw = jnp.sum(alpha[:, :, None] * enco_f32, axis=1)  # (BP, H)
    return o, alpha, ctx_raw


def _gru_fwd(h, gx, gh):
    hid = h.shape[-1]
    r = jax.nn.sigmoid(gx[:, :hid] + gh[:, :hid])
    z = jax.nn.sigmoid(gx[:, hid:2 * hid] + gh[:, hid:2 * hid])
    n = jnp.tanh(gx[:, 2 * hid:] + r * gh[:, 2 * hid:])
    return (1.0 - z) * n + z * h, (r, z, n)


def _fwd_kernel(gxw_ref, cm_ref, enco_ref, enca_ref, h0_ref, watt_ref,
                w2_ref, wctxT_ref, whhT_ref, bhh_ref,
                hs_ref, hall_ref, ghall_ref, h_ref, *, dot_dtype):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        h_ref[:] = h0_ref[:]

    dt = dot_dtype
    h = h_ref[:]                                      # (BP, H) fp32
    hall_ref[0] = h
    enco_f32 = enco_ref[:].astype(jnp.float32)
    w2b = w2_ref[:][None]                             # (1, 1, H)
    _, _, ctx_raw = _attend(h, enca_ref[:], enco_f32, w2b, watt_ref, dt)
    ctx = ctx_raw * cm_ref[0]
    gx = _dot(ctx.astype(dt), wctxT_ref[:]) + gxw_ref[0]
    gh = _dot(h.astype(dt), whhT_ref[:]) + bhh_ref[:]
    ghall_ref[0] = gh.astype(ghall_ref.dtype)
    h_new, _ = _gru_fwd(h, gx, gh)
    h_ref[:] = h_new
    hs_ref[0] = h_new


def _bwd_kernel(gxw_ref, cm_ref, hall_ref, ghall_ref, ghs_ref, enco_ref,
                enca_ref, watt_ref, wattT_ref, w2_ref, wctx_ref, whh_ref,
                wctxT_ref,
                ggxw_ref, gh0_ref, genco_ref, genca_ref, dwatt_ref, dw2_ref,
                dwctxT_ref, dwhhT_ref, dbhh_ref,
                *, dot_dtype):
    # Every constant-index output block doubles as its own accumulator
    # (zeroed at the first grid step, revisited every step, flushed to HBM
    # once at the end) — a separate scratch per accumulator would double
    # ~26MB of VMEM at production shapes.  gh0_ref carries the running
    # carry-cotangent; its final value IS g_h0.
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        for ref in (gh0_ref, genco_ref, genca_ref, dwatt_ref, dw2_ref,
                    dwctxT_ref, dwhhT_ref, dbhh_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    dt = dot_dtype
    h = hall_ref[0]                                   # h_{t-1} fp32
    enca = enca_ref[:]
    enco_f32 = enco_ref[:].astype(jnp.float32)
    w2b = w2_ref[:][None]
    o, alpha, ctx_raw = _attend(h, enca, enco_f32, w2b, watt_ref, dt)
    cm = cm_ref[0]
    ctx = ctx_raw * cm
    gh_lin = ghall_ref[0].astype(jnp.float32)
    gx = _dot(ctx.astype(dt), wctxT_ref[:]) + gxw_ref[0]
    _, (r, z, n) = _gru_fwd(h, gx, gh_lin)
    hid = h.shape[-1]
    hn = gh_lin[:, 2 * hid:]

    # GRU adjoint (same algebra as gru.py:_bwd_kernel, maskless)
    g_ht = gh0_ref[:] + ghs_ref[0]
    g_n = g_ht * (1.0 - z)
    g_z = g_ht * (h - n)
    g_prev = g_ht * z
    g_pren = g_n * (1.0 - n * n)
    g_hn = g_pren * r
    g_r = g_pren * hn
    g_prer = g_r * r * (1.0 - r)
    g_prez = g_z * z * (1.0 - z)
    g_gx = jnp.concatenate([g_prer, g_prez, g_pren], axis=1)   # (BP, 3H)
    g_gh = jnp.concatenate([g_prer, g_prez, g_hn], axis=1)
    ggxw_ref[0] = g_gx.astype(ggxw_ref.dtype)
    g_gx_d = g_gx.astype(dt)
    g_gh_d = g_gh.astype(dt)
    h_d = h.astype(dt)
    g_prev = g_prev + _dot(g_gh_d, whh_ref[:])
    dwhhT_ref[:] += _rowdot(h_d, g_gh_d)
    dbhh_ref[:] += jnp.sum(g_gh, axis=0, keepdims=True)

    # context / attention adjoints
    g_ctx = _dot(g_gx_d, wctx_ref[:])                 # (BP, H)
    dwctxT_ref[:] += _rowdot(ctx.astype(dt), g_gx_d)
    g_ctx_raw = g_ctx * cm
    g_alpha = jnp.sum(g_ctx_raw[:, None, :] * enco_f32, axis=-1)  # (BP, R)
    genco_ref[:] += alpha[:, :, None] * g_ctx_raw[:, None, :]
    g_e = alpha * (g_alpha - jnp.sum(g_alpha * alpha, axis=-1, keepdims=True))
    g_o = g_e[:, :, None] * w2b                       # (BP, R, H)
    g_pre = g_o * (1.0 - o * o)
    genca_ref[:] += g_pre
    dw2_ref[:] += jnp.sum(jnp.sum(g_e[:, :, None] * o, axis=0), axis=0,
                          keepdims=True)
    g_hq = jnp.sum(g_pre, axis=1)                     # (BP, H)
    g_prev = g_prev + _dot(g_hq.astype(dt), wattT_ref[:])
    dwatt_ref[:] += _rowdot(h_d, g_hq.astype(dt))
    gh0_ref[:] = g_prev


def _pad_rows(x, bp, axis):
    b = x.shape[axis]
    if b == bp:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, bp - b)
    return jnp.pad(x, pad)


def _vmem_params():
    # dominant residents at B=128, R=36, H=512: enc_att fp32 (9.4MB) +
    # enc_out + weights (~9MB) fwd; the backward adds ~26MB of
    # accumulating constant-index output blocks (two (B, R, H) fp32
    # encoder cotangents + the weight set), with (B, R, H) fp32
    # transients on top.  v5e: 128MB/core.
    return pltpu.CompilerParams(vmem_limit_bytes=100 << 20)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _dec_seq(gxw, cmask, enco, enca, h0, watt, w2, wctxT, whhT, bhh,
             interpret: bool, dot_dtype_str: str):
    hs, _, _ = _dec_fwd_impl(gxw, cmask, enco, enca, h0, watt, w2, wctxT,
                             whhT, bhh, interpret, dot_dtype_str)
    return hs


def _dec_fwd_impl(gxw, cmask, enco, enca, h0, watt, w2, wctxT, whhT, bhh,
                  interpret, dot_dtype_str):
    T, B, H3 = gxw.shape
    H = H3 // 3
    R = enco.shape[1]
    BP = max(((B + 7) // 8) * 8, 8)
    dt = jnp.dtype(dot_dtype_str)
    gxw = _pad_rows(gxw.astype(jnp.float32), BP, 1)
    cmask = _pad_rows(cmask.astype(jnp.float32), BP, 1)
    enco = _pad_rows(enco.astype(dt), BP, 0)
    enca = _pad_rows(enca.astype(jnp.float32), BP, 0)
    h0 = _pad_rows(h0.astype(jnp.float32), BP, 0)

    idx = lambda l: (l, 0, 0)  # noqa: E731
    const3 = lambda l: (0, 0, 0)  # noqa: E731
    const2 = lambda l: (0, 0)  # noqa: E731
    hs, hall, ghall = pl.pallas_call(
        functools.partial(_fwd_kernel, dot_dtype=dt),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, BP, H3), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, R, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, R, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BP, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H3), idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, BP, H), jnp.float32),
            jax.ShapeDtypeStruct((T, BP, H), jnp.float32),
            jax.ShapeDtypeStruct((T, BP, H3), dt),
        ],
        scratch_shapes=[pltpu.VMEM((BP, H), jnp.float32)],
        interpret=interpret,
        compiler_params=_vmem_params(),
    )(
        gxw, cmask, enco, enca, h0,
        watt.astype(dt), w2.astype(jnp.float32),
        wctxT.astype(dt), whhT.astype(dt), bhh.astype(jnp.float32),
    )
    return hs[:, :B], hall, ghall


def _dec_fwd(gxw, cmask, enco, enca, h0, watt, w2, wctxT, whhT, bhh,
             interpret, dot_dtype_str):
    hs, hall, ghall = _dec_fwd_impl(
        gxw, cmask, enco, enca, h0, watt, w2, wctxT, whhT, bhh,
        interpret, dot_dtype_str,
    )
    return hs, (gxw, cmask, enco, enca, watt, w2, wctxT, whhT, bhh, hall,
                ghall)


def _dec_bwd(interpret, dot_dtype_str, res, g_hs):
    gxw, cmask, enco, enca, watt, w2, wctxT, whhT, bhh, hall, ghall = res
    T, B, H3 = gxw.shape
    H = H3 // 3
    R = enco.shape[1]
    BP = hall.shape[1]
    dt = jnp.dtype(dot_dtype_str)
    gxwp = _pad_rows(gxw.astype(jnp.float32), BP, 1)
    cmaskp = _pad_rows(cmask.astype(jnp.float32), BP, 1)
    encop = _pad_rows(enco.astype(dt), BP, 0)
    encap = _pad_rows(enca.astype(jnp.float32), BP, 0)
    g_hsp = _pad_rows(g_hs.astype(jnp.float32), BP, 1)

    ridx = lambda l: (T - 1 - l, 0, 0)  # noqa: E731
    const3 = lambda l: (0, 0, 0)  # noqa: E731
    const2 = lambda l: (0, 0)  # noqa: E731
    wattd = watt.astype(dt)
    wctxTd = wctxT.astype(dt)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dot_dtype=dt),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, BP, H3), ridx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H), ridx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H), ridx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H3), ridx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H), ridx, memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, R, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, R, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BP, H3), ridx, memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, R, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, R, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, BP, H3), dt),
            jax.ShapeDtypeStruct((BP, H), jnp.float32),
            jax.ShapeDtypeStruct((BP, R, H), jnp.float32),
            jax.ShapeDtypeStruct((BP, R, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((1, H3), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(),
    )(
        gxwp, cmaskp, hall, ghall, g_hsp, encop, encap,
        wattd, wattd.T, w2.astype(jnp.float32),
        wctxTd.T, whhT.astype(dt).T, wctxTd,
    )
    (g_gxw, g_h0, g_enco, g_enca, d_watt, d_w2, d_wctxT, d_whhT,
     d_bhh) = outs
    return (
        g_gxw[:, :B].astype(gxw.dtype),
        jnp.zeros_like(cmask),
        g_enco[:B].astype(enco.dtype),
        g_enca[:B].astype(enca.dtype),
        g_h0[:B],
        d_watt.astype(watt.dtype),
        d_w2.astype(w2.dtype),
        d_wctxT.astype(wctxT.dtype),
        d_whhT.astype(whhT.dtype),
        d_bhh.astype(bhh.dtype),
    )


_dec_seq.defvjp(_dec_fwd, _dec_bwd)


def decoder_seq(gxw, cmask, enc_out, enc_att, h0, watt, att_w2, w_ctx, w_hh,
                b_hh, interpret: bool | None = None,
                dot_dtype: str | None = None):
    """Fused teacher-forced decode.  See module docstring for shapes.

    watt: att_w1[H:] (H, H); att_w2 (H, 1); w_ctx = w_ih[:, W:] (3H, H);
    w_hh (3H, H) — torch layouts, transposed here once.
    Returns hs (T, B, H) fp32.
    """
    from . import dot_dtype_override, interpret_mode, record_dispatch

    if interpret is None:
        interpret = interpret_mode()
    if dot_dtype is None:
        dot_dtype = dot_dtype_override() or "bfloat16"
    record_dispatch("vsrn_dec_fused")
    # fp32-canonical inputs: the kernel computes/accumulates these in fp32,
    # so casting here (outside the custom VJP) keeps cotangent avals
    # matching and routes the bf16<->fp32 conversions through XLA's cast
    # transpose
    return _dec_seq(
        gxw.astype(jnp.float32), cmask.astype(jnp.float32),
        enc_out, enc_att.astype(jnp.float32), h0.astype(jnp.float32),
        watt, att_w2.reshape(1, -1), w_ctx.T, w_hh.T,
        b_hh.reshape(1, -1), interpret, dot_dtype,
    )


def decoder_seq_sharded(gxw, cmask, enc_out, enc_att, h0, watt, att_w2,
                        w_ctx, w_hh, b_hh, mesh,
                        interpret: bool | None = None,
                        dot_dtype: str | None = None):
    """Fused decode under a mesh: shard_map over the batch on 'dp'.

    Batch rides axis 1 of gxw/cmask and axis 0 of the encoder tensors;
    weight cotangents are psummed by the shard_map transpose.  Padded
    batch rows (zero encoder outputs, zero h0) see uniform attention but
    their output cotangents are zero, so weight grads are exact.
    """
    from jax.sharding import PartitionSpec as P

    from . import record_dispatch

    record_dispatch("vsrn_dec_fused_sharded")
    ndp = mesh.shape["dp"]
    b = h0.shape[0]
    bp = ((b + ndp - 1) // ndp) * ndp
    gxw = _pad_rows(gxw, bp, 1)
    cmask = _pad_rows(cmask, bp, 1)
    enc_out = _pad_rows(enc_out, bp, 0)
    enc_att = _pad_rows(enc_att, bp, 0)
    h0 = _pad_rows(h0, bp, 0)
    f = functools.partial(decoder_seq, interpret=interpret,
                          dot_dtype=dot_dtype)
    hs = jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(None, "dp"), P(None, "dp"), P("dp"), P("dp"), P("dp"),
                  P(), P(), P(), P(), P()),
        out_specs=P(None, "dp"),
        check_vma=False,
    )(gxw, cmask, enc_out, enc_att, h0, watt, att_w2, w_ctx, w_hh, b_hh)
    return hs[:, :b]


def decoder_seq_auto(gxw, cmask, enc_out, enc_att, h0, watt, att_w2, w_ctx,
                     w_hh, b_hh):
    """Routing entry: direct on one device, shard_map under an active mesh."""
    from . import shard_mesh

    mesh = shard_mesh()
    if mesh is None:
        return decoder_seq(gxw, cmask, enc_out, enc_att, h0, watt, att_w2,
                           w_ctx, w_hh, b_hh)
    return decoder_seq_sharded(gxw, cmask, enc_out, enc_att, h0, watt,
                               att_w2, w_ctx, w_hh, b_hh, mesh)
