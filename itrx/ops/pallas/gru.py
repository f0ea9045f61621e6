"""Fused masked-GRU recurrence — Pallas TPU kernels with a custom VJP.

The XLA `lax.scan` GRU (itrx.ops.rnn.gru_scan) is latency-bound: each of the
L sequential steps is a tiny (B, H) x (H, 3H) matmul plus gate arithmetic,
and the while-loop round-trips the carry through HBM with per-iteration
launch overhead (measured ~0.1% of MXU peak on a v5e; the recurrence is
10-20 ms of every GRU-method train step at reference shapes).  Here the
whole recurrence is one Pallas grid: the carry lives in a VMEM scratch
across grid steps, the recurrent weight is resident in VMEM, and each step
is a single MXU dot plus VPU gate math.

Semantics match itrx.ops.rnn.gru_scan exactly (torch.nn.GRU gate order
[r|z|n]; mask freezes the carry past each sequence's length; outputs are
zero at padded steps; `reverse=True` runs right-to-left so positions beyond
a length keep the zero carry — packed-bidirectional semantics).

The backward pass is the standard GRU adjoint run as a second Pallas grid in
the opposite direction: gates are recomputed from the saved carry sequence
(one extra (L, B, H) write in the forward), the carry gradient stays in
VMEM, and the weight/bias/input gradients reduce to three large XLA matmuls
over the kernel-emitted per-step gate gradients.

Matmul precision matches the XLA path's TPU default (bf16 single-pass with
fp32 accumulation); the carries themselves are fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(gx_ref, m_ref, whht_ref, bhh_ref, out_ref, hall_ref,
                ghall_ref, hfin_ref, h_ref, *, dot_dtype):
    """One grid step = one timestep.  h_ref: VMEM carry scratch (B, H)."""
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        h_ref[:] = jnp.zeros(h_ref.shape, h_ref.dtype)

    h = h_ref[:]  # (B, H) fp32
    hall_ref[0] = h  # save h_{t-1} for the backward recompute
    gh = jax.lax.dot(
        h.astype(dot_dtype), whht_ref[:],
        preferred_element_type=jnp.float32,
    ) + bhh_ref[:]  # (B, 3H)
    # saved for the backward (in the dot dtype): frees the backward kernel
    # from holding w_hh^T in VMEM and from recomputing this dot per step
    ghall_ref[0] = gh.astype(ghall_ref.dtype)
    gx = gx_ref[0]
    hidden = h.shape[-1]
    r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
    z = jax.nn.sigmoid(gx[:, hidden:2 * hidden] + gh[:, hidden:2 * hidden])
    n = jnp.tanh(gx[:, 2 * hidden:] + r * gh[:, 2 * hidden:])
    h_new = (1.0 - z) * n + z * h
    m = m_ref[0]  # (B, 1)
    h = m * h_new + (1.0 - m) * h
    h_ref[:] = h
    out_ref[0] = m * h_new
    hfin_ref[:] = h  # constant-index output: last write wins


def _bwd_kernel(gx_ref, m_ref, hall_ref, ghall_ref, gout_ref, gfin_ref,
                whh_ref, ggx_ref, ghn_ref, gh_ref, *, dot_dtype):
    """Reverse grid step t: recompute gates from the saved carries and
    recurrent-gate pre-activations, push the carry gradient back."""
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        gh_ref[:] = gfin_ref[:]

    h = hall_ref[0]  # h_{t-1} fp32
    gh_lin = ghall_ref[0].astype(jnp.float32)
    gx = gx_ref[0].astype(jnp.float32)
    hidden = h.shape[-1]
    hr = gh_lin[:, :hidden]
    hz = gh_lin[:, hidden:2 * hidden]
    hn = gh_lin[:, 2 * hidden:]
    r = jax.nn.sigmoid(gx[:, :hidden] + hr)
    z = jax.nn.sigmoid(gx[:, hidden:2 * hidden] + hz)
    n = jnp.tanh(gx[:, 2 * hidden:] + r * hn)

    m = m_ref[0]  # (B, 1)
    g_carry = gh_ref[:]
    g_hnew = m * (g_carry + gout_ref[0])
    g_prev = (1.0 - m) * g_carry

    g_n = g_hnew * (1.0 - z)
    g_z = g_hnew * (h - n)
    g_prev = g_prev + g_hnew * z
    g_pren = g_n * (1.0 - n * n)
    g_hn = g_pren * r
    g_r = g_pren * hn
    g_prer = g_r * r * (1.0 - r)
    g_prez = g_z * z * (1.0 - z)

    g_gx = jnp.concatenate([g_prer, g_prez, g_pren], axis=1)  # (B, 3H)
    ggx_ref[0] = g_gx.astype(ggx_ref.dtype)
    ghn_ref[0] = g_hn.astype(ghn_ref.dtype)
    g_gh = jnp.concatenate([g_prer, g_prez, g_hn], axis=1)
    g_prev = g_prev + jax.lax.dot(
        g_gh.astype(dot_dtype), whh_ref[:],
        preferred_element_type=jnp.float32,
    )
    gh_ref[:] = g_prev


def _pad_b(x, bp):
    b = x.shape[1]
    if b == bp:
        return x
    return jnp.pad(x, ((0, 0), (0, bp - b)) + ((0, 0),) * (x.ndim - 2))


def _compiler_params(h: int, bp: int, dot_dtype) -> "pltpu.CompilerParams | None":
    """Raise the scoped-VMEM limit for large H.

    The default 16MB scoped-VMEM budget (an XLA default, not the chip — a
    v5e core has 128MB VMEM) fits the kernel stack up to H=1024.  At VSRN's
    H=2048 the resident recurrent weight alone is 24MB bf16, so the kernel
    requests an explicit budget sized to its stack (~40MB at B=128) plus
    headroom.  Weight residency beats HBM-streaming here: one (H, 3H) fetch
    total instead of one per timestep.
    """
    if h <= 1024:
        return None
    itemsize = jnp.dtype(dot_dtype).itemsize
    weight = h * 3 * h * itemsize
    per_step = bp * 3 * h * (2 * 4 + 2 * itemsize) + bp * h * 16
    budget = weight + 2 * per_step + (8 << 20)
    return pltpu.CompilerParams(vmem_limit_bytes=int(budget))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gru_seq(gates_x, m, w_hh, b_hh, reverse: bool, interpret: bool,
             dot_dtype_str: str = "bfloat16"):
    """gates_x (L,B,3H) fp32; m (L,B,1) fp32.  Returns (outs (L,B,H), final)."""
    (outs, final), _, _ = _gru_seq_fwd_impl(
        gates_x, m, w_hh, b_hh, reverse, interpret, dot_dtype_str
    )
    return outs, final


def _gru_seq_fwd_impl(gates_x, m, w_hh, b_hh, reverse, interpret,
                      dot_dtype_str):
    L, B, H3 = gates_x.shape
    H = H3 // 3
    BP = max(((B + 7) // 8) * 8, 8)
    gates_x = _pad_b(gates_x, BP)
    m = _pad_b(m, BP)
    dot_dtype = jnp.dtype(dot_dtype_str)
    whht = w_hh.T.astype(dot_dtype)  # (H, 3H)
    bhh = b_hh.reshape(1, H3).astype(jnp.float32)

    idx = (lambda l: (L - 1 - l, 0, 0)) if reverse else (lambda l: (l, 0, 0))
    outs, hall, ghall, hfin = pl.pallas_call(
        functools.partial(_fwd_kernel, dot_dtype=dot_dtype),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, BP, H3), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, 1), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda l: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BP, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H3), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, H), lambda l: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, BP, H), jnp.float32),
            jax.ShapeDtypeStruct((L, BP, H), jnp.float32),
            jax.ShapeDtypeStruct((L, BP, H3), dot_dtype),
            jax.ShapeDtypeStruct((BP, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BP, H), jnp.float32)],
        interpret=interpret,
        compiler_params=_compiler_params(H, BP, dot_dtype),
    )(gates_x, m, whht, bhh)
    return (outs[:, :B], hfin[:B]), (hall, ghall), BP


def _gru_seq_fwd(gates_x, m, w_hh, b_hh, reverse, interpret,
                 dot_dtype_str):
    (outs, final), (hall, ghall), _ = _gru_seq_fwd_impl(
        gates_x, m, w_hh, b_hh, reverse, interpret, dot_dtype_str
    )
    return (outs, final), (gates_x, m, hall, ghall, w_hh)


def _gru_seq_bwd(reverse, interpret, dot_dtype_str, res, grads):
    g_outs, g_final = grads
    gates_x, m, hall, ghall, w_hh = res
    L, B, H3 = gates_x.shape
    H = H3 // 3
    BP = hall.shape[1]
    dot_dtype = jnp.dtype(dot_dtype_str)
    # the bwd kernel only needs gates_x for the gate recompute — feed it in
    # the dot dtype (the fwd's own dots were already in that dtype)
    gates_xp = _pad_b(gates_x, BP).astype(dot_dtype)
    mp = _pad_b(m, BP)
    g_outs = _pad_b(g_outs.astype(jnp.float32), BP)
    g_final = jnp.pad(g_final.astype(jnp.float32), ((0, BP - B), (0, 0)))
    whh = w_hh.astype(dot_dtype)

    # the backward walks the sequence in the opposite order of the forward
    idx = (lambda l: (l, 0, 0)) if reverse else (lambda l: (L - 1 - l, 0, 0))
    ggx, ghn = pl.pallas_call(
        functools.partial(_bwd_kernel, dot_dtype=dot_dtype),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, BP, H3), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, 1), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H3), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, H), lambda l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), lambda l: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BP, H3), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BP, H), idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # gate gradients leave the kernel in the dot dtype (they feed
            # bf16 matmuls anyway); keeps the kernel stack under the 16MB
            # scoped-VMEM limit
            jax.ShapeDtypeStruct((L, BP, H3), dot_dtype),
            jax.ShapeDtypeStruct((L, BP, H), dot_dtype),
        ],
        scratch_shapes=[pltpu.VMEM((BP, H), jnp.float32)],
        interpret=interpret,
        compiler_params=_compiler_params(H, BP, dot_dtype),
    )(gates_xp, mp, hall, ghall, g_outs, g_final, whh)

    ggx = ggx[:, :B].astype(jnp.float32)
    g_gh = jnp.concatenate([ggx[:, :, :2 * H], ghn[:, :B].astype(jnp.float32)],
                           axis=2)
    hall = hall[:, :B]
    # weight/bias grads as two large MXU matmuls + reductions (outside the
    # sequential kernel — no per-step accumulator)
    d_whh = jnp.einsum(
        "lbg,lbh->gh", g_gh, hall, preferred_element_type=jnp.float32
    )
    d_bhh = jnp.sum(g_gh, axis=(0, 1))
    return ggx, jnp.zeros_like(m), d_whh, d_bhh


_gru_seq.defvjp(_gru_seq_fwd, _gru_seq_bwd)


def gru_scan_fused(x, mask, w_ih, w_hh, b_ih, b_hh, reverse: bool = False,
                   interpret: bool | None = None,
                   dot_dtype: str | None = None):
    """Drop-in replacement for itrx.ops.rnn.gru_scan on TPU.

    x (B, L, D); mask (B, L); weights in torch.nn.GRU layout (w_ih (3H, D),
    w_hh (3H, H), gate order [r|z|n]).  Returns (outputs (B, L, H) zeroed at
    padded steps, final_h (B, H) at each sequence's last valid step).
    dot_dtype defaults to bf16 (the TPU production mode) unless the routing
    context overrides it.
    """
    from . import dot_dtype_override, interpret_mode, record_dispatch

    if interpret is None:
        interpret = interpret_mode()
    if dot_dtype is None:
        dot_dtype = dot_dtype_override() or "bfloat16"
    record_dispatch("gru_fused")
    B, L, _ = x.shape
    gates_x = (x @ w_ih.T + b_ih).astype(jnp.float32)  # one big MXU matmul
    gates_x = jnp.swapaxes(gates_x, 0, 1)  # (L, B, 3H)
    m = jnp.swapaxes(mask.astype(jnp.float32), 0, 1)[:, :, None]  # (L, B, 1)
    outs, final = _gru_seq(gates_x, m, w_hh, b_hh, reverse, interpret,
                           dot_dtype)
    return jnp.swapaxes(outs, 0, 1).astype(x.dtype), final.astype(x.dtype)


def gru_scan_fused_sharded(x, mask, w_ih, w_hh, b_ih, b_hh, mesh,
                           reverse: bool = False,
                           interpret: bool | None = None,
                           dot_dtype: str | None = None):
    """Fused GRU under a mesh: shard_map over the batch on the 'dp' axis.

    Each device runs the kernel (input projection included — a local MXU
    matmul) on its batch shard; weights are replicated, and the custom-VJP
    backward's weight/bias cotangents are psummed over 'dp' by the
    shard_map transpose (check_vma=False inserts the conservative psums).
    The batch is padded to a 'dp' multiple; all-zero-mask padded rows keep
    the zero carry and are sliced off.
    """
    from jax.sharding import PartitionSpec as P

    from . import record_dispatch

    record_dispatch("gru_fused_sharded")
    ndp = mesh.shape["dp"]
    b = x.shape[0]
    bp = ((b + ndp - 1) // ndp) * ndp
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, bp - b), (0, 0)))
    f = functools.partial(
        gru_scan_fused, reverse=reverse, interpret=interpret,
        dot_dtype=dot_dtype,
    )
    outs, final = jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P(), P(), P(), P()),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )(x, mask, w_ih, w_hh, b_ih, b_hh)
    return outs[:b], final[:b]
