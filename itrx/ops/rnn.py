"""Masked GRU recurrences for TPU.

The reference runs cuDNN GRUs over `pack_padded_sequence` batches sorted by
length (itr/modalmodule/TextEncoder.py:38-70).  On TPU we keep static shapes
and replace packing with mask arithmetic:

 - the input projection for all timesteps is one large (B*L, D)x(D, 3H)
   matmul (MXU-friendly),
 - the recurrent part is a `lax.scan` whose carry freezes once the mask runs
   out, so the final carry equals the packed "last valid timestep" state,
 - outputs at padded steps are zero, matching `pad_packed_sequence`,
 - the backward direction is the same scan with `reverse=True`; positions
   beyond a sequence's length keep the zero carry, so the backward pass
   effectively starts at each sequence's own last token, exactly like packed
   bidirectional GRUs.

Gate order and initialization match torch.nn.GRU (weights/biases U(-1/sqrt(H),
1/sqrt(H)), gates [r|z|n]) so that parity can be asserted against a CPU torch
oracle in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def gru_cell(h, gx, w_hh, b_hh):
    """One GRU step.  h: (B, H); gx: (B, 3H) precomputed input gates."""
    gh = h @ w_hh.T + b_hh
    hidden = h.shape[-1]
    xr, xz, xn = jnp.split(gx, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    del hidden
    return (1.0 - z) * n + z * h


def gru_scan(x, mask, w_ih, w_hh, b_ih, b_hh, reverse: bool = False,
             unroll: int = 8):
    """Masked GRU over (B, L, D) inputs.

    Returns (outputs (B, L, H), final_h (B, H)).  Outputs are zero at padded
    positions; final_h is the hidden state at each sequence's last valid step.
    The scan is unrolled (numerically identical) — the recurrence is
    latency-bound on TPU and the while-loop overhead dominates the tiny
    per-step matmul.
    """
    B, L, _ = x.shape
    H = w_hh.shape[1]
    in_dtype = x.dtype
    # the input projection rides the MXU in the input dtype; the recurrence
    # itself carries fp32 (a bf16 carry drifts over L sequential steps)
    gates_x = (x @ w_ih.T + b_ih).astype(jnp.float32)
    w_hh = w_hh.astype(jnp.float32)
    b_hh = b_hh.astype(jnp.float32)
    gates_x = jnp.swapaxes(gates_x, 0, 1)  # (L, B, 3H)
    m = jnp.swapaxes(mask.astype(jnp.float32), 0, 1)[:, :, None]  # (L, B, 1)

    def step(h, inp):
        gx, mt = inp
        h_new = gru_cell(h, gx, w_hh, b_hh)
        h = mt * h_new + (1.0 - mt) * h
        out = mt * h_new
        return h, out

    h0 = jnp.zeros((B, H), dtype=jnp.float32)
    # unrolling pays only while the per-step matmul is small enough to be
    # latency-bound; large-H steps (VSRN's 2048) are compute-bound and the
    # unrolled body just bloats scheduling
    eff_unroll = unroll if H <= 1024 else 1
    final_h, outs = jax.lax.scan(
        step, h0, (gates_x, m), reverse=reverse, unroll=min(eff_unroll, L)
    )
    return jnp.swapaxes(outs, 0, 1).astype(in_dtype), final_h.astype(in_dtype)


class MaskedGRU(nn.Module):
    """torch.nn.GRU-compatible (single-layer) masked GRU, optionally bidirectional.

    `__call__(x, mask)` returns (outputs, final_states):
      - unidirectional: outputs (B, L, H), final (B, H)
      - bidirectional: outputs (B, L, 2H) = concat[fwd, bwd], final (B, 2H)

    On TPU (and lane-aligned hidden sizes) the recurrence runs as the fused
    Pallas kernel (itrx.ops.pallas.gru) — the lax.scan path is latency-bound
    on the sequential carry; set use_fused=False to force the scan.
    """

    hidden_size: int
    bidirectional: bool = False
    use_fused: bool = True

    def _scan(self, x, mask, w_ih, w_hh, b_ih, b_hh, reverse=False):
        from .pallas import pallas_ok, shard_mesh

        if (
            self.use_fused
            and self.hidden_size % 128 == 0
            # the recurrent weight stays VMEM-resident; above the 16MB
            # default scoped-VMEM budget the kernel requests an explicit
            # limit sized to its stack (gru._compiler_params — ~40MB at
            # H=2048/B=128, v5e VMEM is 128MB/core).  H=2048 covers VSRN's
            # embed_size GRUs; beyond that the weight alone nears the chip.
            and self.hidden_size <= 2048
            and pallas_ok()
        ):
            mesh = shard_mesh()
            if mesh is not None:
                from .pallas.gru import gru_scan_fused_sharded

                return gru_scan_fused_sharded(
                    x, mask, w_ih, w_hh, b_ih, b_hh, mesh, reverse=reverse
                )
            from .pallas.gru import gru_scan_fused

            return gru_scan_fused(x, mask, w_ih, w_hh, b_ih, b_hh,
                                  reverse=reverse)
        return gru_scan(x, mask, w_ih, w_hh, b_ih, b_hh, reverse=reverse)

    def _direction_params(self, name: str, in_dim: int):
        h = self.hidden_size
        k = 1.0 / jnp.sqrt(h)
        init = nn.initializers.uniform(scale=2 * k)  # U(0, 2k), shifted below

        def u(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - k

        w_ih = self.param(f"w_ih{name}", u, (3 * h, in_dim))
        w_hh = self.param(f"w_hh{name}", u, (3 * h, h))
        b_ih = self.param(f"b_ih{name}", u, (3 * h,))
        b_hh = self.param(f"b_hh{name}", u, (3 * h,))
        return w_ih, w_hh, b_ih, b_hh

    @nn.compact
    def __call__(self, x, mask):
        in_dim = x.shape[-1]
        w_ih, w_hh, b_ih, b_hh = self._direction_params("", in_dim)
        out_f, h_f = self._scan(x, mask, w_ih, w_hh, b_ih, b_hh)
        if not self.bidirectional:
            return out_f, h_f
        w_ih_r, w_hh_r, b_ih_r, b_hh_r = self._direction_params("_reverse", in_dim)
        out_b, h_b = self._scan(x, mask, w_ih_r, w_hh_r, b_ih_r, b_hh_r, reverse=True)
        return jnp.concatenate([out_f, out_b], axis=-1), jnp.concatenate(
            [h_f, h_b], axis=-1
        )
