"""Fused SCAN t2i cross-attention similarity — Pallas TPU kernel.

The XLA path (itrx.ops.attention.xattn_score_t2i) materializes the raw
attention tensor A[i,c,r,l] in HBM several times (einsum boundaries); at
f30k-1K scale that is ~1.7GB per (250x1000) tile and the evaluation becomes
HBM-bound.  This kernel computes an (BLOCK_I, BLOCK_C) output tile entirely
in VMEM: one MXU matmul produces the (R, BLOCK_C*L) attention slab per image,
and the leaky-relu + masked l2norm + temperature softmax + cosine numerator +
Gram-form context norm + masked LogSumExp all happen on-chip, so HBM sees
only the embeddings once per block pass and the (Ni, Nc) output.

Supports the default SCAN configuration (raw_feature_norm='clipped_l2norm',
agg_func='LogSumExp') — the one used by every published SCAN/README command;
other combinations fall back to the XLA path at the call site.

Layout notes:
 - captions are passed pre-transposed as (D, Nc*L) so the per-image matmul is
   (R, D) @ (D, BLOCK_C*L) with the 128-lane axis on words,
 - per-l-group reductions (the l2norm over each caption's words and the final
   LogSumExp) are expressed as tiny matmuls against a constant (BLOCK_C*L,
   BLOCK_C) group-indicator matrix, keeping everything on MXU/VPU with no
   unaligned reshapes,
 - per-image 36x36 region Grams are precomputed outside (5MB for 1K images)
   so the context norm is a (R, R) @ (R, BLOCK_C*L) matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8


def _kernel(
    img_ref,      # (BI, R, D)   input dtype
    gram_ref,     # (BI, R, R)   fp32
    capt_ref,     # (D, BC*L)    input dtype (transposed caption block)
    capn_ref,     # (1, BC*L)    fp32 word norms
    mask_ref,     # (1, BC*L)    fp32 validity
    group_ref,    # (BC*L, BC)   fp32 l-group indicator
    out_ref,      # (1, BI, BC)  fp32 — one full block per grid cell
    *,
    block_i: int,
    block_c: int,
    lambda_lse: float,
    lambda_softmax: float,
):
    capt = capt_ref[:]
    capn = capn_ref[:]
    mask = mask_ref[:]
    group = group_ref[:]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_i, block_c), 0)

    bf16_in = capt.dtype == jnp.bfloat16

    def one_image(bi, acc):
        img = img_ref[bi]  # (R, D)
        # fp32 inputs use the HIGHEST (6-pass) emulation; bf16 inputs ride
        # the native single-pass MXU (the production eval_bf16 tolerance,
        # asserted in tests/test_bf16_eval.py)
        a = jax.lax.dot(
            img, capt,
            precision=None if bf16_in else jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (R, BCL) raw dots — the cosine numerator needs these unclipped
        # clipped_l2norm over each caption's words
        h = jnp.where(a > 0, a, 0.1 * a) * mask
        sq = h * h
        group_sums = jnp.dot(sq, group, preferred_element_type=jnp.float32)
        denom = jnp.dot(
            group_sums, group.T, preferred_element_type=jnp.float32
        )
        attn = h / (jnp.sqrt(jnp.maximum(denom, 1e-16)) + EPS)
        # temperature softmax over regions (rows)
        z = attn * lambda_softmax
        z = z - jnp.max(z, axis=0, keepdims=True)
        e = jnp.exp(z)
        attn = e / jnp.sum(e, axis=0, keepdims=True)
        # cosine numerator and Gram-form context norm
        num = jnp.sum(attn * a, axis=0, keepdims=True)  # (1, BCL)
        if bf16_in:
            y = jax.lax.dot(
                gram_ref[bi].astype(jnp.bfloat16), attn.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # (R, BCL)
        else:
            y = jax.lax.dot(
                gram_ref[bi], attn,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (R, BCL)
        ctx_sq = jnp.sum(attn * y, axis=0, keepdims=True)
        row_sim = num / jnp.maximum(
            jnp.sqrt(jnp.maximum(ctx_sq, 1e-16)) * capn, EPS
        )
        # masked LogSumExp over each caption's words
        e2 = jnp.exp(row_sim * lambda_lse) * mask
        gs = jnp.dot(e2, group, preferred_element_type=jnp.float32)  # (1, BC)
        row = jnp.log(gs) / lambda_lse  # (1, BC)
        # accumulate into row bi without a dynamic store (Mosaic forbids
        # dynamic lane/sublane store offsets): one-hot select on the carry
        return acc + jnp.where(row_ids == bi, row, 0.0)

    acc0 = jnp.zeros((block_i, block_c), jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, block_i, one_image, acc0)


@functools.partial(
    jax.jit,
    static_argnames=("lambda_lse", "lambda_softmax", "block_i", "block_c",
                     "interpret"),
)
def xattn_t2i_fused(
    images,
    captions,
    cap_mask,
    *,
    lambda_lse: float = 6.0,
    lambda_softmax: float = 9.0,
    block_i: int = 16,
    block_c: int = 16,
    interpret: bool = False,
):
    """Fused t2i stacked-attention scores: (Ni, R, D) x (Nc, L, D) -> (Ni, Nc).

    Equivalent to itrx.ops.attention.xattn_score_t2i with
    raw_feature_norm='clipped_l2norm', agg_func='LogSumExp'.
    """
    ni, r, d = images.shape
    nc, l, _ = captions.shape

    ni_pad = -(-ni // block_i) * block_i
    nc_pad = -(-nc // block_c) * block_c
    if ni_pad != ni:
        images = jnp.pad(images, ((0, ni_pad - ni), (0, 0), (0, 0)))
    if nc_pad != nc:
        captions = jnp.pad(captions, ((0, nc_pad - nc), (0, 0), (0, 0)))
        cap_mask = jnp.pad(cap_mask, ((0, nc_pad - nc), (0, 0)))
        # one live word per padded caption keeps the kernel finite
        cap_mask = cap_mask.at[nc:, 0].set(1.0)

    mask_f = cap_mask.astype(jnp.float32)
    capz = captions * mask_f[..., None].astype(captions.dtype)
    cap_t = capz.reshape(nc_pad * l, d).T  # (D, Nc*L)
    cap_norm = jnp.sqrt(
        jnp.sum(jnp.square(capz.astype(jnp.float32)), axis=-1)
    ).reshape(1, nc_pad * l)
    mask_row = mask_f.reshape(1, nc_pad * l)
    gram = jnp.einsum(
        "ird,isd->irs", images, images, preferred_element_type=jnp.float32
    )

    # constant l-group indicator for one caption block
    group = jnp.asarray(
        np.kron(np.eye(block_c, dtype=np.float32), np.ones((l, 1), np.float32))
    )  # (block_c*L, block_c)

    bcl = block_c * l
    grid = (ni_pad // block_i, nc_pad // block_c)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            block_i=block_i,
            block_c=block_c,
            lambda_lse=lambda_lse,
            lambda_softmax=lambda_softmax,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nc_pad // block_c, ni_pad, block_c), jnp.float32
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_i, r, d), lambda i, c: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_i, r, r), lambda i, c: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (d, bcl), lambda i, c: (0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bcl), lambda i, c: (0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, bcl), lambda i, c: (0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bcl, block_c), lambda i, c: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_i, block_c), lambda i, c: (c, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(images, gram, cap_t, cap_norm, mask_row, group)

    out = jnp.transpose(out, (1, 0, 2)).reshape(ni_pad, nc_pad)
    return out[:ni, :nc]
