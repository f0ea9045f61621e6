"""Fused SGRAF local-alignment chain — Pallas TPU kernels with custom VJP.

Computes, for every (caption, image) pair, SGRAF's normalized local
alignment vectors (ref itr/modalmodule/Fusionmodule.py:406-451, 632-664):

    a    = leaky_relu(cap_cl . img_ir) * word_mask          (SCAN_attention)
    attn = a / ||a||_words            (l2 over the caption's words, per r)
    s    = softmax_r(attn * 9)
    ctx  = l2norm_D(sum_r s * img_ir)
    out  = l2norm_S(W (ctx - cap)^2 + b)                    (sim_tranloc_w)

The XLA path materializes the (C, Ni, L, D) context tensor and its layout
copies in HBM every chunk — measured as the dominant cost of the SGRAF
train step.  Here the whole chain runs in VMEM per (caption-block, image)
grid step: one image per step makes the region softmax a plain row softmax
and the word-group l2norm a sublane-group reduction; ctx and the squared
difference never leave the chip.

The backward recomputes the chain per block (the dots are tiny) and keeps
three accumulators: caption-gradient in a VMEM scratch over the inner image
axis, dW/db in constant-index revisited outputs, and per-caption-block
image-gradient partials reduced outside (one XLA sum).

Matmul precision: bf16 operands / fp32 accumulation (the production
sim_bf16 mode); fp32 operands use HIGHEST for interpret-mode parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8


def _pick_block_c(nc: int, l: int, bwd: bool = False) -> int:
    """Captions per grid step.  The per-pair chain is tiny (~263 MFLOP at
    block_c=8), so the fixed per-grid-step cost (block DMAs, semaphores)
    dominates; target ~1536 caption-word rows per step (~1 GFLOP) for the
    forward.  The backward holds the recomputed chain plus five more
    row-major fp32 gradient tensors, so it targets half the rows."""
    bc = max(1, (768 if bwd else 1536) // l)
    return min(bc, nc)


def _vmem_limit(bc, l, d, s_dim, rp, bwd):
    """Scoped-VMEM request covering the kernel stack (the XLA default 16MB
    is sized for streaming kernels; this one keeps a whole caption block's
    fp32 chain resident — v5e has 128MB/core)."""
    lane = lambda n: -(-n // 128) * 128
    bcl = bc * l
    row = lambda width, bytes_=4: bcl * lane(width) * bytes_
    # grid-indexed blocks are double-buffered: cap (bf16/fp32), mask, out/g
    blocks = 2 * (row(d, 2) + row(1) + bcl * lane(s_dim) * 2)
    blocks += 4 * rp * d * 4 + d * s_dim * 2  # img block (x2) + weights
    chain = 5 * row(rp) + 3 * row(d) + 2 * row(s_dim)
    if bwd:
        # gy/gdiff/gd/gctx/gcap + gcap_acc scratch + region-grad rows
        chain += 6 * row(d) + 3 * row(rp) + 2 * row(s_dim)
    return int(min(max((blocks + chain) * 1.25, 24 << 20), 100 << 20))


def _dot(x, y, bf16, **kw):
    return jax.lax.dot_general(
        x, y, kw.pop("dims", (((1,), (0,)), ((), ()))),
        precision=None if bf16 else jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _chain_fwd(cap2d, img_i, mask, colm, w, b, *, bc, l, bf16):
    """The alignment chain for one (caption-block, image) pair, in VMEM.

    cap2d (BC*L, D); img_i (Rp, D) zero-padded regions; mask (BC*L, 1);
    colm (1, Rp) 1 for real regions.  Returns intermediates for reuse.
    """
    a = _dot(cap2d, img_i, bf16, dims=(((1,), (1,)), ((), ())))  # (BCL, Rp)
    h = jnp.where(a > 0, a, 0.1 * a) * mask
    # l2 over each caption's words, per region column (sublane groups of L)
    sq = jnp.sum((h * h).reshape(bc, l, -1), axis=1, keepdims=True)
    inv = 1.0 / (jnp.sqrt(jnp.maximum(sq, 0.0)) + EPS)
    attn = (h.reshape(bc, l, -1) * inv).reshape(h.shape)
    # softmax over regions per row; |attn| <= 1 so exp(9*attn) is safe
    e = jnp.exp(attn * 9.0) * colm
    s = e / jnp.sum(e, axis=1, keepdims=True)  # (BCL, Rp)
    ctx = _dot(s.astype(img_i.dtype) if bf16 else s, img_i, bf16)  # (BCL, D)
    csq = jnp.sum(ctx * ctx, axis=1, keepdims=True)
    cinv = 1.0 / (jnp.sqrt(jnp.maximum(csq, 0.0)) + EPS)
    ctxn = ctx * cinv
    diff = (ctxn - cap2d.astype(jnp.float32)) ** 2  # (BCL, D)
    y = _dot(diff.astype(w.dtype), w, bf16) + b  # (BCL, S)
    ysq = jnp.sum(y * y, axis=1, keepdims=True)
    yinv = 1.0 / (jnp.sqrt(jnp.maximum(ysq, 0.0)) + EPS)
    return a, h, inv, attn, s, ctx, cinv, ctxn, diff, y, yinv


def _fwd_kernel(cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref, out_ref,
                *, bc, l, bf16):
    _, _, _, _, _, _, _, _, _, y, yinv = _chain_fwd(
        cap_ref[:], imgr_ref[0], mask_ref[:], colm_ref[:],
        w_ref[:], b_ref[:], bc=bc, l=l, bf16=bf16,
    )
    out = (y * yinv).astype(out_ref.dtype)
    out_ref[:] = out.reshape(bc, 1, l, -1)


def _bwd_kernel(cap_ref, imgr_ref, mask_ref, colm_ref, w_ref, b_ref, g_ref,
                gcap_ref, gimg_ref, gw_ref, gb_ref, gcap_acc, *, bc, l, bf16,
                n_img):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        gcap_acc[:] = jnp.zeros(gcap_acc.shape, gcap_acc.dtype)

    @pl.when((pl.program_id(0) == 0) & (i == 0))
    def _():
        gw_ref[:] = jnp.zeros(gw_ref.shape, gw_ref.dtype)
        gb_ref[:] = jnp.zeros(gb_ref.shape, gb_ref.dtype)

    cap2d = cap_ref[:]
    img_i = imgr_ref[0]
    mask = mask_ref[:]
    colm = colm_ref[:]
    w = w_ref[:]
    a, h, inv, attn, s, ctx, cinv, ctxn, diff, y, yinv = _chain_fwd(
        cap2d, img_i, mask, colm, w, b_ref[:], bc=bc, l=l, bf16=bf16,
    )
    g = g_ref[:].reshape(y.shape).astype(jnp.float32)  # (BCL, S)

    # l2norm over S bwd (the O(eps/|y|) correction from the +eps in the
    # normalizer is dropped — see tests for the tolerance this holds to)
    gy = (g - y * yinv * jnp.sum(g * y * yinv, axis=1, keepdims=True)) * yinv
    # projection bwd
    gdiff = _dot(gy.astype(w.dtype), w, bf16,
                 dims=(((1,), (1,)), ((), ())))  # (BCL, D), contraction on S
    gw_ref[:] = gw_ref[:] + _dot(
        diff.astype(w.dtype), gy.astype(w.dtype), bf16,
        dims=(((0,), (0,)), ((), ())),
    )
    gb_ref[:] = gb_ref[:] + jnp.sum(gy, axis=0, keepdims=True)
    # diff = (ctxn - cap)^2
    gd = 2.0 * (ctxn - cap2d.astype(jnp.float32)) * gdiff
    gcap_from_diff = -gd
    # l2norm over D bwd
    gctx = (gd - ctxn * jnp.sum(gd * ctxn, axis=1, keepdims=True)) * cinv
    # ctx = s @ img
    gs = _dot(gctx.astype(img_i.dtype) if bf16 else gctx, img_i, bf16,
              dims=(((1,), (1,)), ((), ())))  # (BCL, Rp)
    gimg = _dot(s.astype(jnp.float32), gctx, bf16,
                dims=(((0,), (0,)), ((), ())))  # (Rp, D) partial (this block)
    # softmax bwd (over regions, per row)
    gz = s * (gs - jnp.sum(gs * s, axis=1, keepdims=True))
    gattn = gz * 9.0
    # word-group l2norm bwd: attn = h * inv (inv per (caption, region))
    g3 = gattn.reshape(bc, l, -1)
    hn3 = attn.reshape(bc, l, -1)
    gh3 = (g3 - hn3 * jnp.sum(g3 * hn3, axis=1, keepdims=True)) * inv
    gh = gh3.reshape(h.shape) * mask
    ga = jnp.where(a > 0, gh, 0.1 * gh)  # (BCL, Rp)
    # a = cap @ img^T
    gcap = _dot(ga.astype(img_i.dtype) if bf16 else ga, img_i, bf16)  # (BCL, D)
    gimg = gimg + _dot(ga, cap2d.astype(jnp.float32), bf16,
                       dims=(((0,), (0,)), ((), ())))  # (Rp, D)

    gcap_acc[:] = gcap_acc[:] + gcap + gcap_from_diff
    gimg_ref[0, 0] = gimg.astype(gimg_ref.dtype)

    @pl.when(i == n_img - 1)
    def _():
        gcap_ref[:] = gcap_acc[:].astype(gcap_ref.dtype)


def _prep(cap, mask, img, block_c):
    nc, l, d = cap.shape
    ni, r, _ = img.shape
    rp = ((r + 7) // 8) * 8
    nc_pad = -(-nc // block_c) * block_c
    if nc_pad != nc:
        cap = jnp.pad(cap, ((0, nc_pad - nc), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, nc_pad - nc), (0, 0)))
        # one valid word keeps the normalizers finite on padded captions
        mask = mask.at[nc:, 0].set(1.0)
    imgr = jnp.pad(img, ((0, 0), (0, rp - r), (0, 0)))  # (Ni, Rp, D)
    cap2d = cap.reshape(nc_pad * l, d)
    maskf = mask.astype(jnp.float32).reshape(nc_pad * l, 1)
    colm = jnp.asarray(
        (np.arange(rp) < r).astype(np.float32).reshape(1, rp)
    )
    return cap2d, maskf, imgr, colm, nc_pad, rp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def sgraf_align(cap, mask, img, w, b, block_c: int = 8,
                interpret: bool = False):
    """Fused normalized local-alignment vectors.

    cap (Nc, L, D) word embeddings (L % 8 == 0; padded words masked);
    mask (Nc, L); img (Ni, R, D); w (D, S), b (S,) — the sim_tranloc_w
    Dense.  Returns (Nc, Ni, L, S), matching
    l2norm(W(l2norm(ctx) - cap)^2 + b) of the XLA chunk scorer.
    """
    out, _ = _align_fwd_impl(cap, mask, img, w, b, block_c, interpret)
    return out


def _align_fwd_impl(cap, mask, img, w, b, block_c, interpret):
    nc, l, d = cap.shape
    ni = img.shape[0]
    s_dim = w.shape[1]
    bf16 = cap.dtype == jnp.bfloat16
    cap2d, maskf, imgr, colm, nc_pad, rp = _prep(cap, mask, img, block_c)
    wk = w.astype(cap.dtype)
    bk = b.reshape(1, s_dim).astype(jnp.float32)
    bcl = block_c * l
    grid = (nc_pad // block_c, ni)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bc=block_c, l=l, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bcl, d), lambda c, i: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, d), lambda c, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bcl, 1), lambda c, i: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, s_dim), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_dim), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_c, 1, l, s_dim), lambda c, i: (c, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nc_pad, ni, l, s_dim), cap.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(block_c, l, d, s_dim, rp, bwd=False)
        ),
    )(cap2d, imgr, maskf, colm, wk, bk)
    return out[:nc], (cap, mask, img, w, b)


def _align_vjp_fwd(cap, mask, img, w, b, block_c, interpret):
    return _align_fwd_impl(cap, mask, img, w, b, block_c, interpret)


def _align_vjp_bwd(block_c, interpret, res, g):
    cap, mask, img, w, b = res
    nc, l, d = cap.shape
    ni = img.shape[0]
    s_dim = w.shape[1]
    bf16 = cap.dtype == jnp.bfloat16
    # the backward's VMEM stack is ~2x the forward's (recomputed chain plus
    # the gradient rows), so it picks its own, smaller caption block — each
    # (caption, image) pair's chain is independent and gw/gb accumulate in
    # fp32, so the block size never changes the math
    block_c = min(block_c, _pick_block_c(nc, l, bwd=True))
    cap2d, maskf, imgr, colm, nc_pad, rp = _prep(cap, mask, img, block_c)
    wk = w.astype(cap.dtype)
    bk = b.reshape(1, s_dim).astype(jnp.float32)
    bcl = block_c * l
    n_cb = nc_pad // block_c
    grid = (n_cb, ni)
    if nc_pad != nc:
        g = jnp.pad(g, ((0, nc_pad - nc), (0, 0), (0, 0), (0, 0)))

    gcap, gimg_p, gw, gb = pl.pallas_call(
        functools.partial(
            _bwd_kernel, bc=block_c, l=l, bf16=bf16, n_img=ni
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bcl, d), lambda c, i: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, d), lambda c, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bcl, 1), lambda c, i: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, s_dim), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_dim), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_c, 1, l, s_dim), lambda c, i: (c, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((bcl, d), lambda c, i: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, rp, d), lambda c, i: (c, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((d, s_dim), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_dim), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc_pad * l, d), jnp.float32),
            jax.ShapeDtypeStruct((n_cb, ni, rp, d), jnp.float32),
            jax.ShapeDtypeStruct((d, s_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, s_dim), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bcl, d), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(block_c, l, d, s_dim, rp, bwd=True)
        ),
    )(cap2d, imgr, maskf, colm, wk, bk, g)

    gcap = gcap.reshape(nc_pad, l, d)[:nc].astype(cap.dtype)
    gimg = jnp.sum(gimg_p, axis=0)[:, : img.shape[1]].astype(img.dtype)
    return (gcap, jnp.zeros_like(mask), gimg, gw.astype(w.dtype),
            gb.reshape(-1).astype(b.dtype))


sgraf_align.defvjp(_align_vjp_fwd, _align_vjp_bwd)


def sgraf_align_auto(cap, mask, img, w, b, block_c: int | None = None):
    """Routing entry for the fused alignment: resolves interpret mode from
    the context and shard_maps over images when a mesh is active.
    block_c=None picks the caption block adaptively (_pick_block_c).

    The grid's image axis is embarrassingly parallel: under a mesh each
    device runs the kernel for its image shard against the (replicated)
    caption chunk, producing the (Nc, Ni, L, S) alignment tensor sharded on
    axis 1.  The custom-VJP backward stays per-shard (gimg is local; gcap
    and gw/gb cotangents are psummed by the shard_map transpose,
    check_vma=False).  Images are zero-padded to a 'dp' multiple — the
    chain stays finite on zero regions and the padded outputs are sliced.
    """
    from . import interpret_mode, record_dispatch, shard_mesh

    if block_c is None:
        block_c = _pick_block_c(cap.shape[0], cap.shape[1])
    interpret = interpret_mode()
    mesh = shard_mesh()
    if mesh is None:
        record_dispatch("sgraf_align")
        return sgraf_align(cap, mask, img, w, b, block_c, interpret)

    from jax.sharding import PartitionSpec as P

    record_dispatch("sgraf_align_sharded")
    ndp = mesh.shape["dp"]
    ni = img.shape[0]
    ni_pad = ((ni + ndp - 1) // ndp) * ndp
    if ni_pad != ni:
        img = jnp.pad(img, ((0, ni_pad - ni), (0, 0), (0, 0)))

    out = jax.shard_map(
        lambda c_, m_, i_, w_, b_: sgraf_align(c_, m_, i_, w_, b_,
                                               block_c, interpret),
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P(), P()),
        out_specs=P(None, "dp"),
        check_vma=False,
    )(cap, mask, img, w, b)
    return out[:, :ni]
