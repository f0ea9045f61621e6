"""Batched SCAN stacked cross-attention similarity.

Reference: itr/modalmodule/Objectives.py:329-476 (`xattn_score_t2i/i2t`,
`func_attention`).  The reference loops over captions in Python and runs
per-caption bmm's; here the full (N_img, N_cap) score grid is one fused
computation, and — crucially for HBM — the weighted-context vectors are never
materialized per pair.  For the pair (i, c):

    row_sim_l = cos(cap_cl, sum_r attn_lr * img_ir)

both the numerator  sum_r attn_lr * (img_ir · cap_cl)  and the context norm
|sum_r attn_lr img_ir|^2 = attn^T G_i attn  (G_i the 36x36 region Gram matrix)
are functions of the raw dot-product tensor A[i,c,r,l] and tiny per-image
Grams, so the whole score needs O(Ni*Nc*R*L) memory instead of
O(Ni*Nc*L*D).  Same trick transposed for the i2t direction with per-caption
word Grams.

Variable caption lengths are handled by masks (the reference slices captions
to their length before attention; padded-word positions are excluded from the
l2 normalization over words, from softmaxes over words, and from the final
aggregation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .norms import safe_sqrt

EPS = 1e-8
NEG_INF = -1e18


def _normalize_raw_attn(attn, norm: str, axis: int, mask=None):
    """Apply `raw_feature_norm` over `axis` of the raw attention tensor.

    mask (broadcastable to attn, 1=valid) marks valid positions along `axis`;
    invalid positions are zeroed so they do not leak into the norm (the
    reference never sees them because captions are sliced to length).
    """
    if mask is not None:
        attn = attn * mask
    if norm == "softmax":
        if mask is not None:
            attn = jnp.where(mask > 0, attn, NEG_INF)
        attn = jax.nn.softmax(attn, axis=axis)
        if mask is not None:
            attn = attn * mask
    elif norm == "l2norm":
        attn = attn / (safe_sqrt(jnp.sum(attn * attn, axis=axis, keepdims=True)) + EPS)
    elif norm == "clipped_l2norm":
        attn = jax.nn.leaky_relu(attn, negative_slope=0.1)
        if mask is not None:
            attn = attn * mask
        attn = attn / (safe_sqrt(jnp.sum(attn * attn, axis=axis, keepdims=True)) + EPS)
    elif norm == "l1norm":
        attn = attn / (jnp.sum(jnp.abs(attn), axis=axis, keepdims=True) + EPS)
    elif norm == "clipped_l1norm":
        attn = jax.nn.leaky_relu(attn, negative_slope=0.1)
        if mask is not None:
            attn = attn * mask
        attn = attn / (jnp.sum(jnp.abs(attn), axis=axis, keepdims=True) + EPS)
    elif norm == "clipped":
        attn = jax.nn.leaky_relu(attn, negative_slope=0.1)
        if mask is not None:
            attn = attn * mask
    elif norm == "no_norm":
        pass
    else:
        raise ValueError(f"unknown first norm type: {norm}")
    return attn


def _aggregate(row_sim, agg_func: str, lambda_lse: float, mask, axis: int):
    """Aggregate per-token similarities over `axis` with validity `mask`."""
    if agg_func == "LogSumExp":
        e = jnp.exp(row_sim * lambda_lse) * mask
        return jnp.log(jnp.sum(e, axis=axis)) / lambda_lse
    if agg_func == "Max":
        return jnp.max(jnp.where(mask > 0, row_sim, NEG_INF), axis=axis)
    if agg_func == "Sum":
        return jnp.sum(row_sim * mask, axis=axis)
    if agg_func == "Mean":
        return jnp.sum(row_sim * mask, axis=axis) / jnp.maximum(
            jnp.sum(mask, axis=axis), 1.0
        )
    raise ValueError(f"unknown aggfunc: {agg_func}")


def xattn_score_t2i(
    images,
    captions,
    cap_mask,
    *,
    raw_feature_norm: str = "clipped_l2norm",
    agg_func: str = "LogSumExp",
    lambda_lse: float = 6.0,
    lambda_softmax: float = 9.0,
):
    """Text-to-image stacked cross-attention score grid.

    images: (Ni, R, D); captions: (Nc, L, D); cap_mask: (Nc, L) 1=valid.
    Returns (Ni, Nc).  Ref Objectives.py:329-372 with the per-caption Python
    loop replaced by whole-grid einsums.
    """
    im = images
    cap = captions
    qmask = cap_mask.astype(jnp.float32)  # (Nc, L)

    # raw dots A[i,c,r,l] = img_ir . cap_cl (bf16 inputs ride the MXU at
    # double rate; accumulation stays fp32)
    a = jnp.einsum("ird,cld->icrl", im, cap,
                   preferred_element_type=jnp.float32)
    # the elementwise chain over the A-tensor is the VPU-bound hot path; run
    # it in the input dtype (bf16 eval halves its cost), aggregate in fp32
    wd = im.dtype
    work = a.astype(wd)
    # func_attention: raw_feature_norm over the word axis (l), masked
    attn = _normalize_raw_attn(
        work, raw_feature_norm, axis=3, mask=qmask[None, :, None, :].astype(wd)
    )
    # temperature softmax over regions r (all 36 valid)
    attn = jax.nn.softmax(attn * lambda_softmax, axis=2)  # (Ni,Nc,R,L)

    # numerator: cap_cl . weiContext_icl = sum_r attn * a
    num = jnp.sum((attn * work).astype(jnp.float32), axis=2)  # (Ni,Nc,L)
    # |weiContext|^2 via per-image region Grams
    gram = jnp.einsum("ird,isd->irs", im, im,
                      preferred_element_type=jnp.float32)  # (Ni,R,R)
    gattn = jnp.einsum("irs,icsl->icrl", gram.astype(wd), attn,
                       preferred_element_type=jnp.float32)
    ctx_sq = jnp.sum(attn.astype(jnp.float32) * gattn, axis=2)  # (Ni,Nc,L)
    cap_norm = safe_sqrt(jnp.sum((cap * cap).astype(jnp.float32), axis=-1))  # (Nc,L)
    denom = jnp.maximum(safe_sqrt(ctx_sq) * cap_norm[None], EPS)
    row_sim = num / denom  # (Ni,Nc,L)

    return _aggregate(row_sim, agg_func, lambda_lse, qmask[None], axis=2)


def xattn_score_i2t(
    images,
    captions,
    cap_mask,
    *,
    raw_feature_norm: str = "clipped_l2norm",
    agg_func: str = "LogSumExp",
    lambda_lse: float = 6.0,
    lambda_softmax: float = 9.0,
):
    """Image-to-text stacked cross-attention score grid.

    Ref Objectives.py:376-417: query = image regions, context = caption words;
    the softmax over words is masked, the l2norm over regions needs no mask,
    aggregation is over the 36 regions.
    """
    im = images
    cap = captions
    wmask = cap_mask.astype(jnp.float32)  # (Nc, L)

    # raw dots A[i,c,l,r] = cap_cl . img_ir   (context=cap rows, query=img cols)
    a = jnp.einsum("cld,ird->iclr", cap, im,
                   preferred_element_type=jnp.float32)
    wd = im.dtype
    work = a.astype(wd)
    # raw_feature_norm over the region axis r (padded words produce garbage
    # rows but are masked out of the later softmax over words)
    attn = _normalize_raw_attn(work, raw_feature_norm, axis=3, mask=None)
    # temperature softmax over words l, masked
    logits = jnp.swapaxes(attn, 2, 3) * jnp.asarray(lambda_softmax, wd)
    logits = jnp.where(wmask[None, :, None, :] > 0, logits.astype(jnp.float32), NEG_INF)
    attn_w = jax.nn.softmax(logits, axis=3).astype(wd)  # over words

    # numerator: img_ir . weiContext_icr = sum_l attn_w * a^T
    num = jnp.sum(
        (attn_w * jnp.swapaxes(work, 2, 3)).astype(jnp.float32), axis=3
    )  # (Ni,Nc,R)
    # |weiContext|^2 via per-caption word Grams (padded words zeroed)
    capz = cap * wmask[:, :, None].astype(cap.dtype)
    gram = jnp.einsum("cld,cmd->clm", capz, capz,
                      preferred_element_type=jnp.float32)  # (Nc,L,L)
    gattn = jnp.einsum("clm,icrm->icrl", gram.astype(wd), attn_w,
                       preferred_element_type=jnp.float32)
    ctx_sq = jnp.sum(attn_w.astype(jnp.float32) * gattn, axis=3)  # (Ni,Nc,R)
    im_norm = safe_sqrt(jnp.sum((im * im).astype(jnp.float32), axis=-1))  # (Ni,R)
    denom = jnp.maximum(safe_sqrt(ctx_sq) * im_norm[:, None, :], EPS)
    row_sim = num / denom  # (Ni,Nc,R)

    ones = jnp.ones_like(row_sim)
    return _aggregate(row_sim, agg_func, lambda_lse, ones, axis=2)


def scan_attention_context(query, context, q_mask, smooth: float = 9.0):
    """SGRAF's SCAN_attention (Fusionmodule.py:632-664), batched with masks.

    query: (B, Lq, D) caption words (masked by q_mask (B, Lq));
    context: (B, Ls, D) image regions.  Returns the l2-normalized weighted
    context (B, Lq, D).

    This is the reference-shaped public form (per-pair batch axis), kept as
    the documented primitive and the oracle for tests; the production SGRAF
    scorer computes the same chain in (C, Ni, ...) broadcast form
    (itrx/models/sgraf.py) or in the fused Pallas kernel
    (itrx/ops/pallas/sgraf_align.py).
    """
    attn = jnp.einsum("bsd,bqd->bsq", context, query)  # (B, Ls, Lq)
    attn = jax.nn.leaky_relu(attn, negative_slope=0.1)
    if q_mask is not None:
        attn = attn * q_mask[:, None, :]
    # l2norm over dim 2 (query words)
    attn = attn / (safe_sqrt(jnp.sum(attn * attn, axis=2, keepdims=True)) + EPS)
    attn = jnp.swapaxes(attn, 1, 2)  # (B, Lq, Ls)
    attn = jax.nn.softmax(attn * smooth, axis=2)
    ctx = jnp.einsum("bqs,bsd->bqd", attn, context)
    ctx = ctx / (safe_sqrt(jnp.sum(ctx * ctx, axis=-1, keepdims=True)) + EPS)
    return ctx
