"""Parity tests for batched SCAN cross-attention vs an independent per-caption
numpy oracle implementing the reference loop semantics
(itr/modalmodule/Objectives.py:329-476)."""

import numpy as np
import pytest

from itrx.ops import attention


def np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_l2norm(x, axis):
    return x / (np.sqrt((x * x).sum(axis=axis, keepdims=True)) + 1e-8)


def np_leaky(x, a=0.1):
    return np.where(x > 0, x, a * x)


def oracle_func_attention(query, context, norm, smooth):
    """query (B,Lq,D), context (B,Ls,D) -> weighted context (B,Lq,D)."""
    attn = np.einsum("bsd,bqd->bsq", context, query)
    if norm == "clipped_l2norm":
        attn = np_l2norm(np_leaky(attn), axis=2)
    elif norm == "softmax":
        attn = np_softmax(attn, axis=2)
    elif norm == "l2norm":
        attn = np_l2norm(attn, axis=2)
    elif norm == "no_norm":
        pass
    else:
        raise ValueError(norm)
    attn = np.swapaxes(attn, 1, 2)  # (B, Lq, Ls)
    attn = np_softmax(attn * smooth, axis=2)
    return np.einsum("bqs,bsd->bqd", attn, context)


def oracle_xattn_t2i(images, captions, lengths, norm, agg, l_lse, l_sm):
    ni = images.shape[0]
    sims = []
    for c in range(captions.shape[0]):
        n_word = lengths[c]
        cap_i = np.repeat(captions[c : c + 1, :n_word], ni, axis=0)  # (Ni, nw, D)
        wctx = oracle_func_attention(cap_i, images, norm, l_sm)
        w12 = (cap_i * wctx).sum(-1)
        w1 = np.linalg.norm(cap_i, axis=-1)
        w2 = np.linalg.norm(wctx, axis=-1)
        row = w12 / np.maximum(w1 * w2, 1e-8)
        sims.append(_agg(row, agg, l_lse))
    return np.stack(sims, axis=1)


def oracle_xattn_i2t(images, captions, lengths, norm, agg, l_lse, l_sm):
    ni = images.shape[0]
    sims = []
    for c in range(captions.shape[0]):
        n_word = lengths[c]
        cap_i = np.repeat(captions[c : c + 1, :n_word], ni, axis=0)
        wctx = oracle_func_attention(images, cap_i, norm, l_sm)
        w12 = (images * wctx).sum(-1)
        w1 = np.linalg.norm(images, axis=-1)
        w2 = np.linalg.norm(wctx, axis=-1)
        row = w12 / np.maximum(w1 * w2, 1e-8)
        sims.append(_agg(row, agg, l_lse))
    return np.stack(sims, axis=1)


def _agg(row, agg, l_lse):
    if agg == "LogSumExp":
        return np.log(np.exp(row * l_lse).sum(1)) / l_lse
    if agg == "Max":
        return row.max(1)
    if agg == "Sum":
        return row.sum(1)
    if agg == "Mean":
        return row.mean(1)
    raise ValueError(agg)


def _data(rng, ni=7, nc=11, r=9, lmax=13, d=32):
    images = rng.standard_normal((ni, r, d)).astype(np.float32)
    captions = rng.standard_normal((nc, lmax, d)).astype(np.float32)
    lengths = rng.integers(2, lmax + 1, size=nc)
    lengths[0] = lmax
    mask = (np.arange(lmax)[None] < lengths[:, None]).astype(np.float32)
    captions = captions * mask[:, :, None]  # padded words are zero, as produced
    return images, captions, lengths, mask


@pytest.mark.parametrize("agg", ["LogSumExp", "Max", "Sum", "Mean"])
def test_t2i_matches_loop_oracle(rng, agg):
    images, captions, lengths, mask = _data(rng)
    want = oracle_xattn_t2i(images, captions, lengths, "clipped_l2norm", agg, 6.0, 9.0)
    got = attention.xattn_score_t2i(
        images, captions, mask, raw_feature_norm="clipped_l2norm",
        agg_func=agg, lambda_lse=6.0, lambda_softmax=9.0,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("norm", ["clipped_l2norm", "softmax", "l2norm", "no_norm"])
def test_t2i_norms(rng, norm):
    images, captions, lengths, mask = _data(rng, ni=4, nc=6)
    want = oracle_xattn_t2i(images, captions, lengths, norm, "LogSumExp", 6.0, 9.0)
    got = attention.xattn_score_t2i(
        images, captions, mask, raw_feature_norm=norm,
        agg_func="LogSumExp", lambda_lse=6.0, lambda_softmax=9.0,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("agg", ["LogSumExp", "Max", "Mean"])
def test_i2t_matches_loop_oracle(rng, agg):
    images, captions, lengths, mask = _data(rng)
    want = oracle_xattn_i2t(images, captions, lengths, "clipped_l2norm", agg, 6.0, 9.0)
    got = attention.xattn_score_i2t(
        images, captions, mask, raw_feature_norm="clipped_l2norm",
        agg_func=agg, lambda_lse=6.0, lambda_softmax=9.0,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_scan_attention_context_matches_oracle(rng):
    # SGRAF SCAN_attention: same as func_attention + final l2norm of context
    b, lq, ls, d = 5, 8, 9, 16
    q = rng.standard_normal((b, lq, d)).astype(np.float32)
    ctx = rng.standard_normal((b, ls, d)).astype(np.float32)
    want = oracle_func_attention(q, ctx, "clipped_l2norm", 9.0)
    want = np_l2norm(want, axis=-1)
    got = attention.scan_attention_context(q, ctx, np.ones((b, lq), np.float32), 9.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
