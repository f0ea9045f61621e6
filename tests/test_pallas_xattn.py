"""Fused Pallas SCAN kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from itrx.ops import attention
from itrx.ops.pallas.xattn import xattn_i2t_fused, xattn_t2i_fused


def _data(rng, ni=32, nc=40, r=36, l=48, d=64):
    img = rng.standard_normal((ni, r, d)).astype(np.float32)
    lengths = rng.integers(5, l + 1, nc)
    mask = (np.arange(l)[None] < lengths[:, None]).astype(np.float32)
    cap = (rng.standard_normal((nc, l, d)) * mask[:, :, None]).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(cap), jnp.asarray(mask)


def test_fused_matches_xla(rng):
    img, cap, mask = _data(rng)
    want = attention.xattn_score_t2i(img, cap, mask)
    got = xattn_t2i_fused(img, cap, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_ragged_padding(rng):
    img, cap, mask = _data(rng, ni=21, nc=29)
    want = attention.xattn_score_t2i(img, cap, mask)
    got = xattn_t2i_fused(img, cap, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_single_word_caption(rng):
    img, cap, mask = _data(rng, ni=16, nc=16)
    mask = mask.at[0].set(jnp.zeros(48).at[0].set(1.0))
    cap = cap * mask[:, :, None]
    want = attention.xattn_score_t2i(img, cap, mask)
    got = xattn_t2i_fused(img, cap, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    assert np.all(np.isfinite(np.asarray(got)))


def test_fused_t2i_mean(rng):
    img, cap, mask = _data(rng, ni=24, nc=33)
    want = attention.xattn_score_t2i(img, cap, mask, agg_func="Mean")
    got = xattn_t2i_fused(img, cap, mask, agg_func="Mean", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_i2t_matches_xla(rng):
    img, cap, mask = _data(rng)
    want = attention.xattn_score_i2t(img, cap, mask)
    got = xattn_i2t_fused(img, cap, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_i2t_ragged_and_mean(rng):
    img, cap, mask = _data(rng, ni=21, nc=29)
    want = attention.xattn_score_i2t(img, cap, mask)
    got = xattn_i2t_fused(img, cap, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    want = attention.xattn_score_i2t(img, cap, mask, agg_func="Mean")
    got = xattn_i2t_fused(img, cap, mask, agg_func="Mean", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_i2t_single_word_caption(rng):
    img, cap, mask = _data(rng, ni=16, nc=16)
    mask = mask.at[0].set(jnp.zeros(48).at[0].set(1.0))
    cap = cap * mask[:, :, None]
    want = attention.xattn_score_i2t(img, cap, mask)
    got = xattn_i2t_fused(img, cap, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    assert np.all(np.isfinite(np.asarray(got)))
