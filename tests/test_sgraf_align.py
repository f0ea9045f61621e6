"""Fused SGRAF alignment kernel vs the pure-JAX chain (interpret on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from itrx.ops.pallas.sgraf_align import sgraf_align

EPS = 1e-8


def _ref_chain(cap, mask, img, w, b):
    """Mirror of _ChunkScorer's alignment math (itrx/models/sgraf.py)."""
    a = jnp.einsum("ird,cld->cirl", img, cap)
    a = jax.nn.leaky_relu(a, negative_slope=0.1)
    a = a * mask[:, None, None, :]
    sq = jnp.sum((a * a).astype(jnp.float32), axis=3, keepdims=True)
    a = a * (1.0 / (jnp.sqrt(jnp.maximum(sq, 0.0)) + EPS))
    attn = jax.nn.softmax(jnp.swapaxes(a, 2, 3) * 9.0, axis=3)
    ctx = jnp.einsum("cilr,ird->cild", attn, img)
    csq = jnp.sum((ctx * ctx).astype(jnp.float32), axis=-1, keepdims=True)
    ctx = ctx * (1.0 / (jnp.sqrt(jnp.maximum(csq, 0.0)) + EPS))
    diff = (ctx - cap[:, None, :, :]) ** 2
    y = diff @ w + b
    ysq = jnp.sum((y * y).astype(jnp.float32), axis=-1, keepdims=True)
    return y * (1.0 / (jnp.sqrt(jnp.maximum(ysq, 0.0)) + EPS))


def _data(rng, nc=10, ni=6, r=36, l=16, d=128, s=128):
    lengths = rng.integers(2, l + 1, nc)
    mask = jnp.asarray((np.arange(l)[None] < lengths[:, None]).astype(np.float32))
    cap = jnp.asarray(rng.standard_normal((nc, l, d)).astype(np.float32))
    cap = cap * mask[:, :, None]
    img = jnp.asarray(rng.standard_normal((ni, r, d)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((d, s)) * 0.05).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(s) * 0.01).astype(np.float32))
    return cap, mask, img, w, b


def test_align_forward_matches_chain(rng):
    cap, mask, img, w, b = _data(rng)
    want = _ref_chain(cap, mask, img, w, b)  # (C, Ni, L, S)
    got = sgraf_align(cap, mask, img, w, b, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_align_forward_ragged_captions(rng):
    cap, mask, img, w, b = _data(rng, nc=13, ni=4)
    want = _ref_chain(cap, mask, img, w, b)
    got = sgraf_align(cap, mask, img, w, b, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_align_large_block_matches_chain(rng):
    """Adaptive blocking (block_c ~ 1536//L captions per grid step) must be
    a pure scheduling change: same numbers as the reference chain, ragged
    caption count exercising the block padding."""
    from itrx.ops.pallas.sgraf_align import _pick_block_c

    cap, mask, img, w, b = _data(rng, nc=37, ni=5)
    want = _ref_chain(cap, mask, img, w, b)
    bc = _pick_block_c(cap.shape[0], cap.shape[1])
    assert bc > 8  # the point of the test: a genuinely larger block
    got = sgraf_align(cap, mask, img, w, b, bc, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_align_large_block_grads_match_chain(rng):
    """Backward with a large forward block (its own smaller internal pick)
    matches the XLA chain's gradients."""
    cap, mask, img, w, b = _data(rng, nc=24, ni=3, l=8)
    tgt = jnp.asarray(rng.standard_normal((24, 3, 8, 128)).astype(np.float32))

    def loss_ref(cap, img, w, b):
        return jnp.sum((_ref_chain(cap, mask, img, w, b) - tgt) ** 2)

    def loss_ker(cap, img, w, b):
        return jnp.sum((sgraf_align(cap, mask, img, w, b, 24, True) - tgt) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(cap, img, w, b)
    got = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(cap, img, w, b)
    for nm, a_, b_ in zip(("dcap", "dimg", "dw", "db"), want, got):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a_), atol=2e-3, rtol=2e-3, err_msg=nm
        )


def test_align_grads_match_chain(rng):
    cap, mask, img, w, b = _data(rng, nc=8, ni=4, l=8)
    tgt = jnp.asarray(rng.standard_normal((8, 4, 8, 128)).astype(np.float32))

    def loss_ref(cap, img, w, b):
        return jnp.sum((_ref_chain(cap, mask, img, w, b) - tgt) ** 2)

    def loss_ker(cap, img, w, b):
        return jnp.sum((sgraf_align(cap, mask, img, w, b, 8, True) - tgt) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(cap, img, w, b)
    got = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(cap, img, w, b)
    for nm, a_, b_ in zip(("dcap", "dimg", "dw", "db"), want, got):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a_), atol=2e-3, rtol=2e-3, err_msg=nm
        )
