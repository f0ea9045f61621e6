"""Fused Pallas GRU vs the lax.scan reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from itrx.ops.rnn import gru_scan
from itrx.ops.pallas.gru import gru_scan_fused


def _params(rng, d, h):
    k = 1.0 / np.sqrt(h)
    u = lambda *s: jnp.asarray(rng.uniform(-k, k, s).astype(np.float32))
    return u(3 * h, d), u(3 * h, h), u(3 * h), u(3 * h)


def _data(rng, b=16, l=12, d=64):
    x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    lengths = rng.integers(1, l + 1, b)
    mask = jnp.asarray((np.arange(l)[None] < lengths[:, None]).astype(np.float32))
    return x, mask


def test_fused_forward_matches_scan(rng):
    x, mask = _data(rng)
    w_ih, w_hh, b_ih, b_hh = _params(rng, 64, 128)
    for reverse in (False, True):
        want_o, want_h = gru_scan(x, mask, w_ih, w_hh, b_ih, b_hh, reverse=reverse)
        got_o, got_h = gru_scan_fused(
            x, mask, w_ih, w_hh, b_ih, b_hh, reverse=reverse, interpret=True, dot_dtype="float32"
        )
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                                   atol=2e-5, rtol=1e-5)


def test_fused_forward_ragged_batch(rng):
    # batch not a multiple of 8 exercises the batch padding
    x, mask = _data(rng, b=13, l=9)
    w_ih, w_hh, b_ih, b_hh = _params(rng, 64, 128)
    want_o, want_h = gru_scan(x, mask, w_ih, w_hh, b_ih, b_hh)
    got_o, got_h = gru_scan_fused(x, mask, w_ih, w_hh, b_ih, b_hh, interpret=True, dot_dtype="float32")
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h), atol=2e-5)


def test_fused_grads_match_scan(rng):
    x, mask = _data(rng, b=8, l=10)
    w_ih, w_hh, b_ih, b_hh = _params(rng, 64, 128)

    def loss(fn, interpret=None):
        def f(x, w_ih, w_hh, b_ih, b_hh):
            kw = {} if interpret is None else {"interpret": interpret, "dot_dtype": "float32"}
            outs, final = fn(x, mask, w_ih, w_hh, b_ih, b_hh, reverse=True, **kw)
            return jnp.sum(outs * outs) + 2.0 * jnp.sum(final)
        return f

    want = jax.grad(loss(gru_scan), argnums=(0, 1, 2, 3, 4))(
        x, w_ih, w_hh, b_ih, b_hh
    )
    got = jax.grad(loss(gru_scan_fused, interpret=True), argnums=(0, 1, 2, 3, 4))(
        x, w_ih, w_hh, b_ih, b_hh
    )
    names = ("dx", "dw_ih", "dw_hh", "db_ih", "db_hh")
    for nm, w, g in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=3e-4, rtol=2e-4, err_msg=nm
        )


def test_fused_grads_forward_direction(rng):
    x, mask = _data(rng, b=8, l=7)
    w_ih, w_hh, b_ih, b_hh = _params(rng, 64, 128)

    def f(fn, kw):
        def loss(x, w_hh):
            outs, final = fn(x, mask, w_ih, w_hh, b_ih, b_hh, **kw)
            return jnp.sum(jnp.tanh(outs)) + jnp.sum(final * final)
        return loss

    want = jax.grad(f(gru_scan, {}), argnums=(0, 1))(x, w_hh)
    got = jax.grad(f(gru_scan_fused, {"interpret": True, "dot_dtype": "float32"}), argnums=(0, 1))(x, w_hh)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=3e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               atol=3e-4, rtol=2e-4)


def test_fused_grads_bf16_dot_bounded_drift(rng):
    """Production default dot_dtype='bfloat16': the backward recomputes
    gates from bf16-saved pre-activations, so gradients drift slightly from
    the fp32 scan.  Bound that drift (ADVICE r2: the exactness tests all
    pin dot_dtype='float32', leaving the production grad path untested)."""
    x, mask = _data(rng, b=8, l=10)
    w_ih, w_hh, b_ih, b_hh = _params(rng, 64, 128)

    def loss(fn, kw):
        def f(x_, w_hh_):
            o, h = fn(x_, mask, w_ih, w_hh_, b_ih, b_hh, **kw)
            return jnp.sum(o * jnp.cos(o)) + jnp.sum(h * h)

        return f

    want = jax.grad(loss(gru_scan, {}), argnums=(0, 1))(x, w_hh)
    got = jax.grad(
        loss(gru_scan_fused, {"interpret": True, "dot_dtype": "bfloat16"}),
        argnums=(0, 1),
    )(x, w_hh)
    for g, w, what in zip(got, want, ("dx", "dw_hh")):
        g, w = np.asarray(g), np.asarray(w)
        denom = np.maximum(np.abs(w).max(), 1e-3)
        rel = np.abs(g - w).max() / denom
        # bf16 has ~3 decimal digits; the recurrence compounds ~L of them
        assert rel < 0.05, f"{what}: bf16-dot grad drift {rel} too large"
        # and the drift must not be pathological zero-output either
        assert np.abs(g).max() > 0.1 * denom
