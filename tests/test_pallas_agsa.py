"""Fused Pallas AGSA gated-attention kernel vs the XLA chain (interpret
mode), plus the GatedQueryAttLayer routing and the shard_map variant.

The kernel fuses the per-head gate (fc_q*fc_k -> fc_g -> sigmoid), scaled
scores, softmax and AV product in VMEM (itrx/ops/pallas/agsa_attn.py);
CAMERA routes to it for bf16 maskless attention.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from itrx.ops.pallas import force_interpret
from itrx.ops.pallas.agsa_attn import agsa_attention, agsa_attention_auto


def _xla_chain(q, k, v, wq, bq, wk, bk, wg1, bg1, wg2, bg2):
    dk = q.shape[-1]
    g = (q @ wq + bq) * (k @ wk + bk)
    m1 = jax.nn.sigmoid(g @ wg1 + bg1)
    m2 = jax.nn.sigmoid(g @ wg2 + bg2)
    qm = q * m1
    km = k * m2
    scores = jnp.einsum("bhqd,bhkd->bhqk", qm, km) / math.sqrt(dk)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _data(rng, b=6, h=4, n=9, dk=16):
    t = lambda *s: jnp.asarray(  # noqa: E731
        (rng.standard_normal(s) * 0.3).astype(np.float32)
    )
    qkv = (t(b, h, n, dk), t(b, h, n, dk), t(b, h, n, dk))
    w = (
        t(dk, dk), t(dk), t(dk, dk), t(dk),
        t(dk, dk), t(dk), t(dk, dk), t(dk),
    )
    return qkv, w


def test_agsa_forward_matches_xla(rng):
    (q, k, v), w = _data(rng)
    want = _xla_chain(q, k, v, *w)
    got = agsa_attention(q, k, v, *w, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
    )


def test_agsa_forward_batch_padding(rng):
    # b not a multiple of the batch block exercises row padding
    (q, k, v), w = _data(rng, b=7, h=64, n=5, dk=8)
    want = _xla_chain(q, k, v, *w)
    got = agsa_attention(q, k, v, *w, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
    )


def test_agsa_gradients_match_xla(rng):
    (q, k, v), w = _data(rng)
    cot = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

    def loss_fused(*args):
        return jnp.sum(agsa_attention(*args, True) * cot)

    def loss_xla(*args):
        return jnp.sum(_xla_chain(*args) * cot)

    args = (q, k, v, *w)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(11)))(*args)
    g_xla = jax.grad(loss_xla, argnums=tuple(range(11)))(*args)
    names = ["q", "k", "v", "wq", "bq", "wk", "bk", "wg1", "bg1", "wg2", "bg2"]
    for name, gf, gx in zip(names, g_fused, g_xla):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=5e-5, rtol=1e-3,
            err_msg=name,
        )


def test_agsa_layer_routes_fused(rng):
    """GatedQueryAttLayer routes bf16 maskless inputs to the kernel and the
    result matches its own XLA path within bf16 tolerance."""
    from itrx.models.agsa import GatedQueryAttLayer
    from itrx.ops.pallas import dispatch_counts, reset_dispatch

    b, n, d, h = 6, 9, 64, 4
    x32 = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    layer = GatedQueryAttLayer(d, h)
    params = layer.init(jax.random.PRNGKey(0), x32)

    want = layer.apply(params, x32)  # fp32 XLA path
    reset_dispatch()
    with force_interpret():
        p16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params
        )
        got = layer.apply(p16, x32.astype(jnp.bfloat16))
    assert dispatch_counts().get("agsa_fused", 0) == 1, dispatch_counts()
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.05, rtol=0.05
    )


def test_agsa_sharded_matches_direct(rng):
    """shard_map wrapper over the 8-device mesh == direct kernel call."""
    from itrx.ops.pallas import shard_ctx
    from itrx.parallel.mesh import make_mesh

    (q, k, v), w = _data(rng, b=11, h=4, n=9, dk=16)  # 11: dp padding
    direct = agsa_attention(q, k, v, *w, True)
    mesh = make_mesh()
    with force_interpret():
        @jax.jit
        def f(q, k, v, *w):
            with shard_ctx(mesh):
                return agsa_attention_auto(q, k, v, *w)

        sharded = f(q, k, v, *w)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(direct), atol=3e-5, rtol=1e-4
    )


def test_agsa_gradients_bf16_drift_bounded(rng):
    """Production bf16 inputs: kernel gradients stay near the fp32 oracle
    (the backward recomputes gates in the input dtype)."""
    (q, k, v), w = _data(rng, b=4, h=3, n=8, dk=16)
    cot = jnp.asarray(rng.standard_normal(q.shape).astype(np.float32))

    def loss_fused(*args):
        out = agsa_attention(*args, True).astype(jnp.float32)
        return jnp.sum(out * cot)

    def loss_oracle(*args):
        return jnp.sum(_xla_chain(*args) * cot)

    b16 = lambda x: x.astype(jnp.bfloat16)  # noqa: E731
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 5, 7, 9))(
        b16(q), b16(k), b16(v), *w
    )
    g_ora = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 5, 7, 9))(q, k, v, *w)
    for name, gf, gx in zip("q k v wq wk wg1 wg2".split(), g_fused, g_ora):
        gf = np.asarray(gf, np.float32)
        gx = np.asarray(gx, np.float32)
        scale = max(np.abs(gx).max(), 1e-6)
        assert np.max(np.abs(gf - gx)) / scale < 0.08, name
