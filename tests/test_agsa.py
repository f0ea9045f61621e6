"""AGSA / Summarization / PositionEncoder vs numpy oracles of the reference
formulas (itr/modalmodule/camera_.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from itrx.models.agsa import AGSA, PositionEncoder, Summarization, absolute_encode


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def test_gated_attention_oracle(rng):
    B, N, D, H = 2, 6, 16, 4
    x = rng.standard_normal((B, N, D)).astype(np.float32)
    m = AGSA(num_layers=1, embed_size=D, h=H, drop=0.0)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    got = np.asarray(m.apply(v, jnp.asarray(x), train=False))

    p = jax.tree.map(np.asarray, v["params"])
    att = p["att_0"]
    dk = D // H

    def lin(name, z):
        return z @ att[name]["kernel"] + att[name]["bias"]

    q = lin("linear_q", x).reshape(B, N, H, dk).transpose(0, 2, 1, 3)
    k = lin("linear_k", x).reshape(B, N, H, dk).transpose(0, 2, 1, 3)
    val = lin("linear_v", x).reshape(B, N, H, dk).transpose(0, 2, 1, 3)
    g = (q @ att["fc_q"]["kernel"] + att["fc_q"]["bias"]) * (
        k @ att["fc_k"]["kernel"] + att["fc_k"]["bias"]
    )
    gate = np_sigmoid(g @ att["fc_g"]["kernel"] + att["fc_g"]["bias"])
    q = q * gate[..., :dk]
    k = k * gate[..., dk:]
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dk)
    pa = np_softmax(scores, axis=-1)
    y = np.einsum("bhqk,bhkd->bhqd", pa, val).transpose(0, 2, 1, 3).reshape(B, N, D)
    # BN at eval with init running stats: y / sqrt(1 + eps)
    y = y / np.sqrt(1.0 + 1e-5)
    want = x + y  # dropout off
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_summarization_shapes_and_relu(rng):
    B, N, D, K = 2, 36, 32, 5
    x = rng.standard_normal((B, N, D)).astype(np.float32)
    m = Summarization(embed_size=D, smry_k=K)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x))
    out = np.asarray(m.apply(v, jnp.asarray(x)))
    assert out.shape == (B, N, K)
    assert np.isfinite(out).all()


def test_absolute_encode_matches_reference_formula(rng):
    B, N = 3, 8
    boxes = rng.uniform(0, 200, (B, N, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(10, 100, (B, N, 2)).astype(np.float32)
    wh = np.full((B, 2), 320.0, np.float32)
    got = np.asarray(absolute_encode(jnp.asarray(boxes), jnp.asarray(wh)))

    x, y = boxes[:, :, 0], boxes[:, :, 1]
    w = boxes[:, :, 2] - boxes[:, :, 0]
    h = boxes[:, :, 3] - boxes[:, :, 1]
    want = np.concatenate(
        [
            np.stack([x / 320, y / 320, w / 320, h / 320], axis=2),
            (w / h)[..., None],
            (w * h / (320.0 * 320.0))[..., None],
        ],
        axis=-1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_position_encoder_gates_in_01(rng):
    B, N, D = 2, 8, 16
    boxes = rng.uniform(0, 200, (B, N, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + 50
    wh = np.full((B, 2), 320.0, np.float32)
    m = PositionEncoder(embed_dim=D)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(boxes), jnp.asarray(wh))
    out = np.asarray(m.apply(v, jnp.asarray(boxes), jnp.asarray(wh)))
    assert out.shape == (B, N, D)
    assert out.min() > 0 and out.max() < 1
