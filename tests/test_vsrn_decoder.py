"""VSRN caption head vs a numpy oracle of the reference equations
(itr/modalmodule/Fusionmodule.py: EncoderRNN :149-203, Attention :112-146,
DecoderRNN teacher forcing :287-301)."""

import jax
import jax.numpy as jnp
import numpy as np

from itrx.models.vsrn_decoder import S2VTAttModel


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_gru_cell(h, x, w_ih, w_hh, b_ih, b_hh):
    gx = x @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    H = h.shape[-1]
    xr, xz, xn = gx[:, :H], gx[:, H:2*H], gx[:, 2*H:]
    hr, hz, hn = gh[:, :H], gh[:, H:2*H], gh[:, 2*H:]
    r = np_sigmoid(xr + hr)
    z = np_sigmoid(xz + hz)
    n = np.tanh(xn + r * hn)
    return (1 - z) * n + z * h


def np_log_softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return x - m - np.log(e.sum(-1, keepdims=True))


def test_s2vt_matches_numpy_oracle(rng):
    B, S, DV, DH, DW, V, T = 3, 6, 12, 8, 5, 20, 7
    vid = rng.standard_normal((B, S, DV)).astype(np.float32)
    targets = rng.integers(0, V, (B, T)).astype(np.int32)

    model = S2VTAttModel(
        vocab_size=V, max_len=T, dim_vid=DV, dim_hidden=DH, dim_word=DW,
        input_dropout_p=0.2,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(vid), jnp.asarray(targets), train=False,
    )
    got = np.asarray(
        model.apply(variables, jnp.asarray(vid), jnp.asarray(targets), train=False)
    )
    assert got.shape == (B, T - 1, V)

    p = jax.tree.map(np.asarray, variables["params"])
    enc, dec = p["encoder"], p["decoder"]

    # encoder: Linear -> GRU over the sequence
    x = vid @ enc["vid2hid"]["kernel"] + enc["vid2hid"]["bias"]
    g = enc["rnn"]
    h = np.zeros((B, DH), np.float32)
    enc_out = np.zeros((B, S, DH), np.float32)
    for t in range(S):
        h = np_gru_cell(h, x[:, t], g["w_ih"], g["w_hh"], g["b_ih"], g["b_hh"])
        enc_out[:, t] = h
    enc_hidden = h

    # decoder: teacher-forced loop with additive attention
    emb = dec["embedding"]
    dh = enc_hidden
    want = np.zeros((B, T - 1, V), np.float32)
    for t in range(T - 1):
        words = emb[targets[:, t]]
        hh = np.repeat(dh[:, None, :], S, axis=1)
        inp = np.concatenate([enc_out, hh], axis=2)
        o = np.tanh(inp @ dec["att_w1"] + dec["att_b1"])
        e = (o @ dec["att_w2"])[..., 0]
        alpha = np.exp(e - e.max(1, keepdims=True))
        alpha /= alpha.sum(1, keepdims=True)
        ctx = np.einsum("bs,bsd->bd", alpha, enc_out)
        dec_in = np.concatenate([words, ctx], axis=1)
        dh = np_gru_cell(dh, dec_in, dec["w_ih"], dec["w_hh"], dec["b_ih"], dec["b_hh"])
        want[:, t] = np_log_softmax(dh @ dec["out_w"] + dec["out_b"])

    np.testing.assert_allclose(got, want, atol=2e-5)


def test_greedy_decode_shapes_and_consistency(rng):
    """Greedy decode returns (B, T-2) preds whose logprobs equal a
    teacher-forced rerun fed with the decoded tokens (ref :303-341)."""
    B, S, DV, DH, DW, V, T = 3, 6, 12, 8, 5, 20, 7
    vid = rng.standard_normal((B, S, DV)).astype(np.float32)
    model = S2VTAttModel(
        vocab_size=V, max_len=T, dim_vid=DV, dim_hidden=DH, dim_word=DW,
        input_dropout_p=0.2,
    )
    dummy_targets = jnp.zeros((B, T), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(vid), dummy_targets, train=False,
    )
    lps, preds = model.apply(
        variables, jnp.asarray(vid), train=False, mode="greedy"
    )
    assert preds.shape == (B, T - 2) and lps.shape == (B, T - 2)
    assert np.all(np.asarray(preds) >= 0) and np.all(np.asarray(preds) < V)

    # teacher-force with [sos, preds...]: step t's distribution must assign
    # preds[t] exactly the greedy logprob recorded during decoding
    sos = jnp.ones((B, 1), jnp.int32)
    tf_targets = jnp.concatenate([sos, preds, jnp.zeros((B, 1), jnp.int32)], 1)
    tf_logprobs = model.apply(variables, jnp.asarray(vid), tf_targets, train=False)
    got = np.take_along_axis(
        np.asarray(tf_logprobs)[:, : T - 2], np.asarray(preds)[..., None], axis=-1
    )[..., 0]
    np.testing.assert_allclose(got, np.asarray(lps), atol=2e-5)
    # and each decoded token is the argmax of that distribution
    np.testing.assert_array_equal(
        np.argmax(np.asarray(tf_logprobs)[:, : T - 2], axis=-1), np.asarray(preds)
    )


def test_multinomial_decode(rng):
    B, S, DV, DH, DW, V, T = 3, 6, 12, 8, 5, 20, 7
    vid = rng.standard_normal((B, S, DV)).astype(np.float32)
    model = S2VTAttModel(
        vocab_size=V, max_len=T, dim_vid=DV, dim_hidden=DH, dim_word=DW,
        input_dropout_p=0.2,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(vid), jnp.zeros((B, T), jnp.int32), train=False,
    )
    lp1, p1 = model.apply(
        variables, jnp.asarray(vid), train=False, mode="multinomial",
        rngs={"sample": jax.random.PRNGKey(7)},
    )
    lp2, p2 = model.apply(
        variables, jnp.asarray(vid), train=False, mode="multinomial",
        rngs={"sample": jax.random.PRNGKey(7)},
    )
    assert p1.shape == (B, T - 2)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))  # same rng
    assert np.all(np.isfinite(np.asarray(lp1)))
    lp3, p3 = model.apply(
        variables, jnp.asarray(vid), train=False, mode="multinomial",
        rngs={"sample": jax.random.PRNGKey(8)},
    )
    assert not np.array_equal(np.asarray(p1), np.asarray(p3))  # different rng


def test_overfit_greedy_reproduces_caption(rng):
    """Train the caption head on one fixed (video, caption) batch; greedy
    decode must reproduce the training caption (VERDICT item 8)."""
    import optax

    from itrx.ops.losses import language_model_loss

    B, S, DV, DH, DW, V, T = 2, 5, 10, 16, 8, 12, 8
    vid = rng.standard_normal((B, S, DV)).astype(np.float32)
    caption = np.stack(
        [
            np.array([1, 4, 7, 2, 9, 5, 3, 0]),
            np.array([1, 6, 2, 8, 3, 10, 4, 0]),
        ]
    ).astype(np.int32)
    mask = np.ones_like(caption, np.float32)

    model = S2VTAttModel(
        vocab_size=V, max_len=T, dim_vid=DV, dim_hidden=DH, dim_word=DW,
        input_dropout_p=0.0,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(vid), jnp.asarray(caption), train=False,
    )
    params = variables["params"]
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logprobs = model.apply(
                {"params": p}, jnp.asarray(vid), jnp.asarray(caption), train=False
            )
            return language_model_loss(
                logprobs, jnp.asarray(caption)[:, 1:], jnp.asarray(mask)[:, 1:]
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(300):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < 0.05

    _, preds = model.apply(
        {"params": params}, jnp.asarray(vid), train=False, mode="greedy"
    )
    # greedy preds cover caption[1:T-1] (the decode drops the <sos> feed)
    np.testing.assert_array_equal(np.asarray(preds), caption[:, 1 : T - 1])
