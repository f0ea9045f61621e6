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
