"""Parity tests: MaskedGRU vs torch.nn.GRU over packed variable-length batches."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

from itrx.ops.rnn import MaskedGRU, gru_scan


def _torch_gru_oracle(x, lengths, hidden, bidirectional):
    torch.manual_seed(0)
    gru = torch.nn.GRU(
        x.shape[-1], hidden, 1, batch_first=True, bidirectional=bidirectional
    )
    xt = torch.tensor(x)
    packed = pack_padded_sequence(
        xt, lengths, batch_first=True, enforce_sorted=False
    )
    out, h = gru(packed)
    out, _ = pad_packed_sequence(out, batch_first=True, total_length=x.shape[1])
    return gru, out.detach().numpy(), h.detach().numpy()


def _params_from_torch(gru, bidirectional):
    p = {
        "w_ih": gru.weight_ih_l0.detach().numpy(),
        "w_hh": gru.weight_hh_l0.detach().numpy(),
        "b_ih": gru.bias_ih_l0.detach().numpy(),
        "b_hh": gru.bias_hh_l0.detach().numpy(),
    }
    if bidirectional:
        p.update(
            {
                "w_ih_reverse": gru.weight_ih_l0_reverse.detach().numpy(),
                "w_hh_reverse": gru.weight_hh_l0_reverse.detach().numpy(),
                "b_ih_reverse": gru.bias_ih_l0_reverse.detach().numpy(),
                "b_hh_reverse": gru.bias_hh_l0_reverse.detach().numpy(),
            }
        )
    return jax.tree.map(jnp.asarray, p)


def _mask(lengths, L):
    return (np.arange(L)[None, :] < np.asarray(lengths)[:, None]).astype(np.float32)


def test_forward_gru_matches_torch(rng):
    B, L, D, H = 5, 9, 12, 16
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = [9, 7, 5, 3, 1]
    gru, out_t, h_t = _torch_gru_oracle(x, lengths, H, bidirectional=False)
    params = _params_from_torch(gru, False)

    out, h = gru_scan(
        jnp.asarray(x), jnp.asarray(_mask(lengths, L)),
        params["w_ih"], params["w_hh"], params["b_ih"], params["b_hh"],
    )
    np.testing.assert_allclose(np.asarray(out), out_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_t[0], atol=1e-5)


def test_bidirectional_gru_matches_torch(rng):
    B, L, D, H = 4, 11, 8, 10
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = [11, 8, 4, 2]
    gru, out_t, h_t = _torch_gru_oracle(x, lengths, H, bidirectional=True)
    params = _params_from_torch(gru, True)

    model = MaskedGRU(hidden_size=H, bidirectional=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(_mask(lengths, L)))
    variables = {"params": params}
    out, h = model.apply(variables, jnp.asarray(x), jnp.asarray(_mask(lengths, L)))

    np.testing.assert_allclose(np.asarray(out), out_t, atol=1e-5)
    # torch h: (2, B, H) = [fwd, bwd]; ours concatenated (B, 2H)
    np.testing.assert_allclose(np.asarray(h[:, :H]), h_t[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h[:, H:]), h_t[1], atol=1e-5)


def test_unsorted_batch_ok(rng):
    # the reference requires length-sorted batches (pack_padded); we don't
    B, L, D, H = 6, 7, 5, 8
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = [3, 7, 1, 5, 2, 6]
    gru, out_t, h_t = _torch_gru_oracle(x, lengths, H, bidirectional=False)
    params = _params_from_torch(gru, False)
    out, h = gru_scan(
        jnp.asarray(x), jnp.asarray(_mask(lengths, L)),
        params["w_ih"], params["w_hh"], params["b_ih"], params["b_hh"],
    )
    np.testing.assert_allclose(np.asarray(out), out_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_t[0], atol=1e-5)


def test_masked_gru_init_shapes():
    model = MaskedGRU(hidden_size=16, bidirectional=False)
    x = jnp.zeros((2, 5, 8))
    m = jnp.ones((2, 5))
    v = model.init(jax.random.PRNGKey(1), x, m)
    assert v["params"]["w_ih"].shape == (48, 8)
    out, h = model.apply(v, x, m)
    assert out.shape == (2, 5, 16) and h.shape == (2, 16)
