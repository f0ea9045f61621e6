"""VSRN caption-decoder auxiliary head.

Reference: itr/modalmodule/Fusionmodule.py — EncoderRNN (:149-203), additive
Attention (:112-146), DecoderRNN (:206-367), S2VTAttModel (:10-34).  The
teacher-forced decode loop (a Python loop of single GRU steps in the
reference, :287-301) becomes one `lax.scan` whose per-step input projection
and attention ride the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.rnn import MaskedGRU, gru_cell
from .layers import torch_embedding_init, torch_linear_init


class EncoderRNN(nn.Module):
    """Linear dim_vid->dim_hidden + dropout + GRU over the region sequence."""

    dim_vid: int
    dim_hidden: int
    input_dropout_p: float = 0.2

    @nn.compact
    def __call__(self, vid_feats, train: bool = False):
        x = nn.Dense(
            self.dim_hidden,
            kernel_init=nn.initializers.xavier_normal(),
            name="vid2hid",
        )(vid_feats)
        x = nn.Dropout(self.input_dropout_p, deterministic=not train)(x)
        ones = jnp.ones(x.shape[:2], x.dtype)
        out, final = MaskedGRU(hidden_size=self.dim_hidden, name="rnn")(x, ones)
        return out, final


class DecoderRNN(nn.Module):
    """Teacher-forced attention decoder producing (B, max_len-1, V) log-probs."""

    vocab_size: int
    max_len: int
    dim_hidden: int
    dim_word: int
    input_dropout_p: float = 0.1

    @nn.compact
    def __call__(self, encoder_outputs, encoder_hidden, targets, train: bool = False):
        h = self.dim_hidden
        emb = self.param(
            "embedding", torch_embedding_init, (self.vocab_size, self.dim_word)
        )
        # attention + output projections as raw params so the scan body is
        # pure math (flax submodules cannot be applied inside lax.scan)
        att_w1 = self.param("att_w1", torch_linear_init, (2 * h, h))
        att_b1 = self.param(
            "att_b1",
            lambda k_, s: jax.random.uniform(
                k_, s, jnp.float32, -1.0 / jnp.sqrt(2 * h), 1.0 / jnp.sqrt(2 * h)
            ),
            (h,),
        )
        att_w2 = self.param("att_w2", torch_linear_init, (h, 1))
        out_w = self.param(
            "out_w", nn.initializers.xavier_normal(), (h, self.vocab_size)
        )
        out_b = self.param("out_b", nn.initializers.zeros, (self.vocab_size,))

        # decoder GRU cell params (torch nn.GRU layout)
        k = 1.0 / jnp.sqrt(h)

        def u(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih = self.param("w_ih", u, (3 * h, h + self.dim_word))
        w_hh = self.param("w_hh", u, (3 * h, h))
        b_ih = self.param("b_ih", u, (3 * h,))
        b_hh = self.param("b_hh", u, (3 * h,))

        targets_emb = emb[targets]  # (B, T, dim_word)
        drop_rng = (
            self.make_rng("dropout")
            if (train and self.input_dropout_p > 0)
            else None
        )
        keep = 1.0 - self.input_dropout_p

        def attend(dec_h):
            hh = jnp.broadcast_to(dec_h[:, None, :], encoder_outputs.shape)
            inputs = jnp.concatenate([encoder_outputs, hh], axis=2)
            o = jnp.tanh(inputs @ att_w1 + att_b1)
            e = (o @ att_w2)[..., 0]
            alpha = jax.nn.softmax(e, axis=1)
            return jnp.einsum("bs,bsd->bd", alpha, encoder_outputs)

        def step(carry, inp):
            dec_h, t = carry, inp
            current_words = targets_emb[:, t, :]
            context = attend(dec_h)
            dec_in = jnp.concatenate([current_words, context], axis=1)
            if drop_rng is not None:
                key = jax.random.fold_in(drop_rng, t)
                mask = jax.random.bernoulli(key, keep, dec_in.shape)
                dec_in = jnp.where(mask, dec_in / keep, 0.0)
            gx = dec_in @ w_ih.T + b_ih
            dec_h = gru_cell(dec_h, gx, w_hh, b_hh)
            logits = dec_h @ out_w + out_b
            return dec_h, jax.nn.log_softmax(logits, axis=-1)

        steps = jnp.arange(self.max_len - 1)
        _, logprobs = jax.lax.scan(step, encoder_hidden, steps)
        return jnp.transpose(logprobs, (1, 0, 2))  # (B, T, V)


class S2VTAttModel(nn.Module):
    """Encoder+decoder wrapper (ref :10-34)."""

    vocab_size: int
    max_len: int
    dim_vid: int = 2048
    dim_hidden: int = 512
    dim_word: int = 300
    input_dropout_p: float = 0.2

    @nn.compact
    def __call__(self, vid_feats, targets, train: bool = False):
        enc_out, enc_hidden = EncoderRNN(
            dim_vid=self.dim_vid,
            dim_hidden=self.dim_hidden,
            input_dropout_p=self.input_dropout_p,
            name="encoder",
        )(vid_feats, train=train)
        return DecoderRNN(
            vocab_size=self.vocab_size,
            max_len=self.max_len,
            dim_hidden=self.dim_hidden,
            dim_word=self.dim_word,
            input_dropout_p=self.input_dropout_p,
            name="decoder",
        )(enc_out, enc_hidden, targets, train=train)
