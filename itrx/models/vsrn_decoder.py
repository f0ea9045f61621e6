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
    """Attention decoder (ref Fusionmodule.py:206-367).

    mode='train': teacher forcing over `targets`, returns (B, max_len-1, V)
    log-probs.  mode='greedy'/'multinomial': autoregressive sampling
    (ref :303-341) via a lax.scan with sampled-token feedback; returns
    (seq_logprobs (B, max_len-2), seq_preds (B, max_len-2)) matching the
    reference's outputs (the t=0 <sos> feed is dropped from both, :340-341).
    Beam search (a stub in the reference, `sample_beam` is never shipped)
    is not implemented.
    """

    vocab_size: int
    max_len: int
    dim_hidden: int
    dim_word: int
    input_dropout_p: float = 0.1
    sos_id: int = 1

    @nn.compact
    def __call__(self, encoder_outputs, encoder_hidden, targets=None,
                 train: bool = False, mode: str = "train",
                 temperature: float = 1.0):
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

        drop_rng = (
            self.make_rng("dropout")
            if (train and self.input_dropout_p > 0)
            else None
        )
        keep = 1.0 - self.input_dropout_p

        # additive attention, concat split by distributivity:
        # tanh(cat(enc, h) @ W1 + b1) == tanh(enc @ W1[:H] + b1 + h @ W1[H:]).
        # The encoder half is step-invariant, so it hoists out of the scan —
        # the per-step attention matmul drops from (B*R, 2H) x (2H, H) to
        # (B, H) x (H, H), ~36x fewer FLOPs at R=36 (ref loops the full
        # concat every step, Fusionmodule.py:292 + :112-146)
        enc_att = encoder_outputs @ att_w1[: encoder_outputs.shape[-1]] + att_b1

        def attend(dec_h):
            o = jnp.tanh(
                enc_att + (dec_h @ att_w1[encoder_outputs.shape[-1]:])[:, None, :]
            )
            e = (o @ att_w2)[..., 0]
            alpha = jax.nn.softmax(e, axis=1)
            return jnp.einsum("bs,bsd->bd", alpha, encoder_outputs)

        # the input projection splits over the concat (dropout is
        # elementwise, so it factorizes too): gx = drop(words) @ Ww^T +
        # drop(context) @ Wc^T + b.  The word half hoists out of the scan
        # in train mode (one (B*T, W) x (W, 3H) matmul for all steps).
        w_words = w_ih[:, : self.dim_word]
        w_ctx = w_ih[:, self.dim_word:]

        def advance(dec_h, current_words, t):
            context = attend(dec_h)
            if drop_rng is not None:
                key = jax.random.fold_in(drop_rng, t)
                mask = jax.random.bernoulli(key, keep, context.shape)
                context = jnp.where(mask, context / keep, 0.0)
            gx = current_words @ w_words.T + context @ w_ctx.T + b_ih
            return gru_cell(dec_h, gx, w_hh, b_hh)

        def rnn_step(dec_h, current_words, t):
            dec_h = advance(dec_h, current_words, t)
            logits = dec_h @ out_w + out_b
            return dec_h, jax.nn.log_softmax(logits, axis=-1)

        if mode == "train":
            targets_emb = emb[targets]  # (B, T, dim_word)
            words = targets_emb[:, : self.max_len - 1, :]
            if drop_rng is not None:
                wmask = jax.random.bernoulli(
                    jax.random.fold_in(drop_rng, self.max_len), keep, words.shape
                )
                words = jnp.where(wmask, words / keep, 0.0)
            gx_words = words @ w_words.T  # (B, T-1, 3H), hoisted

            from ..ops.pallas import pallas_ok  # noqa: PLC0415 (trace gate)

            if (
                pallas_ok()
                and encoder_outputs.dtype == jnp.bfloat16
                and h % 128 == 0
            ):
                # fused decode: the whole teacher-forced loop (attention +
                # GRU) runs as one Pallas grid with the carry in VMEM
                # (itrx/ops/pallas/vsrn_dec.py).  Context-dropout masks for
                # all steps are drawn up front (one bernoulli; a different
                # but equally valid sample from the XLA path's per-step
                # fold_in)
                from ..ops.pallas.vsrn_dec import decoder_seq_auto

                T = self.max_len - 1
                bsz = words.shape[0]
                if drop_rng is not None:
                    ckey = jax.random.fold_in(drop_rng, 2 * self.max_len)
                    cm = jax.random.bernoulli(
                        ckey, keep, (T, bsz, h)
                    ).astype(jnp.float32) / keep
                else:
                    cm = jnp.ones((T, bsz, h), jnp.float32)
                hs = decoder_seq_auto(
                    jnp.swapaxes(gx_words + b_ih, 0, 1), cm,
                    encoder_outputs, enc_att, encoder_hidden,
                    att_w1[encoder_outputs.shape[-1]:], att_w2,
                    w_ctx, w_hh, b_hh,
                ).astype(words.dtype)
            else:

                def step(dec_h, t):
                    context = attend(dec_h)
                    if drop_rng is not None:
                        key = jax.random.fold_in(drop_rng, t)
                        cmask = jax.random.bernoulli(key, keep, context.shape)
                        context = jnp.where(cmask, context / keep, 0.0)
                    gx = gx_words[:, t] + context @ w_ctx.T + b_ih
                    dec_h = gru_cell(dec_h, gx, w_hh, b_hh)
                    return dec_h, dec_h

                steps = jnp.arange(self.max_len - 1)
                _, hs = jax.lax.scan(step, encoder_hidden, steps)
            # the vocab projection + log_softmax do not feed the recurrence:
            # hoisted out of the sequential scan into one (T*B, H) x (H, V)
            # MXU matmul (numerically identical, ~60x larger matmul)
            logits = hs @ out_w + out_b  # (T, B, V)
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            return jnp.transpose(logprobs, (1, 0, 2))  # (B, T, V)

        if mode not in ("greedy", "multinomial"):
            raise ValueError(f"Unknown decode mode: {mode}")

        b = encoder_outputs.shape[0]
        sample_rng = self.make_rng("sample") if mode == "multinomial" else None

        def sample_step(carry, t):
            dec_h, logprobs_prev = carry
            if mode == "greedy":
                it_sampled = jnp.argmax(logprobs_prev, axis=-1)
            else:
                key = jax.random.fold_in(sample_rng, t)
                it_sampled = jax.random.categorical(
                    key, logprobs_prev / temperature, axis=-1
                )
            # t == 0 feeds <sos> (ref :313); later steps feed the sample
            it = jnp.where(t == 0, jnp.full((b,), self.sos_id, jnp.int32),
                           it_sampled.astype(jnp.int32))
            lp = jnp.take_along_axis(
                logprobs_prev, it_sampled[:, None], axis=-1
            )[:, 0]
            dec_h, logprobs = rnn_step(dec_h, emb[it], t)
            return (dec_h, logprobs), (it, lp)

        init_lp = jnp.zeros((b, self.vocab_size), jnp.float32)
        steps = jnp.arange(self.max_len - 1)
        _, (its, lps) = jax.lax.scan(
            sample_step, (encoder_hidden, init_lp), steps
        )
        # drop the t=0 <sos> feed, exactly like the reference (:340-341)
        seq_preds = jnp.transpose(its[1:], (1, 0))
        seq_logprobs = jnp.transpose(lps[1:], (1, 0))
        return seq_logprobs, seq_preds


class S2VTAttModel(nn.Module):
    """Encoder+decoder wrapper (ref :10-34)."""

    vocab_size: int
    max_len: int
    dim_vid: int = 2048
    dim_hidden: int = 512
    dim_word: int = 300
    input_dropout_p: float = 0.2

    @nn.compact
    def __call__(self, vid_feats, targets=None, train: bool = False,
                 mode: str = "train", temperature: float = 1.0):
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
        )(enc_out, enc_hidden, targets, train=train, mode=mode,
          temperature=temperature)
