"""Text encoders (ref itr/modalmodule/TextEncoder.py).

`EncoderText` serves VSE++/SCAN/VSRN/SGRAF: Embedding -> dropout -> masked
(bi)GRU.  The reference's pack/pad + sort-by-length is replaced by the masked
scan in itrx.ops.rnn; the "gather last valid timestep" for VSE++/VSRN is the
scan's final carry.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.norms import l2norm
from ..ops.rnn import MaskedGRU
from .layers import torch_embedding_init


class EncoderText(nn.Module):
    """GRU caption encoder (ref TextEncoder.py:15-70).

    Returns (cap_emb, final_state):
      - cap_emb: (B, L, H) per-token embeddings (bi-GRU halves mean-fused),
      - final_state: (B, H) last-valid-step state (bi: mean of directions'
        finals) — what VSE++/VSRN use as the sentence embedding.
    """

    vocab_size: int
    word_dim: int
    embed_size: int
    use_bi_gru: bool = False
    no_txtnorm: bool = False
    dropout: float = 0.0
    use_abs: bool = False
    sentence_level: bool = False  # VSE++/VSRN: return the final state

    @nn.compact
    def __call__(self, cap_ids, cap_mask, train: bool = False):
        emb = self.param(
            "embedding", torch_embedding_init, (self.vocab_size, self.word_dim)
        )
        x = emb[cap_ids]
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)

        out, _ = MaskedGRU(
            hidden_size=self.embed_size, bidirectional=self.use_bi_gru
        )(x, cap_mask)

        if self.use_bi_gru:
            h = self.embed_size
            out = (out[..., :h] + out[..., h:]) / 2.0

        if self.sentence_level:
            # gather the fused output at each sequence's last valid step
            # (ref TextEncoder.py:57-60)
            last = jnp.sum(cap_mask, axis=-1).astype(jnp.int32) - 1
            cap_emb = jnp.take_along_axis(
                out, last[:, None, None], axis=1
            )[:, 0, :]
        else:
            cap_emb = out

        if not self.no_txtnorm:
            cap_emb = l2norm(cap_emb, axis=-1)
        if self.use_abs:
            cap_emb = jnp.abs(cap_emb)
        return cap_emb
