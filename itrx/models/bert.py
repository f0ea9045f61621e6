"""BERT tower in flax.

Reference: itr/modalmodule/bert.py (vendored Google BERT, 471 LoC) — full
BERT-base with TF-style LayerNorm (eps=1e-12 inside the sqrt, :113-126),
erf-gelu (:29-34), additive -10000 attention mask (:344-352); returns
(all_encoder_layers, pooled_output) (:358).

TPU notes: the 12 layers share one set of parameter shapes, so the encoder is
an `nn.scan`-free explicit stack (12 layers compile fine and allow per-layer
outputs like the reference's `all_encoder_layers`); attention is a single
einsum pair per layer, batched over heads.

`load_torch_bert` converts a HuggingFace/Google `pytorch_model.bin` state
dict into this module's parameter tree (torch runs CPU-side only).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def gelu_erf(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 16
    initializer_range: float = 0.02

    @classmethod
    def from_json_file(cls, path):
        with open(path) as f:
            d = json.load(f)
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        return cls(**known)


class BertLayerNorm(nn.Module):
    """TF-style LayerNorm: eps inside the sqrt (ref bert.py:113-126)."""

    eps: float = 1e-12

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        u = jnp.mean(x, axis=-1, keepdims=True)
        s = jnp.mean((x - u) ** 2, axis=-1, keepdims=True)
        return gamma * (x - u) / jnp.sqrt(s + self.eps) + beta


class BertLayer(nn.Module):
    """One transformer block (ref BERTLayer, bert.py:262-273)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, hidden, attn_bias, train: bool = False):
        cfg = self.cfg
        h = cfg.hidden_size
        nh = cfg.num_attention_heads
        dk = h // nh
        b, l, _ = hidden.shape
        init = nn.initializers.normal(cfg.initializer_range)

        def dense(name, feat, x):
            return nn.Dense(feat, kernel_init=init, name=name)(x)

        q = dense("query", h, hidden).reshape(b, l, nh, dk)
        k = dense("key", h, hidden).reshape(b, l, nh, dk)
        v = dense("value", h, hidden).reshape(b, l, nh, dk)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dk)
        # cast the additive -10000 mask (built fp32 from the batch mask) to
        # the activation dtype: an fp32 bias here silently promotes scores,
        # probs, and every downstream hidden state of all 12 layers back to
        # fp32 under bf16 training (-10000 is exactly representable in bf16)
        scores = scores + attn_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(
            cfg.attention_probs_dropout_prob, deterministic=not train
        )(probs)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, h)

        attn_out = dense("attn_output", h, ctx)
        attn_out = nn.Dropout(cfg.hidden_dropout_prob, deterministic=not train)(
            attn_out
        )
        hidden = BertLayerNorm(name="attn_ln")(hidden + attn_out)

        inter = dense("intermediate", cfg.intermediate_size, hidden)
        inter = gelu_erf(inter)
        out = dense("output", h, inter)
        out = nn.Dropout(cfg.hidden_dropout_prob, deterministic=not train)(out)
        return BertLayerNorm(name="out_ln")(hidden + out)


class BertModel(nn.Module):
    """Embeddings + encoder stack + pooler (ref BertModel, bert.py:305-358).

    Returns (all_encoder_layers list, pooled_output).
    """

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, attention_mask=None,
                 train: bool = False):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -10000.0

        init = nn.initializers.normal(cfg.initializer_range)
        word_emb = self.param(
            "word_embeddings", init, (cfg.vocab_size, cfg.hidden_size)
        )
        pos_emb = self.param(
            "position_embeddings", init,
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        type_emb = self.param(
            "token_type_embeddings", init, (cfg.type_vocab_size, cfg.hidden_size)
        )
        L = input_ids.shape[1]
        x = word_emb[input_ids] + pos_emb[None, :L] + type_emb[token_type_ids]
        x = BertLayerNorm(name="emb_ln")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob, deterministic=not train)(x)

        all_layers = []
        for i in range(cfg.num_hidden_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, attn_bias, train=train)
            all_layers.append(x)

        pooled = nn.Dense(
            cfg.hidden_size, kernel_init=init, name="pooler"
        )(x[:, 0])
        pooled = jnp.tanh(pooled)
        return all_layers, pooled


def load_torch_bert(ckpt_path: str, cfg: BertConfig):
    """Convert a torch BERT state dict (Google/HF layout) into our param tree."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_bert_state_dict(sd, cfg.num_hidden_layers)


def convert_bert_state_dict(sd: dict, num_hidden_layers: int):
    """Convert an in-memory torch BERT state dict (tensors or numpy) into our
    param tree.  Accepts both bare ('embeddings.*') and prefixed ('bert.*')
    key layouts."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in sd.items()}

    def np_(key):
        for prefix in ("", "bert."):
            k = prefix + key
            if k in sd:
                return sd[k]
        raise KeyError(key)

    def lin(key):
        # torch Linear weight is (out, in); flax kernel is (in, out)
        return {"kernel": np_(key + ".weight").T, "bias": np_(key + ".bias")}

    def ln(key):
        d = {}
        for ours, theirs in (("gamma", "gamma"), ("beta", "beta")):
            for cand in (f"{key}.{theirs}", f"{key}.weight" if theirs == "gamma" else f"{key}.bias"):
                for prefix in ("", "bert."):
                    if prefix + cand in sd:
                        d[ours] = sd[prefix + cand]
                        break
                if ours in d:
                    break
        return d

    params = {
        "word_embeddings": np_("embeddings.word_embeddings.weight"),
        "position_embeddings": np_("embeddings.position_embeddings.weight"),
        "token_type_embeddings": np_("embeddings.token_type_embeddings.weight"),
        "emb_ln": ln("embeddings.LayerNorm"),
        "pooler": lin("pooler.dense"),
    }
    for i in range(num_hidden_layers):
        base = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "query": lin(f"{base}.attention.self.query"),
            "key": lin(f"{base}.attention.self.key"),
            "value": lin(f"{base}.attention.self.value"),
            "attn_output": lin(f"{base}.attention.output.dense"),
            "attn_ln": ln(f"{base}.attention.output.LayerNorm"),
            "intermediate": lin(f"{base}.intermediate.dense"),
            "output": lin(f"{base}.output.dense"),
            "out_ln": ln(f"{base}.output.LayerNorm"),
        }
    return jax.tree.map(jnp.asarray, params)
