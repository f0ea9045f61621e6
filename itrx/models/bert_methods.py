"""SAEM and CAMERA — the BERT-text-tower methods.

Reference: itr/modalmodule/Models.py:369-464 (SAEM), :550-645 (CAMERA);
encoders in ImgEncoder.py:324-433 and TextEncoder.py:74-197.

The BERT tower is frozen in both (ref TextEncoder.py:154-157): its outputs
are wrapped in stop_gradient and its parameter subtree (named "bert") is
masked out of the optimizer (itrx.train.state.is_frozen_path), so no Adam
moments are allocated for the 110M frozen weights.

If config['init_checkpoint'] points at an existing torch BERT checkpoint it
is converted and loaded; otherwise the tower initializes randomly (tests and
synthetic runs).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import losses, sim
from ..ops.norms import f_normalize, l2norm
from .agsa import AGSA, PositionEncoder, Summarization
from .bert import BertConfig, BertLayer, BertModel
from .layers import TorchBatchNorm, TorchLinear, XavierLinear


def _default_trans_cfg(final_dims: int) -> BertConfig:
    """The reference requires a trans_cfg.json it never ships (SURVEY.md
    §2.11 #5); this is the documented default used when the file is absent:
    a single self-attention block at the mapping width."""
    return BertConfig(
        vocab_size=30522,
        hidden_size=final_dims,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=4 * final_dims,
        hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1,
    )


def _bert_cfg_from_config(config: dict) -> Optional[BertConfig]:
    path = config.get("bert_config_file")
    if path and os.path.exists(path):
        return BertConfig.from_json_file(path)
    return None


def _trans_cfg_from_config(config: dict) -> BertConfig:
    path = config.get("trans_cfg")
    if path and os.path.exists(path):
        return BertConfig.from_json_file(path)
    return _default_trans_cfg(config["final_dims"])


class FcMapping(nn.Module):
    """SAEM alternate image branch (ref ImgEncoder.py:247-265): Linear + mean."""

    final_dims: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchLinear(self.final_dims, name="fc1")(x)
        return f_normalize(jnp.mean(x, axis=1), axis=1)


class CnnMapping(nn.Module):
    """SAEM alternate image branch (ref ImgEncoder.py:268-291): conv banks."""

    final_dims: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        for ki, k in enumerate((1, 2, 3)):
            y = nn.Conv(256, kernel_size=(k,), padding="VALID", name=f"conv_{ki}")(x)
            feats.append(jnp.max(nn.relu(y), axis=1))
        out = jnp.concatenate(feats, axis=1)
        return f_normalize(TorchLinear(self.final_dims, name="fc1")(out), axis=1)


class RnnMapping(nn.Module):
    """SAEM alternate image branch (ref ImgEncoder.py:294-321) with the
    reference's Py3 float-slice bug (#7) fixed."""

    final_dims: int
    bi_gru: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.rnn import MaskedGRU

        ones = jnp.ones(x.shape[:2], jnp.float32)
        out, _ = MaskedGRU(
            hidden_size=self.final_dims, bidirectional=self.bi_gru, name="rnn"
        )(x, ones)
        if self.bi_gru:
            h = self.final_dims
            out = (out[..., :h] + out[..., h:]) / 2.0
        return f_normalize(jnp.mean(out, axis=1), axis=1)


class TransformerMapping(nn.Module):
    """SAEM image branch (ref ImgEncoder.py:324-350): Linear -> 1 BERT layer
    over regions (all-ones mask) -> mean-pool -> normalize."""

    trans_cfg: BertConfig
    final_dims: int

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = TorchLinear(self.final_dims, name="mapping")(images)
        attn_bias = jnp.zeros((x.shape[0], 1, 1, x.shape[1]), jnp.float32)
        x = BertLayer(self.trans_cfg, name="layer")(x, attn_bias, train=train)
        embed = jnp.mean(x, axis=1)
        return f_normalize(embed, axis=1)


class BertMapping(nn.Module):
    """SAEM text branch (ref TextEncoder.py:74-157): frozen BERT + head."""

    bert_cfg: BertConfig
    trans_cfg: BertConfig
    final_dims: int
    embed_size: int
    txt_stru: str = "cnn"
    bi_gru: bool = False

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 train: bool = False):
        all_layers, _ = BertModel(self.bert_cfg, name="bert")(
            input_ids, token_type_ids, attention_mask, train=False
        )
        x = jax.lax.stop_gradient(all_layers[-1])  # frozen tower

        drop = nn.Dropout(self.bert_cfg.hidden_dropout_prob,
                          deterministic=not train)
        if self.txt_stru == "pooling":
            out = TorchLinear(self.bert_cfg.hidden_size, name="mapping_0")(x)
            out = jnp.mean(out, axis=1)
        elif self.txt_stru == "cnn":
            feats = []
            for ki, k in enumerate((1, 2, 3)):
                y = nn.Conv(
                    512, kernel_size=(k,), padding="VALID", name=f"conv_{ki}"
                )(x)  # (B, L-k+1, 512)
                feats.append(jnp.max(nn.relu(y), axis=1))
            out = jnp.concatenate(feats, axis=1)  # (B, 1536)
        elif self.txt_stru == "rnn":
            from ..ops.rnn import MaskedGRU

            gru_out, _ = MaskedGRU(
                hidden_size=self.embed_size, bidirectional=self.bi_gru,
                name="rnn",
            )(x, attention_mask.astype(jnp.float32))
            if self.bi_gru:
                h = self.embed_size
                gru_out = (gru_out[..., :h] + gru_out[..., h:]) / 2.0
            out = jnp.mean(gru_out, axis=1)
        elif self.txt_stru == "trans":
            hidden = TorchLinear(self.trans_cfg.hidden_size, name="mapping_0")(x)
            bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -10000.0
            hidden = BertLayer(self.trans_cfg, name="layer")(hidden, bias, train=train)
            out = jnp.mean(hidden, axis=1)
        else:
            raise ValueError(f"Unknown txt_stru: {self.txt_stru}")

        out = drop(out)
        code = TorchLinear(self.final_dims, name="mapping")(out)
        return f_normalize(code, axis=1)


class SAEM(nn.Module):
    """SAEM (ref Models.py:369-464)."""

    bert_cfg: BertConfig
    trans_cfg: BertConfig
    final_dims: int = 256
    embed_size: int = 1024
    txt_stru: str = "cnn"
    img_stru: str = "trans"
    bi_gru: bool = False
    margin: float = 0.2
    max_violation: bool = False
    measure: str = "cosine"

    def setup(self):
        if self.img_stru == "trans":
            self.img_enc = TransformerMapping(
                trans_cfg=self.trans_cfg, final_dims=self.final_dims
            )
        elif self.img_stru == "fc":
            self.img_enc = FcMapping(final_dims=self.final_dims)
        elif self.img_stru == "cnn":
            self.img_enc = CnnMapping(final_dims=self.final_dims)
        elif self.img_stru == "rnn":
            self.img_enc = RnnMapping(final_dims=self.final_dims, bi_gru=True)
        else:
            raise ValueError(f"Unknown img_stru: {self.img_stru}")
        self.txt_enc = BertMapping(
            bert_cfg=self.bert_cfg,
            trans_cfg=self.trans_cfg,
            final_dims=self.final_dims,
            embed_size=self.embed_size,
            txt_stru=self.txt_stru,
            bi_gru=self.bi_gru,
        )

    def embed(self, batch, train: bool = False):
        cap = self.txt_enc(
            batch["cap_ids"], batch["cap_mask"], batch["type_ids"], train=train
        )
        img = self.img_enc(batch["images"], train=train)
        return {"img": img, "cap": cap}

    def similarity(self, img, cap, cap_mask=None, train: bool = False):
        if self.measure == "order":
            return -sim.pdist(img, cap)
        return sim.pdist_cos(img, cap)

    def _weight_reg(self):
        """0.01 * sum ||W|| over img_enc weights, excluding bias/gamma/beta
        (ref Models.py:433-439 with no_decay=['bias','gamma','beta'])."""
        params = self.img_enc.variables["params"]
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        total = 0.0
        for path, leaf in flat:
            last = path[-1].key
            if last not in ("bias", "gamma", "beta", "b_ih", "b_hh"):
                total = total + jnp.linalg.norm(leaf)
        return 0.01 * total

    def loss(self, batch, train: bool = True, epoch=0):
        e = self.embed(batch, train=train)
        scores = self.similarity(e["img"], e["cap"], train=train)
        loss1 = losses.contrastive_hinge(scores, self.margin, self.max_violation)
        loss2 = losses.angular_loss(e["img"], e["cap"], 1.0, True)
        # epoch-scheduled mix (ref Models.py:419-442); the reference's
        # train_step never forwards the epoch (bug #6) — we do.
        epoch = jnp.asarray(epoch)
        alpha = jnp.where(
            epoch > 20, 0.0, 0.5 * jnp.power(0.1, (epoch // 5).astype(jnp.float32))
        )
        reg = self._weight_reg()
        loss = loss1 + alpha * loss2 + reg
        return loss, {"Loss": loss, "Loss1": loss1, "Loss2": loss2}

    def __call__(self, batch, train: bool = True, epoch=0):
        return self.loss(batch, train=train, epoch=epoch)


class CAMERAImageEncoder(nn.Module):
    """CAMERA image tower (ref ImgEncoder.py:355-401): fc -> position-gated
    AGSA -> multi-view summarization -> k view embeddings."""

    embed_size: int
    head: int
    smry_k: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, images, boxes, imgs_wh, train: bool = False):
        fc_emb = XavierLinear(self.embed_size, name="fc")(images)
        # the reference's l2norm defaults to dim=1 (modalmodule/utils.py:15):
        # on (B, R, D) these normalize over the REGION axis (ImgEncoder.py:378,383)
        fc_emb = l2norm(fc_emb, axis=1)
        posi = PositionEncoder(self.embed_size, name="position_enc")(boxes, imgs_wh)
        att = AGSA(1, self.embed_size, h=self.head, drop=self.drop, name="agsa")(
            fc_emb, pos_emb=posi, train=train
        )
        att = l2norm(att, axis=1)
        smry_mat = Summarization(self.embed_size, self.smry_k, name="mvs")(att)
        L = jax.nn.softmax(smry_mat, axis=1)  # over regions
        img_emb_mat = jnp.einsum("brk,brd->bkd", L, att)
        return f_normalize(img_emb_mat, axis=-1), smry_mat


class CAMERATextEncoder(nn.Module):
    """CAMERA text tower (ref TextEncoder.py:162-197): frozen BERT -> Linear
    -> AGSA -> MLP+BN residual -> mean-pool (over all token slots) -> norm."""

    bert_cfg: BertConfig
    embed_size: int
    head: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids,
                 train: bool = False):
        all_layers, _ = BertModel(self.bert_cfg, name="bert")(
            input_ids, token_type_ids, attention_mask, train=False
        )
        x = jax.lax.stop_gradient(all_layers[-1])
        x = TorchLinear(self.embed_size, name="mapping")(x)
        b, t, d = x.shape
        agsa_emb = AGSA(1, self.embed_size, h=self.head, drop=self.drop,
                        name="agsa")(x, train=train)
        y = TorchLinear(self.embed_size, name="fc1")(agsa_emb)
        y = nn.Dropout(self.drop, deterministic=not train)(nn.relu(y))
        y = TorchLinear(self.embed_size, name="fc2")(y)
        y = TorchBatchNorm(use_running_average=not train, name="bn")(
            y.reshape(b * t, d)
        ).reshape(b, t, d)
        x = agsa_emb + nn.Dropout(self.drop, deterministic=not train)(y)
        # ref means over every token slot, padded ones included
        cap_emb = jnp.mean(x, axis=1)
        return f_normalize(cap_emb, axis=-1)


class CAMERA(nn.Module):
    """CAMERA (ref Models.py:550-645)."""

    bert_cfg: BertConfig
    embed_size: int = 2048
    head: int = 64
    smry_k: int = 12
    smry_lamda: float = 0.01
    drop: float = 0.0
    margin: float = 0.2
    max_violation: bool = False

    def setup(self):
        self.img_enc = CAMERAImageEncoder(
            embed_size=self.embed_size, head=self.head, smry_k=self.smry_k,
            drop=self.drop,
        )
        self.txt_enc = CAMERATextEncoder(
            bert_cfg=self.bert_cfg, embed_size=self.embed_size, head=self.head,
            drop=self.drop,
        )

    def embed(self, batch, train: bool = False):
        cap = self.txt_enc(
            batch["cap_ids"], batch["cap_mask"], batch["type_ids"], train=train
        )
        img, smry_mat = self.img_enc(
            batch["images"], batch["boxes"], batch["imgs_wh"], train=train
        )
        out = {"img": img, "cap": cap}
        if train:
            # smry_mat only feeds the diversity regularizer
            out["smry_mat"] = smry_mat
        return out

    def similarity(self, img, cap, cap_mask=None, train: bool = False):
        return sim.multi_view_matching(img, cap)

    def loss(self, batch, train: bool = True, epoch=0):
        e = self.embed(batch, train=train)
        sim_mat = self.similarity(e["img"], e["cap"], train=train)
        ranking = losses.triplet_loss(sim_mat, self.margin, self.max_violation)
        div = losses.diversity_regularization(e["smry_mat"])
        loss = ranking + div * self.smry_lamda
        return loss, {"Loss": loss, "Rank_Loss": ranking, "Div_loss": div}

    def __call__(self, batch, train: bool = True, epoch=0):
        return self.loss(batch, train=train, epoch=epoch)


def load_pretrained_weights(config: dict, variables: dict) -> dict:
    """Inject a converted torch BERT checkpoint into txt_enc/bert, when
    config['init_checkpoint'] exists (ref TextEncoder.py:82 loads
    pytorch_model.bin into the tower before freezing)."""
    path = config.get("init_checkpoint")
    if not (path and os.path.exists(path)):
        return variables
    if config["name"] not in ("SAEM", "CAMERA"):
        return variables
    bert_cfg = _bert_cfg_from_config(config) or BertConfig(
        vocab_size=config.get("vocab_size", 30522)
    )
    from .bert import load_torch_bert

    bert_params = load_torch_bert(path, bert_cfg)
    params = dict(variables["params"])
    txt = dict(params["txt_enc"])
    txt["bert"] = bert_params
    params["txt_enc"] = txt
    out = dict(variables)
    out["params"] = params
    print(f"=> loaded pretrained BERT weights from {path}")
    return out


def build_saem(config: dict):
    bert_cfg = _bert_cfg_from_config(config) or BertConfig(
        vocab_size=config.get("vocab_size", 30522)
    )
    return SAEM(
        bert_cfg=bert_cfg,
        trans_cfg=_trans_cfg_from_config(config),
        final_dims=config["final_dims"],
        embed_size=config["embed_size"],
        txt_stru=config["txt_stru"],
        img_stru=config.get("img_stru", "trans"),
        bi_gru=config["bi_gru"],
        margin=config["margin"],
        max_violation=config["max_violation"],
        measure=config["measure"],
    )


def build_camera(config: dict):
    bert_cfg = _bert_cfg_from_config(config) or BertConfig(
        vocab_size=config.get("vocab_size", 30522)
    )
    return CAMERA(
        bert_cfg=bert_cfg,
        embed_size=config["embed_size"],
        head=config["head"],
        smry_k=config["smry_k"],
        smry_lamda=config["smry_lamda"],
        drop=config["drop"],
        margin=config["margin"],
        max_violation=config["max_violation"],
    )
