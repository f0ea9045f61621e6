"""The six retrieval methods as flax modules.

Reference: itr/modalmodule/Models.py.  Each method exposes three entry points
(used via `module.apply(..., method=...)`):

 - `embed(batch, train)`  -> dict of embeddings (+ masks / extras),
 - `similarity(img, cap, cap_mask, train)` -> (Ni, Nc) score block — the
   method-owned similarity the metric layer tiles over the full grid (the
   reference's `cal_sims` dispatch, evaluation.py:128-131),
 - `loss(batch, train)` -> (scalar, aux dict) — the training objective.

`__call__` aliases `loss` so `module.init` traces every parameter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import attention, losses, sim
from .img_encoders import EncoderImagePrecomp, EncoderImagePrecompAttn
from .txt_encoders import EncoderText
from .sgraf import EncoderSimilarity
from .vsrn_decoder import S2VTAttModel


class VSEPP(nn.Module):
    """VSE++ (ref Models.py:63-144): global embeddings + cosine/order hinge."""

    vocab_size: int
    embed_size: int = 1024
    word_dim: int = 300
    measure: str = "cosine"
    use_abs: bool = False
    no_imgnorm: bool = False
    margin: float = 0.2
    max_violation: bool = False
    # raw-pixel path (ref Models.py:70-76): CNN tower when the dataset is not
    # *_precomp
    full_encoder: bool = False
    cnn_type: str = "vgg19"
    finetune: bool = False

    def setup(self):
        if self.full_encoder:
            from .cnn import EncoderImageFull

            self.img_enc = EncoderImageFull(
                embed_size=self.embed_size,
                cnn_type=self.cnn_type,
                finetune=self.finetune,
                use_abs=self.use_abs,
                no_imgnorm=self.no_imgnorm,
            )
        else:
            self.img_enc = EncoderImagePrecomp(
                embed_size=self.embed_size,
                no_imgnorm=self.no_imgnorm,
                precomp_enc_type="basic",
                use_abs=self.use_abs,
            )
        # ref Models.py:77-79 passes no_txtnorm=False unconditionally
        self.txt_enc = EncoderText(
            vocab_size=self.vocab_size,
            word_dim=self.word_dim,
            embed_size=self.embed_size,
            use_abs=self.use_abs,
            no_txtnorm=False,
            sentence_level=True,
        )

    def embed(self, batch, train: bool = False):
        if self.full_encoder:
            img = self.img_enc(batch["images"], train=train)
        else:
            img = self.img_enc(batch["images"])
        cap = self.txt_enc(batch["cap_ids"], batch["cap_mask"], train=train)
        return {"img": img, "cap": cap}

    def similarity(self, img, cap, cap_mask=None, train: bool = False):
        if self.measure == "order":
            return sim.order_sim(img, cap)
        return sim.cosine_sim(img, cap)

    def loss(self, batch, train: bool = True, epoch=0):
        e = self.embed(batch, train=train)
        scores = self.similarity(e["img"], e["cap"], train=train)
        loss = losses.contrastive_hinge(scores, self.margin, self.max_violation)
        return loss, {"Loss": loss}

    def __call__(self, batch, train: bool = True, epoch=0):
        return self.loss(batch, train=train, epoch=epoch)


class SCAN(nn.Module):
    """SCAN (ref Models.py:148-225): stacked cross-attention similarity."""

    vocab_size: int
    embed_size: int = 1024
    word_dim: int = 300
    bi_gru: bool = False
    no_imgnorm: bool = False
    no_txtnorm: bool = True
    precomp_enc_type: str = "basic"
    margin: float = 0.2
    max_violation: bool = False
    cross_attn: str = "t2i"
    raw_feature_norm: str = "clipped_l2norm"
    agg_func: str = "LogSumExp"
    lambda_lse: float = 6.0
    lambda_softmax: float = 9.0
    # Pallas fused eval kernels (t2i and i2t, clipped_l2norm, LogSumExp/Mean
    # — every published SCAN variant).  Engage only for bf16 inputs on a TPU
    # backend (the eval_bf16 production mode, where they beat the tiled XLA
    # path 1.8-2.0x like-for-like at f30k-1K); fp32 falls back to XLA.
    use_fused_eval: bool = True

    def setup(self):
        self.img_enc = EncoderImagePrecomp(
            embed_size=self.embed_size,
            no_imgnorm=self.no_imgnorm,
            precomp_enc_type=self.precomp_enc_type,
        )
        self.txt_enc = EncoderText(
            vocab_size=self.vocab_size,
            word_dim=self.word_dim,
            embed_size=self.embed_size,
            use_bi_gru=self.bi_gru,
            no_txtnorm=self.no_txtnorm,
        )

    def embed(self, batch, train: bool = False):
        img = self.img_enc(batch["images"])
        cap = self.txt_enc(batch["cap_ids"], batch["cap_mask"], train=train)
        return {"img": img, "cap": cap, "cap_mask": batch["cap_mask"]}

    def fused_eval_active(self, compute_dtype) -> bool:
        """True when eval similarity at `compute_dtype` routes to the fused
        Pallas kernels (the eval engine then skips tile budgeting — the
        kernels stream the whole grid without an HBM attention tensor).
        `similarity` derives its own dispatch from this method so the two
        can never drift (a drift would make the engine size an untiled grid
        that then falls back to the XLA chain and OOMs HBM)."""
        from ..ops.pallas import pallas_ok

        return (
            self.use_fused_eval
            and compute_dtype is not None
            and jnp.dtype(compute_dtype) == jnp.bfloat16
            and pallas_ok()
            and self.cross_attn in ("t2i", "i2t")
            and self.raw_feature_norm == "clipped_l2norm"
            and self.agg_func in ("LogSumExp", "Mean")
        )

    def similarity(self, img, cap, cap_mask, train: bool = False):
        if not train and self.fused_eval_active(img.dtype):
            from ..ops.pallas import shard_mesh

            kw = dict(
                lambda_lse=self.lambda_lse,
                lambda_softmax=self.lambda_softmax,
                agg_func=self.agg_func,
            )
            mesh = shard_mesh()
            if mesh is not None:
                # multi-chip: captions sharded over 'dp', one kernel per chip
                from ..ops.pallas.xattn import xattn_fused_sharded

                return xattn_fused_sharded(
                    img, cap, cap_mask, mesh, cross_attn=self.cross_attn, **kw
                )
            from ..ops.pallas.xattn import xattn_i2t_fused, xattn_t2i_fused

            fused = xattn_t2i_fused if self.cross_attn == "t2i" else xattn_i2t_fused
            return fused(img, cap, cap_mask, **kw)
        fn = (
            attention.xattn_score_t2i
            if self.cross_attn == "t2i"
            else attention.xattn_score_i2t
        )
        return fn(
            img,
            cap,
            cap_mask,
            raw_feature_norm=self.raw_feature_norm,
            agg_func=self.agg_func,
            lambda_lse=self.lambda_lse,
            lambda_softmax=self.lambda_softmax,
        )

    def loss(self, batch, train: bool = True, epoch=0):
        e = self.embed(batch, train=train)
        scores = self.similarity(e["img"], e["cap"], e["cap_mask"], train=train)
        loss = losses.contrastive_hinge(scores, self.margin, self.max_violation)
        return loss, {"Loss": loss}

    def __call__(self, batch, train: bool = True, epoch=0):
        return self.loss(batch, train=train, epoch=epoch)


class VSRN(nn.Module):
    """VSRN (ref Models.py:229-365): GCN image reasoning + caption-decoder aux loss."""

    vocab_size: int
    embed_size: int = 2048
    word_dim: int = 300
    data_name: str = "f30k_precomp"
    measure: str = "cosine"
    use_abs: bool = False
    no_imgnorm: bool = False
    no_txtnorm: bool = False
    margin: float = 0.2
    max_violation: bool = False
    max_len: int = 60
    dim_hidden: int = 512
    dim_vid: int = 2048
    dim_word: int = 300
    input_dropout_p: float = 0.2

    def setup(self):
        self.img_enc = EncoderImagePrecompAttn(
            embed_size=self.embed_size,
            data_name=self.data_name,
            use_abs=self.use_abs,
            no_imgnorm=self.no_imgnorm,
        )
        self.txt_enc = EncoderText(
            vocab_size=self.vocab_size,
            word_dim=self.word_dim,
            embed_size=self.embed_size,
            use_abs=self.use_abs,
            no_txtnorm=self.no_txtnorm,
            sentence_level=True,
        )
        self.caption_model = S2VTAttModel(
            vocab_size=self.vocab_size,
            max_len=self.max_len,
            dim_vid=self.dim_vid,
            dim_hidden=self.dim_hidden,
            dim_word=self.dim_word,
            input_dropout_p=self.input_dropout_p,
        )

    def embed(self, batch, train: bool = False):
        img, gcn = self.img_enc(batch["images"], train=train)
        cap = self.txt_enc(batch["cap_ids"], batch["cap_mask"], train=train)
        out = {"img": img, "cap": cap}
        if train:
            # the GCN sequence only feeds the caption-decoder loss; stacking
            # it during eval would hold (N, 36, 2048) activations for nothing
            out["gcn"] = gcn
        return out

    def similarity(self, img, cap, cap_mask=None, train: bool = False):
        if self.measure == "order":
            return sim.order_sim(img, cap)
        return sim.cosine_sim(img, cap)

    def caption(self, images, mode: str = "greedy", temperature: float = 1.0):
        """Autoregressive caption sampling from region features
        (ref Fusionmodule.py:303-341).  Returns (seq_logprobs, seq_preds),
        each (B, max_len-2).  mode='multinomial' needs a 'sample' rng."""
        _, gcn = self.img_enc(images, train=False)
        return self.caption_model(
            gcn, None, train=False, mode=mode, temperature=temperature
        )

    def loss(self, batch, train: bool = True, epoch=0):
        e = self.embed(batch, train=train)
        scores = self.similarity(e["img"], e["cap"], train=train)
        retrieval = losses.contrastive_hinge(scores, self.margin, self.max_violation)
        logprobs = self.caption_model(e["gcn"], batch["label_ids"], train=train)
        caption = losses.language_model_loss(
            logprobs, batch["label_ids"][:, 1:], batch["label_mask"][:, 1:]
        )
        loss = retrieval + caption
        return loss, {
            "Loss": loss,
            "Loss_retrieval": retrieval,
            "Loss_caption": caption,
        }

    def __call__(self, batch, train: bool = True, epoch=0):
        return self.loss(batch, train=train, epoch=epoch)


class SGRAF(nn.Module):
    """SGRAF (ref Models.py:468-546): similarity tower scores + hinge."""

    vocab_size: int
    embed_size: int = 1024
    word_dim: int = 300
    sim_dim: int = 256
    bi_gru: bool = True
    no_imgnorm: bool = False
    no_txtnorm: bool = False
    module_name: str = "SGR"
    sgr_step: int = 3
    margin: float = 0.2
    max_violation: bool = False
    cap_chunk: int = 32
    sim_bf16: bool = False
    sim_remat: bool = True
    # the reference hardcodes 0.4 everywhere (Models.py:481, Fusionmodule.py
    # :477-480, :527-529); config key `sgraf_dropout` exists so deterministic
    # parity runs can zero it
    dropout: float = 0.4

    def setup(self):
        self.img_enc = EncoderImagePrecomp(
            embed_size=self.embed_size,
            no_imgnorm=self.no_imgnorm,
            precomp_enc_type="basic",
        )
        self.txt_enc = EncoderText(
            vocab_size=self.vocab_size,
            word_dim=self.word_dim,
            embed_size=self.embed_size,
            use_bi_gru=self.bi_gru,
            no_txtnorm=self.no_txtnorm,
            dropout=self.dropout,
        )
        self.sim_enc = EncoderSimilarity(
            embed_size=self.embed_size,
            sim_dim=self.sim_dim,
            module_name=self.module_name,
            sgr_step=self.sgr_step,
            cap_chunk=self.cap_chunk,
            compute_dtype="bfloat16" if self.sim_bf16 else None,
            remat=self.sim_remat,
            sa_dropout=self.dropout,
        )

    def embed(self, batch, train: bool = False):
        img = self.img_enc(batch["images"])
        cap = self.txt_enc(batch["cap_ids"], batch["cap_mask"], train=train)
        return {"img": img, "cap": cap, "cap_mask": batch["cap_mask"]}

    def fused_eval_active(self, compute_dtype) -> bool:
        """True when eval similarity at `compute_dtype` routes to the
        single-device whole-set fused path (EncoderSimilarity ->
        _fused_eval_whole): the eval engine then scores the full (Ni, Nc)
        grid in ONE call instead of tiles — the per-chunk kernel bounds its
        own HBM, so tiling only adds dispatch latency (~40ms/tile on the
        axon relay, ~1.3s of a 2.9s f30k-1K eval).  Under a mesh this is
        False and the tiled dp-sharded path carries the multi-chip
        parallelism.  Gate mirrored in EncoderSimilarity.__call__ so engine
        sizing and model dispatch can never drift."""
        from ..ops.pallas import pallas_ok, shard_mesh

        return (
            self.module_name in ("SGR", "SAF")
            and compute_dtype is not None
            and jnp.dtype(compute_dtype) == jnp.bfloat16
            and self.embed_size % 128 == 0
            and self.sim_dim % 128 == 0
            and pallas_ok()
            and shard_mesh() is None
        )

    def similarity(self, img, cap, cap_mask, train: bool = False):
        return self.sim_enc(img, cap, cap_mask, train=train)

    def loss(self, batch, train: bool = True, epoch=0):
        e = self.embed(batch, train=train)
        scores = self.similarity(e["img"], e["cap"], e["cap_mask"], train=train)
        loss = losses.contrastive_hinge(scores, self.margin, self.max_violation)
        return loss, {"Loss": loss}

    def __call__(self, batch, train: bool = True, epoch=0):
        return self.loss(batch, train=train, epoch=epoch)
