"""CAMERA building blocks: AGSA gated self-attention, multi-view
summarization, box position encoding.

Reference: itr/modalmodule/camera_.py (AGSA :14-89, Summarization :93-114,
PositionEncoder :118-148).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import TorchBatchNorm, TorchLinear


class GatedQueryAttLayer(nn.Module):
    """Multi-head self-attention with element-gated Q/K (ref :14-54)."""

    embed_size: int
    h: int
    is_share: bool = False
    drop: float = 0.0
    train: bool = False

    @nn.compact
    def __call__(self, inp, mask=None):
        b, n, _ = inp.shape
        d_k = self.embed_size // self.h
        if self.is_share:
            lin = TorchLinear(self.embed_size, name="linear")
            q, k, v = lin(inp), lin(inp), lin(inp)
        else:
            q = TorchLinear(self.embed_size, name="linear_q")(inp)
            k = TorchLinear(self.embed_size, name="linear_k")(inp)
            v = TorchLinear(self.embed_size, name="linear_v")(inp)
        # (B, h, N, d_k)
        q = q.reshape(b, n, self.h, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.h, d_k).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.h, d_k).transpose(0, 2, 1, 3)

        # gate params declared through the same modules either path, so the
        # checkpoint layout (fc_q/fc_k/fc_g kernels+biases) is identical
        wq, bq = TorchLinear(d_k, name="fc_q")(d_k, params_only=True)
        wk, bk = TorchLinear(d_k, name="fc_k")(d_k, params_only=True)
        wg, bg = TorchLinear(2 * d_k, name="fc_g")(d_k, params_only=True)

        from ..ops.pallas import pallas_ok  # noqa: PLC0415 (trace-time gate)

        if (
            pallas_ok()
            and mask is None
            and q.dtype == jnp.bfloat16
            and (self.drop == 0.0 or not self.train)
            and d_k % 8 == 0
            and d_k <= 128
        ):
            from ..ops.pallas.agsa_attn import agsa_attention_auto

            x = agsa_attention_auto(
                q, k, v,
                wq, bq, wk, bk,
                wg[:, :d_k], bg[:d_k], wg[:, d_k:], bg[d_k:],
            )
            return x.transpose(0, 2, 1, 3).reshape(b, n, self.h * d_k)

        g = (q @ wq.astype(q.dtype) + bq.astype(q.dtype)) * (
            k @ wk.astype(k.dtype) + bk.astype(k.dtype)
        )
        m = jax.nn.sigmoid(g @ wg.astype(g.dtype) + bg.astype(g.dtype))
        q = q * m[..., :d_k]
        k = k * m[..., d_k:]

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d_k)
        if mask is not None:
            scores = jnp.where(mask == 0, -1e9, scores)
        p_attn = jax.nn.softmax(scores, axis=-1)
        if self.drop > 0:
            p_attn = nn.Dropout(self.drop, deterministic=not self.train)(p_attn)
        x = jnp.einsum("bhqk,bhkd->bhqd", p_attn, v)
        return x.transpose(0, 2, 1, 3).reshape(b, n, self.h * d_k)


class AGSA(nn.Module):
    """Adaptive Gating Self-Attention stack with BN residuals (ref :57-89)."""

    num_layers: int
    embed_size: int
    h: int = 1
    is_share: bool = False
    drop: float = 0.0

    @nn.compact
    def __call__(self, rgn_emb, pos_emb=None, mask=None, train: bool = False):
        b, n, d = rgn_emb.shape
        # the gate is computed from fp32 geometry (see make_train_step's
        # _cast_batch); cast it to the activation dtype here so an fp32
        # gate cannot silently promote the whole bf16 chain downstream
        x = (
            rgn_emb
            if pos_emb is None
            else rgn_emb * pos_emb.astype(rgn_emb.dtype)
        )

        def block(i, x_in):
            y = GatedQueryAttLayer(
                self.embed_size, self.h, self.is_share, drop=self.drop,
                train=train, name=f"att_{i}",
            )(x_in, mask)
            # ref applies BatchNorm1d over the flattened (bs*num_r, dim)
            y = TorchBatchNorm(use_running_average=not train, name=f"bn_{i}")(
                y.reshape(b * n, d)
            ).reshape(b, n, d)
            return nn.Dropout(self.drop, deterministic=not train)(y)

        agsa_emb = rgn_emb + block(0, x)
        for i in range(1, self.num_layers):
            agsa_emb = agsa_emb + block(i, agsa_emb)
        return agsa_emb


class Summarization(nn.Module):
    """Multi-view summarization: 7 dilated conv banks -> (B, R, smry_k) (ref :93-114)."""

    embed_size: int
    smry_k: int

    @nn.compact
    def __call__(self, rgn_emb):
        out_c = [256, 128, 128, 128, 128, 128, 128]
        k_size = [1, 3, 3, 3, 5, 5, 5]
        dila = [1, 1, 2, 3, 1, 2, 3]
        feats = []
        for i in range(len(out_c)):
            # reference padding values keep the region length unchanged == SAME
            y = nn.Conv(
                out_c[i],
                kernel_size=(k_size[i],),
                kernel_dilation=(dila[i],),
                padding="SAME",
                name=f"conv_{i}",
            )(rgn_emb)
            feats.append(nn.relu(y))
        x = jnp.concatenate(feats, axis=-1)  # (B, R, 1024)
        return TorchLinear(self.smry_k, name="convs_fc")(x)


def absolute_encode(boxes, imgs_wh):
    """Normalized box geometry features (ref camera_.py:118-128).

    boxes: (B, R, 4) xyxy; imgs_wh: (B, 2).  Returns (B, R, 6):
    [x, y, w, h normalized by image size, w/h, area ratio].
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    imgs_wh = jnp.asarray(imgs_wh, jnp.float32)
    x, y = boxes[:, :, 0], boxes[:, :, 1]
    w = boxes[:, :, 2] - boxes[:, :, 0]
    h = boxes[:, :, 3] - boxes[:, :, 1]
    expand_wh = jnp.concatenate([imgs_wh, imgs_wh], axis=1)[:, None, :]  # (B,1,4)
    # sign-preserving clamp: a degenerate box (h == 0, legal in raw
    # detector output) must not put an inf into the gate's input — the
    # sigmoid forward survives but its kernel gradient becomes 0*inf = NaN
    h_safe = jnp.where(jnp.abs(h) < 1e-6, jnp.where(h < 0, -1e-6, 1e-6), h)
    ratio_wh = (w / h_safe)[..., None]
    ratio_area = (w * h / (imgs_wh[:, 0] * imgs_wh[:, 1])[:, None])[..., None]
    xywh = jnp.stack([x, y, w, h], axis=2) / expand_wh
    return jnp.concatenate([xywh, ratio_wh, ratio_area], axis=-1)


class PositionEncoder(nn.Module):
    """Box geometry -> sigmoid gate embedding (ref camera_.py:131-148)."""

    embed_dim: int

    @nn.compact
    def __call__(self, boxes, imgs_wh):
        posi = absolute_encode(boxes, imgs_wh)
        return jax.nn.sigmoid(TorchLinear(self.embed_dim, name="proj")(posi))
