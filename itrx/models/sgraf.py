"""SGRAF similarity tower (ref itr/modalmodule/Fusionmodule.py:373-664).

The reference loops over captions in Python, building per-caption alignment
vectors against all images (`EncoderSimilarity.forward`, :406-451).  Here the
tower is fully batched over caption *chunks*: each chunk computes its
(chunk*Ni, L+1, sim_dim) alignment tensor, runs SGR graph steps / SAF
filtration, and reduces to an (Ni, chunk) score block.  Chunking bounds peak
activation memory; at train time each chunk is rematerialized
(`nn.remat`) so the backward pass never holds more than one chunk's
activations.

Masking notes (the reference slices captions to their true length, so padded
words must be excluded here): word positions are masked out of the SCAN
attention, of TextSA's softmax, and of the SGR/SAF node set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.norms import l1norm, l2norm, safe_sqrt
from .layers import TorchBatchNorm, XavierLinear

NEG_INF = -1e18


class VisualSA(nn.Module):
    """Global image embedding by region self-attention (ref :464-512).

    BatchNorm1d(num_region) on (B, R, D) pools stats over (B, D) per region —
    replicated with feature axis = region axis.
    """

    embed_dim: int
    dropout_rate: float = 0.4

    @nn.compact
    def __call__(self, local, raw_global, train: bool = False):
        l_emb = XavierLinear(self.embed_dim, name="local_fc")(local)
        l_emb = TorchBatchNorm(use_running_average=not train, axis=1, name="local_bn")(
            l_emb
        )
        l_emb = jnp.tanh(l_emb)
        l_emb = nn.Dropout(self.dropout_rate, deterministic=not train)(l_emb)

        g_emb = XavierLinear(self.embed_dim, name="global_fc")(raw_global)
        g_emb = TorchBatchNorm(use_running_average=not train, name="global_bn")(g_emb)
        g_emb = jnp.tanh(g_emb)
        g_emb = nn.Dropout(self.dropout_rate, deterministic=not train)(g_emb)

        common = l_emb * g_emb[:, None, :]
        weights = XavierLinear(1, name="common_fc")(common)[..., 0]
        weights = jax.nn.softmax(weights, axis=1)
        new_global = jnp.sum(weights[..., None] * local, axis=1)
        return l2norm(new_global, axis=-1)


class TextSA(nn.Module):
    """Global text embedding by word self-attention (ref :515-561), masked."""

    embed_dim: int
    dropout_rate: float = 0.4

    @nn.compact
    def __call__(self, local, raw_global, mask, train: bool = False):
        l_emb = XavierLinear(self.embed_dim, name="local_fc")(local)
        l_emb = jnp.tanh(l_emb)
        l_emb = nn.Dropout(self.dropout_rate, deterministic=not train)(l_emb)

        g_emb = XavierLinear(self.embed_dim, name="global_fc")(raw_global)
        g_emb = jnp.tanh(g_emb)
        g_emb = nn.Dropout(self.dropout_rate, deterministic=not train)(g_emb)

        common = l_emb * g_emb[:, None, :]
        weights = XavierLinear(1, name="common_fc")(common)[..., 0]
        weights = jnp.where(mask > 0, weights, NEG_INF)
        weights = jax.nn.softmax(weights, axis=1)
        new_global = jnp.sum(weights[..., None] * local, axis=1)
        return l2norm(new_global, axis=-1)


class GraphReasoning(nn.Module):
    """One SGR step: self-attention over L+1 alignment nodes (ref :564-597).

    params_only=True returns the three Linears' (kernel, bias) pairs for
    the fused Pallas SGR kernel (itrx/ops/pallas/sgr.py), which applies
    them itself while keeping this module's checkpoint layout.
    """

    sim_dim: int

    @nn.compact
    def __call__(self, sim_emb, node_mask, *, params_only: bool = False):
        q_lin = XavierLinear(self.sim_dim, name="query_w")
        k_lin = XavierLinear(self.sim_dim, name="key_w")
        g_lin = XavierLinear(self.sim_dim, name="graph_w")
        if params_only:
            return (
                q_lin(self.sim_dim, params_only=True),
                k_lin(self.sim_dim, params_only=True),
                g_lin(self.sim_dim, params_only=True),
            )
        q = q_lin(sim_emb)
        k = k_lin(sim_emb)
        edge = jnp.einsum("bnd,bmd->bnm", q, k)
        edge = jnp.where(node_mask[:, None, :] > 0, edge, NEG_INF)
        edge = jax.nn.softmax(edge, axis=-1)
        sgr = jnp.einsum("bnm,bmd->bnd", edge, sim_emb)
        return nn.relu(g_lin(sgr))


class _SAFBatchNorm(nn.Module):
    """Per-caption BatchNorm1d(1) matching the reference's SAF semantics.

    The reference scores captions one at a time (Fusionmodule.py:406-451),
    so its SAF BatchNorm1d(1) (:608, :620) computes TRAIN-mode stats over
    one caption's (Ni, L_i+1) valid nodes and updates the running stats
    once per caption, caption-sequentially.  Here the chunk arrives batched
    as (C, Ni, N) + node mask; train mode reproduces the per-caption stats
    with masked reductions and folds the C sequential running-stat updates
    into closed form: r' = 0.9^C r + sum_i 0.1 * 0.9^(C-1-i) * stat_i.
    Unbiased variance (factor n/(n-1)) feeds the running update, biased
    normalizes — torch _BatchNorm semantics.  Eval mode uses the running
    stats exactly as before.  Scope keeps the historical bn/BatchNorm_0
    naming so checkpoints and the reference converter load unchanged.
    """

    train: bool = False

    @nn.compact
    def __call__(self, x, mask, *, params_only: bool = False):
        # x, mask: (C, Ni, N); one BN channel
        scale = self.param("scale", nn.initializers.ones, (1,))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (1,)
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (1,)
        )
        if params_only:
            return (
                scale, bias,
                jnp.asarray(ra_mean.value), jnp.asarray(ra_var.value),
            )
        if not self.train:
            mean = jnp.asarray(ra_mean.value, jnp.float32)[0]
            var = jnp.asarray(ra_var.value, jnp.float32)[0]
            inv = jax.lax.rsqrt(var + 1e-5).astype(x.dtype)
            return (x - mean.astype(x.dtype)) * inv * scale.astype(x.dtype)[
                0
            ] + bias.astype(x.dtype)[0]

        xf = x.astype(jnp.float32)
        mf = mask.astype(jnp.float32)
        cnt = jnp.sum(mf, axis=(1, 2))  # (C,) valid nodes per caption
        mean_c = jnp.sum(xf * mf, axis=(1, 2)) / cnt
        var_c = (
            jnp.sum(jnp.square(xf) * mf, axis=(1, 2)) / cnt
            - jnp.square(mean_c)
        )
        if not self.is_initializing():
            c = x.shape[0]
            unbiased = var_c * (cnt / jnp.maximum(cnt - 1.0, 1.0))
            w = 0.1 * jnp.power(0.9, (c - 1.0) - jnp.arange(c, dtype=jnp.float32))
            decay = 0.9**c
            ra_mean.value = (
                decay * jnp.asarray(ra_mean.value, jnp.float32)
                + jnp.sum(w * mean_c)[None]
            ).astype(jnp.asarray(ra_mean.value).dtype)
            ra_var.value = (
                decay * jnp.asarray(ra_var.value, jnp.float32)
                + jnp.sum(w * unbiased)[None]
            ).astype(jnp.asarray(ra_var.value).dtype)
        inv = jax.lax.rsqrt(var_c + 1e-5).astype(x.dtype)[:, None, None]
        mean_b = mean_c.astype(x.dtype)[:, None, None]
        return (x - mean_b) * inv * scale.astype(x.dtype)[0] + bias.astype(
            x.dtype
        )[0]


class _SAFBNScope(nn.Module):
    """Scope shim keeping the historical bn/BatchNorm_0 parameter paths."""

    train: bool = False

    @nn.compact
    def __call__(self, x, mask, *, params_only: bool = False):
        return _SAFBatchNorm(train=self.train, name="BatchNorm_0")(
            x, mask, params_only=params_only
        )


class AttentionFiltration(nn.Module):
    """SAF: gated L1-norm attention pooling over nodes (ref :600-629).

    The single-channel BatchNorm follows the reference's per-caption
    semantics in train mode (see _SAFBatchNorm); rows arrive grouped by
    caption, `cap_rows` captions per chunk.
    """

    sim_dim: int
    train: bool = False
    cap_rows: int = 1

    @nn.compact
    def __call__(self, sim_emb, node_mask, *, params_only: bool = False):
        if params_only:
            # (kernel, bias) of attn_w + (scale, bias, mean, var) of the BN
            # — for the fused eval kernel, which folds the eval-mode BN
            # affine into the Linear (itrx/ops/pallas/sgraf_eval.py)
            return (
                XavierLinear(1, name="attn_w")(self.sim_dim, params_only=True),
                _SAFBNScope(train=self.train, name="bn")(
                    None, None, params_only=True
                ),
            )
        b, n, _ = sim_emb.shape
        c = self.cap_rows
        attn = XavierLinear(1, name="attn_w")(sim_emb)[..., 0]  # (B, N)
        attn = _SAFBNScope(train=self.train, name="bn")(
            attn.reshape(c, b // c, n), node_mask.reshape(c, b // c, n)
        ).reshape(b, n)
        attn = jax.nn.sigmoid(attn) * node_mask
        attn = l1norm(attn, axis=-1)
        saf = jnp.einsum("bn,bnd->bd", attn, sim_emb)
        return l2norm(saf, axis=-1)


class _ChunkScorer(nn.Module):
    """Score one caption chunk against all images; params shared across chunks.

    compute_dtype='bfloat16' runs the whole alignment chain (SCAN attention
    context, squared-diff alignment vectors, SGR/SAF reasoning) in bf16 —
    the chunk tensors are the HBM-traffic hot spot of SGRAF training — and
    returns fp32 scores.
    """

    embed_size: int
    sim_dim: int
    module_name: str
    sgr_step: int
    train: bool
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, img_emb, img_glo, cap_c, mask_c, glo_c,
                 *, params_only: bool = False):
        if params_only:
            # Weight pytree for the whole-set fused eval path
            # (EncoderSimilarity -> _fused_eval_whole): exactly the params
            # the fused per-chunk branch below uses, same module names, so
            # checkpoints and the reference converter are unaffected.
            d = img_emb.shape[-1]
            glo_wb = XavierLinear(self.sim_dim, name="sim_tranglo_w")(
                d, params_only=True
            )
            loc_wb = XavierLinear(self.sim_dim, name="sim_tranloc_w")(
                d, params_only=True
            )
            if self.module_name == "SGR":
                prm = [
                    GraphReasoning(self.sim_dim, name=f"SGR_{i}")(
                        None, None, params_only=True
                    )
                    for i in range(self.sgr_step)
                ]
                stack = lambda j, k_: jnp.stack([p[j][k_] for p in prm])
                mod = (
                    stack(0, 0), stack(0, 1), stack(1, 0), stack(1, 1),
                    stack(2, 0), stack(2, 1),
                )
            else:
                (awk, awb), (bsc, bbi, bmean, bvar) = AttentionFiltration(
                    self.sim_dim, train=self.train, cap_rows=1, name="SAF"
                )(None, None, params_only=True)
                # same eval-mode BN fold as the per-chunk branch below
                f32 = jnp.float32
                aprime = bsc.astype(f32)[0] * jax.lax.rsqrt(
                    bvar.astype(f32)[0] + 1e-5
                )
                bprime = bbi.astype(f32)[0] - bmean.astype(f32)[0] * aprime
                awf = (awk[:, 0].astype(f32) * aprime).reshape(1, self.sim_dim)
                abf = jnp.full(
                    (1, self.sim_dim),
                    awb.astype(f32)[0] * aprime + bprime, f32,
                )
                mod = (awf, abf)
            eval_wb = XavierLinear(1, name="sim_eval_w")(
                self.sim_dim, params_only=True
            )
            return glo_wb, loc_wb, mod, eval_wb
        if self.compute_dtype is not None:
            cdt = jnp.dtype(self.compute_dtype)
            img_emb, img_glo, cap_c, glo_c = (
                img_emb.astype(cdt), img_glo.astype(cdt),
                cap_c.astype(cdt), glo_c.astype(cdt),
            )
        # an fp32 mask would silently promote every product back to fp32 —
        # the whole downstream chunk chain rides on this cast (this also
        # covers eval_bf16, where the embeddings arrive already cast)
        mask_c = mask_c.astype(img_emb.dtype)
        ni = img_emb.shape[0]
        c = cap_c.shape[0]

        from ..ops.pallas import pallas_ok

        d = img_emb.shape[-1]
        kernel_shapes_ok = (
            img_emb.dtype == jnp.bfloat16
            and d % 128 == 0
            and self.sim_dim % 128 == 0
            and cap_c.shape[1] % 8 == 0
        )
        if (
            not self.train
            and self.module_name in ("SGR", "SAF")
            and kernel_shapes_ok
            and pallas_ok()
        ):
            # eval-only mega-fusion: global node + alignment + all SGR
            # steps + sim_eval_w epilogue in ONE Pallas grid
            # (itrx/ops/pallas/sgraf_eval.py).  Neither the (C*Ni, L+1,
            # sim_dim) node tensor nor the (C, Ni, sim_dim) sim_glo tensor
            # ever touches HBM — at 1K-test scale the two-kernel train path
            # still round-trips the nodes four times (alignment write,
            # global-node concat, SGR read, SGR per-step saves), which
            # profiling showed was most of the eval's HBM traffic.
            from ..ops.pallas.sgraf_eval import (
                sgraf_eval_auto, sgraf_eval_saf_auto,
            )

            gw, gb = XavierLinear(self.sim_dim, name="sim_tranglo_w")(
                d, params_only=True
            )
            w, bb = XavierLinear(self.sim_dim, name="sim_tranloc_w")(
                d, params_only=True
            )
            ew, eb = XavierLinear(1, name="sim_eval_w")(
                self.sim_dim, params_only=True
            )
            if self.module_name == "SGR":
                prm = [
                    GraphReasoning(self.sim_dim, name=f"SGR_{i}")(
                        None, None, params_only=True
                    )
                    for i in range(self.sgr_step)
                ]
                stack = lambda j, k_: jnp.stack([p[j][k_] for p in prm])
                sim_i = sgraf_eval_auto(
                    cap_c, mask_c, img_emb, glo_c, img_glo, w, bb, gw, gb,
                    stack(0, 0), stack(0, 1), stack(1, 0), stack(1, 1),
                    stack(2, 0), stack(2, 1), ew, eb,
                )  # (C, Ni) fp32 scores
            else:
                (awk, awb), (bsc, bbi, bmean, bvar) = AttentionFiltration(
                    self.sim_dim, train=self.train, cap_rows=c, name="SAF"
                )(None, None, params_only=True)
                # fold the eval-mode BatchNorm1d(1) affine into the Linear:
                # BN(x) = x*a' + b' with a' = scale/sqrt(var+eps),
                # b' = bias - mean*a'
                f32 = jnp.float32
                aprime = bsc.astype(f32)[0] * jax.lax.rsqrt(
                    bvar.astype(f32)[0] + 1e-5
                )
                bprime = bbi.astype(f32)[0] - bmean.astype(f32)[0] * aprime
                awf = (awk[:, 0].astype(f32) * aprime).reshape(
                    1, self.sim_dim
                )
                abf = jnp.full(
                    (1, self.sim_dim),
                    awb.astype(f32)[0] * aprime + bprime, f32,
                )
                sim_i = sgraf_eval_saf_auto(
                    cap_c, mask_c, img_emb, glo_c, img_glo, w, bb, gw, gb,
                    awf, abf, ew, eb,
                )  # (C, Ni) fp32 scores
            return sim_i.T  # (Ni, C)

        def _norm(x, axis):
            # l2 normalization with fp32-accumulated sum of squares (bf16
            # accumulation over 1024-d axes drifts); XLA fuses the cast into
            # the reduce, so no fp32 copy of x is materialized
            sq = jnp.sum((x * x).astype(jnp.float32), axis=axis, keepdims=True)
            inv = (1.0 / (safe_sqrt(sq) + 1e-8)).astype(x.dtype)
            return x * inv

        loc_proj = XavierLinear(self.sim_dim, name="sim_tranloc_w")
        if kernel_shapes_ok and pallas_ok():
            # fused Pallas path (bf16): the whole alignment chain — raw
            # dots, word-norm, region softmax, context, squared diff,
            # projection, l2norm — runs in VMEM per (caption-block, image)
            # with a custom VJP; the (C, Ni, L, D) context tensor and its
            # layout copies never touch HBM (itrx/ops/pallas/sgraf_align.py).
            # Under a mesh the kernel shard_maps over the image axis.
            from ..ops.pallas.sgraf_align import sgraf_align_auto

            w, bb = loc_proj(d, params_only=True)
            sim_loc = sgraf_align_auto(cap_c, mask_c, img_emb, w, bb).reshape(
                c * ni, -1, self.sim_dim
            )
        else:
            # pair-batched SCAN attention (Fusionmodule.py:632-664) without
            # ever materializing the (C*Ni, L, D) repeated caption / tiled
            # image copies — pure einsums over (C, Ni, ...) with
            # broadcasting; the repeats were ~2GB of HBM copy traffic per
            # chunk at batch 128
            a = jnp.einsum("ird,cld->cirl", img_emb, cap_c)  # (C,Ni,R,L)
            a = jax.nn.leaky_relu(a, negative_slope=0.1)
            a = a * mask_c[:, None, None, :]
            a = _norm(a, axis=3)
            attn = jax.nn.softmax(
                jnp.swapaxes(a, 2, 3) * jnp.asarray(9.0, a.dtype), axis=3
            )  # (C,Ni,L,R) over regions
            ctx = jnp.einsum("cilr,ird->cild", attn, img_emb)  # (C,Ni,L,D)
            ctx = _norm(ctx, axis=-1)
            sim_loc = (ctx - cap_c[:, None, :, :]) ** 2
            sim_loc = _norm(loc_proj(sim_loc), axis=-1).reshape(
                c * ni, -1, self.sim_dim
            )
        mask_x = jnp.broadcast_to(
            mask_c[:, None, :], (c, ni, mask_c.shape[1])
        ).reshape(c * ni, -1)

        sim_glo = (img_glo[None, :, :] - glo_c[:, None, :]) ** 2  # (C, Ni, D)
        sim_glo = l2norm(
            XavierLinear(self.sim_dim, name="sim_tranglo_w")(sim_glo), axis=-1
        ).reshape(c * ni, self.sim_dim)

        sim_emb = jnp.concatenate([sim_glo[:, None, :], sim_loc], axis=1)
        node_mask = jnp.concatenate(
            [jnp.ones((c * ni, 1), mask_x.dtype), mask_x], axis=1
        )
        if self.module_name == "SGR":
            mods = [
                GraphReasoning(self.sim_dim, name=f"SGR_{i}")
                for i in range(self.sgr_step)
            ]
            if sim_emb.dtype == jnp.bfloat16 and self.sim_dim % 128 == 0 and pallas_ok():
                # fused Pallas SGR: all sgr_step reasoning steps run on a
                # VMEM-resident row block — the XLA chain's ~10 HBM round
                # trips of the (C*Ni, L+1, 256) tensor per step (plus
                # layout transposes) collapse to one read + one save per
                # step (itrx/ops/pallas/sgr.py)
                from ..ops.pallas.sgr import sgr_reason_auto

                prm = [m(None, None, params_only=True) for m in mods]
                stack = lambda j, k_: jnp.stack([p[j][k_] for p in prm])
                sim_emb = sgr_reason_auto(
                    sim_emb, node_mask,
                    stack(0, 0), stack(0, 1), stack(1, 0), stack(1, 1),
                    stack(2, 0), stack(2, 1), cap_rows=c,
                )
            else:
                for m in mods:
                    sim_emb = m(sim_emb, node_mask)
            sim_vec = sim_emb[:, 0, :]
        elif self.module_name == "SAF":
            sim_vec = AttentionFiltration(
                self.sim_dim, train=self.train, cap_rows=c, name="SAF"
            )(sim_emb, node_mask)
        else:
            raise ValueError("Invalid module_name (SGR|SAF)")
        sim_i = jax.nn.sigmoid(
            XavierLinear(1, name="sim_eval_w")(sim_vec).astype(jnp.float32)
        )[:, 0]
        return sim_i.reshape(c, ni).T  # (Ni, C)


def _fused_eval_whole(img_emb, img_glo, cap_emb, cap_mask, cap_glo,
                      weights, module_name, sim_dim):
    """Whole-set fused SGRAF eval: ONE kernel grid per caption super-chunk.

    The per-chunk Python loop costs ~32 relay dispatches per f30k-1K eval
    (tiles x chunks); here the similarity for the full (Ni, Nc) grid is one
    jitted call — a lax.scan over caption super-chunks around the fused
    eval kernel (sgraf_eval.py grids over caption blocks internally; the
    global node and the sim_eval_w epilogue run inside it, so the scan
    body is nothing but the kernel).  Super-chunking bounds the kernel's
    HBM-resident caption blocks and (sc, Ni) score output to ~0.5GB at any
    Nc (coco-testall included) — at f30k-1K scale it resolves to a single
    chunk.  All inputs must already be in the compute dtype.
    """
    (gw, gb), (w, bb), mod, (ew, eb) = weights
    ni, _, d = img_emb.shape
    nc, l, _ = cap_emb.shape

    lp = -(-l // 8) * 8  # kernel wants L % 8 == 0
    if lp != l:
        cap_emb = jnp.pad(cap_emb, ((0, 0), (0, lp - l), (0, 0)))
        cap_mask = jnp.pad(cap_mask, ((0, 0), (0, lp - l)))

    sc_max = max(32, (512 << 20) // (ni * 4 + lp * d * 2))
    k = -(-nc // sc_max)            # number of super-chunks
    sc = -(-nc // k)                # balanced size ...
    sc = ((sc + 7) // 8) * 8        # ... rounded up to %8
    ncp = k * sc
    if ncp != nc:
        cap_emb = jnp.pad(cap_emb, ((0, ncp - nc), (0, 0), (0, 0)))
        cap_mask = jnp.pad(cap_mask, ((0, ncp - nc), (0, 0)))
        cap_glo = jnp.pad(cap_glo, ((0, ncp - nc), (0, 0)))

    from ..ops.pallas.sgraf_eval import sgraf_eval_auto, sgraf_eval_saf_auto

    def body(_, xs):
        cap_c, mask_c, glo_c = xs
        if module_name == "SGR":
            si = sgraf_eval_auto(cap_c, mask_c, img_emb, glo_c, img_glo,
                                 w, bb, gw, gb, *mod, ew, eb)
        else:
            si = sgraf_eval_saf_auto(cap_c, mask_c, img_emb, glo_c, img_glo,
                                     w, bb, gw, gb, *mod, ew, eb)
        return None, si  # (sc, Ni) fp32 scores

    _, out = jax.lax.scan(
        body,
        None,
        (
            cap_emb.reshape(k, sc, lp, d),
            cap_mask.reshape(k, sc, lp),
            cap_glo.reshape(k, sc, d),
        ),
    )
    return out.reshape(ncp, ni)[:nc].T  # (Ni, Nc)


class EncoderSimilarity(nn.Module):
    """SGRAF image-text similarity (ref :373-451), batched over captions.

    `__call__(img_emb (Ni,R,D), cap_emb (Nc,L,D), cap_mask (Nc,L))` returns
    (Ni, Nc) scores.
    """

    embed_size: int
    sim_dim: int
    module_name: str = "SGR"
    sgr_step: int = 3
    cap_chunk: int = 32
    compute_dtype: str | None = None
    remat: bool = True
    sa_dropout: float = 0.4  # ref hardcodes 0.4 (Fusionmodule.py:477,527)

    @nn.compact
    def __call__(self, img_emb, cap_emb, cap_mask, train: bool = False):
        ni = img_emb.shape[0]
        nc = cap_emb.shape[0]

        img_ave = jnp.mean(img_emb, axis=1)
        img_glo = VisualSA(
            self.embed_size, dropout_rate=self.sa_dropout, name="v_global_w"
        )(img_emb, img_ave, train=train)

        # cast the mask WITH the activations: an fp32 mask multiplied into a
        # bf16 caption stack silently promotes cap_ave -> cap_glo -> sim_glo
        # back to fp32, which both slows the chain and flips sim_emb to fp32
        # — disabling the fused SGR kernel's bf16 gate at eval (found via
        # the eval-tile trace: the whole SGR chain ran as fp32 XLA fusions)
        denom = jnp.maximum(
            jnp.sum(cap_mask.astype(jnp.float32), axis=1, keepdims=True), 1.0
        )
        cap_ave = jnp.sum(
            cap_emb * cap_mask.astype(cap_emb.dtype)[..., None], axis=1
        ) / denom.astype(cap_emb.dtype)
        cap_glo = TextSA(
            self.embed_size, dropout_rate=self.sa_dropout, name="t_global_w"
        )(cap_emb, cap_ave, cap_mask, train=train)

        scorer_cls = nn.remat(_ChunkScorer) if (train and self.remat) else _ChunkScorer
        scorer = scorer_cls(
            embed_size=self.embed_size,
            sim_dim=self.sim_dim,
            module_name=self.module_name,
            sgr_step=self.sgr_step,
            train=train,
            compute_dtype=self.compute_dtype,
            name="scorer",
        )

        from ..ops.pallas import pallas_ok, shard_mesh

        d = img_emb.shape[-1]
        eff_dt = (
            jnp.dtype(self.compute_dtype)
            if self.compute_dtype is not None
            else img_emb.dtype
        )
        if (
            not train
            and self.module_name in ("SGR", "SAF")
            and eff_dt == jnp.bfloat16
            and d % 128 == 0
            and self.sim_dim % 128 == 0
            and pallas_ok()
            and shard_mesh() is None
        ):
            # single-device fused eval: score the whole (Ni, Nc) grid in one
            # call (gate mirrored by SGRAF.fused_eval_active so the engine
            # skips tiling).  Under a mesh the tiled dp-sharded path stays —
            # caption tiles ARE the multi-chip parallelism there.
            weights = scorer(
                img_emb, img_glo, None, None, None, params_only=True
            )
            return _fused_eval_whole(
                img_emb.astype(eff_dt), img_glo.astype(eff_dt),
                cap_emb.astype(eff_dt), cap_mask.astype(eff_dt),
                cap_glo.astype(eff_dt),
                weights, self.module_name, self.sim_dim,
            )

        chunk = min(self.cap_chunk, nc)
        blocks = []
        for start in range(0, nc, chunk):
            end = min(start + chunk, nc)
            blocks.append(
                scorer(
                    img_emb,
                    img_glo,
                    cap_emb[start:end],
                    cap_mask[start:end],
                    cap_glo[start:end],
                )
            )
        return jnp.concatenate(blocks, axis=1)
