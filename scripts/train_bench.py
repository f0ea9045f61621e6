"""Train-step timing at reference shapes on the current chip.

Usage: python scripts/train_bench.py METHOD [k=v ...]

Extra k=v args override the method config (train_bf16=True etc.).
`method_config(METHOD)` is importable (scripts/profile_step.py reuses the
shapes).  Timing barrier is a host transfer (axon relay: block_until_ready
does not synchronize); README.md holds the expected numbers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from itrx.models import get_model
from itrx.train.state import create_train_state
from itrx.train.loop import make_train_step

rng = np.random.default_rng(0)


def mk_batch(B=128, R=36, D=2048, L=48, V=11353):
    return {
        "images": jnp.asarray(rng.standard_normal((B, R, D)).astype(np.float32)),
        "cap_ids": jnp.asarray(rng.integers(0, V, (B, L)).astype(np.int32)),
        "cap_mask": jnp.asarray(
            (np.arange(L)[None] < rng.integers(6, L, (B,))[:, None]).astype(np.float32)
        ),
    }


def method_config(which):
    """Reference-shape (cfg, batch) for a method (f30k dims, batch 128;
    SAEM's reference batch 64; SAEM/CAMERA bert-base towers)."""
    if which == "VSE_PP":
        return dict(name="VSE_PP", vocab_size=11353, embed_size=1024, word_dim=300, measure="cosine", use_abs=False, no_imgnorm=False, margin=0.2, max_violation=True, data_name="f30k_precomp"), dict(mk_batch(), images=jnp.asarray(rng.standard_normal((128, 4096)).astype(np.float32)))
    if which == "VSE_PP_CNN":
        # raw-pixel variant (ref ImgEncoder.py:15-108): VGG19 tower through
        # fc7, frozen (finetune=False, the reference default), batch 128 of
        # synthetic 224^2 RGB — the one method variant without a chip row
        b = mk_batch()
        b["images"] = jnp.asarray(
            rng.standard_normal((128, 224, 224, 3)).astype(np.float32)
        )
        return dict(name="VSE_PP", vocab_size=11353, embed_size=1024,
                    word_dim=300, measure="cosine", use_abs=False,
                    no_imgnorm=False, margin=0.2, max_violation=True,
                    data_name="f30k", img_encoder="vgg19",
                    finetune=False), b
    if which == "SCAN":
        return dict(name="SCAN", vocab_size=11353, embed_size=1024, word_dim=300, bi_gru=True, no_imgnorm=False, no_txtnorm=True, precomp_enc_type="basic", margin=0.2, max_violation=True, cross_attn="t2i", raw_feature_norm="clipped_l2norm", agg_func="LogSumExp", lambda_lse=6.0, lambda_softmax=9.0), mk_batch()
    if which == "SGRAF":
        return dict(name="SGRAF", vocab_size=11353, embed_size=1024, word_dim=300, sim_dim=256, bi_gru=True, no_imgnorm=False, no_txtnorm=False, module_name="SGR", sgr_step=3, margin=0.2, max_violation=True, cap_chunk=32), mk_batch()
    if which == "SAEM":
        # reference shapes: batch 64, 32 wordpieces, random-init bert-base
        b = mk_batch(B=64, L=32, V=30522)
        b["type_ids"] = jnp.zeros((64, 32), jnp.int32)
        return dict(name="SAEM", vocab_size=30522, embed_size=1024, final_dims=256,
                    txt_stru="cnn", img_stru="trans", bi_gru=False, margin=0.2,
                    max_violation=True, measure="cosine",
                    trans_cfg="itrx/configs/trans_cfg.json"), b
    if which == "CAMERA":
        b = mk_batch(B=128, L=32, V=30522)
        b["type_ids"] = jnp.zeros((128, 32), jnp.int32)
        wh = rng.integers(300, 640, (128, 2)).astype(np.float32)
        xy = rng.uniform(0, 0.5, (128, 36, 2)).astype(np.float32)
        boxes = np.concatenate(
            [xy, xy + rng.uniform(0.1, 0.5, (128, 36, 2)).astype(np.float32)], 2
        )
        b["boxes"] = jnp.asarray(boxes * np.concatenate([wh, wh], 1)[:, None, :])
        b["imgs_wh"] = jnp.asarray(wh)
        return dict(name="CAMERA", vocab_size=30522, embed_size=2048, head=64,
                    smry_k=12, smry_lamda=0.01, drop=0.0, margin=0.2,
                    max_violation=True), b
    if which == "VSRN":
        b = mk_batch(L=61)
        b["label_ids"] = jnp.asarray(rng.integers(0, 11353, (128, 61)).astype(np.int32))
        b["label_mask"] = jnp.asarray(np.ones((128, 61), np.float32))
        b["cap_mask"] = jnp.ones((128, 61), jnp.float32)
        return dict(name="VSRN", vocab_size=11353, embed_size=2048, word_dim=300, data_name="f30k_precomp", measure="cosine", use_abs=False, no_imgnorm=False, no_txtnorm=False, margin=0.2, max_violation=False, max_len=60, dim_hidden=512, dim_vid=2048, dim_word=300, input_dropout_p=0.2), b
    raise SystemExit(f"unknown method {which!r}")


def _parse(v):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return {"True": True, "False": False}.get(v, v)


def bench(name, cfg, batch):
    t_start = time.perf_counter()
    model = get_model(cfg)
    # defaults only — CLI k=v overrides (applied upstream) must win
    for k, v in dict(learning_rate=2e-4, lr_update=15, grad_clip=2.0, seed=0).items():
        cfg.setdefault(k, v)
    state, tx = create_train_state(model, cfg, batch, 100)
    step = make_train_step(
        model, tx,
        compute_dtype="bfloat16" if cfg.get("train_bf16") else None,
    )
    r = jax.random.PRNGKey(0)
    state, aux = step(state, batch, r, 0)
    l = float(aux["Loss"])
    compile_t = time.perf_counter() - t_start
    t0 = time.perf_counter()
    n = 10
    for i in range(n):
        state, aux = step(state, batch, r, 0)
    _ = float(aux["Loss"])
    dt = (time.perf_counter() - t0) / n
    bsz = next(iter(batch.values())).shape[0]
    print(f"{name:10s}: {dt*1000:7.1f} ms/step -> {bsz/dt:7.0f} cap/s (compile {compile_t:.0f}s, loss {l:.1f})", flush=True)


def main():
    which = sys.argv[1]
    overrides = {k: _parse(v) for k, v in (a.split("=", 1) for a in sys.argv[2:])}
    cfg, batch = method_config(which)
    cfg.update(overrides)
    tag = " ".join(f"{k}={v}" for k, v in overrides.items())
    bench(f"{which} {tag}".strip(), cfg, batch)


if __name__ == "__main__":
    main()
