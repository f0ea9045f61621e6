"""coco-testall-scale eval smoke on the real chip (round-2 verdict item 9).

Synthesizes SCAN-shaped embeddings at the full 5000-image x 25,000-caption
scale (the 5-fold coco testall protocol, ref evaluation.py:293-331), stages
the 4.9GB caption stack on host exactly like `encode_data`'s offload path
would, and runs the production fold5 scoring loop (cal_sims host-staged
branch + cal_recall per 1000x5000 fold) end to end — the branches no small
test or f30k-scale bench exercises.

Usage: python scripts/eval_scale_smoke.py [--bf16]
Prints one JSON line with per-fold and total timings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from itrx.eval import engine, metrics
    from itrx.models import get_model

    bf16 = "--bf16" in sys.argv
    NI, NC, R, L, D = 25000, 125000, 36, 48, 1024  # ids pre-dedup: 25k imgs
    n_img, n_cap = 5000, 25000  # after [::5] dedup

    rng = np.random.default_rng(0)
    cfg = dict(
        name="SCAN", vocab_size=100, embed_size=D, word_dim=300,
        bi_gru=True, no_imgnorm=False, no_txtnorm=True,
        precomp_enc_type="basic", margin=0.2, max_violation=True,
        cross_attn="t2i", raw_feature_norm="clipped_l2norm",
        agg_func="LogSumExp", lambda_lse=6.0, lambda_softmax=9.0,
    )
    model = get_model(cfg)

    # host-staged embeddings, the coco-testall offload layout
    img_embs = rng.standard_normal((n_img, R, D)).astype(np.float32)
    img_embs /= np.linalg.norm(img_embs, axis=-1, keepdims=True)
    lengths = np.clip(rng.normal(14, 6, n_cap).astype(int), 4, L)
    cap_mask = (np.arange(L)[None] < lengths[:, None]).astype(np.float32)
    cap_embs = rng.standard_normal((n_cap, L, D)).astype(np.float32)
    cap_embs *= cap_mask[:, :, None]
    print(
        f"embeddings: img {img_embs.nbytes / 1e9:.2f} GB host, "
        f"cap {cap_embs.nbytes / 1e9:.2f} GB host",
        flush=True,
    )

    cdt = "bfloat16" if bf16 else None
    fold_times, rsums = [], []
    t_all = time.perf_counter()
    for i in range(5):
        t0 = time.perf_counter()
        sl = slice(i * 5000, (i + 1) * 5000)
        imgs_block = jnp.asarray(img_embs[i * 1000:(i + 1) * 1000])
        sims = engine.cal_sims(
            model, {}, imgs_block, cap_embs[sl], cap_mask[sl],
            verbose=False, compute_dtype=cdt,
        )
        r = metrics.cal_recall(sims, verbose=False)
        rsums.append(float(r["rsum"]))
        fold_times.append(time.perf_counter() - t0)
        print(f"fold {i + 1}: {fold_times[-1]:.2f}s rsum={rsums[-1]:.1f}",
              flush=True)
    total = time.perf_counter() - t_all
    print(json.dumps({
        "metric": "coco_testall_fold5_eval_seconds",
        "value": round(total, 2),
        "unit": "s (5 folds of 1000x5000, host-staged caps)",
        "detail": {
            "bf16": bf16,
            "fold_seconds": [round(t, 2) for t in fold_times],
            "pairs_per_sec": round(5 * 1000 * 5000 / total, 1),
        },
    }))


if __name__ == "__main__":
    main()
