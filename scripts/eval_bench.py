"""f30k-1K evaluation timing for all six methods on the current chip.

This is the BASELINE.json north-star clock (SURVEY.md §6): "full Flickr30k
1K-test eval (sim matrix + R@K, all 6 methods) < 10 s/method on a v5e-8"
— bench.py publishes the SCAN number; this script times every method
through the same production scoring body (`engine.cal_sims` +
`metrics.cal_recall`, the exact code `evaluate_split` runs), with
randomly-initialized weights at reference widths (timing is
weight-agnostic; recall values are meaningless and not reported).

Usage:
    python scripts/eval_bench.py [METHOD ...] [k=v ...] [--fp32] [--n_images=N]

No METHOD runs all six.  k=v overrides go into the method config
(eval tile/budget knobs included).  Default mode is the production
`eval_bf16` path; --fp32 times fp32 embeddings instead.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from itrx.eval import engine, metrics
from itrx.models import get_model
from train_bench import method_config, _parse

METHODS = ["VSE_PP", "SCAN", "VSRN", "SAEM", "SGRAF", "CAMERA"]


def _cast_stack(d, dtype):
    if dtype is None:
        return d
    dt = jnp.dtype(dtype)
    return {
        k: v.astype(dt) if "mask" not in k and v.dtype == jnp.float32 else v
        for k, v in d.items()
    }


def bench_method(which, n_images=1000, im_div=5, dtype="bfloat16",
                 overrides=None, reps=3, verbose=True, encode_dtype=None):
    """Embed n_images*im_div synthetic caption/image rows at reference
    shapes, then time sims + R@K through the production engine body.
    Returns (eval_seconds, encode_seconds_warm).

    encode_dtype='bfloat16' times the encode_bf16 production path (the
    embed forward itself in bf16) instead of an fp32 forward + stack cast."""
    cfg, batch0 = method_config(which)
    cfg.update(overrides or {})
    model = get_model(cfg)
    # init with train=True (as create_train_state does): some methods'
    # __call__ needs train-only batch keys / outputs (VSRN caption head)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {k: jnp.asarray(v) for k, v in batch0.items()},
        train=True,
    )
    edt = jnp.dtype(encode_dtype).name if encode_dtype is not None else None
    embed_fn = engine._embed_fn_for(model, None, edt)

    n_caps = n_images * im_div
    batches = [batch0]
    bsz = next(iter(batch0.values())).shape[0]
    while bsz * len(batches) < n_caps:
        batches.append(method_config(which)[1])

    def encode_all():
        outs = [
            embed_fn(variables, {k: jnp.asarray(v) for k, v in b.items()})
            for b in batches
        ]
        stack = {
            k: jnp.concatenate([o[k] for o in outs], axis=0)[:n_caps]
            for k in outs[0]
        }
        # bf16 embed forward already returns bf16 stacks
        return stack if edt is not None else _cast_stack(stack, dtype)

    def _drain(d):
        # host transfer of every output = the only reliable barrier under
        # the axon relay (block_until_ready does not synchronize there);
        # without draining the compile call too, its compile + batch
        # uploads bleed into the timed call (first-method encode(warm)
        # used to read 40-50s of pure queue drain)
        for v in d.values():
            if v is not None:
                np.asarray(v[-1])

    _drain(encode_all())  # compile + drain pending uploads
    t0 = time.perf_counter()
    enc = encode_all()
    _drain(enc)
    t_enc = time.perf_counter() - t0

    imgs = enc["img"][::im_div]
    cap_embs, cap_mask = enc["cap"], enc.get("cap_mask")

    def full_eval(img_in):
        sims = engine.cal_sims(
            model, variables, img_in, cap_embs, cap_mask,
            img_tile=cfg.get("eval_img_tile", 256),
            cap_tile=cfg.get("eval_cap_tile", 1024),
            verbose=False,
            compute_dtype=dtype,
            budgets=engine._eval_budgets(cfg),
        )
        return metrics.cal_recall(sims, cap_ratio=im_div, verbose=False)

    full_eval(imgs)  # compile + warm
    times = []
    for k in range(reps):
        # factor must be representable in bf16 (spacing at 1.0 is 2^-8);
        # 1+1e-6 rounds back to exactly 1.0 and defeats the perturbation
        img_k = imgs * (1.0 + (k + 1) / 256.0)
        t0 = time.perf_counter()
        full_eval(img_k)
        times.append(time.perf_counter() - t0)
    t = min(times)
    if verbose:
        pairs = imgs.shape[0] * cap_embs.shape[0]
        print(
            f"{which:8s}: eval {t:7.3f}s ({pairs / t / 1e6:8.2f}M pairs/s)"
            f"  encode(warm) {t_enc:6.2f}s  "
            f"[{imgs.shape[0]}x{cap_embs.shape[0]}, {dtype or 'float32'}"
            f"{', encode_bf16' if edt else ''}]",
            flush=True,
        )
    return t, t_enc


def main():
    names = [a for a in sys.argv[1:] if a in METHODS]
    overrides = {
        k: _parse(v)
        for k, v in (a.split("=", 1) for a in sys.argv[1:] if "=" in a and not a.startswith("--"))
    }
    n_images = 1000
    dtype = "bfloat16"
    encode_dtype = None
    for a in sys.argv[1:]:
        if a.startswith("--n_images="):
            n_images = int(a.split("=")[1])
        if a == "--fp32":
            dtype = None
        if a == "--encode_bf16":
            encode_dtype = "bfloat16"
    results = {}
    for which in names or METHODS:
        t, t_enc = bench_method(
            which, n_images=n_images, dtype=dtype, overrides=dict(overrides),
            encode_dtype=encode_dtype,
        )
        results[which] = {"eval_s": round(t, 3), "encode_warm_s": round(t_enc, 2)}
    print(json.dumps({"eval_bench": results, "n_images": n_images,
                      "dtype": dtype or "float32",
                      "encode_dtype": encode_dtype or "float32"}))


if __name__ == "__main__":
    main()
