"""Chip timing for the PRODUCTION encode path (engine.encode_data).

Closes the round-3 verdict items 3/4 measurement requirement: the ledger
must quote chip-measured encode speedups for (a) `encode_bf16` (bf16 embed
forward + host-side bf16 batch cast, halving the dominant relay transfer)
and (b) the double-buffered producer overlap — measured through
`encode_data` itself (host batch assembly + upload + embed over a real
dataset object), not `eval_bench`'s pre-assembled batch loop.

Ref counterpart: encode_data (metricmodule/evaluation.py:75-121), which
is strictly sequential fp32.

Modes per method (f30k-1K test split, 1000 images / 5000 captions,
36x2048 region features, reference widths):
  seq_fp32      strict-sequential mirror of encode_data (no producer
                thread, fp32 forward) — the reference's structure
  ovl_fp32      production encode_data, fp32 forward
  ovl_bf16      production encode_data, encode_bf16 (bf16 forward +
                host-cast batches)

Usage: python scripts/encode_bench.py [METHOD ...] [--reps=K]
Methods: SCAN VSRN SGRAF (GRU family; dataset-driven).  SAEM/CAMERA's
bert-tower encode_bf16 forward speedup is measured by
`eval_bench.py --encode_bf16` (pre-assembled batches; their dataset path
needs a wordpiece vocab file not shipped at bert-base scale).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from itrx import configs
from itrx.data import precomp, synthetic
from itrx.eval import engine
from itrx.models import get_model

METHODS = ["SCAN", "VSRN", "SGRAF"]


def build(which, root):
    d = synthetic.generate(
        os.path.join(root, f"enc_{which}"),
        n_images=4000,           # test split = n_images // 4 = 1000 images
        img_dim=2048,
        n_regions=36,
        splits=("test",),
        n_concepts_range=(2, 10),  # f30k-like caption-length spread
    )
    # vocab is built from train_caps.txt; reuse the test captions (same
    # concept-word vocabulary) so only the 295MB test features are written
    import shutil

    shutil.copyfile(
        os.path.join(d, "test_caps.txt"), os.path.join(d, "train_caps.txt")
    )
    cfg = dict(configs.base_config(), **getattr(configs, which)())
    cfg.update(
        data_path=os.path.dirname(d),
        data_name=os.path.basename(d),
        vocab_path=os.path.join(d, "vocab"),
        img_dim=2048,
    )
    ds = precomp.PrecompDataset(d, "test", cfg)
    cfg["vocab_size"] = ds.vocab_size
    model = get_model(cfg)
    batch = next(iter(ds.eval_batches(cfg["batch_size"])))
    batch.pop("n_valid")
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {k: jnp.asarray(x) for k, x in batch.items()},
        train=True,
    )
    return cfg, ds, model, v


def seq_encode(model, v, ds, batch_size):
    """Strict-sequential mirror of encode_data's fp32 path: assemble the
    next batch only after dispatching the previous embed (the reference's
    loop structure, evaluation.py:99-121)."""
    embed_fn = engine._embed_fn_for(model, None, None)
    outs = []
    for batch in ds.eval_batches(batch_size):
        nv = batch.pop("n_valid")
        placed = {k: jnp.asarray(x) for k, x in batch.items()}
        outs.append((embed_fn(v, placed), nv))
    keys = outs[0][0].keys()
    return {
        k: jnp.concatenate([e[k][: int(n)] for e, n in outs], axis=0)
        for k in keys
    }


def drain(d):
    # host transfer = the only reliable barrier under the axon relay
    for x in d.values():
        if x is not None:
            np.asarray(x[-1])


def bench(which, reps, root):
    cfg, ds, model, v = build(which, root)
    bs = cfg["batch_size"]
    modes = {
        "seq_fp32": lambda: seq_encode(model, v, ds, bs),
        "ovl_fp32": lambda: engine.encode_data(model, v, ds, bs),
        "ovl_bf16": lambda: engine.encode_data(
            model, v, ds, bs, encode_dtype="bfloat16"
        ),
    }
    # in-memory mutable copy so reps see perturbed inputs (the relay can
    # serve cached results for bit-identical calls; 1/256 is bf16-exact)
    ds.images = np.array(ds.images)
    out = {}
    for name, fn in modes.items():
        drain(fn())  # compile + drain pending uploads
        times = []
        for _ in range(reps):
            ds.images *= np.float32(1.0 + 1.0 / 256.0)
            t0 = time.perf_counter()
            drain(fn())
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times), 3)
        print(f"{which:6s} {name}: {out[name]:7.3f}s  (all reps: "
              f"{[round(t, 3) for t in times]})", flush=True)
    out["bf16_speedup"] = round(out["seq_fp32"] / out["ovl_bf16"], 2)
    out["overlap_speedup"] = round(out["seq_fp32"] / out["ovl_fp32"], 2)
    return out


def main():
    names = [a for a in sys.argv[1:] if a in METHODS] or METHODS
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
    results = {}
    with tempfile.TemporaryDirectory() as root:
        for which in names:
            results[which] = bench(which, reps, root)
    print(json.dumps({"encode_bench": results,
                      "n_images": 1000, "img_dim": 2048}))


if __name__ == "__main__":
    main()
