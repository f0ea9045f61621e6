#!/usr/bin/env python
"""Benchmark: Flickr30k-1K-scale evaluation throughput on the current chip.

Headline metric (BASELINE.json): eval pairs/sec/chip on the f30k 1K-test
similarity matrix (1000 images x 5000 captions).  The workload is the
north-star SCAN t2i stacked cross-attention (36 regions x words x 1024-d, the
reference's per-caption Python-looped bmm hot path, Objectives.py:329-372)
run through the production eval engine (length-bucketed device-resident
tiles) plus the on-device R@K ranking — i.e. the full `validate_step` compute
after encoding.  Caption lengths follow the realistic f30k distribution
(mean ~14 words, padded to 48).

Baseline normalization: BASELINE.json targets "<10s per method on a v5e-8"
=> 5e6 pairs / 10 s / 8 chips = 62,500 pairs/sec/chip.  vs_baseline is the
ratio achieved/62,500 (>1 beats the target).

Prints ONE JSON line.

NOTE: under this environment's axon relay, block_until_ready does not
synchronize; host transfers of the final ranks are the timing barrier, and
inputs are perturbed between runs so no layer can serve a cached result.
"""

import json
import time

import numpy as np


class _ScanSim:
    """similarity-only shim for engine.cal_sims, mirroring SCAN.similarity's
    production routing: fused Pallas kernel for bf16 tiles, XLA for fp32."""

    def fused_eval_active(self, compute_dtype):
        import jax.numpy as jnp

        from itrx.ops.pallas import pallas_ok

        return (
            compute_dtype is not None
            and jnp.dtype(compute_dtype) == jnp.bfloat16
            and pallas_ok()
        )

    def apply(self, variables, img, cap, mask, train=False, method="similarity"):
        import jax.numpy as jnp

        if img.dtype == jnp.bfloat16:
            from itrx.ops.pallas.xattn import xattn_t2i_fused

            return xattn_t2i_fused(img, cap, mask)
        from itrx.ops import attention

        return attention.xattn_score_t2i(img, cap, mask)


def main():
    import jax
    import jax.numpy as jnp

    from itrx.eval import engine, metrics

    NI, NC, R, L, D = 1000, 5000, 36, 48, 1024
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((NI, R, D)).astype(np.float32))
    lengths = np.clip(rng.normal(14, 6, NC).astype(int), 4, L)
    mask = jnp.asarray(
        (np.arange(L)[None] < lengths[:, None]).astype(np.float32)
    )
    cap = (
        jnp.asarray(rng.standard_normal((NC, L, D)).astype(np.float32))
        * mask[:, :, None]
    )
    model = _ScanSim()

    def full_eval(img_in, dtype=None):
        sims = engine.cal_sims(
            model, {}, img_in, cap, mask,
            img_tile=250, cap_tile=1000, verbose=False, length_buckets=4,
            compute_dtype=dtype,
        )
        ri = metrics.i2t_ranks(sims)
        rt = metrics.t2i_ranks(sims)
        return np.asarray(ri), np.asarray(rt)

    def timed(dtype):
        full_eval(img, dtype)  # warmup/compile
        times = []
        for k in range(3):
            img_k = img * (1.0 + 1e-6 * (k + 1))
            t0 = time.perf_counter()
            full_eval(img_k, dtype)
            times.append(time.perf_counter() - t0)
        return min(times)

    # production path: bf16 embeddings, fp32 accumulation (eval_bf16 flag;
    # recall parity asserted in tests/test_bf16_eval.py)
    t = timed("bfloat16")
    t_fp32 = timed(None)

    pairs_per_sec = NI * NC / t
    baseline = 62500.0
    print(
        json.dumps(
            {
                "metric": "scan_t2i_eval_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s/chip",
                "vs_baseline": round(pairs_per_sec / baseline, 3),
                "detail": {
                    "workload": "f30k-1K SCAN t2i xattn sim matrix + R@K ranking (length-bucketed engine, bf16 embeddings / fp32 accum)",
                    "eval_seconds": round(t, 3),
                    "eval_seconds_fp32": round(t_fp32, 3),
                    "shape": [NI, NC, R, L, D],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
