"""SCAN fused-eval kernel roofline + regression probe (round-5 verdict item 1).

BENCH_r04 regressed the flagship bf16 eval 0.253s -> 0.316s (fp32 identical
across rounds), pointing at the fused xattn kernel under the round-4
TpuAotCompiler toolchain.  This script attributes the end-to-end eval time:

  1. ranking-only: `metrics.cal_recall` on a random (1000, 5000) sim matrix
  2. kernel-only: `xattn_t2i_fused` (and i2t) jitted at the production
     length-bucket shapes (nc=1250 per bucket, l in {8,16,24}), sweeping
     (block_i, block_c), with useful/padded FLOP speed-of-light
  3. end-to-end: `eval_bench.bench_method('SCAN')` = the exact timed body of
     bench.py minus the encode phase

FLOP model per (block_i BI, block_c BC) grid step, Rp=40, D=1024, L words:
  a    = img @ capT        2*BI*Rp*D*BC*L     (clean: all dims >= 128-ish)
  gs   = sq @ group        2*BI*Rp*BC*L*BC    (N pads BC->128)
  den  = gs @ groupT       2*BI*Rp*BC*BC*L    (K pads BC->128)
  y    = gram @ attn       2*(BI*Rp)^2*BC*L   (K pads BI*Rp->mult of 128)
  agg  = e2 @ group        2*BI*BC*L*BC       (tiny)

Timing discipline (CLAUDE.md): jitted calls only (eager relay dispatch costs
~2.3-2.5s/call), tensors as jit arguments, host transfer as the barrier,
bf16-representable perturbations between reps.

Usage: python scripts/xattn_roofline.py [--quick] [--skip-e2e]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from itrx.eval import metrics
from itrx.ops.pallas.xattn import _xattn_t2i_fused_impl, _xattn_i2t_fused_impl

NI, D, R, RP = 1000, 1024, 36, 40
PEAK_BF16 = 197e12  # v5e chip


def flops_per_step(bi, bc, l, padded=False):
    pad = (lambda x, m=128: -(-x // m) * m) if padded else (lambda x, m=128: x)
    birp = bi * RP
    bcl = bc * l
    a = 2 * birp * D * bcl
    gs = 2 * birp * bcl * pad(bc)
    den = 2 * birp * pad(bc) * bcl
    y = 2 * birp * pad(birp) * bcl
    agg = 2 * bi * bcl * pad(bc)
    return a + gs + den + y + agg


def bench(fn, *args, reps=3, scale_arg=0):
    def barrier(out):
        np.asarray(out.ravel()[:1])

    fn(*args)  # compile
    barrier(fn(*args))  # drain
    times = []
    for k in range(reps):
        a = list(args)
        a[scale_arg] = a[scale_arg] * (1.0 + (k + 1) / 256.0)
        t0 = time.perf_counter()
        barrier(fn(*a))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    quick = "--quick" in sys.argv
    skip_e2e = "--skip-e2e" in sys.argv

    rng = np.random.default_rng(0)

    # --- 1. ranking stage (cal_recall) on a random f30k-1K sim matrix ---
    sims = jnp.asarray(rng.standard_normal((NI, 5 * NI)).astype(np.float32))

    def rank_fn(s):
        return metrics._rank_metrics_packed(s, 5)

    t_rank = bench(rank_fn, sims)
    print(f"RANK cal_recall(1000x5000): {t_rank * 1e3:7.1f} ms", flush=True)

    # --- 2. kernel sweep at production bucket shapes ---
    img = jnp.asarray(
        rng.standard_normal((NI, R, D)).astype(np.float32), jnp.bfloat16
    )
    configs = [(8, 32), (8, 64), (16, 32)] if quick else [
        (8, 16), (8, 32), (8, 64), (8, 128), (16, 16), (16, 32), (16, 64),
    ]
    kernel_total_default = 0.0
    for l, nc in ((8, 1250), (16, 1875), (24, 1875)):
        cap = jnp.asarray(
            rng.standard_normal((nc, l, D)).astype(np.float32), jnp.bfloat16
        )
        lens = rng.integers(max(2, l - 7), l + 1, (nc,))
        mask = jnp.asarray(
            (np.arange(l)[None] < lens[:, None]).astype(np.float32)
        )
        for bi, bc in configs:
            n_steps = (-(-NI // bi)) * (-(-nc // bc))
            fl = flops_per_step(bi, bc, l)
            ef = flops_per_step(bi, bc, l, padded=True)
            sol = n_steps * ef / PEAK_BF16
            try:
                t = bench(
                    lambda i_, c_, m_, bi=bi, bc=bc: _xattn_t2i_fused_impl(
                        i_, c_, m_, block_i=bi, block_c=bc
                    ),
                    img, cap, mask,
                )
            except Exception as e:  # noqa: BLE001 - sweep survives bad configs
                print(f"T2I l={l:2d} bi={bi:2d} bc={bc:3d}: FAILED "
                      f"({type(e).__name__}: {str(e).splitlines()[0][:90]})",
                      flush=True)
                continue
            if (bi, bc) == (8, 32):
                kernel_total_default += t
            print(
                f"T2I l={l:2d} nc={nc} bi={bi:2d} bc={bc:3d}: {t * 1e3:7.1f} ms "
                f"{NI * nc / t / 1e6:7.2f}M pairs/s  "
                f"{n_steps * fl / t / 1e12:6.1f} TF/s useful "
                f"({n_steps * ef / t / 1e12:6.1f} TF/s padded, "
                f"SOL={sol * 1e3:6.1f} ms, {t / n_steps * 1e6:5.1f}us/step)",
                flush=True,
            )

    print(f"T2I kernel total at default blocks (8,32) over 3 buckets: "
          f"{kernel_total_default * 1e3:.1f} ms", flush=True)

    # i2t direction, default blocks only (secondary published variant)
    if not quick:
        l, nc = 16, 1875
        cap = jnp.asarray(
            rng.standard_normal((nc, l, D)).astype(np.float32), jnp.bfloat16
        )
        mask = jnp.asarray(
            (np.arange(l)[None] < rng.integers(9, l + 1, (nc,))[:, None])
            .astype(np.float32)
        )
        try:
            t = bench(
                lambda i_, c_, m_: _xattn_i2t_fused_impl(i_, c_, m_),
                img, cap, mask,
            )
            print(f"I2T l={l:2d} nc={nc} default blocks: {t * 1e3:7.1f} ms "
                  f"{NI * nc / t / 1e6:7.2f}M pairs/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"I2T FAILED ({str(e).splitlines()[0][:90]})", flush=True)

    # --- 3. end-to-end production eval body (bench.py minus encode) ---
    if not skip_e2e:
        from eval_bench import bench_method

        t, _ = bench_method("SCAN", n_images=NI, verbose=False)
        print(f"E2E  SCAN eval (cal_sims + cal_recall, bf16): {t:6.3f} s "
              f"({NI * 5 * NI / t / 1e6:6.2f}M pairs/s)", flush=True)


if __name__ == "__main__":
    main()
