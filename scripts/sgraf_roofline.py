"""SGRAF fused-eval kernel roofline probe (round-4 verdict item 5).

Times `sgraf_eval_score` (and the SAF variant / alignment-only kernel for
attribution) directly at f30k-1K bucket shapes on the current chip, sweeping
the caption block size, and reports achieved vs padded-lane speed-of-light.

FLOP model per (caption-block bc, image) grid step, L words padded, Rp=40
regions, D=1024, S=256, SGR steps=3 (2 full + node-0 trimmed), round-5
kernel (q/k folded to M = Wq Wk^T / v = Wk bq; global node + sim_eval_w
epilogue in-kernel; n = L+8 concatenated nodes):

  glo node:  y = diff^2.Wg   2*bc*D*S        (clean)
  alignment: a = cap.img^T   2*bc*L*D*Rp     (lanes Rp->128: 3.2x pad)
             ctx = s.img     2*bc*L*Rp*D     (contraction 40->128 pad)
             y = diff.W      2*bc*L*D*S      (clean)
  SGR full:  sm,g projs      2 * 2*bc*n*S*S  (clean; ref had 3: q,k,g)
             e = sm.S^T      2*bc*n*n*S      (M,N=n->128: lane pad)
             ctx = a.S       2*bc*n*n*S      (same)
             sv bias         VPU
  node-0:    sm row + g proj 2 * 2*bc*S*S; e/ctx rows are VPU
             (the ref k projection over all n nodes is gone)
  epilogue:  2*bc*S VPU

Shapes default to ONE production length bucket (the engine buckets the
5000 f30k-1K captions by padded length, ~1250 captions/bucket — it never
compiles a single 5000-caption kernel, whose 2.6GB output + 2.6GB glo
input also exhausts the relay chip's HBM headroom).  Per-pair rates are
scale-free once the grid is large, so bucket-scale numbers are the
production numbers.

Usage: python scripts/sgraf_roofline.py [--l=16] [--nc=1250] [--blocks=32,64,96]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from itrx.ops.pallas.sgraf_align import sgraf_align, _pick_block_c
from itrx.ops.pallas.sgraf_eval import sgraf_eval_score, sgraf_eval_saf_score

NC, NI, D, S, R, STEPS = 1250, 1000, 1024, 256, 36, 3
PEAK_BF16 = 197e12  # v5e chip


def flops_per_step(bc, l):
    n = l + 8
    glo = 2 * bc * D * S
    aln = 2 * bc * l * D * R + 2 * bc * l * R * D + 2 * bc * l * D * S
    full = 2 * 2 * bc * n * S * S + 2 * 2 * bc * n * n * S
    node0 = 4 * bc * S * S + 6 * bc * n * S
    return glo + aln + (STEPS - 1) * full + node0


def eff_flops_per_step(bc, l):
    """Lane-padded MXU work (what the systolic array actually runs): the
    lane (last) dim of each matmul operand/result pads to 128, the sublane
    dim to 8 (n=l+8 and bc*l are already multiples of 8).  The contraction
    rides lanes on one side, so K pads to 128 too; M (sublane side) does
    not.  Mosaic may choose fatter layouts — the measured sweep anchors
    this lower bound."""
    n = l + 8
    pad = lambda x, m=128: -(-x // m) * m
    glo = 2 * bc * D * S
    aln = (
        2 * bc * l * D * pad(R)            # a = cap.img^T: N pad 40->128
        + 2 * bc * l * pad(R) * D          # ctx = s.img:   K pad 40->128
        + 2 * bc * l * D * S
    )
    full = (
        2 * 2 * bc * n * S * S             # sm/g projections (clean)
        + 2 * bc * n * S * pad(n)          # e = sm.S^T: N pad n->128
        + 2 * bc * n * pad(n) * S          # ctx = a.S: K pad n->128
    )
    node0 = 4 * bc * S * S                 # sm + g rows (e/ctx rows are VPU)
    return glo + aln + (STEPS - 1) * full + node0


def bench(fn, *args, reps=3, scale_arg=0):
    """Times a JITTED call: an eager pallas_call on the axon relay carries a
    ~2.3-2.5s per-call dispatch overhead (measured 2026-08-19) that swamps
    the device time and made earlier eager sweeps unusable."""
    fn = jax.jit(fn)
    fn(*args)  # compile
    np.asarray(fn(*args)[:1, :1])  # drain
    times = []
    for k in range(reps):
        a = list(args)
        a[scale_arg] = a[scale_arg] * (1.0 + (k + 1) / 256.0)
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(out[:1, :1])
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    global NC
    l = 16
    blocks = None
    for a in sys.argv[1:]:
        if a.startswith("--l="):
            l = int(a.split("=")[1])
        if a.startswith("--nc="):
            NC = int(a.split("=")[1])
        if a.startswith("--blocks="):
            blocks = [int(x) for x in a.split("=")[1].split(",")]
    if blocks is None:
        blocks = sorted({_pick_block_c(NC, l), 128, 160, 192})

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    cap = jnp.asarray(rng.standard_normal((NC, l, D)).astype(np.float32), dt)
    mask = jnp.asarray(
        (np.arange(l)[None] < rng.integers(6, l + 1, (NC,))[:, None])
        .astype(np.float32)
    )
    img = jnp.asarray(rng.standard_normal((NI, R, D)).astype(np.float32), dt)
    w = jnp.asarray(0.05 * rng.standard_normal((D, S)).astype(np.float32), dt)
    b = jnp.asarray(0.01 * rng.standard_normal(S).astype(np.float32))
    gloc = jnp.asarray(rng.standard_normal((NC, D)).astype(np.float32), dt)
    imgglo = jnp.asarray(rng.standard_normal((NI, D)).astype(np.float32), dt)
    gw = jnp.asarray(0.05 * rng.standard_normal((D, S)).astype(np.float32), dt)
    gb = jnp.asarray(0.01 * rng.standard_normal(S).astype(np.float32))
    ew = jnp.asarray(0.05 * rng.standard_normal((S, 1)).astype(np.float32))
    eb = jnp.asarray(0.01 * rng.standard_normal(1).astype(np.float32))
    wq, wk, wg = (
        jnp.asarray(0.05 * rng.standard_normal((STEPS, S, S)).astype(np.float32), dt)
        for _ in range(3)
    )
    bq, bk, bg = (
        jnp.asarray(0.01 * rng.standard_normal((STEPS, S)).astype(np.float32))
        for _ in range(3)
    )
    awf = jnp.asarray(0.05 * rng.standard_normal((1, S)).astype(np.float32))
    abf = jnp.asarray(np.zeros((1, S), np.float32))

    pairs = NC * NI
    print(f"shapes: nc={NC} ni={NI} l={l} d={D} s={S} rp=40 steps={STEPS} bf16")
    for bc in blocks:
        n_steps = (-(-NC // bc)) * NI
        fl = flops_per_step(bc, l)
        ef = eff_flops_per_step(bc, l)
        sol = n_steps * ef / PEAK_BF16

        try:
            t = bench(
                # all tensors ride as jit ARGUMENTS: closure-captured arrays
                # become HLO constants and blow the relay's compile-payload
                # limit (HTTP 413) at bucket scale
                lambda c, *a: sgraf_eval_score(c, *a, block_c=bc),
                cap, mask, img, w, b, gloc, imgglo, gw, gb,
                wq, bq, wk, bk, wg, bg, ew, eb,
            )
        except Exception as e:  # noqa: BLE001 - sweep survives bad configs
            print(f"SGR  bc={bc:4d}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]})", flush=True)
            continue
        print(
            f"SGR  bc={bc:4d}: {t:6.3f}s  {pairs / t / 1e6:6.2f}M pairs/s  "
            f"{n_steps * fl / t / 1e12:6.1f} TF/s useful "
            f"({n_steps * ef / t / 1e12:6.1f} TF/s padded, "
            f"SOL(padded)={sol:5.2f}s, {t / n_steps * 1e6:.1f}us/step)",
            flush=True,
        )

    bc = _pick_block_c(NC, l)
    try:
        t = bench(
            lambda c, *a: sgraf_eval_saf_score(c, *a, block_c=bc),
            cap, mask, img, w, b, gloc, imgglo, gw, gb, awf, abf, ew, eb,
        )
        print(f"SAF  bc={bc:4d}: {t:6.3f}s  {pairs / t / 1e6:6.2f}M pairs/s "
              f"(alignment + filtration only)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"SAF  bc={bc:4d}: FAILED ({str(e).splitlines()[0][:100]})",
              flush=True)

    # alignment-only writes the full (Nc, Ni, L, S) tensor — 10GB at bucket
    # scale (why the fused eval kernel exists); time a 64-image tile and
    # scale the rate
    ni_t = 64
    try:
        t = bench(lambda c, m_, i_, w_, b_: sgraf_align(c, m_, i_, w_, b_, bc),
                  cap, mask, img[:ni_t], w, b)
        print(f"ALN  bc={bc:4d}: {t:6.3f}s for {NC}x{ni_t}  "
              f"{NC * ni_t / t / 1e6:6.2f}M pairs/s  (alignment only, "
              f"writes (Nc,{ni_t},L,S) to HBM)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"ALN  bc={bc:4d}: FAILED ({str(e).splitlines()[0][:100]})",
              flush=True)


if __name__ == "__main__":
    main()
