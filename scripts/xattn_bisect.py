"""Stage bisection of the fused SCAN t2i eval kernel (round-5 verdict item 1).

The roofline probe (xattn_roofline.py) shows the kernel at ~83-95 TF/s
padded = 2.2-2.4x off the padded-FLOP speed-of-light, nearly independent of
block size.  This script times truncated kernel variants (each stage added
back one at a time) plus candidate optimizations, jitted at one production
bucket shape, to locate the missing time.

Stages (cumulative):
  1  a = img @ capT (the big MXU dot) + cheap reduce to out
  2  + leaky-relu/mask/square + group matmuls (gs, denom) + attn divide
  3  + region softmax (masked, with max-subtraction)
  4  + num = sum_r(attn_s * a)
  5  + y = gram @ attn_s (2nd MXU dot) + ctx = sum_r(attn_s * y)
  6  full kernel (row_sim + LogSumExp aggregation)

Variants at stage 6:
  nomax    softmax without max-subtraction (|attn*lambda| <= 9, exp bounded)
  gmm      region reductions (softmax denom, num, ctx) via a left 0/1
           group-matmul on the MXU instead of reshape+VPU strided reduces
  fixcap   caption blocks pinned to index 0 (WRONG output) — removes the
           per-step capt/capn/mask DMA to test whether the kernel is
           input-streaming-bound
  par      dimension_semantics=("parallel", "parallel") compiler params
           (explicit pipelining hints for the new Mosaic scheduler)
  bf16g    gram blocks shipped bf16 (halves the i-block DMA + drops the
           in-kernel cast)

Usage: python scripts/xattn_bisect.py [--l=24] [--nc=1875] [--bc=32]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8
NEG_INF = -1e18
NI, D, R = 1000, 1024, 36


def _kernel(
    img_ref, gram_ref, capt_ref, capn_ref, mask_ref, group_ref, rowmask_ref,
    rgroup_ref,   # (BI, BI*Rp) left 0/1 region-group matrix (gmm variant)
    out_ref,
    *, block_i, rp, lambda_lse, lambda_softmax, stage, nomax, gmm,
):
    capt = capt_ref[:]
    capn = capn_ref[:]
    mask = mask_ref[:]
    group = group_ref[:]
    rowm = rowmask_ref[:]
    bcl = capt.shape[1]
    bc = group.shape[1]

    a = jax.lax.dot(
        img_ref[:], capt, preferred_element_type=jnp.float32,
    )
    if stage == 1:
        out_ref[0] = jnp.sum(a.reshape(block_i, rp, bcl), axis=1)[:, :bc]
        return
    h = jnp.where(a > 0, a, 0.1 * a) * mask
    sq = h * h
    gs = jnp.dot(sq, group, preferred_element_type=jnp.float32)
    denom = jnp.dot(gs, group.T, preferred_element_type=jnp.float32)
    attn = h / (jnp.sqrt(jnp.maximum(denom, 1e-16)) + EPS)
    if stage == 2:
        out_ref[0] = jnp.sum(attn.reshape(block_i, rp, bcl), axis=1)[:, :bc]
        return

    z = attn * lambda_softmax
    z = jnp.where(rowm > 0, z, NEG_INF)
    if gmm:
        e2d = jnp.exp(z)  # rows with z=NEG_INF underflow to exactly 0
        ssum = jax.lax.dot(
            rgroup_ref[:], e2d, preferred_element_type=jnp.float32
        )  # (BI, BCL)
        inv = 1.0 / ssum
        attn_s = e2d * jnp.dot(
            rgroup_ref[:].T, inv, preferred_element_type=jnp.float32
        )
    else:
        z3 = z.reshape(block_i, rp, bcl)
        if not nomax:
            z3 = z3 - jnp.max(z3, axis=1, keepdims=True)
        e = jnp.exp(z3)
        attn_s3 = e / jnp.sum(e, axis=1, keepdims=True)
        attn_s = attn_s3.reshape(block_i * rp, bcl)
    if stage == 3:
        out_ref[0] = jnp.sum(attn_s.reshape(block_i, rp, bcl), axis=1)[:, :bc]
        return

    if gmm:
        num = jax.lax.dot(
            rgroup_ref[:], attn_s * a, preferred_element_type=jnp.float32
        )
    else:
        num = jnp.sum((attn_s * a).reshape(block_i, rp, bcl), axis=1)
    if stage == 4:
        out_ref[0] = num[:, :bc]
        return

    g0 = gram_ref[0]
    y = jax.lax.dot(
        g0 if g0.dtype == jnp.bfloat16 else g0.astype(jnp.bfloat16),
        attn_s.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if gmm:
        ctx = jax.lax.dot(
            rgroup_ref[:], attn_s * y, preferred_element_type=jnp.float32
        )
    else:
        ctx = jnp.sum((attn_s * y).reshape(block_i, rp, bcl), axis=1)
    if stage == 5:
        out_ref[0] = (num + ctx)[:, :bc]
        return

    row_sim = num / jnp.maximum(jnp.sqrt(jnp.maximum(ctx, 1e-16)) * capn, EPS)
    e2 = jnp.exp(row_sim * lambda_lse) * mask
    out = jnp.log(
        jnp.dot(e2, group, preferred_element_type=jnp.float32)
    ) / lambda_lse
    out_ref[0] = out


@functools.partial(
    jax.jit,
    static_argnames=("block_i", "block_c", "stage", "nomax", "gmm",
                     "fixcap", "par", "bf16g"),
)
def run(images, captions, cap_mask, *, block_i=8, block_c=32, stage=6,
        nomax=False, gmm=False, fixcap=False, par=False, bf16g=False):
    lambda_lse, lambda_softmax = 6.0, 9.0
    ni, r, d = images.shape
    nc, l, _ = captions.shape
    rp = ((r + 7) // 8) * 8
    ni_pad = -(-ni // block_i) * block_i
    nc_pad = -(-nc // block_c) * block_c
    images = jnp.pad(images, ((0, ni_pad - ni), (0, rp - r), (0, 0)))
    if nc_pad != nc:
        captions = jnp.pad(captions, ((0, nc_pad - nc), (0, 0), (0, 0)))
        cap_mask = jnp.pad(cap_mask, ((0, nc_pad - nc), (0, 0)))
        cap_mask = cap_mask.at[nc:, 0].set(1.0)

    mask_f = cap_mask.astype(jnp.float32)
    capz = captions * mask_f[..., None].astype(captions.dtype)
    cap_t = capz.reshape(nc_pad * l, d).T
    cap_norm = jnp.sqrt(
        jnp.sum(jnp.square(capz.astype(jnp.float32)), axis=-1)
    ).reshape(1, nc_pad * l)
    mask_row = mask_f.reshape(1, nc_pad * l)

    gram = jnp.einsum(
        "ird,isd->irs", images, images, preferred_element_type=jnp.float32
    )
    n_ib = ni_pad // block_i
    eye_bi = jnp.eye(block_i, dtype=jnp.float32)
    gram_bd = jnp.einsum(
        "bxrs,xy->bxrys", gram.reshape(n_ib, block_i, rp, rp), eye_bi
    ).reshape(n_ib, block_i * rp, block_i * rp)

    group = jnp.asarray(
        np.kron(np.eye(block_c, dtype=np.float32), np.ones((l, 1), np.float32))
    )
    row_mask = jnp.asarray(
        np.tile((np.arange(rp) < r).astype(np.float32), block_i)
        .reshape(block_i * rp, 1)
    )
    rgroup = jnp.asarray(
        np.kron(np.eye(block_i, dtype=np.float32), np.ones((1, rp), np.float32))
    )  # (BI, BI*Rp)
    if bf16g:
        gram_bd = gram_bd.astype(jnp.bfloat16)

    images2d = images.reshape(ni_pad * rp, d)
    bcl = block_c * l
    birp = block_i * rp
    grid = (ni_pad // block_i, nc_pad // block_c)
    cidx = (lambda i, c: (0, 0)) if fixcap else (lambda i, c: (0, c))
    kwargs = {}
    if par:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        )
    out = pl.pallas_call(
        functools.partial(
            _kernel, block_i=block_i, rp=rp, lambda_lse=lambda_lse,
            lambda_softmax=lambda_softmax, stage=stage, nomax=nomax, gmm=gmm,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nc_pad // block_c, ni_pad, block_c), jnp.float32
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((birp, d), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, birp, birp), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bcl), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bcl), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bcl), cidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bcl, block_c), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((birp, 1), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, birp), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_i, block_c), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM
        ),
        **kwargs,
    )(images2d, gram_bd, cap_t, cap_norm, mask_row, group, row_mask, rgroup)
    out = jnp.transpose(out, (1, 0, 2)).reshape(ni_pad, nc_pad)
    return out[:ni, :nc]


def bench(fn, *args, reps=3):
    fn(*args)
    np.asarray(fn(*args).ravel()[:1])
    times = []
    for k in range(reps):
        a = list(args)
        a[0] = a[0] * (1.0 + (k + 1) / 256.0)
        t0 = time.perf_counter()
        np.asarray(fn(*a).ravel()[:1])
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    l, nc, bc, bi = 24, 1875, 32, 8
    for a in sys.argv[1:]:
        if a.startswith("--l="):
            l = int(a.split("=")[1])
        if a.startswith("--nc="):
            nc = int(a.split("=")[1])
        if a.startswith("--bc="):
            bc = int(a.split("=")[1])
        if a.startswith("--bi="):
            bi = int(a.split("=")[1])
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((NI, R, D)).astype(np.float32),
                      jnp.bfloat16)
    cap = jnp.asarray(rng.standard_normal((nc, l, D)).astype(np.float32),
                      jnp.bfloat16)
    mask = jnp.asarray(
        (np.arange(l)[None] < rng.integers(max(2, l - 7), l + 1, (nc,))[:, None])
        .astype(np.float32)
    )
    print(f"shape: ni={NI} nc={nc} l={l} bi={bi} bc={bc} bf16", flush=True)
    prev = 0.0
    for stage in (1, 2, 3, 4, 5, 6):
        try:
            t = bench(lambda i_, c_, m_, s=stage: run(
                i_, c_, m_, block_i=bi, block_c=bc, stage=s), img, cap, mask)
        except Exception as e:  # noqa: BLE001
            print(f"stage {stage}: FAILED ({str(e).splitlines()[0][:90]})",
                  flush=True)
            continue
        print(f"stage {stage}: {t * 1e3:7.1f} ms  (+{(t - prev) * 1e3:6.1f})",
              flush=True)
        prev = t

    for name, kw in (("nomax", dict(nomax=True)),
                     ("gmm", dict(gmm=True)),
                     ("nomax+gmm", dict(nomax=True, gmm=True)),
                     ("fixcap", dict(fixcap=True)),
                     ("par", dict(par=True)),
                     ("bf16g", dict(bf16g=True)),
                     ("par+bf16g", dict(par=True, bf16g=True))):
        try:
            t = bench(lambda i_, c_, m_, kw=kw: run(
                i_, c_, m_, block_i=bi, block_c=bc, **kw), img, cap, mask)
            # correctness vs the baseline full kernel
            ref_out = np.asarray(run(img, cap, mask, block_i=bi, block_c=bc))
            got = np.asarray(run(img, cap, mask, block_i=bi, block_c=bc, **kw))
            err = float(np.max(np.abs(got - ref_out)))
            print(f"full+{name}: {t * 1e3:7.1f} ms  (max|diff|={err:.2e})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"full+{name}: FAILED ({str(e).splitlines()[0][:90]})",
                  flush=True)


if __name__ == "__main__":
    main()
