"""Recall@K ranking metrics, computed entirely on device.

Reference semantics: itr/metricmodule/evaluation.py:156-259 (i2t/t2i/cal_recall).
The reference ranks with a host-side `np.argsort(...)[::-1]` per query; here
ranks are rank-by-counting —

    rank(gt) = #{scores strictly greater} + #{exact ties at a higher index}

— a single vectorized comparison + reduction that maps onto the VPU with no
sort at all.  The tie term reproduces the reference's argsort semantics
deterministically (ascending sort reversed puts equal scores in descending
index order), which matters for bf16 or ensemble-averaged sims where exact
float ties are likely.

The sim-matrix convention is the reference's: `sims[i, c]` is the similarity
between image `i` (of N deduplicated images) and caption `c` (of `cap_ratio*N`
captions, captions `cap_ratio*i .. cap_ratio*i+cap_ratio-1` being the ground
truth for image `i`), with cap_ratio = 5 for the standard datasets.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RankStats(NamedTuple):
    r1: jnp.ndarray
    r5: jnp.ndarray
    r10: jnp.ndarray
    medr: jnp.ndarray
    meanr: jnp.ndarray

    def as_tuple(self):
        return (
            float(self.r1),
            float(self.r5),
            float(self.r10),
            float(self.medr),
            float(self.meanr),
        )


def _stats_from_ranks(ranks: jnp.ndarray) -> RankStats:
    n = ranks.shape[0]
    r1 = 100.0 * jnp.sum(ranks < 1) / n
    r5 = 100.0 * jnp.sum(ranks < 5) / n
    r10 = 100.0 * jnp.sum(ranks < 10) / n
    # np.floor(np.median(...)) + 1, ref evaluation.py:184.  For even n numpy
    # median averages the two central values; replicate by sorting once.
    sorted_ranks = jnp.sort(ranks)
    if n % 2 == 1:
        med = sorted_ranks[n // 2].astype(jnp.float32)
    else:
        med = (sorted_ranks[n // 2 - 1] + sorted_ranks[n // 2]).astype(jnp.float32) / 2.0
    medr = jnp.floor(med) + 1.0
    meanr = jnp.mean(ranks.astype(jnp.float32)) + 1.0
    return RankStats(r1, r5, r10, medr, meanr)


def i2t_ranks(sims: jnp.ndarray, cap_ratio: int = 5) -> jnp.ndarray:
    """Per-image best rank over its `cap_ratio` ground-truth captions.

    sims: (N, cap_ratio*N).  Ref evaluation.py:156-189 takes, for each image,
    the best argsort position among its 5 captions; here that is the min over
    the 5 per-caption counting ranks.
    """
    n = sims.shape[0]
    n_cap = sims.shape[1]
    gt_cols = (
        jnp.arange(n)[:, None] * cap_ratio + jnp.arange(cap_ratio)[None, :]
    )  # (N, cap_ratio)
    gt_scores = jnp.take_along_axis(sims, gt_cols, axis=1)  # (N, cap_ratio)
    # rank of each gt caption: strictly-higher scores, plus exact ties at a
    # higher column index (the reference's reversed-argsort tie order)
    cmp = sims[:, None, :]  # (N, 1, n_cap) vs (N, cap_ratio, 1)
    greater = jnp.sum(cmp > gt_scores[:, :, None], axis=-1)
    ties_after = jnp.sum(
        (cmp == gt_scores[:, :, None])
        & (jnp.arange(n_cap)[None, None, :] > gt_cols[:, :, None]),
        axis=-1,
    )
    return jnp.min(greater + ties_after, axis=1)


def t2i_ranks(sims: jnp.ndarray, cap_ratio: int = 5) -> jnp.ndarray:
    """Per-caption rank of its ground-truth image.  Ref evaluation.py:192-222."""
    n = sims.shape[0]
    n_cap = sims.shape[1]
    img_of_cap = jnp.arange(n_cap) // cap_ratio  # (5N,)
    gt_scores = sims[img_of_cap, jnp.arange(n_cap)]  # (5N,)
    greater = jnp.sum(sims > gt_scores[None, :], axis=0)
    ties_after = jnp.sum(
        (sims == gt_scores[None, :])
        & (jnp.arange(n)[:, None] > img_of_cap[None, :]),
        axis=0,
    )
    return greater + ties_after


@functools.partial(jax.jit, static_argnames=("cap_ratio",))
def _rank_metrics(sims: jnp.ndarray, cap_ratio: int = 5):
    ri2t = i2t_ranks(sims, cap_ratio)
    rt2i = t2i_ranks(sims, cap_ratio)
    return _stats_from_ranks(ri2t), _stats_from_ranks(rt2i), ri2t, rt2i


@functools.partial(jax.jit, static_argnames=("cap_ratio",))
def _rank_metrics_packed(sims: jnp.ndarray, cap_ratio: int = 5):
    """Both directions' stats and raw ranks in ONE flat fp32 array.

    `cal_recall` pulls its whole result with a single host transfer — under
    a high-latency device link (the axon relay here) the dozen separate
    scalar/array pulls of the unpacked path cost more than the ranking
    compute itself.  Layout: [i2t stats(5) | t2i stats(5) | ranks_i2t(N) |
    ranks_t2i(cap_ratio*N)]; ranks are exact in fp32 (N ≤ 2^24).
    """
    ri2t = i2t_ranks(sims, cap_ratio)
    rt2i = t2i_ranks(sims, cap_ratio)
    s_i2t = jnp.stack(_stats_from_ranks(ri2t)).astype(jnp.float32)
    s_t2i = jnp.stack(_stats_from_ranks(rt2i)).astype(jnp.float32)
    return jnp.concatenate(
        [s_i2t, s_t2i, ri2t.astype(jnp.float32), rt2i.astype(jnp.float32)]
    )


def i2t(sims, return_ranks: bool = False, cap_ratio: int = 5):
    """(r1, r5, r10, medr, meanr) for image→text.  API mirror of ref i2t."""
    sims = jnp.asarray(sims)
    stats, _, ranks, _ = _rank_metrics(sims, cap_ratio)
    if return_ranks:
        top1 = jnp.argmax(sims, axis=1)
        return stats.as_tuple(), (np.asarray(ranks), np.asarray(top1))
    return stats.as_tuple()


def t2i(sims, return_ranks: bool = False, cap_ratio: int = 5):
    """(r1, r5, r10, medr, meanr) for text→image.  API mirror of ref t2i."""
    sims = jnp.asarray(sims)
    _, stats, _, ranks = _rank_metrics(sims, cap_ratio)
    if return_ranks:
        top1 = jnp.argmax(sims, axis=0)
        return stats.as_tuple(), (np.asarray(ranks), np.asarray(top1))
    return stats.as_tuple()


def cal_recall(sims, cap_ratio: int = 5, verbose: bool = True) -> dict:
    """Aggregate both directions + rsum into a result dict.

    Mirrors ref evaluation.py:225-259 (keys included), minus the raw rank
    arrays unless asked for.
    """
    sims = jnp.asarray(sims)
    n = sims.shape[0]
    packed = np.asarray(_rank_metrics_packed(sims, cap_ratio))  # one transfer
    r = tuple(float(v) for v in packed[:5])
    ri = tuple(float(v) for v in packed[5:10])
    ranks_i2t = packed[10 : 10 + n].astype(np.int64)
    ranks_t2i = packed[10 + n :].astype(np.int64)
    ar = (r[0] + r[1] + r[2]) / 3
    ari = (ri[0] + ri[1] + ri[2]) / 3
    rsum = r[0] + r[1] + r[2] + ri[0] + ri[1] + ri[2]
    if verbose:
        print("rsum: %.1f" % rsum)
        print("Average i2t Recall: %.1f" % ar)
        print("Image to text: r1 %.1f; r5 %.1f; r10 %.1f; medr %.1f; meanr %.1f" % r)
        print("Average t2i Recall: %.1f" % ari)
        print("Text to image: r1 %.1f; r5 %.1f; r10 %.1f; medr %.1f; meanr %.1f" % ri)
    res = {
        "result": [list(r) + list(ri) + [ar, ari, rsum]],
        "rsum": rsum,
        "i2t_ave_r": ar,
        "i2t_r1": r[0],
        "i2t_r5": r[1],
        "i2t_r10": r[2],
        "i2t_medr": r[3],
        "i2t_meanr": r[4],
        "i2t_ranks": ranks_i2t,
        "t2i_ave_r": ari,
        "t2i_r1": ri[0],
        "t2i_r5": ri[1],
        "t2i_r10": ri[2],
        "t2i_medr": ri[3],
        "t2i_meanr": ri[4],
        "t2i_ranks": ranks_t2i,
    }
    return res
