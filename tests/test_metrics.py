"""Golden tests for the on-device Recall@K metrics against an independent
numpy oracle implementing the reference's argsort semantics
(itr/metricmodule/evaluation.py:156-222)."""

import numpy as np

from itrx.eval import metrics


def oracle_i2t(sims):
    npts = sims.shape[0]
    ranks = np.zeros(npts)
    for index in range(npts):
        inds = np.argsort(sims[index])[::-1]
        rank = 1e20
        for i in range(5 * index, 5 * index + 5):
            tmp = np.where(inds == i)[0][0]
            rank = min(rank, tmp)
        ranks[index] = rank
    r1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    r5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    r10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)
    medr = np.floor(np.median(ranks)) + 1
    meanr = ranks.mean() + 1
    return (r1, r5, r10, medr, meanr), ranks


def oracle_t2i(sims):
    npts = sims.shape[0]
    ranks = np.zeros(5 * npts)
    simsT = sims.T
    for index in range(npts):
        for i in range(5):
            inds = np.argsort(simsT[5 * index + i])[::-1]
            ranks[5 * index + i] = np.where(inds == index)[0][0]
    r1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    r5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    r10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)
    medr = np.floor(np.median(ranks)) + 1
    meanr = ranks.mean() + 1
    return (r1, r5, r10, medr, meanr), ranks


def test_i2t_matches_oracle(rng):
    sims = rng.standard_normal((40, 200)).astype(np.float32)
    got = metrics.i2t(sims)
    want, want_ranks = oracle_i2t(sims)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    _, (ranks, _) = metrics.i2t(sims, return_ranks=True)
    np.testing.assert_array_equal(ranks, want_ranks)


def test_t2i_matches_oracle(rng):
    sims = rng.standard_normal((40, 200)).astype(np.float32)
    got = metrics.t2i(sims)
    want, want_ranks = oracle_t2i(sims)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    _, (ranks, _) = metrics.t2i(sims, return_ranks=True)
    np.testing.assert_array_equal(ranks, want_ranks)


def test_perfect_retrieval():
    # block-diagonal sims: every image maxes on its own captions
    n = 10
    sims = np.zeros((n, 5 * n), dtype=np.float32)
    for i in range(n):
        sims[i, 5 * i : 5 * i + 5] = 10.0 + np.arange(5)
    got = metrics.i2t(sims)
    assert got[0] == 100.0
    got_t = metrics.t2i(sims)
    assert got_t[0] == 100.0


def test_cal_recall_keys(rng):
    sims = rng.standard_normal((12, 60)).astype(np.float32)
    res = metrics.cal_recall(sims, verbose=False)
    ri, rt = oracle_i2t(sims)[0], oracle_t2i(sims)[0]
    rsum = sum(ri[:3]) + sum(rt[:3])
    np.testing.assert_allclose(res["rsum"], rsum, rtol=1e-6)
    assert res["result"][0][-1] == res["rsum"]
    for k in ("i2t_r1", "t2i_r10", "i2t_medr", "t2i_meanr"):
        assert k in res


def test_even_median(rng):
    # even number of queries exercises the two-central-values median path
    sims = rng.standard_normal((8, 40)).astype(np.float32)
    got = metrics.i2t(sims)
    want, _ = oracle_i2t(sims)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def _tied_sims(rng, n=10, levels=4):
    """Sim matrix with massive exact-tie blocks (like bf16/ensemble sims)."""
    return rng.integers(0, levels, (n, 5 * n)).astype(np.float32)


def test_tie_breaking_matches_stable_argsort(rng):
    """On exact ties the counting rank must equal the reference's reversed
    argsort (stable kind: equal scores in descending index order)."""
    sims = _tied_sims(rng)

    def stable_i2t_ranks(s):
        out = np.zeros(s.shape[0], np.int64)
        for i in range(s.shape[0]):
            inds = np.argsort(s[i], kind="stable")[::-1]
            out[i] = min(np.where(inds == c)[0][0] for c in range(5 * i, 5 * i + 5))
        return out

    def stable_t2i_ranks(s):
        sT = s.T
        out = np.zeros(sT.shape[0], np.int64)
        for c in range(sT.shape[0]):
            inds = np.argsort(sT[c], kind="stable")[::-1]
            out[c] = np.where(inds == c // 5)[0][0]
        return out

    np.testing.assert_array_equal(
        np.asarray(metrics.i2t_ranks(sims)), stable_i2t_ranks(sims)
    )
    np.testing.assert_array_equal(
        np.asarray(metrics.t2i_ranks(sims)), stable_t2i_ranks(sims)
    )
