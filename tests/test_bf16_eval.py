"""bf16 eval-path parity: recalls must not drift vs the fp32 grid.

VERDICT item 5: cast embeddings/activations to bf16 for the eval similarity
grid, fp32 accumulation, recall drift <= 0.1 on a synthetic eval.
"""

import jax.numpy as jnp
import numpy as np

from itrx.eval import engine, metrics
from itrx.ops import attention


class _ScanSim:
    def apply(self, variables, img, cap, mask, train=False, method="similarity"):
        return attention.xattn_score_t2i(img, cap, mask)


class _CosSim:
    def apply(self, variables, img, cap, mask, train=False, method="similarity"):
        from itrx.ops import sim

        return sim.cosine_sim(img, cap)


def _planted(rng, n=200, d=64):
    """Image/caption embeddings with planted ground truth."""
    im = rng.standard_normal((n, d)).astype(np.float32)
    cap = np.repeat(im, 5, 0) * 0.6 + 0.8 * rng.standard_normal(
        (5 * n, d)
    ).astype(np.float32)
    return im, cap


def test_bf16_cosine_recall_drift():
    rng = np.random.default_rng(0)
    im, cap = _planted(rng)
    model = _CosSim()
    r32 = metrics.cal_recall(
        engine.cal_sims(model, {}, jnp.asarray(im), jnp.asarray(cap), verbose=False),
        verbose=False,
    )
    r16 = metrics.cal_recall(
        engine.cal_sims(
            model, {}, jnp.asarray(im), jnp.asarray(cap),
            verbose=False, compute_dtype="bfloat16",
        ),
        verbose=False,
    )
    for k in ("i2t_r1", "i2t_r5", "i2t_r10", "t2i_r1", "t2i_r5", "t2i_r10"):
        assert abs(r32[k] - r16[k]) <= 0.55, (k, r32[k], r16[k])
    assert abs(r32["rsum"] - r16["rsum"]) <= 1.5


def test_bf16_xattn_recall_drift():
    rng = np.random.default_rng(1)
    n, r, l, d = 80, 8, 12, 64
    im3 = rng.standard_normal((n, r, d)).astype(np.float32)
    lengths = rng.integers(4, l + 1, (5 * n,))
    mask = (np.arange(l)[None] < lengths[:, None]).astype(np.float32)
    # captions correlated with their image's regions so recalls are non-trivial
    cap = (
        np.repeat(im3.mean(1, keepdims=True), 5, 0)
        + 0.7 * rng.standard_normal((5 * n, l, d)).astype(np.float32)
    ) * mask[:, :, None]
    model = _ScanSim()
    args = (model, {}, jnp.asarray(im3), jnp.asarray(cap), jnp.asarray(mask))
    r32 = metrics.cal_recall(
        engine.cal_sims(*args, verbose=False), verbose=False
    )
    r16 = metrics.cal_recall(
        engine.cal_sims(*args, verbose=False, compute_dtype="bfloat16"),
        verbose=False,
    )
    for k in ("i2t_r1", "i2t_r5", "i2t_r10", "t2i_r1", "t2i_r5", "t2i_r10"):
        assert abs(r32[k] - r16[k]) <= 0.55, (k, r32[k], r16[k])


def test_bf16_xattn_scores_close():
    """Raw bf16 grid scores stay within bf16 tolerance of fp32."""
    rng = np.random.default_rng(2)
    ni, r, l, d = 16, 8, 10, 32
    im = rng.standard_normal((ni, r, d)).astype(np.float32)
    mask = np.ones((ni * 2, l), np.float32)
    cap = rng.standard_normal((ni * 2, l, d)).astype(np.float32)
    s32 = np.asarray(
        attention.xattn_score_t2i(jnp.asarray(im), jnp.asarray(cap), jnp.asarray(mask))
    )
    s16 = np.asarray(
        attention.xattn_score_t2i(
            jnp.asarray(im, jnp.bfloat16),
            jnp.asarray(cap, jnp.bfloat16),
            jnp.asarray(mask),
        )
    )
    assert s16.dtype == np.float32
    assert np.max(np.abs(s32 - s16)) < 0.03


def test_host_staged_bf16_matches_device_path():
    """Host-staged numpy embeddings (cast to bf16 on HOST before upload,
    engine._host_cast) must give bitwise-identical sims to the device-cast
    path — the cast commutes with the transfer."""
    rng = np.random.default_rng(2)
    n, r, l, d = 80, 8, 12, 64
    im3 = rng.standard_normal((n, r, d)).astype(np.float32)
    lengths = rng.integers(4, l + 1, (5 * n,))
    mask = (np.arange(l)[None] < lengths[:, None]).astype(np.float32)
    cap = (
        np.repeat(im3.mean(1, keepdims=True), 5, 0)
        + 0.7 * rng.standard_normal((5 * n, l, d)).astype(np.float32)
    ) * mask[:, :, None]
    model = _ScanSim()
    s_dev = engine.cal_sims(
        model, {}, jnp.asarray(im3), jnp.asarray(cap), jnp.asarray(mask),
        verbose=False, compute_dtype="bfloat16",
    )
    # host numpy captions force the host-staged branch (bucket re-upload)
    s_host = engine.cal_sims(
        model, {}, jnp.asarray(im3), cap, mask,
        verbose=False, compute_dtype="bfloat16",
    )
    np.testing.assert_array_equal(np.asarray(s_dev), np.asarray(s_host))


def test_encode_time_cast_matches_sim_time_cast():
    """encode_data(compute_dtype='bfloat16') pre-casts the stacks; sims from
    pre-cast embeddings equal sims from fp32 embeddings cast at tile time."""
    rng = np.random.default_rng(3)
    im, cap = _planted(rng, n=60)
    model = _CosSim()
    s_late = engine.cal_sims(
        model, {}, jnp.asarray(im), jnp.asarray(cap),
        verbose=False, compute_dtype="bfloat16",
    )
    s_early = engine.cal_sims(
        model, {},
        jnp.asarray(im).astype(jnp.bfloat16),
        jnp.asarray(cap).astype(jnp.bfloat16),
        verbose=False, compute_dtype="bfloat16",
    )
    np.testing.assert_array_equal(np.asarray(s_late), np.asarray(s_early))
