"""Eval-engine tests: fold5 slicing, ensemble averaging, tile equivalence."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from itrx.data import synthetic, precomp
from itrx.eval import engine, metrics
from itrx.models import get_model
from itrx.utils.checkpoint import save_checkpoint


def _cfg(synth_dir, **kw):
    cfg = {
        "name": "VSE_PP",
        "data_path": os.path.dirname(synth_dir),
        "data_name": os.path.basename(synth_dir),
        "vocab_path": os.path.join(synth_dir, "vocab"),
        "vocab_type": "json",
        "text_encoder": "gru",
        "use_bbox": False,
        "max_words": 32,
        "pad_words": 96,
        "max_len": 60,
        "batch_size": 16,
        "embed_size": 24,
        "word_dim": 12,
        "img_dim": 32,
        "measure": "cosine",
        "use_abs": False,
        "no_imgnorm": False,
        "margin": 0.2,
        "max_violation": False,
        "eval_img_tile": 7,   # deliberately ragged tiles
        "eval_cap_tile": 13,
    }
    cfg.update(kw)
    return cfg


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("engine")
    d = synthetic.generate(str(root / "synthetic"), n_images=20, img_dim=32)
    for split in ("train", "dev", "test"):
        ims = np.load(os.path.join(d, f"{split}_ims.npy"))
        np.save(os.path.join(d, f"{split}_ims.npy"), ims.mean(axis=1))
    cfg = _cfg(d)
    ds = precomp.PrecompDataset(d, "test", cfg)
    cfg["vocab_size"] = ds.vocab_size
    model = get_model(cfg)
    batch = next(iter(ds.eval_batches(cfg["batch_size"])))
    batch.pop("n_valid")
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {k: jnp.asarray(x) for k, x in batch.items()}, train=True,
    )
    return d, cfg, ds, model, v


def test_ragged_tiles_match_single_shot(setup, rng):
    _, cfg, ds, model, v = setup
    enc = engine.encode_data(model, v, ds, cfg["batch_size"])
    imgs = enc["img"][::5]
    full = model.apply(v, imgs, enc["cap"], None, method="similarity")
    tiled = engine.cal_sims(
        model, v, imgs, enc["cap"], None, img_tile=7, cap_tile=13, verbose=False
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(tiled), atol=1e-6)


def test_evalrank_single_and_ensemble(setup, tmp_path):
    d, cfg, ds, model, v = setup
    ck1 = str(tmp_path / "m1.itrx")
    ck2 = str(tmp_path / "m2.itrx")
    sd = {"params": v["params"], "epoch": 1, "best_rsum": 1.0, "best_r1": 1.0,
          "Eiters": 10}
    save_checkpoint(sd, cfg, ck1)
    # second model: different seed
    model2 = get_model(cfg)
    batch = next(iter(ds.eval_batches(cfg["batch_size"])))
    batch.pop("n_valid")
    v2 = model2.init(
        {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
        {k: jnp.asarray(x) for k, x in batch.items()}, train=True,
    )
    save_checkpoint({**sd, "params": v2["params"]}, cfg, ck2)

    r1 = engine.evalrank_single(ck1, split="test")
    assert "rsum" in r1 and np.isfinite(r1["rsum"])
    # result yaml written next to the checkpoint
    assert any(f.endswith("_single_result.yaml") for f in os.listdir(tmp_path))

    re = engine.evalrank_ensemble(ck1, ck2, split="test")
    assert "rsum" in re and np.isfinite(re["rsum"])


def test_fold5_slicing(rng):
    """fold5 logic: 5 folds of 1000 imgs / 5000 caps, mean metrics."""
    # build a fake model-free check through metrics: per-fold recalls of a
    # block-diagonal sims must be perfect
    for i in range(5):
        sims = np.zeros((1000, 5000), np.float32)
        for k in range(1000):
            sims[k, 5 * k : 5 * k + 5] = 1.0
        r = metrics.cal_recall(sims, verbose=False)
        assert r["i2t_r1"] == 100.0 and r["t2i_r1"] == 100.0
        break


def test_length_bucketed_sims_exact(rng):
    """Bucketed evaluation must be exactly the unbucketed similarity."""
    from itrx.ops import attention

    ni, nc, r, l, d = 8, 80, 6, 24, 16
    img = jnp.asarray(rng.standard_normal((ni, r, d)).astype(np.float32))
    lengths = np.clip(rng.normal(9, 4, nc).astype(int), 3, l)
    mask = jnp.asarray((np.arange(l)[None] < lengths[:, None]).astype(np.float32))
    cap = jnp.asarray(rng.standard_normal((nc, l, d)).astype(np.float32)) * mask[:, :, None]

    class M:
        def apply(self, v, i, c, m, train=False, method="similarity"):
            return attention.xattn_score_t2i(i, c, m)

    s1 = engine.cal_sims(M(), {}, img, cap, mask, img_tile=8, cap_tile=40,
                         verbose=False, length_buckets=1)
    s4 = engine.cal_sims(M(), {}, img, cap, mask, img_tile=8, cap_tile=40,
                         verbose=False, length_buckets=4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s4), atol=1e-5)


def test_fused_bucket_single_dispatch_exact(rng):
    """The single-dispatch bucketed fused eval (engine._fused_bucket_eval_for,
    engaged when SCAN's fused kernels are active) must reproduce the direct
    whole-set similarity exactly: bucket trims only drop masked word columns
    (zero contribution everywhere) and the scatter restores caption order."""
    from itrx.ops import pallas

    cfg = dict(
        name="SCAN", vocab_size=50, embed_size=64, word_dim=16, bi_gru=False,
        no_imgnorm=False, no_txtnorm=True, precomp_enc_type="basic",
        margin=0.2, max_violation=True, cross_attn="t2i",
        raw_feature_norm="clipped_l2norm", agg_func="LogSumExp",
        lambda_lse=6.0, lambda_softmax=9.0,
    )
    model = get_model(cfg)
    ni, nc, r, l, d = 8, 80, 6, 24, 64
    img = jnp.asarray(
        rng.standard_normal((ni, r, d)).astype(np.float32), jnp.bfloat16
    )
    lengths = np.clip(rng.normal(9, 4, nc).astype(int), 3, l)
    mask = jnp.asarray((np.arange(l)[None] < lengths[:, None]).astype(np.float32))
    cap = jnp.asarray(
        rng.standard_normal((nc, l, d)).astype(np.float32), jnp.bfloat16
    ) * mask[:, :, None].astype(jnp.bfloat16)

    with pallas.force_interpret():
        assert model.fused_eval_active(jnp.bfloat16)
        pallas.reset_dispatch()
        fast = engine.cal_sims(
            model, {}, img, cap, mask, verbose=False,
            compute_dtype="bfloat16", length_buckets=4,
        )
        # the single-dispatch path routed through the fused kernel
        assert pallas.dispatch_counts().get("xattn_t2i_fused", 0) >= 1
        direct = model.apply({}, img, cap, mask, train=False, method="similarity")
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(direct), atol=2e-5
    )


def test_budget_branches_exact(rng):
    """Every staging/assembly branch the eval budgets select between must
    reproduce the default device-resident path: (a) host-staged caption
    stacks (the coco-testall offload path: numpy in, per-bucket re-upload,
    host-side assembly), (b) forced host assembly of device-resident
    buckets (`device_assembly_bytes`), (c) a starvation `slab_bytes` that
    engages the tile-shrink loops.  Same fp32 math throughout — results
    must agree to float tolerance."""
    from itrx.ops import attention

    ni, nc, r, l, d = 40, 300, 6, 24, 16
    img = jnp.asarray(rng.standard_normal((ni, r, d)).astype(np.float32))
    lengths = np.clip(rng.normal(9, 4, nc).astype(int), 3, l)
    mask = jnp.asarray((np.arange(l)[None] < lengths[:, None]).astype(np.float32))
    cap = jnp.asarray(
        rng.standard_normal((nc, l, d)).astype(np.float32)
    ) * mask[:, :, None]

    class M:
        def apply(self, v, i, c, m, train=False, method="similarity"):
            return attention.xattn_score_t2i(i, c, m)

    kw = dict(img_tile=64, cap_tile=256, verbose=False, length_buckets=4)
    base = engine.cal_sims(M(), {}, img, cap, mask, **kw)

    host = engine.cal_sims(M(), {}, img, np.asarray(cap), np.asarray(mask), **kw)
    np.testing.assert_allclose(np.asarray(host), np.asarray(base), atol=1e-5)

    asm = engine.cal_sims(
        M(), {}, img, cap, mask, budgets={"device_assembly_bytes": 1}, **kw
    )
    np.testing.assert_allclose(np.asarray(asm), np.asarray(base), atol=1e-5)

    slab = engine.cal_sims(
        M(), {}, img, cap, mask, budgets={"slab_bytes": 1 << 12}, **kw
    )
    np.testing.assert_allclose(np.asarray(slab), np.asarray(base), atol=1e-5)


def test_encode_offload_threshold(setup):
    """offload_threshold_bytes=0 stages every stack to host numpy with
    identical values to the device-resident default."""
    d, cfg, ds, model, v = setup
    dev = engine.encode_data(model, v, ds, cfg["batch_size"])
    off = engine.encode_data(
        model, v, ds, cfg["batch_size"], offload_threshold_bytes=0
    )
    assert set(dev) == set(off)
    for k in dev:
        assert isinstance(off[k], np.ndarray)
        np.testing.assert_array_equal(np.asarray(dev[k]), off[k])


def test_budget_branches_bf16_host_cast(rng):
    """Host-staged bf16 (worker-thread _host_cast + upload pipeline) equals
    the device-resident bf16 cast path."""
    from itrx.ops import attention

    ni, nc, r, l, d = 16, 120, 4, 16, 8
    img = jnp.asarray(rng.standard_normal((ni, r, d)).astype(np.float32))
    lengths = np.clip(rng.normal(8, 3, nc).astype(int), 3, l)
    mask = jnp.asarray((np.arange(l)[None] < lengths[:, None]).astype(np.float32))
    cap = jnp.asarray(
        rng.standard_normal((nc, l, d)).astype(np.float32)
    ) * mask[:, :, None]

    class M:
        def apply(self, v, i, c, m, train=False, method="similarity"):
            return attention.xattn_score_t2i(i, c, m)

    kw = dict(img_tile=8, cap_tile=64, verbose=False, length_buckets=4,
              compute_dtype="bfloat16")
    dev = engine.cal_sims(M(), {}, img, cap, mask, **kw)
    host = engine.cal_sims(M(), {}, img, np.asarray(cap), np.asarray(mask), **kw)
    np.testing.assert_allclose(np.asarray(host), np.asarray(dev),
                               atol=1e-6, rtol=1e-5)
