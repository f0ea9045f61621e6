"""Offline eval CLI on a multi-device host (round-4: the test.py surface).

`evalrank_single`/`evalrank_ensemble` must build a mesh with the same policy
as `fit()` (train/loop.py:359-378) whenever more than one device is visible:
without it, the reference's primary published-number workflow (ref
test.py:1-20 -> evaluation.py:262-435) would run on ONE chip of a v5e-8 with
every fused eval kernel disabled (pallas_ok() requires an active mesh when
device_count()>1).  These tests drive the real CLI functions on the 8-device
virtual CPU mesh and assert (a) recalls identical to the single-device run
and (b) under force_interpret, the fused shard_map kernel dispatch engages.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itrx.data import precomp, synthetic
from itrx.eval import engine
from itrx.models import get_model
from itrx.ops import pallas
from itrx.utils.checkpoint import save_checkpoint

RECALL_KEYS = (
    "rsum", "i2t_r1", "i2t_r5", "i2t_r10", "i2t_medr",
    "t2i_r1", "t2i_r5", "t2i_r10", "t2i_medr",
)


def _scan_cfg(synth_dir, **kw):
    cfg = {
        "name": "SCAN",
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
        "bi_gru": True,
        "no_imgnorm": False,
        "no_txtnorm": True,
        "precomp_enc_type": "basic",
        "margin": 0.2,
        "max_violation": True,
        "cross_attn": "t2i",
        "raw_feature_norm": "clipped_l2norm",
        "agg_func": "LogSumExp",
        "lambda_lse": 6.0,
        "lambda_softmax": 9.0,
    }
    cfg.update(kw)
    return cfg


@pytest.fixture(scope="module")
def scan_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalcli")
    d = synthetic.generate(str(root / "synthetic"), n_images=20, img_dim=32)
    cfg = _scan_cfg(d)
    ds = precomp.PrecompDataset(d, "test", cfg)
    cfg["vocab_size"] = ds.vocab_size
    model = get_model(cfg)
    batch = next(iter(ds.eval_batches(cfg["batch_size"])))
    batch.pop("n_valid")
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        {k: jnp.asarray(x) for k, x in batch.items()}, train=True,
    )
    sd = {"params": v["params"], "epoch": 1, "best_rsum": 1.0,
          "best_r1": 1.0, "Eiters": 10}
    ck = str(root / "model_best.itrx")
    save_checkpoint(sd, cfg, ck)
    ck_bf16 = str(root / "model_best_bf16.itrx")
    save_checkpoint(sd, dict(cfg, eval_bf16=True), ck_bf16)
    return d, cfg, ds, model, v, ck, ck_bf16


def test_evalrank_single_builds_mesh_and_matches_single_device(
    scan_setup, capsys
):
    """The CLI entry must mesh over all 8 devices and reproduce the
    single-device recalls exactly (caption columns are independent)."""
    d, cfg, ds, model, v, ck, _ = scan_setup
    assert jax.device_count() == 8

    base = engine.evaluate_split(model, v, ds, cfg, mesh=None)
    res = engine.evalrank_single(ck, split="test")
    out = capsys.readouterr().out
    assert "eval mesh over 8 devices" in out
    for k in RECALL_KEYS:
        np.testing.assert_allclose(res[k], base[k], atol=1e-9, err_msg=k)


def test_evalrank_single_fused_dispatch_on_mesh(scan_setup):
    """With eval_bf16 in the checkpoint config, the meshed CLI eval must
    route the fused kernels through their shard_map wrappers (interpret
    mode executes the real routing on the CPU mesh)."""
    d, cfg, ds, model, v, ck, ck_bf16 = scan_setup
    pallas.reset_dispatch()
    with pallas.force_interpret():
        res = engine.evalrank_single(ck_bf16, split="test")
    counts = pallas.dispatch_counts()
    assert "xattn_fused_sharded" in counts, counts
    assert np.isfinite(res["rsum"])

    # the sharded fused path must reproduce the single-device fused path
    # (same kernel, caption columns independent)
    with pallas.force_interpret():
        base = engine.evaluate_split(
            model, v, ds, dict(cfg, eval_bf16=True), mesh=None
        )
    for k in RECALL_KEYS:
        np.testing.assert_allclose(res[k], base[k], atol=1e-9, err_msg=k)


def test_evalrank_ensemble_meshes_and_matches(scan_setup, tmp_path, capsys):
    """Ensemble eval gets the same mesh + budget threading; averaging two
    identical checkpoints must reproduce the single-checkpoint recalls."""
    d, cfg, ds, model, v, ck, _ = scan_setup
    base = engine.evaluate_split(model, v, ds, cfg, mesh=None)
    res = engine.evalrank_ensemble(ck, ck, split="test")
    out = capsys.readouterr().out
    assert "eval mesh over 8 devices" in out
    for k in RECALL_KEYS:
        np.testing.assert_allclose(res[k], base[k], atol=1e-9, err_msg=k)


def test_ensemble_budgets_reach_cal_sims(scan_setup, monkeypatch):
    """The config's eval budget knobs must reach the ensemble's cal_sims
    calls (round-3 weak #2: they were silently dropped)."""
    d, cfg, ds, model, v, ck, _ = scan_setup
    seen = []
    orig = engine.cal_sims

    def spy(*a, **kw):
        seen.append(kw.get("budgets"))
        return orig(*a, **kw)

    monkeypatch.setattr(engine, "cal_sims", spy)
    ck_b = str(os.path.dirname(ck) + "/budget.itrx")
    save_checkpoint(
        {"params": v["params"], "epoch": 1, "best_rsum": 1.0,
         "best_r1": 1.0, "Eiters": 10},
        dict(cfg, eval_slab_bytes=123456789), ck_b,
    )
    engine.evalrank_ensemble(ck_b, ck_b, split="test")
    assert seen and all(
        b is not None and b.get("slab_bytes") == 123456789 for b in seen
    )
