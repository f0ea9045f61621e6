"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4):
sharded eval must reproduce single-device recalls; dp train step must run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itrx.eval import metrics
from itrx.models import get_model
from itrx.parallel import mesh as pmesh
from itrx.train.loop import make_train_step
from itrx.train.state import create_train_state


def _scan_cfg():
    return dict(
        name="SCAN", vocab_size=80, embed_size=32, word_dim=16, bi_gru=True,
        no_imgnorm=False, no_txtnorm=True, precomp_enc_type="basic",
        margin=0.2, max_violation=True, cross_attn="t2i",
        raw_feature_norm="clipped_l2norm", agg_func="LogSumExp",
        lambda_lse=6.0, lambda_softmax=9.0,
        learning_rate=1e-3, lr_update=10, grad_clip=2.0, seed=0,
    )


def _batch(rng, b, r=8, d=32, l=12, v=80):
    return {
        "images": jnp.asarray(rng.standard_normal((b, r, d)).astype(np.float32)),
        "cap_ids": jnp.asarray(rng.integers(0, v, (b, l)).astype(np.int32)),
        "cap_mask": jnp.asarray(
            (np.arange(l)[None] < rng.integers(3, l, (b,))[:, None]).astype(np.float32)
        ),
    }


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_similarity_matches_single_device(rng):
    cfg = _scan_cfg()
    model = get_model(cfg)
    batch = _batch(rng, 16)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    e = model.apply(v, batch, train=False, method="embed")

    # single device
    s1 = model.apply(v, e["img"], e["cap"], e["cap_mask"], method="similarity")

    # 8-device caption-sharded (16 caps not divisible by 8? it is; also test 13)
    m = pmesh.make_mesh(devices=jax.devices()[:8])
    s8 = pmesh.sharded_similarity(model, v, e["img"], e["cap"], e["cap_mask"], m)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s8), atol=1e-5)

    # ragged caption count (padding path)
    s1r = model.apply(
        v, e["img"], e["cap"][:13], e["cap_mask"][:13], method="similarity"
    )
    s8r = pmesh.sharded_similarity(
        model, v, e["img"], e["cap"][:13], e["cap_mask"][:13], m
    )
    np.testing.assert_allclose(np.asarray(s1r), np.asarray(s8r), atol=1e-5)


def test_sharded_recalls_bitwise_equal(rng):
    """Same recalls from sharded and unsharded sim matrices."""
    cfg = dict(_scan_cfg(), name="VSE_PP", measure="cosine", use_abs=False)
    model = get_model(cfg)
    b = 40
    batch = _batch(rng, b)
    batch["images"] = jnp.asarray(
        rng.standard_normal((b, 32)).astype(np.float32)
    )
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    e = model.apply(v, batch, train=False, method="embed")
    imgs = e["img"][::5]

    s1 = model.apply(v, imgs, e["cap"], None, method="similarity")
    m = pmesh.make_mesh(devices=jax.devices()[:8])
    s8 = pmesh.sharded_similarity(model, v, imgs, e["cap"], None, m)

    r1 = metrics.cal_recall(s1, verbose=False)
    r8 = metrics.cal_recall(s8, verbose=False)
    assert r1["rsum"] == r8["rsum"]
    np.testing.assert_array_equal(r1["i2t_ranks"], r8["i2t_ranks"])
    np.testing.assert_array_equal(r1["t2i_ranks"], r8["t2i_ranks"])


def test_dp_train_step_runs_and_matches_unsharded(rng):
    cfg = _scan_cfg()
    model = get_model(cfg)
    batch = _batch(rng, 16)
    state, tx = create_train_state(model, cfg, batch, steps_per_epoch=10)
    step = make_train_step(model, tx)

    # the step donates its input state; keep an undonated copy for the
    # sharded comparison run
    state_copy = jax.tree.map(jnp.copy, state)

    # unsharded
    s_a, aux_a = step(state, batch, jax.random.PRNGKey(5), 0)

    # dp-sharded over 8 devices
    m = pmesh.make_mesh(devices=jax.devices()[:8])
    state_r = pmesh.replicate_tree(state_copy, m)
    batch_s = pmesh.shard_batch(batch, m)
    s_b, aux_b = step(state_r, batch_s, jax.random.PRNGKey(5), 0)

    assert np.isfinite(float(aux_b["Loss"]))
    np.testing.assert_allclose(
        float(aux_a["Loss"]), float(aux_b["Loss"]), rtol=1e-5
    )
    # parameters after the step agree
    pa = jax.tree.leaves(s_a.params)
    pb = jax.tree.leaves(s_b.params)
    for a, b2 in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=1e-5)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dp_tp_mesh_train_step_matches_unsharded(rng):
    """2-D dp x tp mesh: batch over dp, large kernels sharded over tp
    (pure layout — loss and updated params must match single-device)."""
    cfg = _scan_cfg()
    model = get_model(cfg)
    batch = _batch(rng, 16)
    state, tx = create_train_state(model, cfg, batch, steps_per_epoch=10)
    step = make_train_step(model, tx)
    state_copy = jax.tree.map(jnp.copy, state)

    s_a, aux_a = step(state, batch, jax.random.PRNGKey(5), 0)

    m = pmesh.make_mesh({"mesh_shape": {"dp": 4, "tp": 2}})
    assert dict(m.shape) == {"dp": 4, "tp": 2}
    params = pmesh.shard_params(state_copy.params, m)
    # at least one kernel actually lands sharded over tp
    from jax.sharding import PartitionSpec as P
    specs = [pmesh.param_pspec(x, m) for x in jax.tree.leaves(params)]
    assert any(s != P() for s in specs)
    state_s = state_copy.replace(
        params=params,
        opt_state=jax.jit(tx.init)(params),
        batch_stats=pmesh.replicate_tree(state_copy.batch_stats, m),
        step=pmesh.replicate_tree(state_copy.step, m),
    )
    batch_s = pmesh.shard_batch(batch, m)
    s_b, aux_b = step(state_s, batch_s, jax.random.PRNGKey(5), 0)

    np.testing.assert_allclose(
        float(aux_a["Loss"]), float(aux_b["Loss"]), rtol=1e-5
    )
    for a, b2 in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=1e-5)


def test_tp_only_mesh_gets_dp_axis():
    """mesh_shape={'tp': N} must still expose a 'dp' axis (batch sharding
    and caption-sharded eval address it); review finding: it used to crash
    at the first shard_batch."""
    from itrx.parallel import mesh as pmesh
    import jax.numpy as jnp

    m = pmesh.make_mesh({"mesh_shape": {"tp": 2}})
    assert "dp" in m.shape and m.shape["dp"] == 1 and m.shape["tp"] == 2
    b = pmesh.shard_batch({"x": jnp.ones((4, 3))}, m)
    assert b["x"].shape == (4, 3)


def test_shard_train_state_preserves_opt_state():
    """Re-laying a TrainState out for a tp mesh must keep the restored Adam
    moments and schedule count (review finding: the old tp branch re-inited
    the optimizer, silently discarding a resumed run's moments)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from itrx.models import get_model
    from itrx.parallel import mesh as pmesh
    from itrx.train.loop import make_train_step
    from itrx.train.state import create_train_state

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.standard_normal((8, 4, 32)).astype(np.float32)),
        "cap_ids": jnp.asarray(rng.integers(0, 50, (8, 6)).astype(np.int32)),
        "cap_mask": jnp.ones((8, 6), jnp.float32),
    }
    cfg = dict(name="SCAN", vocab_size=50, embed_size=32, word_dim=16,
               bi_gru=False, no_imgnorm=False, no_txtnorm=True,
               precomp_enc_type="basic", margin=0.2, max_violation=True,
               cross_attn="t2i", raw_feature_norm="clipped_l2norm",
               agg_func="LogSumExp", lambda_lse=6.0, lambda_softmax=9.0,
               learning_rate=1e-3, lr_update=15, grad_clip=2.0, seed=0)
    model = get_model(cfg)
    state, tx = create_train_state(model, cfg, batch, 10)
    # advance a few steps so the moments and count are non-trivial
    step = make_train_step(model, tx)
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(0), 0)

    before = [np.asarray(x) for x in jax.tree.leaves(state.opt_state)]
    m = pmesh.make_mesh({"mesh_shape": {"dp": 4, "tp": 2}})
    sharded = pmesh.shard_train_state(state, m)
    after = [np.asarray(x) for x in jax.tree.leaves(sharded.opt_state)]
    assert len(before) == len(after)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    # and the sharded state still steps
    s2, aux = step(sharded, pmesh.shard_batch(batch, m), jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(aux["Loss"]))
