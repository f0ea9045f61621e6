"""Optimizer schedule / freezing / checkpoint round-trip tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from itrx.train.state import step_decay_schedule, make_optimizer
from itrx.utils.checkpoint import load_checkpoint, save_checkpoint


def test_step_decay_schedule():
    # lr = base * 0.1^(epoch // lr_update), epoch = step // steps_per_epoch
    # (ref utils.py:25-32)
    sched = step_decay_schedule(2e-4, steps_per_epoch=100, lr_update=15)
    np.testing.assert_allclose(float(sched(0)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100 * 14)), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100 * 15)), 2e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100 * 30)), 2e-6, rtol=1e-6)


def test_frozen_bert_gets_no_updates():
    params = {
        "txt_enc": {
            "bert": {"w": jnp.ones((4, 4))},
            "head": {"w": jnp.ones((4, 4))},
        }
    }
    cfg = {"learning_rate": 1e-2, "lr_update": 10, "grad_clip": 2.0}
    tx = make_optimizer(cfg, steps_per_epoch=10, params=params)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["txt_enc"]["bert"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["txt_enc"]["head"]["w"]).sum()) > 0.0


def test_grad_clipping_applied():
    params = {"w": jnp.zeros((3,))}
    cfg = {"learning_rate": 1.0, "lr_update": 1000, "grad_clip": 2.0}
    tx = make_optimizer(cfg, steps_per_epoch=10, params=params)
    opt_state = tx.init(params)
    big = {"w": jnp.asarray([100.0, 0.0, 0.0])}
    updates, _ = tx.update(big, opt_state, params)
    # after clip to norm 2 and adam normalization, update magnitude ~ lr
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3)}
    bs = {"bn": {"mean": np.zeros(3, np.float32)}}
    config = {"name": "SCAN", "embed_size": 1024, "tail": None}
    path = str(tmp_path / "ck.itrx")
    save_checkpoint(
        {"params": params, "batch_stats": bs, "epoch": 3, "best_rsum": 12.5,
         "best_r1": 4.5, "Eiters": 77},
        config, path,
    )
    ck = load_checkpoint(path)
    assert ck["epoch"] == 3 and ck["Eiters"] == 77
    assert ck["best_rsum"] == 12.5 and ck["best_r1"] == 4.5
    assert ck["config"]["name"] == "SCAN"
    np.testing.assert_array_equal(ck["params"]["a"], params["a"])
    np.testing.assert_array_equal(ck["batch_stats"]["bn"]["mean"], bs["bn"]["mean"])


def test_checkpoint_rejects_garbage(tmp_path):
    p = tmp_path / "bad.itrx"
    p.write_bytes(b"not a checkpoint at all")
    try:
        load_checkpoint(str(p))
        assert False, "should have raised"
    except ValueError as e:
        assert "not an itrx checkpoint" in str(e)


def test_resume_restores_optimizer_schedule(tmp_path):
    """A resumed run must continue the LR decay, not reset it (review fix)."""
    import optax
    from itrx.train.state import TrainState, make_optimizer
    from flax import serialization

    params = {"w": jnp.ones((4,))}
    cfg = {"learning_rate": 1e-2, "lr_update": 1, "grad_clip": 2.0}
    tx = make_optimizer(cfg, steps_per_epoch=2, params=params)
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    for _ in range(4):  # 2 epochs -> lr decayed by 0.1^2
        updates, opt_state = tx.update(grads, opt_state, params)

    # round-trip through the checkpoint format
    path = str(tmp_path / "ck.itrx")
    save_checkpoint(
        {"params": params, "opt_state": opt_state, "epoch": 2,
         "best_rsum": 0, "best_r1": 0, "Eiters": 4},
        {"name": "SCAN"}, path,
    )
    ck = load_checkpoint(path)
    restored = serialization.from_state_dict(tx.init(params), ck["opt_state"])
    u_restored, _ = tx.update(grads, restored, params)
    u_fresh, _ = tx.update(grads, tx.init(params), params)
    # decayed LR -> much smaller update than a fresh optimizer's
    assert float(jnp.abs(u_restored["w"]).max()) < 0.2 * float(
        jnp.abs(u_fresh["w"]).max()
    )


def test_orbax_sharded_checkpoint_roundtrip(tmp_path):
    """tp-sharded params round-trip through the orbax path, restoring
    directly into the target sharding (multi-host-safe layout)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from itrx.parallel import mesh as pmesh
    from itrx.utils.checkpoint import (
        load_checkpoint_sharded, save_checkpoint_sharded,
    )

    m = pmesh.make_mesh({"mesh_shape": {"dp": 4, "tp": 2}})
    params = {
        "enc": {"kernel": jnp.arange(64 * 32, dtype=jnp.float32).reshape(64, 32),
                "bias": jnp.ones((32,))},
    }
    sharded = pmesh.shard_params(params, m)
    d = tmp_path / "ckpt"
    save_checkpoint_sharded(
        {"params": sharded, "epoch": 7, "best_rsum": 1.5, "Eiters": 42},
        {"name": "SCAN"}, str(d),
    )
    ck = load_checkpoint_sharded(str(d), target={"params": sharded, "batch_stats": {}})
    assert ck["epoch"] == 7 and ck["Eiters"] == 42
    k = ck["params"]["enc"]["kernel"]
    assert k.sharding == sharded["enc"]["kernel"].sharding
    np.testing.assert_array_equal(np.asarray(k), np.asarray(params["enc"]["kernel"]))
    # and a shardless restore still yields the data
    ck2 = load_checkpoint_sharded(str(d))
    np.testing.assert_array_equal(
        np.asarray(ck2["params"]["enc"]["bias"]), np.ones((32,))
    )
