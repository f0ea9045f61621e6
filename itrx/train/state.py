"""Train state + optimizer assembly.

Reference semantics: one Adam over all trainable params with grad-norm
clipping at 2.0 (itr/modalmodule/Models.py train_emb) and step-decay LR
`base * 0.1^(epoch // lr_update)` applied at epoch boundaries
(itr/utils.py:25-32).  Here the decay is a pure function of the optimizer
step count (steps_per_epoch is known at setup), so the whole update stays
inside one jitted step.

Frozen parameter subtrees (the BERT towers in SAEM/CAMERA, ref
TextEncoder.py:154-157) are masked out of the optimizer with
`optax.multi_transform`, which also avoids allocating Adam moments for them.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # Eiters

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def step_decay_schedule(base_lr: float, steps_per_epoch: int, lr_update: int):
    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * jnp.power(0.1, epoch // lr_update)

    return schedule


def is_frozen_path(path) -> bool:
    """True for parameter subtrees that must not be optimized (BERT towers)."""
    return any(getattr(k, "key", None) == "bert" for k in path)


def make_optimizer(
    config: dict, steps_per_epoch: int, params=None
) -> optax.GradientTransformation:
    schedule = step_decay_schedule(
        config["learning_rate"], steps_per_epoch, config["lr_update"]
    )
    opt = optax.chain(
        optax.clip_by_global_norm(config["grad_clip"]),
        optax.adam(learning_rate=schedule),
    )
    if params is not None:
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if is_frozen_path(path) else "train", params
        )
        if any(l == "frozen" for l in jax.tree.leaves(labels)):
            opt = optax.multi_transform(
                {"train": opt, "frozen": optax.set_to_zero()}, labels
            )
    return opt


def create_train_state(model, config: dict, sample_batch, steps_per_epoch: int):
    rng = jax.random.PRNGKey(config["seed"])
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init(
        {"params": p_rng, "dropout": d_rng}, sample_batch, train=True
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config, steps_per_epoch, params)
    return (
        TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        ),
        tx,
    )
