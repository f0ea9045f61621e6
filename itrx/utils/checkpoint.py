"""Checkpoint save/load with reference semantics.

Reference: itr/utils.py:35-61 + train.py:65-72 — a checkpoint carries
{epoch, model state, best_rsum, best_r1, config, Eiters}; evaluation rebuilds
the model entirely from the embedded config (evaluation.py:269-279); resume
re-imposes the `load_hyperparams` whitelist (utils.py:35-54).

Reference bug #2 (SURVEY.md §2.11) — epoch-end checkpoints storing 'best_rl'
while resume reads 'best_r1' — is fixed: the key is always 'best_r1'.

Format: a msgpack-serialized flax pytree of numpy arrays + a JSON config,
wrapped in one file.
"""

from __future__ import annotations

import json
import os
import struct

import jax
import numpy as np
from flax import serialization

_MAGIC = b"ITRXCKPT"


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state_dict: dict, config: dict, filename: str):
    """state_dict: {params, batch_stats, opt_state?, epoch, best_rsum, best_r1, Eiters}."""
    meta = {
        "epoch": int(state_dict.get("epoch", 0)),
        "best_rsum": float(state_dict.get("best_rsum", 0.0)),
        "best_r1": float(state_dict.get("best_r1", 0.0)),
        "Eiters": int(state_dict.get("Eiters", 0)),
        "config": {k: v for k, v in config.items()},
    }
    arrays = {
        "params": _to_numpy(state_dict["params"]),
        "batch_stats": _to_numpy(state_dict.get("batch_stats", {})),
    }
    if state_dict.get("opt_state") is not None:
        from flax import serialization as _ser

        arrays["opt_state"] = _to_numpy(
            _ser.to_state_dict(state_dict["opt_state"])
        )
    blob = serialization.msgpack_serialize(arrays)
    meta_blob = json.dumps(meta, default=str).encode("utf-8")
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(meta_blob)))
        f.write(meta_blob)
        f.write(blob)
    os.replace(tmp, filename)
    return filename


def load_checkpoint(filename: str) -> dict:
    with open(filename, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{filename} is not an itrx checkpoint")
        (meta_len,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(meta_len).decode("utf-8"))
        arrays = serialization.msgpack_restore(f.read())
    out = dict(meta)
    out.update(arrays)
    return out


def save_train_checkpoint(
    state, config, epoch, best_rsum, best_r1, is_best,
    filename="checkpoint.itrx", prefix="", is_epo_end=False,
):
    """Mirror of ref save_checkpoint (utils.py:57-61): epoch-end + best files.

    On a multi-host pod only process 0 writes (params/opt state are
    dp-replicated, so its copy is complete); sharded tp state goes through
    the orbax path below instead."""
    if jax.process_index() != 0:
        return []
    sd = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": epoch,
        "best_rsum": best_rsum,
        "best_r1": best_r1,
        "Eiters": int(state.step),
    }
    written = []
    if is_epo_end:
        written.append(
            save_checkpoint(sd, config, os.path.join(prefix, f"epo{epoch}_{filename}"))
        )
    if is_best:
        written.append(
            save_checkpoint(sd, config, os.path.join(prefix, "model_best.itrx"))
        )
    return written


# --------------------------------------------------------------------------
# Sharded (multi-host) checkpointing via orbax.
#
# The msgpack format above gathers everything to host numpy — correct on one
# host, but on a multi-host pod each process only holds its shard of a
# jax.Array.  The orbax path writes each shard from its owning host and
# restores distributed arrays directly into a target sharding, so tp/dp
#-sharded TrainStates round-trip without ever materializing on one host.
# --------------------------------------------------------------------------


def save_checkpoint_sharded(state_dict: dict, config: dict, ckpt_dir: str):
    """Save {params, batch_stats, ...} (possibly sharded jax.Arrays) with
    orbax.  `ckpt_dir` is a directory; metadata lands in meta.json."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    tree = {
        "params": state_dict["params"],
        "batch_stats": state_dict.get("batch_stats") or {},
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, "arrays"), tree, force=True)
    meta = {
        "epoch": int(state_dict.get("epoch", 0)),
        "best_rsum": float(state_dict.get("best_rsum", 0.0)),
        "best_r1": float(state_dict.get("best_r1", 0.0)),
        "Eiters": int(state_dict.get("Eiters", 0)),
        "config": {k: v for k, v in config.items()},
    }
    if jax.process_index() == 0:
        with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
            json.dump(meta, f, default=str)
    return ckpt_dir


def load_checkpoint_sharded(ckpt_dir: str, target=None) -> dict:
    """Restore an orbax checkpoint.  With `target` (a pytree of jax.Arrays or
    ShapeDtypeStructs carrying shardings) arrays restore distributed into that
    layout; without it they restore as host-replicated arrays."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None)),
                target,
            )
            tree = ckptr.restore(os.path.join(ckpt_dir, "arrays"), abstract)
        else:
            tree = ckptr.restore(os.path.join(ckpt_dir, "arrays"))
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    out = dict(meta)
    out.update(tree)
    return out
