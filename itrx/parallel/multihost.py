"""Multi-host (TPU pod / multi-process) entry point.

The reference never initializes a distributed backend (SURVEY.md §2.10:
`NCCL_DEBUG=INFO` is set in train.py:15 but nothing is launched).  The
TPU-native equivalent named by SURVEY.md §5 is `jax.distributed.initialize`
plus per-host data loading: one Python process per host, every process sees
the same program, `jax.devices()` returns the global device list, and the
global `Mesh` spans hosts — XLA routes dp collectives over ICI within a
slice and DCN across slices.

Data contract: the precomp feature files are mmap'd (`itrx/data/precomp.py`),
so although every host *opens* the full dataset, slicing only this host's
rows of each global batch faults in only those pages — per-host data
loading without a distributed sampler.  `global_batch` then assembles the
host-local rows into one global jax.Array per field via
`jax.make_array_from_process_local_data`.

Evaluation stays host-local by design (each host scores the full split on
its own chips — cheap next to training and avoids cross-process
device_put of the caption tiles); checkpoint writes are already gated to
process 0 (itrx/utils/checkpoint.py).

Validated by tests/test_multihost.py: two coordinated CPU processes (4
virtual devices each) train dp=8 steps whose losses match the
single-process 8-device mesh bitwise.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(config: dict | None = None) -> tuple[int, int]:
    """Bring up jax.distributed from config keys or the environment.

    Config keys (all optional; also settable as env vars by a launcher):
      coordinator_address  host:port of process 0
      num_processes        total process count
      process_id           this process's rank

    With none of them set on Cloud TPU pods, `jax.distributed.initialize()`
    auto-detects everything from the TPU metadata.  Idempotent: a second
    call (or a single-process run with no coordinator configured) is a
    no-op.  Returns (process_index, process_count).
    """
    cfg = config or {}
    if not jax.distributed.is_initialized():
        addr = cfg.get("coordinator_address")
        nproc = cfg.get("num_processes")
        pid = cfg.get("process_id")
        if addr is not None:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        elif cfg.get("multihost"):
            # pod auto-detection path (TPU metadata / launcher env vars)
            jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def host_rows(n: int) -> slice:
    """This host's contiguous row block of a global batch of n rows.

    n must divide evenly by process_count (the static-shape batcher already
    drops ragged tails, and fit() checks batch_size % dp == 0).
    """
    pc = jax.process_count()
    per = n // pc
    pi = jax.process_index()
    return slice(pi * per, (pi + 1) * per)


def global_batch(batch: dict, mesh) -> dict:
    """Assemble a global dp-sharded batch from host-local rows.

    Each process passes the SAME host-level batch dict (identically seeded
    — the batcher is deterministic in (seed, epoch)); only this host's row
    block is touched, and `make_array_from_process_local_data` stitches the
    blocks into one global jax.Array per field without any host gathering.
    """
    if jax.process_count() == 1:
        from .mesh import shard_batch

        return shard_batch(batch, mesh)
    sh = NamedSharding(mesh, P("dp"))
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        rows = host_rows(v.shape[0])
        out[k] = jax.make_array_from_process_local_data(sh, v[rows])
    return out


def local_mesh():
    """A mesh over only this host's devices (host-local eval)."""
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.local_devices()), axis_names=("dp",))
