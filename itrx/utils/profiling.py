"""Profiling and phase timing (SURVEY.md §5: the reference has only
wall-clock AverageMeters; here: jax.profiler traces + phase timers with
host-transfer synchronization).

NOTE on this environment: under the axon TPU relay `block_until_ready` does
not synchronize, so `device_sync` transfers a scalar to host as the barrier.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def device_sync(x=None):
    """True device synchronization: host transfer of (a piece of) x."""
    if x is None:
        x = jnp.zeros(())
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf))


class PhaseTimer:
    """Accumulates wall-clock per named phase; `report()` pretty-prints."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            device_sync(sync_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self):
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} total {total:8.3f}s  n={n:5d}  avg {total / n * 1000:8.2f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
