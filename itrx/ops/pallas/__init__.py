"""Pallas TPU kernels: routing gate, mesh context, and dispatch telemetry.

``pallas_call`` does not GSPMD-partition: inside a mesh-sharded jit a bare
kernel would fail to lower or be replicated behind all-gathers.  Multi-device
runs therefore route the kernels through ``jax.shard_map`` wrappers (each
kernel module exposes a ``*_sharded`` variant) — the batch/caption/image grid
axes are embarrassingly parallel, so each chip runs the kernel on its shard
and the custom-VJP backward psums the replicated-weight cotangents
automatically (shard_map transpose).

Because the shard_map wrappers need the concrete mesh at trace time, callers
that jit mesh-sharded computations enter ``shard_ctx(mesh)`` around the
traced body (make_train_step, the eval engine's sim functions).  With no
active mesh and more than one device, ``pallas_ok()`` stays False and the
XLA paths (which partition cleanly under GSPMD) are used.

``force_interpret()`` lets the CPU test suite execute the real kernel
routing in Pallas interpret mode (8-device virtual mesh), asserting both
that the fused path ran (``dispatch_counts``) and that its numbers match
the XLA path.
"""

from __future__ import annotations

import contextlib
import threading

import jax

_state = threading.local()


def _get(name, default=None):
    return getattr(_state, name, default)


@contextlib.contextmanager
def shard_ctx(mesh):
    """Trace-time context: the mesh the kernel call sites shard_map over.

    mesh=None is a no-op (single-device routing).  Entered inside jitted
    bodies (trace time only), so the routing decision is baked into the
    compiled executable.
    """
    prev = _get("mesh")
    _state.mesh = mesh
    try:
        yield
    finally:
        _state.mesh = prev


@contextlib.contextmanager
def force_interpret(dot_dtype: str | None = None):
    """Route fused kernels on any backend, in Pallas interpret mode (tests).

    dot_dtype optionally overrides the kernels' matmul dtype (the GRU's
    production default is bf16; exactness tests pin 'float32')."""
    prev = _get("interpret", False)
    prev_dot = _get("dot_dtype")
    _state.interpret = True
    _state.dot_dtype = dot_dtype
    try:
        yield
    finally:
        _state.interpret = prev
        _state.dot_dtype = prev_dot


def interpret_mode() -> bool:
    return bool(_get("interpret", False))


def dot_dtype_override() -> str | None:
    return _get("dot_dtype")


def active_mesh():
    """The mesh from the innermost shard_ctx, or None."""
    return _get("mesh")


def pallas_ok() -> bool:
    """True when the fused Pallas kernels may be routed to.

    Single device: always (on a TPU backend).  Multiple devices: only under
    an active shard_ctx mesh, whose 'dp' axis the kernel call sites
    shard_map over.  force_interpret() overrides the backend check so the
    CPU suite can execute the kernels in interpret mode.
    """
    if not interpret_mode() and jax.default_backend() in ("cpu", "gpu"):
        return False
    if jax.device_count() == 1 or interpret_mode():
        # interpret mode executes the kernels as plain jax ops, which are
        # safe on any device count (shard_ctx still selects the shard_map
        # wrappers when a mesh is active)
        return True
    mesh = active_mesh()
    return mesh is not None and "dp" in mesh.shape


def shard_mesh():
    """The mesh to shard_map over, or None for direct (single-device) calls.

    A 1-device mesh routes direct: shard_map would only add overhead.
    """
    mesh = active_mesh()
    if mesh is not None and mesh.size > 1 and "dp" in mesh.shape:
        return mesh
    return None


# -- dispatch telemetry (trace-time counters; one increment per compile) ----

_counts: dict[str, int] = {}


def record_dispatch(name: str) -> None:
    _counts[name] = _counts.get(name, 0) + 1


def dispatch_counts() -> dict[str, int]:
    return dict(_counts)


def reset_dispatch() -> None:
    _counts.clear()
