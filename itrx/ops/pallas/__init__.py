"""Pallas TPU kernels and their routing gate."""

import jax


def pallas_ok() -> bool:
    """True when the fused Pallas kernels may be routed to.

    Requires a TPU backend AND a single device: ``pl.pallas_call`` does not
    SPMD-partition under GSPMD, so inside a mesh-sharded jit a kernel would
    either fail to lower or be replicated with all-gathered operands.
    Multi-chip runs keep the XLA paths (which partition cleanly) until the
    kernels are wrapped in shard_map.
    """
    return (
        jax.default_backend() not in ("cpu", "gpu")
        and jax.device_count() == 1
    )
