"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding tests (SURVEY.md §4) need N devices; we simulate them with
`--xla_force_host_platform_device_count` so the suite runs anywhere.  Must be
set before jax initializes a backend.
"""

import os

# The environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel); tests must
# force CPU to get the virtual 8-device mesh and fp32 matmul oracles.
os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()
# fp32 matmuls on CPU for oracle comparisons
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

import jax

# the axon sitecustomize force-registers the TPU backend and sets
# jax_platforms='axon'; override it after import so tests stay on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: many-minute convergence/e2e runs; quick iteration excludes "
        "them with -m 'not slow' (the full default run keeps them)",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
