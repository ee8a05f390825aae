"""Test configuration: force an 8-device virtual CPU mesh.

Tests exercise correctness and sharding semantics on CPU (fast iteration,
deterministic); the real TPU chip is reserved for bench.py.  Env vars must be
set before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xB0BBEA12)
