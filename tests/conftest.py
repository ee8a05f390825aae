"""Test configuration: force an 8-device virtual CPU mesh.

The container boots every python process with the `axon` PJRT plugin
(sitecustomize sets jax_platforms="axon,cpu"), which tunnels each dispatch
to the single real TPU chip — ~10ms per eager op.  Tests exercise
correctness and sharding semantics, so they run on a local 8-device
virtual CPU platform; bench.py is the only entry point that should use the
real chip.  The axon plugin registers at interpreter boot, so we override
jax_platforms and clear the already-initialized backends here."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import hashlib
import platform

import jax


def _machine_tag() -> str:
    """Key the persistent compile cache by host CPU features: XLA:CPU AOT
    entries compiled on one machine can fail to load (or force recompiles)
    on another — round 3's driver run lost its whole budget to exactly
    that (MULTICHIP_r03 tail: 'machine feature mismatch')."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    h = hashlib.sha256((platform.machine() + flags).encode()).hexdigest()[:12]
    return f"cpu-{h}"


jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", f"/root/repo/.jax_cache/{_machine_tag()}")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.4)
from jax.extend.backend import clear_backends

clear_backends()
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xB0BBEA12)
