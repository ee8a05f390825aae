"""Multi-process JAX: the N-host simulation axis (SURVEY.md §4 — 'multi-
process JAX on a single host for N-host simulation').

Two OS processes, each with two virtual CPU devices, form one global
4-device mesh through jax.distributed; the sharded four-step NTT runs
over it, exercising the cross-process (DCN-path) collectives — the
all-to-all stage exchange and the psum reduction — and the result is
checked bit-exact against the single-process NTT."""
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from powdr_tpu.field import babybear as bb
from powdr_tpu.parallel.ntt import AXIS, make_sharded_ntt
from powdr_tpu.ntt import ntt as single_ntt

log_n = 12
n = 1 << log_n
devs = jax.devices()
assert len(devs) == 2 * nproc, devs
mesh = Mesh(np.array(devs), (AXIS,))

# deterministic global input, built shard-local via make_array_from_callback
rng = np.random.default_rng(7)
x_host = rng.integers(0, bb.P, size=n, dtype=np.uint64).astype(np.uint32)
sharding = NamedSharding(mesh, P(AXIS))
x = jax.make_array_from_callback(
    (n,), sharding, lambda idx: jnp.asarray(x_host[idx])
)

fn = make_sharded_ntt(mesh, log_n)
y = fn(x)
from jax.experimental.multihost_utils import process_allgather
y_all = process_allgather(y, tiled=True)
if pid == 0:
    want = np.asarray(single_ntt(jnp.asarray(x_host)))
    got = np.asarray(y_all)
    assert got.shape == want.shape, (got.shape, want.shape)
    assert (got == want).all(), "multi-process sharded NTT mismatch"
    print("MULTIPROC_NTT_OK", flush=True)
"""


def test_two_process_sharded_ntt(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = "29517"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    assert procs[0].returncode == 0, outs[0][-2000:]
    assert procs[1].returncode == 0, outs[1][-2000:]
    assert "MULTIPROC_NTT_OK" in outs[0], outs[0][-2000:]
