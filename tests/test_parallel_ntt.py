"""Sharded four-step NTT vs the single-chip implementation (8-device CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from powdr_tpu.field import babybear as bb
from powdr_tpu import ntt as ntt1
from powdr_tpu.parallel import ntt as pntt


def _mesh(d=8):
    return Mesh(np.array(jax.devices()[:d]), (pntt.AXIS,))


def _shard(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, P(pntt.AXIS)))


def test_sharded_ntt_matches_single(rng):
    mesh = _mesh()
    log_n = 10
    x = rng.integers(0, bb.P, size=1 << log_n, dtype=np.uint64).astype(np.uint32)
    xm = _shard(jnp.asarray(x), mesh)
    fn = pntt.make_sharded_ntt(mesh, log_n)
    got = np.asarray(fn(xm))
    expect = np.asarray(ntt1.ntt(jnp.asarray(x)))
    np.testing.assert_array_equal(got, expect)


def test_sharded_intt_roundtrip(rng):
    mesh = _mesh()
    log_n = 9
    x = rng.integers(0, bb.P, size=1 << log_n, dtype=np.uint64).astype(np.uint32)
    xm = _shard(jnp.asarray(x), mesh)
    fwd = pntt.make_sharded_ntt(mesh, log_n)
    inv = pntt.make_sharded_ntt(mesh, log_n, inverse=True)
    back = np.asarray(inv(fwd(xm)))
    np.testing.assert_array_equal(back, x)


def test_sharded_coset_lde_matches_single(rng):
    mesh = _mesh()
    log_n, log_blowup = 8, 2
    x = rng.integers(0, bb.P, size=1 << log_n, dtype=np.uint64).astype(np.uint32)
    xm = _shard(jnp.asarray(x), mesh)
    fn = pntt.make_sharded_coset_lde(mesh, log_n, log_blowup)
    got = np.asarray(fn(xm))
    expect = np.asarray(ntt1.coset_lde(jnp.asarray(x), log_blowup))
    np.testing.assert_array_equal(got, expect)
