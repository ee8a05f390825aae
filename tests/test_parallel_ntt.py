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


def test_sharded_commit_bit_identical(rng):
    """Sharded commitment root must equal the single-chip commitment —
    the basis for mesh-sharded proofs verifying against the unchanged
    verifier."""
    from powdr_tpu.parallel.pcs import commit_sharded
    from powdr_tpu.stark import pcs
    from powdr_tpu.stark.config import StarkConfig

    cfg = StarkConfig(log_blowup=2)
    mesh = _mesh()
    n, w = 1 << 8, 3
    evals = jnp.asarray(rng.integers(0, bb.P, size=(n, w), dtype=np.uint64).astype(np.uint32))
    single = pcs.commit(evals, cfg)
    sharded = commit_sharded(evals, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(single.root), np.asarray(sharded.root))
    np.testing.assert_array_equal(np.asarray(single.lde), np.asarray(sharded.lde))


def test_sharded_commit_in_real_proof(rng):
    """Swap sharded commitments into a real prove/verify roundtrip."""
    from powdr_tpu.ir import expression as ir
    from powdr_tpu.parallel.pcs import commit_sharded
    from powdr_tpu.stark import pcs as pcs_mod
    from powdr_tpu.stark import prover, verifier
    from powdr_tpu.stark.air import Air
    from powdr_tpu.stark.challenger import Challenger
    from powdr_tpu.stark.config import StarkConfig

    cfg = StarkConfig(log_blowup=2, num_queries=6, proof_of_work_bits=2)
    mesh = _mesh()
    orig_commit = pcs_mod.commit
    try:
        def patched(evals, config, shift_pow=0):
            if evals.shape[0] >= 256 and evals.shape[0] % 64 == 0:
                return commit_sharded(evals, config, mesh, shift_pow)
            return orig_commit(evals, config, shift_pow)

        pcs_mod.commit = patched
        prover.pcs.commit = patched
        c0, c1 = ir.Col(0), ir.Col(1)
        air = Air(
            width=2,
            constraints=[ir.Mul(ir.IsTransition(), ir.Sub(ir.Col(1, rot=1), ir.Add(c0, c1)))],
            name="shard-demo",
        )
        n = 256
        a, b = 1, 1
        rows = []
        for _ in range(n):
            rows.append((a, b))
            a, b = b, (a + b) % bb.P
        # fix col0' = col1 as well so the transition holds
        air.constraints.append(ir.Mul(ir.IsTransition(), ir.Sub(ir.Col(0, rot=1), c1)))
        trace = bb.to_mont(jnp.asarray(np.array(rows, dtype=np.uint32)))
        proof = prover.prove([(air, trace)], cfg, Challenger())
        verifier.verify([air], proof, cfg, Challenger())
    finally:
        pcs_mod.commit = orig_commit
        prover.pcs.commit = orig_commit
