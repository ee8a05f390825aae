"""The real prover on an 8-device mesh must produce a proof byte-identical
to the single-chip prover's, and that proof must verify with the
unchanged host verifier (VERDICT round-1 item 4; SURVEY.md §2
'Parallelism strategies')."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from powdr_tpu.field import babybear as bb
from powdr_tpu.ir import expression as ir
from powdr_tpu.parallel.ntt import AXIS
from powdr_tpu.parallel.prover import prove_on_mesh
from powdr_tpu.stark import prover, serialize, verifier
from powdr_tpu.stark.air import Air, Interaction
from powdr_tpu.stark.challenger import Challenger
from powdr_tpu.stark.config import StarkConfig

CFG = StarkConfig(log_blowup=1, num_queries=4, proof_of_work_bits=1, log_final_poly_len=0)


def _chips(rng, log_n=6):
    n = 1 << log_n
    m = n // 4
    a = np.tile(
        rng.integers(0, bb.P, size=m, dtype=np.uint64).astype(np.uint32), n // m
    )
    b_ = rng.integers(0, bb.P, size=n, dtype=np.uint64).astype(np.uint32)
    c = (a.astype(np.uint64) * b_ % bb.P).astype(np.uint32)
    big = Air(
        width=3,
        constraints=[ir.Sub(ir.Mul(ir.Col(0), ir.Col(1)), ir.Col(2))],
        interactions=[Interaction(bus_id=7, mult=ir.Const(1), args=[ir.Col(0)])],
        name="mul",
    )
    small = Air(
        width=2,
        constraints=[],
        interactions=[
            Interaction(bus_id=7, mult=ir.Sub(ir.Const(0), ir.Col(1)), args=[ir.Col(0)])
        ],
        name="table",
    )
    big_trace = bb.to_mont(jnp.asarray(np.stack([a, b_, c], axis=1)))
    small_trace = bb.to_mont(
        jnp.asarray(np.stack([a[:m], np.full(m, n // m, dtype=np.uint32)], axis=1))
    )
    return [big, small], [(big, big_trace), (small, small_trace)]


@pytest.mark.slow
def test_prove_on_mesh_bit_exact_and_verifies(rng):
    airs, chips = _chips(rng)
    mesh = Mesh(np.array(jax.devices()[:8]), (AXIS,))

    single = prover.prove(chips, CFG, Challenger())
    sharded = prove_on_mesh(chips, CFG, Challenger(), mesh)

    # byte-identical proofs: the mesh changes layout, never values
    assert serialize.proof_to_bytes(sharded) == serialize.proof_to_bytes(single)

    # and the sharded proof passes the unchanged host verifier
    verifier.verify(airs, sharded, CFG, Challenger())


def test_prove_on_mesh_large_chip_actually_sharded(rng):
    """The big chip's committed LDE must really be distributed (not
    replicated): each device holds a distinct row slab."""
    from powdr_tpu.parallel import pcs as ppcs

    airs, chips = _chips(rng)
    mesh = Mesh(np.array(jax.devices()[:8]), (AXIS,))
    assert ppcs.shardable(mesh, 6) and not ppcs.shardable(mesh, 4)

    trace = jax.device_put(
        chips[0][1],
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(AXIS, None)),
    )
    cm = ppcs.commit_sharded(trace, CFG, mesh)
    shard_rows = {s.index[0] for s in cm.lde.addressable_shards}
    assert len(shard_rows) == 8, "LDE is not row-distributed across the mesh"
    np.testing.assert_array_equal(
        np.asarray(cm.lde),
        np.asarray(__import__("powdr_tpu.stark.pcs", fromlist=["commit"]).commit(chips[0][1], CFG).lde),
    )
