"""Explicitly sharded downstream prover stages (VERDICT r3 #6).

The perm-trace and quotient kernels run under shard_map with explicit
collectives (halo ppermute for next-row rotations, all_gather prefix for
the LogUp running sum, sharded four-step NTTs for the quotient
interpolation) — and must be bit-identical to the single-device stages
on a REAL guest chip set (addi/bne/halt loop: next-row references,
preprocessed program chip, periphery range table included).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from powdr_tpu.field import babybear as bb
from powdr_tpu.parallel.ntt import AXIS
from powdr_tpu.stark import air as air_mod
from powdr_tpu.stark import prover
from powdr_tpu.stark.config import StarkConfig

CFG = StarkConfig(log_blowup=2, num_queries=4, proof_of_work_bits=1, log_final_poly_len=0)


@pytest.fixture(scope="module")
def guest_chips():
    from powdr_tpu.vm import isa, machines, system
    from powdr_tpu.vm.executor import Executor, assemble
    from powdr_tpu.vm.prove import compile_chip
    from powdr_tpu.vm.system import build_chips

    old = (isa.USE_BITWISE_FOR_BYTE_RANGE, isa.DT_BITS, system.MAX_RANGE_BITS)
    isa.USE_BITWISE_FOR_BYTE_RANGE = False
    isa.DT_BITS = 12
    system.MAX_RANGE_BITS = 12
    machines.rebuild_registry()
    prog = assemble([
        ("addi", 1, 0, 0, 300),
        ("addi", 3, 0, 0, 0),
        "loop:",
        ("addi", 3, 3, 0, 1),
        ("bne", 0, 3, 1, "loop"),
        ("halt",),
    ])
    res = Executor(prog, {}).run()
    chips = [compile_chip(c) for c in build_chips(prog, res)]
    yield chips
    isa.USE_BITWISE_FOR_BYTE_RANGE, isa.DT_BITS, system.MAX_RANGE_BITS = old
    machines.rebuild_registry()


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), (AXIS,))


def _big_chips(guest_chips):
    """Chips tall enough to shard 8 ways (includes the 2^12 range table)."""
    return [(a, t) for a, t in guest_chips if t.shape[0] >= 256 and a.interactions]


def test_sharded_perm_bit_exact(guest_chips, mesh):
    from powdr_tpu.parallel.perm import build_perm_trace_sharded

    alpha = (3, 1, 4, 1)
    beta = (2, 7, 1, 8)
    alpha_m = bb.to_mont(jnp.asarray(np.array(alpha, dtype=np.uint32)))
    beta_m = bb.to_mont(jnp.asarray(np.array(beta, dtype=np.uint32)))
    checked = 0
    for a, t in _big_chips(guest_chips):
        groups = air_mod.batch_interactions(a, CFG.bus_interaction_degree)
        pre = (
            bb.to_mont(jnp.asarray(a.preprocessed.astype(np.uint32)))
            if a.preprocessed is not None
            else None
        )
        perm_s, tot_s = build_perm_trace_sharded(
            a, t, groups, alpha_m, beta_m, mesh, pre_trace=pre
        )
        perm_1, tot_1 = prover.build_perm_trace(
            a, t, groups, alpha, beta, pre_trace=pre, defer_total=True
        )
        np.testing.assert_array_equal(np.asarray(perm_s), np.asarray(perm_1))
        np.testing.assert_array_equal(np.asarray(tot_s), np.asarray(tot_1))
        checked += 1
    assert checked >= 2  # at least an instruction chip + the range table


@pytest.mark.slow
def test_sharded_quotient_bit_exact(guest_chips, mesh):
    from powdr_tpu.parallel.quotient import compute_quotient_sharded
    from powdr_tpu.stark.air import (
        ALPHA_LOGUP, BETA_LOGUP, TOTAL_LOGUP, batch_interactions, logup_constraints,
    )
    from powdr_tpu.stark import pcs

    alpha = (3, 1, 4, 1)
    beta = (2, 7, 1, 8)
    alpha_q = (9, 2, 6, 5)
    checked = 0
    for a, t in _big_chips(guest_chips):
        log_n = int(np.log2(t.shape[0]))
        if log_n < 9:  # sharded four-step needs 8 | n1 and 8 | n2 at N and n
            continue
        groups = batch_interactions(a, CFG.bus_interaction_degree)
        pre = (
            bb.to_mont(jnp.asarray(a.preprocessed.astype(np.uint32)))
            if a.preprocessed is not None
            else None
        )
        perm, total = prover.build_perm_trace(a, t, groups, alpha, beta, pre_trace=pre)
        main_cm = pcs.commit(t, CFG)
        perm_cm = pcs.commit(perm, CFG)
        pre_cm = pcs.commit(pre, CFG) if pre is not None else None
        logup_cons, _ = logup_constraints(a, groups)
        challenges = {ALPHA_LOGUP: alpha, BETA_LOGUP: beta, TOTAL_LOGUP: total}
        q1 = prover.compute_quotient(
            a, logup_cons, main_cm.lde, perm_cm.lde, challenges, alpha_q,
            log_n, CFG, lde_pre=pre_cm.lde if pre_cm else None,
        )
        ch_m = {
            k: bb.to_mont(jnp.asarray(np.array(v, dtype=np.uint32)))
            for k, v in challenges.items()
        }
        aq_m = bb.to_mont(jnp.asarray(np.array(alpha_q, dtype=np.uint32)))
        qs = compute_quotient_sharded(
            a, tuple(logup_cons), main_cm.lde, perm_cm.lde, ch_m, aq_m,
            log_n, CFG, mesh, lde_pre=pre_cm.lde if pre_cm else None,
        )
        np.testing.assert_array_equal(np.asarray(qs), np.asarray(q1))
        checked += 1
    assert checked >= 2


@pytest.mark.slow
def test_prove_on_mesh_sharded_downstream_bit_exact(guest_chips, mesh):
    """`prove_on_mesh(downstream="sharded")` on the REAL guest chip set:
    perm + quotient run through the explicit shard_map kernels on every
    chip tall enough (incl. the 2^12 range table), periphery chips fall
    back, and the proof is byte-identical to the single-device prover's
    and verifies with the unchanged host verifier (VERDICT r3 #6)."""
    from powdr_tpu.parallel.prover import prove_on_mesh
    from powdr_tpu.stark import serialize, verifier
    from powdr_tpu.stark.challenger import Challenger

    single = prover.prove(guest_chips, CFG, Challenger())
    sharded = prove_on_mesh(
        guest_chips, CFG, Challenger(), mesh, downstream="sharded"
    )
    assert serialize.proof_to_bytes(sharded) == serialize.proof_to_bytes(single)
    verifier.verify([a for a, _ in guest_chips], sharded, CFG, Challenger())
