"""Verifier-cost profile tests (recursion groundwork).

The profile instruments a real verification run, so these tests also
pin the verifier's asymptotics: Merkle work must scale linearly with the
query count, and every cost category must be exercised by a real proof."""
import numpy as np
import jax.numpy as jnp

from powdr_tpu.field import babybear as bb
from powdr_tpu.ir import expression as ir
from powdr_tpu.stark import prover, verifier
from powdr_tpu.stark.air import Air
from powdr_tpu.stark.challenger import Challenger
from powdr_tpu.stark.config import StarkConfig
from powdr_tpu.stark.recursion import profile_verify


def _fib(n):
    c0, c1 = ir.Col(0), ir.Col(1)
    c0n, c1n = ir.Col(0, rot=1), ir.Col(1, rot=1)
    cons = [
        ir.Mul(ir.IsTransition(), ir.Sub(c1n, ir.Add(c0, c1))),
        ir.Mul(ir.IsTransition(), ir.Sub(c0n, c1)),
        ir.Mul(ir.IsFirstRow(), ir.Sub(c0, ir.Const(1))),
        ir.Mul(ir.IsFirstRow(), ir.Sub(c1, ir.Const(1))),
    ]
    a, b, rows = 1, 1, []
    for _ in range(n):
        rows.append((a, b))
        a, b = b, (a + b) % bb.P
    trace = bb.to_mont(jnp.asarray(np.asarray(rows, dtype=np.uint32)))
    return Air(width=2, constraints=cons, name="fib"), trace


def _profile(num_queries):
    cfg = StarkConfig(log_blowup=2, num_queries=num_queries, proof_of_work_bits=2)
    air, trace = _fib(32)
    proof = prover.prove([(air, trace)], cfg, Challenger())
    return profile_verify([air], proof, cfg)


def test_profile_counts_everything():
    prof = _profile(6)
    assert prof.transcript_permutations > 0
    assert prof.merkle_path_permutations > 0
    assert prof.leaf_hash_permutations > 0
    assert prof.ext_muls > 0 and prof.ext_adds > 0 and prof.ext_invs > 0
    est = prof.aggregation_row_estimate()
    assert est["poseidon2_rows"] == prof.total_poseidon2
    assert est["ext_mul_rows"] == prof.ext_muls + prof.ext_invs


def test_profile_scales_with_queries():
    p6, p12 = _profile(6), _profile(12)
    # per-query Merkle/leaf work doubles; transcript grows only by the
    # extra query-index samples
    assert 1.8 < p12.merkle_path_permutations / p6.merkle_path_permutations < 2.2
    assert 1.8 < p12.leaf_hash_permutations / p6.leaf_hash_permutations < 2.2
    assert p12.transcript_permutations >= p6.transcript_permutations


def test_profile_leaves_primitives_unpatched():
    from powdr_tpu.field import ext
    from powdr_tpu.hash import merkle, poseidon2 as p2

    before = (merkle.verify_path, p2.hash_rows, ext.py_mul, ext.py_inv)
    _profile(6)
    after = (merkle.verify_path, p2.hash_rows, ext.py_mul, ext.py_inv)
    assert before == after
