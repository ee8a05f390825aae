"""The eager prover and the jitted/batched prover must produce
byte-identical proofs — the quick tier runs eager (no per-shape XLA
compiles), serving runs jit, and this test pins their equivalence."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from powdr_tpu.field import babybear as bb
from powdr_tpu.ir import expression as ir
from powdr_tpu.stark import prover, serialize, verifier
from powdr_tpu.stark.air import Air, Interaction
from powdr_tpu.stark.challenger import Challenger
from powdr_tpu.stark.config import StarkConfig

CFG = StarkConfig(log_blowup=2, num_queries=6, proof_of_work_bits=2, log_final_poly_len=0)


def _chips(rng):
    n, m = 64, 16
    a = np.tile(rng.integers(0, bb.P, size=m, dtype=np.uint64).astype(np.uint32), n // m)
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
    return [big, small], [
        (big, bb.to_mont(jnp.asarray(np.stack([a, b_, c], axis=1)))),
        (small, bb.to_mont(jnp.asarray(np.stack([a[:m], np.full(m, n // m, dtype=np.uint32)], axis=1)))),
    ]


def test_eager_and_batched_jit_proofs_byte_identical(rng, monkeypatch):
    airs, chips = _chips(rng)
    blobs = {}
    for eager, batch in (("1", "0"), ("0", "1")):
        monkeypatch.setenv("POWDR_TPU_EAGER_PROVER", eager)
        monkeypatch.setenv("POWDR_TPU_BATCH_ROUNDS", batch)
        p = prover.prove(chips, CFG, Challenger())
        blob = serialize.proof_to_bytes(p)
        verifier.verify(airs, serialize.proof_from_bytes(blob), CFG, Challenger())
        blobs[(eager, batch)] = blob
    assert blobs[("1", "0")] == blobs[("0", "1")], (
        "eager and batched-jit provers diverged"
    )
