"""End-to-end STARK prove+verify on small AIRs, including LogUp buses.

Mirrors the reference's mock-proving test style (prove + constraint debug
check, openvm-riscv/src/lib.rs:288-296) but with full proofs and a real
verifier."""
import numpy as np
import jax.numpy as jnp
import pytest

from powdr_tpu.field import babybear as bb
from powdr_tpu.ir import expression as ir
from powdr_tpu.stark import air as air_mod
from powdr_tpu.stark import prover, verifier
from powdr_tpu.stark.air import Air, Interaction
from powdr_tpu.stark.challenger import Challenger
from powdr_tpu.stark.config import StarkConfig

CFG = StarkConfig(log_blowup=2, num_queries=6, proof_of_work_bits=2)


def mont(arr):
    return bb.to_mont(jnp.asarray(np.asarray(arr, dtype=np.uint32)))


def fib_air_and_trace(n):
    """Fibonacci: col1' = col0 + col1 (transition), col0' = col1."""
    c0, c1 = ir.Col(0), ir.Col(1)
    c0n, c1n = ir.Col(0, rot=1), ir.Col(1, rot=1)
    constraints = [
        ir.Mul(ir.IsTransition(), ir.Sub(c1n, ir.Add(c0, c1))),
        ir.Mul(ir.IsTransition(), ir.Sub(c0n, c1)),
        ir.Mul(ir.IsFirstRow(), ir.Sub(c0, ir.Const(1))),
        ir.Mul(ir.IsFirstRow(), ir.Sub(c1, ir.Const(1))),
    ]
    a, b = 1, 1
    rows = []
    for _ in range(n):
        rows.append((a, b))
        a, b = b, (a + b) % bb.P
    return Air(width=2, constraints=constraints, name="fib"), mont(rows)


def test_fib_roundtrip():
    n = 32
    air, trace = fib_air_and_trace(n)
    ch = Challenger()
    proof = prover.prove([(air, trace)], CFG, ch)
    vch = Challenger()
    verifier.verify([air], proof, CFG, vch)


def test_fib_rejects_bad_trace():
    n = 32
    air, trace = fib_air_and_trace(n)
    bad = trace.at[5, 0].set(bb.add(trace[5, 0], bb.one()))
    ch = Challenger()
    proof = prover.prove([(air, bad)], CFG, ch)
    vch = Challenger()
    with pytest.raises(AssertionError):
        verifier.verify([air], proof, CFG, vch)


def test_rejects_truncated_chip_list(rng):
    """A proof listing fewer chips than airs must fail the shape check,
    not silently skip the trailing chips' checks (ADVICE r1)."""
    n = 32
    s, r = lookup_pair(n, rng)
    proof = prover.prove([s, r], CFG, Challenger())
    import copy

    bad = copy.copy(proof)
    bad.chips = proof.chips[:1]
    with pytest.raises(AssertionError, match="chip count"):
        verifier.verify([s[0], r[0]], bad, CFG, Challenger())


def lookup_pair(n, rng):
    """Two chips connected by one bus: sender emits values with mult 1,
    receiver is a table counting them."""
    vals = rng.integers(0, 8, size=n)
    send_air = Air(
        width=1,
        constraints=[],
        interactions=[air_mod.send(7, ir.Const(1), [ir.Col(0)])],
        name="sender",
    )
    counts = np.bincount(vals, minlength=n).astype(np.uint32)
    recv_air = Air(
        width=2,  # col0 = table value (0..n), col1 = multiplicity
        constraints=[],
        interactions=[air_mod.receive(7, ir.Col(1), [ir.Col(0)])],
        name="table",
    )
    send_trace = mont(vals.reshape(-1, 1))
    table = np.stack([np.arange(n, dtype=np.uint32), counts], axis=1)
    recv_trace = mont(table)
    return (send_air, send_trace), (recv_air, recv_trace)


def test_logup_bus_roundtrip(rng):
    n = 32
    s, r = lookup_pair(n, rng)
    ch = Challenger()
    proof = prover.prove([s, r], CFG, ch)
    vch = Challenger()
    verifier.verify([s[0], r[0]], proof, CFG, vch)


def test_logup_bus_imbalance_rejected(rng):
    n = 32
    s, r = lookup_pair(n, rng)
    # tamper: sender sends one extra value not in the table counts
    bad_trace = s[1].at[3, 0].set(bb.to_mont(jnp.uint32(9999)))
    ch = Challenger()
    proof = prover.prove([(s[0], bad_trace), r], CFG, ch)
    vch = Challenger()
    with pytest.raises(AssertionError):
        verifier.verify([s[0], r[0]], proof, CFG, vch)


def test_mixed_height_logup_roundtrip(rng):
    """Sender (32 rows) and table (8 rows) at different heights: exercises
    the mixed-height FRI join path."""
    n_send, n_table = 32, 8
    vals = rng.integers(0, n_table, size=n_send)
    send_air = Air(
        width=1,
        constraints=[],
        interactions=[air_mod.send(7, ir.Const(1), [ir.Col(0)])],
        name="sender",
    )
    counts = np.bincount(vals, minlength=n_table).astype(np.uint32)
    recv_air = Air(
        width=2,
        constraints=[],
        interactions=[air_mod.receive(7, ir.Col(1), [ir.Col(0)])],
        name="table",
    )
    send_trace = mont(vals.reshape(-1, 1))
    recv_trace = mont(np.stack([np.arange(n_table, dtype=np.uint32), counts], axis=1))
    ch = Challenger()
    proof = prover.prove([(send_air, send_trace), (recv_air, recv_trace)], CFG, ch)
    vch = Challenger()
    verifier.verify([send_air, recv_air], proof, CFG, vch)


def test_mixed_height_imbalance_rejected(rng):
    n_send, n_table = 32, 8
    vals = rng.integers(0, n_table, size=n_send)
    send_air = Air(
        width=1, constraints=[],
        interactions=[air_mod.send(7, ir.Const(1), [ir.Col(0)])], name="sender",
    )
    counts = np.bincount(vals, minlength=n_table).astype(np.uint32)
    counts[0] += 1  # break the balance
    recv_air = Air(
        width=2, constraints=[],
        interactions=[air_mod.receive(7, ir.Col(1), [ir.Col(0)])], name="table",
    )
    send_trace = mont(vals.reshape(-1, 1))
    recv_trace = mont(np.stack([np.arange(n_table, dtype=np.uint32), counts], axis=1))
    ch = Challenger()
    proof = prover.prove([(send_air, send_trace), (recv_air, recv_trace)], CFG, ch)
    vch = Challenger()
    with pytest.raises(AssertionError):
        verifier.verify([send_air, recv_air], proof, CFG, vch)


def test_public_values_bound(rng):
    """Public values: the fib output is exposed; the verifier rejects a
    proof replayed against different publics."""
    n = 32
    air, trace = fib_air_and_trace(n)
    # expose the final col1 value as public 0
    air = Air(
        width=2,
        constraints=air.constraints
        + [ir.Mul(ir.IsLastRow(), ir.Sub(ir.Col(1), ir.Public(0)))],
        name="fib-pub",
        num_publics=1,
    )
    fib_out = int(bb.from_mont(trace[n - 1, 1]))
    proof = prover.prove([(air, trace)], CFG, Challenger(), publics=[[fib_out]])
    verifier.verify([air], proof, CFG, Challenger())
    # tampered public value: transcript diverges -> rejection
    proof.publics = [[(fib_out + 1) % bb.P]]
    with pytest.raises(AssertionError):
        verifier.verify([air], proof, CFG, Challenger())


def test_proof_serialization_roundtrip(rng):
    from powdr_tpu.stark.serialize import proof_from_bytes, proof_to_bytes

    n = 32
    air, trace = fib_air_and_trace(n)
    proof = prover.prove([(air, trace)], CFG, Challenger())
    blob = proof_to_bytes(proof)
    assert isinstance(blob, bytes) and len(blob) > 0
    back = proof_from_bytes(blob)
    verifier.verify([air], back, CFG, Challenger())
    # tampering a value in the deserialized proof must fail verification
    back.chips[0].logup_total = (1, 2, 3, 4)
    with pytest.raises(AssertionError):
        verifier.verify([air], back, CFG, Challenger())


def test_fuzzed_proof_bytes_never_verify():
    """Corrupted proof bytes either fail to decode, fail verification, or
    decode to a SEMANTICALLY IDENTICAL proof (npz container metadata —
    a correct accept).  No corrupted-and-different proof may pass."""
    import random

    from powdr_tpu.stark import serialize

    cfg = StarkConfig(log_blowup=2, num_queries=2, proof_of_work_bits=1)
    c0 = ir.Col(0)
    air = Air(width=1, constraints=[ir.Mul(c0, ir.Sub(c0, ir.Const(1)))], name="bool")
    trace = bb.to_mont(jnp.asarray(np.zeros((16, 1), dtype=np.uint32)))
    proof = prover.prove([(air, trace)], cfg, Challenger())
    blob = serialize.proof_to_bytes(proof)

    def canon(p):
        parts = [np.asarray(p.log_n), np.asarray(p.chip_widths)]
        for cp in p.chips:
            parts += [np.asarray(cp.main_root), np.asarray(cp.quotient_root),
                      np.asarray(cp.logup_total)]
        for vals in p.pcs.values:
            parts += [np.asarray(v) for v in vals]
        parts += [np.asarray(r) for r in p.pcs.fri.layer_roots]
        parts += [np.asarray(p.pcs.fri.final_poly), np.asarray(p.pcs.fri.pow_witness)]
        for q in p.pcs.fri.queries:
            parts.append(np.asarray(q.index))
            for l in q.layers:
                parts += [np.asarray(l.pair), np.asarray(l.path)]
        for pq in p.pcs.queries:
            for mq in pq.per_matrix:
                parts += [np.asarray(mq.row_lo), np.asarray(mq.row_hi),
                          np.asarray(mq.path_lo), np.asarray(mq.path_hi)]
        return [a.tobytes() for a in parts]

    orig = canon(proof)
    rnd = random.Random(7)
    for trial in range(60):
        b = bytearray(blob)
        kind = trial % 3
        if kind == 0:
            b = b[: rnd.randrange(1, len(b))]
        elif kind == 1:
            i = rnd.randrange(len(b))
            b[i] ^= 1 << rnd.randrange(8)
        else:
            i = rnd.randrange(len(b))
            b[i : i + 4] = bytes(rnd.randrange(256) for _ in range(4))
        try:
            p = serialize.proof_from_bytes(bytes(b))
            verifier.verify([air], p, cfg, Challenger())
        except Exception:
            continue
        assert canon(p) == orig, f"corrupted-and-different proof accepted (trial {trial})"


def test_segmented_proof_cross_segment_bus(rng):
    """Segmented (continuation) proving: sender and its lookup table land
    in DIFFERENT segments, each with its own PCS/FRI opening; the shared
    transcript makes the LogUp flows cancel across segments.  Tampering
    one segment's total must break the global balance."""
    from powdr_tpu.stark import serialize

    n = 32
    s, r = lookup_pair(n, rng)
    proof = prover.prove([s, r], CFG, Challenger(), segments=[1, 1])
    assert proof.segments == [1, 1] and len(proof.pcs_parts) == 2
    blob = serialize.proof_to_bytes(proof)
    proof2 = serialize.proof_from_bytes(blob)
    verifier.verify([s[0], r[0]], proof2, CFG, Challenger())
    bad = serialize.proof_from_bytes(blob)
    t = list(bad.chips[0].logup_total)
    t[0] = (t[0] + 1) % bb.P
    bad.chips[0].logup_total = tuple(t)
    with pytest.raises(AssertionError):
        verifier.verify([s[0], r[0]], bad, CFG, Challenger())


def test_segmented_mixed_heights(rng):
    """Each segment folds its own mixed-height FRI batch: heights differ
    within and across segments."""
    n_send, n_table = 32, 8
    vals = rng.integers(0, n_table, size=n_send)
    send_air = Air(
        width=1,
        constraints=[],
        interactions=[air_mod.send(7, ir.Const(1), [ir.Col(0)])],
        name="sender",
    )
    counts = np.bincount(vals, minlength=n_table).astype(np.uint32)
    recv_air = Air(
        width=2,
        constraints=[],
        interactions=[air_mod.receive(7, ir.Col(1), [ir.Col(0)])],
        name="table",
    )
    fib_air, fib_trace = fib_air_and_trace(16)
    chips = [
        (send_air, mont(vals.reshape(-1, 1))),
        (fib_air, fib_trace),
        (recv_air, mont(np.stack([np.arange(n_table, dtype=np.uint32), counts], axis=1))),
    ]
    proof = prover.prove(chips, CFG, Challenger(), segments=[2, 1])
    verifier.verify([a for a, _ in chips], proof, CFG, Challenger())
