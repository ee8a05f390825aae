"""VM tests: executor semantics (vs python ground truth), full-system mock
checks (constraints + exact bus balance), guest workloads."""
import numpy as np
import pytest

from powdr_tpu.vm.executor import Executor, assemble
from powdr_tpu.vm.guests import matmul_guest, sha256_guest, u256_add_guest
from powdr_tpu.vm.system import build_chips, mock_check


def _loop_program():
    return assemble([
        ("addi", 1, 0, 0, 5),
        ("addi", 2, 0, 0, 0),
        ("addi", 3, 0, 0, 0),
        "loop:",
        ("add", 2, 2, 1),
        ("addi", 3, 3, 0, 1),
        ("bne", 0, 3, 1, "loop"),
        ("sw", 0, 0, 2, 256),
        ("halt",),
    ])


def test_executor_loop():
    res = Executor(_loop_program()).run()
    assert res.final_mem[(2, 256)][1] == 25
    assert res.instret == 20


def test_mock_check_loop():
    prog = _loop_program()
    res = Executor(prog).run()
    mock_check(build_chips(prog, res))


def test_mock_check_catches_bad_witness():
    prog = _loop_program()
    res = Executor(prog).run()
    chips = build_chips(prog, res)
    add = next(c for c in chips if c.name == "add")
    add.trace["alu__sum__0"] = add.trace["alu__sum__0"].copy()
    add.trace["alu__sum__0"][0] += 1
    with pytest.raises(AssertionError):
        mock_check(chips)


def test_guest_u256_add():
    prog, mem, check = u256_add_guest()
    res = Executor(prog, mem).run()
    check(res)
    mock_check(build_chips(prog, res))


def test_guest_matmul():
    prog, mem, check = matmul_guest()
    res = Executor(prog, mem).run()
    check(res)
    mock_check(build_chips(prog, res))


def test_guest_sha256():
    prog, mem, check = sha256_guest()
    res = Executor(prog, mem).run()
    check(res)  # digest matches hashlib


@pytest.mark.slow
def test_guest_sha256_mock_check():
    prog, mem, check = sha256_guest()
    res = Executor(prog, mem).run()
    mock_check(build_chips(prog, res))


@pytest.fixture
def small_tables():
    """Shrink range tables + route byte checks over the range bus so the
    proving tests stay CI-sized; restores the build flags afterwards."""
    from powdr_tpu.vm import isa, machines, system

    saved = (isa.USE_BITWISE_FOR_BYTE_RANGE, isa.DT_BITS, system.MAX_RANGE_BITS)
    isa.USE_BITWISE_FOR_BYTE_RANGE = False
    isa.DT_BITS = 10
    system.MAX_RANGE_BITS = 10
    machines.rebuild_registry()
    yield
    isa.USE_BITWISE_FOR_BYTE_RANGE, isa.DT_BITS, system.MAX_RANGE_BITS = saved
    machines.rebuild_registry()


@pytest.mark.slow
def test_segmented_stark_proof(small_tables):
    """Continuation proving: a multi-epoch run split into bounded proof
    segments sharing one transcript; bus flows cancel ACROSS segments
    (the reference's per-segment proving axis, trace_generation.rs:37-103).
    Includes serialization roundtrip and cross-segment tamper rejection."""
    from powdr_tpu.stark import serialize
    from powdr_tpu.stark.config import StarkConfig
    from powdr_tpu.vm.executor_native import run_native_columnar
    from powdr_tpu.vm.prove import prove_chips_segmented, verify_chips
    from powdr_tpu.vm.system import build_chip_segments

    from powdr_tpu.cli import _guest

    prog, mem, _ = _guest("loop")  # ~150 instructions
    # small epochs: E = 16*8 = 128 ticks < 2^10 (the shrunk DT_BITS)
    res = run_native_columnar(prog, mem, segment_steps=16)
    segments = build_chip_segments(prog, res, max_rows_per_segment=64)
    assert len(segments) >= 3, [len(s) for s in segments]
    cfg = StarkConfig(log_blowup=2, num_queries=8, proof_of_work_bits=2)
    airs, proof = prove_chips_segmented(segments, cfg)
    assert proof.segments == [len(s) for s in segments]
    blob = serialize.proof_to_bytes(proof)
    proof2 = serialize.proof_from_bytes(blob)
    verify_chips(airs, proof2, cfg)
    # a logup total tampered in one segment must break the GLOBAL balance
    bad = serialize.proof_from_bytes(blob)
    t = list(bad.chips[0].logup_total)
    t[0] = (t[0] + 1) % 2013265921
    bad.chips[0].logup_total = tuple(t)
    with pytest.raises(AssertionError):
        verify_chips(airs, bad, cfg)


@pytest.mark.slow
def test_full_vm_stark_proof(small_tables):
    """Real STARK proof of a complete VM execution (the reference's
    prove_simple analog, openvm-riscv/src/lib.rs:259)."""
    from powdr_tpu.vm.prove import prove_chips, verify_chips
    from powdr_tpu.stark.config import StarkConfig

    prog = _loop_program()
    res = Executor(prog).run()
    chips = build_chips(prog, res)
    mock_check(chips)
    cfg = StarkConfig(log_blowup=2, num_queries=8, proof_of_work_bits=2)
    airs, proof = prove_chips(chips, cfg)
    verify_chips(airs, proof, cfg)


@pytest.mark.slow
def test_full_vm_stark_proof_with_apc(small_tables):
    """STARK proof with the hot block replaced by an autoprecompile —
    the reference's flagship flow (guest + APC -> proof)."""
    from powdr_tpu.vm.apc import build_apc, build_chips_with_apcs
    from powdr_tpu.vm.blocks import detect_basic_blocks, pc_profile, block_execution_count
    from powdr_tpu.vm.prove import prove_chips, verify_chips
    from powdr_tpu.stark.config import StarkConfig

    prog = _loop_program()
    res = Executor(prog).run()
    blocks = detect_basic_blocks(prog)
    prof = pc_profile(res.pc_trace)
    hot = max(blocks, key=lambda b: block_execution_count(b, prof) * len(b))
    apc = build_apc(hot)
    assert apc.report.after["columns"] < apc.report.before["columns"]
    chips = build_chips_with_apcs(prog, res, [apc])
    mock_check(chips)
    cfg = StarkConfig(log_blowup=2, num_queries=8, proof_of_work_bits=2)
    airs, proof = prove_chips(chips, cfg)
    verify_chips(airs, proof, cfg)


def test_apc_with_segmentation_straddle(small_tables):
    """APC + segmentation interaction (ADVICE r2): with epoch boundaries
    landing INSIDE block occurrences, the straddling occurrences are
    dropped (they run on the plain instruction chips), the refresh chips
    hand timestamps across epochs around the APC rows, and the whole
    system still bus-balances."""
    from powdr_tpu.cli import _guest
    from powdr_tpu.vm.apc import build_apc, build_chips_with_apcs, find_occurrences
    from powdr_tpu.vm.blocks import detect_basic_blocks, pc_profile, block_execution_count
    from powdr_tpu.vm.executor_native import run_native_columnar

    prog, mem, _ = _guest("loop")
    # 3-instruction loop body + segment boundary every 8 instructions:
    # occurrences must straddle boundaries regularly
    res = run_native_columnar(prog, mem, segment_steps=8)
    assert res.exec_refresh is not None and len(res.exec_refresh["seg"])
    blocks = detect_basic_blocks(prog)
    prof = pc_profile(res.pc_trace)
    hot = max(blocks, key=lambda b: block_execution_count(b, prof) * len(b))
    occ = find_occurrences(hot, res)
    total_execs = block_execution_count(hot, prof)
    assert 0 < len(occ) < total_execs, (len(occ), total_execs)
    apc = build_apc(hot)
    chips = build_chips_with_apcs(prog, res, [apc])
    mock_check(chips)


def test_native_executor_equivalence():
    """C++ core (native/exec_core.cpp) matches the python executor on all
    guests, record for record."""
    from powdr_tpu.vm.executor_native import run_native

    for g in (sha256_guest, matmul_guest, u256_add_guest):
        prog, mem, check = g()
        py = Executor(prog, mem).run()
        nat = run_native(prog, mem)
        check(nat)
        assert nat.pc_trace == py.pc_trace
        assert nat.final_mem == py.final_mem
        assert nat.instret == py.instret
        for op in py.records:
            for a, b in zip(py.records[op], nat.records[op]):
                for k, v in a.items():
                    assert b[k] == v, (op, k)


@pytest.mark.slow
def test_guest_keccak_with_apc():
    """guest-keccak + autoprecompile (BASELINE config 2 shape): the
    945-instruction round block becomes a single APC chip."""
    from powdr_tpu.vm.apc import build_chips_with_apcs
    from powdr_tpu.vm.executor_native import run_native
    from powdr_tpu.vm.guests import keccak_f_guest
    from powdr_tpu.vm.pgo import generate_candidates, select_apcs

    prog, mem, check = keccak_f_guest()
    res = run_native(prog, mem)
    check(res)
    cands = generate_candidates(prog, res, superblocks=False)
    assert cands and cands[0].execution_count == 24
    assert cands[0].apc.report.after["columns"] < cands[0].apc.report.before["columns"]
    apcs = select_apcs(cands, max_apcs=1)
    chips = build_chips_with_apcs(prog, res, apcs)
    names = {c.name for c in chips}
    # every xor/and/add/lw/sw of the round body lives inside the APC
    assert names & {"xor", "and", "lw", "sw"} == set()
    mock_check(chips)


def test_device_apc_tracegen_matches_host():
    """The jitted gather tracegen (CUDA kernel-1 counterpart) must produce
    the same APC trace as the host gather."""
    import jax.numpy as jnp
    from powdr_tpu.vm.apc import apc_chip, build_apc, find_occurrences
    from powdr_tpu.vm.blocks import block_execution_count, detect_basic_blocks, pc_profile
    from powdr_tpu.vm.witgen_device import (
        apc_gather_plan,
        make_apc_tracegen,
        opcode_matrices,
    )

    prog = _loop_program()
    res = Executor(prog).run()
    blocks = detect_basic_blocks(prog)
    prof = pc_profile(res.pc_trace)
    hot = max(blocks, key=lambda b: block_execution_count(b, prof) * len(b))
    apc = build_apc(hot)
    occs = find_occurrences(hot, res)
    host = apc_chip(apc, occs, res, prog)
    mats = {op: jnp.asarray(m) for op, m in opcode_matrices(res).items()}
    plan, names = apc_gather_plan(apc, occs, res, prog)
    tracegen = make_apc_tracegen(plan, len(names), len(occs))
    dev = np.asarray(tracegen(mats))
    for j, name in enumerate(names):
        np.testing.assert_array_equal(
            dev[:, j] % (2**31), host.trace[name][: len(occs)].astype(np.uint64) % (2**31), err_msg=name
        )


def _full_isa_program():
    """Exercises every rv32im opcode added for reference ISA parity
    (openvm-riscv/src/isa/opcode.rs:9-60 surface): variable/arith shifts
    (incl. the shamt==0 special path), signed compares/branches, signed and
    unsigned mul-high and div/rem (incl. divide-by-zero and overflow),
    sub-word loads/stores, auipc."""
    from powdr_tpu.vm.executor import assemble

    X = 0xDEADBEEF
    lines = [
        ("lui", 1, 0, 0, X),
        ("lui", 2, 0, 0, 3),
        ("sll", 3, 1, 2, 0),
        ("srl", 4, 1, 2, 0),
        ("sra", 5, 1, 2, 0),
        ("lui", 6, 0, 0, 32),
        ("srl", 7, 1, 6, 0),          # shamt 32 & 31 == 0 -> z0 path
        ("sra", 8, 1, 6, 0),
        ("srai", 9, 1, 0, 7),
        ("srli", 10, 1, 0, 1),
        ("slli", 11, 1, 0, 1),
        ("slt", 12, 1, 2, 0),
        ("slti", 13, 2, 0, 0xFFFFFFFE),
        ("sltiu", 14, 2, 0, 7),
        ("mulh", 15, 1, 1, 0),
        ("mulhu", 16, 1, 1, 0),
        ("mulhsu", 17, 1, 1, 0),
        ("divu", 18, 1, 2, 0),
        ("remu", 19, 1, 2, 0),
        ("div", 20, 1, 2, 0),
        ("rem", 21, 1, 2, 0),
        ("div", 22, 1, 0, 0),         # divide by zero (r0 == 0)
        ("rem", 23, 1, 0, 0),
        ("lui", 30, 0, 0, 0x80000000),
        ("lui", 31, 0, 0, 0xFFFFFFFF),
        ("div", 24, 30, 31, 0),       # -2^31 / -1 overflow case
        ("rem", 25, 30, 31, 0),
        ("auipc", 26, 0, 0, 0x1000),
        ("lui", 27, 0, 0, 0x100),
        ("sw", 0, 27, 1, 0),
        ("sb", 0, 27, 2, 5),
        ("sh", 0, 27, 1, 10),
        ("lb", 28, 27, 0, 3),
        ("lbu", 29, 27, 0, 3),
        ("lh", 3, 27, 0, 2),
        ("lhu", 4, 27, 0, 2),
        ("blt", 0, 1, 2, "L1"),       # signed: 0xDEADBEEF < 3 -> taken
        ("halt",),
        "L1:",
        ("bge", 0, 2, 1, "L2"),
        ("halt",),
        "L2:",
        ("bgeu", 0, 1, 2, "L3"),      # unsigned: big >= 3 -> taken
        ("halt",),
        "L3:",
        ("halt",),
    ]
    return assemble(lines)


def test_full_isa_mock_check():
    prog = _full_isa_program()
    res = Executor(prog).run()
    X = 0xDEADBEEF
    regs = {p: v for (s, p), (_, v) in res.final_mem.items() if s == 1}
    assert regs[3] == 0xFFFFDEAD                  # lh from 0x102 (high half, sign-ext)
    assert regs[5] == ((X - (1 << 32)) >> 3) & 0xFFFFFFFF
    assert regs[7] == X and regs[8] == X          # shamt 0
    assert regs[9] == ((X - (1 << 32)) >> 7) & 0xFFFFFFFF
    assert regs[12] == 1 and regs[13] == 0 and regs[14] == 1
    sx = X - (1 << 32)
    assert regs[15] == (sx * sx >> 32) & 0xFFFFFFFF
    assert regs[16] == (X * X) >> 32
    assert regs[17] == (sx * X >> 32) & 0xFFFFFFFF
    assert regs[18] == X // 3 and regs[19] == X % 3
    assert regs[20] == ((-((-sx) // 3)) & 0xFFFFFFFF)
    assert regs[21] == ((-((-sx) % 3)) & 0xFFFFFFFF)
    assert regs[22] == 0xFFFFFFFF and regs[23] == X
    assert regs[24] == 0x80000000 and regs[25] == 0
    assert regs[26] == (27 * 4 + 0x1000)
    assert regs[28] == 0xFFFFFFDE and regs[29] == 0xDE
    assert regs[4] == 0xDEAD
    mock_check(build_chips(prog, res))


def test_full_isa_native_equivalence():
    from powdr_tpu.vm.executor_native import run_native

    prog = _full_isa_program()
    py = Executor(prog).run()
    nat = run_native(prog)
    assert nat.pc_trace == py.pc_trace
    assert nat.final_mem == py.final_mem
    for op in py.records:
        for a, b in zip(py.records[op], nat.records[op]):
            for k, v in a.items():
                assert b[k] == v, (op, k)


def test_columnar_witgen_matches_scalar():
    """Vectorized witgen (witgen_vec.py over run_native_columnar records)
    must reproduce the scalar per-record path's chips byte for byte —
    every column of every chip, on the full-ISA program and a guest."""
    from powdr_tpu.vm.executor_native import run_native_columnar

    for prog, mem in [
        (_full_isa_program(), None),
        (_loop_program(), None),
        matmul_guest()[:2],
    ]:
        scalar = build_chips(prog, Executor(prog, mem).run())
        columnar = build_chips(prog, run_native_columnar(prog, mem))
        assert [c.name for c in columnar] == [c.name for c in scalar]
        for cs, cc in zip(scalar, columnar):
            assert cs.cols == cc.cols, cs.name
            for col in cs.cols:
                np.testing.assert_array_equal(
                    cc.trace[col], cs.trace[col], err_msg=f"{cs.name}.{col}"
                )


def test_columnar_witgen_speed():
    """VERDICT round-1 item 7 gate: witgen for a ~32k-instruction run in
    well under a second (native exec + columnar witgen, no row dicts)."""
    import time

    from powdr_tpu.vm.executor_native import run_native_columnar

    prog = assemble([
        ("addi", 1, 0, 0, 4000),
        ("addi", 3, 0, 0, 0),
        "loop:",
        ("add", 2, 2, 1),
        ("xor", 4, 2, 3),
        ("sll", 5, 2, 1, 0),
        ("divu", 6, 2, 1, 0),
        ("sw", 0, 0, 2, 256),
        ("lw", 7, 0, 0, 256),
        ("addi", 3, 3, 0, 1),
        ("bltu", 0, 3, 1, "loop"),
        ("halt",),
    ])
    res = run_native_columnar(prog)
    assert res.instret > 30000
    t0 = time.perf_counter()
    chips = instruction_chips_timed = build_chips(prog, res)
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"columnar witgen+assembly took {dt:.2f}s"


def test_segmentation_long_execution():
    """Executions beyond the 2^DT_BITS timestamp budget (32768
    instructions) run segmented: timestamp epochs with per-epoch refresh
    chips handing every touched cell and the execution bridge across
    boundaries (counterpart of the reference's SegmentationLimits,
    openvm-riscv/src/lib.rs:270-283).  The old cap was a hard limit
    (VERDICT round-1 missing item 3)."""
    from powdr_tpu.vm.executor_native import run_native_columnar
    from powdr_tpu.vm.isa import SEG_STEPS

    prog = assemble([
        ("addi", 1, 0, 0, 9000),
        ("addi", 3, 0, 0, 0),
        "loop:",
        ("add", 2, 2, 1),
        ("sw", 0, 0, 2, 256),
        ("lw", 4, 0, 0, 256),
        ("addi", 3, 3, 0, 1),
        ("bltu", 0, 3, 1, "loop"),
        ("halt",),
    ])
    res = run_native_columnar(prog, segment_steps=SEG_STEPS)
    assert res.instret > SEG_STEPS, "must exceed the single-segment cap"
    chips = build_chips(prog, res)
    names = [c.name for c in chips]
    assert "mem_refresh" in names and "exec_refresh" in names
    mock_check(chips)


def test_segmentation_tampered_refresh_fails():
    """A refresh row carrying the wrong value across an epoch boundary
    must break the memory multiset balance."""
    from powdr_tpu.vm.executor_native import run_native_columnar

    prog = assemble([
        ("addi", 1, 0, 0, 200),
        ("addi", 3, 0, 0, 0),
        "loop:",
        ("add", 2, 2, 1),
        ("addi", 3, 3, 0, 1),
        ("bltu", 0, 3, 1, "loop"),
        ("halt",),
    ])
    res = run_native_columnar(prog, segment_steps=64)
    chips = build_chips(prog, res)
    ref = next(c for c in chips if c.name == "mem_refresh")
    ref.trace["v__0"] = ref.trace["v__0"].copy()
    ref.trace["v__0"][0] = (ref.trace["v__0"][0] + 1) % 2013265921
    with pytest.raises(AssertionError):
        mock_check(chips)


def test_guest_fp2_ladder_small():
    """Fp2 ladder over BN254 (pairing-shaped warm-up, 2 rounds):
    Montgomery CIOS field core + mock check."""
    from powdr_tpu.vm.executor_native import run_native_columnar
    from powdr_tpu.vm.guests import fp2_ladder_guest

    from powdr_tpu.vm.isa import SEG_STEPS

    prog, mem, check = fp2_ladder_guest(iters=2)
    res = run_native_columnar(prog, mem, segment_steps=SEG_STEPS)
    check(res)
    mock_check(build_chips(prog, res))


def test_guest_pairing_truncated():
    """REAL BN254 pairing code paths (projective Miller loop with line
    evaluations over the Fp12 tower), truncated to one digit (~430k
    instructions); Fp12 output matches the bilinearity-validated python
    reference."""
    from powdr_tpu.vm.executor_native import run_native_columnar
    from powdr_tpu.vm.guests import pairing_guest

    prog, mem, check = pairing_guest(truncate=1)
    res = run_native_columnar(prog, mem)
    check(res)


@pytest.mark.slow
def test_guest_pairing():
    """BN254 Miller loop prefix at ecrecover scale (16 digits, ~10M
    instructions, segmented) mock-checked end to end; the full pairing
    (61M instructions incl. final exponentiation) runs in
    test_guest_pairing_full."""
    from powdr_tpu.vm.executor_native import run_native_columnar
    from powdr_tpu.vm.guests import pairing_guest
    from powdr_tpu.vm.isa import SEG_STEPS

    prog, mem, check = pairing_guest(truncate=16)
    res = run_native_columnar(prog, mem, segment_steps=SEG_STEPS, max_steps=1 << 24)
    assert res.instret > 5 * SEG_STEPS
    check(res)
    mock_check(build_chips(prog, res))


@pytest.mark.slow
def test_guest_pairing_full():
    """The COMPLETE optimal-ate pairing (Miller loop + Frobenius lines +
    final exponentiation, ~61M instructions): executes natively and the
    Fp12 result equals e(aP, bQ) from the python reference.  Witness
    generation for traces this size goes through segment proving."""
    from powdr_tpu.vm.executor_native import run_native_columnar
    from powdr_tpu.vm.guests import pairing_guest

    prog, mem, check = pairing_guest()
    res = run_native_columnar(prog, mem, max_steps=1 << 27)
    check(res)


@pytest.mark.slow
def test_guest_ecrecover():
    """Full secp256k1 public-key recovery (~13M instructions, ~400
    segments) — the guest-ecrecover BASELINE counterpart.  check()
    compares the recovered point against the signer's public key;
    the whole trace mock-checks (constraints + bus multisets)."""
    from powdr_tpu.vm.executor_native import run_native_columnar
    from powdr_tpu.vm.guests import ecrecover_guest
    from powdr_tpu.vm.isa import SEG_STEPS

    prog, mem, check = ecrecover_guest()
    res = run_native_columnar(prog, mem, segment_steps=SEG_STEPS, max_steps=1 << 24)
    check(res)
    mock_check(build_chips(prog, res))


def test_hints_extension():
    """Hints extension (reference extensions/hints-*): revb + k256 field
    inverse/sqrt phantom hints, verified in-guest (the hint values are
    unconstrained witness); full trace mock-checks."""
    from powdr_tpu.vm.executor import Executor
    from powdr_tpu.vm.guests import hints_test_guest

    prog, mem, check = hints_test_guest()
    res = Executor(prog, mem).run()
    check(res)
    assert res.records["hintpop"] and res.records["revb"]
    mock_check(build_chips(prog, res))
    # native core computes identical hints (k256 modpow in C++) and the
    # columnar witgen path mock-checks too
    from powdr_tpu.vm.executor_native import run_native_columnar

    nat = run_native_columnar(prog, mem)
    check(nat)
    assert nat.instret == res.instret
    mock_check(build_chips(prog, nat))


def test_hints_wrong_hint_fails_in_guest():
    """A corrupted hint value must be caught by the guest's own field-mul
    verification (the circuit leaves hint words free by design)."""
    from powdr_tpu.vm.executor import Executor
    from powdr_tpu.vm.guests import hints_test_guest
    from powdr_tpu.vm.guests import HT_FLAG

    prog, mem, check = hints_test_guest()

    class Tampered(Executor):
        def run(self, *a, **kw):
            orig_pop = list.pop

            class Q(list):
                def pop(self, idx=0):
                    v = orig_pop(self, idx)
                    return (v + 1) & 0xFFFFFFFF if len(self) == 7 else v

            self.hint_queue = Q()
            return super().run(*a, **kw)

    res = Tampered(prog, mem).run()
    assert res.final_mem[(2, HT_FLAG)][1] == 2, "guest must take the fail path"


def test_guest_ecc_affine_hint():
    """Affine secp256k1 scalar-mul with hint-supplied verified inverses
    (guest-ecc-powdr-affine-hint counterpart), on the native executor."""
    from powdr_tpu.vm.executor_native import run_native_columnar
    from powdr_tpu.vm.guests import ecc_affine_hint_guest

    prog, mem, check = ecc_affine_hint_guest(k_bits=16)
    res = run_native_columnar(prog, mem)
    check(res)
    assert "hintinv" in res.records_columnar
    mock_check(build_chips(prog, res))


@pytest.mark.slow
def test_guest_ecc_affine_hint_full_scalar():
    """Full 256-bit scalar (~4M instructions, segmented)."""
    from powdr_tpu.vm.executor_native import run_native_columnar
    from powdr_tpu.vm.guests import ecc_affine_hint_guest

    prog, mem, check = ecc_affine_hint_guest(k_bits=256)
    res = run_native_columnar(prog, mem, max_steps=1 << 23)
    check(res)
    mock_check(build_chips(prog, res))


@pytest.mark.slow
def test_height_bucketing_proof(small_tables, monkeypatch):
    """POWDR_TPU_MIN_LOG_HEIGHT pads every chip to a common minimum height
    and the proof still verifies (padding rows are constraint- and
    bus-neutral)."""
    from powdr_tpu.vm.prove import prove_chips, verify_chips
    from powdr_tpu.stark.config import StarkConfig

    monkeypatch.setenv("POWDR_TPU_MIN_LOG_HEIGHT", "6")
    prog = _loop_program()
    res = Executor(prog).run()
    chips = build_chips(prog, res)
    cfg = StarkConfig(log_blowup=2, num_queries=4, proof_of_work_bits=1)
    airs, proof = prove_chips(chips, cfg)
    assert min(proof.log_n) >= 6
    verify_chips(airs, proof, cfg)


@pytest.mark.slow
@pytest.mark.parametrize("guest_fn", [sha256_guest, u256_add_guest, matmul_guest])
def test_guest_stark_proofs(small_tables, guest_fn):
    """Real STARK proof + verify for each single-segment BASELINE guest
    (the reference's per-guest prove_simple tests,
    openvm-riscv/src/lib.rs:345+); bench.py measures the same configs on
    the real chip."""
    from powdr_tpu.stark.config import StarkConfig
    from powdr_tpu.vm.prove import prove_chips, verify_chips

    prog, mem, check = guest_fn()
    res = Executor(prog, mem).run()
    check(res)
    chips = build_chips(prog, res)
    cfg = StarkConfig(log_blowup=2, num_queries=8, proof_of_work_bits=2)
    airs, proof = prove_chips(chips, cfg)
    verify_chips(airs, proof, cfg)
