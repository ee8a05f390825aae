"""SP1 adapter snapshot corpus — the reference's file-snapshot test style
(/root/reference/sp1-benchmarks/tests/single_instructions.rs:1-50 with
expect_file_contents, snapshots under tests/apc_snapshots/**): every
instruction/pseudo-instruction/complex block renders its optimized APC
machine to a stable text file; any optimizer behavior change shows up as
a diff.  Regenerate with UPDATE_EXPECT=1."""
import os

import pytest

from powdr_tpu.adapters.sp1 import Sp1Block, Sp1Instruction, build_apc, render_apc

SNAP_DIR = os.path.join(os.path.dirname(__file__), "apc_snapshots", "sp1")


def _check_snapshot(name: str, actual: str) -> None:
    path = os.path.join(SNAP_DIR, name + ".txt")
    update = os.environ.get("UPDATE_EXPECT") == "1"
    if os.path.exists(path) and not update:
        expected = open(path).read()
        assert expected == actual, (
            f"snapshot {name} differs; rerun with UPDATE_EXPECT=1 to accept"
        )
    else:
        os.makedirs(SNAP_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(actual)
        if not update and not os.path.exists(path):
            pytest.fail(f"snapshot {name} created; rerun to confirm")


def _single(name, ins):
    apc = build_apc(Sp1Block(start_pc=0x100, instructions=(ins,)))
    _check_snapshot(name, render_apc(apc))
    return apc


# -- single instructions ------------------------------------------------------

SINGLES = {
    "add": Sp1Instruction("ADD", 5, 6, 7),
    "sub": Sp1Instruction("SUB", 5, 6, 7),
    "xor": Sp1Instruction("XOR", 5, 6, 7),
    "or": Sp1Instruction("OR", 5, 6, 7),
    "and": Sp1Instruction("AND", 5, 6, 7),
    "sltu": Sp1Instruction("SLTU", 5, 6, 7),
    # immediate variants (the pseudo-instruction axis: addi/xori/...)
    "addi": Sp1Instruction("ADD", 5, 6, 1234, imm_c=True),
    "xori": Sp1Instruction("XOR", 5, 6, 0xFF, imm_c=True),
    "ori": Sp1Instruction("OR", 5, 6, 0xF0F0, imm_c=True),
    "andi": Sp1Instruction("AND", 5, 6, 0x00FF, imm_c=True),
    "sltiu": Sp1Instruction("SLTU", 5, 6, 100, imm_c=True),
    # li (mv-from-immediate): both operands immediate
    "li": Sp1Instruction("ADD", 5, 0, 42, imm_b=True, imm_c=True),
}


@pytest.mark.parametrize("name", sorted(SINGLES))
def test_single_instruction_snapshot(name):
    apc = _single(name, SINGLES[name])
    rep = apc.report
    assert rep.after["columns"] <= rep.before["columns"]


# -- complex blocks -----------------------------------------------------------


def test_register_chain_snapshot():
    """r7 = r5 + r6; r8 = r7 ^ r5; r9 = r8 & r7 — the write->read register
    chaining whose memory pair cancellation powers APC savings."""
    block = Sp1Block(
        start_pc=0x200,
        instructions=(
            Sp1Instruction("ADD", 7, 5, 6),
            Sp1Instruction("XOR", 8, 7, 5),
            Sp1Instruction("AND", 9, 8, 7),
        ),
    )
    apc = build_apc(block)
    _check_snapshot("register_chain", render_apc(apc))
    # chained intermediate register accesses must have cancelled
    mems = [b for b in apc.machine.bus_interactions if b.id == 11]
    assert apc.report.after["columns"] < apc.report.before["columns"]


def test_accumulator_loop_body_snapshot():
    """An unrolled accumulator body (4x add into the same register):
    register reuse across all four instructions."""
    block = Sp1Block(
        start_pc=0x300,
        instructions=tuple(Sp1Instruction("ADD", 5, 5, r) for r in (6, 7, 8, 9)),
    )
    apc = build_apc(block)
    _check_snapshot("accumulator_loop_body", render_apc(apc))


def test_mixed_logic_block_snapshot():
    block = Sp1Block(
        start_pc=0x400,
        instructions=(
            Sp1Instruction("XOR", 10, 5, 6),
            Sp1Instruction("OR", 11, 10, 7, imm_c=False),
            Sp1Instruction("AND", 12, 11, 0xFFFF, imm_c=True),
            Sp1Instruction("SLTU", 13, 12, 5),
        ),
    )
    apc = build_apc(block)
    _check_snapshot("mixed_logic_block", render_apc(apc))
