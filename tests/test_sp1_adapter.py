"""Second-adapter (SP1-style) APC tests: the APC engine must be
zkVM-generic.  Mirrors the reference's sp1-benchmarks snapshot tests
(/root/reference/sp1-benchmarks/tests/single_instructions.rs,
complex.rs): single-instruction blocks and a multi-instruction block are
built through the shared optimizer with the SP1 bus map, and the
register-chaining cancellation that powers APC savings must transfer."""
import pytest

from powdr_tpu.adapters.sp1 import (
    EXEC_BUS,
    MEM_BUS,
    Sp1Block,
    Sp1Instruction,
    build_apc,
)


def _cols(machine):
    vs = set()
    for c in machine.constraints:
        vs |= {v.id for v in c.vars()}
    for b in machine.bus_interactions:
        for e in (b.mult, *b.args):
            vs |= {v.id for v in e.vars()}
    return len(vs)


def test_single_add():
    apc = build_apc(Sp1Block(start_pc=0, instructions=(Sp1Instruction("ADD", 1, 2, 3),)))
    rep = apc.report
    assert rep.after["columns"] < rep.before["columns"]
    # pc/clk entry+exit survive as the block's exec boundary
    execs = [b for b in apc.machine.bus_interactions if b.id == EXEC_BUS]
    assert len(execs) == 2


def test_addi_immediate_folds():
    """imm_c: the c operand is a compile-time constant — no memory read,
    and the adder collapses to assignments on the a bytes."""
    apc = build_apc(
        Sp1Block(start_pc=0, instructions=(Sp1Instruction("ADD", 5, 0, 7, imm_b=True, imm_c=True),))
    )
    # b and c both immediates: no operand memory reads — only the a write
    # (recv+send) and the exec boundary survive as interactions, and the
    # snapshot column count is pinned (guarded values stay columns; the
    # APC multiplicity guard is free, so constants don't fully fold)
    mem = [b for b in apc.machine.bus_interactions if b.id == MEM_BUS]
    assert len(mem) == 2
    assert apc.report.after["columns"] <= 17, apc.report.after


def test_block_register_chaining_cancels_memory():
    """x3 = x1 + x2; x4 = x3 ^ x3 — the intermediate x3 write->read pair
    must cancel through the shared memory optimizer, exactly as it does
    for the native VM adapter (memory_optimizer.rs semantics are keyed on
    the bus map, not the frontend)."""
    block = Sp1Block(
        start_pc=0,
        instructions=(
            Sp1Instruction("ADD", 3, 1, 2),
            Sp1Instruction("XOR", 4, 3, 3),
        ),
    )
    apc = build_apc(block)
    mem = [b for b in apc.machine.bus_interactions if b.id == MEM_BUS]
    # accesses: reads x1,x2 (2 recv+2 send), write x3 (recv+send), reads
    # x3,x3, write x4.  The x3 write->read->read chain collapses: only the
    # boundary receive (first touch per address) and final send per
    # address survive = 4 addresses * 2 = 8
    assert len(mem) == 8, [str(b.id) for b in mem]
    # snapshot: 60 -> 46 columns today; bound pins against regression
    assert apc.report.after["columns"] <= 46, apc.report.after


@pytest.mark.parametrize("op", ["SUB", "XOR", "OR", "AND", "SLTU"])
def test_single_instruction_snapshots(op):
    apc = build_apc(Sp1Block(start_pc=0, instructions=(Sp1Instruction(op, 1, 2, 3),)))
    assert apc.report.after["columns"] < apc.report.before["columns"]
