"""SP1-style APC adapter: a second zkVM frontend for the APC engine.

Mirrors the role of the reference's Sp1ApcAdapter
(/root/reference/sp1-benchmarks/tests/common.rs:20-36, which calls the
shared `powdr_autoprecompiles::build` with an SP1 instruction handler and
`sp1_bus_map()`): instruction machines in SP1's shape — operands
(a, b, c) with immediate flags, registers living in memory space 0 at
addr = 4*reg, clk advancing by 4 per instruction, and a single
opcode-tagged byte-operations lookup bus instead of the native VM's
variable-range + bitwise tables — are concatenated per basic block and
run through the SAME `apc.optimizer.optimize_machine` pipeline.  The bus
map carries the semantics, so the solver range seeding, the memory
send/receive pair cancellation, and the exec-bus collapse all transfer
unchanged to this adapter.

Everything below is deliberately disjoint from vm/machines.py: different
column names, different bus ids, different word plumbing (b/c operands
may be immediates, selected at machine-build time by the instruction's
flags, the way SP1 encodes `Instruction::new(op, a, b, c, imm_b, imm_c)`).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from ..apc.optimizer import DegreeBound, OptimizeReport, optimize_machine
from ..apc.symbolic_machine import BusMap, SymbolicBusInteraction, SymbolicMachine
from ..ir import expression as ir
from ..vm.isa import MachineBuilder, _bool

P = 2013265921

# SP1-flavored bus ids (disjoint from the native VM's 0..5 range on purpose:
# nothing may accidentally key on the numeric id — only on the bus map)
EXEC_BUS = 10  # (pc, clk)
MEM_BUS = 11  # (space, addr, byte0..byte3, clk)
PROG_BUS = 12  # (pc, opcode, a, b, c, imm_b, imm_c)
BYTE_BUS = 13  # (op, x, y, z): op 0 = U8 pair range, 1 = XOR, 2 = OR, 3 = AND

SP1_BUS_MAP = BusMap(
    {
        EXEC_BUS: "ExecutionBridge",
        MEM_BUS: "Memory",
        PROG_BUS: "PcLookup",
        BYTE_BUS: ("ByteOperations", ()),
    }
)

CLK_INC = 4  # SP1 bumps the clock by 4 per cycle
REG_SPACE = 0  # registers are memory in SP1 (space 0, addr = 4*reg)

OPCODES = ("ADD", "SUB", "XOR", "OR", "AND", "SLTU")
OPCODE_ID = {op: i for i, op in enumerate(OPCODES)}


@dataclass(frozen=True)
class Sp1Instruction:
    """SP1 executor-shaped instruction: `Instruction::new(op, a, b, c,
    imm_b, imm_c)` (sp1-benchmarks/tests/single_instructions.rs usage)."""

    opcode: str
    a: int  # destination register
    b: int  # register index or immediate (imm_b)
    c: int  # register index or immediate (imm_c)
    imm_b: bool = False
    imm_c: bool = False


@dataclass(frozen=True)
class Sp1Block:
    start_pc: int
    instructions: Tuple[Sp1Instruction, ...]


def _bytes_of(v: int) -> List[int]:
    return [(v >> (8 * i)) & 0xFF for i in range(4)]


class _Sp1Ctx:
    """Per-instruction machine scaffold (exec bridge + program lookup +
    register access helpers), SP1 layout."""

    def __init__(self, b: MachineBuilder, ins: Sp1Instruction):
        self.b = b
        self.ins = ins
        self.g = b.col("is_real")
        _bool(b, self.g)
        self.pc = b.col("pc")
        self.clk = b.col("clk")
        self.n_access = 0
        b.receive(EXEC_BUS, self.g, [self.pc, self.clk])
        b.send(
            PROG_BUS,
            self.g,
            [
                self.pc,
                ir.Const(OPCODE_ID[ins.opcode]),
                ir.Const(ins.a),
                ir.Const(ins.b),
                ir.Const(ins.c),
                ir.Const(int(ins.imm_b)),
                ir.Const(int(ins.imm_c)),
            ],
        )

    def byte_pair(self, x: ir.Expr, y: ir.Expr):
        self.b.send(BYTE_BUS, self.g, [ir.Const(0), x, y, ir.Const(0)])

    def word(self, prefix: str) -> List[ir.Var]:
        w = self.b.cols4(prefix)
        self.byte_pair(w[0], w[1])
        self.byte_pair(w[2], w[3])
        return w

    def _mem(self, addr: int, data: List[ir.Expr], write_data=None):
        """One register access: receive previous state, send new."""
        b = self.b
        k = self.n_access
        self.n_access += 1
        prev_clk = b.col(f"m{k}__prev_clk")
        t = ir.Add(self.clk, ir.Const(k + 1))
        if write_data is None:
            b.receive(MEM_BUS, self.g, [ir.Const(REG_SPACE), ir.Const(addr), *data, prev_clk])
            b.send(MEM_BUS, self.g, [ir.Const(REG_SPACE), ir.Const(addr), *data, t])
        else:
            b.receive(MEM_BUS, self.g, [ir.Const(REG_SPACE), ir.Const(addr), *data, prev_clk])
            b.send(MEM_BUS, self.g, [ir.Const(REG_SPACE), ir.Const(addr), *write_data, t])
        # clk ordering: diff = t - prev_clk - 1 checked as two bytes
        # (SP1 range-checks its 16/8-bit clk limb diffs over the byte bus)
        lo, hi = b.col(f"m{k}__d_lo"), b.col(f"m{k}__d_hi")
        b.require(
            ir.Mul(
                self.g,
                ir.Sub(
                    ir.Add(lo, ir.Mul(ir.Const(256), hi)),
                    ir.Sub(ir.Sub(t, prev_clk), ir.Const(1)),
                ),
            )
        )
        self.byte_pair(lo, hi)

    def operand(self, which: str) -> List[ir.Expr]:
        """b/c operand: an immediate (constant bytes, no access) or a
        register read."""
        ins = self.ins
        reg, is_imm = (ins.b, ins.imm_b) if which == "b" else (ins.c, ins.imm_c)
        if is_imm:
            return [ir.Const(x) for x in _bytes_of(reg)]
        w = self.word(f"{which}_val")
        self._mem(4 * reg, w)
        return w

    def write_a(self, value: List[ir.Expr]):
        prev = self.b.cols4("a_prev")
        self._mem(4 * self.ins.a, prev, write_data=value)

    def finish(self):
        self.b.send(
            EXEC_BUS,
            self.g,
            [ir.Add(self.pc, ir.Const(4)), ir.Add(self.clk, ir.Const(CLK_INC))],
        )


def _alu_machine(ins: Sp1Instruction) -> Tuple[MachineBuilder, _Sp1Ctx]:
    b = MachineBuilder(name=f"sp1_{ins.opcode.lower()}")
    ctx = _Sp1Ctx(b, ins)
    bb = ctx.operand("b")
    cc = ctx.operand("c")
    op = ins.opcode
    if op in ("ADD", "SUB"):
        a = ctx.word("a_val")
        carry = [b.col(f"car{i}") for i in range(4)]
        for cv in carry:
            _bool(b, cv)
        # ADD: a = b + c + carries; SUB: b = a + c (same adder, swapped roles)
        lhs, rhs = (a, (bb, cc)) if op == "ADD" else (bb, (a, cc))
        prev: Optional[ir.Expr] = None
        for i in range(4):
            s = ir.Add(rhs[0][i], rhs[1][i])
            if prev is not None:
                s = ir.Add(s, prev)
            b.require(
                ir.Mul(ctx.g, ir.Sub(ir.Add(lhs[i], ir.Mul(ir.Const(256), carry[i])), s))
            )
            prev = carry[i]
    elif op in ("XOR", "OR", "AND"):
        a = ctx.word("a_val")
        tag = {"XOR": 1, "OR": 2, "AND": 3}[op]
        for i in range(4):
            b.send(BYTE_BUS, ctx.g, [ir.Const(tag), bb[i], cc[i], a[i]])
    elif op == "SLTU":
        # a = (b < c): byte-lexicographic compare via borrow chain on b - c
        diff = ctx.word("diff")
        borrow = [b.col(f"bor{i}") for i in range(4)]
        for v in borrow:
            _bool(b, v)
        prev = None
        for i in range(4):
            s = ir.Sub(bb[i], cc[i]) if prev is None else ir.Sub(ir.Sub(bb[i], cc[i]), prev)
            b.require(
                ir.Mul(
                    ctx.g,
                    ir.Sub(diff[i], ir.Add(s, ir.Mul(ir.Const(256), borrow[i]))),
                )
            )
            prev = borrow[i]
        a = [borrow[3], ir.Const(0), ir.Const(0), ir.Const(0)]
    else:  # pragma: no cover
        raise ValueError(op)
    ctx.write_a(a)
    ctx.finish()
    return b, ctx


@dataclass
class Sp1Apc:
    block: Sp1Block
    machine: SymbolicMachine
    report: OptimizeReport
    name: str


def build_apc(block: Sp1Block, degree_bound: Optional[DegreeBound] = None) -> Sp1Apc:
    """Concatenate the block's SP1 instruction machines with fresh column
    ids, pin pcs, drop the program lookups (fixed code), and optimize with
    the SP1 bus map — the adapter-generic analog of
    `build::<Sp1ApcAdapter>` (sp1-benchmarks/tests/common.rs:29-36)."""
    constraints: List[ir.Expr] = []
    interactions: List[SymbolicBusInteraction] = []
    next_id = 0
    for i, ins in enumerate(block.instructions):
        b, ctx = _alu_machine(ins)
        local = b.machine()
        id_map: Dict[int, ir.Expr] = {}
        for local_id, name in enumerate(b.cols):
            id_map[local_id] = ir.Var(name=f"{name}_{i}", id=next_id)
            next_id += 1

        def remap(e: ir.Expr) -> ir.Expr:
            if isinstance(e, ir.Var):
                return id_map[e.id]
            if isinstance(e, ir.Const):
                return e
            if isinstance(e, ir.Add):
                return ir.Add(remap(e.lhs), remap(e.rhs))
            if isinstance(e, ir.Sub):
                return ir.Sub(remap(e.lhs), remap(e.rhs))
            if isinstance(e, ir.Mul):
                return ir.Mul(remap(e.lhs), remap(e.rhs))
            if isinstance(e, ir.Neg):
                return ir.Neg(remap(e.operand))
            raise TypeError(type(e))

        pc_col = b.cols.index("pc")
        constraints.append(ir.Sub(id_map[pc_col], ir.Const(block.start_pc + 4 * i)))
        constraints.extend(remap(c) for c in local.constraints)
        for bi in local.bus_interactions:
            if bi.id == PROG_BUS:
                continue  # fixed program
            interactions.append(
                SymbolicBusInteraction(
                    id=bi.id, mult=remap(bi.mult), args=[remap(a) for a in bi.args]
                )
            )
    machine = SymbolicMachine(constraints=constraints, bus_interactions=interactions)
    optimized, report = optimize_machine(machine, SP1_BUS_MAP, degree_bound)
    return Sp1Apc(
        block=block, machine=optimized, report=report, name=f"sp1_apc_{block.start_pc:#x}"
    )


# -- snapshot rendering -------------------------------------------------------
# Reference-style rendered machines (sp1-benchmarks/tests/apc_snapshots/**:
# instruction listing, before/after counts, unique columns, constraints and
# bus interactions) — a stable text form the snapshot corpus diffs against.


def _fmt(e: ir.Expr) -> str:
    if isinstance(e, ir.Const):
        v = e.value % P
        return str(v if v <= P // 2 else v - P)  # small negatives read better
    if isinstance(e, ir.Var):
        return e.name
    if isinstance(e, ir.Add):
        return f"({_fmt(e.lhs)} + {_fmt(e.rhs)})"
    if isinstance(e, ir.Sub):
        return f"({_fmt(e.lhs)} - {_fmt(e.rhs)})"
    if isinstance(e, ir.Mul):
        return f"({_fmt(e.lhs)} * {_fmt(e.rhs)})"
    if isinstance(e, ir.Neg):
        return f"(-{_fmt(e.operand)})"
    raise TypeError(type(e))


def render_apc(apc: Sp1Apc) -> str:
    """Deterministic text rendering for file snapshots (the shape of the
    reference's sp1 snapshot files: instruction list, APC advantage with
    before/after counts, the machine itself)."""
    block, m, rep = apc.block, apc.machine, apc.report
    lines = ["Instructions:"]
    for i, ins in enumerate(block.instructions):
        ops = f"b={'#' if ins.imm_b else 'r'}{ins.b} c={'#' if ins.imm_c else 'r'}{ins.c}"
        lines.append(f"    {i}: {ins.opcode:<6} a=r{ins.a} {ops}")
    lines.append("")
    b, a = rep.before, rep.after

    def ratio(x, y):
        return f"{x / y:.2f}x" if y else "-"

    lines.append("APC advantage:")
    lines.append(
        f"  - Main columns: {b['columns']} -> {a['columns']} "
        f"({ratio(b['columns'], a['columns'])} reduction)"
    )
    lines.append(
        f"  - Bus interactions: {b['bus_interactions']} -> {a['bus_interactions']} "
        f"({ratio(b['bus_interactions'], a['bus_interactions'])} reduction)"
    )
    lines.append(
        f"  - Constraints: {b['constraints']} -> {a['constraints']} "
        f"({ratio(b['constraints'], a['constraints'])} reduction)"
    )
    lines.append("")
    names = sorted(m.variables().values())
    lines.append(f"Symbolic machine using {len(names)} unique main columns:")
    for n in names:
        lines.append(f"  {n}")
    lines.append("")
    lines.append("Constraints:")
    for c in m.constraints:
        lines.append(f"  {_fmt(c)} = 0")
    lines.append("")
    lines.append("Bus interactions:")
    bus_names = {EXEC_BUS: "EXEC", MEM_BUS: "MEMORY", PROG_BUS: "PROGRAM", BYTE_BUS: "BYTE"}
    for t in m.bus_interactions:
        args = ", ".join(_fmt(x) for x in t.args)
        lines.append(f"  {bus_names.get(t.id, t.id)}: mult={_fmt(t.mult)}, args=[{args}]")
    lines.append("")
    return "\n".join(lines)
