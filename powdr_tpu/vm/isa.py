"""powdr-tpu VM instruction set: rv32im-flavored, OpenVM-shaped buses.

The reference integrates into OpenVM and extracts that zkVM's instruction
AIRs (/root/reference/openvm/src/extraction_utils.rs).  Our VM is native
to this framework, but keeps the same circuit shape so the whole APC
toolchain (solver, exec-bus collapsing, memory optimizer, bus handlers)
applies unchanged:

  * 32-bit words as 4 byte limbs (products of byte limbs stay < p)
  * registers: memory bus address space 1, pointer = register index
  * RAM: address space 2, word-granular at 4-aligned byte addresses
  * timestamped memory argument: every access is a receive of
    (space, ptr, bytes, prev_ts) and a send of (space, ptr, bytes, ts),
    with ts - prev_ts - 1 range-checked (24 bits)
  * ExecutionBridge (pc, timestamp), PcLookup (pc, opcode, rd, rs1, rs2,
    imm), VariableRangeChecker, BitwiseLookup (op0 = byte range pair,
    op1 = xor), and a Pow2 bus for variable shifts

Buses: 0 ExecutionBridge, 1 Memory, 2 PcLookup, 3 VariableRangeChecker,
6 BitwiseLookup, 7 Pow2 (bus 7 differs from OpenVM's tuple checker; our
bus_map marks it Other("Pow2")).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

from ..ir import expression as ir
from .. import apc
from ..apc.symbolic_machine import BusMap, SymbolicBusInteraction, SymbolicMachine

EXEC_BUS = 0
MEM_BUS = 1
PC_BUS = 2
RANGE_BUS = 3
BITWISE_BUS = 6
POW2_BUS = 7

TS_DELTA = 8  # timestamp budget per instruction (max memory accesses)
DT_BITS = 18  # timestamp-gap range check width (caps segment length at
              # 2^DT_BITS/TS_DELTA = 32768 instructions; see system.MAX_RANGE_BITS)
EPOCH_TICKS = 1 << DT_BITS  # timestamp epoch per segment
SEG_STEPS = EPOCH_TICKS // TS_DELTA  # max instructions per segment (32768);
# longer executions run segmented (executor segment_steps) with per-epoch
# refresh chips (system.mem_refresh_chip/exec_refresh_chip) — counterpart
# of the reference's SegmentationLimits (openvm-riscv/src/lib.rs:270-283)
CARRY_BITS = 10  # long-multiplication carry range width

VM_BUS_MAP = BusMap(
    {
        EXEC_BUS: "ExecutionBridge",
        MEM_BUS: "Memory",
        PC_BUS: "PcLookup",
        RANGE_BUS: "VariableRangeChecker",
        BITWISE_BUS: "BitwiseLookup",
        POW2_BUS: "Pow2",
    }
)

# opcode ids (full rv32im surface, openvm-riscv/src/isa/opcode.rs:9-60
# counterpart; new opcodes append at the end to keep ids stable)
OPCODES = [
    "add", "sub", "and", "or", "xor", "sll", "srl", "slt", "sltu",
    "addi", "andi", "ori", "xori", "slli", "srli",
    "lui",
    "lw", "sw",
    "beq", "bne", "blt", "bltu",
    "jal", "jalr",
    "mul", "divu",
    "halt",
    "sra", "srai", "slti", "sltiu",
    "bge", "bgeu",
    "remu", "div", "rem",
    "mulh", "mulhu", "mulhsu",
    "lb", "lbu", "lh", "lhu", "sb", "sh",
    "auipc",
    # hints extension (reference: openvm-riscv/extensions/hints-*, custom-2
    # opcode 0x5b — ReverseBytes + K256 field inverse/sqrt intrinsics whose
    # results are phantom: the executor supplies them, the guest verifies):
    #   revb rd, rs1          rd = byte-reversed rs1 (fully constrained)
    #   hintinv rs1           push k256-field inverse of [RAM rs1..rs1+32)
    #                         onto the hint queue (8 limbs, Montgomery-aware:
    #                         v = in^-1 * R^2 mod p so mont inputs give mont
    #                         inverses; executor.py::K256_P)
    #   hintsqrt rs1          push k256-field sqrt likewise
    #   hintpop rd            rd = next hint-queue word (unconstrained value;
    #                         byte-range-checked only — guest must verify)
    "revb", "hintinv", "hintsqrt", "hintpop",
]
OPCODE_ID = {name: i for i, name in enumerate(OPCODES)}


@dataclass
class Instruction:
    op: str
    rd: int = 0
    rs1: int = 0
    rs2: int = 0
    imm: int = 0  # canonical field value (branch/jump targets absolute)

    def pc_args(self, pc: int) -> List[int]:
        # imm travels as two 16-bit halves: a single field element cannot
        # uniquely encode a 32-bit word (p < 2^32)
        imm = self.imm % (1 << 32)
        return [pc, OPCODE_ID[self.op], self.rd, self.rs1, self.rs2, imm & 0xFFFF, imm >> 16]


@dataclass
class MachineBuilder:
    """Builds one instruction's SymbolicMachine; mirrors the reference's
    symbolic instruction builder (openvm-riscv isa/symbolic_instruction_builder.rs)."""

    name: str
    cols: List[str] = field(default_factory=list)
    constraints: List[ir.Expr] = field(default_factory=list)
    interactions: List[SymbolicBusInteraction] = field(default_factory=list)
    _ids: Dict[str, ir.Var] = field(default_factory=dict)

    def col(self, name: str) -> ir.Var:
        if name not in self._ids:
            v = ir.Var(name=name, id=len(self.cols))
            self._ids[name] = v
            self.cols.append(name)
        return self._ids[name]

    def cols4(self, prefix: str) -> List[ir.Var]:
        return [self.col(f"{prefix}__{i}") for i in range(4)]

    def require(self, e: ir.Expr):
        self.constraints.append(e)

    def send(self, bus: int, mult: ir.Expr, args: List[ir.Expr]):
        self.interactions.append(SymbolicBusInteraction(id=bus, mult=mult, args=args))

    def receive(self, bus: int, mult: ir.Expr, args: List[ir.Expr]):
        self.interactions.append(
            SymbolicBusInteraction(id=bus, mult=ir.Neg(mult), args=args)
        )

    def machine(self) -> SymbolicMachine:
        return SymbolicMachine(
            constraints=list(self.constraints), bus_interactions=list(self.interactions)
        )


def _word(bs: List[ir.Var]) -> ir.Expr:
    out: ir.Expr = bs[0]
    for i in range(1, 4):
        out = ir.Add(out, ir.Mul(ir.Const(1 << (8 * i)), bs[i]))
    return out


USE_BITWISE_FOR_BYTE_RANGE = True  # False: route byte checks over the
# range-checker bus instead (2 sends) — lets byte-op-free programs prove
# without the 2^17-row bitwise table (CI-sized proofs)


def _byte_range_pair(b: MachineBuilder, g: ir.Expr, x: ir.Expr, y: ir.Expr):
    """Range-check two bytes (one BitwiseLookup op=0 interaction, or two
    range-checker sends when the bitwise table is disabled)."""
    if USE_BITWISE_FOR_BYTE_RANGE:
        b.send(BITWISE_BUS, g, [x, y, ir.Const(0), ir.Const(0)])
    else:
        b.send(RANGE_BUS, g, [x, ir.Const(8)])
        b.send(RANGE_BUS, g, [y, ir.Const(8)])


def _bool(b: MachineBuilder, v: ir.Var):
    b.require(ir.Mul(v, ir.Sub(v, ir.Const(1))))


class Ctx:
    """Per-instruction build context: pc/timestamp plumbing + memory access
    helpers, shared by every opcode builder."""

    def __init__(self, b: MachineBuilder):
        self.b = b
        self.g = b.col("is_valid")
        self.pc = b.col("from_pc")
        self.ts = b.col("from_ts")
        self.rd = b.col("rd_ptr")
        self.rs1 = b.col("rs1_ptr")
        self.rs2 = b.col("rs2_ptr")
        self.imm_lo = b.col("imm_lo")
        self.imm_hi = b.col("imm_hi")
        self.n_access = 0
        _bool(b, self.g)
        b.receive(EXEC_BUS, self.g, [self.pc, self.ts])
        b.send(
            PC_BUS,
            self.g,
            [self.pc, ir.Const(-1), self.rd, self.rs1, self.rs2, self.imm_lo, self.imm_hi],
        )

    def imm_field(self) -> ir.Expr:
        """imm as a field value — only sound when imm < 2^30 (targets)."""
        return ir.Add(self.imm_lo, ir.Mul(ir.Const(1 << 16), self.imm_hi))

    def set_opcode(self, op: str):
        # patch the PcLookup opcode slot
        pc_int = self.b.interactions[1]
        pc_int.args[1] = ir.Const(OPCODE_ID[op])

    def _access(self, space: int, ptr: ir.Expr, data: List[ir.Var], prefix: str):
        b = self.b
        prev_ts = b.col(f"{prefix}__prev_ts")
        dt = b.col(f"{prefix}__dt")
        t = ir.Add(self.ts, ir.Const(self.n_access))
        self.n_access += 1
        b.receive(MEM_BUS, self.g, [ir.Const(space), ptr, *data, prev_ts])
        b.send(MEM_BUS, self.g, [ir.Const(space), ptr, *data, t])
        # ts ordering: dt = t - prev_ts - 1 in [0, 2^24)
        b.require(ir.Mul(self.g, ir.Sub(dt, ir.Sub(ir.Sub(t, prev_ts), ir.Const(1)))))
        b.send(RANGE_BUS, self.g, [dt, ir.Const(DT_BITS)])
        return prev_ts

    def read(self, space: int, ptr: ir.Expr, prefix: str) -> List[ir.Var]:
        data = self.b.cols4(f"{prefix}__data")
        self._access(space, ptr, data, prefix)
        return data

    def write(self, space: int, ptr: ir.Expr, data: List[ir.Var], prefix: str):
        b = self.b
        prev = b.cols4(f"{prefix}__prev_data")
        prev_ts = b.col(f"{prefix}__prev_ts")
        dt = b.col(f"{prefix}__dt")
        t = ir.Add(self.ts, ir.Const(self.n_access))
        self.n_access += 1
        b.receive(MEM_BUS, self.g, [ir.Const(space), ptr, *prev, prev_ts])
        b.send(MEM_BUS, self.g, [ir.Const(space), ptr, *data, t])
        b.require(ir.Mul(self.g, ir.Sub(dt, ir.Sub(ir.Sub(t, prev_ts), ir.Const(1)))))
        b.send(RANGE_BUS, self.g, [dt, ir.Const(DT_BITS)])

    def finish(self, to_pc: Optional[ir.Expr] = None):
        b = self.b
        nxt = to_pc if to_pc is not None else ir.Add(self.pc, ir.Const(4))
        b.send(EXEC_BUS, self.g, [nxt, ir.Add(self.ts, ir.Const(TS_DELTA))])
