"""VM executor: runs programs, produces per-chip witness records, memory
boundary state, and the PC execution profile.

Counterpart of the reference's preflight execution + tracegen arenas
(/root/reference/openvm/src/powdr_extension/executor/mod.rs:457-600) and
the PGO execution profile (autoprecompiles/src/execution_profile.rs:27-50),
restructured natively: we execute once and emit witness records directly
(no record-arena indirection — our chips are defined in this framework).

Timestamp discipline: every instruction occupies TS_DELTA ticks; access k
of an instruction at from_ts=T happens at T+k.  All cells start written
at ts 0 by the memory-init boundary chip."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from .isa import Instruction, OPCODE_ID, TS_DELTA
from .machines import registry

MASK32 = 0xFFFFFFFF

# hints extension (k256 field intrinsics; reference extensions/hints-*)
K256_P = 2**256 - 2**32 - 977
R256 = (1 << 256) % K256_P
R256_SQ = R256 * R256 % K256_P
R256_INV = pow(R256, K256_P - 2, K256_P)


@dataclass
class ExecutionResult:
    records: Dict[str, List[dict]]  # opcode -> witness records
    pc_trace: List[int]
    final_mem: Dict[Tuple[int, int], Tuple[int, int]]  # (space,ptr) -> (ts, value)
    initial_cells: List[Tuple[int, int, int]]  # (space, ptr, value) touched at start
    instret: int
    halted: bool
    #: opcode -> {field: (n,) uint64 array, "prev_ts": list of arrays} —
    #: set by executor_native.run_native_columnar; enables the vectorized
    #: witgen path (vm/witgen_vec.py) without materializing row dicts
    records_columnar: "Optional[Dict[str, dict]]" = None
    #: segmentation refresh rows (epoch handoff; see system.mem_refresh_chip):
    #: {"seg","space","ptr","val","prev_ts"} arrays / {"seg","pc","prev_ts"}
    mem_refresh: "Optional[dict]" = None
    exec_refresh: "Optional[dict]" = None
    #: timestamp ticks per segment epoch (E); set when segmented
    epoch_ticks: int = 0
    #: program[i] sits at vaddr pc_base + 4*i; execution began at start_pc
    pc_base: int = 0
    start_pc: int = 0


class Executor:
    def __init__(
        self,
        program: List[Instruction],
        initial_mem: Optional[Dict[int, int]] = None,
        pc_base: int = 0,
        start_pc: Optional[int] = None,
    ):
        self.program = program
        self.pc_base = pc_base
        self.start_pc = start_pc if start_pc is not None else pc_base
        self.regs = [0] * 32
        self.mem: Dict[int, int] = dict(initial_mem or {})
        self.initial_mem = dict(initial_mem or {})
        # (space, ptr) -> (last_ts, value); everything starts at ts 0
        self.cells: Dict[Tuple[int, int], Tuple[int, int]] = {}
        self.touched_initial: Dict[Tuple[int, int], int] = {}
        self._cur_epoch, self._epoch_ticks = 0, 0
        self._created_epoch: Dict[Tuple[int, int], int] = {}
        self.hint_queue: List[int] = []

    def _cell(self, space: int, ptr: int) -> Tuple[int, int]:
        key = (space, ptr)
        if key not in self.cells:
            if space == 1:
                init = 0
            else:
                init = self.initial_mem.get(ptr, 0)
            # segmentation: cells first touched in epoch k > 0 start
            # refreshed at ts = k*E (backfill rows emitted at finalize)
            start_ts = self._cur_epoch * self._epoch_ticks
            self.cells[key] = (start_ts, init)
            self.touched_initial[key] = init
            if self._cur_epoch > 0:
                self._created_epoch[key] = self._cur_epoch
        return self.cells[key]

    def _read(self, space: int, ptr: int, t: int) -> Tuple[int, int]:
        """Returns (prev_ts, value) and bumps the cell's timestamp."""
        prev_ts, val = self._cell(space, ptr)
        assert prev_ts < t, f"timestamp order violated at {(space, ptr)}"
        self.cells[(space, ptr)] = (t, val)
        return prev_ts, val

    def _write(self, space: int, ptr: int, val: int, t: int) -> Tuple[int, int]:
        prev_ts, prev = self._cell(space, ptr)
        assert prev_ts < t
        self.cells[(space, ptr)] = (t, val)
        return prev_ts, prev

    def run(
        self, max_steps: int = 1 << 20, segment_steps: Optional[int] = None
    ) -> ExecutionResult:
        if segment_steps is None:
            # default to the ISA's epoch cap (read at call time so CLI
            # --small-tables DT_BITS shrinkage takes effect): otherwise a
            # memory-cell revisit after > 2^DT_BITS ticks overflows the
            # timestamp-gap range check
            from . import isa as _isa

            segment_steps = (1 << _isa.DT_BITS) // TS_DELTA
        records: Dict[str, List[dict]] = {}
        pc_trace: List[int] = []
        pc, ts = self.start_pc, 1
        halted = False
        steps = 0
        E = (segment_steps or 0) * TS_DELTA
        self._cur_epoch, self._epoch_ticks = 0, E
        self._created_epoch: Dict[Tuple[int, int], int] = {}
        mem_ref = {"seg": [], "space": [], "ptr": [], "val": [], "prev_ts": []}
        exec_ref = {"seg": [], "pc": [], "prev_ts": []}
        while steps < max_steps:
            if segment_steps and steps > 0 and steps % segment_steps == 0:
                # epoch boundary: hand execution + every touched cell across
                b = steps // segment_steps
                exec_ref["seg"].append(b)
                exec_ref["pc"].append(pc)
                exec_ref["prev_ts"].append(ts)
                ts = b * E + 1
                for (sp, pt), (cts, val) in self.cells.items():
                    mem_ref["seg"].append(b)
                    mem_ref["space"].append(sp)
                    mem_ref["ptr"].append(pt)
                    mem_ref["val"].append(val)
                    mem_ref["prev_ts"].append(cts)
                    self.cells[(sp, pt)] = (b * E, val)
                self._cur_epoch = b
            idx = (pc - self.pc_base) // 4
            assert pc >= self.pc_base and 0 <= idx < len(self.program), f"pc {pc} out of program"
            ins = self.program[idx]
            pc_trace.append(pc)
            rec = {
                "op": ins.op,
                "pc": pc,
                "ts": ts,
                "rd": ins.rd,
                "rs1": ins.rs1,
                "rs2": ins.rs2,
                "imm": ins.imm % (1 << 32),
                "prev_ts": [],
            }
            next_pc = pc + 4
            op = ins.op
            if op == "halt":
                records.setdefault(op, []).append(rec)
                halted = True
                break
            k = 0

            def rd_reg(r):
                nonlocal k
                p, v = self._read(1, r, ts + k)
                rec["prev_ts"].append(p)
                k += 1
                return v

            def wr_reg(r, v):
                nonlocal k
                p, prev = self._write(1, r, v & MASK32, ts + k)
                rec["prev_ts"].append(p)
                k += 1
                return prev

            imm = ins.imm % (1 << 32)

            def signed(v):
                return v - (1 << 32) if v & 0x80000000 else v

            if op in (
                "add", "sub", "and", "or", "xor", "mul", "sltu", "slt",
                "sll", "srl", "sra", "mulh", "mulhu", "mulhsu",
                "divu", "remu", "div", "rem",
            ):
                a = rd_reg(ins.rs1)
                y = rd_reg(ins.rs2)
                rec["rs1_val"], rec["rs2_val"] = a, y
                s = y & 31
                if op == "add":
                    z = a + y
                elif op == "sub":
                    z = a - y
                elif op == "and":
                    z = a & y
                elif op == "or":
                    z = a | y
                elif op == "xor":
                    z = a ^ y
                elif op == "mul":
                    z = a * y
                elif op == "mulhu":
                    z = (a * y) >> 32
                elif op == "mulh":
                    z = (signed(a) * signed(y)) >> 32
                elif op == "mulhsu":
                    z = (signed(a) * y) >> 32
                elif op == "sltu":
                    z = 1 if a < y else 0
                elif op == "slt":
                    z = 1 if signed(a) < signed(y) else 0
                elif op == "sll":
                    z = a << s
                elif op == "srl":
                    z = a >> s
                elif op == "sra":
                    z = signed(a) >> s
                elif op == "divu":
                    z = a // y if y else MASK32
                elif op == "remu":
                    z = a % y if y else a
                elif op == "div":
                    if y == 0:
                        z = MASK32
                    else:
                        sa, sy = signed(a), signed(y)
                        z = abs(sa) // abs(sy)
                        if (sa < 0) != (sy < 0):
                            z = -z
                else:  # rem
                    if y == 0:
                        z = a
                    else:
                        sa, sy = signed(a), signed(y)
                        z = abs(sa) % abs(sy)
                        if sa < 0:
                            z = -z
                rec["rd_prev"] = wr_reg(ins.rd, z & MASK32)
            elif op in ("addi", "andi", "ori", "xori", "slti", "sltiu"):
                a = rd_reg(ins.rs1)
                rec["rs1_val"] = a
                z = {
                    "addi": a + imm,
                    "andi": a & imm,
                    "ori": a | imm,
                    "xori": a ^ imm,
                    "slti": 1 if signed(a) < signed(imm) else 0,
                    "sltiu": 1 if a < imm else 0,
                }[op] & MASK32
                rec["rd_prev"] = wr_reg(ins.rd, z)
            elif op in ("slli", "srli", "srai"):
                a = rd_reg(ins.rs1)
                rec["rs1_val"] = a
                s = imm & 31
                z = {
                    "slli": (a << s) & MASK32,
                    "srli": a >> s,
                    "srai": (signed(a) >> s) & MASK32,
                }[op]
                rec["rd_prev"] = wr_reg(ins.rd, z)
            elif op == "lui":
                rec["rd_prev"] = wr_reg(ins.rd, imm)
            elif op == "auipc":
                rec["rd_prev"] = wr_reg(ins.rd, (pc + imm) & MASK32)
            elif op in ("lb", "lbu", "lh", "lhu"):
                a = rd_reg(ins.rs1)
                rec["rs1_val"] = a
                addr = (a + imm) & MASK32
                align = 2 if op in ("lh", "lhu") else 1
                assert addr % align == 0 and addr < (1 << 30), f"bad addr {addr:#x}"
                off = addr & 3
                word_addr = addr - off
                p, word = self._read(2, word_addr, ts + k)
                rec["prev_ts"].append(p)
                k += 1
                rec["mem_val"] = word
                if op in ("lb", "lbu"):
                    v = (word >> (8 * off)) & 0xFF
                    if op == "lb" and v & 0x80:
                        v |= 0xFFFFFF00
                else:
                    v = (word >> (8 * off)) & 0xFFFF
                    if op == "lh" and v & 0x8000:
                        v |= 0xFFFF0000
                rec["rd_prev"] = wr_reg(ins.rd, v)
            elif op in ("sb", "sh"):
                a = rd_reg(ins.rs1)
                y = rd_reg(ins.rs2)
                rec["rs1_val"], rec["rs2_val"] = a, y
                addr = (a + imm) & MASK32
                align = 2 if op == "sh" else 1
                assert addr % align == 0 and addr < (1 << 30), f"bad addr {addr:#x}"
                off = addr & 3
                word_addr = addr - off
                _, prev = self._cell(2, word_addr)
                if op == "sb":
                    new = (prev & ~(0xFF << (8 * off))) | ((y & 0xFF) << (8 * off))
                else:
                    new = (prev & ~(0xFFFF << (8 * off))) | ((y & 0xFFFF) << (8 * off))
                p, prev = self._write(2, word_addr, new & MASK32, ts + k)
                rec["prev_ts"].append(p)
                k += 1
                rec["mem_prev"] = prev
            elif op == "lw":
                a = rd_reg(ins.rs1)
                rec["rs1_val"] = a
                addr = (a + imm) & MASK32
                assert addr % 4 == 0 and addr < (1 << 30), f"bad addr {addr:#x}"
                p, v = self._read(2, addr, ts + k)
                rec["prev_ts"].append(p)
                k += 1
                rec["mem_val"] = v
                rec["rd_prev"] = wr_reg(ins.rd, v)
            elif op == "sw":
                a = rd_reg(ins.rs1)
                y = rd_reg(ins.rs2)
                rec["rs1_val"], rec["rs2_val"] = a, y
                addr = (a + imm) & MASK32
                assert addr % 4 == 0 and addr < (1 << 30), f"bad addr {addr:#x}"
                p, prev = self._write(2, addr, y, ts + k)
                rec["prev_ts"].append(p)
                k += 1
                rec["mem_prev"] = prev
            elif op in ("beq", "bne", "blt", "bge", "bltu", "bgeu"):
                a = rd_reg(ins.rs1)
                y = rd_reg(ins.rs2)
                rec["rs1_val"], rec["rs2_val"] = a, y
                taken = {
                    "beq": a == y,
                    "bne": a != y,
                    "blt": signed(a) < signed(y),
                    "bge": signed(a) >= signed(y),
                    "bltu": a < y,
                    "bgeu": a >= y,
                }[op]
                if taken:
                    next_pc = imm
            elif op == "jal":
                rec["rd_prev"] = wr_reg(ins.rd, pc + 4)
                next_pc = imm
            elif op == "jalr":
                a = rd_reg(ins.rs1)
                rec["rs1_val"] = a
                rec["rd_prev"] = wr_reg(ins.rd, pc + 4)
                next_pc = (a + imm) & MASK32
            elif op == "revb":
                a = rd_reg(ins.rs1)
                rec["rs1_val"] = a
                z = int.from_bytes(a.to_bytes(4, "little"), "big")
                rec["rd_prev"] = wr_reg(ins.rd, z)
            elif op in ("hintinv", "hintsqrt"):
                # phantom (hints extension): host-side read of 8 RAM words at
                # the pointer in rs1; result limbs go to the hint queue.  No
                # circuit memory access — the value is unconstrained until
                # the guest verifies it (reference: hints-circuit phantom
                # executors, /root/reference/openvm-riscv/extensions/).
                _, ptr = self._cell(1, ins.rs1)
                x = 0
                for i in range(8):
                    _, w = self._cell(2, (ptr + 4 * i) & MASK32)
                    x |= w << (32 * i)
                if op == "hintinv":
                    # Montgomery-aware: v = x^-1 * R^2, so mont(a) maps to
                    # mont(a^-1) (guest field core is Montgomery, R = 2^256)
                    v = pow(x % K256_P, K256_P - 2, K256_P) * R256_SQ % K256_P if x % K256_P else 0
                else:
                    raw = x * R256_INV % K256_P  # a = mont(raw)
                    s = pow(raw, (K256_P + 1) // 4, K256_P)
                    v = s * R256 % K256_P  # mont(sqrt)
                for i in range(8):
                    self.hint_queue.append((v >> (32 * i)) & MASK32)
            elif op == "hintpop":
                assert self.hint_queue, "hintpop on empty hint queue"
                v = self.hint_queue.pop(0)
                rec["rd_val"] = rec["mem_val"] = v
                rec["rd_prev"] = wr_reg(ins.rd, v)
            else:
                raise ValueError(f"unknown opcode {op}")
            records.setdefault(op, []).append(rec)
            pc = next_pc
            ts += TS_DELTA
            steps += 1
        assert halted, "program did not halt"
        final = dict(self.cells)
        initial = [(s, p, v) for (s, p), v in sorted(self.touched_initial.items())]
        if segment_steps:
            # backfill refresh chains for cells first touched in epoch k > 0
            # (rows (m, cell, init, (m-1)*E) for m = 1..k), then canonical
            # (seg, space, ptr) order — matches the native core
            for (sp, pt), kk in self._created_epoch.items():
                init_v = self.touched_initial[(sp, pt)]
                for m in range(1, kk + 1):
                    mem_ref["seg"].append(m)
                    mem_ref["space"].append(sp)
                    mem_ref["ptr"].append(pt)
                    mem_ref["val"].append(init_v)
                    mem_ref["prev_ts"].append((m - 1) * E)
            import numpy as _np

            order = _np.lexsort(
                (
                    _np.asarray(mem_ref["ptr"], dtype=_np.uint64),
                    _np.asarray(mem_ref["space"], dtype=_np.uint64),
                    _np.asarray(mem_ref["seg"], dtype=_np.int64),
                )
            )
            mem_refresh = {
                k: _np.asarray(v, dtype=_np.int64 if k == "seg" else _np.uint64)[order]
                for k, v in mem_ref.items()
            }
            exec_refresh = {
                k: _np.asarray(v, dtype=_np.int64 if k == "seg" else _np.uint64)
                for k, v in exec_ref.items()
            }
        else:
            mem_refresh = exec_refresh = None
        return ExecutionResult(
            records=records,
            pc_trace=pc_trace,
            final_mem=final,
            initial_cells=initial,
            instret=steps + 1,
            halted=halted,
            mem_refresh=mem_refresh,
            exec_refresh=exec_refresh,
            epoch_ticks=E if segment_steps else 0,
            pc_base=self.pc_base,
            start_pc=self.start_pc,
        )


#: opcodes that write rd (x0 writes are rejected by the assembler — the
#: machines have no x0-discard path; compilers targeting this VM rename)
WRITES_RD = {
    "add", "sub", "and", "or", "xor", "sll", "srl", "sra", "slt", "sltu",
    "addi", "andi", "ori", "xori", "slli", "srli", "srai", "slti", "sltiu",
    "lui", "auipc", "lw", "lb", "lbu", "lh", "lhu", "jal", "jalr",
    "mul", "mulh", "mulhu", "mulhsu", "div", "divu", "rem", "remu",
}


# -- assembler ---------------------------------------------------------------


def assemble(lines: List[Tuple], labels_at: Optional[Dict[str, int]] = None) -> List[Instruction]:
    """Tiny assembler: each line is (op, rd, rs1, rs2, imm) with imm either
    an int or a label string; 'label:' entries define positions."""
    labels: Dict[str, int] = {}
    insns: List[Tuple] = []
    for line in lines:
        if isinstance(line, str):
            assert line.endswith(":")
            labels[line[:-1]] = len(insns) * 4
        else:
            insns.append(line)
    out = []
    for t in insns:
        op = t[0]
        rd, rs1, rs2, imm = (list(t[1:]) + [0, 0, 0, 0])[:4]
        if isinstance(imm, str):
            imm = labels[imm]
        assert not (rd == 0 and op in WRITES_RD), "writes to x0 unsupported"
        out.append(Instruction(op=op, rd=rd, rs1=rs1, rs2=rs2, imm=imm))
    return out
