"""ctypes bridge to the C++ executor core (native/exec_core.cpp).

Runs the same semantics as the python Executor at native speed and
reconstructs an identical ExecutionResult (records, pc trace, boundary
state).  Builds the shared library on first use (g++; cached next to the
source)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

from .executor import ExecutionResult
from .isa import Instruction, OPCODES, OPCODE_ID, TS_DELTA

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB = None


def _build_lib() -> str:
    src = os.path.join(_NATIVE_DIR, "exec_core.cpp")
    out = os.path.join(_NATIVE_DIR, "libexec_core.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", out, src],
            check=True,
        )
    return out


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        lib.powdr_execute.restype = ctypes.c_int64
        lib.powdr_execute.argtypes = [
            i32p, i32p, i32p, i32p, u32p, ctypes.c_int64,
            u64p, u32p, ctypes.c_int64,
            ctypes.c_int64,
            i32p, u32p, u64p, u32p, u32p, u32p, u32p, u32p, u64p,
            u64p, u64p, u32p, u32p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            # segmentation: epoch_steps, mem-refresh rows, exec-refresh rows
            ctypes.c_int64,
            i64p, u64p, u32p, u64p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            i64p, u32p, u64p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_uint32, ctypes.c_uint32,
        ]
        _LIB = lib
    return _LIB


# per-opcode access counts in record order (matches machines.py witgen)
_N_ACCESS = {
    **{op: 3 for op in (
        "add", "sub", "and", "or", "xor", "mul", "mulh", "mulhu", "mulhsu",
        "sltu", "slt", "sll", "srl", "sra", "divu", "remu", "div", "rem",
    )},
    **{op: 2 for op in (
        "addi", "andi", "ori", "xori", "slti", "sltiu", "slli", "srli", "srai",
    )},
    "lui": 1, "auipc": 1,
    "lw": 3, "sw": 3, "lb": 3, "lbu": 3, "lh": 3, "lhu": 3, "sb": 3, "sh": 3,
    **{op: 2 for op in ("beq", "bne", "blt", "bge", "bltu", "bgeu")},
    "jal": 1, "jalr": 2, "halt": 0,
    "revb": 2, "hintinv": 0, "hintsqrt": 0, "hintpop": 1,
}


_BUFS: Dict[int, tuple] = {}


def _buffers(max_steps: int):
    """Output buffers are reused across runs — first-touch page faults on
    fresh numpy allocations otherwise dominate the native core's runtime."""
    if max_steps not in _BUFS:
        _BUFS.clear()
        _BUFS[max_steps] = (
            np.empty(max_steps, dtype=np.int32),
            np.empty(max_steps, dtype=np.uint32),
            np.empty(max_steps, dtype=np.uint64),
            np.empty(max_steps, dtype=np.uint32),
            np.empty(max_steps, dtype=np.uint32),
            np.empty(max_steps, dtype=np.uint32),
            np.empty(max_steps, dtype=np.uint32),
            np.empty(max_steps, dtype=np.uint32),
            np.empty(4 * max_steps, dtype=np.uint64),
        )
    return _BUFS[max_steps]



def _default_segment_steps(segment_steps):
    """Same default as Executor.run: the ISA's timestamp epoch cap
    (re-read so --small-tables DT_BITS shrinkage takes effect)."""
    if segment_steps is not None:
        return segment_steps
    from . import isa as _isa

    return (1 << _isa.DT_BITS) // TS_DELTA


def _call_core(program, initial_mem, max_steps, segment_steps, pc_base=0, start_pc=None):
    """Invoke the native core; returns (steps, buffers..., refresh arrays)."""
    lib = _lib()
    n = len(program)
    op = np.array([OPCODE_ID[i.op] for i in program], dtype=np.int32)
    rd = np.array([i.rd for i in program], dtype=np.int32)
    rs1 = np.array([i.rs1 for i in program], dtype=np.int32)
    rs2 = np.array([i.rs2 for i in program], dtype=np.int32)
    imm = np.array([i.imm % (1 << 32) for i in program], dtype=np.uint32)
    init = sorted((initial_mem or {}).items())
    init_addr = np.array([a for a, _ in init], dtype=np.uint64)
    init_val = np.array([v for _, v in init], dtype=np.uint32)

    (out_op, out_pc, out_ts, out_rs1, out_rs2, out_rdp, out_mv, out_mp, out_pts) = _buffers(
        max_steps
    )
    fin_cap = 4 * max_steps + len(init) + 64
    fin_key = np.empty(fin_cap, dtype=np.uint64)
    fin_ts = np.empty(fin_cap, dtype=np.uint64)
    fin_val = np.empty(fin_cap, dtype=np.uint32)
    fin_init = np.empty(fin_cap, dtype=np.uint32)
    n_final = ctypes.c_int64(0)

    seg = segment_steps or 0
    ref_cap = (1 << 20) if seg else 1
    eref_cap = (max_steps // seg + 2) if seg else 1
    eref_seg = np.empty(eref_cap, dtype=np.int64)
    eref_pc = np.empty(eref_cap, dtype=np.uint32)
    eref_pts = np.empty(eref_cap, dtype=np.uint64)
    while True:
        ref_seg = np.empty(ref_cap, dtype=np.int64)
        ref_key = np.empty(ref_cap, dtype=np.uint64)
        ref_val = np.empty(ref_cap, dtype=np.uint32)
        ref_pts = np.empty(ref_cap, dtype=np.uint64)
        n_ref = ctypes.c_int64(0)
        n_eref = ctypes.c_int64(0)

        steps = lib.powdr_execute(
            op, rd, rs1, rs2, imm, n,
            init_addr, init_val, len(init),
            max_steps,
            out_op, out_pc, out_ts, out_rs1, out_rs2, out_rdp, out_mv, out_mp, out_pts,
            fin_key, fin_ts, fin_val, fin_init, fin_cap,
            ctypes.byref(n_final),
            seg,
            ref_seg, ref_key, ref_val, ref_pts, ref_cap, ctypes.byref(n_ref),
            eref_seg, eref_pc, eref_pts, eref_cap, ctypes.byref(n_eref),
            pc_base, start_pc if start_pc is not None else pc_base,
        )
        if steps == -2:
            ref_cap *= 4  # refresh-row buffer too small; rerun
            continue
        break
    if steps < 0:
        raise RuntimeError("native execution failed (bad pc/address or step limit)")
    nr, ne = n_ref.value, n_eref.value
    mem_refresh = {
        "seg": ref_seg[:nr].copy(),
        "space": (ref_key[:nr] >> np.uint64(32)).astype(np.uint64),
        "ptr": (ref_key[:nr] & np.uint64(0xFFFFFFFF)).astype(np.uint64),
        "val": ref_val[:nr].astype(np.uint64),
        "prev_ts": ref_pts[:nr].copy(),
    }
    if nr:
        # canonical order (seg, space, ptr) — matches the python executor
        order = np.lexsort((mem_refresh["ptr"], mem_refresh["space"], mem_refresh["seg"]))
        mem_refresh = {k: v[order] for k, v in mem_refresh.items()}
    exec_refresh = {
        "seg": eref_seg[:ne].copy(),
        "pc": eref_pc[:ne].astype(np.uint64),
        "prev_ts": eref_pts[:ne].copy(),
    }
    return (
        steps, rd, rs1, rs2, imm,
        out_op, out_pc, out_ts, out_rs1, out_rs2, out_rdp, out_mv, out_mp, out_pts,
        fin_key, fin_ts, fin_val, fin_init, n_final.value,
        mem_refresh, exec_refresh,
    )

def run_native_columnar(
    program: List[Instruction],
    initial_mem: Optional[Dict[int, int]] = None,
    max_steps: int = 1 << 22,
    segment_steps: Optional[int] = None,
    pc_base: int = 0,
    start_pc: Optional[int] = None,
) -> ExecutionResult:
    """Native execution with COLUMNAR records: per-opcode field arrays
    (uint64), never materializing per-row dicts.  `result.records` is left
    empty; witgen uses `result.records_columnar` (vm/witgen_vec.py) —
    counterpart of the reference's record arenas feeding GPU tracegen
    (/root/reference/openvm/src/powdr_extension/executor/mod.rs:457-600).

    segment_steps: instructions per timestamp epoch (segmentation —
    counterpart of the reference's SegmentationLimits,
    /root/reference/openvm-riscv/src/lib.rs:270-283).  Executions longer
    than isa.SEG_STEPS instructions require it; refresh rows land in
    result.mem_refresh / result.exec_refresh for the refresh chips."""
    segment_steps = _default_segment_steps(segment_steps)
    (
        steps, rd, rs1, rs2, imm,
        out_op, out_pc, out_ts, out_rs1, out_rs2, out_rdp, out_mv, out_mp, out_pts,
        fin_key, fin_ts, fin_val, fin_init, nf,
        mem_refresh, exec_refresh,
    ) = _call_core(program, initial_mem, max_steps, segment_steps, pc_base, start_pc)

    ops_t = out_op[:steps]
    pc_t = out_pc[:steps].astype(np.uint64)
    ins_idx = ((pc_t - np.uint64(pc_base)) >> np.uint64(2)).astype(np.int64)
    pts = out_pts[: 4 * steps].reshape(steps, 4)

    records_columnar: Dict[str, dict] = {}
    for opid in np.unique(ops_t):
        opname = OPCODES[opid]
        sel = np.nonzero(ops_t == opid)[0]
        ii = ins_idx[sel]
        na = _N_ACCESS[opname]
        records_columnar[opname] = {
            "pc": pc_t[sel],
            "ts": out_ts[sel].astype(np.uint64),
            "rd": rd[ii].astype(np.uint64),
            "rs1": rs1[ii].astype(np.uint64),
            "rs2": rs2[ii].astype(np.uint64),
            "imm": imm[ii].astype(np.uint64),
            "prev_ts": [pts[sel, j].astype(np.uint64) for j in range(na)],
            "rs1_val": out_rs1[sel].astype(np.uint64),
            "rs2_val": out_rs2[sel].astype(np.uint64),
            "rd_prev": out_rdp[sel].astype(np.uint64),
            "mem_val": out_mv[sel].astype(np.uint64),
            "mem_prev": out_mp[sel].astype(np.uint64),
        }

    final_mem = {}
    initial_cells = []
    for i in range(nf):
        key = int(fin_key[i])
        space, ptr = key >> 32, key & 0xFFFFFFFF
        final_mem[(space, ptr)] = (int(fin_ts[i]), int(fin_val[i]))
        initial_cells.append((space, ptr, int(fin_init[i])))
    initial_cells.sort()

    return ExecutionResult(
        records={},
        pc_trace=pc_t.astype(np.int64).tolist(),
        final_mem=final_mem,
        initial_cells=initial_cells,
        instret=steps,
        halted=True,
        records_columnar=records_columnar,
        mem_refresh=mem_refresh if segment_steps else None,
        exec_refresh=exec_refresh if segment_steps else None,
        epoch_ticks=(segment_steps or 0) * TS_DELTA,
        pc_base=pc_base,
        start_pc=start_pc if start_pc is not None else pc_base,
    )


def run_native(
    program: List[Instruction],
    initial_mem: Optional[Dict[int, int]] = None,
    max_steps: int = 1 << 20,
    segment_steps: Optional[int] = None,
    pc_base: int = 0,
    start_pc: Optional[int] = None,
) -> ExecutionResult:
    segment_steps = _default_segment_steps(segment_steps)
    (
        steps, rd_a, rs1_a, rs2_a, imm_a,
        out_op, out_pc, out_ts, out_rs1, out_rs2, out_rdp, out_mv, out_mp, out_pts,
        fin_key, fin_ts, fin_val, fin_init, nf,
        mem_refresh, exec_refresh,
    ) = _call_core(program, initial_mem, max_steps, segment_steps, pc_base, start_pc)

    records: Dict[str, List[dict]] = {}
    pc_trace: List[int] = []
    for s_ in range(steps):
        opname = OPCODES[out_op[s_]]
        pc = int(out_pc[s_])
        pc_trace.append(pc)
        ins = program[(pc - pc_base) // 4]
        na = _N_ACCESS[opname]
        rec = {
            "op": opname,
            "pc": pc,
            "ts": int(out_ts[s_]),
            "rd": ins.rd,
            "rs1": ins.rs1,
            "rs2": ins.rs2,
            "imm": ins.imm % (1 << 32),
            "prev_ts": [int(out_pts[4 * s_ + j]) for j in range(na)],
            "rs1_val": int(out_rs1[s_]),
            "rs2_val": int(out_rs2[s_]),
            "rd_prev": int(out_rdp[s_]),
            "mem_val": int(out_mv[s_]),
            "mem_prev": int(out_mp[s_]),
        }
        records.setdefault(opname, []).append(rec)

    final_mem = {}
    initial_cells = []
    for i in range(nf):
        key = int(fin_key[i])
        space, ptr = key >> 32, key & 0xFFFFFFFF
        final_mem[(space, ptr)] = (int(fin_ts[i]), int(fin_val[i]))
        initial_cells.append((space, ptr, int(fin_init[i])))
    initial_cells.sort()

    return ExecutionResult(
        records=records,
        pc_trace=pc_trace,
        final_mem=final_mem,
        initial_cells=initial_cells,
        instret=steps,
        halted=True,
        mem_refresh=mem_refresh if segment_steps else None,
        exec_refresh=exec_refresh if segment_steps else None,
        epoch_ticks=(segment_steps or 0) * TS_DELTA,
        pc_base=pc_base,
        start_pc=start_pc if start_pc is not None else pc_base,
    )
