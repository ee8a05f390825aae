"""Full VM chip system: instruction chips + program chip + memory boundary
+ periphery tables, with witness assembly and a mock checker.

Mock checking (constraints evaluated row-wise + exact bus multiset
balance) is the counterpart of the reference's mock proving
(`prove_mock` -> do_with_trace + debug_proving_ctx,
/root/reference/openvm-riscv/src/lib.rs:288-296): it validates executor,
witgen and machine definitions end-to-end without a STARK, so it runs in
CI; real proofs of the same system go through powdr_tpu.stark."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from ..ir import expression as ir
from ..apc.symbolic_machine import SymbolicBusInteraction, SymbolicMachine
from .executor import ExecutionResult
from .isa import (
    BITWISE_BUS,
    EXEC_BUS,
    MEM_BUS,
    OPCODE_ID,
    PC_BUS,
    POW2_BUS,
    RANGE_BUS,
    TS_DELTA,
    Instruction,
    MachineBuilder,
)
from .machines import registry

P = 2013265921
MAX_RANGE_BITS = 18  # table size 2^(bits+1); must cover isa.DT_BITS


@dataclass
class Chip:
    name: str
    machine: SymbolicMachine
    cols: List[str]
    trace: Dict[str, np.ndarray]  # col name -> uint64 values (canonical)
    preprocessed: Set[str] = field(default_factory=set)

    @property
    def height(self) -> int:
        return len(next(iter(self.trace.values()))) if self.trace else 0


def _pad_pow2(trace: Dict[str, np.ndarray], min_height: int = 2) -> Dict[str, np.ndarray]:
    # min height 2: a height-1 chip's LDE would sit at the FRI's final-poly
    # floor and could not join the batched fold
    n = max((len(v) for v in trace.values()), default=0)
    n = max(n, min_height, 1)
    pow2 = 1 << (n - 1).bit_length()
    return {k: np.pad(np.asarray(v, dtype=np.uint64), (0, pow2 - len(v))) for k, v in trace.items()}


# -- instruction chips --------------------------------------------------------


def instruction_chips(result: ExecutionResult) -> List[Chip]:
    chips = []
    if result.records_columnar is not None:
        # vectorized witgen: one numpy pass per opcode over columnar
        # records (vm/witgen_vec.py) — no per-row dicts
        from .witgen_vec import registry_vec

        vec = registry_vec()
        for op, (builder, _wg) in registry().items():
            rec = result.records_columnar.get(op)
            if rec is None or len(rec["pc"]) == 0:
                continue
            out = vec[op](rec)
            n = len(rec["pc"])
            zeros = np.zeros(n, dtype=np.uint64)
            trace = {
                c: (np.asarray(out[c], dtype=np.uint64) % P if c in out else zeros)
                for c in builder.cols
            }
            chips.append(
                Chip(name=op, machine=builder.machine(), cols=builder.cols, trace=_pad_pow2(trace))
            )
        return chips
    for op, (builder, wg) in registry().items():
        recs = result.records.get(op, [])
        if not recs:
            continue
        rows = [wg(r) for r in recs]
        cols = builder.cols
        trace = {
            c: np.array([row.get(c, 0) % P for row in rows], dtype=np.uint64) for c in cols
        }
        chips.append(
            Chip(name=op, machine=builder.machine(), cols=cols, trace=_pad_pow2(trace))
        )
    return chips


# -- program chip -------------------------------------------------------------


def program_chip(program: List[Instruction], pc_trace: List[int], pc_base: int = 0) -> Chip:
    b = MachineBuilder(name="program")
    cols = ["pc", "opcode", "rd", "rs1", "rs2", "imm_lo", "imm_hi", "count"]
    vars_ = {c: b.col(c) for c in cols}
    b.receive(
        PC_BUS,
        vars_["count"],
        [vars_[c] for c in cols[:-1]],
    )
    counts: Dict[int, int] = {}
    for pc in pc_trace:
        counts[pc] = counts.get(pc, 0) + 1
    rows = {c: [] for c in cols}
    for i, ins in enumerate(program):
        pc = pc_base + 4 * i
        args = ins.pc_args(pc)
        for c, v in zip(cols[:-1], args):
            rows[c].append(v % P)
        rows["count"].append(counts.get(pc, 0))
    return Chip(
        name="program",
        machine=b.machine(),
        cols=b.cols,
        trace=_pad_pow2({c: np.array(v, dtype=np.uint64) for c, v in rows.items()}),
        preprocessed=set(cols[:-1]),
    )


# -- boundary chips -----------------------------------------------------------


def exec_boundary_chip(start_pc: int = 0) -> Chip:
    b = MachineBuilder(name="exec_init")
    active = b.col("active")
    b.require(ir.Mul(active, ir.Sub(active, ir.Const(1))))
    b.send(EXEC_BUS, active, [ir.Const(start_pc), ir.Const(1)])
    trace = {"active": np.array([1], dtype=np.uint64)}
    return Chip(name="exec_init", machine=b.machine(), cols=b.cols, trace=_pad_pow2(trace))


def memory_boundary_chip(result: ExecutionResult) -> Chip:
    b = MachineBuilder(name="mem_boundary")
    active = b.col("active")
    space = b.col("space")
    ptr = b.col("ptr")
    ib = b.cols4("init_b")
    fb = b.cols4("final_b")
    final_ts = b.col("final_ts")
    b.require(ir.Mul(active, ir.Sub(active, ir.Const(1))))
    b.send(MEM_BUS, active, [space, ptr, *ib, ir.Const(0)])
    b.receive(MEM_BUS, active, [space, ptr, *fb, final_ts])
    rows = {c: [] for c in b.cols}
    for (sp, pt), (ts, val) in sorted(result.final_mem.items()):
        init = dict(((s, p), v) for s, p, v in result.initial_cells)[(sp, pt)]
        rows["active"].append(1)
        rows["space"].append(sp)
        rows["ptr"].append(pt)
        for i in range(4):
            rows[f"init_b__{i}"].append((init >> (8 * i)) & 0xFF)
            rows[f"final_b__{i}"].append((val >> (8 * i)) & 0xFF)
        rows["final_ts"].append(ts)
    return Chip(
        name="mem_boundary",
        machine=b.machine(),
        cols=b.cols,
        trace=_pad_pow2({c: np.array(v, dtype=np.uint64) for c, v in rows.items()}),
    )


# -- segmentation refresh chips ----------------------------------------------
# Timestamp-epoch handoff over the EXISTING mem/exec buses: segment i's
# instructions run with timestamps in (i*E, (i+1)*E]; at each epoch
# boundary every touched cell's pending send is consumed and re-sent at
# ts = b*E (with the same ordering dt-check instructions use), and the
# execution bridge is re-timestamped to b*E + 1.  One combined proof
# covers all segments; no instruction machine or APC change needed.
# Counterpart of the reference's SegmentationLimits continuation axis
# (/root/reference/openvm-riscv/src/lib.rs:270-283, executor/mod.rs:56-62).


def mem_refresh_chip(mem_refresh: dict, epoch_ticks: int) -> Chip:
    from .isa import DT_BITS

    b = MachineBuilder(name="mem_refresh")
    active = b.col("active")
    seg = b.col("seg")
    space = b.col("space")
    ptr = b.col("ptr")
    v = b.cols4("v")
    prev_ts = b.col("prev_ts")
    dt = b.col("dt")
    b.require(ir.Mul(active, ir.Sub(active, ir.Const(1))))
    ts_new = ir.Mul(ir.Const(epoch_ticks), seg)
    b.receive(MEM_BUS, active, [space, ptr, *v, prev_ts])
    b.send(MEM_BUS, active, [space, ptr, *v, ts_new])
    b.require(
        ir.Mul(active, ir.Sub(dt, ir.Sub(ir.Sub(ts_new, prev_ts), ir.Const(1))))
    )
    b.send(RANGE_BUS, active, [dt, ir.Const(DT_BITS)])
    n = len(mem_refresh["seg"])
    trace = {
        "active": np.ones(n, dtype=np.uint64),
        "seg": np.asarray(mem_refresh["seg"], dtype=np.uint64),
        "space": np.asarray(mem_refresh["space"], dtype=np.uint64),
        "ptr": np.asarray(mem_refresh["ptr"], dtype=np.uint64),
        "prev_ts": np.asarray(mem_refresh["prev_ts"], dtype=np.uint64),
        "dt": np.asarray(mem_refresh["seg"], dtype=np.uint64) * epoch_ticks
        - np.asarray(mem_refresh["prev_ts"], dtype=np.uint64)
        - 1,
    }
    val = np.asarray(mem_refresh["val"], dtype=np.uint64)
    for i in range(4):
        trace[f"v__{i}"] = (val >> np.uint64(8 * i)) & np.uint64(0xFF)
    return Chip(name="mem_refresh", machine=b.machine(), cols=b.cols, trace=_pad_pow2(trace))


def exec_refresh_chip(exec_refresh: dict, epoch_ticks: int) -> Chip:
    from .isa import DT_BITS

    b = MachineBuilder(name="exec_refresh")
    active = b.col("active")
    seg = b.col("seg")
    pc = b.col("pc")
    prev_ts = b.col("prev_ts")
    dt = b.col("dt")
    b.require(ir.Mul(active, ir.Sub(active, ir.Const(1))))
    ts_new = ir.Add(ir.Mul(ir.Const(epoch_ticks), seg), ir.Const(1))
    b.receive(EXEC_BUS, active, [pc, prev_ts])
    b.send(EXEC_BUS, active, [pc, ts_new])
    # ordering: the received chain ts may not exceed the epoch start + 1
    # (kills forged refresh cycles; genuine full epochs give dt = 0)
    b.require(ir.Mul(active, ir.Sub(dt, ir.Sub(ts_new, prev_ts))))
    b.send(RANGE_BUS, active, [dt, ir.Const(DT_BITS)])
    n = len(exec_refresh["seg"])
    segs = np.asarray(exec_refresh["seg"], dtype=np.uint64)
    pts = np.asarray(exec_refresh["prev_ts"], dtype=np.uint64)
    trace = {
        "active": np.ones(n, dtype=np.uint64),
        "seg": segs,
        "pc": np.asarray(exec_refresh["pc"], dtype=np.uint64),
        "prev_ts": pts,
        "dt": segs * epoch_ticks + 1 - pts,
    }
    return Chip(name="exec_refresh", machine=b.machine(), cols=b.cols, trace=_pad_pow2(trace))


# -- periphery tables ---------------------------------------------------------


def _range_table_offset(bits) -> "np.ndarray | int":
    """Row index of (value=0, bits) in the range table layout."""
    return (1 << bits) - 1


def range_checker_chip(counts) -> Chip:
    """counts: {(value, bits): n} dict or a flat int64 array indexed by
    _range_table_offset(bits) + value (the vectorized accumulation path)."""
    b = MachineBuilder(name="range_checker")
    value = b.col("value")
    bits = b.col("bits")
    count = b.col("count")
    b.receive(RANGE_BUS, count, [value, bits])
    n_rows = (1 << (MAX_RANGE_BITS + 1)) - 1
    vals = np.concatenate(
        [np.arange(1 << bb, dtype=np.uint64) for bb in range(MAX_RANGE_BITS + 1)]
    )
    bts = np.concatenate(
        [np.full(1 << bb, bb, dtype=np.uint64) for bb in range(MAX_RANGE_BITS + 1)]
    )
    if isinstance(counts, dict):
        cnt = np.zeros(n_rows, dtype=np.int64)
        for (v, bb), c in counts.items():
            cnt[_range_table_offset(bb) + v] += c
    else:
        cnt = counts
    rows = {"value": vals, "bits": bts, "count": (cnt % P).astype(np.uint64)}
    return Chip(
        name="range_checker",
        machine=b.machine(),
        cols=b.cols,
        trace=_pad_pow2(rows),
        preprocessed={"value", "bits"},
    )


def bitwise_chip(counts) -> Chip:
    """Full byte-pair table: op0 rows (x, y, 0, 0) and op1 rows (x, y, x^y, 1).
    counts: {(x,y,z,op): n} dict or a flat int64 array indexed op*65536+x*256+y."""
    b = MachineBuilder(name="bitwise")
    x = b.col("x")
    y = b.col("y")
    z = b.col("z")
    op = b.col("op")
    count = b.col("count")
    b.receive(BITWISE_BUS, count, [x, y, z, op])
    xs = np.arange(256, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()
    rows = {
        "x": np.concatenate([gx, gx]),
        "y": np.concatenate([gy, gy]),
        "z": np.concatenate([np.zeros_like(gx), gx ^ gy]),
        "op": np.concatenate([np.zeros_like(gx), np.ones_like(gx)]),
    }
    if isinstance(counts, dict):
        cnt = np.zeros(2 * 65536, dtype=np.int64)
        for (cx, cy, cz, cop), c in counts.items():
            cnt[cop * 65536 + cx * 256 + cy] += c
    else:
        cnt = counts
    rows["count"] = (cnt % P).astype(np.uint64)
    return Chip(
        name="bitwise",
        machine=b.machine(),
        cols=b.cols,
        trace=_pad_pow2(rows),
        preprocessed={"x", "y", "z", "op"},
    )


def pow2_chip(counts) -> Chip:
    """counts: {shamt: n} dict or a 33-entry int64 array."""
    b = MachineBuilder(name="pow2")
    s = b.col("s")
    pb = b.cols4("p2")
    count = b.col("count")
    b.receive(POW2_BUS, count, [s, *pb])
    if not isinstance(counts, dict):
        counts = {sv: int(c) for sv, c in enumerate(counts)}
    rows = {c: [] for c in b.cols}
    for sv in range(33):
        p2 = 1 << sv
        rows["s"].append(sv)
        for i in range(4):
            rows[f"p2__{i}"].append((p2 >> (8 * i)) & 0xFF)
        rows["count"].append(counts.get(sv, 0) % P)
    return Chip(
        name="pow2",
        machine=b.machine(),
        cols=b.cols,
        trace=_pad_pow2({c: np.array(v, dtype=np.uint64) for c, v in rows.items()}),
        preprocessed={"s", "p2__0", "p2__1", "p2__2", "p2__3"},
    )


# -- evaluation / mock check --------------------------------------------------


def _np_algebra(trace: Dict[str, np.ndarray], names: Dict[int, str], height: int):
    def col(name):
        arr = trace[name]
        assert len(arr) == height
        return arr

    return ir.Algebra(
        add=lambda a, b: (a + b) % P,
        sub=lambda a, b: (a + P - b) % P,  # avoid uint64 underflow wrap
        mul=lambda a, b: (a * b) % P,
        neg=lambda a: (P - a) % P,
        const=lambda v: np.full(height, v % P, dtype=np.uint64),
        col=lambda i, r: (_ for _ in ()).throw(ValueError("no Col in VM machines")),
        perm_col=None,
        challenge=None,
        public=None,
        is_first=None,
        is_last=None,
        is_transition=None,
        var=lambda name, id_: col(name),
    )


def evaluate_chip_exprs(chip: Chip):
    """Evaluate constraints + interaction mult/args over all rows (numpy)."""
    names = chip.machine.variables()
    h = chip.height
    alg = _np_algebra(chip.trace, names, h)
    cache: Dict[int, np.ndarray] = {}
    cons = [ir.evaluate(c, alg, cache) for c in chip.machine.constraints]
    ints = []
    for bi in chip.machine.bus_interactions:
        mult = ir.evaluate(bi.mult, alg, cache)
        args = [ir.evaluate(a, alg, cache) for a in bi.args]
        ints.append((bi.id, mult, args))
    return cons, ints


def mock_check(chips: List[Chip]) -> None:
    """Raises AssertionError with a precise location on any violation.

    Vectorized: constraints evaluate row-wise in numpy; bus balance groups
    every chip's nonzero messages per (bus, arity) and settles each group
    with one unique-rows pass (scales to millions of rows)."""
    groups: Dict[Tuple[int, int], List[Tuple[np.ndarray, np.ndarray]]] = {}
    for chip in chips:
        cons, ints = evaluate_chip_exprs(chip)
        for ci, arr in enumerate(cons):
            bad = np.nonzero(arr)[0]
            assert bad.size == 0, (
                f"chip {chip.name}: constraint {ci} fails at rows {bad[:5]}"
            )
        for bus_id, mult, args in ints:
            mask = mult != 0
            if not mask.any():
                continue
            rows = np.stack([np.asarray(a)[mask] for a in args], axis=1)
            groups.setdefault((bus_id, len(args)), []).append(
                (rows, mult[mask].astype(np.int64))
            )
    imbalance = []
    for (bus_id, _k), parts in groups.items():
        rows = np.concatenate([r for r, _ in parts], axis=0)
        mults = np.concatenate([m for _, m in parts])
        # group identical rows: lexsort + boundary detection + reduceat
        # (much faster than np.unique(axis=0) at tens of millions of rows)
        order = np.lexsort(rows.T[::-1])
        rs = rows[order]
        ms = mults[order]
        change = np.empty(len(rs), dtype=bool)
        change[0] = True
        np.any(rs[1:] != rs[:-1], axis=1, out=change[1:])
        starts = np.nonzero(change)[0]
        sums = np.add.reduceat(ms, starts)
        bad = np.nonzero(sums % P != 0)[0]
        for b in bad[:3]:
            imbalance.append(
                (bus_id, tuple(int(v) for v in rs[starts[b]]), int(sums[b] % P))
            )
    assert not imbalance, f"bus imbalance, e.g. {imbalance[:3]}"


# -- full system assembly -----------------------------------------------------


def accumulate_periphery(chips: List[Chip]):
    """Vectorized periphery histograms over the chips' interactions
    (scatter-add per interaction — counterpart of the reference's CUDA
    bus-apply kernel, openvm/cuda/src/apc_apply_bus.cu:23-113).
    Returns (range_counts, bitwise_counts, pow2_counts) flat arrays."""
    range_counts = np.zeros((1 << (MAX_RANGE_BITS + 1)) - 1, dtype=np.int64)
    bitwise_counts = np.zeros(2 * 65536, dtype=np.int64)
    pow2_counts = np.zeros(33, dtype=np.int64)

    def _accum(dst: np.ndarray, idx: np.ndarray, mult: np.ndarray):
        mask = mult != 0
        if mask.any():
            np.add.at(dst, np.asarray(idx)[mask].astype(np.int64), mult[mask].astype(np.int64))

    for chip in chips:
        _, ints = evaluate_chip_exprs(chip)
        for bus_id, mult, args in ints:
            if bus_id == RANGE_BUS:
                _accum(range_counts, (np.int64(1) << args[1].astype(np.int64)) - 1 + args[0].astype(np.int64), mult)
            elif bus_id == BITWISE_BUS:
                _accum(bitwise_counts, args[3].astype(np.int64) * 65536 + args[0].astype(np.int64) * 256 + args[1].astype(np.int64), mult)
            elif bus_id == POW2_BUS:
                _accum(pow2_counts, args[0], mult)
    return range_counts, bitwise_counts, pow2_counts


def _filter_rec(rec: dict, mask: np.ndarray) -> dict:
    out = {}
    for k, v in rec.items():
        if k == "prev_ts":
            out[k] = [np.asarray(a)[mask] for a in v]
        else:
            out[k] = np.asarray(v)[mask]
    return out


def build_chip_segments(
    program: List[Instruction],
    result: ExecutionResult,
    max_rows_per_segment: int = 1 << 20,
) -> List[List[Chip]]:
    """Split the run's instruction chips into bounded-size proof segments
    (epoch bands); global chips (program, boundaries, refresh, periphery)
    ride in the LAST segment.  Consumed by prove(segments=...) — the
    shared-transcript continuation prover (the reference proves each
    segment with its own STARK, trace_generation.rs:37-103; here the
    segments share one transcript so bus flows cancel across them)."""
    E = result.epoch_ticks
    recs = result.records_columnar
    if not E or recs is None:
        return [build_chips(program, result)]
    from .witgen_vec import registry_vec

    vec = registry_vec()
    # per-epoch row counts
    n_ep = 1
    eps: Dict[str, np.ndarray] = {}
    for op, rec in recs.items():
        ts = np.asarray(rec["ts"], dtype=np.int64)
        if not len(ts):
            continue
        ep = (ts - 1) // E
        eps[op] = ep
        n_ep = max(n_ep, int(ep.max()) + 1)
    rows_per_ep = np.zeros(n_ep, dtype=np.int64)
    for op, ep in eps.items():
        np.add.at(rows_per_ep, ep, 1)
    # greedy epoch bands under the row budget
    bands: List[Tuple[int, int]] = []
    cur, acc = 0, 0
    for epi in range(n_ep):
        if acc and acc + rows_per_ep[epi] > max_rows_per_segment:
            bands.append((cur, epi))
            cur, acc = epi, 0
        acc += int(rows_per_ep[epi])
    bands.append((cur, n_ep))

    segments: List[List[Chip]] = []
    for lo, hi in bands:
        seg: List[Chip] = []
        for op, (builder, _wg) in registry().items():
            rec = recs.get(op)
            if rec is None or len(rec["pc"]) == 0 or op not in eps:
                continue
            mask = (eps[op] >= lo) & (eps[op] < hi)
            if not mask.any():
                continue
            sub = _filter_rec(rec, mask)
            out = vec[op](sub)
            n = len(sub["pc"])
            zeros = np.zeros(n, dtype=np.uint64)
            trace = {
                c: (np.asarray(out[c], dtype=np.uint64) % P if c in out else zeros)
                for c in builder.cols
            }
            seg.append(
                Chip(name=op, machine=builder.machine(), cols=builder.cols, trace=_pad_pow2(trace))
            )
        segments.append(seg)

    last = segments[-1]
    last.append(program_chip(program, result.pc_trace, pc_base=result.pc_base))
    last.append(exec_boundary_chip(start_pc=result.start_pc))
    last.append(memory_boundary_chip(result))
    if result.mem_refresh is not None and len(result.mem_refresh["seg"]):
        last.append(mem_refresh_chip(result.mem_refresh, result.epoch_ticks))
    if result.exec_refresh is not None and len(result.exec_refresh["seg"]):
        last.append(exec_refresh_chip(result.exec_refresh, result.epoch_ticks))
    # periphery counts over EVERY segment's chips
    range_counts, bitwise_counts, pow2_counts = accumulate_periphery(
        [c for seg in segments for c in seg]
    )
    last.append(range_checker_chip(range_counts))
    if bitwise_counts.any():
        last.append(bitwise_chip(bitwise_counts))
    if pow2_counts.any():
        last.append(pow2_chip(pow2_counts))
    return segments


def build_chips(program: List[Instruction], result: ExecutionResult) -> List[Chip]:
    chips = instruction_chips(result)
    chips.append(program_chip(program, result.pc_trace, pc_base=result.pc_base))
    chips.append(exec_boundary_chip(start_pc=result.start_pc))
    chips.append(memory_boundary_chip(result))
    if result.mem_refresh is not None and len(result.mem_refresh["seg"]):
        chips.append(mem_refresh_chip(result.mem_refresh, result.epoch_ticks))
    if result.exec_refresh is not None and len(result.exec_refresh["seg"]):
        chips.append(exec_refresh_chip(result.exec_refresh, result.epoch_ticks))
    range_counts, bitwise_counts, pow2_counts = accumulate_periphery(chips)
    chips.append(range_checker_chip(range_counts))
    if bitwise_counts.any():
        chips.append(bitwise_chip(bitwise_counts))
    if pow2_counts.any():
        chips.append(pow2_chip(pow2_counts))
    return chips
