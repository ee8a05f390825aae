"""Autoprecompile construction for the VM: block -> optimized machine ->
witness -> chip.

Counterpart of the reference's build() pipeline
(/root/reference/autoprecompiles/src/lib.rs:284-390: machine generation ->
optimization -> Apc with substitutions) and its trace handler
(trace_handler.rs:40): witness generation is a pure gather — every APC
column's value comes from the corresponding original instruction record,
because the optimizer records eliminated columns as derived and the
remaining ones keep their (instruction, column) identity in `subs`."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..apc.optimizer import DegreeBound, OptimizeReport, optimize_machine
from ..apc.symbolic_machine import SymbolicBusInteraction, SymbolicMachine
from ..ir import expression as ir
from .blocks import BasicBlock
from .executor import ExecutionResult
from .isa import OPCODE_ID, PC_BUS, TS_DELTA, VM_BUS_MAP
from .machines import registry
from .system import Chip, _pad_pow2

P = 2013265921


@dataclass
class VmApc:
    block: BasicBlock
    machine: SymbolicMachine  # optimized
    #: apc var id -> (instruction index in block, original column name)
    subs: Dict[int, Tuple[int, str]]
    report: OptimizeReport
    name: str = "apc"
    #: runtime-checked assumptions (empirical/optimistic mode); None = safe
    optimistic: Optional[object] = None


def build_apc(
    block: BasicBlock,
    degree_bound: Optional[DegreeBound] = None,
    empirical=None,
) -> VmApc:
    """Concatenate the block's instruction machines with fresh column ids,
    substitute pc-lookup operands with the block's constants, drop the
    pc-lookup interactions, then run the optimizer
    (symbolic_machine_generator.rs:118,134 + optimizer.rs:34 parity).

    With `empirical` (pc -> PcEmpirical from vm.empirical.detect), the
    observed facts become *optimistic* substitutions/ranges baked into the
    machine; the returned VmApc carries the runtime-check set."""
    from .empirical import OptimisticConstraints, block_optimistic

    opt = None
    opt_ranges = {}
    if empirical is not None:
        opt, opt_ranges = block_optimistic(block, empirical)

    constraints: List[ir.Expr] = []
    interactions: List[SymbolicBusInteraction] = []
    subs: Dict[int, Tuple[int, str]] = {}
    var_of: Dict[Tuple[int, str], int] = {}
    next_id = 0
    for i, ins in enumerate(block.instructions):
        builder, _ = registry()[ins.op]
        local_machine = builder.machine()
        # operand constants for this instruction
        imm = ins.imm % (1 << 32)
        const_map = {
            "rd_ptr": ins.rd,
            "rs1_ptr": ins.rs1,
            "rs2_ptr": ins.rs2,
            "imm_lo": imm & 0xFFFF,
            "imm_hi": imm >> 16,
        }
        id_map: Dict[int, ir.Expr] = {}
        for local_id, name in enumerate(builder.cols):
            if name in const_map:
                id_map[local_id] = ir.Const(const_map[name])
            elif opt is not None and (i, name) in opt.constants:
                id_map[local_id] = ir.Const(opt.constants[(i, name)])
            else:
                id_map[local_id] = ir.Var(name=f"{name}_{i}", id=next_id)
                subs[next_id] = (i, name)
                var_of[(i, name)] = next_id
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

        # pin the instruction's pc: makes branch outcomes at superblock
        # boundaries circuit-enforced (the reference instead emits runtime
        # PC-equality optimistic constraints, lib.rs:393-413)
        fp = builder.cols.index("from_pc")
        constraints.append(ir.Sub(id_map[fp], ir.Const(block.pcs[i])))
        for c in local_machine.constraints:
            constraints.append(remap(c))
        for b in local_machine.bus_interactions:
            if b.id == PC_BUS:
                continue  # fixed program: operands substituted above
            interactions.append(
                SymbolicBusInteraction(
                    id=b.id, mult=remap(b.mult), args=[remap(a) for a in b.args]
                )
            )
    machine = SymbolicMachine(constraints=constraints, bus_interactions=interactions)
    bus_ranges = None
    if opt is not None:
        bus_ranges = {
            var_of[key]: rc for key, rc in opt_ranges.items() if key in var_of
        }
        # equalities -> keep only those between live vars, as extra
        # equality constraints the solver turns into substitutions
        for (ia, ca), (ib, cb) in opt.equalities:
            va, vb = var_of.get((ia, ca)), var_of.get((ib, cb))
            if va is not None and vb is not None:
                machine.constraints.append(
                    ir.Sub(ir.Var(name=f"{ca}_{ia}", id=va), ir.Var(name=f"{cb}_{ib}", id=vb))
                )
    optimized, report = optimize_machine(machine, VM_BUS_MAP, degree_bound, bus_ranges=bus_ranges)
    # padding-row guards (reference add_guards, lib.rs:427-524): a machine
    # the optimizer left non-padding-closed (inverse witnesses, constant
    # multiplicities) gets an is_valid column guarding every constraint
    # and multiplicity; machines already closed are left untouched
    from ..apc.guards import add_guards, needs_guards

    if needs_guards(optimized):
        add_guards(optimized)
        report.after = optimized.stats()
    return VmApc(
        block=block,
        machine=optimized,
        subs=subs,
        report=report,
        name=f"apc_{block.start_pc:#x}",
        optimistic=opt,
    )


def export_apc(apc: VmApc, path: str) -> None:
    """Write the APC in the reference's ApcWithBusMap JSON format
    (the candidates export consumed by the reference's analyzer,
    autoprecompiles/src/pgo/cell/mod.rs:34-52 / export.rs) — also loadable
    back through powdr_tpu.apc.symbolic_machine.load_apc."""
    from ..apc.symbolic_machine import Apc, save_apc

    block_json = {
        "blocks": [
            {
                "start_pc": apc.block.start_pc,
                "instructions": [
                    [OPCODE_ID[i.op], i.rd, i.rs1, i.rs2, i.imm % (1 << 32)]
                    for i in apc.block.instructions
                ],
            }
        ]
    }
    subs_json = [
        [
            {"original_poly_index": v, "apc_poly_id": v}
            for v in sorted(apc.machine.main_columns())
        ]
    ]
    save_apc(
        Apc(
            block=block_json,
            machine=apc.machine,
            subs=subs_json,
            optimistic_constraints={
                "fetches_by_step": {},
                "constraints_to_check_by_step": {},
            },
            bus_map=VM_BUS_MAP,
        ),
        path,
    )


# -- occurrence finding -------------------------------------------------------


def find_occurrences(block: BasicBlock, result: ExecutionResult) -> List[List[int]]:
    """Positions (pc_trace indices) of full executions of the block.
    Returns a list of per-occurrence lists of trace positions.

    Occurrences that straddle an epoch-refresh boundary (segmentation,
    executor `segment_steps`) are dropped: the APC's collapsed exec bus
    assumes ts chains by TS_DELTA between the block's instructions, which
    an epoch refresh between two of them breaks — those executions run on
    the plain instruction chips instead (the reference's segment-boundary
    analog: SegmentationLimits, openvm-riscv/src/lib.rs:270-283)."""
    pcs = block.pcs
    seg_steps = result.epoch_ticks // TS_DELTA if result.epoch_ticks else 0
    out = []
    i = 0
    trace = result.pc_trace
    n = len(trace)
    while i < n:
        if trace[i] == pcs[0] and i + len(pcs) <= n and trace[i : i + len(pcs)] == pcs:
            last = i + len(pcs) - 1
            if not seg_steps or i // seg_steps == last // seg_steps:
                out.append(list(range(i, i + len(pcs))))
            i += len(pcs)
        else:
            i += 1
    return out


def _record_index(result: ExecutionResult, program) -> List[Tuple[str, int]]:
    """pc_trace position -> (opcode, index into records[opcode])."""
    counters: Dict[str, int] = {}
    out = []
    for pc in result.pc_trace:
        op = program[pc // 4].op
        k = counters.get(op, 0)
        counters[op] = k + 1
        out.append((op, k))
    return out


# -- witness generation (gather) ---------------------------------------------


def _mod_pow_vec(base: np.ndarray, e: int) -> np.ndarray:
    out = np.ones_like(base)
    b = base % P
    while e:
        if e & 1:
            out = out * b % P
        b = b * b % P
        e >>= 1
    return out


def _compute_derived(machine: SymbolicMachine, vals: Dict[str, np.ndarray], n_rows: int) -> None:
    """Fill values of optimizer-created columns by evaluating the recorded
    derived-column definitions in REVERSE derivation order: the last
    recorded definition references only surviving columns, earlier ones may
    reference columns defined later (reference ComputationMethod evaluation
    in trace_generator/cpu/mod.rs:91-228 — Constant and QuotientOrZero).

    Columns already present in `vals` (gathered from dummy traces) keep
    their gathered values; placeholder definitions never override them."""

    def alg():
        return ir.Algebra(
            add=lambda a, b: (a + b) % P,
            sub=lambda a, b: (a + P - b) % P,
            mul=lambda a, b: (a * b) % P,
            neg=lambda a: (P - a) % P,
            const=lambda v: np.full(n_rows, v % P, dtype=np.uint64),
            col=None,
            perm_col=None,
            challenge=None,
            public=None,
            is_first=None,
            is_last=None,
            is_transition=None,
            var=lambda name, id_: vals[name],
        )

    a = alg()
    for d in reversed(machine.derived_columns):
        if d.var.name in vals:
            continue
        num = ir.evaluate(d.expr, a)
        if d.den is None:
            vals[d.var.name] = num % P
        else:
            den = ir.evaluate(d.den, a)
            inv = _mod_pow_vec(den, P - 2)
            vals[d.var.name] = np.where(den % P == 0, 0, num * inv % P)


def _vec_op_outputs(result: ExecutionResult):
    """Lazy per-opcode vectorized witgen outputs over columnar records:
    op -> {col: (n_op,) uint64}.  The columnar analog of calling the
    per-row `wg` on every record of the opcode.  Memoized ON the
    ExecutionResult: apc_chip, the optimistic filter, empirical.detect
    and instruction_chips all consume the same outputs (ADVICE r2)."""
    from .witgen_vec import registry_vec

    cache = getattr(result, "_vec_witgen_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(result, "_vec_witgen_cache", cache)
    vec = registry_vec()

    def get(op: str) -> Dict[str, np.ndarray]:
        out = cache.get(op)
        if out is None:
            out = cache[op] = {
                c: np.asarray(v, dtype=np.uint64)
                for c, v in vec[op](result.records_columnar[op]).items()
            }
        return out

    return get


def apc_chip(
    apc: VmApc,
    occurrences: List[List[int]],
    result: ExecutionResult,
    program,
) -> Chip:
    """Build the APC chip's trace: one row per block execution; every
    column gathered from the original instruction records via `subs`.

    This is the reference's CUDA gather-substitution kernel
    (openvm/cuda/src/apc_tracegen.cu:35-66) expressed as a host gather;
    powdr_tpu.apc.trace_handler has the jitted device version."""
    from .machines import registry as reg

    rec_index = _record_index(result, program)
    main = apc.machine.main_columns()  # id -> name
    all_vars = apc.machine.variables()  # includes vars referenced by derived exprs
    n_rows = len(occurrences)
    # gather every referenced original column into per-name value vectors
    vals: Dict[str, np.ndarray] = {}
    gathered = [
        (vid, name) for vid, name in all_vars.items() if vid in apc.subs
    ]
    for vid, name in gathered:
        vals[name] = np.zeros(n_rows, dtype=np.uint64)
    if n_rows and result.records_columnar is not None and not result.records:
        # columnar-core path: every occurrence executes the same block, so
        # block position i has a fixed opcode — gather whole columns from
        # the vectorized witgen with one fancy-index per substituted var
        get = _vec_op_outputs(result)
        ops = [rec_index[pos][0] for pos in occurrences[0]]
        ks = np.array(
            [[rec_index[pos][1] for pos in occ] for occ in occurrences],
            dtype=np.int64,
        )
        for vid, name in gathered:
            i, col = apc.subs[vid]
            v = get(ops[i]).get(col)
            if v is not None:
                vals[name] = v[ks[:, i]] % P
    else:
        for r, occ in enumerate(occurrences):
            inst_cols: List[Dict[str, int]] = []
            for pos in occ:
                op, k = rec_index[pos]
                _, wg = reg()[op]
                inst_cols.append(wg(result.records[op][k]))
            for vid, name in gathered:
                i, col = apc.subs[vid]
                vals[name][r] = inst_cols[i].get(col, 0) % P
    _compute_derived(apc.machine, vals, n_rows)
    cols = [main[k] for k in sorted(main)]
    zero = np.zeros(n_rows, dtype=np.uint64)
    trace = {c: vals.get(c, zero) for c in cols}
    # renumber machine vars to dense column ids? keep names — Chip traces
    # are keyed by name and the machine references names via Var
    return Chip(
        name=apc.name, machine=apc.machine, cols=cols, trace=_pad_pow2(trace)
    )


def build_chips_with_apcs(
    program,
    result: ExecutionResult,
    apcs: List[VmApc],
) -> List[Chip]:
    """Like system.build_chips but with block executions replaced by APC
    rows (the reference's SpecializedConfig + PowdrExtension analog)."""
    from . import system as system_mod

    rec_index = _record_index(result, program)
    consumed: Dict[str, set] = {}
    apc_chips = []
    apc_positions = set()
    for apc in apcs:
        occs = find_occurrences(apc.block, result)
        occs = [occ for occ in occs if not any(p in apc_positions for p in occ)]
        if apc.optimistic is not None:
            from .machines import registry as _reg

            columnar = result.records_columnar is not None and not result.records
            get = _vec_op_outputs(result) if columnar else None
            kept = []
            for occ in occs:
                inst_cols = []
                for pos in occ:
                    op, k = rec_index[pos]
                    if columnar:
                        inst_cols.append({c: int(a[k]) for c, a in get(op).items()})
                    else:
                        _, wg = _reg()[op]
                        inst_cols.append(wg(result.records[op][k]))
                if apc.optimistic.check_rows(inst_cols):
                    kept.append(occ)
            occs = kept
        for occ in occs:
            apc_positions.update(occ)
            for pos in occ:
                op, k = rec_index[pos]
                consumed.setdefault(op, set()).add(k)
        if occs:
            apc_chips.append(apc_chip(apc, occs, result, program))

    # instruction chips without consumed records
    filtered_records = {
        op: [r for k, r in enumerate(recs) if k not in consumed.get(op, set())]
        for op, recs in result.records.items()
    }
    filtered_records = {op: recs for op, recs in filtered_records.items() if recs}
    filtered_columnar = None
    if result.records_columnar is not None and not result.records:
        filtered_columnar = {}
        for op, rec in result.records_columnar.items():
            cons = consumed.get(op)
            if cons:
                n_op = len(rec["pc"])
                keep = np.setdiff1d(
                    np.arange(n_op), np.fromiter(cons, dtype=np.int64, count=len(cons))
                )
                if len(keep) == 0:
                    continue
                rec = {
                    f: ([x[keep] for x in v] if isinstance(v, list) else v[keep])
                    for f, v in rec.items()
                }
            filtered_columnar[op] = rec
    sub_result = ExecutionResult(
        records=filtered_records,
        pc_trace=result.pc_trace,
        final_mem=result.final_mem,
        initial_cells=result.initial_cells,
        instret=result.instret,
        halted=result.halted,
        records_columnar=filtered_columnar,
    )
    chips = system_mod.instruction_chips(sub_result)
    # program chip counts only non-APC executions
    non_apc_trace = [pc for i, pc in enumerate(result.pc_trace) if i not in apc_positions]
    chips.append(system_mod.program_chip(program, non_apc_trace, pc_base=result.pc_base))
    chips.append(system_mod.exec_boundary_chip(start_pc=result.start_pc))
    chips.append(system_mod.memory_boundary_chip(result))
    # segmentation epoch-refresh chips, same as system.build_chips (APC
    # occurrences never straddle an epoch — find_occurrences drops those)
    if result.mem_refresh is not None and len(result.mem_refresh["seg"]):
        chips.append(system_mod.mem_refresh_chip(result.mem_refresh, result.epoch_ticks))
    if result.exec_refresh is not None and len(result.exec_refresh["seg"]):
        chips.append(system_mod.exec_refresh_chip(result.exec_refresh, result.epoch_ticks))
    chips.extend(apc_chips)
    # periphery counts from everything built so far (shared vectorized
    # histogram accumulation, ADVICE r2: the per-row python loop here had
    # diverged from system.build_chips' scatter-add path)
    range_counts, bitwise_counts, pow2_counts = system_mod.accumulate_periphery(chips)
    chips.append(system_mod.range_checker_chip(range_counts))
    if bitwise_counts.any():
        chips.append(system_mod.bitwise_chip(bitwise_counts))
    if pow2_counts.any():
        chips.append(system_mod.pow2_chip(pow2_counts))
    return chips
