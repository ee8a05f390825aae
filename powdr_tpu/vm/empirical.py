"""Empirical constraints: facts observed in sampled executions.

Counterpart of the reference's empirical-constraint machinery
(/root/reference/autoprecompiles/src/empirical_constraints.rs:25-36,
equivalence_classes.rs:13-26 and openvm/src/empirical_constraints.rs:56-76):
group witness rows by pc, record per-column value ranges and cross-column
equivalence classes (intersection of per-row partitions).  These feed the
optimizer as *optimistic* constraints — assumptions that must be
re-checked at runtime for every APC execution; occurrences violating them
cannot use the optimistic APC (execution/candidates.rs:12-40 parity)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from ..solver.range_constraint import RangeConstraint
from .blocks import BasicBlock
from .executor import ExecutionResult
from .machines import registry


@dataclass
class PcEmpirical:
    ranges: Dict[str, RangeConstraint]  # column -> observed range
    classes: List[Set[str]]  # equivalence classes (always-equal columns)
    rows: int = 0


def _mask_of(values) -> int:
    m = 0
    for v in values:
        m |= int(v)
    return m


def detect(result: ExecutionResult, program, max_rows_per_pc: int = 256) -> Dict[int, PcEmpirical]:
    """pc -> observed column facts, from the execution's witness rows."""
    reg = registry()
    columnar = result.records_columnar is not None and not result.records
    if columnar:
        from .apc import _vec_op_outputs

        get = _vec_op_outputs(result)
    by_pc: Dict[int, List[Dict[str, int]]] = {}
    counters: Dict[str, int] = {}
    for pc in result.pc_trace:
        op = program[pc // 4].op
        k = counters.get(op, 0)
        counters[op] = k + 1
        rows = by_pc.setdefault(pc, [])
        if len(rows) < max_rows_per_pc:
            if columnar:
                rows.append({c: int(a[k]) for c, a in get(op).items()})
            else:
                _, wg = reg[op]
                rows.append(wg(result.records[op][k]))
    out: Dict[int, PcEmpirical] = {}
    for pc, rows in by_pc.items():
        cols = sorted({c for r in rows for c in r})
        ranges = {}
        for c in cols:
            vals = [r.get(c, 0) for r in rows]
            ranges[c] = RangeConstraint(
                min=min(vals), max=max(vals), mask=_mask_of(vals)
            )
        # equivalence classes: start from the first row's value-partition,
        # intersect with each following row's
        classes: List[Set[str]] = []
        by_val: Dict[int, Set[str]] = {}
        for c in cols:
            by_val.setdefault(rows[0].get(c, 0), set()).add(c)
        classes = [s for s in by_val.values() if len(s) > 1]
        for r in rows[1:]:
            nxt: List[Set[str]] = []
            for cls in classes:
                sub: Dict[int, Set[str]] = {}
                for c in cls:
                    sub.setdefault(r.get(c, 0), set()).add(c)
                nxt.extend(s for s in sub.values() if len(s) > 1)
            classes = nxt
            if not classes:
                break
        out[pc] = PcEmpirical(ranges=ranges, classes=classes, rows=len(rows))
    return out


@dataclass
class OptimisticConstraints:
    """Assumptions the optimized APC relies on; checked per occurrence."""

    #: (instr_idx, col) -> required constant value
    constants: Dict[Tuple[int, str], int] = field(default_factory=dict)
    #: equal-value pairs ((i, col_a), (i2, col_b))
    equalities: List[Tuple[Tuple[int, str], Tuple[int, str]]] = field(default_factory=list)

    def check_rows(self, inst_cols: List[Dict[str, int]]) -> bool:
        for (i, c), v in self.constants.items():
            if inst_cols[i].get(c, 0) != v:
                return False
        for (i, a), (j, b) in self.equalities:
            if inst_cols[i].get(a, 0) != inst_cols[j].get(b, 0):
                return False
        return True


def block_optimistic(
    block: BasicBlock, empirical: Dict[int, PcEmpirical]
) -> Tuple[OptimisticConstraints, Dict[Tuple[int, str], RangeConstraint]]:
    """Project the per-pc facts onto a block: constants (singleton ranges),
    per-column ranges, and within-instruction equivalence classes."""
    opt = OptimisticConstraints()
    ranges: Dict[Tuple[int, str], RangeConstraint] = {}
    for i, pc in enumerate(block.pcs):
        emp = empirical.get(pc)
        if emp is None:
            continue
        for c, rc in emp.ranges.items():
            single = rc.try_to_single_value()
            if single is not None:
                opt.constants[(i, c)] = single
            else:
                ranges[(i, c)] = rc
        for cls in emp.classes:
            members = sorted(cls)
            for other in members[1:]:
                opt.equalities.append(((i, members[0]), (i, other)))
    return opt, ranges
