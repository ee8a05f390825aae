"""Profile-guided autoprecompile selection.

Counterpart of the reference's PGO modes and greedy knapsack selection
(/root/reference/autoprecompiles/src/pgo/mod.rs:24-46,
pgo/cell/selection.rs:132).  Three modes, as in the reference:

- "cell" (default): value = trace cells saved per execution * times
  executed, cost = APC columns, under an optional max-total-columns
  budget — with SUPERBLOCK-OVERLAP accounting: a lazy priority queue
  re-counts every candidate's occurrences over the execution with the
  already-selected candidates' occurrences removed, so two overlapping
  candidates never double-count shared savings
  (pgo/cell/selection.rs `select_blocks_greedy`).
- "instruction": value = instructions in the block * times executed.
- "none": value = instructions in the block (no profile needed).
"""
from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..apc.optimizer import DegreeBound
from .apc import VmApc, build_apc
from .blocks import BasicBlock, block_execution_count, detect_basic_blocks, pc_profile
from .executor import ExecutionResult
from .machines import registry


@dataclass
class Candidate:
    apc: VmApc
    execution_count: int
    cells_saved: int  # per full run
    width: int  # apc columns
    n_instructions: int = 0
    #: per-occurrence pc_trace position lists (overlap accounting)
    occurrences: Optional[List[List[int]]] = None

    @property
    def per_exec_saved(self) -> int:
        return self.cells_saved // self.execution_count if self.execution_count else 0


def original_cells(block: BasicBlock) -> int:
    reg = registry()
    return sum(len(reg[ins.op][0].cols) for ins in block.instructions)


def generate_candidates(
    program,
    result: ExecutionResult,
    degree_bound: Optional[DegreeBound] = None,
    min_block_len: int = 2,
    min_exec_count: int = 2,
    superblocks: bool = True,
    optimistic: bool = False,
    max_candidates: int = 24,
) -> List[Candidate]:
    """Candidate APCs over basic blocks and (optionally) superblocks;
    `optimistic=True` detects empirical constraints once and bakes them
    into every candidate (runtime-checked at occurrence gathering)."""
    from .apc import find_occurrences
    from .blocks import detect_superblocks

    emp = None
    if optimistic:
        from .empirical import detect

        emp = detect(result, program)
    blocks = detect_basic_blocks(program)
    cands_blocks = [b for b in blocks if len(b) >= min_block_len and b.instructions[-1].op != "halt"]
    if superblocks:
        cands_blocks += detect_superblocks(program, result.pc_trace, blocks)
    # rank by a cheap pre-estimate before paying for optimization
    pre = []
    for block in cands_blocks:
        occs = find_occurrences(block, result)
        count = len(occs)
        if count < min_exec_count:
            continue
        pre.append((count * original_cells(block), count, block, occs))
    pre.sort(key=lambda t: t[0], reverse=True)
    out = []
    for _, count, block, occs in pre[:max_candidates]:
        apc = build_apc(block, degree_bound, empirical=emp)
        width = apc.report.after["columns"]
        saved = count * (original_cells(block) - width)
        if saved <= 0:
            continue
        out.append(
            Candidate(
                apc=apc,
                execution_count=count,
                cells_saved=saved,
                width=width,
                n_instructions=len(block.instructions),
                occurrences=occs,
            )
        )
    out.sort(key=lambda c: c.cells_saved, reverse=True)
    return out


def _value(c: Candidate, mode: str, live_count: int) -> int:
    if mode == "cell":
        return live_count * c.per_exec_saved
    if mode == "instruction":
        return live_count * c.n_instructions
    if mode == "none":
        return c.n_instructions
    raise ValueError(f"unknown PGO mode {mode!r} (cell/instruction/none)")


def select_apcs(
    candidates: List[Candidate],
    max_apcs: Optional[int] = None,
    max_total_columns: Optional[int] = None,
    mode: str = "cell",
) -> List[VmApc]:
    """Greedy selection under the budgets.

    In "cell" mode (when candidates carry occurrence positions), shared
    savings between overlapping candidates are not double-counted: after
    each selection the remaining candidates' values are lazily re-counted
    over the execution with the selected occurrences removed — a stale
    priority is pushed back with its updated value instead of winning
    (the reference's PriorityQueue scheme, pgo/cell/selection.rs:132)."""
    if mode in ("instruction", "none"):
        ordered = sorted(
            candidates, key=lambda c: _value(c, mode, c.execution_count), reverse=True
        )
        if max_apcs is not None:
            ordered = ordered[:max_apcs]
        return [c.apc for c in ordered]

    chosen: List[VmApc] = []
    total_cols = 0
    consumed: set = set()
    heap: List[Tuple[int, int]] = [
        (-_value(c, mode, c.execution_count), i) for i, c in enumerate(candidates)
    ]
    heapq.heapify(heap)
    while heap:
        if max_apcs is not None and len(chosen) >= max_apcs:
            break
        negv, i = heapq.heappop(heap)
        c = candidates[i]
        if max_total_columns is not None and total_cols + c.width > max_total_columns:
            continue  # does not fit; keep trying smaller candidates
        if c.occurrences is None:
            # no overlap information: plain greedy (legacy callers)
            if -negv <= 0:
                continue
            chosen.append(c.apc)
            total_cols += c.width
            continue
        live = [o for o in c.occurrences if consumed.isdisjoint(o)]
        value = _value(c, mode, len(live))
        if value <= 0:
            continue
        if value < -negv:
            # stale priority: re-insert with the post-overlap value
            heapq.heappush(heap, (-value, i))
            continue
        chosen.append(c.apc)
        total_cols += c.width
        for o in live:
            consumed.update(o)
    return chosen
