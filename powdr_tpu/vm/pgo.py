"""Profile-guided autoprecompile selection.

Counterpart of the reference's PGO modes and greedy knapsack selection
(/root/reference/autoprecompiles/src/pgo/mod.rs:24-46,
pgo/cell/selection.rs:132): candidate blocks are valued by the trace
cells they save (execution_count * (original_cells - apc_cells)) and
greedily selected under an optional APC-count / column budget."""
from __future__ import annotations

from dataclasses import dataclass
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


def original_cells(block: BasicBlock) -> int:
    reg = registry()
    return sum(len(reg[ins.op][0].cols) for ins in block.instructions)


def generate_candidates(
    program,
    result: ExecutionResult,
    degree_bound: Optional[DegreeBound] = None,
    min_block_len: int = 2,
    min_exec_count: int = 2,
) -> List[Candidate]:
    profile = pc_profile(result.pc_trace)
    out = []
    for block in detect_basic_blocks(program):
        if len(block) < min_block_len or block.instructions[-1].op == "halt":
            continue
        count = block_execution_count(block, profile)
        if count < min_exec_count:
            continue
        apc = build_apc(block, degree_bound)
        width = apc.report.after["columns"]
        saved = count * (original_cells(block) - width)
        if saved <= 0:
            continue
        out.append(Candidate(apc=apc, execution_count=count, cells_saved=saved, width=width))
    out.sort(key=lambda c: c.cells_saved, reverse=True)
    return out


def select_apcs(
    candidates: List[Candidate],
    max_apcs: Optional[int] = None,
    max_total_columns: Optional[int] = None,
) -> List[VmApc]:
    """Greedy knapsack: best value first under the budgets (the reference
    additionally accounts superblock overlap — superblocks are a later
    round)."""
    chosen: List[VmApc] = []
    total_cols = 0
    for c in candidates:
        if max_apcs is not None and len(chosen) >= max_apcs:
            break
        if max_total_columns is not None and total_cols + c.width > max_total_columns:
            continue
        chosen.append(c.apc)
        total_cols += c.width
    return chosen
