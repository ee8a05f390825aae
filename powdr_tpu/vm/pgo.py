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
        count = len(find_occurrences(block, result))
        if count < min_exec_count:
            continue
        pre.append((count * original_cells(block), count, block))
    pre.sort(key=lambda t: t[0], reverse=True)
    out = []
    for _, count, block in pre[:max_candidates]:
        apc = build_apc(block, degree_bound, empirical=emp)
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
