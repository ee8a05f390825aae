"""Basic-block detection and execution profiling.

Counterpart of the reference's block mining
(/root/reference/autoprecompiles/src/blocks/detection.rs:9-60 — jumpdest
analysis — and execution_profile.rs — pc counting).  Superblock mining
(blocks/mod.rs:231-422) needs optimistic constraints and is a later
round."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from .isa import Instruction

CONTROL = {"beq", "bne", "bltu", "jal", "jalr", "halt"}


@dataclass
class BasicBlock:
    start_pc: int
    instructions: List[Instruction]
    #: explicit pc list for superblocks (non-contiguous across branches)
    pc_list: "Optional[List[int]]" = None

    def __len__(self):
        return len(self.instructions)

    @property
    def pcs(self) -> List[int]:
        if self.pc_list is not None:
            return self.pc_list
        return [self.start_pc + 4 * i for i in range(len(self.instructions))]

    @property
    def is_superblock(self) -> bool:
        return self.pc_list is not None


def detect_basic_blocks(program: List[Instruction]) -> List[BasicBlock]:
    """Leaders: entry, branch/jump targets, fallthroughs after control flow.
    A block runs from its leader up to and including the first control-flow
    instruction (whose computed target becomes the APC's exit pc)."""
    leaders = {0}
    for i, ins in enumerate(program):
        if ins.op in CONTROL:
            if i + 1 < len(program):
                leaders.add(4 * (i + 1))
            if ins.op in ("beq", "bne", "bltu", "jal"):
                leaders.add(ins.imm % (1 << 32))
    blocks = []
    sorted_leaders = sorted(leaders)
    for li, start in enumerate(sorted_leaders):
        idx = start // 4
        if idx >= len(program):
            continue
        end = len(program)
        if li + 1 < len(sorted_leaders):
            end = min(end, sorted_leaders[li + 1] // 4)
        insns = []
        for i in range(idx, end):
            insns.append(program[i])
            if program[i].op in CONTROL:
                break
        if insns:
            blocks.append(BasicBlock(start_pc=start, instructions=insns))
    return blocks


def detect_superblocks(
    program: List[Instruction],
    pc_trace: List[int],
    basic_blocks: Optional[List[BasicBlock]] = None,
    max_blocks: int = 4,
    min_count: int = 2,
) -> List[BasicBlock]:
    """Mine frequently-executed sequences of consecutive basic blocks
    (reference: detect_superblocks, blocks/mod.rs:231-422 — windows of BB
    sequences with non-overlapping counting).  Returned superblocks carry
    explicit pc lists; the APC builder pins every instruction's pc, which
    makes the branch outcomes at block boundaries circuit-enforced."""
    blocks = basic_blocks if basic_blocks is not None else detect_basic_blocks(program)
    by_start = {b.start_pc: b for b in blocks}
    # map the trace onto full block executions
    seq: List[int] = []  # block start pcs, in execution order
    i = 0
    n = len(pc_trace)
    while i < n:
        b = by_start.get(pc_trace[i])
        if b is not None and pc_trace[i : i + len(b)] == b.pcs:
            seq.append(b.start_pc)
            i += len(b)
        else:
            i += 1
    out: List[BasicBlock] = []
    seen = set()
    for width in range(2, max_blocks + 1):
        counts: Dict[Tuple[int, ...], int] = {}
        j = 0
        while j + width <= len(seq):
            key = tuple(seq[j : j + width])
            counts[key] = counts.get(key, 0) + 1
            j += 1
        for key, cnt in counts.items():
            if cnt < min_count or key in seen:
                continue
            # the blocks must be branch-terminated (halt-terminated blocks
            # cannot be mid-sequence) and actually contiguous in some run
            seen.add(key)
            parts = [by_start[s] for s in key]
            if any(p.instructions[-1].op == "halt" for p in parts[:-1]):
                continue
            instructions: List[Instruction] = []
            pcs: List[int] = []
            for p in parts:
                instructions.extend(p.instructions)
                pcs.extend(p.pcs)
            out.append(BasicBlock(start_pc=key[0], instructions=instructions, pc_list=pcs))
    return out


def pc_profile(pc_trace: List[int]) -> Dict[int, int]:
    out: Dict[int, int] = {}
    for pc in pc_trace:
        out[pc] = out.get(pc, 0) + 1
    return out


def block_execution_count(block: BasicBlock, profile: Dict[int, int]) -> int:
    return profile.get(block.start_pc, 0)
