"""Basic-block detection and execution profiling.

Counterpart of the reference's block mining
(/root/reference/autoprecompiles/src/blocks/detection.rs:9-60 — jumpdest
analysis — and execution_profile.rs — pc counting).  Superblock mining
(blocks/mod.rs:231-422) needs optimistic constraints and is a later
round."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

from .isa import Instruction

CONTROL = {"beq", "bne", "bltu", "jal", "jalr", "halt"}


@dataclass
class BasicBlock:
    start_pc: int
    instructions: List[Instruction]

    def __len__(self):
        return len(self.instructions)

    @property
    def pcs(self) -> List[int]:
        return [self.start_pc + 4 * i for i in range(len(self.instructions))]


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


def pc_profile(pc_trace: List[int]) -> Dict[int, int]:
    out: Dict[int, int] = {}
    for pc in pc_trace:
        out[pc] = out.get(pc, 0) + 1
    return out


def block_execution_count(block: BasicBlock, profile: Dict[int, int]) -> int:
    return profile.get(block.start_pc, 0)
