"""ELF32 RISC-V loader: external rv32im binaries -> VM programs.

Counterpart of the reference's goblin-based loader
(/root/reference/riscv-elf/src/lib.rs:45 `load_elf`: PT_LOAD segments,
text decoding, jumpdests) rebuilt natively: a dependency-free ELF32
parser plus an rv32im instruction decoder targeting this framework's
`Instruction` form (absolute branch/jump targets, full 32-bit lui/auipc
immediates).

x0-write semantics: this VM's instruction machines always write rd, so
architectural writes to x0 are mapped to the shadow discard register
x32 (address-space-1 cell 32 — never read by any decoded instruction,
so the hardwired-zero reads of real x0 stay intact).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, List, Tuple

from .isa import Instruction

PT_LOAD = 1
PF_X = 1

DISCARD_REG = 32  # shadow rd for architectural x0 writes


@dataclass
class LoadedElf:
    program: List[Instruction]
    initial_mem: Dict[int, int]  # word-aligned byte address -> 32-bit value
    text_base: int  # vaddr of program[0] (the executor pc_base)
    entry_pc: int  # e_entry vaddr (the executor start pc)


def _sext(v: int, bits: int) -> int:
    if v & (1 << (bits - 1)):
        v -= 1 << bits
    return v


_R_FUNCT = {
    (0, 0x00): "add", (0, 0x20): "sub", (1, 0x00): "sll", (2, 0x00): "slt",
    (3, 0x00): "sltu", (4, 0x00): "xor", (5, 0x00): "srl", (5, 0x20): "sra",
    (6, 0x00): "or", (7, 0x00): "and",
    (0, 0x01): "mul", (1, 0x01): "mulh", (2, 0x01): "mulhsu", (3, 0x01): "mulhu",
    (4, 0x01): "div", (5, 0x01): "divu", (6, 0x01): "rem", (7, 0x01): "remu",
}
_I_FUNCT = {0: "addi", 2: "slti", 3: "sltiu", 4: "xori", 6: "ori", 7: "andi"}
_L_FUNCT = {0: "lb", 1: "lh", 2: "lw", 4: "lbu", 5: "lhu"}
_S_FUNCT = {0: "sb", 1: "sh", 2: "sw"}
_B_FUNCT = {0: "beq", 1: "bne", 4: "blt", 5: "bge", 6: "bltu", 7: "bgeu"}


def decode_rv32(word: int, pc: int, base: int = 0) -> Instruction:
    """Decode one rv32im instruction at vaddr `pc` (the VM executes at
    real vaddrs — pc_base support in the executor).  Branch/jump targets
    become absolute vaddrs."""
    opc = word & 0x7F
    rd = (word >> 7) & 0x1F
    funct3 = (word >> 12) & 0x7
    rs1 = (word >> 15) & 0x1F
    rs2 = (word >> 20) & 0x1F
    funct7 = (word >> 25) & 0x7F

    def wrd(r):  # map architectural x0 writes to the discard register
        return DISCARD_REG if r == 0 else r

    if opc == 0x33:  # R-type
        op = _R_FUNCT.get((funct3, funct7))
        if op is None:
            raise ValueError(f"bad R-type funct {funct3}/{funct7:#x} at pc {pc:#x}")
        return Instruction(op=op, rd=wrd(rd), rs1=rs1, rs2=rs2)
    if opc == 0x13:  # I-type ALU
        imm = _sext(word >> 20, 12)
        if funct3 == 1:
            return Instruction(op="slli", rd=wrd(rd), rs1=rs1, imm=(word >> 20) & 31)
        if funct3 == 5:
            op = "srai" if funct7 == 0x20 else "srli"
            return Instruction(op=op, rd=wrd(rd), rs1=rs1, imm=(word >> 20) & 31)
        return Instruction(op=_I_FUNCT[funct3], rd=wrd(rd), rs1=rs1, imm=imm)
    if opc == 0x03:  # loads
        return Instruction(
            op=_L_FUNCT[funct3], rd=wrd(rd), rs1=rs1, imm=_sext(word >> 20, 12)
        )
    if opc == 0x23:  # stores
        imm = _sext(((word >> 25) << 5) | ((word >> 7) & 0x1F), 12)
        return Instruction(op=_S_FUNCT[funct3], rs1=rs1, rs2=rs2, imm=imm)
    if opc == 0x63:  # branches -> absolute target
        imm = _sext(
            (((word >> 31) & 1) << 12)
            | (((word >> 7) & 1) << 11)
            | (((word >> 25) & 0x3F) << 5)
            | (((word >> 8) & 0xF) << 1),
            13,
        )
        return Instruction(op=_B_FUNCT[funct3], rs1=rs1, rs2=rs2, imm=pc + imm)
    if opc == 0x37:  # lui (full 32-bit immediate in this ISA)
        return Instruction(op="lui", rd=wrd(rd), imm=(word & 0xFFFFF000) % (1 << 32))
    if opc == 0x17:  # auipc (the VM runs at real vaddrs: pc IS the vaddr)
        return Instruction(op="auipc", rd=wrd(rd), imm=word & 0xFFFFF000)
    if opc == 0x6F:  # jal -> absolute target
        imm = _sext(
            (((word >> 31) & 1) << 20)
            | (((word >> 12) & 0xFF) << 12)
            | (((word >> 20) & 1) << 11)
            | (((word >> 21) & 0x3FF) << 1),
            21,
        )
        return Instruction(op="jal", rd=wrd(rd), imm=pc + imm)
    if opc == 0x67:  # jalr (dynamic; pc space == vaddr space, no rebase)
        return Instruction(op="jalr", rd=wrd(rd), rs1=rs1, imm=_sext(word >> 20, 12))
    if opc == 0x73:  # ecall/ebreak -> halt (no syscall surface yet)
        return Instruction(op="halt")
    if opc == 0x0F:  # fence -> nop (taken branch to pc+4)
        return Instruction(op="beq", rs1=0, rs2=0, imm=pc + 4)
    raise ValueError(f"unsupported opcode {opc:#x} at pc {pc:#x}")


def load_elf(data: bytes) -> LoadedElf:
    """Parse an ELF32 little-endian RISC-V executable: PT_LOAD segments
    become the program (executable segment, decoded) and the initial RAM
    image (data segments, word-granular)."""
    assert data[:4] == b"\x7fELF", "not an ELF"
    ei_class, ei_data = data[4], data[5]
    assert ei_class == 1 and ei_data == 1, "need ELF32 little-endian"
    (e_machine,) = struct.unpack_from("<H", data, 18)
    assert e_machine == 0xF3, f"not RISC-V (e_machine {e_machine:#x})"
    (e_entry,) = struct.unpack_from("<I", data, 24)
    (e_phoff,) = struct.unpack_from("<I", data, 28)
    (e_phentsize,) = struct.unpack_from("<H", data, 42)
    (e_phnum,) = struct.unpack_from("<H", data, 44)

    text = None  # (vaddr, bytes)
    initial_mem: Dict[int, int] = {}
    for i in range(e_phnum):
        off = e_phoff + i * e_phentsize
        p_type, p_offset, p_vaddr, _p_paddr, p_filesz, p_memsz, p_flags, _p_align = (
            struct.unpack_from("<8I", data, off)
        )
        if p_type != PT_LOAD:
            continue
        seg = data[p_offset : p_offset + p_filesz] + b"\x00" * (p_memsz - p_filesz)
        if p_flags & PF_X:
            assert text is None, "multiple executable segments unsupported"
            text = (p_vaddr, seg)
        else:
            assert p_vaddr % 4 == 0, "data segment must be word-aligned"
            for w in range(0, len(seg), 4):
                chunk = seg[w : w + 4].ljust(4, b"\x00")
                val = struct.unpack("<I", chunk)[0]
                if val:
                    initial_mem[p_vaddr + w] = val
    assert text is not None, "no executable segment"
    base, code = text
    assert base % 4 == 0 and len(code) % 4 == 0
    program = [
        decode_rv32(struct.unpack_from("<I", code, off)[0], base + off)
        for off in range(0, len(code), 4)
    ]
    return LoadedElf(
        program=program,
        initial_mem=initial_mem,
        text_base=base,
        entry_pc=e_entry,
    )
