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
#: powdr's custom prover-data segment type (riscv-elf/src/lib.rs:34)
PT_POWDR_PROVER_DATA = 0x600000DA
PF_X = 1

SHT_SYMTAB = 2
SHT_STRTAB = 3
SHT_RELA = 4

# RISC-V relocation types (riscv-elf/src/lib.rs:12 usage surface)
R_RISCV_32 = 1
R_RISCV_RELATIVE = 3
R_RISCV_HI20 = 26
R_RISCV_LO12_I = 27
R_RISCV_LO12_S = 28

DISCARD_REG = 32  # shadow rd for architectural x0 writes


@dataclass
class LoadedElf:
    program: List[Instruction]
    initial_mem: Dict[int, int]  # word-aligned byte address -> 32-bit value
    text_base: int  # vaddr of program[0] (the executor pc_base)
    entry_pc: int  # e_entry vaddr (the executor start pc)
    #: symbol name -> vaddr (from .symtab; debug_info.rs SymbolTable role)
    symbols: Dict[str, int] = None
    #: vaddr -> function-symbol name (text labels, debug_info.rs labels)
    labels: Dict[int, str] = None
    #: contents of PT_POWDR_PROVER_DATA segments (word addr -> value)
    prover_data: Dict[int, int] = None
    #: static jump destinations (branch/jal targets inside text)
    jumpdests: "set" = None


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


def _read_symbols(data: bytes, shdrs) -> Tuple[Dict[str, int], Dict[int, str]]:
    """(.symtab, .strtab) -> name->vaddr and text labels (STT_FUNC)
    (the reference's SymbolTable/debug-info layer, riscv-elf/src/debug_info.rs)."""
    symbols: Dict[str, int] = {}
    labels: Dict[int, str] = {}
    for sh in shdrs:
        if sh["type"] != SHT_SYMTAB:
            continue
        strtab = shdrs[sh["link"]]
        straw = data[strtab["offset"] : strtab["offset"] + strtab["size"]]
        count = sh["size"] // 16  # Elf32_Sym
        for i in range(count):
            off = sh["offset"] + 16 * i
            st_name, st_value, _st_size, st_info = struct.unpack_from("<IIIB", data, off)
            if st_name == 0:
                continue
            end = straw.index(b"\x00", st_name)
            name = straw[st_name:end].decode("utf-8", "replace")
            symbols[name] = st_value
            if st_info & 0xF == 2:  # STT_FUNC
                labels[st_value] = name
    return symbols, labels


def _apply_relocations(data: bytes, shdrs, image: Dict[int, bytearray], symtab_vals):
    """Patch the loaded image per .rela.* sections: R_RISCV_32 (S+A),
    R_RISCV_RELATIVE (B+A, B=0 for ET_EXEC), and the HI20/LO12 pairs on
    text words (riscv-elf/src/lib.rs:224-258 handles 32/RELATIVE; HI20 is
    the non-PIE label marker there — patched here for completeness)."""

    def patch_word(vaddr: int, fn):
        for base, buf in image.items():
            off = vaddr - base
            if 0 <= off <= len(buf) - 4:
                (w,) = struct.unpack_from("<I", buf, off)
                struct.pack_into("<I", buf, off, fn(w) & 0xFFFFFFFF)
                return True
        return False

    for sh in shdrs:
        if sh["type"] != SHT_RELA:
            continue
        count = sh["size"] // 12  # Elf32_Rela
        for i in range(count):
            off = sh["offset"] + 12 * i
            r_offset, r_info, r_addend = struct.unpack_from("<IIi", data, off)
            r_type = r_info & 0xFF
            sym = r_info >> 8
            s = symtab_vals.get(sym, 0)
            value = (s + r_addend) & 0xFFFFFFFF
            if r_type == R_RISCV_32:
                patch_word(r_offset, lambda w: value)
            elif r_type == R_RISCV_RELATIVE:
                patch_word(r_offset, lambda w: r_addend)
            elif r_type == R_RISCV_HI20:
                hi = ((value + 0x800) >> 12) & 0xFFFFF
                patch_word(r_offset, lambda w: (w & 0xFFF) | (hi << 12))
            elif r_type == R_RISCV_LO12_I:
                lo = (value - (((value + 0x800) >> 12) << 12)) & 0xFFF
                patch_word(r_offset, lambda w: (w & 0xFFFFF) | (lo << 20))
            elif r_type == R_RISCV_LO12_S:
                lo = (value - (((value + 0x800) >> 12) << 12)) & 0xFFF
                patch_word(
                    r_offset,
                    lambda w: (w & 0x1FFF07F) | ((lo & 0x1F) << 7) | ((lo >> 5) << 25),
                )
            else:
                raise ValueError(f"unsupported relocation type {r_type}")


def _symtab_values(data: bytes, shdrs) -> Dict[int, int]:
    """Symbol index -> st_value, for relocation resolution."""
    for sh in shdrs:
        if sh["type"] == SHT_SYMTAB:
            count = sh["size"] // 16
            return {
                i: struct.unpack_from("<I", data, sh["offset"] + 16 * i + 4)[0]
                for i in range(count)
            }
    return {}


def load_elf(data: bytes) -> LoadedElf:
    """Parse an ELF32 little-endian RISC-V executable: PT_LOAD segments
    become the program (executable segment, decoded after relocation) and
    the initial RAM image (data segments, word-granular); .rela.*
    relocations are applied, .symtab yields symbols + text labels, and
    PT_POWDR_PROVER_DATA segments load into `prover_data`."""
    assert data[:4] == b"\x7fELF", "not an ELF"
    ei_class, ei_data = data[4], data[5]
    assert ei_class == 1 and ei_data == 1, "need ELF32 little-endian"
    (e_machine,) = struct.unpack_from("<H", data, 18)
    assert e_machine == 0xF3, f"not RISC-V (e_machine {e_machine:#x})"
    (e_entry,) = struct.unpack_from("<I", data, 24)
    (e_phoff,) = struct.unpack_from("<I", data, 28)
    (e_shoff,) = struct.unpack_from("<I", data, 32)
    (e_phentsize,) = struct.unpack_from("<H", data, 42)
    (e_phnum,) = struct.unpack_from("<H", data, 44)
    (e_shentsize,) = struct.unpack_from("<H", data, 46)
    (e_shnum,) = struct.unpack_from("<H", data, 48)

    shdrs = []
    for i in range(e_shnum):
        off = e_shoff + i * e_shentsize
        _nm, sh_type, _fl, _ad, sh_offset, sh_size, sh_link = struct.unpack_from(
            "<7I", data, off
        )
        shdrs.append(
            {"type": sh_type, "offset": sh_offset, "size": sh_size, "link": sh_link}
        )

    text_base = None
    image: Dict[int, bytearray] = {}  # segment vaddr -> mutable bytes
    prover_data: Dict[int, int] = {}
    for i in range(e_phnum):
        off = e_phoff + i * e_phentsize
        p_type, p_offset, p_vaddr, _p_paddr, p_filesz, p_memsz, p_flags, _p_align = (
            struct.unpack_from("<8I", data, off)
        )
        seg = bytearray(data[p_offset : p_offset + p_filesz]) + bytearray(
            p_memsz - p_filesz
        )
        if p_type == PT_POWDR_PROVER_DATA:
            for w in range(0, len(seg), 4):
                val = struct.unpack("<I", bytes(seg[w : w + 4]).ljust(4, b"\x00"))[0]
                if val:
                    prover_data[p_vaddr + w] = val
            continue
        if p_type != PT_LOAD:
            continue
        if p_flags & PF_X:
            assert text_base is None, "multiple executable segments unsupported"
            text_base = p_vaddr
        assert p_vaddr % 4 == 0, "segment must be word-aligned"
        image[p_vaddr] = seg
    assert text_base is not None, "no executable segment"

    if shdrs:
        _apply_relocations(data, shdrs, image, _symtab_values(data, shdrs))
    symbols, labels = _read_symbols(data, shdrs) if shdrs else ({}, {})

    initial_mem: Dict[int, int] = {}
    program: List[Instruction] = []
    for vaddr, seg in image.items():
        if vaddr == text_base:
            assert len(seg) % 4 == 0
            program = [
                decode_rv32(struct.unpack_from("<I", seg, off)[0], vaddr + off)
                for off in range(0, len(seg), 4)
            ]
        else:
            for w in range(0, len(seg), 4):
                val = struct.unpack("<I", bytes(seg[w : w + 4]).ljust(4, b"\x00"))[0]
                if val:
                    initial_mem[vaddr + w] = val
    jumpdests = {
        ins.imm
        for ins in program
        if ins.op in ("beq", "bne", "blt", "bge", "bltu", "bgeu", "jal")
    }
    return LoadedElf(
        program=program,
        initial_mem=initial_mem,
        text_base=text_base,
        entry_pc=e_entry,
        symbols=symbols,
        labels=labels,
        prover_data=prover_data,
        jumpdests=jumpdests,
    )
