"""ELF32 loader: a synthetic RISC-V ELF (in-test encoder) loads, runs at
its real vaddrs on both executors, and the chip system mock-checks —
counterpart of the reference's riscv-elf ingestion
(/root/reference/riscv-elf/src/lib.rs:45)."""
import struct

import numpy as np

from powdr_tpu.vm.elf import DISCARD_REG, load_elf
from powdr_tpu.vm.executor import Executor
from powdr_tpu.vm.executor_native import run_native
from powdr_tpu.vm.system import build_chips, mock_check


# -- minimal rv32 encoder (test-side ground truth) ---------------------------

REG = {f"x{i}": i for i in range(32)}


def r_type(f7, rs2, rs1, f3, rd, opc):
    return (f7 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | opc


def i_type(imm, rs1, f3, rd, opc):
    return ((imm & 0xFFF) << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | opc


def s_type(imm, rs2, rs1, f3, opc):
    return (
        (((imm >> 5) & 0x7F) << 25)
        | (rs2 << 20)
        | (rs1 << 15)
        | (f3 << 12)
        | ((imm & 0x1F) << 7)
        | opc
    )


def b_type(imm, rs2, rs1, f3):
    return (
        (((imm >> 12) & 1) << 31)
        | (((imm >> 5) & 0x3F) << 25)
        | (rs2 << 20)
        | (rs1 << 15)
        | (f3 << 12)
        | (((imm >> 1) & 0xF) << 8)
        | (((imm >> 11) & 1) << 7)
        | 0x63
    )


def j_type(imm, rd):
    return (
        (((imm >> 20) & 1) << 31)
        | (((imm >> 1) & 0x3FF) << 21)
        | (((imm >> 11) & 1) << 20)
        | (((imm >> 12) & 0xFF) << 12)
        | (rd << 7)
        | 0x6F
    )


def make_elf(words, text_vaddr, data_vaddr=None, data=b"", entry=None):
    """Minimal ELF32 little-endian RISC-V executable with one text and an
    optional data PT_LOAD segment."""
    code = b"".join(struct.pack("<I", w) for w in words)
    ehsize, phentsize = 52, 32
    nph = 1 + (1 if data else 0)
    text_off = ehsize + nph * phentsize
    data_off = text_off + len(code)
    eh = struct.pack(
        "<4sBBBBB7xHHIIIIIHHHHHH",
        b"\x7fELF", 1, 1, 1, 0, 0,  # ELF32, LE, current, SysV
        2, 0xF3,  # ET_EXEC, EM_RISCV
        1,  # e_version
        entry if entry is not None else text_vaddr,
        ehsize, 0, 0,  # phoff, shoff, flags
        ehsize, phentsize, nph, 0, 0, 0,
    )
    phs = struct.pack(
        "<8I", 1, text_off, text_vaddr, text_vaddr, len(code), len(code), 0b101, 4
    )
    if data:
        phs += struct.pack(
            "<8I", 1, data_off, data_vaddr, data_vaddr, len(data), len(data), 0b110, 4
        )
    return eh + phs + code + (data if data else b"")


def test_elf_load_run_and_prove():
    base = 0x10000
    data_base = 0x20000
    # sum ints 1..5 from a data table; exercises x0-write (j = jal x0),
    # auipc at real vaddrs, jalr return, loads, branches
    words = [
        # entry:  auipc x5, 0      ; x5 = entry vaddr
        0x17 | (5 << 7),
        i_type(0, 0, 0, 0, 0x13),  # addi x0, x0, 0 (nop -> discard reg)
        # lui-less address build: x6 = data_base via addi chain is long;
        # use lui: x6 = 0x20000
        0x37 | (6 << 7) | (0x20 << 12),  # lui x6, 0x20  -> imm 0x20000
        i_type(0, 0, 0, 7, 0x13),  # addi x7 = 0 (accumulator)
        i_type(0, 0, 0, 28, 0x13),  # addi x28 = 0 (i)
        i_type(5, 0, 0, 29, 0x13),  # addi x29 = 5
        # loop: x30 = i*4; x31 = mem[x6 + x30]; acc += x31; i++; blt i,5,loop
        r_type(0, 28, 28, 0, 30, 0x33),  # add x30 = i + i
        r_type(0, 30, 30, 0, 30, 0x33),  # add x30 = 2i + 2i = 4i
        r_type(0, 30, 6, 0, 31, 0x33),  # add x31 = x6 + 4i
        i_type(0, 31, 2, 31, 0x03),  # lw x31, 0(x31)
        r_type(0, 31, 7, 0, 7, 0x33),  # add x7 += x31
        i_type(1, 28, 0, 28, 0x13),  # addi i += 1
        b_type(-6 * 4 & 0x1FFF, 29, 28, 4),  # blt x28, x29, loop (-24)
        # store result at data_base+0x40, then halt via ecall
        s_type(0x40, 7, 6, 2, 0x23),  # sw x7, 0x40(x6)
        j_type(4, 0),  # jal x0, +4  (x0-write -> discard)
        0x73,  # ecall -> halt
    ]
    table = b"".join(struct.pack("<I", v) for v in [10, 20, 30, 40, 50])
    blob = make_elf(words, base, data_base, table)
    loaded = load_elf(blob)
    assert loaded.text_base == base and loaded.entry_pc == base
    assert loaded.initial_mem[data_base + 8] == 30
    assert loaded.program[14].rd == DISCARD_REG  # jal x0 mapped

    py = Executor(
        loaded.program, loaded.initial_mem, pc_base=base, start_pc=loaded.entry_pc
    ).run()
    assert py.final_mem[(2, data_base + 0x40)][1] == 150
    assert py.final_mem[(1, 5)][1] == base  # auipc captured the vaddr

    nat = run_native(
        loaded.program, loaded.initial_mem, pc_base=base, start_pc=loaded.entry_pc
    )
    assert nat.pc_trace == py.pc_trace and nat.final_mem == py.final_mem

    mock_check(build_chips(loaded.program, py))


def test_elf_entry_offset():
    """e_entry inside the text segment starts execution mid-program."""
    base = 0x10000
    words = [
        0x73,  # would halt immediately if entered at base
        i_type(7, 0, 0, 5, 0x13),  # entry: x5 = 7
        0x73,  # halt
    ]
    blob = make_elf(words, base, entry=base + 4)
    loaded = load_elf(blob)
    py = Executor(loaded.program, {}, pc_base=base, start_pc=loaded.entry_pc).run()
    assert py.final_mem[(1, 5)][1] == 7
    assert py.pc_trace[0] == base + 4
    mock_check(build_chips(loaded.program, py))


# -- relocations / symbols / prover data --------------------------------------


def make_elf_with_sections(
    words, text_vaddr, data_vaddr, data, symbols, relas_text, relas_data,
    prover_data=b"", entry=None,
):
    """ELF32 with section headers: .text/.data PT_LOADs plus .symtab,
    .strtab and .rela.{text,data} sections, and an optional
    PT_POWDR_PROVER_DATA segment (the reference's custom 0x600000da)."""
    code = b"".join(struct.pack("<I", w) for w in words)
    ehsize, phentsize, shentsize = 52, 32, 40
    nph = 2 + (1 if prover_data else 0)
    text_off = ehsize + nph * phentsize
    data_off = text_off + len(code)
    pd_off = data_off + len(data)

    # .strtab
    strtab = b"\x00"
    name_off = {}
    for name, _v, _info in symbols:
        name_off[name] = len(strtab)
        strtab += name.encode() + b"\x00"
    # .symtab: entry 0 is the null symbol
    symtab = struct.pack("<IIIBBH", 0, 0, 0, 0, 0, 0)
    for name, v, info in symbols:
        symtab += struct.pack("<IIIBBH", name_off[name], v, 0, info, 0, 0)

    def rela(entries):
        return b"".join(struct.pack("<IIi", o, (s << 8) | t, a) for o, t, s, a in entries)

    rt, rd = rela(relas_text), rela(relas_data)
    sym_off = pd_off + len(prover_data)
    str_off = sym_off + len(symtab)
    rt_off = str_off + len(strtab)
    rd_off = rt_off + len(rt)
    sh_off = rd_off + len(rd)

    # sections: null, .symtab(link=2 -> .strtab), .strtab, .rela.text, .rela.data
    shs = struct.pack("<10I", *([0] * 10))
    shs += struct.pack("<10I", 0, 2, 0, 0, sym_off, len(symtab), 2, 0, 4, 16)
    shs += struct.pack("<10I", 0, 3, 0, 0, str_off, len(strtab), 0, 0, 1, 0)
    shs += struct.pack("<10I", 0, 4, 0, text_vaddr, rt_off, len(rt), 1, 0, 4, 12)
    shs += struct.pack("<10I", 0, 4, 0, data_vaddr, rd_off, len(rd), 1, 0, 4, 12)

    eh = struct.pack(
        "<4sBBBBB7xHHIIIIIHHHHHH",
        b"\x7fELF", 1, 1, 1, 0, 0,
        2, 0xF3, 1,
        entry if entry is not None else text_vaddr,
        ehsize, sh_off, 0,
        ehsize, phentsize, nph, shentsize, 5, 2,
    )
    phs = struct.pack(
        "<8I", 1, text_off, text_vaddr, text_vaddr, len(code), len(code), 0b101, 4
    )
    phs += struct.pack(
        "<8I", 1, data_off, data_vaddr, data_vaddr, len(data), len(data), 0b110, 4
    )
    if prover_data:
        phs += struct.pack(
            "<8I", 0x600000DA, pd_off, 0x30000, 0x30000,
            len(prover_data), len(prover_data), 0b100, 4,
        )
    return eh + phs + code + data + prover_data + symtab + strtab + rt + rd + shs


def test_elf_relocations_symbols_and_prover_data():
    """A relocated ELF32 fixture loads, runs, and proves (mock check):
    HI20/LO12_I patch a lui/addi pair to a symbol address, R_RISCV_32
    patches a data word to a symbol, R_RISCV_RELATIVE plants an absolute
    address, the symbol table yields labels, and the prover-data segment
    loads separately (riscv-elf/src/lib.rs:34,224-258)."""
    base, dbase = 0x10000, 0x20000
    target = dbase + 12  # the symbol the relocations point at (data word 3)
    words = [
        0x37 | (6 << 7),                  # lui x6, 0     <- HI20(target)
        i_type(0, 6, 0, 6, 0x13),         # addi x6, x6, 0 <- LO12_I(target)
        i_type(0, 6, 2, 7, 0x03),         # lw x7, 0(x6)   -> mem[target]
        i_type(0, 0, 0, 28, 0x13),        # nop
        0x73,                             # halt
    ]
    # data: word0 <- R_RISCV_32(sym=target_sym)+4; word1 <- RELATIVE(dbase+8)
    data = struct.pack("<4I", 0, 0, 0xDEAD, 77)  # word at target = 77
    symbols = [
        ("main", base, 0x12),        # STB_GLOBAL<<4 | STT_FUNC
        ("the_word", target, 0x11),  # STT_OBJECT
    ]
    relas_text = [
        (base + 0, R := 26, 2, 0),   # HI20 on the lui, sym 2 (the_word)
        (base + 4, 27, 2, 0),        # LO12_I on the addi
    ]
    relas_data = [
        (dbase + 0, 1, 2, 4),        # R_RISCV_32: the_word + 4
        (dbase + 4, 3, 0, dbase + 8),  # RELATIVE: addend is the address
    ]
    pd = struct.pack("<2I", 0xC0FFEE, 42)
    blob = make_elf_with_sections(
        words, base, dbase, data, symbols, relas_text, relas_data, prover_data=pd
    )
    from powdr_tpu.vm.elf import R_RISCV_32, R_RISCV_HI20  # import check

    loaded = load_elf(blob)
    assert loaded.symbols["the_word"] == target
    assert loaded.labels[base] == "main"
    assert loaded.initial_mem[dbase + 0] == target + 4  # R_RISCV_32
    assert loaded.initial_mem[dbase + 4] == dbase + 8  # RELATIVE
    assert loaded.prover_data == {0x30000: 0xC0FFEE, 0x30004: 42}
    # the patched lui/addi must compute x6 = target, so lw x7 reads 77
    py = Executor(
        loaded.program, loaded.initial_mem, pc_base=base, start_pc=loaded.entry_pc
    ).run()
    assert py.final_mem[(1, 6)][1] == target
    assert py.final_mem[(1, 7)][1] == 77
    mock_check(build_chips(loaded.program, py))
