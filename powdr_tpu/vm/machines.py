"""Per-opcode instruction machines (constraints) + witness generators.

Each opcode gets a SymbolicMachine (built with isa.MachineBuilder/Ctx) and
a witgen function that fills the chip's columns from an execution record.
Byte-limb arithmetic mirrors OpenVM's chip shapes so the APC optimizer's
memory/exec/bus reasoning transfers (SURVEY.md §2 #34 counterpart: our
analog of the RiscvISA symbolic instruction builders).

Record fields provided by the executor (vm/executor.py):
  pc, ts, rd, rs1, rs2, imm, rs1_val, rs2_val, rd_val (new), prev values
  and prev timestamps per access in order, mem_addr/mem_val for lw/sw.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Tuple

from ..ir import expression as ir
from .isa import (
    BITWISE_BUS,
    MEM_BUS,
    OPCODE_ID,
    POW2_BUS,
    RANGE_BUS,
    TS_DELTA,
    CARRY_BITS,
    Ctx,
    MachineBuilder,
    _bool,
    _byte_range_pair,
    _word,
)

P = 2013265921


def _bytes(v: int) -> List[int]:
    return [(v >> (8 * i)) & 0xFF for i in range(4)]


def _imm_cols(b: MachineBuilder, ctx: Ctx) -> List[ir.Var]:
    """imm decomposed into 4 checked bytes against the two 16-bit halves
    delivered by the pc lookup (field-unique encoding of a 32-bit word)."""
    ib = b.cols4("imm_b")
    b.require(
        ir.Mul(ctx.g, ir.Sub(ir.Add(ib[0], ir.Mul(ir.Const(256), ib[1])), ctx.imm_lo))
    )
    b.require(
        ir.Mul(ctx.g, ir.Sub(ir.Add(ib[2], ir.Mul(ir.Const(256), ib[3])), ctx.imm_hi))
    )
    _byte_range_pair(b, ctx.g, ib[0], ib[1])
    _byte_range_pair(b, ctx.g, ib[2], ib[3])
    return ib


def _add_bytes(b: MachineBuilder, g, x: List[ir.Expr], y: List[ir.Expr], prefix: str):
    """z = x + y (mod 2^32) with carry bools; returns z byte cols."""
    z = b.cols4(f"{prefix}__sum")
    carry = [b.col(f"{prefix}__c{i}") for i in range(4)]
    for c in carry:
        _bool(b, c)
    prev = None
    for i in range(4):
        rhs = ir.Add(x[i], y[i]) if prev is None else ir.Add(ir.Add(x[i], y[i]), prev)
        b.require(ir.Mul(g, ir.Sub(ir.Add(z[i], ir.Mul(ir.Const(256), carry[i])), rhs)))
        prev = carry[i]
    _byte_range_pair(b, g, z[0], z[1])
    _byte_range_pair(b, g, z[2], z[3])
    return z


def _wg_add_bytes(cols: Dict[str, int], x: int, y: int, prefix: str):
    z = (x + y) & 0xFFFFFFFF
    zb, xb, yb = _bytes(z), _bytes(x), _bytes(y)
    carry = 0
    for i in range(4):
        t = xb[i] + yb[i] + carry
        carry = t >> 8
        cols[f"{prefix}__c{i}"] = carry
        cols[f"{prefix}__sum__{i}"] = zb[i]
    return z


def _xor_lookup(b: MachineBuilder, g, x: ir.Expr, y: ir.Expr, z: ir.Expr):
    b.send(BITWISE_BUS, g, [x, y, z, ir.Const(1)])


BuildResult = Tuple[MachineBuilder, Ctx]


def _base(op: str) -> BuildResult:
    b = MachineBuilder(name=op)
    ctx = Ctx(b)
    ctx.set_opcode(op)
    return b, ctx


def _wg_base(rec) -> Dict[str, int]:
    imm = rec["imm"] % (1 << 32)
    return {
        "is_valid": 1,
        "from_pc": rec["pc"],
        "from_ts": rec["ts"],
        "rd_ptr": rec["rd"],
        "rs1_ptr": rec["rs1"],
        "rs2_ptr": rec["rs2"],
        "imm_lo": imm & 0xFFFF,
        "imm_hi": imm >> 16,
    }


def _wg_access(cols, prefix, val_bytes, prev_ts, t):
    for i in range(4):
        cols[f"{prefix}__data__{i}"] = val_bytes[i]
    cols[f"{prefix}__prev_ts"] = prev_ts
    cols[f"{prefix}__dt"] = t - prev_ts - 1


def _wg_write(cols, prefix, prev_bytes, prev_ts, t):
    for i in range(4):
        cols[f"{prefix}__prev_data__{i}"] = prev_bytes[i]
    cols[f"{prefix}__prev_ts"] = prev_ts
    cols[f"{prefix}__dt"] = t - prev_ts - 1


# -- ALU reg-reg / reg-imm ----------------------------------------------------


def _alu_build(op: str, use_imm: bool):
    b, ctx = _base(op)
    a = ctx.read(1, ctx.rs1, "rs1")
    if use_imm:
        y = _imm_cols(b, ctx)
    else:
        y = ctx.read(1, ctx.rs2, "rs2")
    kind = op.rstrip("i") if op not in ("sub",) else op
    if op in ("add", "addi"):
        z = _add_bytes(b, ctx.g, a, y, "alu")
        ctx.write(1, ctx.rd, z, "rd")
    elif op == "sub":
        # a = z + y with carries
        z = b.cols4("alu__sum")
        carry = [b.col(f"alu__c{i}") for i in range(4)]
        for c in carry:
            _bool(b, c)
        prev = None
        for i in range(4):
            rhs = ir.Add(z[i], y[i]) if prev is None else ir.Add(ir.Add(z[i], y[i]), prev)
            b.require(
                ir.Mul(ctx.g, ir.Sub(ir.Add(a[i], ir.Mul(ir.Const(256), carry[i])), rhs))
            )
            prev = carry[i]
        _byte_range_pair(b, ctx.g, z[0], z[1])
        _byte_range_pair(b, ctx.g, z[2], z[3])
        ctx.write(1, ctx.rd, z, "rd")
    elif kind in ("and", "or", "xor"):
        x = b.cols4("alu__xor")
        for i in range(4):
            _xor_lookup(b, ctx.g, a[i], y[i], x[i])
        if kind == "xor":
            z = x
        else:
            z = b.cols4("alu__out")
            for i in range(4):
                if kind == "and":  # 2*and = a + y - xor
                    b.require(
                        ir.Mul(
                            ctx.g,
                            ir.Sub(
                                ir.Mul(ir.Const(2), z[i]),
                                ir.Sub(ir.Add(a[i], y[i]), x[i]),
                            ),
                        )
                    )
                else:  # 2*or = a + y + xor
                    b.require(
                        ir.Mul(
                            ctx.g,
                            ir.Sub(
                                ir.Mul(ir.Const(2), z[i]),
                                ir.Add(ir.Add(a[i], y[i]), x[i]),
                            ),
                        )
                    )
        ctx.write(1, ctx.rd, z, "rd")
    else:
        raise ValueError(op)
    ctx.finish()
    return b


def _alu_wg(op: str, use_imm: bool):
    def wg(rec):
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a = rec["rs1_val"]
        _wg_access(cols, "rs1", _bytes(a), rec["prev_ts"][0], t0)
        if use_imm:
            y = rec["imm"]
            for i, v in enumerate(_bytes(y)):
                cols[f"imm_b__{i}"] = v
            nxt = 1
        else:
            y = rec["rs2_val"]
            _wg_access(cols, "rs2", _bytes(y), rec["prev_ts"][1], t0 + 1)
            nxt = 2
        kind = op.rstrip("i") if op != "sub" else op
        if op in ("add", "addi"):
            z = _wg_add_bytes(cols, a, y, "alu")
        elif op == "sub":
            z = (a - y) & 0xFFFFFFFF
            zb, yb = _bytes(z), _bytes(y)
            carry = 0
            for i in range(4):
                t = zb[i] + yb[i] + carry
                carry = t >> 8
                cols[f"alu__c{i}"] = carry
                cols[f"alu__sum__{i}"] = zb[i]
        elif kind in ("and", "or", "xor"):
            xb = _bytes(a ^ y)
            for i in range(4):
                cols[f"alu__xor__{i}"] = xb[i]
            if kind == "and":
                z = a & y
            elif kind == "or":
                z = a | y
            else:
                z = a ^ y
            if kind != "xor":
                for i, v in enumerate(_bytes(z)):
                    cols[f"alu__out__{i}"] = v
        _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][nxt], t0 + nxt)
        return cols

    return wg


# -- constant shifts (shamt in imm) ------------------------------------------


def _shift_build(op: str):
    """slli/srli with constant shamt: multiplication by 2^shamt with an
    8-byte product decomposition; low (sll) or high (srl) half selected.

    product = rs1 * 2^shamt, prod bytes p0..p7 (checked), carries at each
    byte position.  Relation: sum_i a_i 2^(8i) * 2^s = sum_k p_k 2^(8k).
    Constraint per byte k: sum_{i} a_i * c_{k,i} + carry_{k-1} =
    p_k + 256*carry_k where c_{k,i} is the (constant) contribution of
    a_i to byte k of a_i*2^s."""
    b, ctx = _base(op)
    a = ctx.read(1, ctx.rs1, "rs1")
    p = [b.col(f"sh__p{k}") for k in range(8)]
    carry = [b.col(f"sh__c{k}") for k in range(8)]
    # shamt is static per-instruction via imm; constraints reference imm
    # symbolically through per-shamt constant tables is impossible in one
    # machine, so the shift machine is parameterized: imm must be a
    # constant when the APC is built; in the VM chip we use the Pow2 bus.
    p2 = [b.col(f"sh__p2_{i}") for i in range(4)]
    s_eff = ctx.imm_lo if op == "slli" else ir.Sub(ir.Const(32), ctx.imm_lo)
    b.send(POW2_BUS, ctx.g, [s_eff, *p2])
    for k in range(8):
        contrib = None
        for i in range(4):
            for j in range(4):
                if i + j == k:
                    t = ir.Mul(a[i], p2[j])
                    contrib = t if contrib is None else ir.Add(contrib, t)
        if contrib is None:
            contrib = ir.Const(0)
        if k > 0:
            contrib = ir.Add(contrib, carry[k - 1])
        b.require(
            ir.Mul(ctx.g, ir.Sub(ir.Add(p[k], ir.Mul(ir.Const(256), carry[k])), contrib))
        )
        b.send(RANGE_BUS, ctx.g, [carry[k], ir.Const(CARRY_BITS)])
    for k in range(0, 8, 2):
        _byte_range_pair(b, ctx.g, p[k], p[k + 1])
    z = p[:4] if op == "slli" else p[4:]
    ctx.write(1, ctx.rd, z, "rd")
    ctx.finish()
    return b


def _shift_wg(op: str):
    def wg(rec):
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a = rec["rs1_val"]
        s = rec["imm"] & 31
        _wg_access(cols, "rs1", _bytes(a), rec["prev_ts"][0], t0)
        if op == "srli":
            # product written for shift 32-s puts the result in the high half
            s_eff = 32 - s if s else 0
        else:
            s_eff = s
        p2 = 1 << s_eff
        p2b = [(p2 >> (8 * i)) & 0xFF for i in range(4)]
        for i in range(4):
            cols[f"sh__p2_{i}"] = p2b[i]
        ab = _bytes(a)
        prod = a * p2
        pb = [(prod >> (8 * k)) & 0xFF for k in range(8)]
        carry = 0
        for k in range(8):
            t = sum(ab[i] * p2b[j] for i in range(4) for j in range(4) if i + j == k) + carry
            carry = (t - pb[k]) >> 8
            cols[f"sh__p{k}"] = pb[k]
            cols[f"sh__c{k}"] = carry
        _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][1], t0 + 1)
        return cols

    return wg


# -- mul ----------------------------------------------------------------------


def _mul_build():
    b, ctx = _base("mul")
    a = ctx.read(1, ctx.rs1, "rs1")
    y = ctx.read(1, ctx.rs2, "rs2")
    p = [b.col(f"mul__p{k}") for k in range(8)]
    carry = [b.col(f"mul__c{k}") for k in range(8)]
    for k in range(8):
        contrib = None
        for i in range(4):
            for j in range(4):
                if i + j == k:
                    t = ir.Mul(a[i], y[j])
                    contrib = t if contrib is None else ir.Add(contrib, t)
        if contrib is None:
            contrib = ir.Const(0)
        if k > 0:
            contrib = ir.Add(contrib, carry[k - 1])
        b.require(
            ir.Mul(ctx.g, ir.Sub(ir.Add(p[k], ir.Mul(ir.Const(256), carry[k])), contrib))
        )
        b.send(RANGE_BUS, ctx.g, [carry[k], ir.Const(CARRY_BITS)])
    for k in range(0, 8, 2):
        _byte_range_pair(b, ctx.g, p[k], p[k + 1])
    ctx.write(1, ctx.rd, p[:4], "rd")
    ctx.finish()
    return b


def _mul_wg(rec):
    cols = _wg_base(rec)
    t0 = rec["ts"]
    a, y = rec["rs1_val"], rec["rs2_val"]
    _wg_access(cols, "rs1", _bytes(a), rec["prev_ts"][0], t0)
    _wg_access(cols, "rs2", _bytes(y), rec["prev_ts"][1], t0 + 1)
    ab, yb = _bytes(a), _bytes(y)
    prod = a * y
    pb = [(prod >> (8 * k)) & 0xFF for k in range(8)]
    carry = 0
    for k in range(8):
        t = sum(ab[i] * yb[j] for i in range(4) for j in range(4) if i + j == k) + carry
        carry = (t - pb[k]) >> 8
        cols[f"mul__p{k}"] = pb[k]
        cols[f"mul__c{k}"] = carry
    _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][2], t0 + 2)
    return cols


# -- lui ----------------------------------------------------------------------


def _lui_build():
    b, ctx = _base("lui")
    ib = _imm_cols(b, ctx)
    ctx.write(1, ctx.rd, ib, "rd")
    ctx.finish()
    return b


def _lui_wg(rec):
    cols = _wg_base(rec)
    for i, v in enumerate(_bytes(rec["imm"])):
        cols[f"imm_b__{i}"] = v
    _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][0], rec["ts"])
    return cols


# -- memory -------------------------------------------------------------------


def _lw_build():
    b, ctx = _base("lw")
    base = ctx.read(1, ctx.rs1, "rs1")
    addr = _add_bytes(b, ctx.g, base, _imm_cols(b, ctx), "addr")
    # address < 2^30 (top byte < 64)
    b.send(RANGE_BUS, ctx.g, [addr[3], ir.Const(6)])
    data = ctx.read(2, _word(addr), "mem")
    ctx.write(1, ctx.rd, data, "rd")
    ctx.finish()
    return b


def _lw_wg(rec):
    cols = _wg_base(rec)
    t0 = rec["ts"]
    _wg_access(cols, "rs1", _bytes(rec["rs1_val"]), rec["prev_ts"][0], t0)
    for i, v in enumerate(_bytes(rec["imm"])):
        cols[f"imm_b__{i}"] = v
    _wg_add_bytes(cols, rec["rs1_val"], rec["imm"], "addr")
    _wg_access(cols, "mem", _bytes(rec["mem_val"]), rec["prev_ts"][1], t0 + 1)
    _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][2], t0 + 2)
    return cols


def _sw_build():
    b, ctx = _base("sw")
    base = ctx.read(1, ctx.rs1, "rs1")
    val = ctx.read(1, ctx.rs2, "rs2")
    addr = _add_bytes(b, ctx.g, base, _imm_cols(b, ctx), "addr")
    b.send(RANGE_BUS, ctx.g, [addr[3], ir.Const(6)])
    ctx.write(2, _word(addr), val, "mem")
    ctx.finish()
    return b


def _sw_wg(rec):
    cols = _wg_base(rec)
    t0 = rec["ts"]
    _wg_access(cols, "rs1", _bytes(rec["rs1_val"]), rec["prev_ts"][0], t0)
    _wg_access(cols, "rs2", _bytes(rec["rs2_val"]), rec["prev_ts"][1], t0 + 1)
    for i, v in enumerate(_bytes(rec["imm"])):
        cols[f"imm_b__{i}"] = v
    _wg_add_bytes(cols, rec["rs1_val"], rec["imm"], "addr")
    _wg_write(cols, "mem", _bytes(rec["mem_prev"]), rec["prev_ts"][2], t0 + 2)
    return cols


# -- branches -----------------------------------------------------------------


def _eq_flag(b: MachineBuilder, ctx: Ctx, a, y):
    """eq bool + inv witness: nz = sum (a_i - y_i)^2; eq*nz=0;
    (1-eq)*(w*nz - 1) = 0."""
    eq = b.col("br__eq")
    w = b.col("br__inv")
    _bool(b, eq)
    nz = None
    for i in range(4):
        d = ir.Sub(a[i], y[i])
        t = ir.Mul(d, d)
        nz = t if nz is None else ir.Add(nz, t)
    b.require(ir.Mul(ctx.g, ir.Mul(eq, nz)))
    b.require(
        ir.Mul(ctx.g, ir.Mul(ir.Sub(ir.Const(1), eq), ir.Sub(ir.Mul(w, nz), ir.Const(1))))
    )
    return eq


def _ltu_flag(b: MachineBuilder, ctx: Ctx, a, y, prefix="br"):
    """borrow-chain unsigned comparison: lt = final borrow."""
    borrow = [b.col(f"{prefix}__b{i}") for i in range(4)]
    diff = [b.col(f"{prefix}__d{i}") for i in range(4)]
    for c in borrow:
        _bool(b, c)
    prev = None
    for i in range(4):
        lhs = ir.Add(diff[i], ir.Const(0))
        rhs = ir.Sub(a[i], y[i]) if prev is None else ir.Sub(ir.Sub(a[i], y[i]), prev)
        rhs = ir.Add(rhs, ir.Mul(ir.Const(256), borrow[i]))
        b.require(ir.Mul(ctx.g, ir.Sub(lhs, rhs)))
        prev = borrow[i]
    _byte_range_pair(b, ctx.g, diff[0], diff[1])
    _byte_range_pair(b, ctx.g, diff[2], diff[3])
    return borrow[3]


def _branch_build(op: str):
    b, ctx = _base(op)
    a = ctx.read(1, ctx.rs1, "rs1")
    y = ctx.read(1, ctx.rs2, "rs2")
    if op in ("beq", "bne"):
        flag = _eq_flag(b, ctx, a, y)
        taken = flag if op == "beq" else ir.Sub(ir.Const(1), flag)
    else:  # bltu
        lt = _ltu_flag(b, ctx, a, y)
        taken = lt
    fall = ir.Add(ctx.pc, ir.Const(4))
    to_pc = ir.Add(fall, ir.Mul(taken, ir.Sub(ctx.imm_field(), fall)))
    ctx.finish(to_pc)
    return b


def _branch_wg(op: str):
    def wg(rec):
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a, y = rec["rs1_val"], rec["rs2_val"]
        _wg_access(cols, "rs1", _bytes(a), rec["prev_ts"][0], t0)
        _wg_access(cols, "rs2", _bytes(y), rec["prev_ts"][1], t0 + 1)
        if op in ("beq", "bne"):
            nz = sum((ai - yi) ** 2 for ai, yi in zip(_bytes(a), _bytes(y))) % P
            cols["br__eq"] = 1 if a == y else 0
            cols["br__inv"] = pow(nz, P - 2, P) if nz else 0
        else:
            borrow = 0
            for i in range(4):
                d = _bytes(a)[i] - _bytes(y)[i] - borrow
                borrow = 1 if d < 0 else 0
                cols[f"br__b{i}"] = borrow
                cols[f"br__d{i}"] = d + 256 * borrow
        return cols

    return wg


# -- jumps --------------------------------------------------------------------


def _sltu_build():
    b, ctx = _base("sltu")
    a = ctx.read(1, ctx.rs1, "rs1")
    y = ctx.read(1, ctx.rs2, "rs2")
    lt = _ltu_flag(b, ctx, a, y, prefix="cmp")
    ctx.write(1, ctx.rd, [lt, ir.Const(0), ir.Const(0), ir.Const(0)], "rd")
    ctx.finish()
    return b


def _sltu_wg(rec):
    cols = _wg_base(rec)
    t0 = rec["ts"]
    a, y = rec["rs1_val"], rec["rs2_val"]
    _wg_access(cols, "rs1", _bytes(a), rec["prev_ts"][0], t0)
    _wg_access(cols, "rs2", _bytes(y), rec["prev_ts"][1], t0 + 1)
    borrow = 0
    for i in range(4):
        d = _bytes(a)[i] - _bytes(y)[i] - borrow
        borrow = 1 if d < 0 else 0
        cols[f"cmp__b{i}"] = borrow
        cols[f"cmp__d{i}"] = d + 256 * borrow
    _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][2], t0 + 2)
    return cols


def _jal_build():
    b, ctx = _base("jal")
    link = b.cols4("link")
    b.require(ir.Mul(ctx.g, ir.Sub(_word(link), ir.Add(ctx.pc, ir.Const(4)))))
    _byte_range_pair(b, ctx.g, link[0], link[1])
    _byte_range_pair(b, ctx.g, link[2], link[3])
    ctx.write(1, ctx.rd, link, "rd")
    ctx.finish(ctx.imm_field())
    return b


def _jal_wg(rec):
    cols = _wg_base(rec)
    for i, v in enumerate(_bytes(rec["pc"] + 4)):
        cols[f"link__{i}"] = v
    _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][0], rec["ts"])
    return cols


def _jalr_build():
    b, ctx = _base("jalr")
    base = ctx.read(1, ctx.rs1, "rs1")
    link = b.cols4("link")
    b.require(ir.Mul(ctx.g, ir.Sub(_word(link), ir.Add(ctx.pc, ir.Const(4)))))
    _byte_range_pair(b, ctx.g, link[0], link[1])
    _byte_range_pair(b, ctx.g, link[2], link[3])
    target = _add_bytes(b, ctx.g, base, _imm_cols(b, ctx), "tgt")
    ctx.write(1, ctx.rd, link, "rd")
    ctx.finish(_word(target))
    return b


def _jalr_wg(rec):
    cols = _wg_base(rec)
    t0 = rec["ts"]
    _wg_access(cols, "rs1", _bytes(rec["rs1_val"]), rec["prev_ts"][0], t0)
    for i, v in enumerate(_bytes(rec["pc"] + 4)):
        cols[f"link__{i}"] = v
    for i, v in enumerate(_bytes(rec["imm"])):
        cols[f"imm_b__{i}"] = v
    _wg_add_bytes(cols, rec["rs1_val"], rec["imm"], "tgt")
    _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][1], t0 + 1)
    return cols


def _halt_build():
    b = MachineBuilder(name="halt")
    ctx = Ctx(b)
    ctx.set_opcode("halt")
    # terminal: receive only; no send (exec bus balanced by the init send)
    return b


def _halt_wg(rec):
    return _wg_base(rec)


# -- registry -----------------------------------------------------------------


def _build_all():
    out = {}
    for op in ("add", "sub", "and", "or", "xor"):
        out[op] = (_alu_build(op, False), _alu_wg(op, False))
    for op in ("addi", "andi", "ori", "xori"):
        out[op] = (_alu_build(op, True), _alu_wg(op, True))
    for op in ("slli", "srli"):
        out[op] = (_shift_build(op), _shift_wg(op))
    out["mul"] = (_mul_build(), _mul_wg)
    out["sltu"] = (_sltu_build(), _sltu_wg)
    out["lui"] = (_lui_build(), _lui_wg)
    out["lw"] = (_lw_build(), _lw_wg)
    out["sw"] = (_sw_build(), _sw_wg)
    for op in ("beq", "bne", "bltu"):
        out[op] = (_branch_build(op), _branch_wg(op))
    out["jal"] = (_jal_build(), _jal_wg)
    out["jalr"] = (_jalr_build(), _jalr_wg)
    out["halt"] = (_halt_build(), _halt_wg)
    return out


_REGISTRY = None


def registry() -> Dict[str, Tuple[MachineBuilder, Callable]]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _build_all()
    return _REGISTRY


def rebuild_registry() -> None:
    """Clear the cache (after flipping isa build flags in tests)."""
    global _REGISTRY
    _REGISTRY = None
