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


# -- sign handling helpers ----------------------------------------------------


def _sign_split(b: MachineBuilder, ctx: Ctx, byte_expr: ir.Expr, prefix: str):
    """Decompose a byte as 128*sign + low7 (sign bool, low7 7-bit checked).
    Returns (sign, low7).  Counterpart of OpenVM's MSB decomposition in its
    signed ALU chips (less-than / shift right arithmetic)."""
    sign = b.col(f"{prefix}__sign")
    low = b.col(f"{prefix}__low7")
    _bool(b, sign)
    b.require(
        ir.Mul(ctx.g, ir.Sub(ir.Add(ir.Mul(ir.Const(128), sign), low), byte_expr))
    )
    b.send(RANGE_BUS, ctx.g, [low, ir.Const(7)])
    return sign, low


def _flip_msb(byte_expr: ir.Expr, sign: ir.Var) -> ir.Expr:
    """byte XOR 0x80 given its sign decomposition: byte + 128 - 256*sign."""
    return ir.Sub(ir.Add(byte_expr, ir.Const(128)), ir.Mul(ir.Const(256), sign))


def _zero_flag(b: MachineBuilder, ctx: Ctx, value: ir.Expr, prefix: str) -> ir.Var:
    """bool z = (value == 0) with inverse witness, for value with a
    wrap-free range (e.g. a sum of checked bytes)."""
    z = b.col(f"{prefix}__z")
    inv = b.col(f"{prefix}__zinv")
    _bool(b, z)
    b.require(ir.Mul(ctx.g, ir.Mul(z, value)))
    b.require(
        ir.Mul(
            ctx.g,
            ir.Mul(ir.Sub(ir.Const(1), z), ir.Sub(ir.Mul(inv, value), ir.Const(1))),
        )
    )
    return z


def _byte_sum(xs) -> ir.Expr:
    out: ir.Expr = xs[0]
    for x in xs[1:]:
        out = ir.Add(out, x)
    return out


def _cond_neg(b: MachineBuilder, ctx: Ctx, src, sign: ir.Expr, prefix: str):
    """out = sign ? (2^32 - src) mod 2^32 : src, byte-wise.

    Negation constraint: src + out = 2^32 * (1 - z) where z = (src == 0),
    via a byte carry chain; when sign = 0, out = src directly."""
    g = ctx.g
    out = b.cols4(f"{prefix}__neg")
    z = _zero_flag(b, ctx, _byte_sum(src), prefix)
    c = [b.col(f"{prefix}__nc{i}") for i in range(4)]
    for ci in c:
        _bool(b, ci)
    prev = None
    for i in range(4):
        lhs = ir.Add(src[i], out[i]) if prev is None else ir.Add(ir.Add(src[i], out[i]), prev)
        b.require(ir.Mul(g, ir.Mul(sign, ir.Sub(lhs, ir.Mul(ir.Const(256), c[i])))))
        prev = c[i]
    b.require(ir.Mul(g, ir.Mul(sign, ir.Sub(c[3], ir.Sub(ir.Const(1), z)))))
    one_m = ir.Sub(ir.Const(1), sign)
    for i in range(4):
        b.require(ir.Mul(g, ir.Mul(one_m, ir.Sub(out[i], src[i]))))
    _byte_range_pair(b, g, out[0], out[1])
    _byte_range_pair(b, g, out[2], out[3])
    return out


def _wg_cond_neg(cols: Dict[str, int], src: int, sign: int, prefix: str) -> int:
    out = (-src) & 0xFFFFFFFF if sign else src
    cols[f"{prefix}__z"] = 1 if src == 0 else 0
    ssum = sum(_bytes(src))
    cols[f"{prefix}__zinv"] = pow(ssum, P - 2, P) if ssum else 0
    ob = _bytes(out)
    sb = _bytes(src)
    carry = 0
    for i in range(4):
        if sign:
            t = sb[i] + ob[i] + carry
            carry = t >> 8
        else:
            carry = 0
        cols[f"{prefix}__nc{i}"] = carry
        cols[f"{prefix}__neg__{i}"] = ob[i]
    return out


# -- unified shifts (sll/srl/sra + immediate forms) ---------------------------


def _prod_decomp(b: MachineBuilder, ctx: Ctx, xs, ys, prefix: str):
    """8-byte decomposition of the 4x4 byte product xs * ys with
    CARRY_BITS-checked carries; returns the 8 product byte cols."""
    p = [b.col(f"{prefix}__p{k}") for k in range(8)]
    carry = [b.col(f"{prefix}__c{k}") for k in range(8)]
    for k in range(8):
        contrib = None
        for i in range(4):
            for j in range(4):
                if i + j == k:
                    t = ir.Mul(xs[i], ys[j])
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
    return p


def _wg_prod_decomp(cols: Dict[str, int], x: int, y: int, prefix: str):
    xb, yb = _bytes(x), _bytes(y)
    prod = x * y
    pb = [(prod >> (8 * k)) & 0xFF for k in range(8)]
    carry = 0
    for k in range(8):
        t = sum(xb[i] * yb[j] for i in range(4) for j in range(4) if i + j == k) + carry
        carry = (t - pb[k]) >> 8
        cols[f"{prefix}__p{k}"] = pb[k]
        cols[f"{prefix}__c{k}"] = carry
    return pb


def _shift_kind(op: str) -> str:
    return {"sll": "sll", "slli": "sll", "srl": "srl", "srli": "srl",
            "sra": "sra", "srai": "sra"}[op]


def _shift_build2(op: str):
    """Unified shift machine (sll/srl/sra and immediate forms): shamt from
    rs2's low byte (s + 32*q decomposition) or from imm_lo; 2^s_eff via the
    Pow2 bus; result from an 8-byte product decomposition.  srl/sra select
    the high half of a * 2^(32-s) with an explicit s==0 flag; sra adds the
    sign mask m = 2^32 - 2^(32-s) (byte carry chain against the same Pow2
    value).  Counterpart of OpenVM's ShiftChip (reference rv32im surface,
    openvm-riscv/src/isa/opcode.rs:9-60)."""
    imm_form = op.endswith("i")
    kind = _shift_kind(op)
    b, ctx = _base(op)
    g = ctx.g
    a = ctx.read(1, ctx.rs1, "rs1")
    if imm_form:
        s: ir.Expr = ctx.imm_lo
        b.send(RANGE_BUS, g, [s, ir.Const(5)])
    else:
        y = ctx.read(1, ctx.rs2, "rs2")
        s = b.col("sh__s")
        q = b.col("sh__q")
        b.require(ir.Mul(g, ir.Sub(ir.Add(s, ir.Mul(ir.Const(32), q)), y[0])))
        b.send(RANGE_BUS, g, [s, ir.Const(5)])
        b.send(RANGE_BUS, g, [q, ir.Const(3)])
    p2 = b.cols4("sh__p2")
    if kind == "sll":
        b.send(POW2_BUS, g, [s, *p2])
        p = _prod_decomp(b, ctx, a, p2, "sh")
        ctx.write(1, ctx.rd, p[:4], "rd")
    else:
        z0 = _zero_flag(b, ctx, s, "sh_s0")
        s_eff = b.col("sh__seff")
        b.require(
            ir.Mul(
                g,
                ir.Sub(
                    s_eff,
                    ir.Mul(ir.Sub(ir.Const(1), z0), ir.Sub(ir.Const(32), s)),
                ),
            )
        )
        b.send(POW2_BUS, g, [s_eff, *p2])
        p = _prod_decomp(b, ctx, a, p2, "sh")
        out = b.cols4("sh__out")
        if kind == "srl":
            for i in range(4):
                sel = ir.Add(
                    ir.Mul(z0, a[i]), ir.Mul(ir.Sub(ir.Const(1), z0), p[4 + i])
                )
                b.require(ir.Mul(g, ir.Sub(out[i], sel)))
        else:  # sra
            sa, _ = _sign_split(b, ctx, a[3], "sh_sign")
            m = b.cols4("sh__m")
            c = [b.col(f"sh__mc{i}") for i in range(4)]
            for ci in c:
                _bool(b, ci)
            prev = None
            for i in range(4):
                lhs = ir.Add(m[i], p2[i]) if prev is None else ir.Add(ir.Add(m[i], p2[i]), prev)
                b.require(ir.Mul(g, ir.Sub(lhs, ir.Mul(ir.Const(256), c[i]))))
                prev = c[i]
            b.require(ir.Mul(g, ir.Sub(c[3], ir.Const(1))))
            _byte_range_pair(b, g, m[0], m[1])
            _byte_range_pair(b, g, m[2], m[3])
            for i in range(4):
                hi = ir.Add(p[4 + i], ir.Mul(sa, m[i]))
                sel = ir.Add(ir.Mul(z0, a[i]), ir.Mul(ir.Sub(ir.Const(1), z0), hi))
                b.require(ir.Mul(g, ir.Sub(out[i], sel)))
        ctx.write(1, ctx.rd, out, "rd")
    ctx.finish()
    return b


def _shift_wg2(op: str):
    imm_form = op.endswith("i")
    kind = _shift_kind(op)

    def wg(rec):
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a = rec["rs1_val"]
        _wg_access(cols, "rs1", _bytes(a), rec["prev_ts"][0], t0)
        if imm_form:
            s = rec["imm"] & 31
            nxt = 1
        else:
            yv = rec["rs2_val"]
            _wg_access(cols, "rs2", _bytes(yv), rec["prev_ts"][1], t0 + 1)
            s = yv & 31
            cols["sh__s"] = s
            cols["sh__q"] = (yv & 0xFF) >> 5
            nxt = 2
        if kind == "sll":
            s_eff = s
        else:
            cols["sh_s0__z"] = 1 if s == 0 else 0
            cols["sh_s0__zinv"] = pow(s, P - 2, P) if s else 0
            s_eff = 0 if s == 0 else 32 - s
            cols["sh__seff"] = s_eff
        p2 = 1 << s_eff
        for i, v in enumerate(_bytes(p2)):
            cols[f"sh__p2__{i}"] = v
        _wg_prod_decomp(cols, a, p2 & 0xFFFFFFFF, "sh")
        if kind == "srl":
            z = a >> s
            for i, v in enumerate(_bytes(z)):
                cols[f"sh__out__{i}"] = v
        elif kind == "sra":
            sa = (a >> 31) & 1
            cols["sh_sign__sign"] = sa
            cols["sh_sign__low7"] = (a >> 24) & 0x7F
            m = (0x100000000 - p2) & 0xFFFFFFFF
            mb = _bytes(m)
            p2b = _bytes(p2)
            carry = 0
            for i in range(4):
                t = mb[i] + p2b[i] + carry
                carry = t >> 8
                cols[f"sh__m__{i}"] = mb[i]
                cols[f"sh__mc{i}"] = carry
            signed = a - (1 << 32) if sa else a
            z = (signed >> s) & 0xFFFFFFFF
            for i, v in enumerate(_bytes(z)):
                cols[f"sh__out__{i}"] = v
        _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][nxt], t0 + nxt)
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


# -- mul high half (mulhu / mulh / mulhsu) ------------------------------------


def _mulh_build(op: str):
    """High 32 bits of the 64-bit product.  Signed corrections use the
    identity (a - 2^32 sa)(y - 2^32 sy) = ay - 2^32(sa y + sy a) + 2^64 sa sy,
    so the signed high word is p_hi - sa*y - sy*a (mod 2^32), realized as a
    byte borrow chain (borrows < 4, 2-bit checked)."""
    b, ctx = _base(op)
    g = ctx.g
    a = ctx.read(1, ctx.rs1, "rs1")
    y = ctx.read(1, ctx.rs2, "rs2")
    p = _prod_decomp(b, ctx, a, y, "mul")
    if op == "mulhu":
        ctx.write(1, ctx.rd, p[4:], "rd")
        ctx.finish()
        return b
    sa, _ = _sign_split(b, ctx, a[3], "mh_sa")
    terms = [(sa, y)]
    if op == "mulh":
        sy, _ = _sign_split(b, ctx, y[3], "mh_sy")
        terms.append((sy, a))
    h = b.cols4("mh__h")
    bor = [b.col(f"mh__b{i}") for i in range(4)]
    prev = None
    for i in range(4):
        rhs = h[i]
        for s_, v_ in terms:
            rhs = ir.Add(rhs, ir.Mul(s_, v_[i]))
        if prev is not None:
            rhs = ir.Add(rhs, prev)
        b.require(
            ir.Mul(g, ir.Sub(ir.Add(p[4 + i], ir.Mul(ir.Const(256), bor[i])), rhs))
        )
        b.send(RANGE_BUS, g, [bor[i], ir.Const(2)])
        prev = bor[i]
    _byte_range_pair(b, g, h[0], h[1])
    _byte_range_pair(b, g, h[2], h[3])
    ctx.write(1, ctx.rd, h, "rd")
    ctx.finish()
    return b


def _mulh_wg(op: str):
    def wg(rec):
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a, y = rec["rs1_val"], rec["rs2_val"]
        _wg_access(cols, "rs1", _bytes(a), rec["prev_ts"][0], t0)
        _wg_access(cols, "rs2", _bytes(y), rec["prev_ts"][1], t0 + 1)
        _wg_prod_decomp(cols, a, y, "mul")
        if op != "mulhu":
            sa = (a >> 31) & 1
            cols["mh_sa__sign"] = sa
            cols["mh_sa__low7"] = (a >> 24) & 0x7F
            terms = [(sa, y)]
            if op == "mulh":
                sy = (y >> 31) & 1
                cols["mh_sy__sign"] = sy
                cols["mh_sy__low7"] = (y >> 24) & 0x7F
                terms.append((sy, a))
            p_hi = (a * y) >> 32
            sub = sum(s_ * v_ for s_, v_ in terms)
            hval = (p_hi - sub) & 0xFFFFFFFF
            hb = _bytes(hval)
            phb = _bytes(p_hi & 0xFFFFFFFF)
            borrow = 0
            for i in range(4):
                rhs = hb[i] + sum(s_ * _bytes(v_)[i] for s_, v_ in terms) + borrow
                borrow = (rhs - phb[i]) >> 8
                cols[f"mh__h__{i}"] = hb[i]
                cols[f"mh__b{i}"] = borrow
        _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][2], t0 + 2)
        return cols

    return wg


# -- division (divu / remu / div / rem) ---------------------------------------


def _divmod_core(b: MachineBuilder, ctx: Ctx, a, y, prefix: str):
    """Constrain q, r with a = q*y + r over the integers, r < y when
    y != 0, and the RISC-V y == 0 convention q = 2^32-1, r = a.  All of
    a, y given as byte cols/exprs; returns (q, r, zy) byte cols + flag."""
    g = ctx.g
    q = b.cols4(f"{prefix}__q")
    r = b.cols4(f"{prefix}__r")
    _byte_range_pair(b, g, q[0], q[1])
    _byte_range_pair(b, g, q[2], q[3])
    _byte_range_pair(b, g, r[0], r[1])
    _byte_range_pair(b, g, r[2], r[3])
    p = _prod_decomp(b, ctx, q, y, prefix)
    # a = p[0:4] + r byte-wise; wrap impossible: p[4:] + final carry = 0
    cc = [b.col(f"{prefix}__cc{i}") for i in range(4)]
    for c in cc:
        _bool(b, c)
    prev = None
    for i in range(4):
        rhs = ir.Add(p[i], r[i]) if prev is None else ir.Add(ir.Add(p[i], r[i]), prev)
        b.require(
            ir.Mul(g, ir.Sub(ir.Add(a[i], ir.Mul(ir.Const(256), cc[i])), rhs))
        )
        prev = cc[i]
    b.require(
        ir.Mul(g, ir.Add(ir.Add(ir.Add(p[4], p[5]), ir.Add(p[6], p[7])), cc[3]))
    )
    zy = _zero_flag(b, ctx, _byte_sum(y), f"{prefix}_y")
    one_m = ir.Sub(ir.Const(1), zy)
    # y == 0: q = 2^32-1, r = a
    for i in range(4):
        b.require(ir.Mul(g, ir.Mul(zy, ir.Sub(q[i], ir.Const(255)))))
        b.require(ir.Mul(g, ir.Mul(zy, ir.Sub(r[i], a[i]))))
    # y != 0: r < y
    lt = _ltu_flag(b, ctx, r, y, prefix=f"{prefix}_lt")
    b.require(ir.Mul(g, ir.Mul(one_m, ir.Sub(lt, ir.Const(1)))))
    return q, r, zy


def _wg_divmod_core(cols: Dict[str, int], a: int, y: int, prefix: str):
    if y == 0:
        qv, rv = 0xFFFFFFFF, a
    else:
        qv, rv = a // y, a % y
    for i, v in enumerate(_bytes(qv)):
        cols[f"{prefix}__q__{i}"] = v
    for i, v in enumerate(_bytes(rv)):
        cols[f"{prefix}__r__{i}"] = v
    _wg_prod_decomp(cols, qv, y, prefix)
    pb = _bytes((qv * y) & 0xFFFFFFFF)
    rb, ab = _bytes(rv), _bytes(a)
    carry = 0
    for i in range(4):
        t = pb[i] + rb[i] + carry
        carry = (t - ab[i]) >> 8
        cols[f"{prefix}__cc{i}"] = carry
    ysum = sum(_bytes(y))
    cols[f"{prefix}_y__z"] = 1 if y == 0 else 0
    cols[f"{prefix}_y__zinv"] = pow(ysum, P - 2, P) if ysum else 0
    borrow = 0
    yb = _bytes(y)
    for i in range(4):
        d = rb[i] - yb[i] - borrow
        borrow = 1 if d < 0 else 0
        cols[f"{prefix}_lt__b{i}"] = borrow
        cols[f"{prefix}_lt__d{i}"] = d + 256 * borrow
    return qv, rv


def _divu_build(op: str):
    """divu/remu: a = q*y + r with r < y (y != 0) or the q = -1, r = a
    convention (reference rv32im div chips)."""
    b, ctx = _base(op)
    a = ctx.read(1, ctx.rs1, "rs1")
    y = ctx.read(1, ctx.rs2, "rs2")
    q, r, _ = _divmod_core(b, ctx, a, y, "dv")
    ctx.write(1, ctx.rd, q if op == "divu" else r, "rd")
    ctx.finish()
    return b


def _divu_wg(op: str):
    def wg(rec):
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a, y = rec["rs1_val"], rec["rs2_val"]
        _wg_access(cols, "rs1", _bytes(a), rec["prev_ts"][0], t0)
        _wg_access(cols, "rs2", _bytes(y), rec["prev_ts"][1], t0 + 1)
        _wg_divmod_core(cols, a, y, "dv")
        _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][2], t0 + 2)
        return cols

    return wg


def _div_build(op: str):
    """Signed div/rem via magnitudes: |a| = qm*|y| + rm, rm < |y|; result
    signs from sa xor sy (quotient) / sa (remainder); two's-complement
    conditional negations; y == 0 gives q = -1, r = a; the overflow case
    -2^31 / -1 falls out of the magnitude path naturally."""
    b, ctx = _base(op)
    g = ctx.g
    a = ctx.read(1, ctx.rs1, "rs1")
    y = ctx.read(1, ctx.rs2, "rs2")
    sa, _ = _sign_split(b, ctx, a[3], "dv_sa")
    sy, _ = _sign_split(b, ctx, y[3], "dv_sy")
    abs_a = _cond_neg(b, ctx, a, sa, "dv_absa")
    abs_y = _cond_neg(b, ctx, y, sy, "dv_absy")
    qm, rm, zy = _divmod_core(b, ctx, abs_a, abs_y, "dv")
    sq = ir.Sub(ir.Add(sa, sy), ir.Mul(ir.Const(2), ir.Mul(sa, sy)))  # sa xor sy
    sq_col = b.col("dv__sq")
    b.require(ir.Mul(g, ir.Sub(sq_col, sq)))
    qs = _cond_neg(b, ctx, qm, sq_col, "dv_qs")
    rs = _cond_neg(b, ctx, rm, sa, "dv_rs")
    # y == 0 override: q = -1 (all 255), r = a
    out = b.cols4("dv__out")
    src = (qs, 255) if op == "div" else (rs, None)
    one_m = ir.Sub(ir.Const(1), zy)
    for i in range(4):
        if op == "div":
            b.require(ir.Mul(g, ir.Mul(zy, ir.Sub(out[i], ir.Const(255)))))
        else:
            b.require(ir.Mul(g, ir.Mul(zy, ir.Sub(out[i], a[i]))))
        b.require(ir.Mul(g, ir.Mul(one_m, ir.Sub(out[i], src[0][i]))))
    ctx.write(1, ctx.rd, out, "rd")
    ctx.finish()
    return b


def _div_wg(op: str):
    def wg(rec):
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a, y = rec["rs1_val"], rec["rs2_val"]
        _wg_access(cols, "rs1", _bytes(a), rec["prev_ts"][0], t0)
        _wg_access(cols, "rs2", _bytes(y), rec["prev_ts"][1], t0 + 1)
        sa, sy = (a >> 31) & 1, (y >> 31) & 1
        cols["dv_sa__sign"], cols["dv_sa__low7"] = sa, (a >> 24) & 0x7F
        cols["dv_sy__sign"], cols["dv_sy__low7"] = sy, (y >> 24) & 0x7F
        abs_a = _wg_cond_neg(cols, a, sa, "dv_absa")
        abs_y = _wg_cond_neg(cols, y, sy, "dv_absy")
        qm, rm = _wg_divmod_core(cols, abs_a, abs_y, "dv")
        sq = sa ^ sy
        cols["dv__sq"] = sq
        qs = _wg_cond_neg(cols, qm, sq, "dv_qs")
        rs = _wg_cond_neg(cols, rm, sa, "dv_rs")
        if y == 0:
            outv = 0xFFFFFFFF if op == "div" else a
        else:
            outv = qs if op == "div" else rs
        for i, v in enumerate(_bytes(outv)):
            cols[f"dv__out__{i}"] = v
        _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][2], t0 + 2)
        return cols

    return wg


# -- auipc --------------------------------------------------------------------


def _auipc_build():
    """rd = pc + imm (mod 2^32): pc decomposed into checked bytes (unique
    since pc < 2^30), then byte addition with the imm bytes."""
    b, ctx = _base("auipc")
    g = ctx.g
    pcb = b.cols4("pc_b")
    b.require(ir.Mul(g, ir.Sub(_word(pcb), ctx.pc)))
    _byte_range_pair(b, g, pcb[0], pcb[1])
    _byte_range_pair(b, g, pcb[2], pcb[3])
    b.send(RANGE_BUS, g, [pcb[3], ir.Const(6)])
    out = _add_bytes(b, g, pcb, _imm_cols(b, ctx), "aui")
    ctx.write(1, ctx.rd, out, "rd")
    ctx.finish()
    return b


def _auipc_wg(rec):
    cols = _wg_base(rec)
    for i, v in enumerate(_bytes(rec["pc"])):
        cols[f"pc_b__{i}"] = v
    for i, v in enumerate(_bytes(rec["imm"])):
        cols[f"imm_b__{i}"] = v
    _wg_add_bytes(cols, rec["pc"], rec["imm"], "aui")
    _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][0], rec["ts"])
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


# -- sub-word memory (lb/lbu/lh/lhu/sb/sh) ------------------------------------


def _subword_addr(b: MachineBuilder, ctx: Ctx, halfword: bool):
    """Byte address = rs1 + imm; decompose the low byte as 4*w + off and
    return (aligned word ptr expr, offset indicator cols).  Memory stays
    word-granular (OpenVM-style adapters over a word memory bus)."""
    g = ctx.g
    base = ctx.read(1, ctx.rs1, "rs1")
    addr = _add_bytes(b, g, base, _imm_cols(b, ctx), "addr")
    b.send(RANGE_BUS, g, [addr[3], ir.Const(6)])
    w = b.col("mem__w")
    b.send(RANGE_BUS, g, [w, ir.Const(6)])
    if halfword:
        o2 = b.col("mem__o2")
        _bool(b, o2)
        off = ir.Mul(ir.Const(2), o2)
        inds = [ir.Sub(ir.Const(1), o2), o2]
    else:
        o = [b.col(f"mem__o{i}") for i in range(4)]
        for oi in o:
            _bool(b, oi)
        b.require(
            ir.Mul(g, ir.Sub(_byte_sum(o), ir.Const(1)))
        )
        off = ir.Add(o[1], ir.Add(ir.Mul(ir.Const(2), o[2]), ir.Mul(ir.Const(3), o[3])))
        inds = o
    b.require(ir.Mul(g, ir.Sub(ir.Add(ir.Mul(ir.Const(4), w), off), addr[0])))
    ptr = ir.Sub(_word(addr), off)
    return ptr, inds


def _wg_subword_addr(cols, rec, halfword: bool):
    a = rec["rs1_val"]
    addr = (a + rec["imm"]) & 0xFFFFFFFF
    for i, v in enumerate(_bytes(rec["imm"])):
        cols[f"imm_b__{i}"] = v
    _wg_add_bytes(cols, a, rec["imm"], "addr")
    off = addr & (1 if halfword else 3)
    if halfword:
        off = addr & 2
        cols["mem__o2"] = off >> 1
    else:
        for i in range(4):
            cols[f"mem__o{i}"] = 1 if (addr & 3) == i else 0
        off = addr & 3
    cols["mem__w"] = (addr & 0xFF) >> 2
    return addr - off, off


def _load_sub_build(op: str):
    """lb/lbu/lh/lhu: word read + indicator-selected bytes, sign extension
    via MSB decomposition of the selected top byte."""
    halfword = op in ("lh", "lhu")
    signed = op in ("lb", "lh")
    b, ctx = _base(op)
    g = ctx.g
    ptr, inds = _subword_addr(b, ctx, halfword)
    data = ctx.read(2, ptr, "mem")
    if halfword:
        v0 = b.col("mem__v0")
        v1 = b.col("mem__v1")
        b.require(
            ir.Mul(g, ir.Sub(v0, ir.Add(ir.Mul(inds[0], data[0]), ir.Mul(inds[1], data[2]))))
        )
        b.require(
            ir.Mul(g, ir.Sub(v1, ir.Add(ir.Mul(inds[0], data[1]), ir.Mul(inds[1], data[3]))))
        )
        if signed:
            sv, _ = _sign_split(b, ctx, v1, "mem_sv")
            ext = ir.Mul(ir.Const(255), sv)
            out = [v0, v1, ext, ext]
        else:
            out = [v0, v1, ir.Const(0), ir.Const(0)]
    else:
        v = b.col("mem__v")
        sel = None
        for oi, di in zip(inds, data):
            t = ir.Mul(oi, di)
            sel = t if sel is None else ir.Add(sel, t)
        b.require(ir.Mul(g, ir.Sub(v, sel)))
        if signed:
            sv, _ = _sign_split(b, ctx, v, "mem_sv")
            ext = ir.Mul(ir.Const(255), sv)
            out = [v, ext, ext, ext]
        else:
            out = [v, ir.Const(0), ir.Const(0), ir.Const(0)]
    ctx.write(1, ctx.rd, out, "rd")
    ctx.finish()
    return b


def _load_sub_wg(op: str):
    halfword = op in ("lh", "lhu")
    signed = op in ("lb", "lh")

    def wg(rec):
        cols = _wg_base(rec)
        t0 = rec["ts"]
        _wg_access(cols, "rs1", _bytes(rec["rs1_val"]), rec["prev_ts"][0], t0)
        _, off = _wg_subword_addr(cols, rec, halfword)
        word = rec["mem_val"]
        _wg_access(cols, "mem", _bytes(word), rec["prev_ts"][1], t0 + 1)
        wb = _bytes(word)
        if halfword:
            v0, v1 = wb[off], wb[off + 1]
            cols["mem__v0"], cols["mem__v1"] = v0, v1
            if signed:
                cols["mem_sv__sign"] = v1 >> 7
                cols["mem_sv__low7"] = v1 & 0x7F
        else:
            v = wb[off]
            cols["mem__v"] = v
            if signed:
                cols["mem_sv__sign"] = v >> 7
                cols["mem_sv__low7"] = v & 0x7F
        _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][2], t0 + 2)
        return cols

    return wg


def _store_sub_build(op: str):
    """sb/sh: read-modify-write of the aligned word; the new word blends
    the source bytes in at the indicator positions."""
    halfword = op == "sh"
    b, ctx = _base(op)
    g = ctx.g
    # _subword_addr reads rs1 first; rs2 is read after (ts order)
    ptr, inds = _subword_addr(b, ctx, halfword)
    src = ctx.read(1, ctx.rs2, "rs2")
    prev = b.cols4("mem__prev_data")
    prev_ts = b.col("mem__prev_ts")
    dt = b.col("mem__dt")
    t = ir.Add(ctx.ts, ir.Const(ctx.n_access))
    ctx.n_access += 1
    nw = b.cols4("mem__new")
    if halfword:
        pairs = [(inds[0], 0), (inds[1], 2)]
        for i in range(4):
            sel_src = None
            for oi, pos in pairs:
                if i == pos:
                    sel_src = (oi, src[0])
                elif i == pos + 1:
                    sel_src = (oi, src[1])
            oi, s_ = sel_src
            blended = ir.Add(ir.Mul(oi, s_), ir.Mul(ir.Sub(ir.Const(1), oi), prev[i]))
            b.require(ir.Mul(g, ir.Sub(nw[i], blended)))
    else:
        for i in range(4):
            oi = inds[i]
            blended = ir.Add(ir.Mul(oi, src[0]), ir.Mul(ir.Sub(ir.Const(1), oi), prev[i]))
            b.require(ir.Mul(g, ir.Sub(nw[i], blended)))
    b.receive(MEM_BUS, g, [ir.Const(2), ptr, *prev, prev_ts])
    b.send(MEM_BUS, g, [ir.Const(2), ptr, *nw, t])
    b.require(ir.Mul(g, ir.Sub(dt, ir.Sub(ir.Sub(t, prev_ts), ir.Const(1)))))
    from .isa import DT_BITS

    b.send(RANGE_BUS, g, [dt, ir.Const(DT_BITS)])
    ctx.finish()
    return b


def _store_sub_wg(op: str):
    halfword = op == "sh"

    def wg(rec):
        cols = _wg_base(rec)
        t0 = rec["ts"]
        _wg_access(cols, "rs1", _bytes(rec["rs1_val"]), rec["prev_ts"][0], t0)
        _, off = _wg_subword_addr(cols, rec, halfword)
        _wg_access(cols, "rs2", _bytes(rec["rs2_val"]), rec["prev_ts"][1], t0 + 1)
        prev_word = rec["mem_prev"]
        pb = _bytes(prev_word)
        sb_ = _bytes(rec["rs2_val"])
        nb = list(pb)
        nb[off] = sb_[0]
        if halfword:
            nb[off + 1] = sb_[1]
        for i in range(4):
            cols[f"mem__prev_data__{i}"] = pb[i]
            cols[f"mem__new__{i}"] = nb[i]
        cols["mem__prev_ts"] = rec["prev_ts"][2]
        cols["mem__dt"] = (t0 + 2) - rec["prev_ts"][2] - 1
        return cols

    return wg


# -- slt family ---------------------------------------------------------------


def _slt_build(op: str):
    """slt/slti/sltu(reg)/sltiu: borrow-chain unsigned comparison, with the
    MSB-flip trick for the signed forms."""
    signed = op in ("slt", "slti")
    imm_form = op in ("slti", "sltiu")
    b, ctx = _base(op)
    a = ctx.read(1, ctx.rs1, "rs1")
    y = _imm_cols(b, ctx) if imm_form else ctx.read(1, ctx.rs2, "rs2")
    if signed:
        am, ym = _signed_flip(b, ctx, a, y, "cmp_sa", "cmp_sy")
    else:
        am, ym = a, y
    lt = _ltu_flag(b, ctx, am, ym, prefix="cmp")
    ctx.write(1, ctx.rd, [lt, ir.Const(0), ir.Const(0), ir.Const(0)], "rd")
    ctx.finish()
    return b


def _slt_wg(op: str):
    signed = op in ("slt", "slti")
    imm_form = op in ("slti", "sltiu")

    def wg(rec):
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a = rec["rs1_val"]
        _wg_access(cols, "rs1", _bytes(a), rec["prev_ts"][0], t0)
        if imm_form:
            y = rec["imm"]
            for i, v in enumerate(_bytes(y)):
                cols[f"imm_b__{i}"] = v
            nxt = 1
        else:
            y = rec["rs2_val"]
            _wg_access(cols, "rs2", _bytes(y), rec["prev_ts"][1], t0 + 1)
            nxt = 2
        av, yv = a, y
        if signed:
            av, yv = _wg_signed_flip(cols, a, y, "cmp_sa", "cmp_sy")
        borrow = 0
        for i in range(4):
            d = _bytes(av)[i] - _bytes(yv)[i] - borrow
            borrow = 1 if d < 0 else 0
            cols[f"cmp__b{i}"] = borrow
            cols[f"cmp__d{i}"] = d + 256 * borrow
        _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][nxt], t0 + nxt)
        return cols

    return wg


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


def _signed_flip(b: MachineBuilder, ctx: Ctx, a, y, pa: str, pb: str):
    """MSB-flipped byte lists for signed comparison: ltu over the flipped
    values equals signed lt (x XOR 0x80000000 order trick)."""
    sa, _ = _sign_split(b, ctx, a[3], pa)
    sy, _ = _sign_split(b, ctx, y[3], pb)
    am = [a[0], a[1], a[2], _flip_msb(a[3], sa)]
    ym = [y[0], y[1], y[2], _flip_msb(y[3], sy)]
    return am, ym


def _wg_signed_flip(cols, a, y, pa, pb):
    cols[f"{pa}__sign"], cols[f"{pa}__low7"] = (a >> 31) & 1, (a >> 24) & 0x7F
    cols[f"{pb}__sign"], cols[f"{pb}__low7"] = (y >> 31) & 1, (y >> 24) & 0x7F
    return a ^ 0x80000000, y ^ 0x80000000


def _branch_build(op: str):
    b, ctx = _base(op)
    a = ctx.read(1, ctx.rs1, "rs1")
    y = ctx.read(1, ctx.rs2, "rs2")
    if op in ("beq", "bne"):
        flag = _eq_flag(b, ctx, a, y)
        taken = flag if op == "beq" else ir.Sub(ir.Const(1), flag)
    elif op in ("bltu", "bgeu"):
        lt = _ltu_flag(b, ctx, a, y)
        taken = lt if op == "bltu" else ir.Sub(ir.Const(1), lt)
    else:  # blt / bge: signed via MSB flip
        am, ym = _signed_flip(b, ctx, a, y, "br_sa", "br_sy")
        lt = _ltu_flag(b, ctx, am, ym)
        taken = lt if op == "blt" else ir.Sub(ir.Const(1), lt)
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
            av, yv = a, y
            if op in ("blt", "bge"):
                av, yv = _wg_signed_flip(cols, a, y, "br_sa", "br_sy")
            borrow = 0
            for i in range(4):
                d = _bytes(av)[i] - _bytes(yv)[i] - borrow
                borrow = 1 if d < 0 else 0
                cols[f"br__b{i}"] = borrow
                cols[f"br__d{i}"] = d + 256 * borrow
        return cols

    return wg


# -- jumps --------------------------------------------------------------------


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


# -- hints extension (reference: openvm-riscv/extensions/hints-*) --------------


def _revb_build():
    """rd = byte-reversed rs1 — fully constrained (the write's data args
    are the read's byte columns in reverse order)."""
    b, ctx = _base("revb")
    a = ctx.read(1, ctx.rs1, "rs1")
    ctx.write(1, ctx.rd, [a[3], a[2], a[1], a[0]], "rd")
    ctx.finish()
    return b


def _revb_wg(rec):
    cols = _wg_base(rec)
    t0 = rec["ts"]
    _wg_access(cols, "rs1", _bytes(rec["rs1_val"]), rec["prev_ts"][0], t0)
    _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][1], t0 + 1)
    return cols


def _hint_phantom_build(op: str):
    """hintinv/hintsqrt: pure phantom — the executor computes the field
    hint host-side and queues it; the circuit only sequences pc/ts.  The
    value stays unconstrained until the guest verifies it (mirrors the
    reference's PhantomSubExecutor circuit shape, hints-circuit/src/lib.rs)."""
    b, ctx = _base(op)
    ctx.finish()
    return b


def _hintpop_build():
    """rd = next hint-queue word: free witness bytes (range-checked only)."""
    b, ctx = _base("hintpop")
    v = b.cols4("hint")
    _byte_range_pair(b, ctx.g, v[0], v[1])
    _byte_range_pair(b, ctx.g, v[2], v[3])
    ctx.write(1, ctx.rd, v, "rd")
    ctx.finish()
    return b


def _hintpop_wg(rec):
    cols = _wg_base(rec)
    # the popped value rides rd_val (python executor) / mem_val (native core)
    v = rec["rd_val"] if "rd_val" in rec else rec["mem_val"]
    for i, x in enumerate(_bytes(v)):
        cols[f"hint__{i}"] = x
    _wg_write(cols, "rd", _bytes(rec["rd_prev"]), rec["prev_ts"][0], rec["ts"])
    return cols


# -- registry -----------------------------------------------------------------


def _build_all():
    out = {}
    for op in ("add", "sub", "and", "or", "xor"):
        out[op] = (_alu_build(op, False), _alu_wg(op, False))
    for op in ("addi", "andi", "ori", "xori"):
        out[op] = (_alu_build(op, True), _alu_wg(op, True))
    for op in ("sll", "srl", "sra", "slli", "srli", "srai"):
        out[op] = (_shift_build2(op), _shift_wg2(op))
    out["mul"] = (_mul_build(), _mul_wg)
    for op in ("mulh", "mulhu", "mulhsu"):
        out[op] = (_mulh_build(op), _mulh_wg(op))
    for op in ("divu", "remu"):
        out[op] = (_divu_build(op), _divu_wg(op))
    for op in ("div", "rem"):
        out[op] = (_div_build(op), _div_wg(op))
    for op in ("slt", "sltu", "slti", "sltiu"):
        out[op] = (_slt_build(op), _slt_wg(op))
    out["lui"] = (_lui_build(), _lui_wg)
    out["auipc"] = (_auipc_build(), _auipc_wg)
    out["lw"] = (_lw_build(), _lw_wg)
    out["sw"] = (_sw_build(), _sw_wg)
    for op in ("lb", "lbu", "lh", "lhu"):
        out[op] = (_load_sub_build(op), _load_sub_wg(op))
    for op in ("sb", "sh"):
        out[op] = (_store_sub_build(op), _store_sub_wg(op))
    for op in ("beq", "bne", "blt", "bge", "bltu", "bgeu"):
        out[op] = (_branch_build(op), _branch_wg(op))
    out["jal"] = (_jal_build(), _jal_wg)
    out["jalr"] = (_jalr_build(), _jalr_wg)
    out["halt"] = (_halt_build(), _halt_wg)
    out["revb"] = (_revb_build(), _revb_wg)
    for op in ("hintinv", "hintsqrt"):
        out[op] = (_hint_phantom_build(op), _wg_base)
    out["hintpop"] = (_hintpop_build(), _hintpop_wg)
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
