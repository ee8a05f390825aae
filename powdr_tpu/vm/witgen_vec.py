"""Columnar (vectorized) witness generation.

One numpy pass per opcode over the native executor's columnar record
arrays — the TPU-framework counterpart of the reference's CUDA tracegen
(thread-per-row gather + expression kernels,
/root/reference/openvm/cuda/src/apc_tracegen.cu:35-66): here the rows ARE
the vector lanes.  Replaces the per-record dict path
(`machines.py` wg functions) as the default for native executions; the
scalar path remains the semantic reference and the equivalence is pinned
by tests (same traces, byte for byte).

Each `wg_vec(rec)` takes a columnar record dict {field: (n,) uint64
array, "prev_ts": list of (n,) arrays} and returns {col: (n,) uint64}.
Data-dependent branches of the scalar path become np.where selects.
"""
from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

P = 2013265921
M32 = np.uint64(0xFFFFFFFF)
U = np.uint64

Rec = Dict[str, np.ndarray]
Cols = Dict[str, np.ndarray]


def _b(v: np.ndarray, i: int) -> np.ndarray:
    return (v >> U(8 * i)) & U(0xFF)


def _vbytes(v: np.ndarray) -> List[np.ndarray]:
    return [_b(v, i) for i in range(4)]


def _pow_mod_vec(base: np.ndarray, e: int) -> np.ndarray:
    """base^e mod P elementwise (base < P)."""
    out = np.ones_like(base)
    b = base % U(P)
    while e:
        if e & 1:
            out = out * b % U(P)
        b = b * b % U(P)
        e >>= 1
    return out


def _inv0_vec(x: np.ndarray) -> np.ndarray:
    """1/x mod P elementwise, with 0 -> 0 (witness convention)."""
    return _pow_mod_vec(x, P - 2)


def _wg_base(rec: Rec) -> Cols:
    imm = rec["imm"]
    n = len(imm)
    return {
        "is_valid": np.ones(n, dtype=np.uint64),
        "from_pc": rec["pc"],
        "from_ts": rec["ts"],
        "rd_ptr": rec["rd"],
        "rs1_ptr": rec["rs1"],
        "rs2_ptr": rec["rs2"],
        "imm_lo": imm & U(0xFFFF),
        "imm_hi": imm >> U(16),
    }


def _wg_access(cols: Cols, prefix: str, val: np.ndarray, prev_ts: np.ndarray, t: np.ndarray):
    for i in range(4):
        cols[f"{prefix}__data__{i}"] = _b(val, i)
    cols[f"{prefix}__prev_ts"] = prev_ts
    cols[f"{prefix}__dt"] = t - prev_ts - U(1)


def _wg_write(cols: Cols, prefix: str, prev: np.ndarray, prev_ts: np.ndarray, t: np.ndarray):
    for i in range(4):
        cols[f"{prefix}__prev_data__{i}"] = _b(prev, i)
    cols[f"{prefix}__prev_ts"] = prev_ts
    cols[f"{prefix}__dt"] = t - prev_ts - U(1)


def _wg_add_bytes(cols: Cols, x: np.ndarray, y: np.ndarray, prefix: str) -> np.ndarray:
    z = (x + y) & M32
    carry = np.zeros_like(x)
    for i in range(4):
        t = _b(x, i) + _b(y, i) + carry
        carry = t >> U(8)
        cols[f"{prefix}__c{i}"] = carry
        cols[f"{prefix}__sum__{i}"] = _b(z, i)
    return z


def _wg_imm_bytes(cols: Cols, imm: np.ndarray):
    for i in range(4):
        cols[f"imm_b__{i}"] = _b(imm, i)


def _byte_sum(v: np.ndarray) -> np.ndarray:
    return _b(v, 0) + _b(v, 1) + _b(v, 2) + _b(v, 3)


def _wg_cond_neg(cols: Cols, src: np.ndarray, sign: np.ndarray, prefix: str) -> np.ndarray:
    neg = (U(1 << 32) - src) & M32
    out = np.where(sign.astype(bool), neg, src)
    cols[f"{prefix}__z"] = (src == 0).astype(np.uint64)
    cols[f"{prefix}__zinv"] = _inv0_vec(_byte_sum(src))
    carry = np.zeros_like(src)
    sb = sign.astype(bool)
    for i in range(4):
        t = _b(src, i) + _b(out, i) + carry
        carry = np.where(sb, t >> U(8), U(0))
        cols[f"{prefix}__nc{i}"] = carry
        cols[f"{prefix}__neg__{i}"] = _b(out, i)
    return out


def _wg_prod_decomp(cols: Cols, x: np.ndarray, y: np.ndarray, prefix: str):
    xb, yb = _vbytes(x), _vbytes(y)
    prod = x * y  # < 2^64, fits uint64
    carry = np.zeros_like(x)
    for k in range(8):
        pk = (prod >> U(8 * k)) & U(0xFF)
        t = carry.copy()
        for i in range(4):
            j = k - i
            if 0 <= j < 4:
                t = t + xb[i] * yb[j]
        carry = (t - pk) >> U(8)
        cols[f"{prefix}__p{k}"] = pk
        cols[f"{prefix}__c{k}"] = carry


def _wg_divmod_core(cols: Cols, a: np.ndarray, y: np.ndarray, prefix: str):
    yz = y == 0
    y_safe = np.where(yz, U(1), y)
    qv = np.where(yz, M32, a // y_safe)
    rv = np.where(yz, a, a % y_safe)
    for i in range(4):
        cols[f"{prefix}__q__{i}"] = _b(qv, i)
        cols[f"{prefix}__r__{i}"] = _b(rv, i)
    _wg_prod_decomp(cols, qv, y, prefix)
    p_lo = (qv * y) & M32
    carry = np.zeros_like(a)
    for i in range(4):
        t = _b(p_lo, i) + _b(rv, i) + carry
        carry = (t - _b(a, i)) >> U(8)
        cols[f"{prefix}__cc{i}"] = carry
    cols[f"{prefix}_y__z"] = yz.astype(np.uint64)
    cols[f"{prefix}_y__zinv"] = _inv0_vec(_byte_sum(y))
    _wg_borrow_chain(cols, rv, y, f"{prefix}_lt")
    return qv, rv


def _wg_borrow_chain(cols: Cols, a: np.ndarray, y: np.ndarray, prefix: str) -> np.ndarray:
    """lt = final borrow of a - y bytewise; fills {prefix}__b{i}/__d{i}."""
    borrow = np.zeros(len(a), dtype=np.int64)
    for i in range(4):
        d = _b(a, i).astype(np.int64) - _b(y, i).astype(np.int64) - borrow
        borrow = (d < 0).astype(np.int64)
        cols[f"{prefix}__b{i}"] = borrow.astype(np.uint64)
        cols[f"{prefix}__d{i}"] = (d + 256 * borrow).astype(np.uint64)
    return borrow.astype(np.uint64)


def _wg_sign(cols: Cols, v: np.ndarray, prefix: str) -> np.ndarray:
    s = (v >> U(31)) & U(1)
    cols[f"{prefix}__sign"] = s
    cols[f"{prefix}__low7"] = (v >> U(24)) & U(0x7F)
    return s


def _wg_signed_flip(cols: Cols, a, y, pa, pb):
    _wg_sign(cols, a, pa)
    _wg_sign(cols, y, pb)
    return a ^ U(0x80000000), y ^ U(0x80000000)


# -- per-family witgens -------------------------------------------------------


def _alu_wg(op: str, use_imm: bool) -> Callable[[Rec], Cols]:
    kind = op.rstrip("i") if op != "sub" else op

    def wg(rec: Rec) -> Cols:
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a = rec["rs1_val"]
        _wg_access(cols, "rs1", a, rec["prev_ts"][0], t0)
        if use_imm:
            y = rec["imm"]
            _wg_imm_bytes(cols, y)
            nxt = 1
        else:
            y = rec["rs2_val"]
            _wg_access(cols, "rs2", y, rec["prev_ts"][1], t0 + U(1))
            nxt = 2
        if op in ("add", "addi"):
            _wg_add_bytes(cols, a, y, "alu")
        elif op == "sub":
            z = (a - y) & M32
            carry = np.zeros_like(a)
            for i in range(4):
                t = _b(z, i) + _b(y, i) + carry
                carry = t >> U(8)
                cols[f"alu__c{i}"] = carry
                cols[f"alu__sum__{i}"] = _b(z, i)
        else:
            x = a ^ y
            for i in range(4):
                cols[f"alu__xor__{i}"] = _b(x, i)
            if kind != "xor":
                z = a & y if kind == "and" else a | y
                for i in range(4):
                    cols[f"alu__out__{i}"] = _b(z, i)
        _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][nxt], t0 + U(nxt))
        return cols

    return wg


def _shift_wg2(op: str) -> Callable[[Rec], Cols]:
    imm_form = op.endswith("i")
    kind = {"sll": "sll", "slli": "sll", "srl": "srl", "srli": "srl",
            "sra": "sra", "srai": "sra"}[op]

    def wg(rec: Rec) -> Cols:
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a = rec["rs1_val"]
        _wg_access(cols, "rs1", a, rec["prev_ts"][0], t0)
        if imm_form:
            s = rec["imm"] & U(31)
            nxt = 1
        else:
            yv = rec["rs2_val"]
            _wg_access(cols, "rs2", yv, rec["prev_ts"][1], t0 + U(1))
            s = yv & U(31)
            cols["sh__s"] = s
            cols["sh__q"] = (yv & U(0xFF)) >> U(5)
            nxt = 2
        if kind == "sll":
            s_eff = s
        else:
            z0 = s == 0
            cols["sh_s0__z"] = z0.astype(np.uint64)
            cols["sh_s0__zinv"] = _inv0_vec(s)
            s_eff = np.where(z0, U(0), U(32) - s)
            cols["sh__seff"] = s_eff
        p2 = U(1) << s_eff
        for i in range(4):
            cols[f"sh__p2__{i}"] = _b(p2, i)
        _wg_prod_decomp(cols, a, p2 & M32, "sh")
        if kind == "srl":
            z = a >> s
            for i in range(4):
                cols[f"sh__out__{i}"] = _b(z, i)
        elif kind == "sra":
            sa = _wg_sign(cols, a, "sh_sign")
            m = (U(1 << 32) - p2) & M32
            carry = np.zeros_like(a)
            for i in range(4):
                t = _b(m, i) + _b(p2, i) + carry
                carry = t >> U(8)
                cols[f"sh__m__{i}"] = _b(m, i)
                cols[f"sh__mc{i}"] = carry
            signed = a.astype(np.int64) - (sa.astype(np.int64) << 32)
            z = (signed >> s.astype(np.int64)).astype(np.uint64) & M32
            for i in range(4):
                cols[f"sh__out__{i}"] = _b(z, i)
        _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][nxt], t0 + U(nxt))
        return cols

    return wg


def _mul_wg(rec: Rec) -> Cols:
    cols = _wg_base(rec)
    t0 = rec["ts"]
    a, y = rec["rs1_val"], rec["rs2_val"]
    _wg_access(cols, "rs1", a, rec["prev_ts"][0], t0)
    _wg_access(cols, "rs2", y, rec["prev_ts"][1], t0 + U(1))
    # same relation as _wg_prod_decomp but with the mul chip's col names
    xb, yb = _vbytes(a), _vbytes(y)
    prod = a * y
    carry = np.zeros_like(a)
    for k in range(8):
        pk = (prod >> U(8 * k)) & U(0xFF)
        t = carry.copy()
        for i in range(4):
            j = k - i
            if 0 <= j < 4:
                t = t + xb[i] * yb[j]
        carry = (t - pk) >> U(8)
        cols[f"mul__p{k}"] = pk
        cols[f"mul__c{k}"] = carry
    _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][2], t0 + U(2))
    return cols


def _mulh_wg(op: str) -> Callable[[Rec], Cols]:
    def wg(rec: Rec) -> Cols:
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a, y = rec["rs1_val"], rec["rs2_val"]
        _wg_access(cols, "rs1", a, rec["prev_ts"][0], t0)
        _wg_access(cols, "rs2", y, rec["prev_ts"][1], t0 + U(1))
        _wg_prod_decomp(cols, a, y, "mul")
        if op != "mulhu":
            sa = _wg_sign(cols, a, "mh_sa")
            terms = [(sa, y)]
            if op == "mulh":
                sy = _wg_sign(cols, y, "mh_sy")
                terms.append((sy, a))
            p_hi = (a * y) >> U(32)
            sub = sum(s_ * v_ for s_, v_ in terms)  # fits: < 2*2^32
            hval = (p_hi - sub) & M32
            borrow = np.zeros_like(a)
            for i in range(4):
                rhs = _b(hval, i) + sum(s_ * _b(v_, i) for s_, v_ in terms) + borrow
                borrow = (rhs - _b(p_hi & M32, i)) >> U(8)
                cols[f"mh__h__{i}"] = _b(hval, i)
                cols[f"mh__b{i}"] = borrow
        _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][2], t0 + U(2))
        return cols

    return wg


def _divu_wg(op: str) -> Callable[[Rec], Cols]:
    def wg(rec: Rec) -> Cols:
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a, y = rec["rs1_val"], rec["rs2_val"]
        _wg_access(cols, "rs1", a, rec["prev_ts"][0], t0)
        _wg_access(cols, "rs2", y, rec["prev_ts"][1], t0 + U(1))
        _wg_divmod_core(cols, a, y, "dv")
        _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][2], t0 + U(2))
        return cols

    return wg


def _div_wg(op: str) -> Callable[[Rec], Cols]:
    def wg(rec: Rec) -> Cols:
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a, y = rec["rs1_val"], rec["rs2_val"]
        _wg_access(cols, "rs1", a, rec["prev_ts"][0], t0)
        _wg_access(cols, "rs2", y, rec["prev_ts"][1], t0 + U(1))
        sa = _wg_sign(cols, a, "dv_sa")
        sy = _wg_sign(cols, y, "dv_sy")
        abs_a = _wg_cond_neg(cols, a, sa, "dv_absa")
        abs_y = _wg_cond_neg(cols, y, sy, "dv_absy")
        qm, rm = _wg_divmod_core(cols, abs_a, abs_y, "dv")
        sq = sa ^ sy
        cols["dv__sq"] = sq
        qs = _wg_cond_neg(cols, qm, sq, "dv_qs")
        rs = _wg_cond_neg(cols, rm, sa, "dv_rs")
        yz = y == 0
        if op == "div":
            outv = np.where(yz, M32, qs)
        else:
            outv = np.where(yz, a, rs)
        for i in range(4):
            cols[f"dv__out__{i}"] = _b(outv, i)
        _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][2], t0 + U(2))
        return cols

    return wg


def _slt_wg(op: str) -> Callable[[Rec], Cols]:
    signed = op in ("slt", "slti")
    imm_form = op in ("slti", "sltiu")

    def wg(rec: Rec) -> Cols:
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a = rec["rs1_val"]
        _wg_access(cols, "rs1", a, rec["prev_ts"][0], t0)
        if imm_form:
            y = rec["imm"]
            _wg_imm_bytes(cols, y)
            nxt = 1
        else:
            y = rec["rs2_val"]
            _wg_access(cols, "rs2", y, rec["prev_ts"][1], t0 + U(1))
            nxt = 2
        av, yv = (a, y) if not signed else _wg_signed_flip(cols, a, y, "cmp_sa", "cmp_sy")
        _wg_borrow_chain(cols, av, yv, "cmp")
        _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][nxt], t0 + U(nxt))
        return cols

    return wg


def _lui_wg(rec: Rec) -> Cols:
    cols = _wg_base(rec)
    _wg_imm_bytes(cols, rec["imm"])
    _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][0], rec["ts"])
    return cols


def _auipc_wg(rec: Rec) -> Cols:
    cols = _wg_base(rec)
    for i in range(4):
        cols[f"pc_b__{i}"] = _b(rec["pc"], i)
    _wg_imm_bytes(cols, rec["imm"])
    _wg_add_bytes(cols, rec["pc"], rec["imm"], "aui")
    _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][0], rec["ts"])
    return cols


def _lw_wg(rec: Rec) -> Cols:
    cols = _wg_base(rec)
    t0 = rec["ts"]
    _wg_access(cols, "rs1", rec["rs1_val"], rec["prev_ts"][0], t0)
    _wg_imm_bytes(cols, rec["imm"])
    _wg_add_bytes(cols, rec["rs1_val"], rec["imm"], "addr")
    _wg_access(cols, "mem", rec["mem_val"], rec["prev_ts"][1], t0 + U(1))
    _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][2], t0 + U(2))
    return cols


def _sw_wg(rec: Rec) -> Cols:
    cols = _wg_base(rec)
    t0 = rec["ts"]
    _wg_access(cols, "rs1", rec["rs1_val"], rec["prev_ts"][0], t0)
    _wg_access(cols, "rs2", rec["rs2_val"], rec["prev_ts"][1], t0 + U(1))
    _wg_imm_bytes(cols, rec["imm"])
    _wg_add_bytes(cols, rec["rs1_val"], rec["imm"], "addr")
    _wg_write(cols, "mem", rec["mem_prev"], rec["prev_ts"][2], t0 + U(2))
    return cols


def _wg_subword_addr(cols: Cols, rec: Rec, halfword: bool):
    a = rec["rs1_val"]
    addr = (a + rec["imm"]) & M32
    _wg_imm_bytes(cols, rec["imm"])
    _wg_add_bytes(cols, a, rec["imm"], "addr")
    if halfword:
        off = addr & U(2)
        cols["mem__o2"] = off >> U(1)
    else:
        off = addr & U(3)
        for i in range(4):
            cols[f"mem__o{i}"] = (off == i).astype(np.uint64)
    cols["mem__w"] = (addr & U(0xFF)) >> U(2)
    return addr - off, off


def _load_sub_wg(op: str) -> Callable[[Rec], Cols]:
    halfword = op in ("lh", "lhu")
    signed = op in ("lb", "lh")

    def wg(rec: Rec) -> Cols:
        cols = _wg_base(rec)
        t0 = rec["ts"]
        _wg_access(cols, "rs1", rec["rs1_val"], rec["prev_ts"][0], t0)
        _, off = _wg_subword_addr(cols, rec, halfword)
        word = rec["mem_val"]
        _wg_access(cols, "mem", word, rec["prev_ts"][1], t0 + U(1))
        if halfword:
            v0 = (word >> (U(8) * off)) & U(0xFF)
            v1 = (word >> (U(8) * (off + U(1)))) & U(0xFF)
            cols["mem__v0"], cols["mem__v1"] = v0, v1
            if signed:
                cols["mem_sv__sign"] = v1 >> U(7)
                cols["mem_sv__low7"] = v1 & U(0x7F)
        else:
            v = (word >> (U(8) * off)) & U(0xFF)
            cols["mem__v"] = v
            if signed:
                cols["mem_sv__sign"] = v >> U(7)
                cols["mem_sv__low7"] = v & U(0x7F)
        _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][2], t0 + U(2))
        return cols

    return wg


def _store_sub_wg(op: str) -> Callable[[Rec], Cols]:
    halfword = op == "sh"

    def wg(rec: Rec) -> Cols:
        cols = _wg_base(rec)
        t0 = rec["ts"]
        _wg_access(cols, "rs1", rec["rs1_val"], rec["prev_ts"][0], t0)
        _, off = _wg_subword_addr(cols, rec, halfword)
        _wg_access(cols, "rs2", rec["rs2_val"], rec["prev_ts"][1], t0 + U(1))
        prev_word = rec["mem_prev"]
        src = rec["rs2_val"]
        new = prev_word.copy()
        # blend src byte(s) in at offset `off`
        sh = U(8) * off
        mask = U(0xFFFF) if halfword else U(0xFF)
        new = (new & ~(mask << sh)) | ((src & mask) << sh)
        for i in range(4):
            cols[f"mem__prev_data__{i}"] = _b(prev_word, i)
            cols[f"mem__new__{i}"] = _b(new, i)
        cols["mem__prev_ts"] = rec["prev_ts"][2]
        cols["mem__dt"] = (t0 + U(2)) - rec["prev_ts"][2] - U(1)
        return cols

    return wg


def _branch_wg(op: str) -> Callable[[Rec], Cols]:
    def wg(rec: Rec) -> Cols:
        cols = _wg_base(rec)
        t0 = rec["ts"]
        a, y = rec["rs1_val"], rec["rs2_val"]
        _wg_access(cols, "rs1", a, rec["prev_ts"][0], t0)
        _wg_access(cols, "rs2", y, rec["prev_ts"][1], t0 + U(1))
        if op in ("beq", "bne"):
            nz = np.zeros_like(a)
            for i in range(4):
                d = (_b(a, i).astype(np.int64) - _b(y, i).astype(np.int64)) ** 2
                nz = (nz + d.astype(np.uint64)) % U(P)
            cols["br__eq"] = (a == y).astype(np.uint64)
            cols["br__inv"] = _inv0_vec(nz)
        else:
            av, yv = a, y
            if op in ("blt", "bge"):
                av, yv = _wg_signed_flip(cols, a, y, "br_sa", "br_sy")
            _wg_borrow_chain(cols, av, yv, "br")
        return cols

    return wg


def _jal_wg(rec: Rec) -> Cols:
    cols = _wg_base(rec)
    link = rec["pc"] + U(4)
    for i in range(4):
        cols[f"link__{i}"] = _b(link, i)
    _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][0], rec["ts"])
    return cols


def _jalr_wg(rec: Rec) -> Cols:
    cols = _wg_base(rec)
    t0 = rec["ts"]
    _wg_access(cols, "rs1", rec["rs1_val"], rec["prev_ts"][0], t0)
    link = rec["pc"] + U(4)
    for i in range(4):
        cols[f"link__{i}"] = _b(link, i)
    _wg_imm_bytes(cols, rec["imm"])
    _wg_add_bytes(cols, rec["rs1_val"], rec["imm"], "tgt")
    _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][1], t0 + U(1))
    return cols


def _halt_wg(rec: Rec) -> Cols:
    return _wg_base(rec)


# -- registry -----------------------------------------------------------------


def _build_all() -> Dict[str, Callable[[Rec], Cols]]:
    out: Dict[str, Callable[[Rec], Cols]] = {}
    for op in ("add", "sub", "and", "or", "xor"):
        out[op] = _alu_wg(op, False)
    for op in ("addi", "andi", "ori", "xori"):
        out[op] = _alu_wg(op, True)
    for op in ("sll", "srl", "sra", "slli", "srli", "srai"):
        out[op] = _shift_wg2(op)
    out["mul"] = _mul_wg
    for op in ("mulh", "mulhu", "mulhsu"):
        out[op] = _mulh_wg(op)
    for op in ("divu", "remu"):
        out[op] = _divu_wg(op)
    for op in ("div", "rem"):
        out[op] = _div_wg(op)
    for op in ("slt", "sltu", "slti", "sltiu"):
        out[op] = _slt_wg(op)
    out["lui"] = _lui_wg
    out["auipc"] = _auipc_wg
    out["lw"] = _lw_wg
    out["sw"] = _sw_wg
    for op in ("lb", "lbu", "lh", "lhu"):
        out[op] = _load_sub_wg(op)
    for op in ("sb", "sh"):
        out[op] = _store_sub_wg(op)
    for op in ("beq", "bne", "blt", "bge", "bltu", "bgeu"):
        out[op] = _branch_wg(op)
    out["jal"] = _jal_wg
    out["jalr"] = _jalr_wg
    out["halt"] = _halt_wg
    out["revb"] = _revb_wg
    out["hintinv"] = _wg_base
    out["hintsqrt"] = _wg_base
    out["hintpop"] = _hintpop_wg
    return out


def _revb_wg(rec: Rec) -> Cols:
    cols = _wg_base(rec)
    t0 = rec["ts"]
    _wg_access(cols, "rs1", rec["rs1_val"], rec["prev_ts"][0], t0)
    _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][1], t0 + U(1))
    return cols


def _hintpop_wg(rec: Rec) -> Cols:
    cols = _wg_base(rec)
    v = rec["mem_val"]  # native core parks the hint value here
    for i in range(4):
        cols[f"hint__{i}"] = _b(v, i)
    _wg_write(cols, "rd", rec["rd_prev"], rec["prev_ts"][0], rec["ts"])
    return cols


_REGISTRY: Dict[str, Callable[[Rec], Cols]] | None = None


def registry_vec() -> Dict[str, Callable[[Rec], Cols]]:
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = _build_all()
    return _REGISTRY
