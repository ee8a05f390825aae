"""BN254 optimal-ate pairing guest emitter.

Counterpart of /root/reference/openvm-riscv/guest-pairing/src/main.rs —
a REAL pairing (projective Miller loop with line evaluations, Fp12 tower
arithmetic, final exponentiation with the Devegili x-chain), emitted as
rv32im over the asmlib Montgomery CIOS core.  The host-side ground truth
is vm/bn254.py (validated by bilinearity tests); the guest executes the
inversion-free schedule of bn254.miller_loop_projective.

Layout (space-2 RAM, 32-byte Montgomery Fp slots):
  an Fp2 is two consecutive slots (re, im; 0x40 bytes)
  an Fp12 is six consecutive Fp2 coefficients of w^i (0x180 bytes), with
  the Fp6-tower view c0 = (f[0], f[2], f[4]), c1 = (f[1], f[3], f[5])
  read through emit-time index maps (no data movement).

Subroutine fixed slots: F2A/F2B -> F2O (Fp2 ops), W12A/W12B -> W12O
(Fp12 ops); drivers shuttle 32-byte slots with inline copies.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

from . import asmlib as al
from . import bn254 as bn
from .asmlib import Asm, fe_add, fe_mul, fe_sub

P = bn.P

# -- memory map (clear of asmlib's 0x0F00-0x1A00 usage) -----------------------
PB = 0x4000
F2A, F2B, F2O = PB + 0x000, PB + 0x040, PB + 0x080
F2T = PB + 0x0C0  # f2 subroutine temps (2 slots)
Z32 = PB + 0x140  # 32-byte zero (negation source)
F2I = PB + 0x160  # fp2 inverse in/out (2 slots) + norm temp
PM2BN = PB + 0x1E0  # exponent p-2 for Fp inversion

W12A, W12B, W12O = 0x4200, 0x4380, 0x4500
T6A = 0x4680  # Fp6 temps for f12 mul/sqr/inv: 12 Fp2 slots
F12F = 0x4A00  # Miller accumulator f
LC = 0x4B80  # line coefficients c0, c1, c3 (3 Fp2)
TJX, TJY, TJZ = 0x4C80, 0x4CC0, 0x4D00  # Jacobian T
MQ = 0x4D40  # madd operand (xq, yq: 2 Fp2)
QS, NQS, Q1S, Q2S = 0x4E00, 0x4E80, 0x4F00, 0x4F80
PX, PY = 0x5000, 0x5020
DT = 0x5040  # dbl/madd Fp2 temps (12 Fp2 through 0x5340)
NAFT = 0x5400  # NAF digit table (words: 0, 1, 2=-1), MSB-first
XBITS = 0x5600  # bits of x after the leading 1, MSB-first (words)
GAM1, GAM2, GAM3 = 0x5800, 0x5980, 0x5B00  # gamma_k[i] Fp2 tables
F12T = [0x5D00 + i * 0x180 for i in range(14)]  # final-exp Fp12 temps
F12XB = F12T[12]  # powx base
F12SQ = F12T[13]  # powx/square scratch
CNT_I = 0x7800  # loop counters
CNT_J = 0x7804
OUT12 = 0x7A00  # canonical result (12 fe slots)


def _m(x: int) -> int:
    return al.to_mont(x % P, P)


def _fe2_off(base: int, i: int) -> int:
    """Address of Fp2 coefficient i inside a flat Fp12 at `base`."""
    return base + 0x40 * i


class E:
    """Emit-time helpers over the shared Asm (all operands are emit-time
    slot addresses; subroutine bodies use the fixed F2*/W12* slots)."""

    def __init__(self, a: Asm):
        self.a = a

    # 32-byte copies ----------------------------------------------------------
    def cp(self, dst: int, src: int):
        self.a.copy32(dst, src)

    def cp2(self, dst: int, src: int):
        self.a.copy32(dst, src)
        self.a.copy32(dst + 0x20, src + 0x20)

    def cp12(self, dst: int, src: int):
        for i in range(12):
            self.a.copy32(dst + 0x20 * i, src + 0x20 * i)

    # Fp macros ---------------------------------------------------------------
    def fneg(self, dst: int, x: int):
        fe_sub(self.a, dst, Z32, x)

    def fdbl(self, dst: int, x: int):
        fe_add(self.a, dst, x, x)

    # Fp2 emit-time macros (linear ops stay inline; mults go via subs) --------
    def f2add(self, dst: int, x: int, y: int):
        fe_add(self.a, dst, x, y)
        fe_add(self.a, dst + 0x20, x + 0x20, y + 0x20)

    def f2sub(self, dst: int, x: int, y: int):
        fe_sub(self.a, dst, x, y)
        fe_sub(self.a, dst + 0x20, x + 0x20, y + 0x20)

    def f2neg(self, dst: int, x: int):
        self.fneg(dst, x)
        self.fneg(dst + 0x20, x + 0x20)

    def f2dbl(self, dst: int, x: int):
        self.f2add(dst, x, x)

    def f2scal(self, dst: int, x: int, k: int):
        """dst = k * x for tiny k via addition chains (2,3,4,8)."""
        assert k in (2, 3, 4, 8)
        self.f2add(dst, x, x)
        if k == 3:
            self.f2add(dst, dst, x)
        elif k in (4, 8):
            self.f2add(dst, dst, dst)
            if k == 8:
                self.f2add(dst, dst, dst)

    def f2xi(self, dst: int, x: int, t: int):
        """dst = (9 + u) * x = (9x0 - x1, 9x1 + x0); t: one Fp2 temp.
        dst may alias x: the result is finalized inside t (with x intact)
        before the copy-out."""
        a = self.a
        # t = 9*x (componentwise): 8x + x
        self.f2add(t, x, x)
        self.f2add(t, t, t)
        self.f2add(t, t, t)
        self.f2add(t, t, x)
        fe_sub(a, t, t, x + 0x20)  # 9x0 - x1
        fe_add(a, t + 0x20, t + 0x20, x)  # 9x1 + x0
        self.cp2(dst, t)

    def f2mul(self, dst: int, x: int, y: int):
        """dst = x*y via the f2mul subroutine (dst may alias x or y)."""
        self.cp2(F2A, x)
        self.cp2(F2B, y)
        self.a.call("f2mul")
        self.cp2(dst, F2O)

    def f2sqr(self, dst: int, x: int):
        self.cp2(F2A, x)
        self.a.call("f2sqr")
        self.cp2(dst, F2O)

    def f2mul_fp(self, dst: int, x: int, s: int):
        """dst = x * s with s a single Fp slot."""
        fe_mul(self.a, F2T, x, s)
        fe_mul(self.a, dst + 0x20, x + 0x20, s)
        self.cp(dst, F2T)

    def f2inv(self, dst: int, x: int):
        self.cp2(F2I, x)
        self.a.call("f2inv")
        self.cp2(dst, F2I)

    # Fp12 via subroutines ----------------------------------------------------
    def f12mul(self, dst: int, x: int, y: int):
        self.cp12(W12A, x)
        self.cp12(W12B, y)
        self.a.call("f12mul")
        self.cp12(dst, W12O)

    def f12sqr(self, dst: int, x: int):
        self.cp12(W12A, x)
        self.a.call("f12sqr")
        self.cp12(dst, W12O)

    def f12conj(self, dst: int, x: int):
        """dst = conj(x): negate odd-w coefficients."""
        for i in range(6):
            if i % 2:
                self.f2neg(_fe2_off(dst, i), _fe2_off(x, i))
            else:
                self.cp2(_fe2_off(dst, i), _fe2_off(x, i))

    def f12frob(self, dst: int, x: int, power: int):
        self.cp12(W12A, x)
        self.a.call(f"f12frob{power}")
        self.cp12(dst, W12O)

    def f12powx(self, dst: int, x: int):
        self.cp12(F12XB, x)
        self.a.call("f12powx")
        self.cp12(dst, W12O)

    def f12inv(self, dst: int, x: int):
        self.cp12(W12A, x)
        self.a.call("f12inv")
        self.cp12(dst, W12O)


# -- subroutine bodies --------------------------------------------------------


def _emit_f2_subs(e: E):
    a = e.a
    # [F2O] = [F2A] * [F2B]  (Karatsuba: 3 fe_mul)
    a.label("f2mul")
    a.push(1)
    fe_mul(a, F2T, F2A, F2B)  # t0 = a0 b0
    fe_mul(a, F2T + 0x20, F2A + 0x20, F2B + 0x20)  # t1 = a1 b1
    fe_add(a, F2O, F2A, F2A + 0x20)  # a0 + a1
    fe_add(a, F2O + 0x20, F2B, F2B + 0x20)  # b0 + b1
    fe_mul(a, F2O + 0x20, F2O, F2O + 0x20)  # s
    fe_sub(a, F2O + 0x20, F2O + 0x20, F2T)
    fe_sub(a, F2O + 0x20, F2O + 0x20, F2T + 0x20)  # o1 = s - t0 - t1
    fe_sub(a, F2O, F2T, F2T + 0x20)  # o0 = t0 - t1
    a.pop(1)
    a.ret()
    # [F2O] = [F2A]^2:  o0 = (a0-a1)(a0+a1), o1 = 2 a0 a1
    a.label("f2sqr")
    a.push(1)
    fe_sub(a, F2T, F2A, F2A + 0x20)
    fe_add(a, F2T + 0x20, F2A, F2A + 0x20)
    fe_mul(a, F2O, F2T, F2T + 0x20)
    fe_mul(a, F2T, F2A, F2A + 0x20)
    fe_add(a, F2O + 0x20, F2T, F2T)
    a.pop(1)
    a.ret()
    # [F2I] = [F2I]^-1:  1/(a0+a1 u) = (a0 - a1 u) / (a0^2 + a1^2)
    a.label("f2inv")
    a.push(1)
    fe_mul(a, F2T, F2I, F2I)
    fe_mul(a, F2T + 0x20, F2I + 0x20, F2I + 0x20)
    fe_add(a, al.MB, F2T, F2T + 0x20)  # norm
    e.cp(al.ME, PM2BN)
    a.call("modpow")  # MO = norm^(p-2)
    fe_mul(a, F2I, F2I, al.MO)
    e.fneg(F2T, F2I + 0x20)
    fe_mul(a, F2I + 0x20, F2T, al.MO)
    a.pop(1)
    a.ret()


def _f6(base: int, which: int) -> Tuple[int, int, int]:
    """Fp6 component slots of the flat Fp12 at `base` (tower view)."""
    if which == 0:
        return (_fe2_off(base, 0), _fe2_off(base, 2), _fe2_off(base, 4))
    return (_fe2_off(base, 1), _fe2_off(base, 3), _fe2_off(base, 5))


def _emit_f6mul(e: E, out: Tuple[int, int, int], x, y, t):
    """out = x * y in Fp6 (Karatsuba-3, 6 f2mul); t: 6 spare Fp2 slots.
    out must not alias x or y."""
    t0, t1, t2, s0, s1, s2 = t
    e.f2mul(t0, x[0], y[0])
    e.f2mul(t1, x[1], y[1])
    e.f2mul(t2, x[2], y[2])
    # c0 = t0 + xi*((x1+x2)(y1+y2) - t1 - t2)
    e.f2add(s0, x[1], x[2])
    e.f2add(s1, y[1], y[2])
    e.f2mul(s0, s0, s1)
    e.f2sub(s0, s0, t1)
    e.f2sub(s0, s0, t2)
    e.f2xi(s0, s0, s2)
    e.f2add(out[0], t0, s0)
    # c1 = (x0+x1)(y0+y1) - t0 - t1 + xi*t2
    e.f2add(s0, x[0], x[1])
    e.f2add(s1, y[0], y[1])
    e.f2mul(s0, s0, s1)
    e.f2sub(s0, s0, t0)
    e.f2sub(s0, s0, t1)
    e.f2xi(s1, t2, s2)
    e.f2add(out[1], s0, s1)
    # c2 = (x0+x2)(y0+y2) - t0 - t2 + t1
    e.f2add(s0, x[0], x[2])
    e.f2add(s1, y[0], y[2])
    e.f2mul(s0, s0, s1)
    e.f2sub(s0, s0, t0)
    e.f2sub(s0, s0, t2)
    e.f2add(out[2], s0, t1)


def _emit_f6mulv(e: E, out, x, t):
    """out = v * x in Fp6 = (xi*x2, x0, x1); out may equal x."""
    e.f2xi(t, x[2], t + 0x40)
    e.cp2(t + 0x80, x[1])
    e.cp2(out[1], x[0])
    e.cp2(out[2], t + 0x80)
    e.cp2(out[0], t)


def _emit_f12_subs(e: E):
    a = e.a
    T = [T6A + 0x40 * i for i in range(12)]
    # [W12O] = [W12A] * [W12B]   (tower Karatsuba: 3 Fp6 muls = 18 f2mul)
    a.label("f12mul")
    a.push(1)
    a0, a1 = _f6(W12A, 0), _f6(W12A, 1)
    b0, b1 = _f6(W12B, 0), _f6(W12B, 1)
    o0, o1 = _f6(W12O, 0), _f6(W12O, 1)
    t0 = (T[0], T[1], T[2])
    t1 = (T[3], T[4], T[5])
    sa = (T[6], T[7], T[8])
    spare = (T[9], T[10], T[11], DT + 0x40 * 9, DT + 0x40 * 10, DT + 0x40 * 11)
    _emit_f6mul(e, t0, a0, b0, spare)  # t0 = a0 b0
    _emit_f6mul(e, t1, a1, b1, spare)  # t1 = a1 b1
    for k in range(3):  # sa = a0 + a1 ; (reuse o as b0+b1)
        e.f2add(sa[k], a0[k], a1[k])
        e.f2add(o0[k], b0[k], b1[k])
    _emit_f6mul(e, o1, sa, o0, spare)  # o1 = (a0+a1)(b0+b1)
    for k in range(3):
        e.f2sub(o1[k], o1[k], t0[k])
        e.f2sub(o1[k], o1[k], t1[k])
    _emit_f6mulv(e, o0, t1, T[9])  # o0 = v t1
    for k in range(3):
        e.f2add(o0[k], o0[k], t0[k])  # + t0
    a.pop(1)
    a.ret()
    # [W12O] = [W12A]^2  (complex squaring: 2 Fp6 muls)
    a.label("f12sqr")
    a.push(1)
    t0 = (T[0], T[1], T[2])
    t1 = (T[3], T[4], T[5])
    sa = (T[6], T[7], T[8])
    _emit_f6mul(e, t0, a0, a1, spare)  # t0 = c0 c1
    for k in range(3):
        e.f2add(sa[k], a0[k], a1[k])  # c0 + c1
    _emit_f6mulv(e, (T[9], T[10], T[11]), a1, DT + 0x40 * 9)  # v c1
    tv = (T[9], T[10], T[11])
    for k in range(3):
        e.f2add(tv[k], tv[k], a0[k])  # c0 + v c1
    _emit_f6mul(e, t1, sa, tv, (o0[0], o0[1], o0[2], DT + 0x40 * 9, DT + 0x40 * 10, DT + 0x40 * 11))
    # o0 = t1 - t0 - v t0 ; o1 = 2 t0
    _emit_f6mulv(e, (sa[0], sa[1], sa[2]), t0, DT + 0x40 * 9)
    for k in range(3):
        e.f2sub(o0[k], t1[k], t0[k])
        e.f2sub(o0[k], o0[k], sa[k])
        e.f2dbl(o1[k], t0[k])
    a.pop(1)
    a.ret()
    # [F12F] = [F12F] * [LC]  (sparse: l nonzero at w^0, w^1, w^3)
    a.label("f12sparse")
    a.push(1)
    ACC = [DT + 0x40 * i for i in range(9)]  # 9 Fp2 accumulator (deg <= 8)
    # first write to each accumulator slot is a copy, not an add
    written = [False] * 9
    for jslot, j in ((LC, 0), (LC + 0x40, 1), (LC + 0x80, 3)):
        for i in range(6):
            e.f2mul(F2T + 0x40, _fe2_off(F12F, i), jslot)  # reuse F2T+0x40? safe: f2mul writes dst last
            k = i + j
            if written[k]:
                e.f2add(ACC[k], ACC[k], F2T + 0x40)
            else:
                e.cp2(ACC[k], F2T + 0x40)
                written[k] = True
    for i in range(6):
        e.cp2(_fe2_off(F12F, i), ACC[i])
    for k in range(6, 9):
        e.f2xi(ACC[k], ACC[k], F2T)
        e.f2add(_fe2_off(F12F, k - 6), _fe2_off(F12F, k - 6), ACC[k])
    a.pop(1)
    a.ret()


def _emit_step_subs(e: E):
    a = e.a
    D = [DT + 0x40 * i for i in range(12)]
    # doubling step: T=(TJX,TJY,TJZ) <- 2T, line -> LC
    a.label("dblstep")
    a.push(1)
    A, B, C, Dd, Ee, F, ZZ, X3, Y3, T0, T1 = D[:11]
    e.f2sqr(A, TJX)
    e.f2sqr(B, TJY)
    e.f2sqr(C, B)
    e.f2add(T0, TJX, B)
    e.f2sqr(T0, T0)
    e.f2sub(T0, T0, A)
    e.f2sub(T0, T0, C)
    e.f2dbl(Dd, T0)
    e.f2scal(Ee, A, 3)
    e.f2sqr(F, Ee)
    e.f2sqr(ZZ, TJZ)
    # lines (need pre-update X, Y, Z):
    # c0 = 2 Y Z^3 * yp ; c1 = -(3 X^2 Z^2) * xp ; c3 = 3 X^3 - 2 Y^2
    e.f2mul(T0, TJY, TJZ)
    e.f2mul(T0, T0, ZZ)
    e.f2dbl(T0, T0)
    e.f2mul_fp(LC, T0, PY)  # c0
    e.f2mul(T0, Ee, ZZ)
    e.f2mul_fp(T0, T0, PX)
    e.f2neg(LC + 0x40, T0)  # c1
    e.f2mul(T0, Ee, TJX)  # 3X^3
    e.f2dbl(T1, B)
    e.f2sub(LC + 0x80, T0, T1)  # c3
    # point update
    e.f2dbl(T0, Dd)
    e.f2sub(X3, F, T0)
    e.f2sub(T0, Dd, X3)
    e.f2mul(T0, Ee, T0)
    e.f2scal(T1, C, 8)
    e.f2sub(Y3, T0, T1)
    e.f2mul(T0, TJY, TJZ)
    e.f2dbl(T0, T0)
    e.cp2(TJX, X3)
    e.cp2(TJY, Y3)
    e.cp2(TJZ, T0)
    a.pop(1)
    a.ret()
    # mixed addition step: T <- T + (MQ), line -> LC
    a.label("maddstep")
    a.push(1)
    ZZ, U, S, H, HH, I, J, rr, V, X3, Y3, T0 = D[:12]
    xq, yq = MQ, MQ + 0x40
    e.f2sqr(ZZ, TJZ)
    e.f2mul(U, xq, ZZ)
    e.f2mul(S, ZZ, TJZ)
    e.f2mul(S, yq, S)
    e.f2sub(H, U, TJX)
    e.f2sqr(HH, H)
    e.f2scal(I, HH, 4)
    e.f2mul(J, H, I)
    e.f2sub(rr, S, TJY)
    e.f2dbl(rr, rr)
    e.f2mul(V, TJX, I)
    # line first (uses pre-update Z for Z3 = 2 Z H)
    e.f2mul(T0, TJZ, H)
    e.f2dbl(T0, T0)  # Z3
    e.f2mul_fp(LC, T0, PY)  # c0 = Z3 yp
    e.f2mul_fp(X3, rr, PX)
    e.f2neg(LC + 0x40, X3)  # c1 = -rr xp
    e.f2mul(X3, rr, xq)
    e.f2mul(Y3, T0, yq)
    e.f2sub(LC + 0x80, X3, Y3)  # c3 = rr xq - Z3 yq
    # point update
    e.f2sqr(X3, rr)
    e.f2sub(X3, X3, J)
    e.f2sub(X3, X3, V)
    e.f2sub(X3, X3, V)
    e.f2sub(Y3, V, X3)
    e.f2mul(Y3, rr, Y3)
    e.f2mul(J, TJY, J)
    e.f2dbl(J, J)
    e.f2sub(Y3, Y3, J)
    e.cp2(TJX, X3)
    e.cp2(TJY, Y3)
    e.cp2(TJZ, T0)
    a.pop(1)
    a.ret()


def _emit_frob_subs(e: E):
    a = e.a
    for power, gam in ((1, GAM1), (2, GAM2), (3, GAM3)):
        a.label(f"f12frob{power}")
        a.push(1)
        for i in range(6):
            src = _fe2_off(W12A, i)
            if power != 2:  # conj coefficient
                e.cp(F2T, src)
                e.fneg(F2T + 0x20, src + 0x20)
                e.f2mul(_fe2_off(W12O, i), F2T, gam + 0x40 * i)
            else:
                e.f2mul(_fe2_off(W12O, i), src, gam + 0x40 * i)
        a.pop(1)
        a.ret()


def _emit_powx_sub(e: E):
    """[W12O] = [F12XB]^x, x the BN parameter (fixed bits in XBITS)."""
    a = e.a
    bits = bin(bn.X_BN)[3:]  # after the leading 1, MSB-first
    a.label("f12powx")
    a.push(1)
    e.cp12(F12SQ, F12XB)
    a.store_imm(CNT_I, 0)
    loop = a.fresh("px_loop")
    nomul = a.fresh("px_nomul")
    done = a.fresh("px_done")
    a.label(loop)
    a.l("lw", 9, 0, 0, CNT_I)
    a.li(10, len(bits))
    a.l("beq", 0, 9, 10, done)
    e.f12sqr(F12SQ, F12SQ)
    # bit lookup
    a.l("lw", 9, 0, 0, CNT_I)
    a.l("slli", 9, 9, 0, 2)
    a.li(10, XBITS)
    a.l("add", 9, 9, 10)
    a.l("lw", 9, 9, 0, 0)
    a.l("beq", 0, 9, 0, nomul)
    e.f12mul(F12SQ, F12SQ, F12XB)
    a.label(nomul)
    a.l("lw", 9, 0, 0, CNT_I)
    a.l("addi", 9, 9, 0, 1)
    a.l("sw", 0, 0, 9, CNT_I)
    a.l("jal", 30, 0, 0, loop)
    a.label(done)
    e.cp12(W12O, F12SQ)
    a.pop(1)
    a.ret()


def _emit_f12inv_sub(e: E):
    """[W12O] = [W12A]^-1 via the tower: (c0 + c1 w)^-1 =
    (c0 - c1 w) / (c0^2 - v c1^2), with one Fp6 inversion inside."""
    a = e.a
    T = [T6A + 0x40 * i for i in range(12)]
    D = [DT + 0x40 * i for i in range(12)]
    a.label("f12inv")
    a.push(1)
    c0, c1 = _f6(W12A, 0), _f6(W12A, 1)
    o0, o1 = _f6(W12O, 0), _f6(W12O, 1)
    t0 = (T[0], T[1], T[2])
    t1 = (T[3], T[4], T[5])
    spare = (T[6], T[7], T[8], T[9], T[10], T[11])
    _emit_f6mul(e, t0, c0, c0, spare)  # c0^2
    _emit_f6mul(e, t1, c1, c1, spare)  # c1^2
    _emit_f6mulv(e, t1, t1, T[6])  # v c1^2
    for k in range(3):
        e.f2sub(t0[k], t0[k], t1[k])  # d = c0^2 - v c1^2
    # Fp6 inversion of d=(d0,d1,d2) -> t1
    d0, d1, d2 = t0
    A_, B_, C_, N_ = D[0], D[1], D[2], D[3]
    e.f2sqr(A_, d0)
    e.f2mul(B_, d1, d2)
    e.f2xi(B_, B_, D[4])
    e.f2sub(A_, A_, B_)  # t0' = d0^2 - xi d1 d2
    e.f2sqr(B_, d2)
    e.f2xi(B_, B_, D[4])
    e.f2mul(C_, d0, d1)
    e.f2sub(B_, B_, C_)  # t1' = xi d2^2 - d0 d1
    e.f2sqr(C_, d1)
    e.f2mul(D[4], d0, d2)
    e.f2sub(C_, C_, D[4])  # t2' = d1^2 - d0 d2
    # norm = d0 t0' + xi (d2 t1' + d1 t2')
    e.f2mul(N_, d2, B_)
    e.f2mul(D[4], d1, C_)
    e.f2add(N_, N_, D[4])
    e.f2xi(N_, N_, D[4])
    e.f2mul(D[4], d0, A_)
    e.f2add(N_, N_, D[4])
    e.f2inv(N_, N_)
    _d = (D[5], D[6], D[7])
    e.f2mul(_d[0], A_, N_)
    e.f2mul(_d[1], B_, N_)
    e.f2mul(_d[2], C_, N_)  # dinv
    # o0 = c0 * dinv ; o1 = -(c1 * dinv)
    _emit_f6mul(e, t1, c0, _d, spare)
    for k in range(3):
        e.cp2(o0[k], t1[k])
    _emit_f6mul(e, t1, c1, _d, spare)
    for k in range(3):
        e.f2neg(o1[k], t1[k])
    a.pop(1)
    a.ret()


# -- top-level emission -------------------------------------------------------


def emit_pairing_program(
    p_aff: Tuple[int, int],
    q_aff: Tuple[Tuple[int, int], Tuple[int, int]],
    truncate_naf: Optional[int] = None,
    final_exp: bool = True,
):
    """Build (lines, mem) computing e(P, Q) into OUT12 (canonical).

    truncate_naf: run only the first k NAF digits and skip the Frobenius
    lines + final exponentiation — the CI-sized variant; the python model
    for it is bn254 _miller_core over the same truncated schedule."""
    a = Asm()
    e = E(a)
    mem = {}
    mem.update(al.desc_mem(al.DESC_BN, P))
    mem.update(al.fe_mem(al.ONE_RAW, 1))

    def put_fe(addr: int, v: int, mont: bool = True):
        mem.update(al.fe_mem(addr, _m(v) if mont else v % P))

    def put_f2(addr: int, v: Tuple[int, int]):
        put_fe(addr, v[0])
        put_fe(addr + 0x20, v[1])

    put_fe(Z32, 0, mont=False)
    mem.update(al.fe_mem(PM2BN, P - 2))  # raw exponent
    put_fe(PX, p_aff[0])
    put_fe(PY, p_aff[1])
    put_f2(QS, q_aff[0])
    put_f2(QS + 0x40, q_aff[1])
    put_f2(NQS, q_aff[0])
    put_f2(NQS + 0x40, bn.f2_neg(q_aff[1]))
    for base, gams in ((GAM1, bn.GAMMA_1), (GAM2, bn.GAMMA_2), (GAM3, bn.GAMMA_3)):
        for i in range(6):
            put_f2(base + 0x40 * i, gams[i])
    # one = mont(1) seed for f (and OUT base)
    naf = list(reversed(bn.ATE_NAF[:-1]))  # MSB-1 downward
    if truncate_naf is not None:
        naf = naf[:truncate_naf]
    for i, d in enumerate(naf):
        mem[NAFT + 4 * i] = {0: 0, 1: 1, -1: 2}[d]
    bits = bin(bn.X_BN)[3:]
    for i, b in enumerate(bits):
        mem[XBITS + 4 * i] = int(b)

    a.li(2, al.STACK_TOP)
    a.li(19, al.DESC_BN)
    # f = 1 (Montgomery one from the descriptor), T = (xq, yq, 1)
    for i in range(12):
        e.cp(F12F + 0x20 * i, Z32)
    for i in range(8):
        a.l("lw", 3, 19, 0, 64 + 4 * i)
        a.l("sw", 0, 0, 3, F12F + 4 * i)
    e.cp2(TJX, QS)
    e.cp2(TJY, QS + 0x40)
    for i in range(8):
        a.l("lw", 3, 19, 0, 64 + 4 * i)
        a.l("sw", 0, 0, 3, TJZ + 4 * i)
    e.cp(TJZ + 0x20, Z32)

    # Miller loop over the NAF table
    a.store_imm(CNT_J, 0)
    mloop = a.fresh("miller")
    mnoadd = a.fresh("m_noadd")
    mneg = a.fresh("m_neg")
    mdoadd = a.fresh("m_doadd")
    mdone = a.fresh("m_done")
    a.label(mloop)
    a.l("lw", 9, 0, 0, CNT_J)
    a.li(10, len(naf))
    a.l("beq", 0, 9, 10, mdone)
    e.f12sqr(F12F, F12F)
    a.call("dblstep")
    a.call("f12sparse")
    # digit dispatch
    a.l("lw", 9, 0, 0, CNT_J)
    a.l("slli", 9, 9, 0, 2)
    a.li(10, NAFT)
    a.l("add", 9, 9, 10)
    a.l("lw", 9, 9, 0, 0)
    a.l("beq", 0, 9, 0, mnoadd)
    a.l("addi", 10, 0, 0, 2)
    a.l("beq", 0, 9, 10, mneg)
    for k in range(4):
        e.cp(MQ + 0x20 * k, QS + 0x20 * k)
    a.l("jal", 30, 0, 0, mdoadd)
    a.label(mneg)
    for k in range(4):
        e.cp(MQ + 0x20 * k, NQS + 0x20 * k)
    a.label(mdoadd)
    a.call("maddstep")
    a.call("f12sparse")
    a.label(mnoadd)
    a.l("lw", 9, 0, 0, CNT_J)
    a.l("addi", 9, 9, 0, 1)
    a.l("sw", 0, 0, 9, CNT_J)
    a.l("jal", 30, 0, 0, mloop)
    a.label(mdone)

    if truncate_naf is None:
        # Frobenius correction lines: Q1 = pi(Q), Q2' = -pi^2(Q),
        # computed in-VM from Q and the gamma tables
        e.cp(F2T, QS)
        e.fneg(F2T + 0x20, QS + 0x20)
        e.f2mul(Q1S, F2T, GAM1 + 0x40 * 2)
        e.cp(F2T, QS + 0x40)
        e.fneg(F2T + 0x20, QS + 0x60)
        e.f2mul(Q1S + 0x40, F2T, GAM1 + 0x40 * 3)
        e.f2mul(Q2S, QS, GAM2 + 0x40 * 2)
        e.f2mul(F2T, QS + 0x40, GAM2 + 0x40 * 3)
        e.f2neg(Q2S + 0x40, F2T)
        for k in range(4):
            e.cp(MQ + 0x20 * k, Q1S + 0x20 * k)
        a.call("maddstep")
        a.call("f12sparse")
        for k in range(4):
            e.cp(MQ + 0x20 * k, Q2S + 0x20 * k)
        a.call("maddstep")
        a.call("f12sparse")

    if final_exp and truncate_naf is None:
        FE = F12T
        f, finv, t0, t1 = FE[0], FE[1], FE[2], FE[3]
        fx, fx2, fx3 = FE[4], FE[5], FE[6]
        y0, y1 = FE[7], FE[8]
        # easy part: f <- (conj(f) * f^-1), then frob2(f) * f
        e.f12inv(finv, F12F)
        e.f12conj(f, F12F)
        e.f12mul(f, f, finv)
        e.f12frob(t0, f, 2)
        e.f12mul(f, t0, f)
        # hard part (Devegili chain; y2/y3/y5/y6 folded into t0/t1 to
        # keep slot usage small)
        e.f12powx(fx, f)
        e.f12powx(fx2, fx)
        e.f12powx(fx3, fx2)
        e.f12frob(t0, f, 1)
        e.f12frob(t1, f, 2)
        e.f12mul(y0, t0, t1)
        e.f12frob(t0, f, 3)
        e.f12mul(y0, y0, t0)
        e.f12conj(y1, f)
        # y6 = conj(fx3 * frob(fx3)); t0 = y6^2
        e.f12frob(t0, fx3, 1)
        e.f12mul(t0, t0, fx3)
        e.f12conj(t0, t0)
        e.f12sqr(t0, t0)
        # t0 *= y4 = conj(fx * frob(fx2))
        e.f12frob(t1, fx2, 1)
        e.f12mul(t1, t1, fx)
        e.f12conj(t1, t1)
        e.f12mul(t0, t0, t1)
        # t0 *= y5 = conj(fx2)
        e.f12conj(t1, fx2)
        e.f12mul(t0, t0, t1)
        # t1 = y3 * y5 * t0,  y3 = conj(frob(fx))
        e.f12frob(y1_t := FE[9], fx, 1)
        e.f12conj(y1_t, y1_t)
        e.f12mul(y1_t, y1_t, t1)  # y3 * y5   (t1 still = y5)
        e.f12mul(t1, y1_t, t0)
        # t0 *= y2 = frob2(fx2)
        e.f12frob(y1_t, fx2, 2)
        e.f12mul(t0, t0, y1_t)
        # t1 = (t1^2 * t0)^2
        e.f12sqr(t1, t1)
        e.f12mul(t1, t1, t0)
        e.f12sqr(t1, t1)
        # t0 = (t1 * y1)^2 ; t1 = t1 * y0 ; out = t1 * t0
        e.f12mul(t0, t1, y1)
        e.f12mul(t1, t1, y0)
        e.f12sqr(t0, t0)
        e.f12mul(t0, t0, t1)
        e.cp12(F12F, t0)

    # canonicalize into OUT12
    for i in range(12):
        fe_mul(a, OUT12 + 0x20 * i, F12F + 0x20 * i, al.ONE_RAW)
    a.l("halt",)

    # subroutine bodies
    al.emit_field_lib(a)
    _emit_f2_subs(e)
    _emit_f12_subs(e)
    _emit_step_subs(e)
    _emit_frob_subs(e)
    _emit_powx_sub(e)
    _emit_f12inv_sub(e)
    return a.lines, mem


def read_out12(result) -> Tuple:
    out = []
    for i in range(6):
        c = []
        for j in range(2):
            base = OUT12 + 0x40 * i + 0x20 * j
            c.append(al.from_limbs([result.final_mem[(2, base + 4 * k)][1] for k in range(8)]))
        out.append((c[0], c[1]))
    return tuple(out)
