"""Macro assembler for big-field guest programs.

The reference's heavyweight guests (guest-ecrecover, guest-pairing —
/root/reference/openvm-riscv/guest-ecrecover, guest-pairing) are Rust
compiled to riscv32.  No cross-compiler exists in this environment, so
this module is the moral equivalent of their field-arithmetic cores: a
python macro assembler emitting rv32im for 256-bit modular arithmetic
(Montgomery CIOS multiply for any odd modulus, modpow) and
secp256k1 Jacobian point operations, as callable subroutines with a
real call stack.

Conventions:
  x1 = link register, x2 = stack pointer (grows down from STACK_TOP)
  x19 = modulus-descriptor address (set by caller before fe_* calls)
  all field operands live in fixed 32-byte slots (8 LE limbs,
  Montgomery form x*2^256 mod M); callers copy operands into FA/FB and
  read FO (inline 16-instr copies)
  subroutines clobber x3-x8, x28-x31 and the fe slots; loop state lives
  in fixed memory words
"""
from __future__ import annotations

from typing import Dict, List

# -- memory map ---------------------------------------------------------------

STACK_TOP = 0x0F00
# modulus descriptor: M (32B) | mprime = -M^-1 mod 2^32 (4B) | mont(1)
# (32B @ +64) | R^2 mod M (32B @ +96)
DESC_P = 0x1000
DESC_N = 0x1080
DESC_BN = 0x1100
T512 = 0x1180  # CIOS accumulator, 10 limbs
FA, FB, FO = 0x1200, 0x1220, 0x1240  # fe_mulmod/addmod/submod operands
MB, ME, MO = 0x1260, 0x1280, 0x12A0  # modpow base/exponent/out
MP_I = 0x12C0  # modpow bit counter
ONE_RAW = 0x12E0  # the constant 1 (raw form; from-Montgomery conversions)
ONE_RAW_SLOT = ONE_RAW
ACCX, ACCY, ACCZ, ACC_INF = 0x1300, 0x1320, 0x1340, 0x1360
QX, QY, QZ = 0x1380, 0x13A0, 0x13C0
# point temps
PT_T = 0x1400  # 12 slots x 32B through 0x1580
OUT = 0x1900

_P_SECP = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
_N_SECP = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
_P_BN254 = 21888242871839275222246405745257275088696311157297823662689037894645226208583


def limbs(v: int, n: int = 8) -> List[int]:
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(n)]


def from_limbs(ls) -> int:
    out = 0
    for i, l in enumerate(ls):
        out |= int(l) << (32 * i)
    return out


def desc_mem(addr: int, m: int) -> Dict[int, int]:
    """Modulus descriptor memory image (Montgomery parameters)."""
    R = 1 << 256
    mem = {}
    for i, l in enumerate(limbs(m)):
        mem[addr + 4 * i] = l
    mem[addr + 32] = (-pow(m, -1, 1 << 32)) % (1 << 32)
    for i, l in enumerate(limbs(R % m)):
        mem[addr + 64 + 4 * i] = l
    for i, l in enumerate(limbs(R * R % m)):
        mem[addr + 96 + 4 * i] = l
    mem[ONE_RAW] = 1
    for i in range(1, 8):
        mem[ONE_RAW + 4 * i] = 0
    return mem


def to_mont(x: int, m: int) -> int:
    return x * (1 << 256) % m


def from_mont(x: int, m: int) -> int:
    return x * pow(1 << 256, m - 2, m) % m


def fe_mem(addr: int, v: int) -> Dict[int, int]:
    return {addr + 4 * i: l for i, l in enumerate(limbs(v))}


class Asm:
    """Instruction-list builder with label generation."""

    def __init__(self):
        self.lines: List = []
        self._uniq = 0

    def l(self, *ins):
        self.lines.append(tuple(ins))

    def label(self, name: str):
        self.lines.append(name + ":")

    def fresh(self, base: str) -> str:
        self._uniq += 1
        return f"{base}_{self._uniq}"

    # -- macros (inline) ------------------------------------------------------

    def li(self, rd: int, v: int):
        self.l("lui", rd, 0, 0, v % (1 << 32))

    def copy32(self, dst: int, src: int, t: int = 3):
        """32-byte copy between absolute addresses."""
        for i in range(8):
            self.l("lw", t, 0, 0, src + 4 * i)
            self.l("sw", 0, 0, t, dst + 4 * i)

    def push(self, reg: int):
        self.l("addi", 2, 2, 0, -4)
        self.l("sw", 0, 2, reg, 0)

    def pop(self, reg: int):
        self.l("lw", reg, 2, 0, 0)
        self.l("addi", 2, 2, 0, 4)

    def call(self, target: str):
        self.l("jal", 1, 0, 0, target)

    def ret(self):
        self.l("jalr", 31, 1, 0, 0)

    def store_imm(self, addr: int, v: int, t: int = 3):
        self.li(t, v)
        self.l("sw", 0, 0, t, addr)


# -- subroutine bodies --------------------------------------------------------


def emit_fe_mulmod(a: Asm):
    """[FO] = mont_mul([FA], [FB]) mod [x19] — Montgomery CIOS, word
    size 32, 8 limbs.  Works for any odd modulus (secp p/n, BN254).
    Operands and result are in Montgomery form (x*R mod M, R = 2^256)."""
    a.label("fe_mulmod")

    def addmul_loop(src_reg: int, base_addr, base_is_desc: bool):
        """t[0..8] += src_reg * OPERAND; returns with carry chain done,
        carry folded into t[8], overflow bit added into t[9]."""
        a.l("addi", 8, 0, 0, 0)  # carry
        for j in range(8):
            if base_is_desc:
                a.l("lw", 6, 19, 0, 4 * j)
            else:
                a.l("lw", 6, 0, 0, base_addr + 4 * j)
            a.l("mul", 7, src_reg, 6)  # lo
            a.l("mulhu", 6, src_reg, 6)  # hi
            a.l("lw", 4, 0, 0, T512 + 4 * j)
            a.l("add", 3, 4, 7)
            a.l("sltu", 4, 3, 7)  # c1
            a.l("add", 28, 3, 8)
            a.l("sltu", 3, 28, 8)  # c2
            a.l("sw", 0, 0, 28, T512 + 4 * j)
            a.l("add", 8, 6, 4)  # hi + c1 + c2 (never wraps; see mul bound)
            a.l("add", 8, 8, 3)
        # t[8] += carry, overflow into t[9]
        a.l("lw", 4, 0, 0, T512 + 32)
        a.l("add", 7, 4, 8)
        a.l("sltu", 6, 7, 8)
        a.l("sw", 0, 0, 7, T512 + 32)
        a.l("lw", 4, 0, 0, T512 + 36)
        a.l("add", 4, 4, 6)
        a.l("sw", 0, 0, 4, T512 + 36)

    for i in range(10):
        a.l("sw", 0, 0, 0, T512 + 4 * i)
    for i in range(8):
        a.l("lw", 5, 0, 0, FA + 4 * i)  # a_i
        addmul_loop(5, FB, base_is_desc=False)
        # m = t[0] * mprime mod 2^32 (keep in x9; loops preserve it)
        a.l("lw", 4, 0, 0, T512)
        a.l("lw", 6, 19, 0, 32)
        a.l("mul", 9, 4, 6)
        addmul_loop(9, None, base_is_desc=True)
        # shift: t[0..8] = t[1..9], t[9] = 0  (t[0] is 0 after m*M)
        for j in range(9):
            a.l("lw", 4, 0, 0, T512 + 4 * (j + 1))
            a.l("sw", 0, 0, 4, T512 + 4 * j)
        a.l("sw", 0, 0, 0, T512 + 36)
    # final: t < 2M; subtract M if t[8] == 1 or t[0..8) >= M
    commit = a.fresh("cm_commit")
    skip = a.fresh("cm_skip")
    a.l("addi", 28, 0, 0, 0)  # borrow
    for i in range(8):
        a.l("lw", 3, 0, 0, T512 + 4 * i)
        a.l("lw", 4, 19, 0, 4 * i)
        a.l("sub", 5, 3, 4)
        a.l("sltu", 6, 3, 4)
        a.l("sub", 7, 5, 28)
        a.l("sltu", 3, 5, 28)
        a.l("sw", 0, 0, 7, FO + 4 * i)  # stash t - M in FO
        a.l("add", 28, 6, 3)
    a.l("lw", 4, 0, 0, T512 + 32)  # overflow limb
    a.l("bne", 0, 4, 0, skip)  # t >= 2^256 > M: keep t - M
    a.l("beq", 0, 28, 0, skip)  # no borrow: t >= M: keep t - M
    a.copy32(FO, T512)  # t < M: result is t itself
    a.label(skip)
    a.ret()


def emit_modpow(a: Asm):
    """[MO] = [MB] ^ [ME] mod [x19] (256-bit square-and-multiply)."""
    a.label("modpow")
    a.push(1)
    loop = a.fresh("mp_loop")
    nomul = a.fresh("mp_nomul")
    done = a.fresh("mp_done")
    # MO = mont(1) from the descriptor (+64)
    for i in range(8):
        a.l("lw", 3, 19, 0, 64 + 4 * i)
        a.l("sw", 0, 0, 3, MO + 4 * i)
    a.store_imm(MP_I, 255)
    a.label(loop)
    # square: FA = FB = MO; MO = FO
    a.copy32(FA, MO)
    a.copy32(FB, MO)
    a.call("fe_mulmod")
    a.copy32(MO, FO)
    # bit i of ME
    a.l("lw", 9, 0, 0, MP_I)
    a.l("srli", 10, 9, 0, 5)  # limb index
    a.l("slli", 10, 10, 0, 2)
    a.li(11, ME)
    a.l("add", 10, 10, 11)
    a.l("lw", 11, 10, 0, 0)  # limb
    a.l("andi", 12, 9, 0, 31)
    a.l("srl", 11, 11, 12)
    a.l("andi", 11, 11, 0, 1)
    a.l("beq", 0, 11, 0, nomul)
    a.copy32(FA, MO)
    a.copy32(FB, MB)
    a.call("fe_mulmod")
    a.copy32(MO, FO)
    a.label(nomul)
    a.l("lw", 9, 0, 0, MP_I)
    a.l("beq", 0, 9, 0, done)
    a.l("addi", 9, 9, 0, -1)
    a.l("sw", 0, 0, 9, MP_I)
    a.l("jal", 30, 0, 0, loop)
    a.label(done)
    a.pop(1)
    a.ret()


def emit_fe_addmod(a: Asm):
    """[FO] = [FA] + [FB] mod [x19] (inputs canonical/Montgomery alike —
    addition is linear).  Sum < 2M: one conditional subtract."""
    a.label("fe_addmod")
    skip = a.fresh("fa_skip")
    a.l("addi", 8, 0, 0, 0)  # carry
    for i in range(8):
        a.l("lw", 3, 0, 0, FA + 4 * i)
        a.l("lw", 4, 0, 0, FB + 4 * i)
        a.l("add", 5, 3, 4)
        a.l("sltu", 6, 5, 4)
        a.l("add", 7, 5, 8)
        a.l("sltu", 3, 7, 8)
        a.l("sw", 0, 0, 7, T512 + 4 * i)
        a.l("add", 8, 6, 3)
    # x8 = carry-out bit; subtract M if carry or sum >= M
    a.l("addi", 28, 0, 0, 0)  # borrow
    for i in range(8):
        a.l("lw", 3, 0, 0, T512 + 4 * i)
        a.l("lw", 4, 19, 0, 4 * i)
        a.l("sub", 5, 3, 4)
        a.l("sltu", 6, 3, 4)
        a.l("sub", 7, 5, 28)
        a.l("sltu", 3, 5, 28)
        a.l("sw", 0, 0, 7, FO + 4 * i)
        a.l("add", 28, 6, 3)
    a.l("bne", 0, 8, 0, skip)  # carried past 2^256: keep sum - M
    a.l("beq", 0, 28, 0, skip)  # no borrow: sum >= M: keep sum - M
    a.copy32(FO, T512)  # sum < M: keep the sum
    a.label(skip)
    a.ret()


def emit_fe_submod(a: Asm):
    """[FO] = [FA] - [FB] mod [x19]."""
    a.label("fe_submod")
    lbl = a.fresh("fesub_nb")
    a.l("addi", 28, 0, 0, 0)
    for i in range(8):
        a.l("lw", 3, 0, 0, FA + 4 * i)
        a.l("lw", 4, 0, 0, FB + 4 * i)
        a.l("sub", 5, 3, 4)
        a.l("sltu", 6, 3, 4)
        a.l("sub", 7, 5, 28)
        a.l("sltu", 3, 5, 28)
        a.l("sw", 0, 0, 7, FO + 4 * i)
        a.l("add", 28, 6, 3)
    a.l("beq", 0, 28, 0, lbl)  # no borrow: done
    a.l("addi", 8, 0, 0, 0)  # borrowed: add M back
    for i in range(8):
        a.l("lw", 3, 0, 0, FO + 4 * i)
        a.l("lw", 4, 19, 0, 4 * i)
        a.l("add", 5, 3, 4)
        a.l("sltu", 6, 5, 4)
        a.l("add", 7, 5, 8)
        a.l("sltu", 3, 7, 8)
        a.l("sw", 0, 0, 7, FO + 4 * i)
        a.l("add", 8, 6, 3)
    a.label(lbl)
    a.ret()


def emit_field_lib(a: Asm):
    emit_fe_mulmod(a)
    emit_fe_addmod(a)
    emit_fe_submod(a)
    emit_modpow(a)


# -- field macro helpers (caller side) ---------------------------------------


def fe_mul(a: Asm, out: int, x: int, y: int):
    a.copy32(FA, x)
    a.copy32(FB, y)
    a.call("fe_mulmod")
    a.copy32(out, FO)


def fe_add(a: Asm, out: int, x: int, y: int):
    a.copy32(FA, x)
    a.copy32(FB, y)
    a.call("fe_addmod")
    a.copy32(out, FO)


def fe_sub(a: Asm, out: int, x: int, y: int):
    a.copy32(FA, x)
    a.copy32(FB, y)
    a.call("fe_submod")
    a.copy32(out, FO)


# -- secp256k1 Jacobian point ops (modulus descriptor DESC_P in x19) ----------

# temps
T_A, T_B, T_C, T_D, T_E, T_F, T_G, T_H, T_I, T_J, T_K = [
    PT_T + 32 * i for i in range(11)
]


def emit_pt_dbl(a: Asm):
    """(ACCX, ACCY, ACCZ) <- double (dbl-2009-l, a=0); ∞ stays ∞ (Z=0
    squares to Z3=0 ... Z3 = 2*Y*Z = 0 ✓)."""
    a.label("pt_dbl")
    a.push(1)
    fe_mul(a, T_A, ACCX, ACCX)  # A = X^2
    fe_mul(a, T_B, ACCY, ACCY)  # B = Y^2
    fe_mul(a, T_C, T_B, T_B)  # C = B^2
    fe_add(a, T_D, ACCX, T_B)  # X+B
    fe_mul(a, T_D, T_D, T_D)  # (X+B)^2
    fe_sub(a, T_D, T_D, T_A)
    fe_sub(a, T_D, T_D, T_C)
    fe_add(a, T_D, T_D, T_D)  # D = 2((X+B)^2 - A - C)
    fe_add(a, T_E, T_A, T_A)
    fe_add(a, T_E, T_E, T_A)  # E = 3A
    fe_mul(a, T_F, T_E, T_E)  # F = E^2
    fe_sub(a, T_F, T_F, T_D)
    fe_sub(a, T_G, T_F, T_D)  # X3 = F - 2D  (in T_G)
    fe_sub(a, T_H, T_D, T_G)  # D - X3
    fe_mul(a, T_H, T_E, T_H)  # E(D-X3)
    fe_add(a, T_I, T_C, T_C)
    fe_add(a, T_I, T_I, T_I)
    fe_add(a, T_I, T_I, T_I)  # 8C
    fe_sub(a, T_H, T_H, T_I)  # Y3
    fe_mul(a, T_I, ACCY, ACCZ)
    fe_add(a, T_I, T_I, T_I)  # Z3 = 2YZ
    a.copy32(ACCX, T_G)
    a.copy32(ACCY, T_H)
    a.copy32(ACCZ, T_I)
    a.pop(1)
    a.ret()


def emit_pt_add(a: Asm):
    """ACC <- ACC + Q (add-2007-bl, full Jacobian; assumes ACC != ±Q).
    If ACC is ∞ (ACC_INF flag), ACC = Q."""
    a.label("pt_add")
    a.push(1)
    not_inf = a.fresh("pa_ni")
    done = a.fresh("pa_done")
    a.l("lw", 3, 0, 0, ACC_INF)
    a.l("beq", 0, 3, 0, not_inf)
    a.copy32(ACCX, QX)
    a.copy32(ACCY, QY)
    a.copy32(ACCZ, QZ)
    a.l("sw", 0, 0, 0, ACC_INF)
    a.l("jal", 30, 0, 0, done)
    a.label(not_inf)
    fe_mul(a, T_A, ACCZ, ACCZ)  # Z1Z1
    fe_mul(a, T_B, QZ, QZ)  # Z2Z2
    fe_mul(a, T_C, ACCX, T_B)  # U1 = X1*Z2Z2
    fe_mul(a, T_D, QX, T_A)  # U2 = X2*Z1Z1
    fe_mul(a, T_E, QZ, T_B)  # Z2^3
    fe_mul(a, T_E, ACCY, T_E)  # S1 = Y1*Z2^3
    fe_mul(a, T_F, ACCZ, T_A)  # Z1^3
    fe_mul(a, T_F, QY, T_F)  # S2 = Y2*Z1^3
    fe_sub(a, T_G, T_D, T_C)  # H = U2-U1
    fe_add(a, T_H, T_G, T_G)  # 2H
    fe_mul(a, T_H, T_H, T_H)  # I = (2H)^2
    fe_mul(a, T_I, T_G, T_H)  # J = H*I
    fe_sub(a, T_J, T_F, T_E)
    fe_add(a, T_J, T_J, T_J)  # r = 2(S2-S1)
    fe_mul(a, T_K, T_C, T_H)  # V = U1*I
    # X3 = r^2 - J - 2V
    fe_mul(a, T_H, T_J, T_J)
    fe_sub(a, T_H, T_H, T_I)
    fe_sub(a, T_H, T_H, T_K)
    fe_sub(a, T_H, T_H, T_K)  # X3 in T_H
    # Y3 = r*(V-X3) - 2*S1*J
    fe_sub(a, T_K, T_K, T_H)  # V - X3
    fe_mul(a, T_K, T_J, T_K)
    fe_mul(a, T_I, T_E, T_I)  # S1*J
    fe_add(a, T_I, T_I, T_I)
    fe_sub(a, T_K, T_K, T_I)  # Y3 in T_K
    # Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2)*H
    fe_add(a, T_I, ACCZ, QZ)
    fe_mul(a, T_I, T_I, T_I)
    fe_sub(a, T_I, T_I, T_A)
    fe_sub(a, T_I, T_I, T_B)
    fe_mul(a, T_I, T_I, T_G)  # Z3 in T_I
    a.copy32(ACCX, T_H)
    a.copy32(ACCY, T_K)
    a.copy32(ACCZ, T_I)
    a.label(done)
    a.pop(1)
    a.ret()


# -- python reference side ----------------------------------------------------


def py_modinv(x: int, m: int) -> int:
    return pow(x, m - 2, m)


class PyCurve:
    """Affine secp256k1 reference (python ground truth for check())."""

    def __init__(self, p=_P_SECP, n=_N_SECP):
        self.p, self.n = p, n
        self.G = (
            0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
            0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
        )

    def add(self, P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        p = self.p
        if P[0] == Q[0]:
            if (P[1] + Q[1]) % p == 0:
                return None
            lam = (3 * P[0] * P[0]) * py_modinv(2 * P[1], p) % p
        else:
            lam = (Q[1] - P[1]) * py_modinv(Q[0] - P[0], p) % p
        x = (lam * lam - P[0] - Q[0]) % p
        y = (lam * (P[0] - x) - P[1]) % p
        return (x, y)

    def mul(self, k, P):
        R = None
        while k:
            if k & 1:
                R = self.add(R, P)
            P = self.add(P, P)
            k >>= 1
        return R

    def sign(self, z: int, d: int, k: int):
        R = self.mul(k, self.G)
        r = R[0] % self.n
        s = py_modinv(k, self.n) * (z + r * d) % self.n
        return r, s, R[1] & 1  # recid parity of R.y

    def recover(self, z: int, r: int, s: int, parity: int):
        p, n = self.p, self.n
        y2 = (pow(r, 3, p) + 7) % p
        y = pow(y2, (p + 1) // 4, p)
        if y & 1 != parity:
            y = p - y
        Rp = (r, y)
        r_inv = py_modinv(r, n)
        u1 = (-z * r_inv) % n
        u2 = (s * r_inv) % n
        return self.add(self.mul(u1, self.G), self.mul(u2, Rp))
