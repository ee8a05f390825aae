"""Guest workloads, counterparts of the reference's guest programs
(/root/reference/openvm-riscv/guest-sha256, guest-matmul, guest-u256):
written against our assembler since no RISC-V cross-compiler exists in
this environment.  Each returns (program, initial_mem, check_fn)."""
from __future__ import annotations

import hashlib
import struct
from typing import Callable, Dict, List, Tuple

from .executor import assemble
from .isa import Instruction

# memory map
SHA_IN = 0x100  # 64-byte input block
SHA_W = 0x200  # message schedule (64 words)
SHA_OUT = 0x300  # 8-word digest
SHA_K = 0x600  # round-constant table

_K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]
_H0 = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A, 0x510E527F, 0x9B05688C,
       0x1F83D9AB, 0x5BE0CD19]


def _ror(L, dst, src, n, t1=1, t2=2):
    """dst = ror(src, n) using t1/t2 as scratch (t2 may equal dst)."""
    L.append(("srli", t1, src, 0, n))
    L.append(("slli", dst, src, 0, (32 - n) % 32))
    L.append(("or", dst, dst, t1))


def sha256_guest() -> Tuple[List[Instruction], Dict[int, int], Callable]:
    """One SHA-256 compression of the padded block for message "abc"."""
    msg = b"abc"
    padded = msg + b"\x80" + b"\x00" * (55 - len(msg)) + struct.pack(">Q", len(msg) * 8)
    words = struct.unpack(">16I", padded)
    mem = {SHA_IN + 4 * i: w for i, w in enumerate(words)}

    # K constants live in memory so the round loop can walk them
    for i, k in enumerate(_K):
        mem[SHA_K + 4 * i] = k

    L: List = []
    # copy input into schedule (loop: x19 walks SHA_IN, x18 = end)
    L.append(("lui", 19, 0, 0, SHA_IN))
    L.append(("lui", 18, 0, 0, SHA_IN + 64))
    L.append("copy:")
    L.append(("lw", 3, 19, 0, 0))
    L.append(("sw", 0, 19, 3, SHA_W - SHA_IN))
    L.append(("addi", 19, 19, 0, 4))
    L.append(("bne", 0, 19, 18, "copy"))
    # extend w[16..64] (x19 walks SHA_W+64 .. SHA_W+256)
    L.append(("lui", 19, 0, 0, SHA_W + 64))
    L.append(("lui", 18, 0, 0, SHA_W + 256))
    L.append("extend:")
    L.append(("lw", 3, 19, 0, -60))  # w[i-15]
    _ror(L, 4, 3, 7)
    _ror(L, 5, 3, 18)
    L.append(("srli", 6, 3, 0, 3))
    L.append(("xor", 4, 4, 5))
    L.append(("xor", 4, 4, 6))  # s0
    L.append(("lw", 3, 19, 0, -8))  # w[i-2]
    _ror(L, 5, 3, 17)
    _ror(L, 6, 3, 19)
    L.append(("srli", 7, 3, 0, 10))
    L.append(("xor", 5, 5, 6))
    L.append(("xor", 5, 5, 7))  # s1
    L.append(("lw", 3, 19, 0, -64))  # w[i-16]
    L.append(("add", 3, 3, 4))
    L.append(("lw", 6, 19, 0, -28))  # w[i-7]
    L.append(("add", 3, 3, 6))
    L.append(("add", 3, 3, 5))
    L.append(("sw", 0, 19, 3, 0))
    L.append(("addi", 19, 19, 0, 4))
    L.append(("bne", 0, 19, 18, "extend"))
    # init state a..h = x8..x15
    for j, h in enumerate(_H0):
        L.append(("lui", 8 + j, 0, 0, h))
    # rounds (x19 walks SHA_K, w at fixed offset SHA_W - SHA_K from it)
    L.append(("lui", 19, 0, 0, SHA_K))
    L.append(("lui", 18, 0, 0, SHA_K + 256))
    L.append("rounds:")
    e = 12
    _ror(L, 1, e, 6, t1=2)
    _ror(L, 3, e, 11, t1=2)
    L.append(("xor", 1, 1, 3))
    _ror(L, 3, e, 25, t1=2)
    L.append(("xor", 1, 1, 3))  # S1 -> x1
    L.append(("xor", 2, 13, 14))
    L.append(("and", 2, 12, 2))
    L.append(("xor", 2, 2, 14))  # ch -> x2
    L.append(("add", 1, 1, 2))
    L.append(("add", 1, 1, 15))  # + h
    L.append(("lw", 2, 19, 0, 0))  # K[i]
    L.append(("add", 1, 1, 2))
    L.append(("lw", 2, 19, 0, SHA_W - SHA_K))  # w[i]
    L.append(("add", 1, 1, 2))  # temp1 -> x1
    a = 8
    _ror(L, 2, a, 2, t1=3)
    _ror(L, 4, a, 13, t1=3)
    L.append(("xor", 2, 2, 4))
    _ror(L, 4, a, 22, t1=3)
    L.append(("xor", 2, 2, 4))  # S0 -> x2
    L.append(("and", 3, 9, 10))
    L.append(("or", 4, 9, 10))
    L.append(("and", 4, 8, 4))
    L.append(("or", 3, 3, 4))  # maj -> x3
    L.append(("add", 2, 2, 3))  # temp2 -> x2
    L.append(("addi", 15, 14, 0, 0))  # h = g
    L.append(("addi", 14, 13, 0, 0))  # g = f
    L.append(("addi", 13, 12, 0, 0))  # f = e
    L.append(("add", 12, 11, 1))  # e = d + t1
    L.append(("addi", 11, 10, 0, 0))  # d = c
    L.append(("addi", 10, 9, 0, 0))  # c = b
    L.append(("addi", 9, 8, 0, 0))  # b = a
    L.append(("add", 8, 1, 2))  # a = t1 + t2
    L.append(("addi", 19, 19, 0, 4))
    L.append(("bne", 0, 19, 18, "rounds"))
    # output digest
    for j, h in enumerate(_H0):
        L.append(("lui", 1, 0, 0, h))
        L.append(("add", 1, 1, 8 + j))
        L.append(("sw", 0, 0, 1, SHA_OUT + 4 * j))
    L.append(("halt",))

    expect = hashlib.sha256(msg).digest()
    expect_words = struct.unpack(">8I", expect)

    def check(result):
        got = [result.final_mem[(2, SHA_OUT + 4 * j)][1] for j in range(8)]
        assert tuple(got) == expect_words, (got, expect_words)

    return assemble(L), mem, check


MM_A, MM_B, MM_C = 0x400, 0x440, 0x480


def matmul_guest(n: int = 4):
    """n x n int32 matrix multiply (guest-matmul counterpart)."""
    import numpy as np

    rng = np.random.default_rng(7)
    A = rng.integers(0, 1 << 15, size=(n, n), dtype=np.int64)
    B = rng.integers(0, 1 << 15, size=(n, n), dtype=np.int64)
    C = (A @ B) & 0xFFFFFFFF
    mem = {}
    for i in range(n):
        for j in range(n):
            mem[MM_A + 4 * (n * i + j)] = int(A[i, j])
            mem[MM_B + 4 * (n * i + j)] = int(B[i, j])
    L: List = []
    for i in range(n):
        for j in range(n):
            L.append(("addi", 3, 0, 0, 0))
            for k in range(n):
                L.append(("lw", 1, 0, 0, MM_A + 4 * (n * i + k)))
                L.append(("lw", 2, 0, 0, MM_B + 4 * (n * k + j)))
                L.append(("mul", 1, 1, 2))
                L.append(("add", 3, 3, 1))
            L.append(("sw", 0, 0, 3, MM_C + 4 * (n * i + j)))
    L.append(("halt",))

    def check(result):
        for i in range(n):
            for j in range(n):
                got = result.final_mem[(2, MM_C + 4 * (n * i + j))][1]
                assert got == int(C[i, j])

    return assemble(L), mem, check


U_A, U_B, U_S = 0x500, 0x520, 0x540


def u256_add_guest():
    """256-bit addition with limb carries (guest-u256 counterpart)."""
    a = 0xFEDCBA9876543210FEDCBA9876543210FFFFFFFFFFFFFFFF0123456789ABCDEF
    b = 0x0123456789ABCDEF0123456789ABCDEF00000000000000010123456789ABCDEF
    mem = {}
    for i in range(8):
        mem[U_A + 4 * i] = (a >> (32 * i)) & 0xFFFFFFFF
        mem[U_B + 4 * i] = (b >> (32 * i)) & 0xFFFFFFFF
    L: List = []
    L.append(("addi", 5, 0, 0, 0))  # carry
    for i in range(8):
        L.append(("lw", 1, 0, 0, U_A + 4 * i))
        L.append(("lw", 2, 0, 0, U_B + 4 * i))
        L.append(("add", 3, 1, 2))
        L.append(("sltu", 4, 3, 1))  # c1 = s < a
        L.append(("addi", 7, 3, 0, 0))
        L.append(("add", 3, 7, 5))
        L.append(("sltu", 6, 3, 7))  # c2 = wrapped adding carry
        L.append(("or", 5, 4, 6))
        L.append(("sw", 0, 0, 3, U_S + 4 * i))
    L.append(("halt",))
    s = (a + b) & ((1 << 256) - 1)

    def check(result):
        got = 0
        for i in range(8):
            got |= result.final_mem[(2, U_S + 4 * i)][1] << (32 * i)
        assert got == s, (hex(got), hex(s))

    return assemble(L), mem, check


# -- keccak-f[1600] -----------------------------------------------------------

KC_A = 0x800  # state: 25 lanes x (lo, hi) words
KC_B = 0xC00  # rho/pi scratch
KC_C = 0xB00  # theta column parity scratch
KC_RC = 0xA00  # round constants (24 x 2 words)

_KECCAK_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_RHO = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def py_keccak_f(state):
    """Reference keccak-f[1600] on a 25-int list (python ground truth)."""
    A = list(state)
    M = (1 << 64) - 1

    def rot(v, n):
        n %= 64
        return ((v << n) | (v >> (64 - n))) & M

    for rc in _KECCAK_RC:
        C = [A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20] for x in range(5)]
        D = [C[(x - 1) % 5] ^ rot(C[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                A[x + 5 * y] ^= D[x]
        B = [0] * 25
        for x in range(5):
            for y in range(5):
                B[y + 5 * ((2 * x + 3 * y) % 5)] = rot(A[x + 5 * y], _RHO[x][y])
        for x in range(5):
            for y in range(5):
                A[x + 5 * y] = B[x + 5 * y] ^ ((~B[(x + 1) % 5 + 5 * y]) & B[(x + 2) % 5 + 5 * y])
        A[0] ^= rc
    return A


def _lane(base, i):
    return base + 8 * i


def _load64(L, lo_reg, hi_reg, addr):
    L.append(("lw", lo_reg, 0, 0, addr))
    L.append(("lw", hi_reg, 0, 0, addr + 4))


def _store64(L, lo_reg, hi_reg, addr):
    L.append(("sw", 0, 0, lo_reg, addr))
    L.append(("sw", 0, 0, hi_reg, addr + 4))


def _xor64(L, dl, dh, sl, sh):
    L.append(("xor", dl, dl, sl))
    L.append(("xor", dh, dh, sh))


def _rot64(L, lo, hi, n, t1, t2):
    """(lo, hi) <- rotl64 by constant n, clobbering t1/t2."""
    n %= 64
    if n == 0:
        return
    if n >= 32:
        L.append(("addi", t1, lo, 0, 0))
        L.append(("addi", lo, hi, 0, 0))
        L.append(("addi", hi, t1, 0, 0))
        n -= 32
        if n == 0:
            return
    # 0 < n < 32
    L.append(("srli", t1, hi, 0, 32 - n))
    L.append(("srli", t2, lo, 0, 32 - n))
    L.append(("slli", lo, lo, 0, n))
    L.append(("slli", hi, hi, 0, n))
    L.append(("or", lo, lo, t1))
    L.append(("or", hi, hi, t2))


def _emit_keccak_f(L, round_label: str):
    """Emit the 24-round keccak-f[1600] loop over the state at KC_A,
    walking the RC table at KC_RC (x20 = RC pointer, x21 = end,
    clobbers x1-x4)."""
    L.append(("lui", 20, 0, 0, KC_RC))
    L.append(("lui", 21, 0, 0, KC_RC + 8 * 24))
    L.append(round_label + ":")
    # theta: C[x] = A[x] ^ A[x+5] ^ ... ^ A[x+20]
    for x in range(5):
        _load64(L, 1, 2, _lane(KC_A, x))
        for y in range(1, 5):
            _load64(L, 3, 4, _lane(KC_A, x + 5 * y))
            _xor64(L, 1, 2, 3, 4)
        _store64(L, 1, 2, _lane(KC_C, x))
    # D[x] = C[x-1] ^ rot(C[x+1], 1); A[x+5y] ^= D[x]
    for x in range(5):
        _load64(L, 1, 2, _lane(KC_C, (x + 1) % 5))
        _rot64(L, 1, 2, 1, 3, 4)
        _load64(L, 3, 4, _lane(KC_C, (x - 1) % 5))
        _xor64(L, 1, 2, 3, 4)  # D in (1,2)
        for y in range(5):
            _load64(L, 3, 4, _lane(KC_A, x + 5 * y))
            _xor64(L, 3, 4, 1, 2)
            _store64(L, 3, 4, _lane(KC_A, x + 5 * y))
    # rho + pi: B[y + 5((2x+3y)%5)] = rot(A[x+5y], RHO[x][y])
    for x in range(5):
        for y in range(5):
            _load64(L, 1, 2, _lane(KC_A, x + 5 * y))
            _rot64(L, 1, 2, _RHO[x][y], 3, 4)
            _store64(L, 1, 2, _lane(KC_B, y + 5 * ((2 * x + 3 * y) % 5)))
    # chi: A[x+5y] = B[x] ^ (~B[x+1] & B[x+2])  (row-wise)
    for y in range(5):
        for x in range(5):
            _load64(L, 1, 2, _lane(KC_B, (x + 1) % 5 + 5 * y))
            L.append(("xori", 1, 1, 0, 0xFFFFFFFF))
            L.append(("xori", 2, 2, 0, 0xFFFFFFFF))
            _load64(L, 3, 4, _lane(KC_B, (x + 2) % 5 + 5 * y))
            L.append(("and", 1, 1, 3))
            L.append(("and", 2, 2, 4))
            _load64(L, 3, 4, _lane(KC_B, x + 5 * y))
            _xor64(L, 1, 2, 3, 4)
            _store64(L, 1, 2, _lane(KC_A, x + 5 * y))
    # iota: A[0] ^= RC[r]
    L.append(("lw", 1, 20, 0, 0))
    L.append(("lw", 2, 20, 0, 4))
    _load64(L, 3, 4, _lane(KC_A, 0))
    _xor64(L, 3, 4, 1, 2)
    _store64(L, 3, 4, _lane(KC_A, 0))
    L.append(("addi", 20, 20, 0, 8))
    L.append(("bne", 0, 20, 21, round_label))


def _keccak_rc_mem() -> Dict[int, int]:
    mem = {}
    for r, rc in enumerate(_KECCAK_RC):
        mem[KC_RC + 8 * r] = rc & 0xFFFFFFFF
        mem[KC_RC + 8 * r + 4] = rc >> 32
    return mem


def keccak_f_guest(seed: int = 42):
    """One keccak-f[1600] permutation.

    State lanes as (lo, hi) 32-bit word pairs in RAM; theta/rho-pi/chi
    fully unrolled inside a 24-iteration round loop walking the RC table."""
    import random

    rnd = random.Random(seed)
    state = [rnd.getrandbits(64) for _ in range(25)]
    expect = py_keccak_f(state)

    mem = _keccak_rc_mem()
    for i, v in enumerate(state):
        mem[_lane(KC_A, i)] = v & 0xFFFFFFFF
        mem[_lane(KC_A, i) + 4] = v >> 32

    L: List = []
    _emit_keccak_f(L, "round")
    L.append(("halt",))

    def check(result):
        for i in range(25):
            lo = result.final_mem[(2, _lane(KC_A, i))][1]
            hi = result.final_mem[(2, _lane(KC_A, i) + 4)][1]
            got = lo | (hi << 32)
            assert got == expect[i], (i, hex(got), hex(expect[i]))

    return assemble(L), mem, check


KC_OUT = 0x900  # chained-keccak256 32-byte output buffer (4 lanes)


def py_keccak256_32(data32: bytes) -> bytes:
    """keccak-256 of a 32-byte message (single-block absorb: rate 136,
    pad 0x01 at byte 32, 0x80 at byte 135; squeeze 32 bytes)."""
    lanes = [0] * 25
    for i in range(4):
        lanes[i] = int.from_bytes(data32[8 * i : 8 * i + 8], "little")
    lanes[4] ^= 0x01
    lanes[16] ^= 0x8000000000000000
    out = py_keccak_f(lanes)
    return b"".join(int(out[i]).to_bytes(8, "little") for i in range(4))


def keccak_guest(n: int = 8):
    """Chained keccak256 over a 32-byte state — the reference guest's
    semantics (/root/reference/openvm-riscv/guest-keccak/src/main.rs:11-21:
    output = keccak256(output) repeated n times, starting from zeros; the
    tiny_keccak Keccak::v256 path).  Each iteration zeroes the sponge
    state, absorbs the 32-byte buffer with keccak padding, runs
    keccak-f[1600], and squeezes the first four lanes back to the buffer."""
    expect = bytes(32)
    for _ in range(n):
        expect = py_keccak256_32(expect)

    mem = _keccak_rc_mem()
    for i in range(8):
        mem[KC_OUT + 4 * i] = 0  # output buffer starts as 32 zero bytes

    L: List = []
    # x22 = iteration counter, x23 = n
    L.append(("addi", 22, 0, 0, 0))
    L.append(("lui", 23, 0, 0, n))
    L.append("iter:")
    # zero the 25-lane state
    for i in range(25):
        L.append(("sw", 0, 0, 0, _lane(KC_A, i)))
        L.append(("sw", 0, 0, 0, _lane(KC_A, i) + 4))
    # absorb the 32-byte buffer into lanes 0..3 (state is zero: copy)
    for i in range(4):
        _load64(L, 1, 2, KC_OUT + 8 * i)
        _store64(L, 1, 2, _lane(KC_A, i))
    # keccak padding for a 32-byte message at rate 136
    L.append(("addi", 1, 0, 0, 1))
    L.append(("sw", 0, 0, 1, _lane(KC_A, 4)))
    L.append(("lui", 1, 0, 0, 0x80000000))
    L.append(("sw", 0, 0, 1, _lane(KC_A, 16) + 4))
    _emit_keccak_f(L, "round")
    # squeeze lanes 0..3 back into the buffer
    for i in range(4):
        _load64(L, 1, 2, _lane(KC_A, i))
        _store64(L, 1, 2, KC_OUT + 8 * i)
    L.append(("addi", 22, 22, 0, 1))
    L.append(("bne", 0, 22, 23, "iter"))
    L.append(("halt",))

    def check(result):
        got = b""
        for i in range(8):
            got += int(result.final_mem[(2, KC_OUT + 4 * i)][1]).to_bytes(4, "little")
        assert got == expect, (got.hex(), expect.hex())

    return assemble(L), mem, check


# -- ecrecover (secp256k1 public-key recovery) --------------------------------
# Counterpart of /root/reference/openvm-riscv/guest-ecrecover: full
# secp256k1 recovery Q = r^{-1}(sR - zG) via Shamir double-and-add,
# running on the macro-assembled 256-bit field library (vm/asmlib.py).
# ~6M instructions — exercises segmentation + the bus-heavy byte chips.

_EC = 0x1500  # guest constant/variable block (see asmlib memory map)
EC_R, EC_S, EC_Z = _EC, _EC + 0x20, _EC + 0x40
EC_SEVEN, EC_ZERO = _EC + 0x60, _EC + 0x80
EC_EXP_SQRT, EC_NM2, EC_PM2 = _EC + 0xA0, _EC + 0xC0, _EC + 0xE0
EC_GX, EC_GY, EC_GZ = _EC + 0x100, _EC + 0x120, _EC + 0x140
EC_RX, EC_RY, EC_RZ = _EC + 0x160, _EC + 0x180, _EC + 0x1A0
EC_TPX, EC_TPY, EC_TPZ = _EC + 0x1C0, _EC + 0x1E0, _EC + 0x200
EC_U1, EC_U2, EC_RINV, EC_NEGZ = _EC + 0x220, _EC + 0x240, _EC + 0x260, _EC + 0x280
EC_T0, EC_RN = _EC + 0x2A0, _EC + 0x2E0
EC_SH_I, EC_PARITY = _EC + 0x2C0, _EC + 0x2C4


def _emit_bit_read(a, scal_addr: int, i_reg: int, out_reg: int):
    """out = bit i_reg of the 256-bit scalar at scal_addr."""
    from . import asmlib as al

    a.l("srli", 3, i_reg, 0, 5)
    a.l("slli", 3, 3, 0, 2)
    a.li(4, scal_addr)
    a.l("add", 3, 3, 4)
    a.l("lw", out_reg, 3, 0, 0)
    a.l("andi", 4, i_reg, 0, 31)
    a.l("srl", out_reg, out_reg, 4)
    a.l("andi", out_reg, out_reg, 0, 1)


def ecrecover_guest(seed: int = 5):
    """Full secp256k1 ecrecover; check() compares the recovered point to
    the signer's public key (python affine reference, asmlib.PyCurve)."""
    import random

    from . import asmlib as al
    from .asmlib import (
        ACCX, ACCY, ACCZ, ACC_INF, DESC_N, DESC_P, MB, ME, MO, OUT,
        QX, QY, QZ, STACK_TOP, Asm, fe_add, fe_mul, fe_sub,
    )

    rnd = random.Random(seed)
    curve = al.PyCurve()
    d = rnd.randrange(1, curve.n)
    k = rnd.randrange(1, curve.n)
    z = rnd.randrange(1, curve.n)
    r, s, parity = curve.sign(z, d, k)
    pub = curve.mul(d, curve.G)
    assert curve.recover(z, r, s, parity) == pub

    mem = {}
    mem.update(al.desc_mem(DESC_P, curve.p))
    mem.update(al.desc_mem(DESC_N, curve.n))
    mp = lambda v: al.to_mont(v, curve.p)
    mn = lambda v: al.to_mont(v, curve.n)
    for addr, v in [
        # mod-p operands in Montgomery form
        (EC_R, mp(r)), (EC_SEVEN, mp(7)), (EC_ZERO, 0),
        (EC_GX, mp(curve.G[0])), (EC_GY, mp(curve.G[1])), (EC_GZ, mp(1)),
        (EC_RZ, mp(1)),
        # mod-n operands in Montgomery form
        (EC_RN, mn(r)), (EC_S, mn(s)), (EC_Z, mn(z)),
        # exponents stay raw bit patterns
        (EC_EXP_SQRT, (curve.p + 1) // 4), (EC_NM2, curve.n - 2),
        (EC_PM2, curve.p - 2),
    ]:
        mem.update(al.fe_mem(addr, v))
    mem[EC_PARITY] = parity

    a = Asm()
    a.li(2, STACK_TOP)
    a.li(19, DESC_P)
    # alpha = r^3 + 7
    fe_mul(a, EC_T0, EC_R, EC_R)
    fe_mul(a, EC_T0, EC_T0, EC_R)
    fe_add(a, EC_T0, EC_T0, EC_SEVEN)
    # y = alpha ^ ((p+1)/4)
    a.copy32(MB, EC_T0)
    a.copy32(ME, EC_EXP_SQRT)
    a.call("modpow")
    a.copy32(EC_RY, MO)
    # parity fix: if (canonical y & 1) != parity: y = p - y  (the lsb
    # lives on the canonical value; y itself stays in Montgomery form)
    par_ok = a.fresh("ec_parok")
    fe_mul(a, EC_T0, EC_RY, al.ONE_RAW_SLOT)  # from-Montgomery
    a.l("lw", 5, 0, 0, EC_T0)
    a.l("andi", 5, 5, 0, 1)
    a.l("lw", 6, 0, 0, EC_PARITY)
    a.l("beq", 0, 5, 6, par_ok)
    fe_sub(a, EC_RY, EC_ZERO, EC_RY)
    a.label(par_ok)
    a.copy32(EC_RX, EC_R)
    # scalars mod n: r_inv = r^(n-2); u1 = (n - z) * r_inv; u2 = s * r_inv
    a.li(19, DESC_N)
    a.copy32(MB, EC_RN)
    a.copy32(ME, EC_NM2)
    a.call("modpow")
    a.copy32(EC_RINV, MO)
    fe_sub(a, EC_NEGZ, EC_ZERO, EC_Z)
    fe_mul(a, EC_U1, EC_NEGZ, EC_RINV)
    fe_mul(a, EC_U2, EC_S, EC_RINV)
    # the ladder reads scalar BITS: convert u1/u2 to canonical form
    fe_mul(a, EC_U1, EC_U1, al.ONE_RAW_SLOT)
    fe_mul(a, EC_U2, EC_U2, al.ONE_RAW_SLOT)
    # T = G + R (Jacobian, both z = 1)
    a.li(19, DESC_P)
    a.copy32(ACCX, EC_GX)
    a.copy32(ACCY, EC_GY)
    a.copy32(ACCZ, EC_GZ)
    a.l("sw", 0, 0, 0, ACC_INF)
    a.copy32(QX, EC_RX)
    a.copy32(QY, EC_RY)
    a.copy32(QZ, EC_RZ)
    a.call("pt_add")
    a.copy32(EC_TPX, ACCX)
    a.copy32(EC_TPY, ACCY)
    a.copy32(EC_TPZ, ACCZ)
    # Shamir double-and-add over (u1, u2)
    a.copy32(ACCX, EC_GX)  # well-defined dummy coords while flagged ∞
    a.copy32(ACCY, EC_GY)
    a.copy32(ACCZ, EC_GZ)
    a.store_imm(ACC_INF, 1)
    a.store_imm(EC_SH_I, 255)
    loop = a.fresh("ec_loop")
    no_add = a.fresh("ec_noadd")
    add_g = a.fresh("ec_addg")
    add_r = a.fresh("ec_addr")
    do_add = a.fresh("ec_doadd")
    loop_end = a.fresh("ec_lend")
    a.label(loop)
    a.call("pt_dbl")
    a.l("lw", 9, 0, 0, EC_SH_I)
    _emit_bit_read(a, EC_U1, 9, 10)
    a.l("lw", 9, 0, 0, EC_SH_I)
    _emit_bit_read(a, EC_U2, 9, 11)
    a.l("beq", 0, 10, 0, add_r)  # b1 == 0 -> maybe R only
    a.l("beq", 0, 11, 0, add_g)  # b1 = 1, b2 = 0 -> G
    a.copy32(QX, EC_TPX)  # both -> T = G + R
    a.copy32(QY, EC_TPY)
    a.copy32(QZ, EC_TPZ)
    a.l("jal", 30, 0, 0, do_add)
    a.label(add_g)
    a.copy32(QX, EC_GX)
    a.copy32(QY, EC_GY)
    a.copy32(QZ, EC_GZ)
    a.l("jal", 30, 0, 0, do_add)
    a.label(add_r)
    a.l("beq", 0, 11, 0, no_add)  # b1 = b2 = 0
    a.copy32(QX, EC_RX)
    a.copy32(QY, EC_RY)
    a.copy32(QZ, EC_RZ)
    a.label(do_add)
    a.call("pt_add")
    a.label(no_add)
    a.l("lw", 9, 0, 0, EC_SH_I)
    a.l("beq", 0, 9, 0, loop_end)
    a.l("addi", 9, 9, 0, -1)
    a.l("sw", 0, 0, 9, EC_SH_I)
    a.l("jal", 30, 0, 0, loop)
    a.label(loop_end)
    # to affine: zinv = Z^(p-2); x = X*zinv^2; y = Y*zinv^3
    a.copy32(MB, ACCZ)
    a.copy32(ME, EC_PM2)
    a.call("modpow")
    fe_mul(a, EC_T0, MO, MO)  # zinv^2
    fe_mul(a, EC_NEGZ, EC_T0, MO)  # zinv^3 (reuse slot)
    fe_mul(a, OUT, ACCX, EC_T0)
    fe_mul(a, OUT + 0x20, ACCY, EC_NEGZ)
    # outputs to canonical form
    fe_mul(a, OUT, OUT, al.ONE_RAW_SLOT)
    fe_mul(a, OUT + 0x20, OUT + 0x20, al.ONE_RAW_SLOT)
    a.l("halt",)

    al.emit_field_lib(a)
    al.emit_pt_dbl(a)
    al.emit_pt_add(a)

    def check(result):
        got_x = al.from_limbs(
            [result.final_mem[(2, OUT + 4 * i)][1] for i in range(8)]
        )
        got_y = al.from_limbs(
            [result.final_mem[(2, OUT + 0x20 + 4 * i)][1] for i in range(8)]
        )
        assert (got_x, got_y) == pub, ((hex(got_x), hex(got_y)), pub)

    return assemble(a.lines), mem, check


# -- pairing-shaped big-field workload ----------------------------------------
# Counterpart of /root/reference/openvm-riscv/guest-pairing's arithmetic
# profile: a Miller-loop-shaped Fp2 ladder over the BN254 base field
# (f <- f^2 * g, 64 iterations), the largest-trace BASELINE stress shape.

_PR = 0x1B00
PR_F0, PR_F1, PR_G0, PR_G1 = _PR, _PR + 0x20, _PR + 0x40, _PR + 0x60
PR_T0, PR_T1, PR_T2, PR_T3 = _PR + 0x80, _PR + 0xA0, _PR + 0xC0, _PR + 0xE0
PR_I = _PR + 0x100
PR_OUT0, PR_OUT1 = _PR + 0x120, _PR + 0x140


def pairing_guest(truncate: "int | None" = None, a_scal: int = 31, b_scal: int = 5):
    """REAL BN254 optimal-ate pairing e(a*G1, b*G2) — the guest-pairing
    counterpart (/root/reference/openvm-riscv/guest-pairing/src/main.rs:
    Miller loop with line evaluations, Fp12 tower, final exponentiation).
    ~61M instructions full; `truncate=k` runs only the first k Miller
    digits without the final exponentiation (CI-sized, same code paths).
    check() compares the Fp12 output against the bilinearity-validated
    python reference (vm/bn254.py)."""
    from . import bn254 as bn
    from . import pairing_emit as pe

    P = bn.g1_mul(bn.G1, a_scal)
    Q = bn.g2_mul((bn.G2_X, bn.G2_Y), b_scal)
    lines, mem = pe.emit_pairing_program(
        P, Q, truncate_naf=truncate, final_exp=truncate is None
    )
    if truncate is None:
        want = bn.pairing(P, Q)
    else:
        want = bn.miller_loop_projective(P, Q, truncate=truncate)

    def check(result):
        got = pe.read_out12(result)
        assert got == want, "pairing output mismatch"

    return assemble(lines), mem, check


def fp2_ladder_guest(iters: int = 64, seed: int = 11):
    """64-round Fp2 square-and-multiply ladder over BN254 (u^2 = -1):
    f <- f^2 * g.  check() compares against a python Fp2 reference."""
    import random

    from . import asmlib as al
    from .asmlib import DESC_BN, STACK_TOP, Asm, fe_add, fe_mul, fe_sub

    p = al._P_BN254
    rnd = random.Random(seed)
    f = (rnd.randrange(p), rnd.randrange(p))
    g = (rnd.randrange(p), rnd.randrange(p))

    def fp2_mul(x, y):
        return ((x[0] * y[0] - x[1] * y[1]) % p, (x[0] * y[1] + x[1] * y[0]) % p)

    expect = f
    for _ in range(iters):
        expect = fp2_mul(fp2_mul(expect, expect), g)

    mem = {}
    mem.update(al.desc_mem(DESC_BN, p))
    for addr, v in [(PR_F0, f[0]), (PR_F1, f[1]), (PR_G0, g[0]), (PR_G1, g[1])]:
        mem.update(al.fe_mem(addr, al.to_mont(v, p)))

    a = Asm()
    a.li(2, STACK_TOP)
    a.li(19, DESC_BN)
    a.store_imm(PR_I, iters)
    loop = a.fresh("pr_loop")
    done = a.fresh("pr_done")

    def emit_fp2_mul(o0, o1, x0, x1, y0, y1):
        fe_mul(a, PR_T2, x0, y0)
        fe_mul(a, PR_T3, x1, y1)
        fe_sub(a, PR_T2, PR_T2, PR_T3)  # real part
        fe_mul(a, PR_T3, x0, y1)
        fe_mul(a, o1, x1, y0)
        fe_add(a, o1, o1, PR_T3)  # imag part
        a.copy32(o0, PR_T2)

    a.label(loop)
    a.l("lw", 9, 0, 0, PR_I)
    a.l("beq", 0, 9, 0, done)
    emit_fp2_mul(PR_T0, PR_T1, PR_F0, PR_F1, PR_F0, PR_F1)  # f^2
    emit_fp2_mul(PR_F0, PR_F1, PR_T0, PR_T1, PR_G0, PR_G1)  # * g
    a.l("lw", 9, 0, 0, PR_I)
    a.l("addi", 9, 9, 0, -1)
    a.l("sw", 0, 0, 9, PR_I)
    a.l("jal", 30, 0, 0, loop)
    a.label(done)
    fe_mul(a, PR_OUT0, PR_F0, al.ONE_RAW_SLOT)  # to canonical
    fe_mul(a, PR_OUT1, PR_F1, al.ONE_RAW_SLOT)
    a.l("halt",)
    al.emit_field_lib(a)

    def check(result):
        got0 = al.from_limbs([result.final_mem[(2, PR_OUT0 + 4 * i)][1] for i in range(8)])
        got1 = al.from_limbs([result.final_mem[(2, PR_OUT1 + 4 * i)][1] for i in range(8)])
        assert (got0, got1) == expect, ((hex(got0), hex(got1)), expect)

    return assemble(a.lines), mem, check


# -- hints-extension test guest ------------------------------------------------
# Counterpart of /root/reference/openvm-riscv/guest-hints-test: exercises the
# custom hints instructions (revb + k256 field inverse/sqrt phantoms) and
# verifies every hint IN-GUEST — hint values are unconstrained witness, so
# the guest's field-mul checks are what makes them sound.

_HT = 0x2000
HT_X, HT_INV, HT_SQ, HT_ROOT = _HT, _HT + 0x20, _HT + 0x40, _HT + 0x60
HT_T, HT_FLAG = _HT + 0x80, _HT + 0xA0


def hints_test_guest(seed: int = 3):
    import random

    from . import asmlib as al
    from .asmlib import DESC_P, STACK_TOP, Asm, fe_mul
    from .executor import K256_P

    rnd = random.Random(seed)
    x = rnd.randrange(2, K256_P)
    y = rnd.randrange(2, K256_P)
    sq = y * y % K256_P

    mem = {}
    mem.update(al.desc_mem(DESC_P, K256_P))
    mem.update(al.fe_mem(HT_X, al.to_mont(x, K256_P)))
    mem.update(al.fe_mem(HT_SQ, al.to_mont(sq, K256_P)))

    a = Asm()
    a.li(2, STACK_TOP)
    a.li(19, DESC_P)
    # revb: rd = byte-reversed rs1 (deterministic, constrained)
    a.li(5, 0x01020304)
    a.l("revb", 6, 5)
    a.li(7, 0x04030201)
    a.l("bne", 0, 6, 7, "fail")
    # k256 inverse hint on mont(x); verify x * x^-1 == 1 via mont-mul
    a.li(5, HT_X)
    a.l("hintinv", 0, 5)
    for i in range(8):
        a.l("hintpop", 6)
        a.l("sw", 0, 0, 6, HT_INV + 4 * i)
    fe_mul(a, HT_T, HT_X, HT_INV)
    for i in range(8):
        a.l("lw", 5, 0, 0, HT_T + 4 * i)
        a.l("lw", 6, 19, 0, 64 + 4 * i)  # mont(1) from the descriptor
        a.l("bne", 0, 5, 6, "fail")
    # k256 sqrt hint on mont(y^2); verify root^2 == y^2
    a.li(5, HT_SQ)
    a.l("hintsqrt", 0, 5)
    for i in range(8):
        a.l("hintpop", 6)
        a.l("sw", 0, 0, 6, HT_ROOT + 4 * i)
    fe_mul(a, HT_T, HT_ROOT, HT_ROOT)
    for i in range(8):
        a.l("lw", 5, 0, 0, HT_T + 4 * i)
        a.l("lw", 6, 0, 0, HT_SQ + 4 * i)
        a.l("bne", 0, 5, 6, "fail")
    a.store_imm(HT_FLAG, 1)
    a.l("halt",)
    a.label("fail")
    a.store_imm(HT_FLAG, 2)
    a.l("halt",)
    al.emit_field_lib(a)

    def check(result):
        assert result.final_mem[(2, HT_FLAG)][1] == 1, "in-guest hint check failed"
        inv = al.from_limbs([result.final_mem[(2, HT_INV + 4 * i)][1] for i in range(8)])
        assert al.from_mont(inv, K256_P) == pow(x, K256_P - 2, K256_P)
        root = al.from_limbs([result.final_mem[(2, HT_ROOT + 4 * i)][1] for i in range(8)])
        assert al.from_mont(root, K256_P) ** 2 % K256_P == sq

    return assemble(a.lines), mem, check


# -- affine-hint ECC guest -------------------------------------------------------
# Counterpart of /root/reference/openvm-riscv/guest-ecc-powdr-affine-hint:
# secp256k1 scalar multiplication in AFFINE coordinates, with every field
# inverse supplied by the hintinv phantom and verified in-guest (den * inv
# == mont(1) or jump to the fail path).  Affine + hints trades the Jacobian
# ladder's extra multiplications for one verified inverse per point op —
# the trace profile the reference variant exists to exercise.

_AH = 0x2200
AH_X1, AH_Y1, AH_GX, AH_GY = _AH, _AH + 0x20, _AH + 0x40, _AH + 0x60
AH_K, AH_DEN, AH_INV, AH_LAM = _AH + 0x80, _AH + 0xA0, _AH + 0xC0, _AH + 0xE0
AH_T0, AH_T1, AH_OUTX, AH_OUTY = _AH + 0x100, _AH + 0x120, _AH + 0x140, _AH + 0x160
AH_I, AH_FLAG = _AH + 0x180, _AH + 0x184


def ecc_affine_hint_guest(k_bits: int = 32, seed: int = 9):
    import random

    from . import asmlib as al
    from .asmlib import DESC_P, STACK_TOP, Asm, fe_add, fe_mul, fe_sub

    curve = al.PyCurve()
    rnd = random.Random(seed)
    k = rnd.randrange(1 << (k_bits - 1), 1 << k_bits)  # MSB set
    expect = curve.mul(k, curve.G)
    mp = lambda v: al.to_mont(v, curve.p)

    mem = {}
    mem.update(al.desc_mem(DESC_P, curve.p))
    for addr, v in [
        (AH_GX, mp(curve.G[0])), (AH_GY, mp(curve.G[1])),
        (AH_X1, mp(curve.G[0])), (AH_Y1, mp(curve.G[1])),
        (AH_K, k),
    ]:
        mem.update(al.fe_mem(addr, v))

    a = Asm()
    a.li(2, STACK_TOP)
    a.li(19, DESC_P)
    a.store_imm(AH_I, k_bits - 2)  # acc = G covers the MSB
    a.label("loop")
    a.call("ah_dbl")
    a.l("lw", 9, 0, 0, AH_I)
    _emit_bit_read(a, AH_K, 9, 10)
    a.l("beq", 0, 10, 0, "skip")
    a.call("ah_add")
    a.label("skip")
    a.l("lw", 9, 0, 0, AH_I)
    a.l("beq", 0, 9, 0, "done")
    a.l("addi", 9, 9, 0, -1)
    a.l("sw", 0, 0, 9, AH_I)
    a.l("jal", 30, 0, 0, "loop")
    a.label("done")
    fe_mul(a, AH_OUTX, AH_X1, al.ONE_RAW_SLOT)  # to canonical form
    fe_mul(a, AH_OUTY, AH_Y1, al.ONE_RAW_SLOT)
    a.store_imm(AH_FLAG, 1)
    a.l("halt",)
    a.label("fail")
    a.store_imm(AH_FLAG, 2)
    a.l("halt",)

    # inv: AH_INV = AH_DEN^-1 via the hint queue, verified in-field
    a.label("ah_inv")
    a.push(1)
    a.li(5, AH_DEN)
    a.l("hintinv", 0, 5)
    for i in range(8):
        a.l("hintpop", 6)
        a.l("sw", 0, 0, 6, AH_INV + 4 * i)
    fe_mul(a, AH_T0, AH_DEN, AH_INV)
    for i in range(8):
        a.l("lw", 5, 0, 0, AH_T0 + 4 * i)
        a.l("lw", 6, 19, 0, 64 + 4 * i)  # mont(1)
        a.l("bne", 0, 5, 6, "fail")
    a.pop(1)
    a.ret()

    # acc = 2*acc (affine): lam = 3x^2/(2y); x' = lam^2-2x; y' = lam(x-x')-y
    a.label("ah_dbl")
    a.push(1)
    fe_add(a, AH_DEN, AH_Y1, AH_Y1)
    a.call("ah_inv")
    fe_mul(a, AH_T0, AH_X1, AH_X1)
    fe_add(a, AH_T1, AH_T0, AH_T0)
    fe_add(a, AH_T0, AH_T1, AH_T0)
    fe_mul(a, AH_LAM, AH_T0, AH_INV)
    fe_mul(a, AH_T0, AH_LAM, AH_LAM)
    fe_sub(a, AH_T0, AH_T0, AH_X1)
    fe_sub(a, AH_T0, AH_T0, AH_X1)
    fe_sub(a, AH_T1, AH_X1, AH_T0)
    fe_mul(a, AH_T1, AH_LAM, AH_T1)
    fe_sub(a, AH_Y1, AH_T1, AH_Y1)
    a.copy32(AH_X1, AH_T0)
    a.pop(1)
    a.ret()

    # acc = acc + G (affine, x_G != x_acc by scalar choice):
    # lam = (yG-y)/(xG-x); x3 = lam^2-x-xG; y3 = lam(x-x3)-y
    a.label("ah_add")
    a.push(1)
    fe_sub(a, AH_DEN, AH_GX, AH_X1)
    a.call("ah_inv")
    fe_sub(a, AH_T0, AH_GY, AH_Y1)
    fe_mul(a, AH_LAM, AH_T0, AH_INV)
    fe_mul(a, AH_T0, AH_LAM, AH_LAM)
    fe_sub(a, AH_T0, AH_T0, AH_X1)
    fe_sub(a, AH_T0, AH_T0, AH_GX)
    fe_sub(a, AH_T1, AH_X1, AH_T0)
    fe_mul(a, AH_T1, AH_LAM, AH_T1)
    fe_sub(a, AH_Y1, AH_T1, AH_Y1)
    a.copy32(AH_X1, AH_T0)
    a.pop(1)
    a.ret()

    al.emit_field_lib(a)

    def check(result):
        assert result.final_mem[(2, AH_FLAG)][1] == 1, "in-guest inverse check failed"
        got_x = al.from_limbs([result.final_mem[(2, AH_OUTX + 4 * i)][1] for i in range(8)])
        got_y = al.from_limbs([result.final_mem[(2, AH_OUTY + 4 * i)][1] for i in range(8)])
        assert (got_x, got_y) == expect, ((hex(got_x), hex(got_y)), expect)

    return assemble(a.lines), mem, check
