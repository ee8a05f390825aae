"""Goldilocks (p = 2^64 - 2^32 + 1) device arithmetic as uint32 limb pairs.

TPUs have no 64-bit integer multiply datapath worth using, so elements are
(lo, hi) uint32 pairs and the famous Goldilocks reduction identities do
the rest (reference field surface: /root/reference/number/src/lib.rs:20-29
wraps plonky3's Goldilocks):

    2^64 ≡ 2^32 - 1  (mod p)        2^96 ≡ -1  (mod p)

so a 128-bit product n = n0 + 2^64*n2 + 2^96*n3 (n0 the low 64 bits,
n2 the next 32, n3 the top 32) reduces as n0 - n3 + (2^32-1)*n2.

No Montgomery form: the reduction is cheaper than REDC here.  Values are
canonical in [0, p).  Provides add/sub/neg/mul/inv and a radix-2 NTT
(two-adicity 32), all pure jnp over uint32 lanes.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .babybear import mulhi32

P = 2**64 - 2**32 + 1
GENERATOR = 7
TWO_ADICITY = 32
TWO_ADIC_ROOT = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)

U32 = np.uint32
EPS = np.uint32(0xFFFFFFFF)  # 2^32 - 1 = 2^64 mod p (low limb; hi limb 0... p-? )

Pair = Tuple[jnp.ndarray, jnp.ndarray]  # (lo, hi) uint32


def from_u64(x: np.ndarray) -> Pair:
    x = np.asarray(x, dtype=np.uint64) % P
    return (
        jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )


def to_u64(a: Pair) -> np.ndarray:
    lo = np.asarray(a[0], dtype=np.uint64)
    hi = np.asarray(a[1], dtype=np.uint64)
    return (lo | (hi << np.uint64(32))) % P


def _addc(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint32 add with carry-out."""
    s = a + b
    return s, (s < a).astype(jnp.uint32)


def _subb(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint32 sub with borrow-out."""
    d = a - b
    return d, (a < b).astype(jnp.uint32)


def _canon(lo: jnp.ndarray, hi: jnp.ndarray) -> Pair:
    """Reduce a value < 2^64 into [0, p): subtract p once if needed.
    v >= p  iff  hi == 2^32-1 and lo >= 1 ... p = 2^64 - 2^32 + 1:
    hi_p = 0xFFFFFFFF, lo_p = 1 → v >= p iff hi == 0xFFFFFFFF && lo >= 1."""
    ge = (hi == EPS) & (lo >= 1)
    # v - p = v - 2^64 + 2^32 - 1 = (lo - 1) with hi wrapping to 0
    return jnp.where(ge, lo - 1, lo), jnp.where(ge, jnp.uint32(0), hi)


def add(a: Pair, b: Pair) -> Pair:
    lo, c = _addc(a[0], b[0])
    hi1, c1 = _addc(a[1], b[1])
    hi2, c2 = _addc(hi1, c)
    # carry past 2^64: fold back 2^64 mod p = 2^32 - 1
    ov = (c1 | c2).astype(jnp.bool_)
    lo3, c3 = _addc(lo, jnp.where(ov, EPS, jnp.uint32(0)))
    hi3 = hi2 + c3
    return _canon(lo3, hi3)


def sub(a: Pair, b: Pair) -> Pair:
    lo, br = _subb(a[0], b[0])
    hi1, br1 = _subb(a[1], b[1])
    hi2, br2 = _subb(hi1, br)
    und = (br1 | br2).astype(jnp.bool_)
    # borrow past 0: subtract 2^64 mod p = add p ≡ subtract (2^32 - 1)
    lo3, br3 = _subb(lo, jnp.where(und, EPS, jnp.uint32(0)))
    hi3 = hi2 - br3
    return _canon(lo3, hi3)


def neg(a: Pair) -> Pair:
    z = ((a[0] == 0) & (a[1] == 0)).astype(jnp.uint32)
    # p - a for a != 0: p = (1, 0xFFFFFFFF)
    lo, br = _subb(jnp.uint32(1), a[0])
    hi = EPS - a[1] - br
    return jnp.where(z == 1, jnp.uint32(0), lo), jnp.where(z == 1, jnp.uint32(0), hi)


def _mul_64_64(a: Pair, b: Pair):
    """Full 128-bit product as four uint32 limbs (schoolbook, carry-exact)."""
    a0, a1 = a
    b0, b1 = b

    def mul32(x, y):
        return x * y, mulhi32(x, y)

    p00l, p00h = mul32(a0, b0)
    p01l, p01h = mul32(a0, b1)
    p10l, p10h = mul32(a1, b0)
    p11l, p11h = mul32(a1, b1)

    n0 = p00l
    # limb 1: p00h + p01l + p10l
    s1, c1 = _addc(p00h, p01l)
    s1, c2 = _addc(s1, p10l)
    n1 = s1
    carry1 = c1 + c2
    # limb 2: p01h + p10h + p11l + carry1
    s2, c3 = _addc(p01h, p10h)
    s2, c4 = _addc(s2, p11l)
    s2, c5 = _addc(s2, carry1)
    n2 = s2
    carry2 = c3 + c4 + c5
    # limb 3: p11h + carry2
    n3 = p11h + carry2
    return n0, n1, n2, n3


def mul(a: Pair, b: Pair) -> Pair:
    """a*b mod p via n0 - n3 + (2^32-1)*n2 (n_i the 32-bit product limbs;
    n0||n1 the low 64 bits)."""
    n0, n1, n2, n3 = _mul_64_64(a, b)
    # t = (n0||n1) - n3   (n3 < 2^32)
    lo, br = _subb(n0, n3)
    hi1, br1 = _subb(n1, br)
    und = br1.astype(jnp.bool_)
    lo, br2 = _subb(lo, jnp.where(und, EPS, jnp.uint32(0)))
    hi1 = hi1 - br2
    # t += n2 * (2^32 - 1) = (n2 << 32) - n2
    lo2, br3 = _subb(lo, n2)
    hi2, br4 = _subb(hi1, br3)
    und2 = br4.astype(jnp.bool_)
    lo2, br5 = _subb(lo2, jnp.where(und2, EPS, jnp.uint32(0)))
    hi2 = hi2 - br5
    hi3, c = _addc(hi2, n2)
    ov = c.astype(jnp.bool_)
    lo3, c2 = _addc(lo2, jnp.where(ov, EPS, jnp.uint32(0)))
    hi3 = hi3 + c2
    return _canon(lo3, hi3)


def pow_static(a: Pair, e: int) -> Pair:
    e = int(e) % (P - 1)
    shape = jnp.shape(a[0])
    result = (
        jnp.broadcast_to(jnp.uint32(1), shape).astype(jnp.uint32),
        jnp.zeros(shape, dtype=jnp.uint32),
    )
    base = a
    while e:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    return result


def inv(a: Pair) -> Pair:
    return pow_static(a, P - 2)


# -- NTT ----------------------------------------------------------------------


def py_root_of_unity(log_n: int) -> int:
    assert log_n <= TWO_ADICITY
    return pow(TWO_ADIC_ROOT, 1 << (TWO_ADICITY - log_n), P)


@functools.lru_cache(maxsize=None)
def _twiddles(log_n: int, inverse: bool):
    n = 1 << log_n
    w = py_root_of_unity(log_n)
    if inverse:
        w = pow(w, P - 2, P)
    out = []
    for s in range(log_n):
        half = n >> (s + 1)
        ws = pow(w, 1 << s, P)
        t = np.ones(max(half, 1), dtype=object)
        for i in range(1, half):
            t[i] = t[i - 1] * ws % P
        arr = np.array([int(v) for v in t], dtype=np.uint64)
        out.append(arr)
    return tuple(out)


def ntt(x: Pair) -> Pair:
    """DIF NTT over the trailing axis; natural in, bit-reversed out."""
    n = x[0].shape[-1]
    log_n = int(np.log2(n))
    tws = _twiddles(log_n, False)
    lo, hi = x
    for s in range(log_n):
        half = n >> (s + 1)
        tw = from_u64(tws[s])
        shp = lo.shape
        ylo = lo.reshape(*shp[:-1], -1, 2, half)
        yhi = hi.reshape(*shp[:-1], -1, 2, half)
        a = (ylo[..., 0, :], yhi[..., 0, :])
        b = (ylo[..., 1, :], yhi[..., 1, :])
        s_ = add(a, b)
        d = mul(sub(a, b), (jnp.broadcast_to(tw[0], a[0].shape), jnp.broadcast_to(tw[1], a[0].shape)))
        lo = jnp.stack([s_[0], d[0]], axis=-2).reshape(*shp)
        hi = jnp.stack([s_[1], d[1]], axis=-2).reshape(*shp)
    return lo, hi


def intt(x: Pair) -> Pair:
    """Inverse NTT: bit-reversed in, natural out, with the 1/n scale."""
    n = x[0].shape[-1]
    log_n = int(np.log2(n))
    tws = _twiddles(log_n, True)
    lo, hi = x
    for s in reversed(range(log_n)):
        half = n >> (s + 1)
        tw = from_u64(tws[s])
        shp = lo.shape
        ylo = lo.reshape(*shp[:-1], -1, 2, half)
        yhi = hi.reshape(*shp[:-1], -1, 2, half)
        a = (ylo[..., 0, :], yhi[..., 0, :])
        b0 = (ylo[..., 1, :], yhi[..., 1, :])
        b = mul(b0, (jnp.broadcast_to(tw[0], a[0].shape), jnp.broadcast_to(tw[1], a[0].shape)))
        s_ = add(a, b)
        d = sub(a, b)
        lo = jnp.stack([s_[0], d[0]], axis=-2).reshape(*shp)
        hi = jnp.stack([s_[1], d[1]], axis=-2).reshape(*shp)
    n_inv = pow(n, P - 2, P)
    ninv_pair = from_u64(np.array([n_inv], dtype=np.uint64))
    return mul(
        (lo, hi),
        (
            jnp.broadcast_to(ninv_pair[0], lo.shape),
            jnp.broadcast_to(ninv_pair[1], lo.shape),
        ),
    )
