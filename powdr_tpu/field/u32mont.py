"""Parametric 32-bit Montgomery fields on device.

Generalizes the BabyBear recipe (field/babybear.py — 16-bit limb mulhi,
REDC with R = 2^32) to any odd p < 2^32, giving DEVICE kernels for the
other u32 fields of the reference's `number` crate
(/root/reference/number/src/lib.rs:20-29): KoalaBear and Mersenne31.
Each field carries elementwise add/sub/neg/mul/inv plus, for two-adic
fields, a self-contained radix-2 DIF/DIT NTT pair (natural->bitrev /
bitrev->natural) — enough to run a proving pipeline in that field; the
tuned Bailey four-step pipeline (ntt/fourstep.py) remains the
BabyBear-optimized hot path.

All ops are pure jnp functions over uint32 arrays in Montgomery form, so
XLA fuses them into surrounding kernels exactly like the BabyBear ones.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field as dc_field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .babybear import mulhi32

MASK16 = np.uint32(0xFFFF)


@dataclass(frozen=True)
class U32Field:
    name: str
    p: int
    generator: int
    two_adicity: int

    def __post_init__(self):
        # mont_mul's single conditional subtraction needs t_hi + mp_hi +
        # carry < 2^32, which holds iff p < 2^31 (both shipped fields are)
        assert self.p % 2 == 1 and self.p < (1 << 31), (
            f"{self.name}: u32 Montgomery recipe requires an odd p < 2^31"
        )

    # -- derived Montgomery constants (R = 2^32) ----------------------------

    @functools.cached_property
    def nprime(self) -> int:
        return (-pow(self.p, -1, 1 << 32)) % (1 << 32)

    @functools.cached_property
    def r_mod_p(self) -> int:
        return (1 << 32) % self.p

    @functools.cached_property
    def r2_mod_p(self) -> int:
        return self.r_mod_p * self.r_mod_p % self.p

    @functools.cached_property
    def two_adic_root(self) -> int:
        odd = (self.p - 1) >> self.two_adicity
        return pow(self.generator, odd, self.p)

    # -- elementwise device ops --------------------------------------------

    def add(self, a, b):
        s = a + b
        return jnp.where(s >= self.p, s - np.uint32(self.p), s)

    def sub(self, a, b):
        d = a - b
        return jnp.where(a >= b, d, d + np.uint32(self.p))

    def neg(self, a):
        return jnp.where(a == 0, a, np.uint32(self.p) - a)

    def mont_mul(self, a, b):
        t_lo = a * b
        t_hi = mulhi32(a, b)
        m = t_lo * np.uint32(self.nprime)
        mp_hi = mulhi32(m, np.uint32(self.p))
        res = t_hi + mp_hi + (t_lo != 0).astype(jnp.uint32)
        return jnp.where(res >= self.p, res - np.uint32(self.p), res)

    def mont_pow(self, a, e: int):
        e = int(e) % (self.p - 1)
        result = jnp.broadcast_to(
            jnp.uint32(self.r_mod_p), jnp.shape(a)
        ).astype(jnp.uint32)
        base = a
        while e:
            if e & 1:
                result = self.mont_mul(result, base)
            e >>= 1
            if e:
                base = self.mont_mul(base, base)
        return result

    def inv(self, a):
        return self.mont_pow(a, self.p - 2)

    def to_mont(self, a):
        return self.mont_mul(
            jnp.asarray(a, dtype=jnp.uint32), jnp.uint32(self.r2_mod_p)
        )

    def from_mont(self, a):
        return self.mont_mul(a, jnp.uint32(1))

    # -- host helpers --------------------------------------------------------

    def py_root_of_unity(self, log_n: int) -> int:
        assert log_n <= self.two_adicity, f"{self.name} two-adicity exceeded"
        return pow(self.two_adic_root, 1 << (self.two_adicity - log_n), self.p)

    def np_to_mont(self, x: np.ndarray) -> np.ndarray:
        return ((x.astype(np.uint64) << 32) % self.p).astype(np.uint32)

    def np_from_mont(self, x: np.ndarray) -> np.ndarray:
        rinv = pow(1 << 32, -1, self.p)
        return ((x.astype(np.uint64) * rinv) % self.p).astype(np.uint32)

    # -- NTT (two-adic fields) ----------------------------------------------

    @functools.lru_cache(maxsize=None)
    def _twiddles(self, log_n: int, inverse: bool):
        """Per-stage twiddle tables (Montgomery), DIF natural->bitrev order."""
        n = 1 << log_n
        w = self.py_root_of_unity(log_n)
        if inverse:
            w = pow(w, self.p - 2, self.p)
        tw: List[np.ndarray] = []
        for s in range(log_n):
            half = n >> (s + 1)
            ws = pow(w, 1 << s, self.p)
            # vectorized power table (square-and-multiply over index bits)
            t = np.ones(max(half, 1), dtype=np.uint64)
            j = np.arange(max(half, 1), dtype=np.uint64)
            bk, bit = ws % self.p, 0
            while (1 << bit) < max(half, 2):
                sel = (j >> bit) & 1 == 1
                t[sel] = t[sel] * bk % self.p
                bk = bk * bk % self.p
                bit += 1
            tw.append(self.np_to_mont(t.astype(np.uint32)))
        return tuple(tw)

    def ntt(self, x: jnp.ndarray) -> jnp.ndarray:
        """DIF NTT over the trailing axis: natural input, bit-reversed
        output, Montgomery in/out."""
        n = x.shape[-1]
        log_n = int(np.log2(n))
        tws = self._twiddles(log_n, False)
        for s in range(log_n):
            half = n >> (s + 1)
            y = x.reshape(*x.shape[:-1], -1, 2, half)
            lo, hi = y[..., 0, :], y[..., 1, :]
            s_ = self.add(lo, hi)
            d = self.mont_mul(self.sub(lo, hi), jnp.asarray(tws[s]))
            x = jnp.stack([s_, d], axis=-2).reshape(*x.shape)
        return x

    def intt(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse: bit-reversed input, natural output (DIT), including
        the 1/n scale."""
        n = x.shape[-1]
        log_n = int(np.log2(n))
        tws = self._twiddles(log_n, True)
        for s in reversed(range(log_n)):
            half = n >> (s + 1)
            y = x.reshape(*x.shape[:-1], -1, 2, half)
            lo, hi = y[..., 0, :], y[..., 1, :]
            hi = self.mont_mul(hi, jnp.asarray(tws[s]))
            x = jnp.stack(
                [self.add(lo, hi), self.sub(lo, hi)], axis=-2
            ).reshape(*x.shape)
        n_inv = pow(n, self.p - 2, self.p) * (1 << 32) % self.p
        return self.mont_mul(x, jnp.uint32(n_inv))


KOALA_BEAR_DEV = U32Field("KoalaBear", 2**31 - 2**24 + 1, 3, 24)
MERSENNE31_DEV = U32Field("Mersenne31", 2**31 - 1, 7, 0)

DEV_FIELDS = {f.name: f for f in (KOALA_BEAR_DEV, MERSENNE31_DEV)}
