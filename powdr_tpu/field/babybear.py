"""BabyBear prime field arithmetic for TPU.

p = 2^31 - 2^27 + 1 = 2013265921.  All device arrays hold elements in
**Montgomery form** (R = 2^32) as ``uint32``.  TPUs have no widening
32x32->64 multiply, so the high half of products is computed from 16-bit
limb products, each of which fits in a uint32.

Reference parity: powdr's `number` crate wraps plonky3's BabyBear
(`/root/reference/number/src/baby_bear.rs`, `number/src/plonky3_macros.rs`)
which also uses a 32-bit Montgomery representation.  This module is an
independent TPU-native implementation: pure `jax.numpy` ops over uint32
lanes so XLA can fuse them into surrounding kernels, with Pallas variants
for the hot paths in `powdr_tpu.field.pallas_kernels`.

Derivation of the constants (see tools/gen_constants.py rationale):
  NPRIME = -p^{-1} mod 2^32 = 0x77ffffff
  R      = 2^32 mod p       = 268435454
  R2     = R^2 mod p        = 1172168163   (to_mont multiplier)
  generator g = 31, two-adicity 27 ((p-1) = 2^27 * 3 * 5)
  w27    = g^((p-1)/2^27) = g^15 = 440564289  (canonical 2^27-th root)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

P = 2013265921  # 2^31 - 2^27 + 1
NPRIME = 0x77FFFFFF  # -p^{-1} mod 2^32
R_MOD_P = 268435454  # 2^32 mod p (Montgomery form of 1)
R2_MOD_P = 1172168163  # (2^32)^2 mod p
GENERATOR = 31  # multiplicative generator of F_p^*
TWO_ADICITY = 27
TWO_ADIC_ROOT = 440564289  # order-2^27 element: 31^15 mod p

_U = jnp.uint32
MASK16 = np.uint32(0xFFFF)


def _u(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


def mulhi32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """High 32 bits of the 64-bit product of two uint32 arrays.

    16-bit limb decomposition; every intermediate fits in uint32:
      a0*b0 < 2^32; a0*b1 + carry < 2^32; a1*b0 + 16-bit < 2^32.
    """
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    m0 = a0 * b0
    t = a0 * b1 + (m0 >> 16)
    u = a1 * b0 + (t & MASK16)
    return a1 * b1 + (t >> 16) + (u >> 16)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field add; inputs in [0, p)."""
    s = a + b
    return jnp.where(s >= P, s - np.uint32(P), s)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field sub; inputs in [0, p)."""
    d = a - b
    return jnp.where(a >= b, d, d + np.uint32(P))


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(a == 0, a, np.uint32(P) - a)


def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product: a*b*R^{-1} mod p, inputs/outputs in [0, p).

    REDC: t = a*b; m = t_lo * NPRIME mod 2^32; res = hi(t) + hi(m*p) + carry,
    where carry = (t_lo != 0) because t_lo + lo(m*p) is 0 or 2^32 exactly.
    """
    t_lo = a * b
    t_hi = mulhi32(a, b)
    m = t_lo * np.uint32(NPRIME)
    mp_hi = mulhi32(m, np.uint32(P))
    res = t_hi + mp_hi + (t_lo != 0).astype(jnp.uint32)
    return jnp.where(res >= P, res - np.uint32(P), res)


def mont_sqr(a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(a, a)


def to_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Canonical uint32 in [0,p) -> Montgomery form."""
    return mont_mul(_u(a), _u(R2_MOD_P))


def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> canonical uint32 in [0,p)."""
    return mont_mul(a, _u(1))


def one(shape=()) -> jnp.ndarray:
    return jnp.full(shape, R_MOD_P, dtype=jnp.uint32)


def zero(shape=()) -> jnp.ndarray:
    return jnp.zeros(shape, dtype=jnp.uint32)


def mont_pow(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e with a in Montgomery form, static integer exponent (unrolled)."""
    e = int(e) % (P - 1)
    result = jnp.broadcast_to(one(), jnp.shape(a)).astype(jnp.uint32)
    base = a
    while e:
        if e & 1:
            result = mont_mul(result, base)
        e >>= 1
        if e:
            base = mont_sqr(base)
    return result


@jax.jit
def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Field inverse by Fermat: a^(p-2). inv(0) = 0."""
    return mont_pow(a, P - 2)


def sum_mod(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Modular sum along `axis` by halving tree-reduction (log2 steps of
    vectorized conditional-subtract adds; avoids 64-bit accumulation,
    which TPUs lack)."""
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    pow2 = 1 << (n - 1).bit_length()
    if pow2 != n:
        pad = [(0, pow2 - n)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = add(x[:h], x[h:])
    return x[0]


def batch_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Elementwise inverse. Fully vectorized pow chain (~43 muls) rather than
    Montgomery's serial trick - lane parallelism beats op count on the VPU."""
    return inv(a)


# ---------------------------------------------------------------------------
# host-side (numpy / python int) helpers for constants and tests


def py_to_mont(x: int) -> int:
    return (x % P) * (1 << 32) % P


def py_from_mont(x: int) -> int:
    return x * pow(1 << 32, -1, P) % P


def py_root_of_unity(log_n: int) -> int:
    """Canonical 2^log_n-th root of unity (canonical form, not Montgomery)."""
    assert log_n <= TWO_ADICITY
    return pow(TWO_ADIC_ROOT, 1 << (TWO_ADICITY - log_n), P)


def np_to_mont(x: np.ndarray) -> np.ndarray:
    return ((x.astype(np.uint64) << 32) % P).astype(np.uint32)


def np_from_mont(x: np.ndarray) -> np.ndarray:
    rinv = pow(1 << 32, -1, P)
    return ((x.astype(np.uint64) * rinv) % P).astype(np.uint32)


def rand_elems(key, shape) -> jnp.ndarray:
    """Uniform field elements in Montgomery form (test/bench helper)."""
    bits = jax.random.randint(key, shape, 0, P, dtype=jnp.int32).astype(jnp.uint32)
    return bits  # uniform in [0, p); interpret as Montgomery form directly
