"""Quartic extension field F_p[x]/(x^4 - 11) over BabyBear.

Layout: trailing dimension of size 4 holds the coefficients (a0..a3) of
1, x, x^2, x^3, each a uint32 in Montgomery form.  This is the challenge
field used by the LogUp argument and FRI (reference: powdr pins plonky3's
``BinomialExtensionField<BabyBear, 4>`` via the stark-backend fork,
see SURVEY.md section 2 item 2 and /root/reference/Cargo.toml:88-100).

Inversion uses the quadratic-tower view
  F_p4 = F_p2[y]/(y^2 - u),  F_p2 = F_p[u]/(u^2 - 11),
with basis mapping (a0,a1,a2,a3) -> (a0 + a2 u) + (a1 + a3 u) y,
so one quartic inverse costs a few base muls + one base-field inverse.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import babybear as bb

W = 11  # binomial coefficient: x^4 = 11
DEG = 4


def w_mont() -> jnp.ndarray:
    return bb.to_mont(jnp.uint32(W))


def zero(shape=()) -> jnp.ndarray:
    return jnp.zeros((*shape, 4), dtype=jnp.uint32)


def one(shape=()) -> jnp.ndarray:
    o = jnp.zeros((*shape, 4), dtype=jnp.uint32)
    return o.at[..., 0].set(bb.R_MOD_P)


def from_base(a: jnp.ndarray) -> jnp.ndarray:
    """Embed base-field array (montgomery) into the extension (appends dim 4)."""
    out = jnp.zeros((*a.shape, 4), dtype=jnp.uint32)
    return out.at[..., 0].set(a)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return bb.add(a, b)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return bb.sub(a, b)


def neg(a: jnp.ndarray) -> jnp.ndarray:
    return bb.neg(a)


def scale(a: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Multiply extension element(s) by base-field scalar(s) (broadcasts)."""
    return bb.mont_mul(a, s[..., None])


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook quartic multiply mod x^4 - W (16 base muls + W-folds)."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    m = bb.mont_mul
    wm = w_mont()
    c0 = m(a0, b0)
    c0 = bb.add(c0, m(wm, bb.add(bb.add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = bb.add(m(a0, b1), m(a1, b0))
    c1 = bb.add(c1, m(wm, bb.add(m(a2, b3), m(a3, b2))))
    c2 = bb.add(bb.add(m(a0, b2), m(a1, b1)), m(a2, b0))
    c2 = bb.add(c2, m(wm, m(a3, b3)))
    c3 = bb.add(bb.add(m(a0, b3), m(a1, b2)), bb.add(m(a2, b1), m(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def mul_base(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Extension * base-field (b has no trailing 4-dim)."""
    return scale(a, b)


def sqr(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def pow(a: jnp.ndarray, e: int) -> jnp.ndarray:
    result = jnp.broadcast_to(one(a.shape[:-1]), a.shape).astype(jnp.uint32)
    base = a
    e = int(e)
    while e:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


def pow_scan(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """Square-and-multiply under lax.scan (small graph for huge exponents)."""
    bits = []
    e = int(e)
    while e:
        bits.append(e & 1)
        e >>= 1
    bits_arr = jnp.asarray(np.array(bits, dtype=np.bool_))

    def body(carry, bit):
        result, base = carry
        result = jnp.where(bit, mul(result, base), result)
        return (result, sqr(base)), None

    init = (jnp.broadcast_to(one(a.shape[:-1]), a.shape).astype(jnp.uint32), a)
    (result, _), _ = jax.lax.scan(body, init, bits_arr)
    return result


def _f2_mul(x0, x1, y0, y1):
    """(x0 + x1 u)(y0 + y1 u) with u^2 = W."""
    m = bb.mont_mul
    wm = w_mont()
    return (
        bb.add(m(x0, y0), m(wm, m(x1, y1))),
        bb.add(m(x0, y1), m(x1, y0)),
    )


@jax.jit
def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Quartic inverse via the quadratic tower. inv(0) = 0."""
    m = bb.mont_mul
    wm = w_mont()
    # A = a0 + a2 u ; B = a1 + a3 u ;  a = A + B y, y^2 = u
    A0, A1 = a[..., 0], a[..., 2]
    B0, B1 = a[..., 1], a[..., 3]
    # denom = A^2 - B^2 * u  in F_p2
    A2_0, A2_1 = _f2_mul(A0, A1, A0, A1)
    B2_0, B2_1 = _f2_mul(B0, B1, B0, B1)
    # B^2 * u = (B2_0 + B2_1 u) u = W*B2_1 + B2_0 u
    d0 = bb.sub(A2_0, m(wm, B2_1))
    d1 = bb.sub(A2_1, B2_0)
    # invert denom in F_p2: (d0 - d1 u) / (d0^2 - W d1^2)
    nrm = bb.sub(m(d0, d0), m(wm, m(d1, d1)))
    nrm_inv = bb.inv(nrm)
    i0 = m(d0, nrm_inv)
    i1 = m(bb.neg(d1), nrm_inv)
    # result = (A - B y) * denom^{-1} = (A*i) - (B*i) y
    r_a0, r_a1 = _f2_mul(A0, A1, i0, i1)
    nB0, nB1 = bb.neg(B0), bb.neg(B1)
    r_b0, r_b1 = _f2_mul(nB0, nB1, i0, i1)
    return jnp.stack([r_a0, r_b0, r_a1, r_b1], axis=-1)


# host-side helpers -----------------------------------------------------------


def py_mul(a, b):
    """Python-int quartic mul on canonical (non-Montgomery) 4-tuples."""
    c = [0] * 7
    for i in range(4):
        for j in range(4):
            c[i + j] += a[i] * b[j]
    for k in range(6, 3, -1):
        c[k - 4] += W * c[k]
    return tuple(x % bb.P for x in c[:4])


def py_inv(a):
    """Python-int quartic inverse (canonical form) for test cross-checks."""

    def f2mul(x, y):
        return ((x[0] * y[0] + W * x[1] * y[1]) % bb.P, (x[0] * y[1] + x[1] * y[0]) % bb.P)

    A = (a[0], a[2])
    B = (a[1], a[3])
    A2 = f2mul(A, A)
    B2 = f2mul(B, B)
    d = ((A2[0] - W * B2[1]) % bb.P, (A2[1] - B2[0]) % bb.P)
    import builtins

    nrm = (d[0] * d[0] - W * d[1] * d[1]) % bb.P
    ninv = builtins.pow(nrm, bb.P - 2, bb.P) if nrm else 0
    i = (d[0] * ninv % bb.P, (-d[1]) * ninv % bb.P)
    ra = f2mul(A, i)
    rb = f2mul(((-B[0]) % bb.P, (-B[1]) % bb.P), i)
    return (ra[0], rb[0], ra[1], rb[1])
