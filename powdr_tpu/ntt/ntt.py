"""Radix-2 NTT / inverse NTT / coset LDE over BabyBear, TPU-first.

Design (SURVEY.md §7 step 3): vectorized butterfly stages expressed as
reshape + slice so XLA maps them onto full VPU lanes; twiddle tables are
precomputed host-side (numpy, Montgomery form) and closed over as constants.
Forward DIF maps natural order -> bit-reversed order; inverse DIT maps
bit-reversed -> natural, so a round-trip needs no explicit permutation.
Explicit bit-reversal is a single precomputed gather when an API requires
natural-order evaluations.

This replaces the NTT/LDE the reference outsources to the openvm
stark-backend fork (SURVEY.md §1 L5, /root/reference/Cargo.toml:88-100).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb

# ---------------------------------------------------------------------------
# host-side tables


@functools.lru_cache(maxsize=None)
def _root_table(log_n: int, inverse: bool) -> np.ndarray:
    """w^j (Montgomery, uint32) for j in [0, n/2), w = 2^log_n-th root."""
    n = 1 << log_n
    w = bb.py_root_of_unity(log_n)
    if inverse:
        w = pow(w, bb.P - 2, bb.P)
    out = np.ones(max(n // 2, 1), dtype=np.uint64)
    wk = w
    j = np.arange(max(n // 2, 1), dtype=np.uint64)
    for bit in range(max(log_n - 1, 0)):
        sel = (j >> bit) & 1 == 1
        out[sel] = out[sel] * wk % bb.P
        wk = wk * wk % bb.P
    return bb.np_to_mont(out.astype(np.uint32))


@functools.lru_cache(maxsize=None)
def bitrev_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _shift_powers(log_n: int, shift: int, inverse: bool) -> np.ndarray:
    """shift^j (Montgomery) for j in [0, 2^log_n) — coset scaling table."""
    n = 1 << log_n
    s = pow(shift, bb.P - 2, bb.P) if inverse else shift % bb.P
    out = np.ones(n, dtype=np.uint64)
    sk = s
    j = np.arange(n, dtype=np.uint64)
    for bit in range(log_n):
        sel = (j >> bit) & 1 == 1
        out[sel] = out[sel] * sk % bb.P
        sk = sk * sk % bb.P
    return bb.np_to_mont(out.astype(np.uint32))


# ---------------------------------------------------------------------------
# device-side transforms.  x: (..., n) uint32 Montgomery; batch dims leading.
#
# Twiddle tables are uploaded once per (log_n, inverse) and passed as traced
# arguments — embedding them as HLO constants makes XLA compiles explode at
# large n (the tables total ~n words).


@functools.lru_cache(maxsize=None)
def _root_table_device(log_n: int, inverse: bool):
    import jax

    return jax.device_put(jnp.asarray(_root_table(log_n, inverse)))


def _dif(x: jnp.ndarray, log_n: int, inverse: bool, table=None) -> jnp.ndarray:
    """Decimation-in-frequency: natural input -> bit-reversed output."""
    n = 1 << log_n
    batch = x.shape[:-1]
    if table is None:
        table = _root_table_device(log_n, inverse)  # (n/2,) roots of order n
    for s in range(log_n):
        m = n >> s  # current block size
        h = m >> 1
        tw = table[:: 1 << s]  # w_m^j, j in [0, h)
        y = x.reshape(*batch, -1, 2, h)
        a = y[..., 0, :]
        b = y[..., 1, :]
        lo = bb.add(a, b)
        hi = bb.mont_mul(bb.sub(a, b), tw)
        x = jnp.stack([lo, hi], axis=-2).reshape(*batch, n)
    return x


def _dit(x: jnp.ndarray, log_n: int, inverse: bool, table=None) -> jnp.ndarray:
    """Decimation-in-time: bit-reversed input -> natural output."""
    n = 1 << log_n
    batch = x.shape[:-1]
    if table is None:
        table = _root_table_device(log_n, inverse)
    for s in range(log_n - 1, -1, -1):
        m = n >> s
        h = m >> 1
        tw = table[:: 1 << s]
        y = x.reshape(*batch, -1, 2, h)
        a = y[..., 0, :]
        b = bb.mont_mul(y[..., 1, :], tw)
        lo = bb.add(a, b)
        hi = bb.sub(a, b)
        x = jnp.stack([lo, hi], axis=-2).reshape(*batch, n)
    return x


@functools.lru_cache(maxsize=None)
def _bitrev_device(log_n: int):
    return jax.device_put(jnp.asarray(bitrev_indices(log_n)))


@functools.lru_cache(maxsize=None)
def _shift_powers_device(log_n: int, shift: int, inverse: bool):
    return jax.device_put(jnp.asarray(_shift_powers(log_n, shift, inverse)))


def ntt_natural_to_rev(x: jnp.ndarray) -> jnp.ndarray:
    log_n = int(np.log2(x.shape[-1]))
    return _dif(x, log_n, inverse=False)


def intt_rev_to_natural(x: jnp.ndarray) -> jnp.ndarray:
    log_n = int(np.log2(x.shape[-1]))
    y = _dit(x, log_n, inverse=True)
    n_inv = bb.py_to_mont(pow(1 << log_n, bb.P - 2, bb.P))
    return bb.mont_mul(y, jnp.uint32(n_inv))


def bitrev(x: jnp.ndarray) -> jnp.ndarray:
    log_n = int(np.log2(x.shape[-1]))
    return jnp.take(x, _bitrev_device(log_n), axis=-1)


@jax.jit
def _ntt_impl(x, table, rev_idx):
    log_n = int(np.log2(x.shape[-1]))
    return jnp.take(_dif(x, log_n, False, table), rev_idx, axis=-1)


@jax.jit
def _intt_impl(x, table, rev_idx):
    log_n = int(np.log2(x.shape[-1]))
    y = _dit(jnp.take(x, rev_idx, axis=-1), log_n, True, table)
    n_inv = bb.py_to_mont(pow(1 << log_n, bb.P - 2, bb.P))
    return bb.mont_mul(y, jnp.uint32(n_inv))


def ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT, natural in / natural out (coeffs -> evals over H).

    Twiddle/bitrev tables travel as jit arguments, not HLO constants."""
    log_n = int(np.log2(x.shape[-1]))
    return _ntt_impl(x, _root_table_device(log_n, False), _bitrev_device(log_n))


def intt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT, natural in / natural out (evals over H -> coeffs)."""
    log_n = int(np.log2(x.shape[-1]))
    return _intt_impl(x, _root_table_device(log_n, True), _bitrev_device(log_n))


@functools.partial(jax.jit, static_argnums=(1,))
def _coset_lde_impl(x, log_blowup, itable, irev, sp, ftable, frev):
    n = x.shape[-1]
    log_n = int(np.log2(n))
    coeffs = _intt_impl.__wrapped__(x, itable, irev)
    coeffs = bb.mont_mul(coeffs, sp)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n * ((1 << log_blowup) - 1))]
    coeffs = jnp.pad(coeffs, pad)
    return _ntt_impl.__wrapped__(coeffs, ftable, frev)


def coset_lde(
    x: jnp.ndarray, log_blowup: int, shift: int = bb.GENERATOR
) -> jnp.ndarray:
    """Low-degree extension of evaluations over H (size n, natural order) to
    evaluations over the coset shift*K (K of size n*2^log_blowup, natural).

    evals -> intt -> scale coeff_i by shift^i -> zero-pad -> ntt.
    """
    n = x.shape[-1]
    log_n = int(np.log2(n))
    log_N = log_n + log_blowup
    return _coset_lde_impl(
        x,
        log_blowup,
        _root_table_device(log_n, True),
        _bitrev_device(log_n),
        _shift_powers_device(log_n, shift, False),
        _root_table_device(log_N, False),
        _bitrev_device(log_N),
    )


def eval_poly_at_ext(coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Evaluate poly with base-field coeffs (..., n) at extension point z (4,)
    via Horner over a scan (tight sequential chain; used only for openings)."""
    from ..field import ext

    n = coeffs.shape[-1]

    def body(acc, c):
        return ext.add(ext.mul(acc, z), ext.from_base(c)), None

    rev = jnp.moveaxis(coeffs, -1, 0)[::-1]
    acc0 = ext.zero(coeffs.shape[:-1])
    acc, _ = jax.lax.scan(body, acc0, rev)
    return acc
