"""Four-step NTT with every butterfly stage running along a LEADING axis.

Why: the radix-2 ladder in ntt.py is near mont_mul-bound only while its
trailing (lane) dimension stays wide.  Profiling on v5e: one stage at
h = n/2 costs 0.32 ms at 2^24, but the full 24-stage ladder costs 60 ms —
the late stages reshape to (blocks, 2h) with tiny trailing dims and XLA
relayouts dominate.  The classic fix is Bailey's four-step: view the
length-N vector as an (N1, N2) matrix and do

    column DIF (axis -2, trailing dim N2 wide at every stage)
    -> elementwise mid twiddle  w_N^{k1*i2}
    -> transpose -> column DIF again -> transpose

With both DIFs emitting their digit in bit-reversed order, the final
row-major layout is exactly the full bit-reversal, so this is a bit-exact
drop-in for the ladder at large sizes.  Measured on the real chip:
60.2 ms -> 6.0 ms at 2^24 (2.8 Gelem/s).

Replaces the NTT/LDE the reference outsources to the stark-backend fork
(SURVEY.md §1 L5, /root/reference/Cargo.toml:88-100); this file is the
single-chip speed-of-light path, parallel/ntt.py shards the same
structure across a mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from .ntt import _stage_tables_np, _tracing, bitrev_indices

#: transforms with log_n >= this use the four-step path (below it the
#: plain ladder's relayout tax is small and compile time wins)
MIN_LOG_FOURSTEP = 14


def _split(log_n: int) -> tuple[int, int]:
    l1 = (log_n + 1) // 2
    return l1, log_n - l1


@functools.lru_cache(maxsize=None)
def _mid_table_np(log_n: int, inverse: bool) -> np.ndarray:
    """(N1, N2) Montgomery table  T[rev(k1), i2] = w_N^{k1 * i2}."""
    l1, l2 = _split(log_n)
    N1, N2 = 1 << l1, 1 << l2
    w = bb.py_root_of_unity(log_n)
    if inverse:
        w = pow(w, bb.P - 2, bb.P)
    rev = bitrev_indices(l1)
    # w1[r] = w^{rev(r)}
    w1 = np.ones(N1, dtype=np.uint64)
    e = rev.astype(np.uint64).copy()
    b = np.uint64(w % bb.P)
    while e.max(initial=0) > 0:
        sel = (e & 1) == 1
        w1[sel] = w1[sel] * b % bb.P
        b = b * b % bb.P
        e >>= np.uint64(1)
    out = np.empty((N1, N2), dtype=np.uint64)
    col = np.ones(N1, dtype=np.uint64)
    for c in range(N2):
        out[:, c] = col
        col = col * w1 % bb.P
    return bb.np_to_mont(out.astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _mid_table_device(log_n: int, inverse: bool):
    return jax.device_put(jnp.asarray(_mid_table_np(log_n, inverse)))


def _mid_table(log_n: int, inverse: bool):
    if _tracing():
        return jnp.asarray(_mid_table_np(log_n, inverse))
    return _mid_table_device(log_n, inverse)


@functools.lru_cache(maxsize=None)
def _axis_tables_device(log_n: int, inverse: bool):
    return tuple(jax.device_put(jnp.asarray(t)) for t in _stage_tables_np(log_n, inverse))


def _axis_tables(log_n: int, inverse: bool):
    if _tracing():
        return tuple(jnp.asarray(t) for t in _stage_tables_np(log_n, inverse))
    return _axis_tables_device(log_n, inverse)


def tables_for(log_n: int, inverse: bool):
    """(t1, t2, mid) jit-argument pytree for the impl functions."""
    l1, l2 = _split(log_n)
    return (
        _axis_tables(l1, inverse),
        _axis_tables(l2, inverse),
        _mid_table(log_n, inverse),
    )


def _dif_axis(x: jnp.ndarray, log_n: int, tables) -> jnp.ndarray:
    """DIF ladder along axis -2 of (B, n, M): natural -> bit-reversed.
    Trailing dim M stays intact at every stage, keeping lane layout wide."""
    B, n, M = x.shape
    flat = x
    for s in range(log_n):
        h = n >> (s + 1)
        y = flat.reshape(-1, 2 * h, M)
        a, b = y[:, :h, :], y[:, h:, :]
        lo = bb.add(a, b)
        hi = bb.mont_mul(bb.sub(a, b), tables[s][None, :, None])
        flat = jnp.concatenate([lo, hi], axis=1).reshape(B, n, M)
    return flat


def _dit_axis(x: jnp.ndarray, log_n: int, tables) -> jnp.ndarray:
    """DIT ladder along axis -2 of (B, n, M): bit-reversed -> natural."""
    B, n, M = x.shape
    flat = x
    for s in range(log_n - 1, -1, -1):
        h = n >> (s + 1)
        y = flat.reshape(-1, 2 * h, M)
        a = y[:, :h, :]
        b = bb.mont_mul(y[:, h:, :], tables[s][None, :, None])
        flat = jnp.concatenate([bb.add(a, b), bb.sub(a, b)], axis=1).reshape(B, n, M)
    return flat


def fourstep_nat_to_rev(x: jnp.ndarray, t1, t2, mid) -> jnp.ndarray:
    """(..., n) natural input -> full bit-reversed output (DIF twiddles in
    t1/t2/mid; pass inverse tables for the iNTT direction, unscaled).

    Derivation: with i = i1*N2 + i2, k = k2*N1 + k1,
      X[k] = sum_{i2} w_N2^{i2 k2} [ w_N^{i2 k1} sum_{i1} x[i1,i2] w_N1^{i1 k1} ]
    Column DIF gives C[rev(k1), i2]; the mid table is pre-permuted to
    T[rev(k1), i2]; the second column DIF (after a transpose) gives
    F[rev(k2), rev(k1)]; transposing back yields row-major index
    rev_l1(k1)*N2 + rev_l2(k2) = rev_N(k)."""
    N1, N2 = mid.shape
    l1, l2 = int(np.log2(N1)), int(np.log2(N2))
    batch = x.shape[:-1]
    A = x.reshape(-1, N1, N2)
    C = _dif_axis(A, l1, t1)
    C = bb.mont_mul(C, mid[None])
    Ct = jnp.swapaxes(C, 1, 2)
    F = _dif_axis(Ct, l2, t2)
    return jnp.swapaxes(F, 1, 2).reshape(*batch, N1 * N2)


def fourstep_rev_to_nat(x: jnp.ndarray, t1, t2, mid) -> jnp.ndarray:
    """(..., n) full bit-reversed input -> natural output (DIT ladders);
    exact inverse dataflow of fourstep_nat_to_rev."""
    N1, N2 = mid.shape
    l1, l2 = int(np.log2(N1)), int(np.log2(N2))
    batch = x.shape[:-1]
    flat = x.reshape(-1, N1, N2)
    F = jnp.swapaxes(flat, 1, 2)  # (B, N2=rev(k2), N1=rev(k1))
    Ct = _dit_axis(F, l2, t2)  # natural i2 rows
    C = jnp.swapaxes(Ct, 1, 2)  # (B, rev(k1), i2)
    C = bb.mont_mul(C, mid[None])
    A = _dit_axis(C, l1, t1)  # natural i1
    return A.reshape(*batch, N1 * N2)
