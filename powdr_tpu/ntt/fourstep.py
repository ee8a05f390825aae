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
drop-in for the ladder at large sizes.  The ladders run their stages in
fused groups of GROUP_STAGES radix-2 stages per HBM pass (radix-16 by
default), so a 12-stage ladder costs 3 passes over the array instead of
12.  Measured on the real chip at 2^24: plain ladder 60.2 ms -> four-step
6.1 ms -> fused groups 3.50 ms (4.79 Gelem/s).

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


#: butterfly stages fused per HBM pass (radix-2^g).  Each group of g
#: radix-2 stages becomes ONE slice->elementwise->concat expression that
#: XLA compiles to a single fusion: one read + one write of the array
#: instead of g.  The ladder is HBM-bound (measured: g=1 -> 6.2 ms at
#: 2^24 on v5e vs a ~3.7 GB/819 GB/s = 4.5 ms traffic floor), so larger
#: g is a near-linear win until VMEM/register pressure bites (g=4 is
#: 2^4 = 16 live chunks; measured best on v5e).
GROUP_STAGES = 4


def _dif_axis(x: jnp.ndarray, log_n: int, tables) -> jnp.ndarray:
    """DIF ladder along axis -2 of (B, n, M): natural -> bit-reversed.
    Trailing dim M stays intact at every stage, keeping lane layout wide.
    Stages run in fused groups of GROUP_STAGES (see above)."""
    B, n, M = x.shape
    flat = x
    s0 = 0
    while s0 < log_n:
        g = min(GROUP_STAGES, log_n - s0)
        H = n >> (s0 + g)  # chunk rows: the smallest half-size in the group
        y = flat.reshape(-1, (1 << g) * H, M)
        chunks = [y[:, i * H:(i + 1) * H, :] for i in range(1 << g)]
        for j in range(g):
            hc = 1 << (g - 1 - j)  # stage half-size, in chunks
            t = tables[s0 + j]
            tcs = [t[i * H:(i + 1) * H][None, :, None] for i in range(hc)]
            nxt = []
            for blk in range(0, 1 << g, 2 * hc):
                a = chunks[blk:blk + hc]
                b = chunks[blk + hc:blk + 2 * hc]
                nxt += [bb.add(a[i], b[i]) for i in range(hc)]
                nxt += [bb.mont_mul(bb.sub(a[i], b[i]), tcs[i]) for i in range(hc)]
            chunks = nxt
        flat = jnp.concatenate(chunks, axis=1).reshape(B, n, M)
        s0 += g
    return flat


def _dit_axis(x: jnp.ndarray, log_n: int, tables) -> jnp.ndarray:
    """DIT ladder along axis -2 of (B, n, M): bit-reversed -> natural.
    Same fused-group structure as _dif_axis, stages in reverse order."""
    B, n, M = x.shape
    flat = x
    hi_s = log_n  # stages [lo_s, hi_s) remain; execute descending
    while hi_s > 0:
        g = min(GROUP_STAGES, hi_s)
        s0 = hi_s - g
        H = n >> (s0 + g)
        y = flat.reshape(-1, (1 << g) * H, M)
        chunks = [y[:, i * H:(i + 1) * H, :] for i in range(1 << g)]
        for j in range(g - 1, -1, -1):
            hc = 1 << (g - 1 - j)
            t = tables[s0 + j]
            tcs = [t[i * H:(i + 1) * H][None, :, None] for i in range(hc)]
            nxt = []
            for blk in range(0, 1 << g, 2 * hc):
                a = chunks[blk:blk + hc]
                braw = chunks[blk + hc:blk + 2 * hc]
                b = [bb.mont_mul(braw[i], tcs[i]) for i in range(hc)]
                nxt += [bb.add(a[i], b[i]) for i in range(hc)]
                nxt += [bb.sub(a[i], b[i]) for i in range(hc)]
            chunks = nxt
        flat = jnp.concatenate(chunks, axis=1).reshape(B, n, M)
        hi_s = s0
    return flat


def fourstep_nat_to_rev(x: jnp.ndarray, t1, t2, mid) -> jnp.ndarray:
    """(..., n) natural input -> full bit-reversed output (DIF twiddles in
    t1/t2/mid; pass inverse tables for the iNTT direction, unscaled).

    Derivation: with i = i1*N2 + i2, k = k2*N1 + k1,
      X[k] = sum_{i2} w_N2^{i2 k2} [ w_N^{i2 k1} sum_{i1} x[i1,i2] w_N1^{i1 k1} ]
    Column DIF gives C[rev(k1), i2]; the mid table is pre-permuted to
    T[rev(k1), i2]; the second column DIF (after a transpose) gives
    F[rev(k2), rev(k1)]; transposing back yields row-major index
    rev_l1(k1)*N2 + rev_l2(k2) = rev_N(k).  The mid multiply fuses into
    the transpose copy for free (measured: folding it into the second
    ladder's first group instead is 0.7 ms SLOWER at 2^24 — the fold
    adds a 64 MB table read to the group's fusion)."""
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
