"""Pallas fused four-step NTT.

The XLA ladder materializes every butterfly stage through HBM (24 round
trips at 2^24) and its measured ceiling is ~15 G butterflies/s.  This
kernel runs an entire 12-stage row ladder inside VMEM per grid step, so a
2^24 transform is two kernel passes + two transposes:

    x.reshape(R, R)  [A[n2, n1]]
      --T--> rows n1  --k1: 12-stage ladder over n2-->  C[n1, rev(k2)]
      --T--> rows rev(k2) --k2: fused mid-twiddle + ladder over n1-->
    E[rev(k2), rev(k1)]  == full bit-reversal of the DFT (exactly
    ntt_natural_to_rev's output; see the digit/bit-order proof in
    ntt/mxu.py — with both digits 12 bits the concatenated digit
    reversal IS rev24).

Butterflies avoid in-kernel reshapes (Mosaic-unfriendly for small
trailing dims): stage s pairs lanes j and j+h via pltpu.roll along the
lane axis and a static half-block mask, with per-stage full-width twiddle
tables (value 1 on 'lo' lanes), all precomputed host-side in Montgomery
form.  (SURVEY.md §7 step 3: the fused-stage Pallas deliverable.)

STATUS: bit-exact vs the ladder at every size including 2^24 on real
hardware, but currently ~27x SLOWER — pltpu.roll with large shifts is a
cross-lane relayout, not a cheap rotation, and 24 of them per tile
dominate.  Round-2 fix (ROADMAP #1): replace rolls with half-slice
reshapes while h >= 128 and an in-tile transpose for the tail stages, so
every butterfly is a contiguous slice.  Kept as the validated correctness
scaffold for that work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import babybear as bb
from .ntt import _root_table, bitrev_indices

LOG_R = 12
R = 1 << LOG_R
TILE_ROWS = 256


@functools.lru_cache(maxsize=None)
def _stage_tw_full(log_r: int, inverse: bool) -> np.ndarray:
    """(log_r, 2^log_r) per-stage lane twiddles: position j gets
    w_m^{j mod h} on 'hi' lanes (j mod 2h >= h), 1 on 'lo' lanes."""
    r = 1 << log_r
    base = _root_table(log_r, inverse).astype(np.uint64)  # w^j Montgomery, j < r/2
    out = np.empty((log_r, r), dtype=np.uint32)
    mont_one = bb.py_to_mont(1)
    for s in range(log_r):
        h = r >> (s + 1)
        tw = np.full(r, mont_one, dtype=np.uint64)
        j = np.arange(r)
        hi = (j % (2 * h)) >= h
        # twiddle index for lane j (hi): (j mod 2h) - h, stage stride 2^s
        tw[hi] = base[((j[hi] % (2 * h)) - h) << s]
        out[s] = tw.astype(np.uint32)
    return out


@functools.lru_cache(maxsize=None)
def _mid_twiddle(log_n: int, inverse: bool, log_r: int = LOG_R) -> np.ndarray:
    """(r, r) table T[n1, rev(k2)] = w_n^{n1*k2}, Montgomery."""
    R = 1 << log_r
    n = 1 << log_n
    w = bb.py_root_of_unity(log_n)
    if inverse:
        w = pow(w, bb.P - 2, bb.P)
    rev = bitrev_indices(log_r)
    n1 = np.arange(R, dtype=np.uint64)
    cols = np.empty((R, R), dtype=np.uint64)
    # T[:, pos] = w^{n1 * k2} with k2 = rev(pos); build by columns via
    # per-column pow (vectorized over n1 with the bit trick)
    k2s = rev.astype(np.uint64)
    # exponent matrix would be R^2 = 16M entries * python pow — instead
    # compute row-wise: row n1 is a geometric sequence (w^{n1})^{k2}
    wn1 = np.ones(R, dtype=np.uint64)
    acc = np.ones(R, dtype=np.uint64)
    b = w % bb.P
    e = n1.copy()
    while e.max() > 0:
        sel = (e & 1) == 1
        wn1[sel] = wn1[sel] * b % bb.P
        b = b * b % bb.P
        e >>= 1
    for i in range(R):
        base = int(wn1[i])
        row = np.ones(R, dtype=np.uint64)
        bk = base
        ee = k2s.copy()
        while ee.max() > 0:
            sel = (ee & 1) == 1
            row[sel] = row[sel] * bk % bb.P
            bk = bk * bk % bb.P
            ee >>= 1
        cols[i] = row
    return bb.np_to_mont(cols.astype(np.uint32))


def _ladder_body(x, tw_ref, log_r):
    for s in range(log_r):
        h = (1 << log_r) >> (s + 1)
        tw = tw_ref[s, :]
        r = 1 << log_r
        left = pltpu.roll(x, r - h, 1)  # partner for lo lanes: x[j+h]
        right = pltpu.roll(x, h, 1)  # partner for hi lanes: x[j-h]
        lane = jax.lax.broadcasted_iota(jnp.uint32, x.shape, 1)
        is_lo = (lane % (2 * h)) < h
        lo_val = bb.add(x, left)
        hi_val = bb.mont_mul(bb.sub(right, x), tw[None, :])
        x = jnp.where(is_lo, lo_val, hi_val)
    return x


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.lru_cache(maxsize=None)
def make_ntt2d(log_r: int, tile_rows: int = TILE_ROWS):
    """Jitted 2^(2*log_r)-point NTT (natural Montgomery in, full-bitrev
    out) from two fused Pallas row-ladder passes."""
    r = 1 << log_r
    tile = min(tile_rows, r)

    def row_ntt_kernel(x_ref, tw_ref, o_ref):
        o_ref[:] = _ladder_body(x_ref[:], tw_ref, log_r)

    def row_ntt_mid_kernel(x_ref, tw_ref, mid_ref, o_ref):
        x = bb.mont_mul(x_ref[:], mid_ref[:])
        o_ref[:] = _ladder_body(x, tw_ref, log_r)

    def row_call(kernel, arrays, n_in):
        grid = (r // tile,)
        specs = [
            pl.BlockSpec((tile, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((log_r, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        if n_in == 3:
            specs.append(pl.BlockSpec((tile, r), lambda i: (i, 0), memory_space=pltpu.VMEM))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, r), jnp.uint32),
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((tile, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(*arrays)

    @jax.jit
    def impl(x, stage_tw, mid_tw_t):
        a = x.reshape(r, r)  # A[n2, n1]
        b = jnp.swapaxes(a, 0, 1)  # rows n1
        c = row_call(row_ntt_kernel, (b, stage_tw), 2)  # C[n1, rev(k2)]
        d = jnp.swapaxes(c, 0, 1)  # rows rev(k2), cols n1
        e = row_call(row_ntt_mid_kernel, (d, stage_tw, mid_tw_t), 3)
        return e.reshape(-1)  # E[rev(k2), rev(k1)] = full bitrev

    def run(x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-1] == r * r
        stage_tw = jnp.asarray(_stage_tw_full(log_r, False))
        mid_t = jnp.asarray(np.swapaxes(_mid_twiddle(2 * log_r, False, log_r), 0, 1).copy())
        return impl(x, stage_tw, mid_t)

    return run


def ntt24_nat_to_rev(x: jnp.ndarray) -> jnp.ndarray:
    """2^24-point NTT, natural Montgomery input -> bit-reversed output
    (identical to ntt_natural_to_rev), via the fused Pallas four-step."""
    return make_ntt2d(LOG_R)(x)
