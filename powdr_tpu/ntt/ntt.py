"""Radix-2 NTT / inverse NTT / coset LDE over BabyBear, TPU-first.

Design rules learned from the hardware (SURVEY.md §7 step 3):
  * butterfly stages are 2D slice+concat on (blocks, 2h) views — the
    3D reshape+stack formulation made XLA layout passes explode
    (90s+ compiles at 2^20 vs ~4s for this form);
  * twiddles are per-stage contiguous arrays passed as jit arguments —
    strided slicing of one big table costs more at runtime than the
    butterflies themselves, and HLO-constant tables blow up compiles;
  * the coset-LDE pipeline is gather-free: DIF-inverse leaves
    coefficients in bit-reversed order, the zero-pad to the big domain is
    a regular stride interleave (rev_N(i) = rev_n(i) * blowup for i < n),
    and DIT-forward consumes bit-reversed input directly.  Data at rest
    (trace evals, LDE rows) is always in natural order; explicit bitrev
    gathers only appear in small/cold paths.

Replaces the NTT/LDE the reference outsources to the openvm
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


def _tracing() -> bool:
    """True while inside a jit trace — device_put there would leak tracers
    into the host-side caches."""
    from jax._src import core as _core

    return not _core.trace_state_clean()


@functools.lru_cache(maxsize=None)
def _stage_tables_np(log_n: int, inverse: bool):
    base = _root_table(log_n, inverse)
    return tuple(np.ascontiguousarray(base[:: 1 << s]) for s in range(log_n))


@functools.lru_cache(maxsize=None)
def _stage_tables_device(log_n: int, inverse: bool):
    return tuple(jax.device_put(jnp.asarray(t)) for t in _stage_tables_np(log_n, inverse))


def _stage_tables(log_n: int, inverse: bool):
    """Per-stage contiguous twiddle arrays (stage s of DIF uses w_m^j =
    table[::2^s], materialized contiguously).  Device-cached when called
    eagerly; plain constants when called under an active trace."""
    if _tracing():
        return tuple(jnp.asarray(t) for t in _stage_tables_np(log_n, inverse))
    return _stage_tables_device(log_n, inverse)


@functools.lru_cache(maxsize=None)
def bitrev_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _bitrev_device_cached(log_n: int):
    return jax.device_put(jnp.asarray(bitrev_indices(log_n)))


def _bitrev_device(log_n: int):
    if _tracing():
        return jnp.asarray(bitrev_indices(log_n))
    return _bitrev_device_cached(log_n)


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


@functools.lru_cache(maxsize=None)
def _shift_powers_rev_np(log_n: int, shift: int, inverse: bool) -> np.ndarray:
    return np.ascontiguousarray(_shift_powers(log_n, shift, inverse)[bitrev_indices(log_n)])


@functools.lru_cache(maxsize=None)
def _shift_powers_rev_cached(log_n: int, shift: int, inverse: bool):
    return jax.device_put(jnp.asarray(_shift_powers_rev_np(log_n, shift, inverse)))


def _shift_powers_rev_device(log_n: int, shift: int, inverse: bool):
    """shift^rev(j) — for scaling coefficients held in bit-reversed order."""
    if _tracing():
        return jnp.asarray(_shift_powers_rev_np(log_n, shift, inverse))
    return _shift_powers_rev_cached(log_n, shift, inverse)


@functools.lru_cache(maxsize=None)
def _n_inv_mont(log_n: int) -> int:
    return bb.py_to_mont(pow(1 << log_n, bb.P - 2, bb.P))


# ---------------------------------------------------------------------------
# device-side butterfly ladders.  x: (..., n) uint32 Montgomery.


def _dif(x: jnp.ndarray, log_n: int, tables) -> jnp.ndarray:
    """Decimation-in-frequency: natural input -> bit-reversed output."""
    n = 1 << log_n
    batch = x.shape[:-1]
    flat = x.reshape(-1, n)
    for s in range(log_n):
        h = n >> (s + 1)
        y = flat.reshape(-1, 2 * h)
        a, b = y[:, :h], y[:, h:]
        lo = bb.add(a, b)
        hi = bb.mont_mul(bb.sub(a, b), tables[s][None, :])
        flat = jnp.concatenate([lo, hi], axis=1).reshape(-1, n)
    return flat.reshape(*batch, n)


def _dit(x: jnp.ndarray, log_n: int, tables) -> jnp.ndarray:
    """Decimation-in-time: bit-reversed input -> natural output."""
    n = 1 << log_n
    batch = x.shape[:-1]
    flat = x.reshape(-1, n)
    for s in range(log_n - 1, -1, -1):
        h = n >> (s + 1)
        y = flat.reshape(-1, 2 * h)
        a = y[:, :h]
        b = bb.mont_mul(y[:, h:], tables[s][None, :])
        flat = jnp.concatenate([bb.add(a, b), bb.sub(a, b)], axis=1).reshape(-1, n)
    return flat.reshape(*batch, n)


# jitted impls: tables travel as arguments (pytrees of per-stage arrays)


@jax.jit
def _ntt_nat_to_rev_impl(x, tables):
    return _dif(x, int(np.log2(x.shape[-1])), tables)


@jax.jit
def _intt_rev_to_nat_impl(x, tables):
    log_n = int(np.log2(x.shape[-1]))
    y = _dit(x, log_n, tables)
    return bb.mont_mul(y, jnp.uint32(_n_inv_mont(log_n)))


@jax.jit
def _ntt_rev_to_nat_impl(x, tables):
    """Forward transform consuming bit-reversed coefficients (DIT)."""
    return _dit(x, int(np.log2(x.shape[-1])), tables)


@jax.jit
def _intt_nat_to_rev_impl(x, tables):
    """Inverse transform emitting bit-reversed coefficients (DIF w/ w^-1)."""
    log_n = int(np.log2(x.shape[-1]))
    y = _dif(x, log_n, tables)
    return bb.mont_mul(y, jnp.uint32(_n_inv_mont(log_n)))


def _use_fourstep(log_n: int) -> bool:
    from . import fourstep

    return log_n >= fourstep.MIN_LOG_FOURSTEP


@jax.jit
def _fs_nat_to_rev_impl(x, t1, t2, mid):
    from . import fourstep

    return fourstep.fourstep_nat_to_rev(x, t1, t2, mid)


@jax.jit
def _fs_rev_to_nat_impl(x, t1, t2, mid):
    from . import fourstep

    return fourstep.fourstep_rev_to_nat(x, t1, t2, mid)


@jax.jit
def _fs_nat_to_rev_scaled_impl(x, t1, t2, mid, scale):
    from . import fourstep

    return bb.mont_mul(fourstep.fourstep_nat_to_rev(x, t1, t2, mid), scale)


def ntt_natural_to_rev(x: jnp.ndarray) -> jnp.ndarray:
    log_n = int(np.log2(x.shape[-1]))
    if _use_fourstep(log_n):
        from . import fourstep

        return _fs_nat_to_rev_impl(x, *fourstep.tables_for(log_n, False))
    return _ntt_nat_to_rev_impl(x, _stage_tables(log_n, False))


def intt_rev_to_natural(x: jnp.ndarray) -> jnp.ndarray:
    log_n = int(np.log2(x.shape[-1]))
    if _use_fourstep(log_n):
        from . import fourstep

        # rev->nat DIT with inverse twiddles, then the 1/n scale
        y = _fs_rev_to_nat_impl(x, *fourstep.tables_for(log_n, True))
        return bb.mont_mul(y, jnp.uint32(_n_inv_mont(log_n)))
    return _intt_rev_to_nat_impl(x, _stage_tables(log_n, True))


def bitrev(x: jnp.ndarray) -> jnp.ndarray:
    """Explicit bit-reversal gather — cold paths only (slow on TPU)."""
    log_n = int(np.log2(x.shape[-1]))
    return jnp.take(x, _bitrev_device(log_n), axis=-1)


def ntt(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT, natural in / natural out (coeffs -> evals over H)."""
    return bitrev(ntt_natural_to_rev(x))


def intt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT, natural in / natural out (evals over H -> coeffs)."""
    return intt_rev_to_natural(bitrev(x))


# ---------------------------------------------------------------------------
# gather-free coset LDE


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _coset_lde_impl(x, log_blowup, fs_in, fs_out, inv_tables, sp_rev, fwd_tables):
    from . import fourstep

    n = x.shape[-1]
    log_n = int(np.log2(n))
    blowup = 1 << log_blowup
    # natural evals -> bit-reversed coefficients
    if fs_in:
        coeffs_rev = fourstep.fourstep_nat_to_rev(x, *inv_tables)
    else:
        coeffs_rev = _dif(x, log_n, inv_tables)
    # merged scale: shift^rev(i) * 1/n in bit-reversed layout
    coeffs_rev = bb.mont_mul(coeffs_rev, sp_rev)
    # zero-pad in rev_N layout: rev_N(i) = rev_n(i) * blowup for i < n
    pad_shape = [(0, 0)] * (x.ndim - 1) + [(0, 0), (0, blowup - 1)]
    padded = jnp.pad(coeffs_rev[..., :, None], pad_shape).reshape(*x.shape[:-1], n * blowup)
    # bit-reversed coefficients -> natural evaluations
    if fs_out:
        return fourstep.fourstep_rev_to_nat(padded, *fwd_tables)
    return _dit(padded, log_n + log_blowup, fwd_tables)


@functools.lru_cache(maxsize=None)
def _shift_powers_rev_scaled_np(log_n: int, shift: int) -> np.ndarray:
    """shift^rev(j) / n (Montgomery) — the iNTT 1/n scale merged into the
    coset-scale table so the LDE pipeline does one sweep, not two."""
    tab = _shift_powers_rev_np(log_n, shift, False).astype(np.uint64)  # Montgomery
    n_inv = pow(1 << log_n, bb.P - 2, bb.P)
    # mont(x) * n_inv mod p == mont(x / n)
    return (tab * n_inv % bb.P).astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _shift_powers_rev_scaled_cached(log_n: int, shift: int):
    return jax.device_put(jnp.asarray(_shift_powers_rev_scaled_np(log_n, shift)))


def _shift_powers_rev_scaled_device(log_n: int, shift: int):
    if _tracing():
        return jnp.asarray(_shift_powers_rev_scaled_np(log_n, shift))
    return _shift_powers_rev_scaled_cached(log_n, shift)


def coset_lde(x: jnp.ndarray, log_blowup: int, shift: int = bb.GENERATOR) -> jnp.ndarray:
    """Evals over H (natural) -> evals over coset shift*K (natural), no
    gathers: intt-to-rev, rev-layout scale+pad, DIT forward."""
    from . import fourstep

    log_n = int(np.log2(x.shape[-1]))
    log_N = log_n + log_blowup
    fs_in, fs_out = _use_fourstep(log_n), _use_fourstep(log_N)
    inv_t = fourstep.tables_for(log_n, True) if fs_in else _stage_tables(log_n, True)
    fwd_t = fourstep.tables_for(log_N, False) if fs_out else _stage_tables(log_N, False)
    return _coset_lde_impl(
        x,
        log_blowup,
        fs_in,
        fs_out,
        inv_t,
        _shift_powers_rev_scaled_device(log_n, shift),
        fwd_t,
    )


# -- coefficient access for prover paths -------------------------------------


def interpolate_rev(x: jnp.ndarray) -> jnp.ndarray:
    """Natural evals over H -> coefficients in bit-reversed order."""
    log_n = int(np.log2(x.shape[-1]))
    if _use_fourstep(log_n):
        from . import fourstep

        return _fs_nat_to_rev_scaled_impl(
            x, *fourstep.tables_for(log_n, True), jnp.uint32(_n_inv_mont(log_n))
        )
    return _intt_nat_to_rev_impl(x, _stage_tables(log_n, True))


def evaluate_from_rev(coeffs_rev: jnp.ndarray) -> jnp.ndarray:
    """Bit-reversed coefficients -> natural evals over H."""
    log_n = int(np.log2(coeffs_rev.shape[-1]))
    if _use_fourstep(log_n):
        from . import fourstep

        return _fs_rev_to_nat_impl(coeffs_rev, *fourstep.tables_for(log_n, False))
    return _ntt_rev_to_nat_impl(coeffs_rev, _stage_tables(log_n, False))


def eval_poly_at_ext(coeffs: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Evaluate poly with base-field coeffs (..., n) at extension point z (4,)
    via Horner over a scan (tight sequential chain; used only for openings)."""
    from ..field import ext

    def body(acc, c):
        return ext.add(ext.mul(acc, z), ext.from_base(c)), None

    rev = jnp.moveaxis(coeffs, -1, 0)[::-1]
    acc0 = ext.zero(coeffs.shape[:-1])
    acc, _ = jax.lax.scan(body, acc0, rev)
    return acc
