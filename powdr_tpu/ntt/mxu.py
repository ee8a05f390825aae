"""MXU (systolic-array) NTT: mixed-radix decimation with the per-digit
DFTs executed as u8-limb integer matmuls on the matrix unit.

The radix-2 ladder is VPU-compute-bound (~15 G butterflies/s on v5e —
each Montgomery multiply is ~10 integer multiplies on 16-bit limb
halves).  The MXU runs int8 contractions at ~90 Tops, so an R-point DFT
as a matmul costs R MACs/element/pass on hardware with ~200x the integer
throughput.  Decomposition (SURVEY.md §7 'hard parts' #2: this is the
31-bit-modular-arithmetic-on-TPU answer for bulk transforms):

  * split log_n into digits of at most 7 bits (R <= 128 keeps the
    int32 accumulator exact: K*255^2 < 2^31 for K <= 128);
  * per pass: reshape (B, R, M), contract the R axis with the R-point
    DFT matrix — 4x4 u8 limb pairs -> 16 int8 matmuls accumulated in
    int32 (exact), recombined mod p with Montgomery-shifted constants;
  * twiddle multiply w_{RM}^{n1 * k}, then transpose k into the batch;
  * DFT matrix rows and twiddle columns are pre-permuted by the
    within-digit bit-reversal so the final output order is EXACTLY the
    full bit-reversal — a drop-in replacement for ntt_natural_to_rev.

Everything here is in canonical (non-Montgomery) uint32 form; twiddle
and recombination constants are pre-multiplied by 2^32 mod p so each
mont_mul lands back in canonical form.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from .ntt import _tracing, bitrev_indices

P = bb.P


def digit_plan(log_n: int, max_log_r: int = 7) -> Tuple[int, ...]:
    """Split log_n into digits <= max_log_r, largest first."""
    out = []
    rem = log_n
    while rem > 0:
        d = min(max_log_r, rem)
        out.append(d)
        rem -= d
    return tuple(out)


def _rev_bits(i: int, bits: int) -> int:
    r = 0
    for b in range(bits):
        r |= ((i >> b) & 1) << (bits - 1 - b)
    return r


@functools.lru_cache(maxsize=None)
def _dft_matrix_np(log_r: int, log_n_cur: int, inverse: bool) -> np.ndarray:
    """Row-permuted R-point DFT matrix: W[k, n] = w_R^{rev(k) * n}
    (canonical), where w_R = (2^log_n_cur root)^{n_cur / R}."""
    R = 1 << log_r
    w = bb.py_root_of_unity(log_r)
    if inverse:
        w = pow(w, P - 2, P)
    out = np.zeros((R, R), dtype=np.uint32)
    for k in range(R):
        kk = _rev_bits(k, log_r)
        for n in range(R):
            out[k, n] = pow(w, kk * n % R, P)
    return out


@functools.lru_cache(maxsize=None)
def _twiddle_np(log_r: int, log_m: int, inverse: bool) -> np.ndarray:
    """T[n1, k] = w_{R*M}^{n1 * rev(k)} * 2^32 mod p (mont-shifted), shape
    (M, R) to match the (B, M, R) dot_general output layout."""
    R, M = 1 << log_r, 1 << log_m
    log_nc = log_r + log_m
    w = bb.py_root_of_unity(log_nc)
    if inverse:
        w = pow(w, P - 2, P)
    n1 = np.arange(M, dtype=np.uint64)
    out = np.ones((M, R), dtype=np.uint64)
    for k in range(R):
        kk = _rev_bits(k, log_r)
        out[:, k] = _pow_vec(w, n1 * kk)
    return ((out << 32) % P).astype(np.uint32)


def _pow_vec(base: int, exps: np.ndarray) -> np.ndarray:
    out = np.ones(exps.shape, dtype=np.uint64)
    b = base % P
    e = exps.copy()
    while e.max(initial=0) > 0:
        sel = (e & 1) == 1
        out[sel] = out[sel] * b % P
        b = b * b % P
        e >>= 1
    return out


@functools.lru_cache(maxsize=None)
def _recombine_consts() -> np.ndarray:
    """(7,) mont-shifted byte-position constants: 2^{8k} * 2^32 mod p."""
    return np.array([(1 << (8 * k + 32)) % P for k in range(7)], dtype=np.uint32)


def _limbs_u8(x: jnp.ndarray) -> List[jnp.ndarray]:
    return [((x >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.uint8) for k in range(4)]


def _mod_dft_pass(x: jnp.ndarray, w_np: np.ndarray) -> jnp.ndarray:
    """x (B, R, M) canonical -> out (B, M, R) canonical: contract the R
    axis with the (row-permuted) DFT matrix via 16 u8-limb matmuls."""
    w_limbs = [jnp.asarray(((w_np.astype(np.uint32) >> (8 * k)) & 0xFF).astype(np.uint8)) for k in range(4)]
    x_limbs = _limbs_u8(x)
    # S_k = sum_{i+j=k} X_i . W_j   (int32, exact)
    S = [None] * 7
    dn = (((1,), (1,)), ((), ()))  # contract x axis 1 with w axis 1 (W[k,n]: n)
    for i in range(4):
        for j in range(4):
            prod = jax.lax.dot_general(
                x_limbs[i], w_limbs[j], dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )  # (B, M, R)
            k = i + j
            S[k] = prod if S[k] is None else S[k] + prod
    consts = _recombine_consts()
    acc = S[0].astype(jnp.uint32)
    acc = jnp.where(acc >= P, acc - jnp.uint32(P), acc)  # S_0 < 2^23+: one cond-sub not enough? S_0 < 3*2^23 < p, fine
    for k in range(1, 7):
        if S[k] is None:
            continue
        term = bb.mont_mul(S[k].astype(jnp.uint32), jnp.uint32(consts[k]))
        acc = bb.add(acc, term)
    return acc


def _ntt_mxu_impl(x: jnp.ndarray, log_n: int, inverse: bool) -> jnp.ndarray:
    """(..., n) canonical -> (..., n) canonical, bit-reversed output."""
    plan = digit_plan(log_n)
    batch_shape = x.shape[:-1]
    n = 1 << log_n
    x = x.reshape(-1, n)
    B0 = x.shape[0]
    rem = log_n
    B = B0
    for li, log_r in enumerate(plan):
        R = 1 << log_r
        log_m = rem - log_r
        M = 1 << log_m
        cur = x.reshape(B, R, M)
        w_np = _dft_matrix_np(log_r, rem, inverse)
        out = _mod_dft_pass(cur, w_np)  # (B, M, R)
        if log_m > 0:
            tw = jnp.asarray(_twiddle_np(log_r, log_m, inverse))  # (M, R)
            out = bb.mont_mul(out, tw[None, :, :])
        # bring k into the batch: (B, M, R) -> (B, R, M)
        out = jnp.swapaxes(out, 1, 2)
        x = out.reshape(B * R, M)
        B *= R
        rem = log_m
    return x.reshape(*batch_shape, n)


def ntt_mxu_nat_to_rev(x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT on canonical input, bit-reversed canonical output —
    matmul-per-digit on the MXU.  Drop-in for ntt_natural_to_rev modulo
    the Montgomery-form convention (this path is canonical-form)."""
    log_n = int(np.log2(x.shape[-1]))
    return _ntt_mxu_impl(x, log_n, inverse=False)


ntt_mxu_nat_to_rev_jit = jax.jit(ntt_mxu_nat_to_rev)
