"""Mesh-sharded quotient evaluation (explicit shard_map + sharded NTTs).

Two stages, both explicitly sharded — no auto-SPMD over the VM
constraint graphs (whose partitioner blow-ups are why the replicated
mode existed; VERDICT r3 #6):

  1. row-pointwise constraint fold over the LDE rows in a shard_map
     kernel: next-row references (rotation r=1, a `blowup`-row step on
     the LDE) read a ppermute halo from the cyclic-successor shard;
     selectors and the 1/Z_H tile are shard-local slices.  Runs the same
     `stark.prover._quotient_pointwise` body as the single-device path.
  2. the quotient interpolation tail as sharded four-step NTTs
     (parallel/ntt.py, all-to-all stage exchange): one batched iNTT over
     the coset, an un-shift scale, chunk split, and one batched NTT back
     onto H — natural layout throughout, vs the single-device rev-layout
     tail; modular arithmetic is exact, so the chunk evaluations are
     bit-identical either way.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import babybear as bb
from ..field import ext
from ..stark import air as air_mod
from ..stark import prover as stark_prover
from ..stark.config import StarkConfig
from .ntt import AXIS, make_sharded_ntt_batch
from .perm import _next_rows, _rolled_col

_QUOT_MESH_CACHE: Dict[tuple, object] = {}

SEL_KEYS = ("is_first", "is_last", "is_transition", "z_h", "x")


@functools.lru_cache(maxsize=None)
def _unshift_scale_np(log_N: int, chip_shift: int) -> np.ndarray:
    """shift^{-i} (Montgomery): un-shifts coset coefficients, natural order."""
    from ..stark.fri import _pow_table

    inv_s = pow(chip_shift, bb.P - 2, bb.P)
    return bb.np_to_mont(_pow_table(inv_s, 1 << log_N))


def _tail_sharded(mesh: Mesh, log_n: int, config: StarkConfig, chip_shift: int):
    """(N, 4) natural quotient evals over the coset, row-sharded ->
    (n, 4*blowup) chunk evaluations over H (row-sharded)."""
    blowup = config.blowup
    log_N = log_n + config.log_blowup
    n = 1 << log_n
    intt_N = make_sharded_ntt_batch(mesh, log_N, inverse=True)
    ntt_n = make_sharded_ntt_batch(mesh, log_n, inverse=False)
    unshift = jnp.asarray(_unshift_scale_np(log_N, chip_shift))
    col_sharding = NamedSharding(mesh, P(None, AXIS))

    def tail(q):
        comps = jax.device_put(jnp.swapaxes(q, 0, 1), col_sharding)  # (4, N)
        coeffs = intt_N(comps)  # (4, N) natural coeffs of p(shift*x)
        coeffs = bb.mont_mul(coeffs, unshift[None])  # p's own coefficients
        # chunk k of the decomposition q(x) = sum_k x^{k*n} q_k(x)
        chunks = jax.device_put(
            coeffs.reshape(4, blowup, n).reshape(4 * blowup, n), col_sharding
        )
        evals = ntt_n(chunks)  # (4*blowup, n) evals of each chunk over H
        out = jnp.swapaxes(evals.reshape(4, blowup, n), 0, 2)  # (n, blowup, 4)
        return jax.device_put(
            out.reshape(n, 4 * blowup), NamedSharding(mesh, P(AXIS, None))
        )

    return tail


def compute_quotient_sharded(
    air,
    logup_cons,
    lde_main: jnp.ndarray,
    lde_perm,
    ch_m: Dict[str, jnp.ndarray],
    alpha_q_m: jnp.ndarray,
    log_n: int,
    config: StarkConfig,
    mesh: Mesh,
    shift_pow: int = 0,
    lde_pre=None,
    publics=None,
) -> jnp.ndarray:
    """Row-sharded drop-in for stark.prover.compute_quotient (Montgomery
    challenge dict ch_m, (4,) Montgomery alpha_q)."""
    n = 1 << log_n
    blowup = config.blowup
    N = n * blowup
    d = mesh.shape[AXIS]
    chip_shift = pow(config.coset_shift, 1 << shift_pow, bb.P)
    pub_map = dict(enumerate(publics)) if publics else None

    cache_key = (
        tuple(np.asarray(mesh.devices).ravel().tolist()),
        id(air),
        len(logup_cons),
        log_n,
        config,
        shift_pow,
        tuple(publics) if publics else None,
        lde_perm is not None,
        lde_pre is not None,
        tuple(sorted(ch_m.keys())),
    )
    fn = _QUOT_MESH_CACHE.get(cache_key)
    if fn is None:
        has_perm = lde_perm is not None
        has_pre = lde_pre is not None

        def body(lm, lp, lpre, chs, aq, zh_inv, *sels):
            halo_m = _next_rows(lm, blowup, d)
            halo_p = _next_rows(lp, blowup, d) if has_perm else None
            halo_pre = _next_rows(lpre, blowup, d) if has_pre else None

            def perm_col(i, r):
                block = lp[:, 4 * i : 4 * i + 4]
                if r == 0:
                    return block
                assert r == 1
                return jnp.concatenate(
                    [lp[blowup:, 4 * i : 4 * i + 4], halo_p[:, 4 * i : 4 * i + 4]]
                )

            alg = air_mod._mixed_algebra(
                main_col=lambda i, r: _rolled_col(lm, halo_m, i, r, blowup),
                perm_col=perm_col,
                challenges=chs,
                selectors=dict(zip(SEL_KEYS, sels)),
                publics=pub_map,
                pre_col=(lambda i, r: _rolled_col(lpre, halo_pre, i, r, blowup))
                if has_pre
                else None,
            )
            return stark_prover._quotient_pointwise(
                air, logup_cons, alg, lm.shape[0], aq, zh_inv
            )

        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(
                    P(AXIS, None),
                    P(AXIS, None) if has_perm else P(),
                    P(AXIS, None) if has_pre else P(),
                    {k: P() for k in sorted(ch_m.keys())},
                    P(),
                    P(AXIS),
                )
                + tuple(P(AXIS) for _ in SEL_KEYS),
                out_specs=P(AXIS, None),
                check_vma=False,
            )
        )
        _QUOT_MESH_CACHE[cache_key] = fn

    row_sharding = NamedSharding(mesh, P(AXIS, None))
    vec_sharding = NamedSharding(mesh, P(AXIS))
    zero = jnp.zeros((0,), jnp.uint32)
    sel = air_mod.lde_selectors(log_n, config.log_blowup, chip_shift)
    sels = [jax.device_put(sel[k], vec_sharding) for k in SEL_KEYS]
    zh_inv = jax.device_put(
        jnp.asarray(stark_prover._zh_inv_tile_np(log_n, config, chip_shift, N)),
        vec_sharding,
    )
    q = fn(
        jax.device_put(lde_main, row_sharding),
        jax.device_put(lde_perm, row_sharding) if lde_perm is not None else zero,
        jax.device_put(lde_pre, row_sharding) if lde_pre is not None else zero,
        {k: v for k, v in ch_m.items()},
        alpha_q_m,
        zh_inv,
        *sels,
    )
    return _tail_sharded(mesh, log_n, config, chip_shift)(q)
