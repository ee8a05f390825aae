"""Mesh-sharded LogUp permutation traces (explicit shard_map, no auto-SPMD).

The perm trace is row-pointwise algebra except for two things, both of
which become explicit ICI collectives here:

  * next-row column references (ir rotation r=1): a one-row halo from the
    cyclic-successor shard via ppermute;
  * the running LogUp sum: a shard-local associative_scan plus an
    exclusive prefix of the all_gathered per-shard totals.

Because modular sums are order-independent, the resulting (n, 4*(G+1))
matrix and chip total are bit-identical to the single-device
`stark.prover.build_perm_trace` — both run the same `_perm_body`, only
the column providers and the scan differ.  Replaces the role of the
reference's GPU tracegen for the permutation AIR (SURVEY.md §2
'Parallelism strategies'; the reference has no multi-device analog).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import babybear as bb
from ..field import ext
from ..stark import prover as stark_prover
from .ntt import AXIS

#: (mesh-key, air-id, groups, log_n, has_pre) -> jitted shard_map program
_PERM_MESH_CACHE: Dict[tuple, object] = {}


def _next_rows(block: jnp.ndarray, k: int, n_dev: int) -> jnp.ndarray:
    """First k rows of the cyclic-successor shard's block (the halo for
    rotation-by-one column references; jnp.roll semantics are cyclic, so
    the last shard wraps to the first)."""
    return jax.lax.ppermute(
        block[:k], AXIS, perm=[((i + 1) % n_dev, i) for i in range(n_dev)]
    )


def _rolled_col(block: jnp.ndarray, halo: jnp.ndarray, i: int, r: int, step: int) -> jnp.ndarray:
    if r == 0:
        return block[:, i]
    assert r == 1, "air rotations are 0/1 by construction (ir.Col.rot)"
    return jnp.concatenate([block[step:, i], halo[:, i]])


def _scan_sharded(n_dev: int):
    def scan_fn(h_tot: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        s_local = jax.lax.associative_scan(bb.add, h_tot, axis=0)
        tots = jax.lax.all_gather(s_local[-1], AXIS)  # (D, 4) replicated
        idx = jax.lax.axis_index(AXIS)
        mask = (jnp.arange(n_dev) < idx)[:, None]
        prefix = bb.sum_mod(jnp.where(mask, tots, jnp.zeros_like(tots)), axis=0)
        s_incl = ext.add(s_local, jnp.broadcast_to(prefix, s_local.shape))
        total = bb.sum_mod(tots, axis=0)  # (4,) replicated grand total
        return s_incl, total

    return scan_fn


def build_perm_trace_sharded(
    air,
    trace: jnp.ndarray,
    groups,
    alpha_m: jnp.ndarray,
    beta_m: jnp.ndarray,
    mesh: Mesh,
    pre_trace: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-sharded perm trace: returns (perm (n, 4*(G+1)) sharded
    P(AXIS, None), total (4,) Montgomery replicated).  alpha_m/beta_m are
    (4,) Montgomery device arrays."""
    n = trace.shape[0]
    log_n = int(np.log2(n))
    d = mesh.shape[AXIS]
    key = tuple(tuple(g) for g in groups)
    sel_np = stark_prover._trace_selectors_np(log_n)
    cache_key = (
        tuple(np.asarray(mesh.devices).ravel().tolist()),
        id(air),
        key,
        log_n,
        pre_trace is not None,
    )
    fn = _PERM_MESH_CACHE.get(cache_key)
    if fn is None:
        has_pre = pre_trace is not None

        def body(tr, pre, a_m, b_m, s_first, s_last, s_trans):
            halo = _next_rows(tr, 1, d)
            halo_pre = _next_rows(pre, 1, d) if has_pre else None
            return stark_prover._perm_body(
                air,
                key,
                tr.shape[0],
                a_m,
                b_m,
                main_col=lambda i, r: _rolled_col(tr, halo, i, r, 1),
                pre_col=(lambda i, r: _rolled_col(pre, halo_pre, i, r, 1))
                if has_pre
                else None,
                selectors={
                    "is_first": s_first,
                    "is_last": s_last,
                    "is_transition": s_trans,
                },
                scan_fn=_scan_sharded(d),
            )

        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(
                    P(AXIS, None),
                    P(AXIS, None) if has_pre else P(),
                    P(),
                    P(),
                    P(AXIS),
                    P(AXIS),
                    P(AXIS),
                ),
                out_specs=(P(AXIS, None), P()),
                check_vma=False,
            )
        )
        _PERM_MESH_CACHE[cache_key] = fn

    row_sharding = NamedSharding(mesh, P(AXIS, None))
    vec_sharding = NamedSharding(mesh, P(AXIS))
    tr = jax.device_put(trace, row_sharding)
    pre = (
        jax.device_put(pre_trace, row_sharding)
        if pre_trace is not None
        else jnp.zeros((0,), jnp.uint32)
    )
    sels = [
        jax.device_put(jnp.asarray(sel_np[k]), vec_sharding)
        for k in ("is_first", "is_last", "is_transition")
    ]
    return fn(tr, pre, alpha_m, beta_m, *sels)
