"""Mesh-sharded Merkle commitment.

Leaf hashing and the bottom log2(N/D) tree levels are device-local; the
top log2(D) levels run replicated on the all-gathered per-device subtree
roots (digests are 8 lanes — the gather is 8*D words over ICI).
Matches the single-chip `merkle.root_only` bit-for-bit because subtree
boundaries align with shard boundaries."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..hash import poseidon2 as p2
from ..hash.merkle import root_only
from .ntt import AXIS


def make_sharded_tree(mesh: Mesh, n_rows: int, width: int):
    """Returns a jitted fn: rows (n_rows, width) sharded P(AXIS, None)
    -> full MerkleTree layer tuple, bit-identical to merkle._build_layers.

    Levels up to log2(n/D) are device-local (shard boundaries align with
    subtree boundaries, so concatenated local layers ARE the global
    layers); the top log2(D) levels compress the all-gathered per-device
    subtree roots, replicated."""
    d = mesh.shape[AXIS]
    n_loc = n_rows // d
    assert n_rows % d == 0 and n_loc & (n_loc - 1) == 0
    n_local_levels = int(np.log2(n_loc))
    n_top_levels = int(np.log2(d))

    def body(rows_local):
        cur = p2.hash_rows(rows_local)  # (n/d, 8)
        local_layers = [cur]
        for _ in range(n_local_levels):
            cur = p2.compress(cur[0::2], cur[1::2])
            local_layers.append(cur)
        tops = [jax.lax.all_gather(cur[0], AXIS)]  # (d, 8) replicated
        cur = tops[0]
        for _ in range(n_top_levels):
            cur = p2.compress(cur[0::2], cur[1::2])
            tops.append(cur)
        # local_layers[-1] (the per-device root) duplicates tops[0]
        return tuple(local_layers[:-1]) + tuple(tops)

    out_specs = tuple(P(AXIS, None) for _ in range(n_local_levels)) + tuple(
        P(None, None) for _ in range(n_top_levels + 1)
    )
    fn = jax.shard_map(
        body, mesh=mesh, in_specs=P(AXIS, None), out_specs=out_specs, check_vma=False
    )
    return jax.jit(fn)


def make_sharded_commit(mesh: Mesh, n_rows: int, width: int):
    """Returns a jitted fn: rows (n_rows, width) sharded P(AXIS, None)
    -> replicated root (8,)."""
    d = mesh.shape[AXIS]
    assert n_rows % d == 0 and (n_rows // d) & (n_rows // d - 1) == 0

    def body(rows_local):
        digests = p2.hash_rows(rows_local)  # (n/d, 8)
        sub_root = root_only(digests)  # (8,)
        all_roots = jax.lax.all_gather(sub_root, AXIS)  # (d, 8)
        return root_only(all_roots)

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=P(AXIS, None), out_specs=P(), check_vma=False
    )
    return jax.jit(fn)
