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
