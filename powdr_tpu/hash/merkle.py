"""Merkle tree over Poseidon2 digests, batched on device.

Replaces the Poseidon2 Merkle commitment of the reference's stark-backend
fork (SURVEY.md §2 'Native components' item 2).  Leaves are row digests of
committed matrices; the tree is built with log2(n) batched 2-to-1
compressions.  On a sharded mesh the leaf hashing and lower tree levels are
embarrassingly parallel across chips; only the top log2(num_chips) levels
need gathered digests (see powdr_tpu.parallel)."""
from __future__ import annotations

import functools

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from . import poseidon2 as p2


@dataclass
class MerkleTree:
    """layers[0] = leaf digests (n, 8); layers[-1] = root (1, 8)."""

    layers: List[jnp.ndarray]
    _host: "List[np.ndarray] | None" = None

    @property
    def root(self) -> jnp.ndarray:
        return self.layers[-1][0]

    def host_layers(self) -> List[np.ndarray]:
        """Bulk device->host transfer, cached.  All layers are packed into
        one device array first so the tunnel pays a single fetch (layer-
        by-layer fetches cost a round trip each)."""
        if self._host is None:
            packed = np.asarray(jnp.concatenate(self.layers, axis=0))
            out = []
            off = 0
            for l in self.layers:
                n = l.shape[0]
                out.append(packed[off : off + n])
                off += n
            self._host = out
        return self._host

    def open(self, index: int) -> np.ndarray:
        """Sibling path for a leaf, shape (depth, 8) (host-side)."""
        sibs = []
        idx = index
        for layer in self.host_layers()[:-1]:
            sibs.append(layer[idx ^ 1])
            idx >>= 1
        return np.array(sibs, dtype=np.uint32).reshape(-1, p2.DIGEST)

    def open_paths_device(self, indices) -> jnp.ndarray:
        """Sibling paths for many leaves, gathered ON DEVICE: (Q, depth, 8)
        Montgomery digests, not yet fetched.  The query phase fetches only
        these gathers (a few KB) instead of whole layers — on a tunneled
        TPU the device->host link is the prover's scarcest resource."""
        idx = np.array(indices, dtype=np.int64)  # copy: >>= below must not
        sibs = []                                 # alias the caller's array
        for layer in self.layers[:-1]:
            sibs.append(jnp.take(layer, jnp.asarray(idx ^ 1), axis=0))
            idx >>= 1
        if not sibs:
            return jnp.zeros((len(idx), 0, p2.DIGEST), dtype=jnp.uint32)
        return jnp.stack(sibs, axis=1)


def root_only(leaf_digests: jnp.ndarray) -> jnp.ndarray:
    """Jit-friendly root computation (no layer retention), (n,8)->(8,)."""
    cur = leaf_digests
    while cur.shape[0] > 1:
        cur = p2.compress(cur[0::2], cur[1::2])
    return cur[0]


@functools.partial(jax.jit, static_argnums=())
def _build_layers(leaf_digests: jnp.ndarray):
    """All tree levels in one jitted dispatch (per-level eager calls cost
    a round trip each on tunneled backends)."""
    layers = [leaf_digests]
    cur = leaf_digests
    while cur.shape[0] > 1:
        cur = p2.compress(cur[0::2], cur[1::2])
        layers.append(cur)
    return tuple(layers)


def _build_layers_eager(leaf_digests: jnp.ndarray):
    """Level-by-level tree build.  Each level is one p2.compress call —
    jitted per (n, 8) SHAPE, so level shapes are shared across every tree
    of the run (the fused _build_layers compiles one whole-tree program
    per distinct leaf count, which dominates one-shot cold runs)."""
    layers = [leaf_digests]
    cur = leaf_digests
    while cur.shape[0] > 1:
        cur = p2.compress(cur[0::2], cur[1::2])
        layers.append(cur)
    return tuple(layers)


def build(leaf_digests: jnp.ndarray) -> MerkleTree:
    """leaf_digests: (n, 8) with n a power of two."""
    n = leaf_digests.shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    return MerkleTree(list(_build_layers(leaf_digests)))


def verify_paths(items) -> np.ndarray:
    """Batch path verification: items are (root, index, leaf_digest, path,
    expected_depth) tuples; returns a bool array (one per item).

    Groups by depth and runs ONE vectorized compress per tree level per
    group — the verifier's per-path per-level `compress_host` dispatches
    (queries x matrices x depth of them) dominated wall-clock otherwise."""
    import collections

    ok = np.ones(len(items), dtype=bool)
    groups = collections.defaultdict(list)
    for k, (root, index, leaf, path, depth) in enumerate(items):
        if len(path) != depth:
            ok[k] = False
            continue
        groups[depth].append(k)
    for depth, idxs in groups.items():
        cur = jnp.asarray(
            np.stack([np.asarray(items[k][2]).reshape(p2.DIGEST) for k in idxs])
        )
        idxarr = np.array([items[k][1] for k in idxs], dtype=np.int64)
        if depth:
            paths = np.stack(
                [np.asarray(items[k][3], dtype=np.uint32).reshape(depth, p2.DIGEST) for k in idxs]
            )
        for l in range(depth):
            sib = jnp.asarray(paths[:, l])
            bit = jnp.asarray(((idxarr >> l) & 1)[:, None] == 1)
            left = jnp.where(bit, sib, cur)
            right = jnp.where(bit, cur, sib)
            cur = p2.compress_host(left, right)
        roots = np.stack([np.asarray(items[k][0]).reshape(p2.DIGEST) for k in idxs])
        res = (np.asarray(cur) == roots).all(axis=1)
        for k, r in zip(idxs, res):
            ok[k] = bool(r)
    return ok


def verify_path(
    root: np.ndarray,
    index: int,
    leaf_digest: np.ndarray,
    path: np.ndarray,
    expected_depth: int | None = None,
) -> bool:
    """Host-side path check (verifier is host logic; proofs are tiny).

    `expected_depth` pins the tree depth the verifier knows from context
    (log2 of the leaf count); a prover-supplied path of any other length
    is rejected so binding doesn't rest on path-length accident."""
    if expected_depth is not None and len(path) != expected_depth:
        return False
    cur = jnp.asarray(leaf_digest).reshape(1, p2.DIGEST)
    idx = index
    for sib in path:
        s = jnp.asarray(sib).reshape(1, p2.DIGEST)
        # host-pinned compress: verification is a few hundred tiny hashes,
        # and each device call through a tunneled chip is a full round trip
        cur = p2.compress_host(s, cur) if idx & 1 else p2.compress_host(cur, s)
        idx >>= 1
    return bool((np.asarray(cur[0]) == np.asarray(root)).all())
