"""Mesh-sharded PCS commitment.

Produces a CommittedMatrix bit-identical to pcs.commit — the sharded
four-step NTT (all-to-all stage exchange over ICI) and shard-aligned
Merkle subtrees reproduce the single-chip results exactly — so a proof
built with sharded commitments verifies against the unchanged host
verifier.  The whole trace matrix LDEs in ONE dispatch (batched sharded
four-step) and the tree builds in one more; the LDE stays device-resident
and row-sharded for the downstream quotient/FRI stages (auto-SPMD)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import babybear as bb
from ..hash import merkle
from ..stark.config import StarkConfig
from ..stark.pcs import CommittedMatrix
from .commit import make_sharded_tree
from .ntt import AXIS, _split_log, make_sharded_coset_lde_batch


def shardable(mesh: Mesh, log_n: int) -> bool:
    """The four-step split (n1, n2) must both be divisible by the device
    count; below that the matrix commits replicated (periphery chips are
    tiny — sharding them would be all overhead)."""
    d = mesh.shape[AXIS]
    log_n1, log_n2 = _split_log(log_n)
    return (1 << log_n1) % d == 0 and (1 << log_n2) % d == 0


@functools.lru_cache(maxsize=None)
def _lde_fn(mesh: Mesh, log_n: int, log_blowup: int, shift: int):
    return make_sharded_coset_lde_batch(mesh, log_n, log_blowup, shift)


@functools.lru_cache(maxsize=None)
def _tree_fn(mesh: Mesh, n_rows: int, width: int):
    return make_sharded_tree(mesh, n_rows, width)


def commit_sharded(
    evals: jnp.ndarray, config: StarkConfig, mesh: Mesh, shift_pow: int = 0
) -> CommittedMatrix:
    """Commit a (n, w) matrix with the LDE computed on the mesh (batched
    four-step NTT, one dispatch for all columns) and the Merkle tree built
    shard-locally with a gathered top.  Falls back to the replicated
    single-chip path when the matrix is too small to shard."""
    from ..stark import pcs as base_pcs

    n, w = evals.shape
    log_n = int(np.log2(n))
    if not shardable(mesh, log_n) or not shardable(mesh, log_n + config.log_blowup):
        return base_pcs.commit(evals, config, shift_pow=shift_pow)
    shift = pow(config.coset_shift, 1 << shift_pow, bb.P)
    cols = jax.device_put(
        jnp.swapaxes(evals, 0, 1), NamedSharding(mesh, P(None, AXIS))
    )  # (w, n) column-contiguous shards
    lde_cols = _lde_fn(mesh, log_n, config.log_blowup, shift)(cols)  # (w, N)
    N = lde_cols.shape[1]
    lde = jax.device_put(
        jnp.swapaxes(lde_cols, 0, 1), NamedSharding(mesh, P(AXIS, None))
    )
    layers = _tree_fn(mesh, N, w)(lde)
    tree = merkle.MerkleTree(list(layers))
    return CommittedMatrix(
        evals=evals, lde=lde, tree=tree, root=np.asarray(tree.root), shift_pow=shift_pow
    )
