"""Mesh-sharded PCS commitment.

Produces a CommittedMatrix bit-identical to pcs.commit — the sharded
four-step NTT and shard-aligned Merkle subtrees reproduce the single-chip
results exactly — so a proof built with sharded commitments verifies
against the unchanged host verifier.  The LDE is gathered back to host
for the opening bookkeeping in this round; keeping it device-resident
end-to-end is the round-2 sharded-prover item (ROADMAP #10)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import babybear as bb
from ..hash import merkle
from ..hash import poseidon2 as p2
from ..stark.config import StarkConfig
from ..stark.pcs import CommittedMatrix
from .ntt import AXIS, make_sharded_coset_lde


def commit_sharded(
    evals: jnp.ndarray, config: StarkConfig, mesh: Mesh, shift_pow: int = 0
) -> CommittedMatrix:
    """Commit a (n, w) matrix with the LDE computed column-by-column on
    the mesh (four-step NTT with all-to-alls) and leaves hashed
    shard-locally."""
    n, w = evals.shape
    log_n = int(np.log2(n))
    shift = pow(config.coset_shift, 1 << shift_pow, bb.P)
    lde_fn = make_sharded_coset_lde(mesh, log_n, config.log_blowup, shift)
    vec_sharding = NamedSharding(mesh, P(AXIS))
    cols = []
    for j in range(w):
        col = jax.device_put(evals[:, j], vec_sharding)
        cols.append(lde_fn(col))
    lde = jnp.stack(cols, axis=1)  # (N, w) row-sharded
    digests = p2.hash_rows(lde)
    tree = merkle.build(digests)
    return CommittedMatrix(
        evals=evals, lde=lde, tree=tree, root=np.asarray(tree.root), shift_pow=shift_pow
    )
