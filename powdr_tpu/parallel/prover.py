"""The REAL prover on a device mesh.

`prove_on_mesh` runs `stark.prover.prove` — the same transcript, the same
rounds, the same proof object — with the PCS commitments computed by the
mesh-sharded path (batched four-step NTT LDE with all-to-all stage
exchange over ICI, shard-aligned Merkle subtrees with a gathered top;
powdr_tpu.parallel.pcs).  Everything downstream of a commitment
(permutation trace, quotient evaluation, FRI folds) consumes the
committed arrays directly; those stages are pure jnp, so XLA's auto-SPMD
partitioner propagates the row shardings and inserts the collectives
(psum/all-gather) — the sharding recipe SURVEY.md §2 'Parallelism
strategies' prescribes.

Because the sharded primitives are bit-exact vs their single-chip
counterparts (tests/test_parallel_ntt.py, tests/test_parallel_prover.py),
the proof is byte-identical to the single-chip prover's and verifies with
the unchanged host verifier.  Replaces the role of the reference's absent
distributed backend (SURVEY.md §5: 'Distributed communication backend')."""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..stark import prover as stark_prover
from ..stark.challenger import Challenger
from ..stark.config import StarkConfig
from . import pcs as parallel_pcs
from .ntt import AXIS


def prove_on_mesh(
    chips: Sequence[Tuple[object, jnp.ndarray]],
    config: StarkConfig,
    challenger: Challenger,
    mesh: Mesh,
    publics: Optional[Sequence[Optional[List[int]]]] = None,
) -> stark_prover.Proof:
    """Run the full STARK prover with traces row-sharded over `mesh`.

    Chips too small for the four-step split (periphery chips) commit
    replicated; large chips shard.  The returned Proof is bit-identical
    to `stark.prover.prove(chips, config, challenger)` on one chip."""
    row_sharding = NamedSharding(mesh, P(AXIS, None))
    placed = []
    for air, trace in chips:
        log_n = int(np.log2(trace.shape[0]))
        if parallel_pcs.shardable(mesh, log_n):
            trace = jax.device_put(trace, row_sharding)
        placed.append((air, trace))
    commit_fn = functools.partial(parallel_pcs.commit_sharded, mesh=mesh)
    return stark_prover.prove(
        placed, config, challenger, publics=publics, commit_fn=commit_fn
    )
