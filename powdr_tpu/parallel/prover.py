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
import os
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
    downstream: str = "replicated",
) -> stark_prover.Proof:
    """Run the full STARK prover with commitments computed on `mesh`.

    Chips too small for the four-step split (periphery chips) commit
    replicated; large chips shard.  The returned Proof is bit-identical
    to `stark.prover.prove(chips, config, challenger)` on one chip.

    downstream: "auto" leaves the committed LDEs sharded so XLA's
    auto-SPMD partitioner propagates the sharding through perm/quotient/
    FRI (inserting psum/all-gather itself); "replicated" (default) pulls
    each commitment's results onto the default device after the sharded
    NTT+Merkle — the FLOPs-dominant stages still run on the mesh with
    explicit shard_map collectives, while the downstream stages keep
    single-device semantics.  Auto-SPMD over the full VM constraint
    graphs triggers pathological SPMD-partitioner compile times and CPU
    collective-rendezvous timeouts at real chip-set scale; "auto" remains
    the right mode for few-chip/large-matrix workloads."""
    # POWDR_TPU_SHARD_MIN_LOG_N: matrices below this height commit on the
    # default batched single-device path (sharding a 64-row periphery
    # table is all compile + collective overhead); sharded or not, the
    # committed values are bit-identical so the proof never changes.
    min_log = int(os.environ.get("POWDR_TPU_SHARD_MIN_LOG_N", "0"))
    row_sharding = NamedSharding(mesh, P(AXIS, None))

    def _shards(log_n: int) -> bool:
        return (
            log_n >= min_log
            and parallel_pcs.shardable(mesh, log_n)
            and parallel_pcs.shardable(mesh, log_n + config.log_blowup)
        )

    placed = []
    for air, trace in chips:
        log_n = int(np.log2(trace.shape[0]))
        # in "auto" mode traces live sharded so every downstream stage
        # partitions; in "replicated" mode commit_sharded places its own
        # input (pre-placing here would hand SHARDED traces to the perm
        # jit and trigger the auto-SPMD compile blowup this mode avoids)
        if downstream == "auto" and _shards(log_n):
            trace = jax.device_put(trace, row_sharding)
        placed.append((air, trace))
    base_commit = functools.partial(parallel_pcs.commit_sharded, mesh=mesh)
    from ..hash import merkle

    def commit_fn(evals, config, shift_pow=0):
        log_n = int(np.log2(evals.shape[0]))
        if not _shards(log_n):
            return None  # decline: batched default commit, same values
        cm = base_commit(evals, config, shift_pow=shift_pow)
        if downstream == "replicated":
            cm.evals = jnp.asarray(jax.device_get(cm.evals))
            cm.lde = jnp.asarray(jax.device_get(cm.lde))
            cm.tree = merkle.MerkleTree(
                [jnp.asarray(jax.device_get(l)) for l in cm.tree.layers]
            )
        return cm

    return stark_prover.prove(
        placed, config, challenger, publics=publics, commit_fn=commit_fn
    )
