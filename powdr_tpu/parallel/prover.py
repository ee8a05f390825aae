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

    downstream: "sharded" (the full mesh path) runs perm traces and
    quotients through the EXPLICIT shard_map kernels (parallel/perm.py,
    parallel/quotient.py: ppermute halos for next-row rotations,
    associative_scan + all_gather prefix for the LogUp running sum,
    sharded four-step NTTs for the quotient tail) on every chip large
    enough to shard, keeps all committed LDEs mesh-resident through those
    stages, and replicates only at the opening round (one bulk transfer)
    so the FRI jits stay single-device and compile time stays bounded.
    "auto" leaves the committed LDEs sharded so XLA's auto-SPMD
    partitioner propagates the sharding through perm/quotient/FRI
    (inserting psum/all-gather itself); "replicated" (fallback) pulls
    each commitment's results onto the default device after the sharded
    NTT+Merkle.  Auto-SPMD over the full VM constraint graphs triggers
    pathological SPMD-partitioner compile times and CPU collective-
    rendezvous timeouts at real chip-set scale — "sharded" exists
    precisely so the downstream stages partition WITHOUT auto-SPMD."""
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

    perm_fn = quotient_fn = pre_open_fn = None
    if downstream == "sharded":
        from ..field import babybear as bb
        from . import perm as sh_perm
        from . import quotient as sh_quot

        def _ext_m(v):
            return bb.to_mont(jnp.asarray(np.array(v, dtype=np.uint32)))

        def perm_fn(air, trace, groups, alpha, beta, pre):
            if not _shards(int(np.log2(trace.shape[0]))):
                return None  # periphery chip: single-device fallback
            return sh_perm.build_perm_trace_sharded(
                air, trace, groups, _ext_m(alpha), _ext_m(beta), mesh, pre_trace=pre
            )

        def quotient_fn(air, cons, lm, lp, ch, alpha_q, ln, sp, lpre, pub):
            if not _shards(ln):
                return None
            ch_m = {k: _ext_m(v) for k, v in ch.items()}
            return sh_quot.compute_quotient_sharded(
                air, tuple(cons), lm, lp, ch_m, _ext_m(alpha_q), ln, config,
                mesh, shift_pow=sp, lde_pre=lpre, publics=pub,
            )

        def _is_sharded(x) -> bool:
            try:
                return len(x.sharding.device_set) > 1
            except AttributeError:
                return False

        def pre_open_fn(matrices):
            """Replicate mesh-resident commitments in ONE bulk transfer so
            the opening-phase jits (reduced codewords, FRI folds) never see
            sharded operands (auto-SPMD compile blowup)."""
            live = [cm for cm in matrices if cm is not None and _is_sharded(cm.lde)]
            if not live:
                return
            fetched = jax.device_get(
                [(cm.evals, cm.lde, tuple(cm.tree.layers)) for cm in live]
            )
            for cm, (ev, lde, layers) in zip(live, fetched):
                cm.evals = jnp.asarray(ev)
                cm.lde = jnp.asarray(lde)
                cm.tree = merkle.MerkleTree([jnp.asarray(l) for l in layers])

    return stark_prover.prove(
        placed, config, challenger, publics=publics, commit_fn=commit_fn,
        perm_fn=perm_fn, quotient_fn=quotient_fn, pre_open_fn=pre_open_fn,
    )
