"""Compile VM chips to STARK AIRs and prove/verify the whole system.

The compile step is SURVEY.md §7's "AIR -> XLA compiler": each chip's
SymbolicMachine (named Vars) is lowered to an Air over dense column
indices (Col/PreCol); traces become Montgomery matrices.  Proving then
runs the generic multi-chip STARK (powdr_tpu.stark)."""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from ..ir import expression as ir
from ..stark import prover as stark_prover
from ..stark import verifier as stark_verifier
from ..stark.air import Air, Interaction
from ..stark.challenger import Challenger
from ..stark.config import StarkConfig
from .system import Chip

P = 2013265921


#: structural-fingerprint -> Air cache.  Proving is a serving workload:
#: the same guest proves many inputs, and every proof of the same chip
#: set must reuse the SAME Air objects so their jitted perm/quotient
#: programs (cached on the Air) never re-trace or re-compile.  Keyed by
#: the machine's serialized form + column list + preprocessed bytes, so
#: structurally identical chips across guests also share (the instruction
#: machines from vm.machines.registry are identical program-to-program).
_AIR_CACHE: Dict[tuple, Air] = {}


def _air_fingerprint(chip: Chip, pre) -> tuple:
    import hashlib

    from ..apc.symbolic_machine import machine_to_json
    import json

    h = hashlib.sha256(
        json.dumps(machine_to_json(chip.machine), sort_keys=True).encode()
    )
    if pre is not None:
        h.update(np.ascontiguousarray(pre).tobytes())
    return (chip.name, tuple(chip.cols), h.hexdigest())


def compile_chip(chip: Chip, min_log_height: Optional[int] = None) -> Tuple[Air, jnp.ndarray]:
    """Lower a Chip to (Air, main trace in Montgomery form).

    min_log_height (or env POWDR_TPU_MIN_LOG_HEIGHT) pads every trace to
    at least 2^k rows: fewer distinct shapes means the persistent compile
    cache reuses executables ACROSS guests on the tunneled chip.  Sound
    because chips are padding-closed (all-zero rows satisfy constraints
    and carry zero bus multiplicities — the same invariant pow2 padding
    relies on)."""
    import os

    if min_log_height is None:
        env = os.environ.get("POWDR_TPU_MIN_LOG_HEIGHT")
        min_log_height = int(env) if env else 0
    main_names = [c for c in chip.cols if c not in chip.preprocessed]
    pre_names = [c for c in chip.cols if c in chip.preprocessed]
    main_idx = {c: i for i, c in enumerate(main_names)}
    pre_idx = {c: i for i, c in enumerate(pre_names)}

    def remap(e: ir.Expr) -> ir.Expr:
        if isinstance(e, ir.Var):
            if e.name in main_idx:
                return ir.Col(main_idx[e.name])
            return ir.PreCol(pre_idx[e.name])
        if isinstance(e, ir.Const):
            return e
        if isinstance(e, ir.Add):
            return ir.Add(remap(e.lhs), remap(e.rhs))
        if isinstance(e, ir.Sub):
            return ir.Sub(remap(e.lhs), remap(e.rhs))
        if isinstance(e, ir.Mul):
            return ir.Mul(remap(e.lhs), remap(e.rhs))
        if isinstance(e, ir.Neg):
            return ir.Neg(remap(e.operand))
        raise TypeError(type(e))

    constraints = [remap(c) for c in chip.machine.constraints]
    interactions = [
        Interaction(bus_id=b.id, mult=remap(b.mult), args=[remap(a) for a in b.args])
        for b in chip.machine.bus_interactions
    ]
    n = chip.height
    main = np.stack([np.asarray(chip.trace[c], dtype=np.uint32) for c in main_names], axis=1)
    pre = (
        np.stack([np.asarray(chip.trace[c], dtype=np.uint32) for c in pre_names], axis=1)
        if pre_names
        else None
    )
    if min_log_height and n < (1 << min_log_height):
        pad = (1 << min_log_height) - n
        main = np.pad(main, ((0, pad), (0, 0)))
        if pre is not None:
            pre = np.pad(pre, ((0, pad), (0, 0)))
        n = 1 << min_log_height
    key = _air_fingerprint(chip, pre)
    air = _AIR_CACHE.get(key)
    if air is None:
        air = Air(
            width=len(main_names),
            constraints=constraints,
            interactions=interactions,
            name=chip.name,
            preprocessed=pre,
        )
        # content fingerprint: keys the AOT-exported prover programs
        # (stark/aot.py) so artifacts survive process restarts
        air._fp = key
        _AIR_CACHE[key] = air
    trace = bb.to_mont(jnp.asarray(main))
    return air, trace


def prove_chips(
    chips: List[Chip], config: StarkConfig
) -> Tuple[List[Air], stark_prover.Proof]:
    compiled = [compile_chip(c) for c in chips]
    ch = Challenger()
    proof = stark_prover.prove(compiled, config, ch)
    return [a for a, _ in compiled], proof


def verify_chips(
    airs: List[Air], proof: stark_prover.Proof, config: StarkConfig, vk=None
) -> None:
    ch = Challenger()
    stark_verifier.verify(airs, proof, config, ch, vk=vk)


def prove_chips_segmented(
    segments: List[List[Chip]], config: StarkConfig
) -> Tuple[List[Air], stark_prover.Proof]:
    """Continuation proving: one shared-transcript proof with a PCS/FRI
    opening per segment (see stark.prover.prove segments=...); pair with
    vm.system.build_chip_segments.  Verification is the unchanged
    verify_chips — the proof carries its segment structure."""
    compiled = [compile_chip(c) for seg in segments for c in seg]
    ch = Challenger()
    proof = stark_prover.prove(
        compiled, config, ch, segments=[len(s) for s in segments]
    )
    return [a for a, _ in compiled], proof


def prove_chips_aggregated(chips: List[Chip], config: StarkConfig):
    """Prove the VM chips, then wrap the proof in an aggregation proof:
    the full STARK verification of the app proof re-runs inside the
    ExtALU/Poseidon2 aggregation circuit (stark.circuit_verifier), whose
    publics bind the app proof's per-chip main commitment roots.

    This is the reference's app -> leaf aggregation step
    (/root/reference/openvm-riscv/src/lib.rs:309-325) collapsed to one
    level.  Returns (agg_airs, agg_proof, app_airs, app_proof)."""
    from ..stark.circuit_verifier import aggregate

    app_airs, app_proof = prove_chips(chips, config)
    circ, _tape = aggregate([(app_airs, app_proof)], config)
    agg_proof = stark_prover.prove(
        list(zip(circ.airs, circ.traces)), config, Challenger(), publics=circ.publics
    )
    return circ.airs, agg_proof, app_airs, app_proof
