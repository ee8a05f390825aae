"""Device-side APC witness generation.

Counterpart of the reference's CUDA tracegen kernels
(/root/reference/openvm/cuda/src/apc_tracegen.cu:35-66 thread-per-row
gather, apc_apply_bus.cu histogram bumps) as jitted XLA ops:

  * kernel 1 (gather-substitution): the APC trace is a pure gather from
    per-opcode witness matrices through the `subs` mapping — expressed as
    one `jnp.take` per instruction slot plus a static column gather;
  * kernel 3 (bus histograms): periphery multiplicities are computed by
    evaluating interaction mult/args vectorized over rows and scattering
    into table-index space with np.add.at (device scatter-add when the
    tables live on-chip).

Kernel 2 (the CUDA bytecode expression VM for derived columns) has no
counterpart by design: derived columns never need recomputation here
because every original column value is available to gather (SURVEY.md §7
step 8's note: compile the machine, don't interpret bytecode)."""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .apc import VmApc, _record_index
from .executor import ExecutionResult
from .machines import registry
from .system import MAX_RANGE_BITS, P


def opcode_matrices(result: ExecutionResult) -> Dict[str, np.ndarray]:
    """op -> (num_records, width) uint32 witness matrix."""
    out = {}
    for op, recs in result.records.items():
        builder, wg = registry()[op]
        rows = [wg(r) for r in recs]
        mat = np.zeros((len(rows), len(builder.cols)), dtype=np.uint32)
        for r, row in enumerate(rows):
            for c, name in enumerate(builder.cols):
                mat[r, c] = row.get(name, 0) % P
        out[op] = mat
    return out


def apc_gather_plan(
    apc: VmApc, occurrences: List[List[int]], result: ExecutionResult, program
) -> Tuple[List[Tuple[str, np.ndarray, np.ndarray, np.ndarray]], List[str]]:
    """Build the static gather plan:
    per instruction slot i: (opcode, rec_rows (occ,), src_cols (k_i,),
    dst_cols (k_i,)) — dst positions in the APC column order."""
    rec_index = _record_index(result, program)
    main = apc.machine.main_columns()
    apc_cols = sorted(main)
    col_pos = {v: j for j, v in enumerate(apc_cols)}
    names = [main[v] for v in apc_cols]

    per_instr: Dict[int, List[Tuple[int, str]]] = {}
    for v in apc_cols:
        i, cname = apc.subs[v]
        per_instr.setdefault(i, []).append((col_pos[v], cname))

    plan = []
    for i, ins in enumerate(apc.block.instructions):
        op = ins.op
        builder, _ = registry()[op]
        cidx = {n: k for k, n in enumerate(builder.cols)}
        entries = per_instr.get(i, [])
        if not entries:
            continue
        rec_rows = np.array([rec_index[occ[i]][1] for occ in occurrences], dtype=np.int32)
        src = np.array([cidx[cname] for _, cname in entries], dtype=np.int32)
        dst = np.array([pos for pos, _ in entries], dtype=np.int32)
        plan.append((op, rec_rows, src, dst))
    return plan, names


def make_apc_tracegen(plan, n_apc_cols: int, n_occ: int):
    """Compile the gather plan into a jitted fn(op_matrices) ->
    (n_occ, n_apc_cols) trace.  The plan (opcode names, row/column index
    vectors) is baked in as static structure; only the witness matrices
    flow through as device arrays."""

    @jax.jit
    def run(op_matrices: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        out = jnp.zeros((n_occ, n_apc_cols), dtype=jnp.uint32)
        for op, rec_rows, src, dst in plan:
            rows = jnp.take(op_matrices[op], jnp.asarray(rec_rows), axis=0)
            vals = jnp.take(rows, jnp.asarray(src), axis=1)
            out = out.at[:, jnp.asarray(dst)].set(vals)
        return out

    return run


# -- bus histograms (kernel-3 analog) ----------------------------------------


def range_table_index(values: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """Row index of (value, bits) in the range-checker table
    (rows ordered by bits ascending: offset(b) = 2^b - 1)."""
    return ((1 << bits.astype(np.int64)) - 1 + values.astype(np.int64)).astype(np.int64)


def accumulate_histograms(interactions, bus_ids) -> Dict[str, np.ndarray]:
    """interactions: list of (bus_id, mult (n,), args [(n,)...]) numpy
    arrays (canonical).  Returns per-periphery count arrays."""
    range_counts = np.zeros((1 << (MAX_RANGE_BITS + 1)) - 1, dtype=np.uint64)
    bitwise_counts = np.zeros(2 * 65536, dtype=np.uint64)
    pow2_counts = np.zeros(33, dtype=np.uint64)
    for bus_id, mult, args in interactions:
        nz = mult != 0
        if not nz.any():
            continue
        m = mult[nz]
        if bus_id == bus_ids["range"]:
            idx = range_table_index(args[0][nz], args[1][nz])
            np.add.at(range_counts, idx, m)
        elif bus_id == bus_ids["bitwise"]:
            idx = (
                args[3][nz].astype(np.int64) * 65536
                + args[0][nz].astype(np.int64) * 256
                + args[1][nz].astype(np.int64)
            )
            np.add.at(bitwise_counts, idx, m)
        elif bus_id == bus_ids["pow2"]:
            np.add.at(pow2_counts, args[0][nz].astype(np.int64), m)
    range_counts %= P
    bitwise_counts %= P
    pow2_counts %= P
    return {"range": range_counts, "bitwise": bitwise_counts, "pow2": pow2_counts}
