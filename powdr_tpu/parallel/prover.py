"""Mesh-sharded proving step.

Wires the sharded primitives (four-step NTT LDE, sharded Merkle commit,
auto-SPMD LogUp accumulation and FRI fold) into one jitted step over a
device mesh — the multi-chip path SURVEY.md §2 calls for (trace columns
and coset limbs sharded across chips; Merkle roots and fold sums reduced
over ICI collectives)."""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import babybear as bb
from ..field import ext
from .commit import make_sharded_commit
from .ntt import AXIS, make_sharded_coset_lde


def make_sharded_prove_step(mesh: Mesh, log_n: int, width: int, log_blowup: int = 1):
    """Returns (jitted_fn, make_example_args).

    The step: per-column coset LDE -> sharded Merkle commit of the LDE
    matrix -> LogUp-style fingerprint/inverse/running-sum over the trace
    -> constraint evaluation on the LDE (with a next-row rotation) ->
    first FRI fold of the resulting codeword -> commit folded codeword.
    Returns (root, logup_total, fold_root)."""
    n = 1 << log_n
    N = n << log_blowup
    lde_fn = make_sharded_coset_lde(mesh, log_n, log_blowup)
    commit_fn = make_sharded_commit(mesh, N, width)
    fold_commit_fn = make_sharded_commit(mesh, N // 2, 8)
    row_sharding = NamedSharding(mesh, P(AXIS, None))
    vec_sharding = NamedSharding(mesh, P(AXIS))

    def step(trace: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray):
        # 1. sharded LDE of every column
        lde_cols = [lde_fn(trace[:, j]) for j in range(width)]
        lde = jnp.stack(lde_cols, axis=1)  # (N, width) row-sharded
        lde = jax.lax.with_sharding_constraint(lde, row_sharding)

        # 2. sharded Merkle commit
        root = commit_fn(lde)

        # 3. LogUp: f = alpha + beta * col0 + beta^2 * col1 ; h = 1/f ;
        #    running sum via associative_scan (auto-SPMD collectives)
        f = jnp.tile(alpha, (n, 1))
        bp = beta
        for j in range(min(width, 2)):
            f = ext.add(f, ext.mul_base(jnp.broadcast_to(bp, (n, 4)), trace[:, j]))
            bp = ext.mul(bp, beta)
        h = ext.inv(f)
        s = jax.lax.associative_scan(bb.add, h, axis=0)
        total = s[-1]

        # 4. constraint on the LDE: next-row rotation + elementwise algebra
        blowup = 1 << log_blowup
        c = bb.sub(jnp.roll(lde[:, 0], -blowup), bb.mont_mul(lde[:, 0], lde[:, 1 % width]))
        codeword = ext.mul(ext.from_base(c), jnp.broadcast_to(alpha, (N, 4)))

        # 5. first FRI fold: g = (lo + hi)/2 + beta * (lo - hi)/(2x),
        #    x_i = shift * w_N^i (same rule as stark.fri._fold_codeword)
        half = N // 2
        lo, hi = codeword[:half], codeword[half:]
        inv2 = bb.py_to_mont(pow(2, bb.P - 2, bb.P))
        from ..stark.fri import _fold_inv2x_table
        from ..stark.config import StarkConfig

        inv2x = jax.lax.with_sharding_constraint(
            jnp.asarray(_fold_inv2x_table(log_n + log_blowup, StarkConfig().coset_shift)),
            vec_sharding,
        )
        even = ext.mul_base(ext.add(lo, hi), jnp.uint32(inv2))
        odd = ext.mul(
            jnp.broadcast_to(beta, (half, 4)), ext.mul_base(ext.sub(lo, hi), inv2x)
        )
        folded = ext.add(even, odd)

        # 6. commit the folded codeword ((half, 8) leaf rows: pair layout)
        fold_leaves = jnp.concatenate([folded[: half // 2], folded[half // 2 :]], axis=1)
        fold_root = fold_commit_fn(fold_leaves)
        return root, total, fold_root

    fn = jax.jit(step)

    def make_args(seed: int = 0):
        rng = np.random.default_rng(seed)
        trace = rng.integers(0, bb.P, size=(n, width), dtype=np.uint64).astype(np.uint32)
        trace = jax.device_put(jnp.asarray(trace), row_sharding)
        alpha = bb.to_mont(jnp.asarray(np.array([3, 1, 4, 1], dtype=np.uint32)))
        beta = bb.to_mont(jnp.asarray(np.array([2, 7, 1, 8], dtype=np.uint32)))
        return trace, alpha, beta

    return fn, make_args
