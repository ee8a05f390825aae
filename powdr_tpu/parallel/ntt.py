"""Mesh-sharded NTT / inverse NTT / coset LDE (Bailey four-step).

The TPU-native replacement for the single-node NTT of the reference's
stark-backend fork, designed for ICI collectives (SURVEY.md §2
'Parallelism strategies'): with n = N1*N2 viewed as a matrix,
  1. local N2-point NTTs along the contiguous axis (each device holds a
     slab of N1-columns),
  2. elementwise twiddle w_n^{n1*k2},
  3. all-to-all transpose over the mesh axis,
  4. local N1-point NTTs,
  5. all-to-all back to natural contiguous sharding.
Derivation: with t = n1 + N1*n2 and k = k2 + N2*k1,
  X[k2 + N2*k1] = sum_{n1} w_N1^{n1 k1} * w_n^{n1 k2}
                    * sum_{n2} x[n1 + N1 n2] w_N2^{n2 k2}.

Coset LDE avoids zero-pad redistribution entirely: the blowup-extended
domain splits into `blowup` cosets of H, so the LDE is `blowup`
independent size-n NTTs of the scaled coefficients, and the natural-order
result is a local interleave (j = k + blowup*i)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import babybear as bb
from ..ntt.ntt import _dif, _root_table, _shift_powers, _stage_tables, bitrev
from ..stark.fri import _pow_table

AXIS = "shard"


# -- host-side tables ---------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _four_step_twiddles(log_n1: int, log_n2: int, inverse: bool) -> np.ndarray:
    """T[k2, n1] = w_n^{n1*k2} (Montgomery), n = 2^(log_n1+log_n2)."""
    log_n = log_n1 + log_n2
    n1, n2 = 1 << log_n1, 1 << log_n2
    n = 1 << log_n
    w = bb.py_root_of_unity(log_n)
    if inverse:
        w = pow(w, bb.P - 2, bb.P)
    e = (np.arange(n2, dtype=np.uint64)[:, None] * np.arange(n1, dtype=np.uint64)[None, :]) % n
    out = np.ones((n2, n1), dtype=np.uint64)
    wk = w
    for bit in range(log_n):
        sel = (e >> bit) & 1 == 1
        out[sel] = out[sel] * wk % bb.P
        wk = wk * wk % bb.P
    return bb.np_to_mont(out.astype(np.uint32))


def _split_log(log_n: int):
    log_n1 = log_n // 2
    return log_n1, log_n - log_n1


# -- local four-step pieces (run inside shard_map) ----------------------------


def _ntt_last_axis(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Natural->natural (I)NTT along the last axis, without 1/n scaling."""
    log_m = int(np.log2(x.shape[-1]))
    return bitrev(_dif(x, log_m, _stage_tables(log_m, inverse)))


def _four_step_local(x_local: jnp.ndarray, tw_local: jnp.ndarray, inverse: bool, n_dev: int):
    """Device-local body.  x_local: (N2/D, N1) natural contiguous chunk of
    x.reshape(N2, N1); returns natural contiguous chunk of the transform."""
    # step 0: all_to_all to column sharding: (N2, N1/D)
    d = n_dev
    n2_loc, n1 = x_local.shape
    x_cols = jax.lax.all_to_all(
        x_local.reshape(n2_loc, d, n1 // d), AXIS, split_axis=1, concat_axis=0
    ).reshape(n2_loc * d, n1 // d)
    # step 1: N2-point NTT along axis 0 (transpose to use last-axis kernel)
    x_cols = _ntt_last_axis(x_cols.T, inverse).T  # (N2, N1/D)
    # step 2: twiddles  T[k2, n1_local]
    x_cols = bb.mont_mul(x_cols, tw_local)
    # step 3: all_to_all back to row sharding: (N2/D, N1)
    # untiled all_to_all: the size-d split axis is removed and the received
    # (source) axis is inserted at concat_axis — so concat_axis=1 yields
    # (n2_loc, d, n1/d) = source-major column chunks per row
    x_rows = jax.lax.all_to_all(
        x_cols.reshape(d, n2_loc, n1 // d), AXIS, split_axis=0, concat_axis=1
    ).reshape(n2_loc, n1)
    # step 4: N1-point NTT along axis 1
    e = _ntt_last_axis(x_rows, inverse)  # E[k2_local, k1]
    # step 5: natural order X.reshape(N1, N2) = E^T -> all_to_all transpose
    out = jax.lax.all_to_all(
        e.reshape(n2_loc, d, n1 // d), AXIS, split_axis=1, concat_axis=0
    ).reshape(n2_loc * d, n1 // d)
    # out[k2, k1_local] with k1_local chunked; transpose locally
    return out.T.reshape(-1)  # (N1/D * N2,) = natural chunk of X


def make_sharded_ntt(mesh: Mesh, log_n: int, inverse: bool = False):
    """Returns a jitted fn: (n,)->(n,), input/output sharded contiguously
    (PartitionSpec(AXIS)) over `mesh`."""
    d = mesh.shape[AXIS]
    log_n1, log_n2 = _split_log(log_n)
    n1, n2 = 1 << log_n1, 1 << log_n2
    assert n2 % d == 0 and n1 % d == 0, "device count must divide both factors"
    tw = jnp.asarray(_four_step_twiddles(log_n1, log_n2, inverse))  # (N2, N1)

    def body(x_chunk, tw_local):
        return _four_step_local(x_chunk.reshape(n2 // d, n1), tw_local, inverse, d)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(None, AXIS)),
        out_specs=P(AXIS),
    )

    if inverse:
        n_inv = bb.py_to_mont(pow(1 << log_n, bb.P - 2, bb.P))

        def full(x):
            return bb.mont_mul(fn(x, tw), jnp.uint32(n_inv))

    else:

        def full(x):
            return fn(x, tw)

    return jax.jit(full)


def _four_step_local_batched(x_local: jnp.ndarray, tw_local: jnp.ndarray, inverse: bool, n_dev: int):
    """Batched device-local body: x_local (B, N2/D, N1) natural contiguous
    chunks of x.reshape(B, N2, N1); returns (B, N2/D * N1) natural chunks."""
    d = n_dev
    B, n2_loc, n1 = x_local.shape
    x_cols = jax.lax.all_to_all(
        x_local.reshape(B, n2_loc, d, n1 // d), AXIS, split_axis=2, concat_axis=1
    ).reshape(B, n2_loc * d, n1 // d)
    # N2-point NTT along axis 1 (move it to the trailing axis)
    x_cols = jnp.swapaxes(
        _ntt_last_axis(jnp.swapaxes(x_cols, 1, 2), inverse), 1, 2
    )  # (B, N2, N1/D)
    x_cols = bb.mont_mul(x_cols, tw_local[None])
    x_rows = jax.lax.all_to_all(
        x_cols.reshape(B, d, n2_loc, n1 // d), AXIS, split_axis=1, concat_axis=2
    ).reshape(B, n2_loc, n1)
    e = _ntt_last_axis(x_rows, inverse)  # (B, k2_local, k1)
    out = jax.lax.all_to_all(
        e.reshape(B, n2_loc, d, n1 // d), AXIS, split_axis=2, concat_axis=1
    ).reshape(B, n2_loc * d, n1 // d)
    return jnp.swapaxes(out, 1, 2).reshape(B, -1)


def make_sharded_ntt_batch(mesh: Mesh, log_n: int, inverse: bool = False):
    """Returns a jitted fn: (B, n) -> (B, n), rows transformed
    independently, data sharded P(None, AXIS) (columns of the batch
    matrix contiguous per device)."""
    d = mesh.shape[AXIS]
    log_n1, log_n2 = _split_log(log_n)
    n1, n2 = 1 << log_n1, 1 << log_n2
    assert n2 % d == 0 and n1 % d == 0, "device count must divide both factors"
    tw = jnp.asarray(_four_step_twiddles(log_n1, log_n2, inverse))  # (N2, N1)

    def body(x_chunk, tw_local):
        B = x_chunk.shape[0]
        return _four_step_local_batched(x_chunk.reshape(B, n2 // d, n1), tw_local, inverse, d)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, AXIS), P(None, AXIS)),
        out_specs=P(None, AXIS),
    )

    if inverse:
        n_inv = bb.py_to_mont(pow(1 << log_n, bb.P - 2, bb.P))
        return jax.jit(lambda x: bb.mont_mul(fn(x, tw), jnp.uint32(n_inv)))
    return jax.jit(lambda x: fn(x, tw))


def make_sharded_coset_lde_batch(mesh: Mesh, log_n: int, log_blowup: int, shift: int = bb.GENERATOR):
    """(B, n) evals over H -> (B, n * 2^log_blowup) evals over shift*K,
    natural order, sharded P(None, AXIS).  Same coset-per-NTT structure as
    make_sharded_coset_lde, batched so a whole trace matrix LDEs in one
    dispatch."""
    intt_fn = make_sharded_ntt_batch(mesh, log_n, inverse=True)
    ntt_fn = make_sharded_ntt_batch(mesh, log_n, inverse=False)
    blowup = 1 << log_blowup
    n = 1 << log_n
    log_N = log_n + log_blowup
    w_N = bb.py_root_of_unity(log_N)
    d = mesh.shape[AXIS]

    scales = []
    for k in range(blowup):
        s = shift * pow(w_N, k, bb.P) % bb.P
        scales.append(bb.np_to_mont(_pow_table(s, n)))
    scales = jnp.asarray(np.stack(scales))  # (blowup, n)

    def interleave_body(*cs):
        # each (B, n/D) local -> (B, n/D * blowup) natural chunk
        return jnp.stack(cs, axis=-1).reshape(cs[0].shape[0], -1)

    inter = jax.shard_map(
        interleave_body,
        mesh=mesh,
        in_specs=tuple(P(None, AXIS) for _ in range(blowup)),
        out_specs=P(None, AXIS),
    )

    def full(evals):
        coeffs = intt_fn(evals)
        cosets = [ntt_fn(bb.mont_mul(coeffs, scales[k][None])) for k in range(blowup)]
        return inter(*cosets)

    return jax.jit(full)


def make_sharded_coset_lde(mesh: Mesh, log_n: int, log_blowup: int, shift: int = bb.GENERATOR):
    """(n,) evals over H -> (n * 2^log_blowup,) evals over shift*K, natural
    order, sharded contiguously.  One sharded INTT + `blowup` sharded NTTs
    of coset-scaled coefficients + a local interleave."""
    intt_fn = make_sharded_ntt(mesh, log_n, inverse=True)
    ntt_fn = make_sharded_ntt(mesh, log_n, inverse=False)
    blowup = 1 << log_blowup
    n = 1 << log_n
    log_N = log_n + log_blowup
    w_N = bb.py_root_of_unity(log_N)
    d = mesh.shape[AXIS]

    # per-coset coefficient scale tables: (shift * w_N^k)^i
    scales = []
    for k in range(blowup):
        s = shift * pow(w_N, k, bb.P) % bb.P
        scales.append(bb.np_to_mont(_pow_table(s, n)))
    scales = jnp.asarray(np.stack(scales))  # (blowup, n)
    lde_sharding = NamedSharding(mesh, P(AXIS))

    def interleave(cosets, n_local):
        # cosets: (blowup, n/D) local -> natural chunk (n/D * blowup,)
        return jnp.stack(cosets, axis=-1).reshape(n_local * blowup)

    inter = jax.shard_map(
        lambda *cs: interleave(cs, n // d),
        mesh=mesh,
        in_specs=tuple(P(AXIS) for _ in range(blowup)),
        out_specs=P(AXIS),
    )

    def full(evals):
        coeffs = intt_fn(evals)
        cosets = [ntt_fn(bb.mont_mul(coeffs, scales[k])) for k in range(blowup)]
        return inter(*cosets)

    return jax.jit(full)
