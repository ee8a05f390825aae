"""Poseidon2 permutation over BabyBear (width 16), batched for TPU.

Structure follows the Poseidon2 paper (Grassi-Khovratovich-Schofnegger):
  - 8 external (full) rounds: 4 before + 4 after the internal rounds;
    each = add round constants, x^7 S-box on all lanes, external matrix M_E
    with M_E = circ(2*M4, M4, .., M4), M4 the 4x4 MDS from the paper,
    applied via the 8-add/4-double sequence (no generic matmul).
  - 13 internal (partial) rounds: constant + x^7 on lane 0 only, then
    M_I = J + diag(mu) (row sum plus scaled diagonal).

The reference pins plonky3's BabyBear Poseidon2 through the stark-backend
fork (SURVEY.md §7 step 2; /root/reference/Cargo.toml:88-100).  That fork is
not vendored, so its round constants are not available in this environment;
we generate nothing-up-my-sleeve constants from SHA-256 in counter mode
(seed below) with rejection sampling.  The constant tables are a single
swap point (`RC_EXTERNAL/RC_INTERNAL/INT_DIAG`) so plonky3's tables can be
dropped in when test vectors are available; everything downstream
(challenger, FRI, verifier) is self-consistent against these tables.

All state arrays: uint32 Montgomery, shape (..., 16); ops vectorize over
leading dims (the batch of rows/leaves being hashed).
"""
from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb

WIDTH = 16
RATE = 8
CAPACITY = 8
DIGEST = 8
ROUNDS_F = 8  # external rounds total (half before, half after)
ROUNDS_P = 13  # internal rounds
SBOX_DEGREE = 7  # gcd(7, p-1) = 1

_SEED = b"powdr-tpu/poseidon2/babybear/w16/v1"


def _nums_stream(n: int, tag: bytes) -> np.ndarray:
    """n field elements from SHA-256(seed||tag||counter), rejection sampled."""
    out = []
    ctr = 0
    while len(out) < n:
        h = hashlib.sha256(_SEED + tag + ctr.to_bytes(8, "little")).digest()
        for i in range(0, 32, 4):
            v = int.from_bytes(h[i : i + 4], "little")
            if v < bb.P and len(out) < n:
                out.append(v)
        ctr += 1
    return np.array(out, dtype=np.uint32)


@functools.lru_cache(maxsize=None)
def constants():
    """(rc_external (8,16), rc_internal (13,), int_diag (16,)) — Montgomery."""
    rc_ext = _nums_stream(ROUNDS_F * WIDTH, b"/rc_ext").reshape(ROUNDS_F, WIDTH)
    rc_int = _nums_stream(ROUNDS_P, b"/rc_int")
    # internal diagonal: require M_I = J + diag(mu) invertible mod p
    attempt = 0
    while True:
        diag = _nums_stream(WIDTH, b"/diag%d" % attempt)
        m = (np.ones((WIDTH, WIDTH), dtype=object) + np.diag(diag.astype(object))) % bb.P
        if _det_mod_p(m) != 0:
            break
        attempt += 1
    return (
        bb.np_to_mont(rc_ext),
        bb.np_to_mont(rc_int),
        bb.np_to_mont(diag),
    )


def _det_mod_p(m) -> int:
    m = [[int(x) % bb.P for x in row] for row in m]
    n = len(m)
    det = 1
    for c in range(n):
        piv = next((r for r in range(c, n) if m[r][c]), None)
        if piv is None:
            return 0
        if piv != c:
            m[c], m[piv] = m[piv], m[c]
            det = -det
        det = det * m[c][c] % bb.P
        inv = pow(m[c][c], bb.P - 2, bb.P)
        for r in range(c + 1, n):
            f = m[r][c] * inv % bb.P
            if f:
                for k in range(c, n):
                    m[r][k] = (m[r][k] - f * m[c][k]) % bb.P
    return det % bb.P


def _dbl(x):
    return bb.add(x, x)


def _external_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """M_E = circ(2*M4, M4, M4, M4) on (..., 16).

    View as (..., 4 groups, 4 lanes); the M4 add-sequence runs once,
    vectorized over all groups, then the circulant part adds group sums.
    """
    g = x.reshape(*x.shape[:-1], 4, 4)
    x0, x1, x2, x3 = g[..., 0], g[..., 1], g[..., 2], g[..., 3]
    t0 = bb.add(x0, x1)
    t1 = bb.add(x2, x3)
    t2 = bb.add(_dbl(x1), t1)
    t3 = bb.add(_dbl(x3), t0)
    t4 = bb.add(_dbl(_dbl(t1)), t3)
    t5 = bb.add(_dbl(_dbl(t0)), t2)
    t6 = bb.add(t3, t5)
    t7 = bb.add(t2, t4)
    y = jnp.stack([t6, t5, t7, t4], axis=-1)  # (..., 4, 4) = M4 per group
    s = y[..., 0, :]
    for i in range(1, 4):
        s = bb.add(s, y[..., i, :])  # column sums across groups
    y = bb.add(y, s[..., None, :])
    return y.reshape(*x.shape[:-1], 16)


def _sbox(x):
    x2 = bb.mont_sqr(x)
    x3 = bb.mont_mul(x2, x)
    x6 = bb.mont_sqr(x3)
    return bb.mont_mul(x6, x)


def permute(state: jnp.ndarray) -> jnp.ndarray:
    """Poseidon2 permutation on (..., 16) Montgomery uint32.

    Rounds run under lax.scan so the traced graph is one round body per
    phase (fast XLA compiles; the batch dim carries the parallelism)."""
    rc_ext, rc_int, diag = constants()
    rc_ext = jnp.asarray(rc_ext)
    rc_int = jnp.asarray(rc_int)
    diag = jnp.asarray(diag)
    half = ROUNDS_F // 2

    def ext_round(x, rc):
        x = _sbox(bb.add(x, rc))
        return _external_matrix(x), None

    def int_round(x, rc):
        l0 = _sbox(bb.add(x[..., 0], rc))
        x = x.at[..., 0].set(l0)
        s = x[..., 0]
        for i in range(1, WIDTH):
            s = bb.add(s, x[..., i])
        return bb.add(s[..., None], bb.mont_mul(x, diag)), None

    # initial external matrix (Poseidon2 applies M_E once before round 1)
    x = _external_matrix(state)
    x, _ = jax.lax.scan(ext_round, x, rc_ext[:half])
    x, _ = jax.lax.scan(int_round, x, rc_int)
    x, _ = jax.lax.scan(ext_round, x, rc_ext[half:])
    return x


@jax.jit
def permute_jit(state: jnp.ndarray) -> jnp.ndarray:
    return permute(state)


@functools.lru_cache(maxsize=None)
def _cpu_permute():
    """Challenger/verifier permute pinned to a host CPU device when one
    exists — transcript traffic is tiny and per-call round trips to a
    tunneled accelerator dominate otherwise."""
    import jax as _jax

    try:
        cpu = _jax.devices("cpu")[0]
        return _jax.jit(permute, device=cpu)
    except RuntimeError:
        return permute_jit


def permute_host(state: jnp.ndarray) -> jnp.ndarray:
    return _cpu_permute()(state)


@functools.lru_cache(maxsize=None)
def _cpu_hash_rows():
    """Verifier-side hash_rows pinned to host CPU: a proof check touches a
    few hundred tiny rows, and each device call through a tunneled chip
    costs a ~0.4s round trip."""
    import jax as _jax

    try:
        cpu = _jax.devices("cpu")[0]
        return _jax.jit(hash_rows.__wrapped__, device=cpu)
    except RuntimeError:
        return hash_rows


def hash_rows_host(matrix: jnp.ndarray) -> jnp.ndarray:
    return _cpu_hash_rows()(matrix)


@functools.lru_cache(maxsize=None)
def _cpu_compress():
    import jax as _jax

    try:
        cpu = _jax.devices("cpu")[0]
        return _jax.jit(compress.__wrapped__, device=cpu)
    except RuntimeError:
        return compress


def compress_host(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    return _cpu_compress()(left, right)


@jax.jit
def hash_rows(matrix: jnp.ndarray) -> jnp.ndarray:
    """Sponge-hash each row of (n, w) -> digests (n, 8).

    Absorb RATE lanes per permutation (zero-padded final block), capacity
    untouched; squeeze the first DIGEST lanes.
    """
    n, w = matrix.shape
    nblocks = max((w + RATE - 1) // RATE, 1)
    pad_w = nblocks * RATE
    if pad_w != w:
        matrix = jnp.pad(matrix, ((0, 0), (0, pad_w - w)))
    state = jnp.zeros((n, WIDTH), dtype=jnp.uint32)
    for b in range(nblocks):
        block = matrix[:, b * RATE : (b + 1) * RATE]
        state = state.at[:, :RATE].set(bb.add(state[:, :RATE], block))
        state = permute(state)
    return state[:, :DIGEST]


@jax.jit
def compress(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """2-to-1 compression on (n, 8) digests -> (n, 8)."""
    state = jnp.concatenate([left, right], axis=-1)
    return permute(state)[:, :DIGEST]
