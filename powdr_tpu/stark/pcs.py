"""Polynomial commitment scheme: coset-LDE + Merkle commit, batched
openings at extension points reduced to a single FRI instance.

This is the TPU replacement for the two-adic FRI PCS the reference uses
through the stark-backend fork (SURVEY.md §1 L5): matrices of trace
columns are low-degree-extended onto the coset `g*K` (blowup 2^k), rows
are Poseidon2-hashed into a Merkle tree, and openings at out-of-domain
points z are proven by FRI on the random linear combination
    sum_k alpha^k * (p_k(x) - p_k(z)) / (x - z).

Device work: per-column LDE (NTT pipeline), batched barycentric
evaluation (one EF4 batch-inverse + modular tree-reductions), reduced
codeword assembly.  Host work: transcripts, query assembly, verification.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from ..field import ext
from ..hash import merkle
from ..hash import poseidon2 as p2
from ..ntt import coset_lde
from .challenger import Challenger
from . import config as config_mod
from .config import StarkConfig
from .fri import FriProof, _pow_table
from . import fri as fri_mod

ExtVal = Tuple[int, int, int, int]  # canonical quartic element


# -- host-side scalar ext helpers -------------------------------------------


def py_ext_add(a: ExtVal, b: ExtVal) -> ExtVal:
    return tuple((x + y) % bb.P for x, y in zip(a, b))


def py_ext_sub(a: ExtVal, b: ExtVal) -> ExtVal:
    return tuple((x - y) % bb.P for x, y in zip(a, b))


def py_ext_pow(a: ExtVal, e: int) -> ExtVal:
    result: ExtVal = (1, 0, 0, 0)
    base = a
    while e:
        if e & 1:
            result = ext.py_mul(result, base)
        e >>= 1
        base = ext.py_mul(base, base)
    return result


# -- commitments -------------------------------------------------------------


@dataclass
class CommittedMatrix:
    """A committed (n, w) matrix of evaluations over the subgroup H_n.

    The LDE lives on the coset shift^(2^shift_pow) * K — shift_pow is the
    matrix's join depth in the mixed-height FRI batch
    (log_N_max - log_N_this), so its rows can be added into the fold when
    sizes match."""

    evals: jnp.ndarray  # (n, w) Montgomery
    lde: jnp.ndarray  # (N, w) Montgomery over coset shift^(2^sp)*K
    tree: merkle.MerkleTree
    root: np.ndarray  # (8,) Montgomery digest
    shift_pow: int = 0

    @property
    def n(self) -> int:
        return self.evals.shape[0]

    @property
    def width(self) -> int:
        return self.evals.shape[1]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _lde_matrix(evals: jnp.ndarray, log_blowup: int, shift: int) -> jnp.ndarray:
    return jnp.swapaxes(
        coset_lde(jnp.swapaxes(evals, 0, 1), log_blowup, shift), 0, 1
    )


def _commit_impl(evals: jnp.ndarray, log_blowup: int, shift: int):
    """LDE, then leaf hashing + every tree level in one dispatch.

    Kept as TWO jitted programs (LDE; hash+tree): fully fusing them into
    a single jit cut one tunnel round trip but exploded XLA compile time
    on the real TPU backend (the NTT ladder fused with the scanned
    Poseidon2 levels compiles for minutes per distinct matrix shape)."""
    lde = _lde_matrix(evals, log_blowup, shift)
    if config_mod.eager_prover():
        return lde, merkle._build_layers_eager(p2.hash_rows(lde))
    layers = merkle._build_layers(p2.hash_rows(lde))
    return lde, layers


def commit(evals: jnp.ndarray, config: StarkConfig, shift_pow: int = 0) -> CommittedMatrix:
    """Commit to a matrix of column polynomials given by their evals on H.

    `root` is left as the DEVICE array: fetching here would serialize one
    round trip per matrix; the prover batches the round's root fetches
    (observe_roots), and standalone callers np.asarray() it themselves."""
    shift = pow(config.coset_shift, 1 << shift_pow, bb.P)
    lde, layers = _commit_impl(evals, config.log_blowup, shift)
    tree = merkle.MerkleTree(list(layers))
    return CommittedMatrix(
        evals=evals, lde=lde, tree=tree, root=tree.root, shift_pow=shift_pow
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def _commit_impl_many(evals_tuple, log_blowup: int, shift: int):
    """LDE + leaf hashing + tree levels for MANY same-height matrices in
    one jitted program (a multi-chip round otherwise pays 2 dispatches
    per chip through the tunnel)."""
    out = []
    for evals in evals_tuple:
        lde = _lde_matrix.__wrapped__(evals, log_blowup, shift)
        layers = merkle._build_layers.__wrapped__(p2.hash_rows.__wrapped__(lde))
        out.append((lde, layers))
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _commit_impl_mixed(evals_tuple, log_blowup: int, shifts: tuple):
    """A WHOLE commitment round (mixed heights, per-matrix coset shifts)
    as one jitted program — on the tunneled chip each dispatch is a
    ~0.4s round trip, so a 20-chip round pays ~13 height-group dispatches
    otherwise."""
    out = []
    for evals, shift in zip(evals_tuple, shifts):
        lde = _lde_matrix.__wrapped__(evals, log_blowup, shift)
        layers = merkle._build_layers.__wrapped__(p2.hash_rows.__wrapped__(lde))
        out.append((lde, layers))
    return tuple(out)


def batch_rounds() -> bool:
    """Fuse each prover round's per-chip/per-group work into ONE jitted
    dispatch.  Default on accelerator backends (dispatch round trips
    dominate a tunneled chip); off on CPU, where the fused programs only
    bloat test-suite compile time.  Override: POWDR_TPU_BATCH_ROUNDS."""
    import os

    env = os.environ.get("POWDR_TPU_BATCH_ROUNDS")
    if env is not None:
        return env == "1"
    return jax.devices()[0].platform != "cpu"


def commit_group(
    evals_list: Sequence[jnp.ndarray], config: StarkConfig, shift_pow: int = 0
) -> List[CommittedMatrix]:
    """Batched commit of same-height matrices (one device dispatch)."""
    if len(evals_list) == 1 or config_mod.eager_prover():
        return [commit(e, config, shift_pow=shift_pow) for e in evals_list]
    shift = pow(config.coset_shift, 1 << shift_pow, bb.P)
    results = _commit_impl_many(tuple(evals_list), config.log_blowup, shift)
    out = []
    for evals, (lde, layers) in zip(evals_list, results):
        tree = merkle.MerkleTree(list(layers))
        out.append(
            CommittedMatrix(
                evals=evals, lde=lde, tree=tree, root=tree.root,
                shift_pow=shift_pow,
            )
        )
    return out


def commit_round(entries, config: StarkConfig, commit_fn=None) -> List[Optional[CommittedMatrix]]:
    """Commit a whole round: entries are (evals | None, shift_pow) pairs.
    With the default PCS, same-(height, shift) entries batch into one
    dispatch.  A custom commit_fn (e.g. the mesh-sharded prover's)
    commits per-matrix; it may DECLINE an entry by returning None, in
    which case that entry falls back into the default grouped batch —
    this keeps tiny periphery matrices on the batched single-device path
    while big tables shard."""
    out: List[Optional[CommittedMatrix]] = [None] * len(entries)
    groups: Dict[Tuple[int, int], List[int]] = {}
    use_custom = commit_fn is not None and commit_fn is not commit
    for i, (evals, sp) in enumerate(entries):
        if evals is None:
            continue
        if use_custom:
            cm = commit_fn(evals, config, shift_pow=sp)
            if cm is not None:
                out[i] = cm
                continue
        groups.setdefault((evals.shape[0], sp), []).append(i)
    if len(groups) > 1 and not config_mod.eager_prover() and batch_rounds():
        # whole round in one dispatch, mixed heights
        idxs = [i for g in groups.values() for i in g]
        shifts = tuple(
            pow(config.coset_shift, 1 << entries[i][1], bb.P) for i in idxs
        )
        results = _commit_impl_mixed(
            tuple(entries[i][0] for i in idxs), config.log_blowup, shifts
        )
        for i, (lde, layers) in zip(idxs, results):
            tree = merkle.MerkleTree(list(layers))
            out[i] = CommittedMatrix(
                evals=entries[i][0], lde=lde, tree=tree, root=tree.root,
                shift_pow=entries[i][1],
            )
        return out
    for (n, sp), idxs in groups.items():
        cms = commit_group([entries[i][0] for i in idxs], config, shift_pow=sp)
        for i, cm in zip(idxs, cms):
            out[i] = cm
    return out


# -- barycentric evaluation on device ----------------------------------------


@functools.lru_cache(maxsize=None)
def _subgroup_points(log_n: int) -> np.ndarray:
    """w_n^i Montgomery for i in [0, n)."""
    return bb.np_to_mont(_pow_table(bb.py_root_of_unity(log_n), 1 << log_n))


@functools.lru_cache(maxsize=None)
def _subgroup_points_dev(log_n: int) -> jnp.ndarray:
    """Device-resident copy, uploaded ONCE: passing the host table as a
    per-call argument re-transfers up to MBs through the tunneled link
    every proof (36 s of a 50 s warm keccak proof was exactly this)."""
    return jnp.asarray(_subgroup_points(log_n))


@functools.lru_cache(maxsize=None)
def _coset_points(log_n: int, shift: int) -> np.ndarray:
    t = _pow_table(bb.py_root_of_unity(log_n), 1 << log_n).astype(np.uint64)
    return bb.np_to_mont((t * (shift % bb.P) % bb.P).astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _coset_points_dev(log_n: int, shift: int) -> jnp.ndarray:
    return jnp.asarray(_coset_points(log_n, shift))


@jax.jit
def _eval_matrix_at(evals: jnp.ndarray, z_m: jnp.ndarray, scalar_m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Barycentric: p_j(z) for every column j of evals (n, w).

    z_m: (4,) Montgomery; scalar_m: (4,) Montgomery = (z^n - 1)/n;
    pts: (n,) Montgomery subgroup points.  Returns (w, 4) Montgomery."""
    diff = ext.sub(jnp.broadcast_to(z_m, (*pts.shape, 4)), ext.from_base(pts))
    dinv = ext.inv(diff)  # (n, 4)
    c = ext.mul(ext.mul_base(dinv, pts), jnp.broadcast_to(scalar_m, dinv.shape))  # (n,4)
    comps = []
    for k in range(4):
        prod = bb.mont_mul(c[:, k : k + 1], evals)  # (n, w)
        comps.append(bb.sum_mod(prod, axis=0))  # (w,)
    return jnp.stack(comps, axis=-1)


@jax.jit
def _eval_matrix_at_many(evals, z_ms, s_ms, pts):
    """Batched barycentric over points: z_ms/s_ms (P, 4) -> (P, w, 4)."""
    return jax.vmap(lambda z, s: _eval_matrix_at(evals, z, s, pts))(z_ms, s_ms)


@jax.jit
def _eval_all_matrices(evals_t, z_t, s_t, pts_t):
    """Claimed evaluations for EVERY matrix of an opening round in one
    dispatch, already converted to canonical form."""
    return tuple(
        bb.from_mont(_eval_matrix_at_many.__wrapped__(e, z, s, p))
        for e, z, s, p in zip(evals_t, z_t, s_t, pts_t)
    )


def _eval_inputs(mat: CommittedMatrix, zs: Sequence[ExtVal]):
    """(z_ms, s_ms, pts) device inputs for barycentric evaluation."""
    n = mat.n
    log_n = int(np.log2(n))
    n_inv = pow(n, bb.P - 2, bb.P)
    scalars = []
    for z in zs:
        zn = py_ext_pow(z, n)
        scalar = py_ext_sub(zn, (1, 0, 0, 0))
        scalars.append(tuple(v * n_inv % bb.P for v in scalar))
    z_ms = bb.to_mont(jnp.asarray(np.array(zs, dtype=np.uint32)))
    s_ms = bb.to_mont(jnp.asarray(np.array(scalars, dtype=np.uint32)))
    pts = _subgroup_points_dev(log_n)
    return z_ms, s_ms, pts


def eval_at_points_device(mat: CommittedMatrix, zs: Sequence[ExtVal]) -> jnp.ndarray:
    """Claimed evaluations p_j(z) as an UNFETCHED (P, w, 4) canonical
    device array — callers batch the fetch (one round trip per round)."""
    z_ms, s_ms, pts = _eval_inputs(mat, zs)
    if config_mod.eager_prover():
        rows = [
            _eval_matrix_at.__wrapped__(mat.evals, z_ms[i], s_ms[i], pts)
            for i in range(len(zs))
        ]
        return bb.from_mont(jnp.stack(rows, axis=0))
    return bb.from_mont(_eval_matrix_at_many(mat.evals, z_ms, s_ms, pts))


def eval_at_points(mat: CommittedMatrix, zs: Sequence[ExtVal]) -> List[np.ndarray]:
    """Claimed evaluations p_j(z) for each z, canonical (w, 4) each — one
    device dispatch + one fetch for all points of the matrix."""
    out = np.asarray(eval_at_points_device(mat, zs))
    return [out[i] for i in range(len(zs))]


def eval_at_point(mat: CommittedMatrix, z: ExtVal) -> np.ndarray:
    """Claimed evaluations p_j(z), canonical (w, 4)."""
    return eval_at_points(mat, [z])[0]


# -- reduced codeword ---------------------------------------------------------


@jax.jit
def _fold_columns(lde: jnp.ndarray, alphas: jnp.ndarray) -> jnp.ndarray:
    """sum_j alphas[j] * lde[:, j]  -> (N, 4);  lde (N,w) base, alphas (w,4)."""
    comps = []
    for k in range(4):
        prod = bb.mont_mul(lde, alphas[None, :, k])  # (N, w)
        comps.append(bb.sum_mod(prod, axis=1))
    return jnp.stack(comps, axis=-1)


@jax.jit
def _accumulate_term(acc, folded, y_comb, inv_xz):
    num = ext.sub(folded, jnp.broadcast_to(y_comb, folded.shape))
    return ext.add(acc, ext.mul(num, inv_xz))


@jax.jit
def _inv_x_minus_z(xs: jnp.ndarray, z_m: jnp.ndarray) -> jnp.ndarray:
    diff = ext.sub(ext.from_base(xs), jnp.broadcast_to(z_m, (*xs.shape, 4)))
    return ext.inv(diff)


@jax.jit
def _reduced_codewords_all(group_args):
    """All size groups' reduced codewords in one dispatch; each element of
    group_args is (ldes, a_ms, y_ms, z_ms, xs) as for _reduced_codeword."""
    return tuple(_reduced_codeword.__wrapped__(*args) for args in group_args)


@jax.jit
def _reduced_codeword(ldes, a_ms, y_ms, z_ms, xs):
    """Whole per-size reduction in ONE dispatch: for every term t,
    acc += (sum_j a_t[j]*lde_t[:,j] - y_t) / (x - z_t).  Tuple lengths are
    static under jit; distinct structures trace separately (and land in
    the persistent compile cache).  On a tunneled chip the eager per-term
    loop cost 2-3 round trips per (matrix, point)."""
    N = ldes[0].shape[0]
    acc = ext.zero((N,))
    for lde, a_m, y_m, z_m in zip(ldes, a_ms, y_ms, z_ms):
        folded = _fold_columns.__wrapped__(lde, a_m)
        dinv = _inv_x_minus_z.__wrapped__(xs, z_m)  # same (xs, z): XLA CSEs
        acc = _accumulate_term.__wrapped__(acc, folded, y_m, dinv)
    return acc


# -- opening proof ------------------------------------------------------------


@jax.jit
def _gather_openings(ldes, layer_tuples, idx_tuple):
    """Query rows + sibling paths for every matrix in ONE dispatch.
    idx_tuple[m]: (2*nq,) leaf indices; returns ((rows, paths), ...) with
    rows canonical (2*nq, w) and paths (2*nq, depth, 8) Montgomery."""
    out = []
    for lde, layers, both in zip(ldes, layer_tuples, idx_tuple):
        rows = bb.from_mont(jnp.take(lde, both, axis=0))
        cur = both
        sibs = []
        for layer in layers[:-1]:
            sibs.append(jnp.take(layer, cur ^ 1, axis=0))
            cur = cur >> 1
        if sibs:
            paths = jnp.stack(sibs, axis=1)
        else:
            paths = jnp.zeros((both.shape[0], 0, p2.DIGEST), jnp.uint32)
        out.append((rows, paths))
    return tuple(out)


@dataclass
class PcsMatrixQuery:
    row_lo: np.ndarray  # (w,) canonical, row at index q
    row_hi: np.ndarray  # (w,) canonical, row at index q + N/2
    path_lo: np.ndarray
    path_hi: np.ndarray


@dataclass
class PcsQuery:
    per_matrix: List[PcsMatrixQuery]


@dataclass
class PcsOpening:
    #: values[m][p] = (w_m, 4) canonical evals of matrix m at its p-th point
    values: List[List[np.ndarray]]
    fri: FriProof
    queries: List[PcsQuery]


def open_matrices(
    mats: Sequence[CommittedMatrix],
    points: Sequence[Sequence[ExtVal]],
    config: StarkConfig,
    challenger: Challenger,
) -> PcsOpening:
    """Open each matrix at its list of extension points, in one
    mixed-height FRI batch.  Matrices must have been committed with
    shift_pow = log_N_max - log_N_own."""
    log_Ns = [int(np.log2(m.n)) + config.log_blowup for m in mats]
    log_N_max = max(log_Ns)
    for m, lN in zip(mats, log_Ns):
        assert m.shift_pow == log_N_max - lN, "matrix committed with wrong shift"

    # claimed evaluations -> transcript.  ONE dispatch for all matrices
    # (batch_rounds) or one per matrix, and ONE fetch for everything: the
    # tunneled device->host link pays per round trip.
    if batch_rounds() and not config_mod.eager_prover() and len(mats) > 1:
        ins = [_eval_inputs(mat, list(zs)) for mat, zs in zip(mats, points)]
        pending = _eval_all_matrices(
            tuple(m.evals for m in mats),
            tuple(i[0] for i in ins),
            tuple(i[1] for i in ins),
            tuple(i[2] for i in ins),
        )
    else:
        pending = [
            eval_at_points_device(mat, list(zs)) for mat, zs in zip(mats, points)
        ]
    fetched_vals = jax.device_get(pending)
    values = [[np.asarray(v[i]) for i in range(v.shape[0])] for v in fetched_vals]
    for vals in values:
        for v in vals:
            for row in v:
                challenger.observe_ext(tuple(int(c) for c in row))

    from .prover import _progress

    _progress("open: claimed evals fetched")
    alpha = challenger.sample_ext()

    # reduced codewords per size — one fused dispatch per size group
    groups: Dict[int, List] = {}
    k = 0
    for mat, zs, vals, log_N in zip(mats, points, values, log_Ns):
        shift = pow(config.coset_shift, 1 << mat.shift_pow, bb.P)
        w = mat.width
        for z, y in zip(zs, vals):
            apows = np.array([py_ext_pow(alpha, k + j) for j in range(w)], dtype=np.uint32)
            k += w
            a_m = bb.to_mont(jnp.asarray(apows))  # (w, 4)
            y_comb = (0, 0, 0, 0)
            for j in range(w):
                y_comb = py_ext_add(
                    y_comb, ext.py_mul(tuple(int(c) for c in y[j]), tuple(int(c) for c in apows[j]))
                )
            y_m = bb.to_mont(jnp.asarray(np.array(y_comb, dtype=np.uint32)))
            z_m = bb.to_mont(jnp.asarray(np.array(z, dtype=np.uint32)))
            groups.setdefault(log_N, []).append((mat.lde, a_m, y_m, z_m, shift))
    acc: Dict[int, jnp.ndarray] = {}
    eager = config_mod.eager_prover()
    group_args = {}
    for log_N, terms in groups.items():
        shift = terms[0][4]
        xs = _coset_points_dev(log_N, shift)
        group_args[log_N] = (
            tuple(t[0] for t in terms),
            tuple(t[1] for t in terms),
            tuple(t[2] for t in terms),
            tuple(t[3] for t in terms),
            xs,
        )
    if batch_rounds() and not eager and len(group_args) > 1:
        # every size group's reduction in ONE dispatch
        logs = tuple(sorted(group_args))
        outs = _reduced_codewords_all(tuple(group_args[l] for l in logs))
        acc = dict(zip(logs, outs))
    else:
        reduced_fn = _reduced_codeword.__wrapped__ if eager else _reduced_codeword
        for log_N, args in group_args.items():
            acc[log_N] = reduced_fn(*args)

    _progress("open: reduced codewords built")
    fri_proof = fri_mod.prove(acc, config, challenger)
    _progress("open: fri done")

    # per-query row openings (per-matrix indices: q mod (N_m / 2)).
    # All rows + sibling paths are gathered ON DEVICE and fetched in one
    # device_get — the tunneled-TPU link is ~MB/s, so fetching whole LDE
    # matrices (the old path) dominated end-to-end proof latency.
    qs = np.array([fq.index for fq in fri_proof.queries], dtype=np.int64)
    nq = len(qs)
    if batch_rounds() and not config_mod.eager_prover() and len(mats) > 1:
        # one jitted program for EVERY matrix's rows + sibling paths: the
        # eager per-matrix-per-layer takes are ~1300 dispatches on a
        # 64-matrix opening, most of the warm proof's latency
        idxs = []
        for log_N in log_Ns:
            half = (1 << log_N) // 2
            i_m = qs % half
            idxs.append(jnp.asarray(np.concatenate([i_m, i_m + half])))
        gathers = _gather_openings(
            tuple(m.lde for m in mats),
            tuple(tuple(m.tree.layers) for m in mats),
            tuple(idxs),
        )
    else:
        gathers = []
        for mat, log_N in zip(mats, log_Ns):
            half = (1 << log_N) // 2
            i_m = qs % half
            both = np.concatenate([i_m, i_m + half])
            rows = bb.from_mont(jnp.take(mat.lde, jnp.asarray(both), axis=0))
            paths = mat.tree.open_paths_device(both)
            gathers.append((rows, paths))
    fetched = jax.device_get(gathers)
    _progress("open: query gathers fetched")

    queries: List[PcsQuery] = []
    for k in range(nq):
        per_matrix = []
        for rows, paths in fetched:
            per_matrix.append(
                PcsMatrixQuery(
                    row_lo=np.array(rows[k], dtype=np.uint32),
                    row_hi=np.array(rows[nq + k], dtype=np.uint32),
                    path_lo=np.array(paths[k]),
                    path_hi=np.array(paths[nq + k]),
                )
            )
        queries.append(PcsQuery(per_matrix=per_matrix))

    return PcsOpening(values=values, fri=fri_proof, queries=queries)


def verify_openings(
    roots: Sequence[np.ndarray],
    points: Sequence[Sequence[ExtVal]],
    opening: PcsOpening,
    log_ns: Sequence[int],
    config: StarkConfig,
    challenger: Challenger,
) -> None:
    """Host-side verification of a mixed-height batch opening; raises
    AssertionError on failure.  log_ns: per-matrix trace log-heights."""
    log_Ns = [l + config.log_blowup for l in log_ns]
    log_N_max = max(log_Ns)

    assert len(opening.queries) == config.num_queries, "PCS query count mismatch"
    assert len(opening.values) == len(roots) == len(points) == len(log_ns)
    for pq in opening.queries:
        assert len(pq.per_matrix) == len(roots), "per-query matrix count mismatch"
    for vals, zs in zip(opening.values, points):
        assert len(vals) == len(zs)
        for v in vals:
            for row in v:
                challenger.observe_ext(tuple(int(c) for c in row))
    alpha = challenger.sample_ext()

    # per-(matrix, point) alpha powers and combined y values
    terms = []  # (mat_idx, z, apows list, y_comb)
    k = 0
    for m_idx, (vals, zs) in enumerate(zip(opening.values, points)):
        for z, y in zip(zs, vals):
            w = y.shape[0]
            apows = [py_ext_pow(alpha, k + j) for j in range(w)]
            k += w
            y_comb = (0, 0, 0, 0)
            for j in range(w):
                y_comb = py_ext_add(y_comb, ext.py_mul(tuple(int(c) for c in y[j]), apows[j]))
            terms.append((m_idx, z, apows, y_comb))

    # all row digests per matrix in ONE host hash dispatch each, and all
    # path checks deferred to one batched verification (per-row hashes +
    # per-level compresses across queries x matrices dominated verify time)
    nq = len(opening.queries)
    digests: List[np.ndarray] = []
    for m_idx in range(len(roots)):
        rows = np.stack(
            [
                bb.np_to_mont(np.asarray(r, dtype=np.uint32))
                for pq in opening.queries
                for r in (pq.per_matrix[m_idx].row_lo, pq.per_matrix[m_idx].row_hi)
            ]
        )
        digests.append(np.asarray(p2.hash_rows_host(jnp.asarray(rows))))
    deferred_paths: List[tuple] = []
    qn = [0]  # ordinal of the query currently being opened

    query_state: Dict[int, Dict] = {}  # per active query: verified rows
    query_iter = iter(opening.queries)
    current: Dict = {}

    def reduced_at(x: int, log_N: int, rows: Dict[int, np.ndarray]) -> ExtVal:
        total: ExtVal = (0, 0, 0, 0)
        for m_idx, z, apows, y_comb in terms:
            if log_Ns[m_idx] != log_N:
                continue
            row = rows[m_idx]
            s: ExtVal = (0, 0, 0, 0)
            for j, a in enumerate(apows):
                s = py_ext_add(s, tuple(int(row[j]) * c % bb.P for c in a))
            num = py_ext_sub(s, y_comb)
            d = ((x - z[0]) % bb.P, (-z[1]) % bb.P, (-z[2]) % bb.P, (-z[3]) % bb.P)
            total = py_ext_add(total, ext.py_mul(num, ext.py_inv(d)))
        return total

    def open_input(pair_idx: int, log_N: int):
        if log_N == log_N_max:
            # new query starts: pull the next query's row set; its path
            # checks are deferred into the batched verification
            current.clear()
            pq = next(query_iter)
            k = qn[0]
            qn[0] += 1
            q = pair_idx
            rows_lo: Dict[int, np.ndarray] = {}
            rows_hi: Dict[int, np.ndarray] = {}
            for m_idx, (mq, root) in enumerate(zip(pq.per_matrix, roots)):
                half = (1 << log_Ns[m_idx]) // 2
                i_m = q % half
                depth = log_Ns[m_idx]
                deferred_paths.append(
                    (root, i_m, digests[m_idx][2 * k], mq.path_lo, depth)
                )
                deferred_paths.append(
                    (root, i_m + half, digests[m_idx][2 * k + 1], mq.path_hi, depth)
                )
                rows_lo[m_idx] = mq.row_lo
                rows_hi[m_idx] = mq.row_hi
            current["rows_lo"] = rows_lo
            current["rows_hi"] = rows_hi
        rows_lo, rows_hi = current["rows_lo"], current["rows_hi"]
        shift = pow(config.coset_shift, 1 << (log_N_max - log_N), bb.P)
        w_N = bb.py_root_of_unity(log_N)
        half = (1 << log_N) // 2
        i = pair_idx % half
        x_lo = shift * pow(w_N, i, bb.P) % bb.P
        x_hi = shift * pow(w_N, i + half, bb.P) % bb.P
        return np.array(
            [reduced_at(x_lo, log_N, rows_lo), reduced_at(x_hi, log_N, rows_hi)],
            dtype=np.uint32,
        )

    fri_mod.verify(opening.fri, sorted(set(log_Ns), reverse=True), config, challenger, open_input=open_input)
    ok = merkle.verify_paths(deferred_paths)
    assert ok.all(), f"bad row path (items {np.nonzero(~ok)[0][:4]})"
