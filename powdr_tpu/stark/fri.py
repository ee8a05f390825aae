"""FRI low-degree test over the BabyBear quartic extension.

Prover folds on device (vectorized over the codeword; fold sums become
`psum`-style collectives when the codeword is sharded — see
powdr_tpu.parallel); the verifier is host-side python over the tiny query
transcripts.  Replaces the FRI commit/query phases of the reference's
stark-backend fork (SURVEY.md §7 step 5, BASELINE.md north star).

Codeword: evaluations of a polynomial over the coset `shift * G_n`
(natural order), shape (n, 4) uint32 Montgomery (EF4).
Fold rule: g(x^2) = (f(x) + f(-x))/2 + beta * (f(x) - f(-x)) / (2x),
with -x = x * w^(n/2) living at index i + n/2.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from ..field import ext
from ..hash import merkle
from ..hash import poseidon2 as p2
from .challenger import Challenger
from .config import StarkConfig


# -- host-side domain tables -------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pow_table(base: int, n: int) -> np.ndarray:
    """[base^0 .. base^(n-1)] canonical uint32 (vectorized bit trick)."""
    out = np.ones(n, dtype=np.uint64)
    j = np.arange(n, dtype=np.uint64)
    bk = base % bb.P
    bit = 0
    while (1 << bit) < max(n, 2):
        sel = (j >> bit) & 1 == 1
        out[sel] = out[sel] * bk % bb.P
        bk = bk * bk % bb.P
        bit += 1
    return out.astype(np.uint32)


@functools.lru_cache(maxsize=None)
def _fold_inv2x_table(log_n: int, shift: int) -> np.ndarray:
    """Montgomery table of 1/(2*x_i), x_i = shift * w_n^i, i in [0, n/2)."""
    n = 1 << log_n
    w_inv = pow(bb.py_root_of_unity(log_n), bb.P - 2, bb.P)
    c = pow(2 * shift % bb.P, bb.P - 2, bb.P)
    tbl = _pow_table(w_inv, n // 2).astype(np.uint64) * c % bb.P
    return bb.np_to_mont(tbl.astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _fold_inv2x_dev(log_n: int, shift: int) -> jnp.ndarray:
    """Device-resident copy, uploaded once (per-call host args re-cross
    the tunneled link every proof)."""
    return jnp.asarray(_fold_inv2x_table(log_n, shift))


# -- device fold -------------------------------------------------------------


@jax.jit
def _fold_codeword(cw: jnp.ndarray, beta: jnp.ndarray, inv2x: jnp.ndarray) -> jnp.ndarray:
    h = cw.shape[0] // 2
    lo, hi = cw[:h], cw[h:]
    s = ext.add(lo, hi)
    d = ext.sub(lo, hi)
    inv2 = bb.py_to_mont(pow(2, bb.P - 2, bb.P))
    even = ext.mul_base(s, jnp.uint32(inv2))
    odd = ext.mul(jnp.broadcast_to(beta, d.shape), ext.mul_base(d, inv2x))
    return ext.add(even, odd)


@jax.jit
def _pair_leaves(cw: jnp.ndarray) -> jnp.ndarray:
    """(n,4) codeword -> (n/2, 8) leaf rows [f(x_i), f(-x_i)]."""
    h = cw.shape[0] // 2
    return jnp.concatenate([cw[:h], cw[h:]], axis=-1)


@jax.jit
def _commit_layer(cw: jnp.ndarray):
    """Leaf pairing + hashing + every Merkle level, one dispatch."""
    return merkle._build_layers.__wrapped__(
        p2.hash_rows.__wrapped__(_pair_leaves.__wrapped__(cw))
    )


def _fold_join(cw, beta_m, inv2x, join):
    nxt = _fold_codeword(cw, beta_m, inv2x)
    return ext.add(nxt, join) if join is not None else nxt


@jax.jit
def _fold_join_commit(cw, beta_m, inv2x, join):
    """Fold, optionally add the joining codeword, and commit the next
    layer — the whole inter-transcript step as one program."""
    nxt = _fold_codeword.__wrapped__(cw, beta_m, inv2x)
    if join is not None:
        nxt = ext.add(nxt, join)
    return nxt, _commit_layer.__wrapped__(nxt)


@jax.jit
def _commit_phase_device(cw, joins, inv2xs, st0):
    """The whole FRI commit phase in one program: per layer, build the
    Merkle tree, absorb the root into the duplex sponge (overwrite-rate,
    one permutation — exactly Challenger's discipline for an 8-lane
    digest absorbed into an empty input buffer), squeeze beta from the
    top-of-rate lanes (list.pop order: lanes 7,6,5,4), fold, add the
    joining codeword.  Returns ([(cw, tree_layers)], final_cw, betas)."""
    st = st0
    outs = []
    betas = []
    for join, inv2x in zip(joins, inv2xs):
        tree_layers = merkle._build_layers.__wrapped__(
            p2.hash_rows.__wrapped__(_pair_leaves.__wrapped__(cw))
        )
        root = tree_layers[-1][0]  # (8,) Montgomery
        st = st.at[: p2.RATE].set(root)
        st = p2.permute(st[None, :])[0]
        beta_m = jnp.flip(st[p2.RATE - 4 : p2.RATE])
        outs.append((cw, tree_layers))
        betas.append(beta_m)
        cw = _fold_codeword.__wrapped__(cw, beta_m, inv2x)
        if join is not None:
            cw = ext.add(cw, join)
    return outs, cw, tuple(betas)


@jax.jit
def _gather_fri_queries(cws, layer_tuples, idx_tuple):
    """Pair rows + sibling paths for every FRI layer in ONE dispatch."""
    out = []
    for cw, layers, i in zip(cws, layer_tuples, idx_tuple):
        pairs = bb.from_mont(jnp.take(_pair_leaves.__wrapped__(cw), i, axis=0))
        cur = i
        sibs = []
        for layer in layers[:-1]:
            sibs.append(jnp.take(layer, cur ^ 1, axis=0))
            cur = cur >> 1
        if sibs:
            paths = jnp.stack(sibs, axis=1)
        else:
            paths = jnp.zeros((i.shape[0], 0, p2.DIGEST), jnp.uint32)
        out.append((pairs, paths))
    return tuple(out)


# -- proof containers --------------------------------------------------------


@dataclass
class FriQueryLayer:
    pair: np.ndarray  # (2, 4) canonical: [f(x_i), f(-x_i)]
    path: np.ndarray  # (depth, 8) Montgomery digests


@dataclass
class FriQuery:
    index: int
    layers: List[FriQueryLayer]


@dataclass
class FriProof:
    layer_roots: List[np.ndarray]  # Montgomery digests (8,)
    final_poly: np.ndarray  # (final_len, 4) canonical coefficients
    pow_witness: int
    queries: List[FriQuery]


# -- prover ------------------------------------------------------------------


def prove(
    codeword,
    config: StarkConfig,
    challenger: Challenger,
    log_shift_pow: int = 0,
) -> FriProof:
    """Run FRI on `codeword` — either one (n, 4) array over the coset
    shift * G_n, or a dict {log_size: (2^log_size, 4)} of codewords that
    join the fold as sizes match (mixed-height batch).  A size-2^L entry
    must be evaluated over the squared coset shift^(2^(max_log - L)) * G_L
    (the domain the fold has reached by then).

    The transcript must already have absorbed everything binding the
    codewords (e.g. the PCS batch commitment roots and claimed evals)."""
    if not isinstance(codeword, dict):
        codeword = {int(np.log2(codeword.shape[0])): codeword}
    logs = sorted(codeword, reverse=True)
    log_n = logs[0]
    n = 1 << log_n
    final_len = 1 << config.log_final_poly_len
    stop_n = final_len * config.blowup
    assert all((1 << l) > stop_n for l in logs[1:]), "group below FRI floor"

    from .config import eager_prover

    eager = eager_prover()

    def commit_layer(c):
        # eager: per-level p2.compress jits are shared across every layer
        # size of the run; the fused whole-tree program compiles per shape
        if eager:
            return merkle._build_layers_eager(p2.hash_rows(_pair_leaves(c)))
        return _commit_layer(c)

    layers: List[Tuple[jnp.ndarray, merkle.MerkleTree]] = []
    roots: List[np.ndarray] = []
    cw = codeword[log_n]
    shift_pow = log_shift_pow
    cur_log = log_n

    from .pcs import batch_rounds

    if (
        cw.shape[0] > stop_n
        and batch_rounds()
        and not eager
        and hasattr(challenger, "export_state")
        and not getattr(challenger, "_input", True)
    ):
        # DEVICE-side commit phase: the whole fold/commit ladder including
        # the duplex-sponge transcript runs as ONE jitted program (the
        # host loop pays a root fetch + sample round trip per layer — ~21
        # of the warm proof's round trips).  The host challenger then
        # replays the absorb/sample sequence from the fetched roots and
        # asserts it derived the same betas, so the host transcript stays
        # the source of truth for every later phase.
        n_layers = 0
        sizes = []
        l = cur_log
        while (1 << l) > stop_n:
            sizes.append(l)
            n_layers += 1
            l -= 1
        inv2xs = tuple(
            _fold_inv2x_dev(lg, pow(config.coset_shift, 1 << (shift_pow + i), bb.P))
            for i, lg in enumerate(sizes)
        )
        joins = tuple(codeword.get(lg - 1) for lg in sizes)
        st0 = jnp.asarray(challenger.export_state())
        outs, cw, betas_dev = _commit_phase_device(cw, joins, inv2xs, st0)
        fetched_roots, fetched_betas = jax.device_get(
            ([t[-1][0] for _, t in outs], betas_dev)
        )
        for (cw_l, tree_layers), root_m, beta_dev in zip(
            outs, fetched_roots, fetched_betas
        ):
            tree = merkle.MerkleTree(list(tree_layers))
            root = np.asarray(root_m)
            roots.append(root)
            challenger.observe_digest(root)
            beta = challenger.sample_ext()
            assert beta == tuple(
                int(v) for v in bb.np_from_mont(np.asarray(beta_dev))
            ), "device transcript diverged from host challenger"
            layers.append((cw_l, tree))
        shift_pow += n_layers
        cur_log -= n_layers
    else:
        pending = commit_layer(cw) if cw.shape[0] > stop_n else None
        while cw.shape[0] > stop_n:
            tree = merkle.MerkleTree(list(pending))
            root = np.asarray(tree.root)
            roots.append(root)
            challenger.observe_digest(root)
            beta = challenger.sample_ext()
            beta_m = bb.to_mont(jnp.asarray(np.array(beta, dtype=np.uint32)))
            shift = pow(config.coset_shift, 1 << shift_pow, bb.P)
            inv2x = _fold_inv2x_dev(cur_log, shift)
            layers.append((cw, tree))
            # fold + (join) + next layer's whole Merkle commit in ONE
            # dispatch: the transcript forces a fetch per layer, but not
            # two dispatches
            join = codeword.get(cur_log - 1)
            if (1 << (cur_log - 1)) > stop_n:
                if eager:
                    cw = _fold_join(cw, beta_m, inv2x, join)
                    pending = commit_layer(cw)
                else:
                    cw, pending = _fold_join_commit(cw, beta_m, inv2x, join)
            else:
                cw = _fold_join(cw, beta_m, inv2x, join)
            shift_pow += 1
            cur_log -= 1

    from .prover import _progress

    _progress("fri: commit phase done")
    # final polynomial: interpolate the remaining codeword and un-shift
    from ..ntt import intt
    from ..ntt.ntt import _shift_powers

    final_n = cw.shape[0]
    final_log = int(np.log2(final_n))
    shift = pow(config.coset_shift, 1 << shift_pow, bb.P)
    coeffs = intt(jnp.moveaxis(cw, -1, 0))  # (4, final_n): per-component intt
    sp = jnp.asarray(_shift_powers(final_log, shift, inverse=True))
    coeffs = bb.mont_mul(coeffs, sp)
    coeffs = np.asarray(bb.from_mont(jnp.moveaxis(coeffs, 0, -1)))  # (final_n, 4)
    assert (coeffs[final_len:] == 0).all(), "folded codeword exceeds degree bound"
    final_poly = coeffs[:final_len]
    for c in final_poly:
        challenger.observe_ext(c)

    pow_witness = challenger.grind(config.proof_of_work_bits)
    _progress("fri: grind done")

    # queries: pairs + sibling paths gathered ON DEVICE per layer, one
    # device_get for everything (fetching whole codewords through the
    # tunneled-TPU link dominated proof latency otherwise)
    qs = np.array(
        [challenger.sample_bits(log_n - 1) for _ in range(config.num_queries)],
        dtype=np.int64,
    )
    from .pcs import batch_rounds

    if batch_rounds() and not eager and len(layers) > 1:
        # all layers' pair rows + sibling paths in ONE dispatch (the
        # eager loop costs ~2 + depth dispatches per layer)
        idx = qs.copy()
        idxs = []
        for cw, _tree in layers:
            i = idx % (cw.shape[0] // 2)
            idxs.append(jnp.asarray(i))
            idx = i
        gathers = _gather_fri_queries(
            tuple(cw for cw, _ in layers),
            tuple(tuple(t.layers) for _, t in layers),
            tuple(idxs),
        )
    else:
        idx = qs.copy()
        gathers = []
        for cw, tree in layers:
            h = cw.shape[0] // 2
            i = idx % h
            pairs = bb.from_mont(jnp.take(_pair_leaves(cw), jnp.asarray(i), axis=0))
            paths = tree.open_paths_device(i)
            gathers.append((pairs, paths))
            idx = i  # the folded value g[i] lives at index i of the next codeword
    fetched = jax.device_get(gathers)

    queries = []
    for k, q in enumerate(qs):
        qlayers = [
            FriQueryLayer(
                pair=np.array(pairs[k], dtype=np.uint32).reshape(2, 4),
                path=np.array(paths[k]),
            )
            for pairs, paths in fetched
        ]
        queries.append(FriQuery(index=int(q), layers=qlayers))

    return FriProof(layer_roots=roots, final_poly=final_poly, pow_witness=pow_witness, queries=queries)


# -- verifier (host-side) ----------------------------------------------------


def _py_ext_fold(lo, hi, beta, x):
    inv2 = pow(2, bb.P - 2, bb.P)
    s = tuple((a + b) * inv2 % bb.P for a, b in zip(lo, hi))
    inv2x = pow(2 * x % bb.P, bb.P - 2, bb.P)
    d = tuple((a - b) * inv2x % bb.P for a, b in zip(lo, hi))
    return tuple((a + c) % bb.P for a, c in zip(s, ext.py_mul(beta, d)))


def _py_eval_ext_poly(coeffs, x):
    """Evaluate poly with EF4 coeffs at base point x (canonical ints)."""
    acc = (0, 0, 0, 0)
    for c in reversed(coeffs):
        acc = tuple(v * x % bb.P for v in acc)
        acc = tuple((a + int(b)) % bb.P for a, b in zip(acc, c))
    return acc


def verify(
    proof: FriProof,
    log_n,
    config: StarkConfig,
    challenger: Challenger,
    log_shift_pow: int = 0,
    open_input=None,
):
    """Verify a FRI proof over one codeword (log_n an int) or a
    mixed-height batch (log_n a list of log sizes, largest first).

    `open_input(pair_index, log_size) -> (2,4) pair or None` supplies the
    reduced-codeword values the PCS binds at layer entry: for the largest
    size both sides are checked; at a join layer the pair is added into
    the running fold value on the queried side.

    Raises AssertionError on any inconsistency."""
    logs = sorted(log_n if isinstance(log_n, (list, tuple, set)) else [log_n], reverse=True)
    log_n = logs[0]
    join_logs = set(logs[1:])
    final_len = 1 << config.log_final_poly_len
    n = 1 << log_n

    # proof-shape soundness checks (a forged proof must not be able to
    # shrink the query set or inflate the final polynomial's degree)
    assert len(proof.queries) == config.num_queries, "query count mismatch"
    assert len(proof.final_poly) == final_len, "final poly length mismatch"

    betas = []
    for root in proof.layer_roots:
        challenger.observe_digest(root)
        betas.append(challenger.sample_ext())
    for c in proof.final_poly:
        challenger.observe_ext(c)
    assert challenger.check_witness(config.proof_of_work_bits, proof.pow_witness), "bad PoW"

    num_layers = len(proof.layer_roots)
    assert (1 << (log_n - num_layers)) == final_len * config.blowup, "layer count mismatch"

    # all (query, layer) pair digests in ONE host hash dispatch, and all
    # Merkle path checks deferred into one batched verification — the
    # per-pair hash + per-level compress dispatches dominated verify time
    pair_rows = [
        bb.np_to_mont(layer.pair.reshape(-1))
        for query in proof.queries
        for layer in query.layers
    ]
    if pair_rows:
        pair_digests = np.asarray(p2.hash_rows_host(jnp.asarray(np.stack(pair_rows))))
    deferred_paths = []
    digest_iter = iter(range(len(pair_rows)))

    results = []
    for query in proof.queries:
        q = challenger.sample_bits(log_n - 1)
        assert q == query.index, "query index mismatch with transcript"
        idx = q
        value: Optional[tuple] = None
        cur_log = log_n
        shift_pow = log_shift_pow
        for l, (layer, beta, root) in enumerate(zip(query.layers, betas, proof.layer_roots)):
            h = 1 << (cur_log - 1)
            i = idx % h
            digest = pair_digests[next(digest_iter)]
            deferred_paths.append((root, i, digest, layer.path, cur_log - 1))
            lo, hi = tuple(int(v) for v in layer.pair[0]), tuple(int(v) for v in layer.pair[1])
            if value is None:
                if open_input is not None:
                    pair = open_input(q, cur_log)
                    if pair is not None:
                        assert tuple(int(v) for v in pair[0]) == lo, "input lo mismatch"
                        assert tuple(int(v) for v in pair[1]) == hi, "input hi mismatch"
            else:
                expect = value
                if cur_log in join_logs:
                    addin = open_input(i, cur_log)
                    side = addin[0] if i == idx else addin[1]
                    expect = tuple(
                        (a + int(s)) % bb.P for a, s in zip(expect, side)
                    )
                got = lo if i == idx else hi
                assert got == expect, f"fold mismatch at layer {l}"
            shift = pow(config.coset_shift, 1 << shift_pow, bb.P)
            w = bb.py_root_of_unity(cur_log)
            x = shift * pow(w, i, bb.P) % bb.P
            value = _py_ext_fold(lo, hi, beta, x)
            idx = i  # folded value's index in the next codeword
            cur_log -= 1
            shift_pow += 1
        # final check: value equals final_poly evaluated at the fold point
        shift = pow(config.coset_shift, 1 << shift_pow, bb.P)
        w = bb.py_root_of_unity(cur_log)
        x = shift * pow(w, idx, bb.P) % bb.P
        assert value == _py_eval_ext_poly(proof.final_poly, x), "final poly mismatch"
        results.append((q, query.layers[0].pair if query.layers else None))
    if deferred_paths:
        ok = merkle.verify_paths(deferred_paths)
        assert ok.all(), f"bad path in FRI layer (items {np.nonzero(~ok)[0][:4]})"
    return results
