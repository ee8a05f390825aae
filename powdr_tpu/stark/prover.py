"""Multi-chip STARK prover with LogUp bus interactions.

Pipeline per chip (SURVEY.md §3.2 — the proving stage the reference
delegates to the stark-backend fork):
  commit main traces -> sample LogUp challenges -> build + commit
  permutation traces (helper columns + running sum) -> sample the
  constraint-folding challenge -> evaluate the folded constraint
  quotient on the LDE coset -> commit quotient chunks -> sample zeta ->
  batch-open everything with one FRI.

Device work dominates: trace LDEs, Poseidon2 Merkle commits, interaction
fingerprints + batched extension inverses, constraint evaluation (the
jitted AIR "kernel"), quotient NTTs.  Host work is transcript plumbing.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from ..field import ext
from ..ir import expression as ir
from ..ntt import intt, ntt
from ..ntt.ntt import _shift_powers
from . import air as air_mod
from . import pcs
from .air import Air, ALPHA_LOGUP, BETA_LOGUP, TOTAL_LOGUP
from .challenger import Challenger
from .config import StarkConfig
from .fri import _pow_table
from .pcs import ExtVal, py_ext_pow


from .config import eager_prover as _eager_prover


def _progress(msg: str) -> None:
    """POWDR_TPU_PROVE_PROGRESS=1 prints per-round progress (flushed) so a
    driver-side timeout is diagnosable from the captured tail."""
    if os.environ.get("POWDR_TPU_PROVE_PROGRESS", "0") == "1":
        import sys
        import time

        print(f"[prove +{time.perf_counter():.1f}s] {msg}", file=sys.stderr, flush=True)


@dataclass
class ChipProof:
    main_root: np.ndarray
    perm_root: Optional[np.ndarray]
    quotient_root: np.ndarray
    logup_total: ExtVal
    pre_root: Optional[np.ndarray] = None


@dataclass
class Proof:
    log_n: int
    chip_widths: List[int]
    chips: List[ChipProof]
    pcs: pcs.PcsOpening
    publics: Optional[List[List[int]]] = None  # per-chip public values
    #: segmented proofs (bounded-memory continuations): chip counts per
    #: segment and one PCS/FRI opening per segment; `pcs` is then unused.
    #: All segments share one transcript — the LogUp challenges are drawn
    #: after EVERY segment's main commitment, so bus flows cancel ACROSS
    #: segments (the continuation axis of the reference's
    #: SegmentationLimits, openvm-riscv/src/lib.rs:270-283)
    segments: Optional[List[int]] = None
    pcs_parts: Optional[List[pcs.PcsOpening]] = None


# ---------------------------------------------------------------------------
# trace-domain evaluation helpers


@functools.lru_cache(maxsize=None)
def _trace_selectors_np(log_n: int) -> Dict[str, np.ndarray]:
    n = 1 << log_n
    first = np.zeros(n, dtype=np.uint32)
    first[0] = bb.R_MOD_P
    last = np.zeros(n, dtype=np.uint32)
    last[-1] = bb.R_MOD_P
    x = _pow_table(bb.py_root_of_unity(log_n), n).astype(np.uint64)
    w_last = pow(bb.py_root_of_unity(log_n), n - 1, bb.P)
    trans = bb.np_to_mont(((x - w_last) % bb.P).astype(np.uint32))
    return {"is_first": first, "is_last": last, "is_transition": trans}


def _trace_selectors(log_n: int) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in _trace_selectors_np(log_n).items()}


def _roll_rows(arr: jnp.ndarray, rot: int, step: int) -> jnp.ndarray:
    return jnp.roll(arr, -rot * step, axis=0) if rot else arr


def build_perm_trace(
    air: Air,
    trace: jnp.ndarray,
    groups: List[List[int]],
    alpha: ExtVal,
    beta: ExtVal,
    pre_trace: Optional[jnp.ndarray] = None,
    defer_total: bool = False,
) -> Tuple[jnp.ndarray, ExtVal]:
    """Compute [h_0..h_{G-1}, s] as a (n, 4*(G+1)) base matrix plus the
    chip's cumulative LogUp total.

    One jitted dispatch per chip (cached on the Air) on every backend —
    the eager path re-dispatched thousands of tiny ops per prove and was
    40-50s per chip on CPU; perm graphs are small (interactions only) so
    tracing once is always the right trade.  With defer_total the total
    comes back as the (4,) Montgomery device array (unfetched) so callers
    can batch the round's fetches."""
    alpha_arr = bb.to_mont(jnp.asarray(np.array(alpha, dtype=np.uint32)))
    beta_arr = bb.to_mont(jnp.asarray(np.array(beta, dtype=np.uint32)))
    import jax as _jax

    key = tuple(tuple(g) for g in groups)
    if _eager_prover():
        perm, s_last = _perm_core(air, key, trace, alpha_arr, beta_arr, pre_trace)
    else:
        cached = getattr(air, "_perm_jit", None)
        if cached is None or cached[0] != key:
            fn = _jax.jit(
                functools.partial(_perm_core, air, key)
            )
            air._perm_jit = (key, fn)
        perm, s_last = air._perm_jit[1](trace, alpha_arr, beta_arr, pre_trace)
    if defer_total:
        return perm, s_last
    total = tuple(int(v) for v in np.asarray(bb.from_mont(s_last)))
    return perm, total


#: fused-round jit cache: key includes id(air) — Airs are interned per
#: fingerprint by vm.prove._AIR_CACHE, so repeat proofs of a guest reuse
#: the traced program (the serving regime)
_PERM_BATCH_CACHE: Dict[tuple, object] = {}


def _batch_cap() -> int:
    """Max chips fused into one round dispatch.  Trace+compile cost grows
    SUPERLINEARLY with program size (a 20-chip fused quotient spent 19+
    min in trace/compile where per-chip jits summed to ~8), so rounds are
    chunked: ceil(20/5) = 4 dispatches still beats 20, and each program
    stays small enough to trace and compile in linear-ish time."""
    return max(1, int(os.environ.get("POWDR_TPU_BATCH_CAP", "5")))


def _chunks(items: List) -> List[List]:
    cap = _batch_cap()
    return [items[i : i + cap] for i in range(0, len(items), cap)]


def build_perm_traces_batched(
    items: List[Tuple[Air, jnp.ndarray, List[List[int]], Optional[jnp.ndarray]]],
    alpha: ExtVal,
    beta: ExtVal,
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """ALL chips' permutation traces in ONE jitted dispatch (per-chip jits
    pay a ~0.5-1s tunnel round trip each on the real chip; a 20-chip round
    is most of a proof's latency).  items: (air, trace, groups, pre);
    returns [(perm, s_last_montgomery_dev)] aligned with items."""
    alpha_arr = bb.to_mont(jnp.asarray(np.array(alpha, dtype=np.uint32)))
    beta_arr = bb.to_mont(jnp.asarray(np.array(beta, dtype=np.uint32)))
    key = tuple(
        (id(a), tuple(tuple(g) for g in groups), t.shape,
         None if p is None else p.shape)
        for a, t, groups, p in items
    )
    args = (
        tuple(t for _, t, _, _ in items),
        tuple(p for _, _, _, p in items),
        alpha_arr,
        beta_arr,
    )
    fn = _PERM_BATCH_CACHE.get(key)
    if fn is None:
        statics = [(a, tuple(tuple(g) for g in groups)) for a, _, groups, _ in items]

        def core(traces, pres, alpha_m, beta_m):
            return tuple(
                _perm_core(a, g, t, alpha_m, beta_m, p)
                for (a, g), t, p in zip(statics, traces, pres)
            )

        # AOT-exported artifact keyed by air fingerprints: later processes
        # skip trace+lower entirely (stark/aot.py)
        fps = tuple(getattr(a, "_fp", None) for a, _, _, _ in items)
        if all(fp is not None for fp in fps):
            from . import aot

            fn = aot.get_or_export(
                ("perm", fps,
                 tuple((t.shape, None if p is None else p.shape,
                        tuple(tuple(g) for g in groups))
                       for _, t, groups, p in items)),
                core,
                args,
            )
        if fn is None:
            fn = jax.jit(core)
        _PERM_BATCH_CACHE[key] = fn
    return list(fn(*args))


def _perm_core(air, groups, trace, alpha_m, beta_m, pre_trace):
    n = trace.shape[0]
    log_n = int(np.log2(n))
    sel = _trace_selectors(log_n)
    return _perm_body(
        air,
        groups,
        n,
        alpha_m,
        beta_m,
        main_col=lambda i, r: _roll_rows(trace[:, i], r, 1),
        pre_col=(lambda i, r: _roll_rows(pre_trace[:, i], r, 1))
        if pre_trace is not None
        else None,
        selectors=sel,
        scan_fn=_scan_local,
    )


def _scan_local(h_tot):
    """Inclusive modular prefix sum + grand total, single-device."""
    s_incl = jax.lax.associative_scan(bb.add, h_tot, axis=0)
    return s_incl, s_incl[-1]


def _perm_body(air, groups, n, alpha_m, beta_m, main_col, pre_col, selectors, scan_fn):
    """The LogUp permutation-trace algebra, independent of data placement.

    main_col/pre_col supply (possibly halo-exchanged) rotated columns and
    scan_fn the inclusive prefix sum — the single-device path uses local
    roll + associative_scan, the mesh path (parallel/perm.py) shard-local
    versions with ppermute/all_gather, so both produce bit-identical
    traces from one body."""
    alg = air_mod._mixed_algebra(
        main_col=main_col,
        perm_col=lambda i, r: (_ for _ in ()).throw(ValueError("no perm cols yet")),
        challenges={},
        selectors=selectors,
        pre_col=pre_col,
    )
    cache: Dict[int, object] = {}

    def eval_base(e: ir.Expr) -> jnp.ndarray:
        tag, arr = ir.evaluate(e, alg, cache)
        assert tag == "b", "interaction exprs must be base-field"
        return arr

    # Vectorized across interactions: per-interaction graph construction
    # (a beta-power chain and a Fermat-inverse per fingerprint) made a
    # 17-interaction chip's perm program ~72k XLA ops (19 s to lower,
    # minutes to compile).  Here: beta powers once, one (T, K, n) batched
    # fingerprint contraction, ONE batched extension inverse — same
    # values bit-for-bit, ~10x smaller program.
    flat = [t_idx for group in groups for t_idx in group]
    T = len(flat)
    K = max((len(air.interactions[t].args) for t in flat), default=0)
    bps = [beta_m]
    for _ in range(max(K - 1, 0)):
        bps.append(ext.mul(bps[-1], beta_m))
    B = jnp.stack(bps) if bps else jnp.zeros((0, 4), jnp.uint32)  # (K, 4)
    rows = []
    ms = []
    for t_idx in flat:
        t = air.interactions[t_idx]
        argv = [jnp.broadcast_to(eval_base(a), (n,)) for a in t.args]
        argv += [jnp.zeros((n,), jnp.uint32)] * (K - len(argv))
        rows.append(jnp.stack(argv))  # (K, n)
        ms.append(jnp.broadcast_to(eval_base(t.mult), (n,)))
    A = jnp.stack(rows)  # (T, K, n)
    # sum_k beta^{k+1} * arg_k, batched over (T, K, n, 4)
    contrib = ext.mul_base(jnp.broadcast_to(B[None, :, None, :], (T, K, n, 4)), A)
    s = contrib[:, 0] if K else jnp.zeros((T, n, 4), jnp.uint32)
    for k in range(1, K):
        s = ext.add(s, contrib[:, k])
    # f = alpha + bus_id + s
    F = ext.add(s, jnp.broadcast_to(alpha_m, (T, n, 4)))
    bus_m = jnp.asarray(
        bb.np_to_mont(
            np.array([air.interactions[t].bus_id for t in flat], dtype=np.uint32)
        )
    )
    F = F.at[:, :, 0].set(bb.add(F[:, :, 0], bus_m[:, None]))
    terms = ext.mul_base(ext.inv(F), jnp.stack(ms))  # (T, n, 4)
    h_cols: List[jnp.ndarray] = []
    off = 0
    for group in groups:
        h = terms[off]
        for k in range(1, len(group)):
            h = ext.add(h, terms[off + k])
        off += len(group)
        h_cols.append(h)

    h_tot = h_cols[0]
    for h in h_cols[1:]:
        h_tot = ext.add(h_tot, h)
    s_incl, total = scan_fn(h_tot)
    s_excl = ext.sub(s_incl, h_tot)

    cols = h_cols + [s_excl]
    perm = jnp.concatenate([c.reshape(n, 4) for c in cols], axis=1)
    return perm, total


# ---------------------------------------------------------------------------
# quotient


def _air_node_count(air: Air) -> int:
    """Unique IR nodes across the air's constraints + interactions (an
    estimate of tracing cost), cached on the Air."""
    n = getattr(air, "_node_count", None)
    if n is None:
        seen = set()

        def walk(e):
            if id(e) in seen:
                return
            seen.add(id(e))
            for attr in ("lhs", "rhs", "operand"):
                sub = getattr(e, attr, None)
                if sub is not None:
                    walk(sub)

        for c in air.constraints:
            walk(c)
        for t in air.interactions:
            walk(t.mult)
            for a in t.args:
                walk(a)
        n = len(seen)
        air._node_count = n
    return n


def _lde_algebra(
    lde_main: jnp.ndarray,
    lde_perm: Optional[jnp.ndarray],
    challenges: Dict[str, jnp.ndarray],
    selectors: Dict[str, jnp.ndarray],
    blowup: int,
    lde_pre: Optional[jnp.ndarray] = None,
    publics: Optional[Dict[int, int]] = None,
) -> ir.Algebra:
    def perm_col(i, r):
        block = lde_perm[:, 4 * i : 4 * i + 4]
        return _roll_rows(block, r, blowup)

    return air_mod._mixed_algebra(
        main_col=lambda i, r: _roll_rows(lde_main[:, i], r, blowup),
        perm_col=perm_col,
        challenges=challenges,
        selectors=selectors,
        publics=publics,
        pre_col=(lambda i, r: _roll_rows(lde_pre[:, i], r, blowup)) if lde_pre is not None else None,
    )


def compute_quotient(
    air: Air,
    logup_cons: List[ir.Expr],
    lde_main: jnp.ndarray,
    lde_perm: Optional[jnp.ndarray],
    challenges: Dict[str, ExtVal],
    alpha_q: ExtVal,
    log_n: int,
    config: StarkConfig,
    shift_pow: int = 0,
    lde_pre: Optional[jnp.ndarray] = None,
    publics: Optional[List[int]] = None,
) -> jnp.ndarray:
    """Folded-constraint quotient, returned as a (n, 4*blowup) matrix of
    chunk evaluations over H (chunk-major, 4 extension components each).

    shift_pow: the chip's join depth in the mixed-height batch — its LDE
    coset is shift^(2^shift_pow) * K.

    On accelerator backends the whole computation runs as ONE jitted
    dispatch (cached on the Air object) — per-op round trips through a
    tunneled chip dominate otherwise; on CPU it stays eager (compiling
    each air's full constraint graph would slow the test suite)."""
    args = (lde_main, lde_perm, lde_pre)
    ch_m = {
        k: bb.to_mont(jnp.asarray(np.array(v, dtype=np.uint32))) for k, v in challenges.items()
    }
    aq_m = bb.to_mont(jnp.asarray(np.array(alpha_q, dtype=np.uint32)))

    import jax as _jax

    # jit everywhere EXCEPT huge constraint graphs on CPU (the aggregation
    # circuit's Poseidon2 air traces to minutes-long CPU compiles; eager
    # re-dispatch beats that — everywhere else tracing once wins big)
    use_jit = not _eager_prover() and (
        _jax.devices()[0].platform != "cpu" or _air_node_count(air) < 60_000
    )
    if use_jit:
        key = (log_n, config, shift_pow, tuple(publics) if publics else None)
        cache_attr = getattr(air, "_quotient_jit", None)
        if cache_attr is None or cache_attr[0] != key:
            fn = _jax.jit(
                functools.partial(
                    _quotient_core, air, tuple(logup_cons), log_n, config, shift_pow,
                    tuple(publics) if publics else None,
                )
            )
            air._quotient_jit = (key, fn)
        return air._quotient_jit[1](lde_main, lde_perm, lde_pre, ch_m, aq_m)
    return _quotient_core(
        air, tuple(logup_cons), log_n, config, shift_pow,
        tuple(publics) if publics else None,
        lde_main, lde_perm, lde_pre, ch_m, aq_m,
    )


def _quotient_core(
    air, logup_cons, log_n, config, shift_pow, publics,
    lde_main, lde_perm, lde_pre, ch_m, alpha_q_m,
):
    n = 1 << log_n
    blowup = config.blowup
    N = n * blowup
    chip_shift = pow(config.coset_shift, 1 << shift_pow, bb.P)
    sel = air_mod.lde_selectors(log_n, config.log_blowup, chip_shift)
    pub_map = dict(enumerate(publics)) if publics else None
    alg = _lde_algebra(lde_main, lde_perm, ch_m, sel, blowup, lde_pre=lde_pre, publics=pub_map)
    q = _quotient_pointwise(
        air, logup_cons, alg, N, alpha_q_m,
        jnp.asarray(_zh_inv_tile_np(log_n, config, chip_shift, N)),
    )
    return _quotient_tail(q, log_n, config, chip_shift)


@functools.lru_cache(maxsize=None)
def _zh_inv_tile_np(log_n: int, config, chip_shift: int, length: int) -> np.ndarray:
    """1/Z_H over the coset, Montgomery: `blowup`-periodic, tiled to
    `length` rows (pass a shard length for the mesh kernels)."""
    blowup = config.blowup
    zh_np = air_mod.lde_selectors_np(log_n, config.log_blowup, chip_shift)["z_h"]
    zh_inv = np.array(
        [pow(int(v), bb.P - 2, bb.P) for v in zh_np[:blowup]], dtype=np.uint32
    )
    return np.tile(bb.np_to_mont(zh_inv), length // blowup)


def _quotient_pointwise(air, logup_cons, alg, N, alpha_q_m, zh_inv_m):
    """Row-pointwise half of the quotient: evaluate + fold every
    constraint over the (local) coset rows and divide by Z_H.  Placement-
    agnostic — the mesh kernel (parallel/quotient.py) calls this with a
    halo-exchanged algebra and shard-local selector slices."""
    cache: Dict[int, object] = {}

    # Batched constraint folding: the sequential apow chain + one ext.mul
    # per constraint inlined ~250 ops per constraint into the graph; a
    # lax.scan power chain + stacked one-shot multiplies keep the program
    # ~10x smaller.  Modular sums are order-independent, so the folded
    # values are bit-identical to the sequential loop's.
    cons_all = list(air.constraints) + list(logup_cons)
    evals = [ir.evaluate(con, alg, cache) for con in cons_all]
    C = len(evals)
    one_e = jnp.zeros(4, dtype=jnp.uint32).at[0].set(bb.R_MOD_P)

    def _apow_step(carry, _):
        return ext.mul(carry, alpha_q_m), carry

    _, apows = jax.lax.scan(_apow_step, one_e, None, length=max(C, 1))  # (C, 4)
    acc = ext.zero((N,))
    bidx = [i for i, (tag, _) in enumerate(evals) if tag == "b"]
    eidx = [i for i, (tag, _) in enumerate(evals) if tag == "e"]
    if bidx:
        Ab = jnp.stack([jnp.broadcast_to(evals[i][1], (N,)) for i in bidx])
        Pb = apows[jnp.asarray(np.array(bidx, dtype=np.int32))]  # (Cb, 4)
        acc = ext.add(acc, bb.sum_mod(bb.mont_mul(Pb[:, None, :], Ab[..., None]), axis=0))
    if eidx:
        Ae = jnp.stack([jnp.broadcast_to(evals[i][1], (N, 4)) for i in eidx])
        Pe = jnp.broadcast_to(
            apows[jnp.asarray(np.array(eidx, dtype=np.int32))][:, None, :], Ae.shape
        )
        acc = ext.add(acc, bb.sum_mod(ext.mul(Pe, Ae), axis=0))

    # divide by Z_H pointwise: Z_H has `blowup` distinct values on the coset
    return ext.mul_base(acc, zh_inv_m)


def _quotient_tail(q, log_n, config, chip_shift):
    n = 1 << log_n
    blowup = config.blowup
    # interpolate on the coset and un-shift, all in bit-reversed coefficient
    # layout (gather-free): chunk k of natural coeffs [kn,(k+1)n) lives at
    # rev_N positions j*blowup + rev_b(k), so chunk extraction is a narrow
    # strided slice of the (n_N, blowup)-reshaped rev coefficients.
    from ..ntt import evaluate_from_rev, interpolate_rev
    from ..ntt.ntt import _shift_powers_rev_device, bitrev_indices

    comps = jnp.moveaxis(q, -1, 0)  # (4, N)
    coeffs_rev = interpolate_rev(comps)  # (4, N) rev layout
    sp_rev = _shift_powers_rev_device(log_n + config.log_blowup, chip_shift, True)
    coeffs_rev = bb.mont_mul(coeffs_rev, sp_rev)
    rev_b = bitrev_indices(config.log_blowup)
    grouped = coeffs_rev.reshape(4, n, blowup)
    chunks = []
    for k in range(blowup):
        chunk_rev = grouped[:, :, int(rev_b[k])]  # (4, n) rev_n layout
        evals = evaluate_from_rev(chunk_rev)  # (4, n) natural over H
        chunks.append(jnp.swapaxes(evals, 0, 1))  # (n, 4)
    return jnp.concatenate(chunks, axis=1)  # (n, 4*blowup)


_QUOT_BATCH_CACHE: Dict[tuple, object] = {}


def compute_quotients_batched(
    entries: List[tuple],
    alpha_q: ExtVal,
    config: StarkConfig,
) -> List[jnp.ndarray]:
    """ALL chips' quotient evaluations in ONE jitted dispatch.

    entries: (air, logup_cons, lde_main, lde_perm, challenges, log_n,
    shift_pow, lde_pre, publics) — the same per-chip arguments
    compute_quotient takes; the fused program is cached on the airs'
    identities so repeat proofs of a guest dispatch without retracing."""
    aq_m = bb.to_mont(jnp.asarray(np.array(alpha_q, dtype=np.uint32)))
    key = (config,) + tuple(
        (id(a), log_n, sp, tuple(pub) if pub else None, lm.shape,
         None if lp is None else lp.shape, None if lpre is None else lpre.shape,
         tuple(sorted(ch.keys())))
        for a, cons, lm, lp, ch, log_n, sp, lpre, pub in entries
    )
    ch_ms = tuple(
        {
            k: bb.to_mont(jnp.asarray(np.array(v, dtype=np.uint32)))
            for k, v in ch.items()
        }
        for _, _, _, _, ch, _, _, _, _ in entries
    )
    args = (
        tuple(e[2] for e in entries),
        tuple(e[3] for e in entries),
        tuple(e[7] for e in entries),
        ch_ms,
        aq_m,
    )
    fn = _QUOT_BATCH_CACHE.get(key)
    if fn is None:
        statics = [
            (a, tuple(cons), log_n, config, sp, tuple(pub) if pub else None)
            for a, cons, _, _, _, log_n, sp, _, pub in entries
        ]

        def core(mains, perms, presx, chs, aq):
            return tuple(
                _quotient_core(a, cons, log_n, cfg, sp, pub, m, p, pr, ch, aq)
                for (a, cons, log_n, cfg, sp, pub), m, p, pr, ch in zip(
                    statics, mains, perms, presx, chs
                )
            )

        fps = tuple(getattr(a, "_fp", None) for a, *_ in entries)
        if all(fp is not None for fp in fps):
            from . import aot

            fn = aot.get_or_export(
                ("quot", fps, config,
                 tuple((log_n, sp, tuple(pub) if pub else None, lm.shape,
                        None if lp is None else lp.shape,
                        None if lpre is None else lpre.shape,
                        tuple(sorted(ch.keys())))
                       for a, cons, lm, lp, ch, log_n, sp, lpre, pub in entries)),
                core,
                args,
            )
        if fn is None:
            fn = jax.jit(core)
        _QUOT_BATCH_CACHE[key] = fn
    return list(fn(*args))


def py_ext_pow_mul(a: ExtVal, b: ExtVal) -> ExtVal:
    return ext.py_mul(a, b)


# ---------------------------------------------------------------------------
# top-level prove


def prove(
    chips: Sequence[Tuple[Air, jnp.ndarray]],
    config: StarkConfig,
    challenger: Challenger,
    publics: Optional[Sequence[Optional[List[int]]]] = None,
    commit_fn=None,
    segments: Optional[List[int]] = None,
    perm_fn=None,
    quotient_fn=None,
    pre_open_fn=None,
) -> Proof:
    """publics: per-chip lists of canonical public values (bound into the
    transcript before any commitment round).

    commit_fn(evals, config, shift_pow=) overrides the PCS commitment —
    the mesh-sharded prover (powdr_tpu.parallel.prover) injects its
    sharded LDE+Merkle here; every other stage is sharding-agnostic jnp
    and partitions automatically from the committed arrays' shardings.

    perm_fn(air, trace, groups, alpha, beta, pre) / quotient_fn(air,
    logup_cons, lde_main, lde_perm, challenges, alpha_q, log_n, shift_pow,
    lde_pre, publics) override the perm-trace / quotient stages per chip
    (the mesh prover's explicit shard_map kernels hook in here); return
    None to decline a chip and fall back to the single-device stage.
    perm_fn must return (perm, total) with total the UNFETCHED (4,)
    Montgomery device array (the defer_total contract).

    segments: chip counts per segment.  With S>1 segments the proof
    carries one PCS/FRI opening per segment, and the perm/quotient/open
    working set is bounded by the largest segment instead of the whole
    run; LogUp balance holds across segments because alpha/beta are
    sampled after every segment's main commitments."""
    if commit_fn is None:
        commit_fn = pcs.commit
    publics = list(publics) if publics is not None else [None] * len(chips)
    log_ns = [int(np.log2(t.shape[0])) for _, t in chips]
    log_n_max = max(log_ns)
    shift_pows = [log_n_max - l for l in log_ns]
    if segments is not None:
        assert sum(segments) == len(chips), "segment sizes must cover chips"
        # shift_pows are relative to each segment's own FRI batch (each
        # segment opens with its own mixed-height fold)
        bounds = np.cumsum([0] + list(segments))
        slices = [slice(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:])]
        shift_pows = list(shift_pows)
        for sl in slices:
            seg_max = max(log_ns[sl.start : sl.stop])
            for i in range(sl.start, sl.stop):
                shift_pows[i] = seg_max - log_ns[i]
    else:
        slices = [slice(0, len(chips))]

    challenger.observe(len(chips))
    for (a, t), ln, pub in zip(chips, log_ns, publics):
        assert t.shape[1] == a.width
        assert a.num_publics == len(pub or [])
        challenger.observe(a.width)
        challenger.observe(ln)
        for v in pub or []:
            challenger.observe(v)

    def observe_roots(cms) -> None:
        """Absorb commitment roots with ONE device fetch for the whole
        round (per-root np.asarray cost a tunnel round trip each)."""
        live = [cm for cm in cms if cm is not None]
        if not live:
            return
        fetched = jax.device_get([cm.root for cm in live])
        for cm, r in zip(live, fetched):
            cm.root = np.asarray(r)
        for cm in cms:
            if cm is not None:
                challenger.observe_digest(cm.root)

    batched_fn = commit_fn if commit_fn is not pcs.commit else None

    # round 0: preprocessed (vk) commitments
    _progress(f"round 0: preprocessed commitments ({len(chips)} chips)")
    pres = pcs.commit_round(
        [
            (
                bb.to_mont(jnp.asarray(a.preprocessed.astype(np.uint32)))
                if a.preprocessed is not None
                else None,
                sp,
            )
            for (a, t), sp in zip(chips, shift_pows)
        ],
        config,
        commit_fn=batched_fn,
    )
    observe_roots(pres)

    # round 1: main commitments (same-height chips batch into one dispatch)
    _progress("round 1: main commitments")
    mains = pcs.commit_round(
        [(t, sp) for (a, t), sp in zip(chips, shift_pows)],
        config,
        commit_fn=batched_fn,
    )
    observe_roots(mains)

    alpha = challenger.sample_ext()
    beta = challenger.sample_ext()

    openings: List[pcs.PcsOpening] = []
    all_perms: List[Optional[pcs.CommittedMatrix]] = []
    all_quotients: List[pcs.CommittedMatrix] = []
    all_totals: List[ExtVal] = []
    for sl in slices:
        # round 2: permutation traces for this segment (commit all, then
        # one fetch for roots + totals — transcript order per chip is
        # root, total)
        _progress("round 2: permutation traces")
        use_batch = pcs.batch_rounds() and not _eager_prover()
        seg_list = list(
            zip(chips[sl], shift_pows[sl.start : sl.stop], pres[sl])
        )
        groups_per_chip: List[List[List[int]]] = [
            air_mod.batch_interactions(a, config.bus_interaction_degree)
            if a.interactions
            else []
            for (a, _), _, _ in seg_list
        ]
        perm_items = [
            (a, t, groups_per_chip[i], pre_cm.evals if pre_cm is not None else None)
            for i, ((a, t), sp, pre_cm) in enumerate(seg_list)
            if a.interactions
        ]
        perm_outs: List[Optional[tuple]] = [None] * len(perm_items)
        rest = []
        for i, (a, t, g, p) in enumerate(perm_items):
            out = perm_fn(a, t, g, alpha, beta, p) if perm_fn is not None else None
            if out is None:
                rest.append(i)
            else:
                perm_outs[i] = out
        rest_items = [perm_items[i] for i in rest]
        if use_batch and len(rest_items) > 1:
            outs = []
            for chunk in _chunks(rest_items):
                outs.extend(build_perm_traces_batched(chunk, alpha, beta))
        else:
            outs = [
                build_perm_trace(a, t, g, alpha, beta, pre_trace=p, defer_total=True)
                for a, t, g, p in rest_items
            ]
        for i, o in zip(rest, outs):
            perm_outs[i] = o
        out_it = iter(perm_outs)
        totals: List[Optional[ExtVal]] = []
        total_devs = []
        perm_entries = []
        for (a, t), sp, pre_cm in seg_list:
            if a.interactions:
                perm, total = next(out_it)
                perm_entries.append((perm, sp))
                total_devs.append(total)
                totals.append(None)
            else:
                perm_entries.append((None, sp))
                totals.append((0, 0, 0, 0))
        perms = pcs.commit_round(perm_entries, config, commit_fn=batched_fn)
        live = [cm for cm in perms if cm is not None]
        fetched = jax.device_get([[cm.root for cm in live], total_devs])
        for cm, r in zip(live, fetched[0]):
            cm.root = np.asarray(r)
        it = iter(fetched[1])
        for i, cm in enumerate(perms):
            if cm is not None:
                t_can = tuple(int(v) for v in bb.np_from_mont(np.asarray(next(it))))
                totals[i] = t_can
                challenger.observe_digest(cm.root)
                challenger.observe_ext(t_can)

        alpha_q = challenger.sample_ext()

        # round 3: quotients for this segment
        _progress("round 3: quotients")
        q_items = []
        q_sps = []
        for (a, t), main_cm, perm_cm, groups, total, ln, sp, pre_cm, pub in zip(
            chips[sl], mains[sl], perms, groups_per_chip, totals,
            log_ns[sl.start : sl.stop], shift_pows[sl.start : sl.stop],
            pres[sl], publics[sl],
        ):
            logup_cons: List[ir.Expr] = []
            challenges: Dict[str, ExtVal] = {}
            if a.interactions:
                logup_cons, _ = air_mod.logup_constraints(a, groups)
                challenges = {ALPHA_LOGUP: alpha, BETA_LOGUP: beta, TOTAL_LOGUP: total}
            q_items.append((
                a, logup_cons, main_cm.lde,
                perm_cm.lde if perm_cm else None, challenges, ln, sp,
                pre_cm.lde if pre_cm is not None else None, pub,
            ))
            q_sps.append(sp)
        qms: List[Optional[jnp.ndarray]] = [None] * len(q_items)
        q_rest = []
        for i, (a, cons, lm, lp, ch, ln, sp, lpre, pub) in enumerate(q_items):
            out = (
                quotient_fn(a, cons, lm, lp, ch, alpha_q, ln, sp, lpre, pub)
                if quotient_fn is not None
                else None
            )
            if out is None:
                q_rest.append(i)
            else:
                qms[i] = out
        q_rest_items = [q_items[i] for i in q_rest]
        if use_batch and len(q_rest_items) > 1:
            q_outs = []
            for chunk in _chunks(q_rest_items):
                q_outs.extend(compute_quotients_batched(chunk, alpha_q, config))
        else:
            q_outs = [
                compute_quotient(
                    a, cons, lm, lp, ch, alpha_q, ln, config,
                    shift_pow=sp, lde_pre=lpre, publics=pub,
                )
                for a, cons, lm, lp, ch, ln, sp, lpre, pub in q_rest_items
            ]
        for i, o in zip(q_rest, q_outs):
            qms[i] = o
        q_entries = list(zip(qms, q_sps))
        quotients = pcs.commit_round(q_entries, config, commit_fn=batched_fn)
        observe_roots(quotients)

        zeta = challenger.sample_ext()

        # round 4: batch opening for this segment (zeta_next differs per
        # chip height)
        matrices = []
        points = []
        for main_cm, perm_cm, q_cm, ln, pre_cm in zip(
            mains[sl], perms, quotients, log_ns[sl.start : sl.stop], pres[sl]
        ):
            w_n = bb.py_root_of_unity(ln)
            zeta_next = tuple(v * w_n % bb.P for v in zeta)
            if pre_cm is not None:
                matrices.append(pre_cm)
                points.append([zeta, zeta_next])
            matrices.append(main_cm)
            points.append([zeta, zeta_next])
            if perm_cm is not None:
                matrices.append(perm_cm)
                points.append([zeta, zeta_next])
            matrices.append(q_cm)
            points.append([zeta])

        _progress(f"round 4: batch opening ({len(matrices)} matrices)")
        if pre_open_fn is not None:
            # mesh prover: replicate sharded commitments in one bulk
            # transfer so the opening-phase jits stay single-device
            pre_open_fn(matrices)
        openings.append(pcs.open_matrices(matrices, points, config, challenger))
        all_perms.extend(perms)
        all_quotients.extend(quotients)
        all_totals.extend(totals)

    chip_proofs = [
        ChipProof(
            main_root=m.root,
            perm_root=p.root if p else None,
            quotient_root=q.root,
            logup_total=tot,
            pre_root=pre.root if pre else None,
        )
        for m, p, q, tot, pre in zip(mains, all_perms, all_quotients, all_totals, pres)
    ]
    return Proof(
        log_n=log_ns,
        chip_widths=[a.width for a, _ in chips],
        chips=chip_proofs,
        pcs=openings[0] if segments is None else None,
        publics=publics,
        segments=segments,
        pcs_parts=openings if segments is not None else None,
    )
