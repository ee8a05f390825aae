"""The STARK verifier as a circuit: records a full verification run on a
Tape (stark/tape.py) so it can be proven by the aggregation chips.

This mirrors, op for op, the host verifier stack —
`verifier.verify` + `pcs.verify_openings` + `fri.verify` + the duplex
`Challenger` — with every field operation a tape op and every Poseidon2
permutation a tape permutation row.  Control flow is static for a fixed
(airs, config, proof shape); data-dependent choices (Merkle orderings,
FRI fold sides, query positions) go through boolean witness bits and
`select` ops whose canonical 31-bit decompositions pin them to the
transcript samples.  The resulting circuit accepts exactly the proofs the
host verifier accepts:

* transcript replay — challenges are re-derived in-circuit from absorbed
  proof data (duplex permutations over the wire bus);
* LogUp balance — chip totals summed and constrained to zero;
* constraint identity at zeta — the inner AIR's constraint DAG evaluated
  under a wire algebra (ir.evaluate), including its LogUp constraints;
* PCS/FRI — Merkle leaf hashes + path compressions in the Poseidon2
  chip, reduced-codeword recomputation, fold chain with 1/(2x) built
  from bit-selected twiddle constants, final-poly Horner evaluation,
  and the grinding check on low sample bits.

Reference surface: openvm-native-recursion's verifier program
(/root/reference/openvm-riscv/src/lib.rs:309-325 drives it for leaf and
internal aggregation); here the program is a straight-line tape rather
than a recursion-VM binary.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..field import babybear as bb
from ..ir import expression as ir
from . import air as air_mod
from .air import Air, ALPHA_LOGUP, BETA_LOGUP, TOTAL_LOGUP
from .config import StarkConfig
from .prover import Proof
from .tape import Tape

P = bb.P


class TapeChallenger:
    """Duplex-sponge transcript over tape wires; mirrors challenger.Challenger
    (overwrite-rate absorption, LIFO squeeze of the rate lanes)."""

    def __init__(self, t: Tape) -> None:
        self.t = t
        self.state: List[int] = [t.const(0)] * 16
        self._input: List[int] = []
        self._output: List[int] = []

    def observe(self, w: int) -> None:
        self._output.clear()
        self._input.append(w)
        if len(self._input) == 8:
            self._duplex()

    def observe_const(self, v: int) -> None:
        self.observe(self.t.const(int(v) % P))

    def observe_wires(self, ws: Sequence[int]) -> None:
        for w in ws:
            self.observe(w)

    def _duplex(self) -> None:
        st = list(self.state)
        st[: len(self._input)] = self._input
        self._input = []
        outs = self.t.permute(st)
        self.state = outs
        self._output = list(outs[:8])

    def sample(self) -> int:
        if self._input or not self._output:
            self._duplex()
        return self._output.pop()

    def sample_ext_wires(self) -> Tuple[int, List[int]]:
        comps = [self.sample() for _ in range(4)]
        return self.t.assemble_ext(comps), comps

    def sample_ext(self) -> int:
        return self.sample_ext_wires()[0]

    def sample_bits(self, nbits: int) -> List[int]:
        return self.t.decompose(self.sample())[:nbits]

    def check_witness(self, bits: int, w: int) -> None:
        self.observe(w)
        s = self.sample()
        sbits = self.t.decompose(s)
        zero = self.t.const(0)
        for i in range(bits):
            self.t.eq(sbits[i], zero)


# -- wire-level helpers ------------------------------------------------------


def _witness_ext(t: Tape, ch: TapeChallenger, val) -> int:
    """4 base witness wires absorbed into the transcript, assembled."""
    comps = t.witness_many([int(c) for c in val])
    ch.observe_wires(comps)
    return t.assemble_ext(comps)


def _witness_digest(t: Tape, ch: TapeChallenger, digest_mont: np.ndarray) -> List[int]:
    lanes = bb.np_from_mont(np.asarray(digest_mont, dtype=np.uint32))
    ws = t.witness_many([int(v) for v in lanes])
    ch.observe_wires(ws)
    return ws


def _index_point(t: Tape, bits: Sequence[int], log_size: int, shift: int) -> int:
    """x = shift * w_{log_size}^i as a wire, i given by `bits` (LSB first)."""
    w = bb.py_root_of_unity(log_size)
    acc = t.const(shift % P)
    for j, b in enumerate(bits):
        acc = t.mul(acc, t.select(b, t.const(pow(w, 1 << j, P)), t.const(1)))
    return acc


def _inv_2x(t: Tape, bits: Sequence[int], log_size: int, shift: int) -> int:
    """1/(2 * shift * w^i) from inverse-twiddle constants (no witness inverse)."""
    w_inv = pow(bb.py_root_of_unity(log_size), P - 2, P)
    acc = t.const(pow(2 * shift % P, P - 2, P))
    for j, b in enumerate(bits):
        acc = t.mul(acc, t.select(b, t.const(pow(w_inv, 1 << j, P)), t.const(1)))
    return acc


def _hash_row(t: Tape, row: Sequence[int]) -> List[int]:
    """Sponge leaf hash of base wires; mirrors poseidon2.hash_rows (RATE-8
    add-absorption into a zero state, zero-padded final block)."""
    zero = t.const(0)
    w = len(row)
    nblocks = max((w + 7) // 8, 1)
    state: Optional[List[int]] = None
    for b in range(nblocks):
        block = list(row[b * 8 : (b + 1) * 8])
        block += [zero] * (8 - len(block))
        if state is None:
            st = block + [zero] * 8
        else:
            st = [t.add(state[i], block[i]) for i in range(8)] + state[8:]
        state = t.permute(st)
    return state[:8]


def _verify_path(
    t: Tape,
    cur: List[int],
    bits: Sequence[Optional[int]],
    sib_rows: Sequence[Sequence[int]],
    root: Sequence[int],
) -> None:
    """Merkle path check; bits entries are bit wires (ordering handled by
    the Poseidon2 chip's in-row half-swap — no select ops), or static
    "lo"/"hi" markers.  Mirrors merkle.verify_path."""
    for bit, sib in zip(bits, sib_rows):
        if bit == "lo":
            cur = t.permute(cur + list(sib))[:8]
        elif bit == "hi":
            cur = t.permute(list(sib) + cur)[:8]
        else:
            cur = t.permute(cur + list(sib), swap=bit)[:8]
    for i in range(8):
        t.eq(cur[i], root[i])


def _ext_from_base_cols(t: Tape, vals: Sequence[int], k: int) -> int:
    """S(z) = sum_c X^c * s_{4k+c}(z) on ext wires (verifier.py:27-35)."""
    acc = vals[4 * k]
    for c in range(1, 4):
        basis = tuple(1 if i == c else 0 for i in range(4))
        acc = t.add(acc, t.mul(vals[4 * k + c], t.const(basis)))
    return acc


# -- the mirrored verifier ---------------------------------------------------


def verify_on_tape(
    t: Tape,
    airs: Sequence[Air],
    proof: Proof,
    config: StarkConfig,
    vk: Optional[Sequence[Optional[np.ndarray]]] = None,
    bind_publics: bool = True,
) -> None:
    """Record the verification of `proof` onto tape `t`.  Raises if the
    proof is invalid (every tape.eq checks concrete values as it records).
    With bind_publics, each chip's main commitment root (8 lanes) and its
    public values become public inputs of the aggregation circuit, in chip
    order."""
    ch = TapeChallenger(t)
    zero = t.const(0)

    assert len(proof.chips) == len(airs), "chip count mismatch"
    log_ns = proof.log_n if isinstance(proof.log_n, list) else [proof.log_n] * len(airs)
    assert len(log_ns) == len(airs)
    publics = proof.publics if proof.publics is not None else [None] * len(airs)
    assert len(publics) == len(airs)

    ch.observe_const(len(airs))
    pub_wires: List[List[int]] = []
    for a, ln, pub in zip(airs, log_ns, publics):
        assert a.num_publics == len(pub or []), "public count mismatch"
        ch.observe_const(a.width)
        ch.observe_const(ln)
        pw = [t.witness(int(v)) for v in (pub or [])]
        ch.observe_wires(pw)
        pub_wires.append(pw)

    if vk is None:
        from .keys import setup

        vk = setup(airs, log_ns, config).pre_roots
    assert len(vk) == len(airs)
    pre_roots_w: List[Optional[List[int]]] = []
    for a, cp, root in zip(airs, proof.chips, vk):
        if a.preprocessed is not None:
            # vk roots are baked into the circuit as constants: the
            # aggregated statement is "a valid proof for THIS vk"
            assert root is not None and (
                np.asarray(cp.pre_root) == np.asarray(root)
            ).all(), f"preprocessed commitment mismatch for chip '{a.name}'"
            lanes = bb.np_from_mont(np.asarray(root, dtype=np.uint32))
            ws = [t.const(int(v)) for v in lanes]
            ch.observe_wires(ws)
            pre_roots_w.append(ws)
        else:
            assert cp.pre_root is None
            pre_roots_w.append(None)

    main_roots = [_witness_digest(t, ch, cp.main_root) for cp in proof.chips]

    alpha = ch.sample_ext()
    beta = ch.sample_ext()

    total_sum = zero
    groups_per_chip: List[List[List[int]]] = []
    totals: List[int] = []
    perm_roots_w: List[Optional[List[int]]] = []
    for a, cp in zip(airs, proof.chips):
        if a.interactions:
            assert cp.perm_root is not None
            perm_roots_w.append(_witness_digest(t, ch, cp.perm_root))
            tw = _witness_ext(t, ch, cp.logup_total)
            total_sum = t.add(total_sum, tw)
            totals.append(tw)
            groups_per_chip.append(
                air_mod.batch_interactions(a, config.bus_interaction_degree)
            )
        else:
            assert cp.perm_root is None
            assert cp.logup_total == (0, 0, 0, 0)
            totals.append(zero)
            groups_per_chip.append([])
            perm_roots_w.append(None)
    t.eq(total_sum, zero)

    alpha_q = ch.sample_ext()
    q_roots_w = [_witness_digest(t, ch, cp.quotient_root) for cp in proof.chips]

    zeta = ch.sample_ext()

    # reconstruct the PCS matrix list (verifier.py:106-131)
    mat_points: List[List[int]] = []  # ext point wires per matrix
    mat_roots_w: List[List[int]] = []  # per-matrix root wires
    widths: List[int] = []
    mat_log_ns: List[int] = []
    zeta_next_cache: Dict[int, int] = {}
    for c_idx, (a, groups, ln) in enumerate(zip(airs, groups_per_chip, log_ns)):
        if ln not in zeta_next_cache:
            w_n = bb.py_root_of_unity(ln)
            zeta_next_cache[ln] = t.mul(zeta, t.const(w_n))
        zn_w = zeta_next_cache[ln]
        pts = [zeta, zn_w]
        if a.preprocessed is not None:
            mat_points.append(pts)
            mat_roots_w.append(pre_roots_w[c_idx])
            widths.append(a.preprocessed_width)
            mat_log_ns.append(ln)
        mat_points.append(pts)
        mat_roots_w.append(main_roots[c_idx])
        widths.append(a.width)
        mat_log_ns.append(ln)
        if a.interactions:
            mat_points.append(pts)
            mat_roots_w.append(perm_roots_w[c_idx])
            widths.append(4 * (len(groups) + 1))
            mat_log_ns.append(ln)
        mat_points.append([zeta])
        mat_roots_w.append(q_roots_w[c_idx])
        widths.append(4 * config.blowup)
        mat_log_ns.append(ln)

    opening = proof.pcs
    assert len(opening.values) == len(mat_points), "opening count mismatch"
    for vals, w, zs in zip(opening.values, widths, mat_points):
        assert len(vals) == len(zs)
        for v in vals:
            assert v.shape == (w, 4), "opened width mismatch"

    # --- pcs.verify_openings mirror ---------------------------------------
    log_Ns = [l + config.log_blowup for l in mat_log_ns]
    log_N_max = max(log_Ns)
    assert len(opening.queries) == config.num_queries, "PCS query count mismatch"
    for pq in opening.queries:
        assert len(pq.per_matrix) == len(mat_points)

    values_w: List[List[List[int]]] = []  # [matrix][point][col] ext wires
    for vals in opening.values:
        per_pt = []
        for v in vals:
            per_pt.append([_witness_ext(t, ch, row) for row in v])
        values_w.append(per_pt)

    alpha_pcs = ch.sample_ext()

    # per-(matrix, point) alpha powers and combined y values
    terms: List[Tuple[int, int, List[int], int]] = []  # (m_idx, z_w, apows, y_comb)
    apow = t.const(1)
    for m_idx, (vals_w, pts) in enumerate(zip(values_w, mat_points)):
        for z_w, y_ws in zip(pts, vals_w):
            apows = []
            for j in range(len(y_ws)):
                apows.append(apow)
                apow = t.mul(apow, alpha_pcs)
            y_comb = t.dot(list(zip(y_ws, apows)))
            terms.append((m_idx, z_w, apows, y_comb))

    # --- fri.verify mirror -------------------------------------------------
    fri = opening.fri
    logs = sorted(set(log_Ns), reverse=True)
    join_logs = set(logs[1:])
    log_n_top = logs[0]
    final_len = 1 << config.log_final_poly_len
    assert len(fri.queries) == config.num_queries, "query count mismatch"
    assert len(fri.final_poly) == final_len, "final poly length mismatch"

    betas = []
    for root in fri.layer_roots:
        rw = _witness_digest(t, ch, root)
        betas.append((ch.sample_ext(), rw))
    final_coeffs = [_witness_ext(t, ch, c) for c in fri.final_poly]
    ch.check_witness(config.proof_of_work_bits, t.witness(fri.pow_witness))

    num_layers = len(fri.layer_roots)
    assert (1 << (log_n_top - num_layers)) == final_len * config.blowup, "layer count"

    inv2 = pow(2, P - 2, P)
    for pq, fq in zip(opening.queries, fri.queries):
        qbits = ch.sample_bits(log_n_top - 1)

        # open_input at the top layer: verify every matrix's row openings
        rows_lo_w: Dict[int, List[int]] = {}
        rows_hi_w: Dict[int, List[int]] = {}
        for m_idx, mq in enumerate(pq.per_matrix):
            lN = log_Ns[m_idx]
            nbits = lN - 1
            lo_w = t.witness_many([int(v) for v in mq.row_lo])
            hi_w = t.witness_many([int(v) for v in mq.row_hi])
            d_lo = _hash_row(t, lo_w)
            d_hi = _hash_row(t, hi_w)
            root_w = mat_roots_w[m_idx]
            assert len(mq.path_lo) == lN and len(mq.path_hi) == lN, "bad path depth"
            sibs_lo = [t.witness_many([int(v) for v in bb.np_from_mont(l)]) for l in mq.path_lo]
            sibs_hi = [t.witness_many([int(v) for v in bb.np_from_mont(l)]) for l in mq.path_hi]
            pbits = list(qbits[:nbits])
            _verify_path(t, d_lo, pbits + ["lo"], sibs_lo, root_w)
            _verify_path(t, d_hi, pbits + ["hi"], sibs_hi, root_w)
            rows_lo_w[m_idx] = lo_w
            rows_hi_w[m_idx] = hi_w

        def reduced_at(x_w: int, log_N: int, rows: Dict[int, List[int]]) -> int:
            total = zero
            for m_idx, z_w, apows, y_comb in terms:
                if log_Ns[m_idx] != log_N:
                    continue
                row = rows[m_idx]
                s = t.dot([(row[j], apows[j]) for j in range(len(row))])
                num = t.sub(s, y_comb)
                d = t.sub(x_w, z_w)
                total = t.add(total, t.mul(num, t.inv(d)))
            return total

        def open_pair(log_N: int) -> Tuple[int, int]:
            shift = pow(config.coset_shift, 1 << (log_N_max - log_N), P)
            x_lo = _index_point(t, qbits[: log_N - 1], log_N, shift)
            x_hi = t.mul(x_lo, t.const(P - 1))
            rl = reduced_at(x_lo, log_N, rows_lo_w)
            rh = reduced_at(x_hi, log_N, rows_hi_w)
            return rl, rh

        # fold chain
        value: Optional[int] = None
        cur_log = log_n_top
        shift_pow = 0
        for l, (layer, (beta_w, _)) in enumerate(zip(fq.layers, betas)):
            pair_w = t.witness_many([int(v) for v in layer.pair.reshape(-1)])
            digest = _hash_row(t, pair_w)
            nbits = cur_log - 1
            assert len(layer.path) == nbits, "bad fri path depth"
            sibs = [t.witness_many([int(v) for v in bb.np_from_mont(p)]) for p in layer.path]
            _verify_path(t, digest, list(qbits[:nbits]), sibs, betas[l][1])
            lo = t.assemble_ext(pair_w[:4])
            hi = t.assemble_ext(pair_w[4:])
            if value is None:
                rl, rh = open_pair(cur_log)
                t.eq(lo, rl)
                t.eq(hi, rh)
            else:
                expect = value
                if cur_log in join_logs:
                    rl, rh = open_pair(cur_log)
                    side = t.select(qbits[cur_log - 1], rh, rl)
                    expect = t.add(expect, side)
                got = t.select(qbits[cur_log - 1], hi, lo)
                t.eq(got, expect)
            shift = pow(config.coset_shift, 1 << shift_pow, P)
            i2x = _inv_2x(t, qbits[: cur_log - 1], cur_log, shift)
            s = t.mul(t.add(lo, hi), t.const(inv2))
            d = t.mul(t.sub(lo, hi), i2x)
            value = t.add(s, t.mul(beta_w, d))
            cur_log -= 1
            shift_pow += 1

        # final polynomial evaluation (Horner) at the fold point
        shift = pow(config.coset_shift, 1 << shift_pow, P)
        x_w = _index_point(t, qbits[:cur_log], cur_log, shift)
        acc = final_coeffs[-1]
        for c in reversed(final_coeffs[:-1]):
            acc = t.add(t.mul(acc, x_w), c)
        t.eq(value, acc)

    # --- per-chip constraint identity at zeta (verifier.py:141-202) -------
    zn_cache: Dict[int, int] = {}
    one_w = t.const(1)
    m_idx = 0
    for c_idx, (a, groups, ln, pw) in enumerate(
        zip(airs, groups_per_chip, log_ns, pub_wires)
    ):
        n = 1 << ln
        if ln not in zn_cache:
            zz = zeta
            for _ in range(ln):
                zz = t.mul(zz, zz)
            zn_cache[ln] = zz
        zn = zn_cache[ln]
        z_h = t.sub(zn, one_w)
        n_inv = pow(n, P - 2, P)
        w_last = pow(bb.py_root_of_unity(ln), n - 1, P)
        znh = t.mul(z_h, t.const(n_inv))
        is_first = t.mul(znh, t.inv(t.sub(zeta, one_w)))
        dl = t.sub(zeta, t.const(w_last))
        is_last = t.mul(t.mul(znh, t.const(w_last)), t.inv(dl))
        sel = {"is_first": is_first, "is_last": is_last, "is_transition": dl, "z_h": z_h}

        pre_at = None
        if a.preprocessed is not None:
            pre_vals = values_w[m_idx]
            m_idx += 1
            pre_at = {}
            for i in range(a.preprocessed_width):
                pre_at[(i, 0)] = pre_vals[0][i]
                pre_at[(i, 1)] = pre_vals[1][i]
        main_vals = values_w[m_idx]
        m_idx += 1
        main_at = {}
        for i in range(a.width):
            main_at[(i, 0)] = main_vals[0][i]
            main_at[(i, 1)] = main_vals[1][i]
        perm_at: Dict[Tuple[int, int], int] = {}
        logup_cons: List[ir.Expr] = []
        challenges: Dict[str, int] = {}
        if a.interactions:
            perm_vals = values_w[m_idx]
            m_idx += 1
            for k in range(len(groups) + 1):
                perm_at[(k, 0)] = _ext_from_base_cols(t, perm_vals[0], k)
                perm_at[(k, 1)] = _ext_from_base_cols(t, perm_vals[1], k)
            logup_cons, _ = air_mod.logup_constraints(a, groups)
            challenges = {
                ALPHA_LOGUP: alpha,
                BETA_LOGUP: beta,
                TOTAL_LOGUP: totals[c_idx],
            }
        q_vals = values_w[m_idx]
        m_idx += 1

        alg = ir.Algebra(
            add=t.add,
            sub=t.sub,
            mul=t.mul,
            neg=lambda x: t.sub(zero, x),
            const=lambda v: t.const(v),
            col=lambda i, r: main_at[(i, r)],
            pre_col=(lambda i, r: pre_at[(i, r)]) if pre_at is not None else None,
            perm_col=lambda k, r: perm_at[(k, r)],
            challenge=lambda name: challenges[name],
            public=lambda i: pw[i],
            is_first=lambda: sel["is_first"],
            is_last=lambda: sel["is_last"],
            is_transition=lambda: sel["is_transition"],
        )
        cache: Dict[int, int] = {}
        acc = zero
        apw = one_w
        for con in list(a.constraints) + logup_cons:
            val = ir.evaluate(con, alg, cache)
            acc = t.add(acc, t.mul(apw, val))
            apw = t.mul(apw, alpha_q)

        # Q(zeta) = sum_k zeta^{kn} Q_k(zeta)
        q_at = zero
        zkn = one_w
        for k in range(config.blowup):
            qk = _ext_from_base_cols(t, q_vals[0], k)
            q_at = t.add(q_at, t.mul(zkn, qk))
            zkn = t.mul(zkn, zn)
        t.eq(acc, t.mul(z_h, q_at))

    if bind_publics:
        for roots_w, pw in zip(main_roots, pub_wires):
            for w in roots_w:
                t.public(w)
            for w in pw:
                t.public(w)


def aggregate(
    proof_sets: Sequence[Tuple[Sequence[Air], Proof]],
    config: StarkConfig,
    vks: Optional[Sequence] = None,
):
    """Record the verification of several proofs onto one tape and compile
    it into the aggregation chips.  Returns the AggregationCircuit; prove
    it with prover.prove(zip(c.airs, c.traces), outer_cfg, Challenger(),
    publics=c.publics)."""
    from .aggregation import compile_tape

    t = Tape()
    for i, (airs, proof) in enumerate(proof_sets):
        verify_on_tape(t, airs, proof, config, vk=vks[i] if vks else None)
    return compile_tape(t), t


def aggregate_tree(
    proof_sets: Sequence[Tuple[Sequence[Air], Proof]],
    config: StarkConfig,
    fanout: int = 2,
    max_levels: int = 8,
):
    """Full aggregation tree (the reference's leaf -> internal -> root
    chain, openvm-riscv/src/lib.rs:309-325): group `fanout` proofs per
    aggregation circuit per level, prove each, and recurse until a single
    root proof remains.  Every level's publics carry the level below's
    publics (each chip's commitment roots + inherited publics), so the
    root proof transitively binds every input proof's roots.

    Returns (root_airs, root_proof, levels) where levels[i] is the list
    of (airs, proof) pairs produced at level i (levels[-1] is the root)."""
    from .challenger import Challenger
    from . import prover as prover_mod

    levels = []
    cur = list(proof_sets)
    for _ in range(max_levels):
        if len(cur) == 1 and levels:
            break
        nxt = []
        for i in range(0, len(cur), fanout):
            circ, _t = aggregate(cur[i : i + fanout], config)
            proof = prover_mod.prove(
                list(zip(circ.airs, circ.traces)),
                config,
                Challenger(),
                publics=circ.publics,
            )
            nxt.append((circ.airs, proof))
        levels.append(nxt)
        cur = nxt
        if len(cur) == 1:
            break
    else:
        raise RuntimeError("aggregation tree did not converge")
    root_airs, root_proof = cur[0]
    return root_airs, root_proof, levels
