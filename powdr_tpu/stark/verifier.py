"""Host-side STARK verifier.

Re-runs the transcript, checks the global LogUp balance (chip cumulative
totals sum to zero — the bus soundness condition the reference gets from
OpenVM's LogUp implementation), verifies the PCS/FRI openings, and checks
the folded constraint identity C(zeta) = Z_H(zeta) * Q(zeta) per chip
using the opened values.  Proofs are tiny; everything here is python-int
math over the quartic extension."""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..field import babybear as bb
from ..field import ext
from ..ir import expression as ir
from . import air as air_mod
from . import pcs
from .air import Air, ALPHA_LOGUP, BETA_LOGUP, TOTAL_LOGUP
from .challenger import Challenger
from .config import StarkConfig
from .pcs import ExtVal, py_ext_add, py_ext_sub, py_ext_pow
from .prover import Proof


def _ext_from_base_cols(vals, k: int) -> ExtVal:
    """Reassemble an extension value from the opened evals of 4 base
    component columns [4k..4k+4): S(z) = sum_c e_c * s_c(z)."""
    acc: ExtVal = (0, 0, 0, 0)
    for c in range(4):
        comp = tuple(int(v) for v in vals[4 * k + c])
        basis = tuple(1 if i == c else 0 for i in range(4))
        acc = py_ext_add(acc, ext.py_mul(basis, comp))
    return acc


def verify(
    airs: Sequence[Air],
    proof: Proof,
    config: StarkConfig,
    challenger: Challenger,
    vk: Optional[Sequence[Optional[np.ndarray]]] = None,
) -> None:
    """vk: per-chip preprocessed commitment roots (from keys.setup).  If
    None, roots are recomputed from air.preprocessed (honest-setup mode)."""
    # shape soundness: a proof listing fewer chips than airs must not let
    # zip() silently skip trailing chips' constraint and opening checks
    assert len(proof.chips) == len(airs), "chip count mismatch"
    if isinstance(proof.log_n, list):
        assert len(proof.log_n) == len(airs), "log_n count mismatch"
    if proof.publics is not None:
        assert len(proof.publics) == len(airs), "publics count mismatch"
    log_ns = proof.log_n if isinstance(proof.log_n, list) else [proof.log_n] * len(airs)
    log_n_max = max(log_ns)

    publics = proof.publics if proof.publics is not None else [None] * len(airs)
    challenger.observe(len(airs))
    for a, ln, pub in zip(airs, log_ns, publics):
        assert a.num_publics == len(pub or []), "public count mismatch"
        challenger.observe(a.width)
        challenger.observe(ln)
        for v in pub or []:
            challenger.observe(v)

    if vk is None:
        from .keys import setup

        vk = setup(airs, log_ns, config).pre_roots
    assert len(vk) == len(airs), "vk count mismatch"
    for a, cp, root in zip(airs, proof.chips, vk):
        if a.preprocessed is not None:
            assert root is not None and (np.asarray(cp.pre_root) == np.asarray(root)).all(), (
                f"preprocessed commitment mismatch for chip '{a.name}'"
            )
            challenger.observe_digest(cp.pre_root)
        else:
            assert cp.pre_root is None

    for cp in proof.chips:
        challenger.observe_digest(cp.main_root)
    alpha = challenger.sample_ext()
    beta = challenger.sample_ext()

    if proof.segments is not None:
        assert sum(proof.segments) == len(airs), "segment sizes must cover chips"
        assert proof.pcs_parts is not None and len(proof.pcs_parts) == len(proof.segments)
        bounds = np.cumsum([0] + list(proof.segments))
        seg_slices = [slice(int(x), int(y)) for x, y in zip(bounds[:-1], bounds[1:])]
        openings = proof.pcs_parts
    else:
        seg_slices = [slice(0, len(airs))]
        openings = [proof.pcs]

    total_sum: ExtVal = (0, 0, 0, 0)
    groups_all: List[list] = [None] * len(airs)
    chal_per_chip: List[Tuple[ExtVal, ExtVal]] = [None] * len(airs)
    value_lists: List[list] = [None] * len(airs)  # opened values per chip

    for sl, opening in zip(seg_slices, openings):
        seg_log_max = max(log_ns[sl.start : sl.stop])
        for i in range(sl.start, sl.stop):
            a, cp = airs[i], proof.chips[i]
            if a.interactions:
                assert cp.perm_root is not None
                challenger.observe_digest(cp.perm_root)
                challenger.observe_ext(cp.logup_total)
                total_sum = py_ext_add(total_sum, cp.logup_total)
                groups_all[i] = air_mod.batch_interactions(a, config.bus_interaction_degree)
            else:
                assert cp.perm_root is None
                assert cp.logup_total == (0, 0, 0, 0)
                groups_all[i] = []

        alpha_q = challenger.sample_ext()
        for i in range(sl.start, sl.stop):
            challenger.observe_digest(proof.chips[i].quotient_root)

        zeta = challenger.sample_ext()

        # reconstruct this segment's PCS matrix list
        roots: List[np.ndarray] = []
        points: List[List[ExtVal]] = []
        widths: List[int] = []
        mat_log_ns: List[int] = []
        for i in range(sl.start, sl.stop):
            a, cp, ln = airs[i], proof.chips[i], log_ns[i]
            chal_per_chip[i] = (alpha_q, zeta)
            w_n = bb.py_root_of_unity(ln)
            zeta_next = tuple(v * w_n % bb.P for v in zeta)
            if a.preprocessed is not None:
                roots.append(cp.pre_root)
                points.append([zeta, zeta_next])
                widths.append(a.preprocessed_width)
                mat_log_ns.append(ln)
            roots.append(cp.main_root)
            points.append([zeta, zeta_next])
            widths.append(a.width)
            mat_log_ns.append(ln)
            if a.interactions:
                roots.append(cp.perm_root)
                points.append([zeta, zeta_next])
                widths.append(4 * (len(groups_all[i]) + 1))
                mat_log_ns.append(ln)
            roots.append(cp.quotient_root)
            points.append([zeta])
            widths.append(4 * config.blowup)
            mat_log_ns.append(ln)

        assert len(opening.values) == len(roots), "opening count mismatch"
        for vals, w, zs in zip(opening.values, widths, points):
            assert len(vals) == len(zs)
            for v in vals:
                assert v.shape == (w, 4), "opened width mismatch"

        pcs.verify_openings(roots, points, opening, mat_log_ns, config, challenger)

        # distribute the opened value lists back to chips
        v_idx = 0
        for i in range(sl.start, sl.stop):
            a = airs[i]
            n_mats = 2 + (1 if a.preprocessed is not None else 0) + (1 if a.interactions else 0)
            value_lists[i] = opening.values[v_idx : v_idx + n_mats]
            v_idx += n_mats

    assert total_sum == (0, 0, 0, 0), "LogUp bus imbalance"

    # per-chip constraint check at zeta
    for a, cp, groups, ln, pub, (alpha_q, zeta), chip_vals in zip(
        airs, proof.chips, groups_all, log_ns, publics, chal_per_chip, value_lists
    ):
        n = 1 << ln
        sel = air_mod.selectors_at_point(zeta, ln)
        z_h = sel["z_h"]
        vals_iter = iter(chip_vals)
        pre_at = None
        if a.preprocessed is not None:
            pre_vals = next(vals_iter)
            pre_at = {}
            for i in range(a.preprocessed_width):
                pre_at[(i, 0)] = tuple(int(v) for v in pre_vals[0][i])
                pre_at[(i, 1)] = tuple(int(v) for v in pre_vals[1][i])
        main_vals = next(vals_iter)
        main_at = {}
        for i in range(a.width):
            main_at[(i, 0)] = tuple(int(v) for v in main_vals[0][i])
            main_at[(i, 1)] = tuple(int(v) for v in main_vals[1][i])
        perm_at: Dict[Tuple[int, int], ExtVal] = {}
        logup_cons: List[ir.Expr] = []
        challenges: Dict[str, ExtVal] = {}
        if a.interactions:
            perm_vals = next(vals_iter)
            n_perm_ext = len(groups) + 1
            for k in range(n_perm_ext):
                perm_at[(k, 0)] = _ext_from_base_cols(perm_vals[0], k)
                perm_at[(k, 1)] = _ext_from_base_cols(perm_vals[1], k)
            logup_cons, _ = air_mod.logup_constraints(a, groups)
            challenges = {
                ALPHA_LOGUP: alpha,
                BETA_LOGUP: beta,
                TOTAL_LOGUP: cp.logup_total,
            }
        q_vals = next(vals_iter)

        pub_map = dict(enumerate(pub)) if pub else None
        alg = air_mod.host_algebra(
            main_at, perm_at, challenges, sel, publics=pub_map, pre_at=pre_at
        )
        cache: Dict[int, object] = {}
        acc: ExtVal = (0, 0, 0, 0)
        apow: ExtVal = (1, 0, 0, 0)
        for con in list(a.constraints) + logup_cons:
            val = ir.evaluate(con, alg, cache)
            acc = py_ext_add(acc, ext.py_mul(apow, val))
            apow = ext.py_mul(apow, alpha_q)

        # Q(zeta) = sum_k zeta^{kn} Q_k(zeta)
        q_at: ExtVal = (0, 0, 0, 0)
        zkn: ExtVal = (1, 0, 0, 0)
        zn = py_ext_pow(zeta, n)
        for k in range(config.blowup):
            qk = _ext_from_base_cols(q_vals[0], k)
            q_at = py_ext_add(q_at, ext.py_mul(zkn, qk))
            zkn = ext.py_mul(zkn, zn)
        lhs = acc
        rhs = ext.py_mul(z_h, q_at)
        assert lhs == rhs, f"constraint identity failed for chip '{a.name}'"
