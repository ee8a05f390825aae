"""PCS commit/open/verify roundtrip."""
import numpy as np
import jax.numpy as jnp
import pytest

from powdr_tpu.field import babybear as bb
from powdr_tpu.stark import pcs
from powdr_tpu.stark.challenger import Challenger
from powdr_tpu.stark.config import StarkConfig

CFG = StarkConfig(log_blowup=2, num_queries=6, proof_of_work_bits=2)


def _commit_random(rng, n, w, cfg=CFG):
    evals = jnp.asarray(rng.integers(0, bb.P, size=(n, w), dtype=np.uint64).astype(np.uint32))
    return pcs.commit(evals, cfg)


def test_eval_at_point_matches_horner(rng):
    n, w = 32, 3
    mat = _commit_random(rng, n, w)
    z = (5, 6, 7, 8)
    got = pcs.eval_at_point(mat, z)
    # ground truth: interpolate each column, Horner at z with python ints
    from powdr_tpu import ntt
    from powdr_tpu.field import ext

    coeffs = np.asarray(bb.from_mont(ntt.intt(jnp.swapaxes(mat.evals, 0, 1))))
    for j in range(w):
        acc = (0, 0, 0, 0)
        for c in reversed(coeffs[j]):
            acc = ext.py_mul(acc, z)
            acc = ((acc[0] + int(c)) % bb.P, *acc[1:])
        assert tuple(int(v) for v in got[j]) == acc


def test_pcs_roundtrip_two_matrices(rng):
    n = 32
    m1 = _commit_random(rng, n, 3)
    m2 = _commit_random(rng, n, 2)
    points = [[(1, 2, 3, 4), (9, 8, 7, 6)], [(1, 2, 3, 4)]]
    ch = Challenger()
    ch.observe_digest(m1.root)
    ch.observe_digest(m2.root)
    opening = pcs.open_matrices([m1, m2], points, CFG, ch)

    vch = Challenger()
    vch.observe_digest(m1.root)
    vch.observe_digest(m2.root)
    pcs.verify_openings([m1.root, m2.root], points, opening, [5, 5], CFG, vch)


def test_pcs_rejects_wrong_value(rng):
    n = 32
    m1 = _commit_random(rng, n, 2)
    points = [[(1, 2, 3, 4)]]
    ch = Challenger()
    ch.observe_digest(m1.root)
    opening = pcs.open_matrices([m1], points, CFG, ch)
    opening.values[0][0] = opening.values[0][0].copy()
    opening.values[0][0][0, 0] = (opening.values[0][0][0, 0] + 1) % bb.P
    vch = Challenger()
    vch.observe_digest(m1.root)
    with pytest.raises(AssertionError):
        pcs.verify_openings([m1.root], points, opening, [5], CFG, vch)


def test_pcs_rejects_tampered_row(rng):
    n = 32
    m1 = _commit_random(rng, n, 2)
    points = [[(3, 0, 0, 0)]]
    ch = Challenger()
    ch.observe_digest(m1.root)
    opening = pcs.open_matrices([m1], points, CFG, ch)
    opening.queries[0].per_matrix[0].row_lo[0] = (
        opening.queries[0].per_matrix[0].row_lo[0] + 1
    ) % bb.P
    vch = Challenger()
    vch.observe_digest(m1.root)
    with pytest.raises(AssertionError):
        pcs.verify_openings([m1.root], points, opening, [5], CFG, vch)
