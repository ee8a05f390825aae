"""FRI prove/verify roundtrip on honest and tampered codewords."""
import numpy as np
import jax.numpy as jnp
import pytest

from powdr_tpu.field import babybear as bb
from powdr_tpu.field import ext
from powdr_tpu import ntt
from powdr_tpu.stark import fri
from powdr_tpu.stark.challenger import Challenger
from powdr_tpu.stark.config import StarkConfig

CFG = StarkConfig(log_blowup=2, num_queries=8, proof_of_work_bits=2, log_final_poly_len=0)


def low_degree_codeword(rng, log_n, log_blowup):
    """Random poly of degree < n/blowup, evaluated over coset g*G_n, EF4."""
    n = 1 << log_n
    deg = n >> log_blowup
    coeffs = rng.integers(0, bb.P, size=(4, deg), dtype=np.uint64).astype(np.uint32)
    coeffs = np.pad(coeffs, ((0, 0), (0, n - deg)))
    cm = bb.to_mont(jnp.asarray(coeffs))
    from powdr_tpu.ntt.ntt import _shift_powers

    sp = jnp.asarray(_shift_powers(log_n, bb.GENERATOR, inverse=False))
    cm = bb.mont_mul(cm, sp)
    evals = ntt.ntt(cm)  # (4, n)
    return jnp.moveaxis(evals, 0, -1)  # (n, 4) Montgomery


def test_fri_roundtrip(rng):
    log_n = 8
    cw = low_degree_codeword(rng, log_n, CFG.log_blowup)
    ch = Challenger()
    ch.observe(42)
    proof = fri.prove(cw, CFG, ch)
    vch = Challenger()
    vch.observe(42)
    fri.verify(proof, log_n, CFG, vch)


def test_fri_binds_input(rng):
    log_n = 7
    cw = low_degree_codeword(rng, log_n, CFG.log_blowup)
    ch = Challenger()
    proof = fri.prove(cw, CFG, ch)
    host = np.asarray(bb.from_mont(cw))
    n = 1 << log_n

    def open_input(q, log_size):
        return np.stack([host[q], host[q + n // 2]])

    vch = Challenger()
    fri.verify(proof, log_n, CFG, vch, open_input=open_input)

    def bad_input(q, log_size):
        v = np.stack([host[q], host[q + n // 2]]).copy()
        v[0, 0] = (v[0, 0] + 1) % bb.P
        return v

    vch = Challenger()
    with pytest.raises(AssertionError):
        fri.verify(proof, log_n, CFG, vch, open_input=bad_input)


def test_fri_rejects_high_degree(rng):
    log_n = 7
    n = 1 << log_n
    # full-degree random codeword: prover's own degree assert must trip
    cw = jnp.asarray(rng.integers(0, bb.P, size=(n, 4), dtype=np.uint64).astype(np.uint32))
    ch = Challenger()
    with pytest.raises(AssertionError):
        fri.prove(cw, CFG, ch)


def test_fri_rejects_wrong_query_count(rng):
    """A forged proof must not be able to shrink the query set (ADVICE r1)."""
    log_n = 7
    cw = low_degree_codeword(rng, log_n, CFG.log_blowup)
    ch = Challenger()
    proof = fri.prove(cw, CFG, ch)
    proof.queries = proof.queries[:-1]
    with pytest.raises(AssertionError, match="query count"):
        fri.verify(proof, log_n, CFG, Challenger())
    proof.queries = []
    with pytest.raises(AssertionError, match="query count"):
        fri.verify(proof, log_n, CFG, Challenger())


def test_fri_rejects_oversized_final_poly(rng):
    """Extra final-poly coefficients would make the low-degree test
    vacuous (ADVICE r1); the verifier must bound its length."""
    log_n = 7
    cw = low_degree_codeword(rng, log_n, CFG.log_blowup)
    ch = Challenger()
    proof = fri.prove(cw, CFG, ch)
    proof.final_poly = np.concatenate([proof.final_poly, proof.final_poly], axis=0)
    with pytest.raises(AssertionError, match="final poly length"):
        fri.verify(proof, log_n, CFG, Challenger())


def test_fri_rejects_wrong_path_depth(rng):
    """Merkle paths must have exactly the expected depth (ADVICE r1)."""
    log_n = 7
    cw = low_degree_codeword(rng, log_n, CFG.log_blowup)
    ch = Challenger()
    proof = fri.prove(cw, CFG, ch)
    lay = proof.queries[0].layers[0]
    lay.path = np.concatenate([lay.path, lay.path[-1:]], axis=0)
    with pytest.raises(AssertionError, match="bad path"):
        fri.verify(proof, log_n, CFG, Challenger())


def test_fri_rejects_tampered_proof(rng):
    log_n = 7
    cw = low_degree_codeword(rng, log_n, CFG.log_blowup)
    ch = Challenger()
    proof = fri.prove(cw, CFG, ch)
    proof.queries[0].layers[0].pair[0, 0] = (proof.queries[0].layers[0].pair[0, 0] + 1) % bb.P
    vch = Challenger()
    with pytest.raises(AssertionError):
        fri.verify(proof, log_n, CFG, vch)
