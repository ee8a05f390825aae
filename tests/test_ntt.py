"""NTT/LDE tests vs a naive O(n^2) python DFT ground truth."""
import numpy as np
import jax.numpy as jnp

from powdr_tpu.field import babybear as bb
from powdr_tpu import ntt

P = bb.P


def naive_dft(coeffs, w, n):
    out = []
    for i in range(n):
        x = pow(w, i, P)
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + int(c)) % P
        out.append(acc)
    return np.array(out, dtype=np.uint32)


def test_ntt_small_vs_naive(rng):
    log_n = 5
    n = 1 << log_n
    coeffs = rng.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32)
    w = bb.py_root_of_unity(log_n)
    expect = naive_dft(coeffs, w, n)
    got = np.asarray(bb.from_mont(ntt.ntt(bb.to_mont(jnp.asarray(coeffs)))))
    np.testing.assert_array_equal(got, expect)


def test_ntt_roundtrip(rng):
    for log_n in (1, 4, 10):
        n = 1 << log_n
        x = rng.integers(0, P, size=(3, n), dtype=np.uint64).astype(np.uint32)
        xm = jnp.asarray(x)  # treat as Montgomery directly
        back = np.asarray(ntt.intt(ntt.ntt(xm)))
        np.testing.assert_array_equal(back, x)


def test_dif_dit_no_permutation(rng):
    n = 1 << 8
    x = rng.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32)
    xm = jnp.asarray(x)
    back = np.asarray(ntt.intt_rev_to_natural(ntt.ntt_natural_to_rev(xm)))
    np.testing.assert_array_equal(back, x)


def test_coset_lde_extends(rng):
    """LDE evaluations must match evaluating the interpolant on the coset."""
    log_n, log_blowup = 4, 1
    n = 1 << log_n
    evals = rng.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32)
    em = bb.to_mont(jnp.asarray(evals))
    lde = np.asarray(bb.from_mont(ntt.coset_lde(em, log_blowup)))
    # ground truth: interpolate then evaluate at shift * w2n^i
    coeffs = np.asarray(bb.from_mont(ntt.intt(em)))
    w2n = bb.py_root_of_unity(log_n + log_blowup)
    for i in range(n << log_blowup):
        x = bb.GENERATOR * pow(w2n, i, P) % P
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + int(c)) % P
        assert lde[i] == acc, i


def test_lde_of_low_degree_stays_consistent(rng):
    # evaluations of a degree < n poly on H; LDE rows at stride 2^blowup with
    # shift=1... instead just check degree: intt of LDE has top half zero
    log_n, log_blowup = 5, 2
    n = 1 << log_n
    evals = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32))
    lde = ntt.coset_lde(evals, log_blowup, shift=bb.GENERATOR)
    # un-shift: coeffs of lde poly scaled by shift^{-i}
    coeffs = ntt.intt(lde)
    from powdr_tpu.ntt.ntt import _shift_powers

    sp = jnp.asarray(_shift_powers(log_n + log_blowup, bb.GENERATOR, inverse=True))
    coeffs = np.asarray(bb.mont_mul(coeffs, sp))
    assert (coeffs[n:] == 0).all()


def test_eval_poly_at_ext(rng):
    from powdr_tpu.field import ext

    n = 16
    coeffs = rng.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32)
    z = np.array([3, 1, 4, 1], dtype=np.uint32)
    got = np.asarray(
        bb.from_mont(
            ntt.eval_poly_at_ext(bb.to_mont(jnp.asarray(coeffs)), bb.to_mont(jnp.asarray(z)))
        )
    )
    acc = (0, 0, 0, 0)
    for c in reversed(coeffs):
        acc = ext.py_mul(acc, [int(x) for x in z])
        acc = ((acc[0] + int(c)) % P, acc[1], acc[2], acc[3])
    assert tuple(got) == acc


def test_fourstep_matches_ladder(rng):
    """Bailey four-step (the shipped big-size path, ntt/fourstep.py) must
    equal the radix-2 ladder bit-exactly in all four directions, batched
    and unbatched, including the odd-split case."""
    import jax.numpy as jnp
    from powdr_tpu.ntt import fourstep
    from powdr_tpu.ntt.ntt import _dif, _dit, _stage_tables

    for log_n in (10, 13, 15):
        n = 1 << log_n
        for shape in ((n,), (3, n)):
            x = bb.to_mont(
                jnp.asarray(rng.integers(0, P, size=shape, dtype=np.uint64).astype(np.uint32))
            )
            for inverse in (False, True):
                tl = _stage_tables(log_n, inverse)
                tf = fourstep.tables_for(log_n, inverse)
                np.testing.assert_array_equal(
                    np.asarray(fourstep.fourstep_nat_to_rev(x, *tf)),
                    np.asarray(_dif(x, log_n, tl)),
                )
                np.testing.assert_array_equal(
                    np.asarray(fourstep.fourstep_rev_to_nat(x, *tf)),
                    np.asarray(_dit(x, log_n, tl)),
                )


def test_coset_lde_large_roundtrip(rng):
    """coset_lde through the four-step dispatch path (log_N >= 14):
    the LDE restricted to stride-blowup positions recovers... (coset is
    disjoint from H, so instead check against direct evaluation of the
    interpolant on a few coset points)."""
    import jax.numpy as jnp
    from powdr_tpu import ntt as nttmod

    log_n, log_blowup = 13, 2  # output 2^15 -> four-step out path
    n = 1 << log_n
    x = rng.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32)
    xm = bb.to_mont(jnp.asarray(x))
    lde = np.asarray(bb.from_mont(nttmod.coset_lde(xm, log_blowup)))
    # check one point: lde[j] = P(shift * w_N^j) where P interpolates x on H
    coeffs_rev = np.asarray(bb.from_mont(nttmod.interpolate_rev(xm))).astype(np.uint64)
    rev = nttmod.bitrev_indices(log_n)
    coeffs = np.zeros(n, dtype=np.uint64)
    coeffs[rev] = coeffs_rev  # natural-order coefficients
    wN = bb.py_root_of_unity(log_n + log_blowup)
    for j in (0, 1, 12345):
        pt = bb.GENERATOR * pow(wN, j, P) % P
        acc = 0
        for c in reversed(coeffs.tolist()):
            acc = (acc * pt + c) % P
        assert lde[j] == acc
