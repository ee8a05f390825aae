"""Field layer tests: BabyBear Montgomery ops and the quartic extension,
cross-checked against python-int ground truth (the same invariants powdr's
number crate tests at /root/reference/number/src/baby_bear.rs:8-60 cover:
ring axioms, inverses, roots of unity)."""
import numpy as np
import jax.numpy as jnp

from powdr_tpu.field import babybear as bb
from powdr_tpu.field import ext

P = bb.P


def _rand_canonical(rng, n):
    return rng.integers(0, P, size=n, dtype=np.uint64).astype(np.uint32)


def test_constants():
    assert P == 2**31 - 2**27 + 1
    assert (-pow(P, -1, 2**32)) % 2**32 == bb.NPRIME
    assert (1 << 32) % P == bb.R_MOD_P
    assert pow(bb.TWO_ADIC_ROOT, 2**27, P) == 1
    assert pow(bb.TWO_ADIC_ROOT, 2**26, P) != 1


def test_mont_roundtrip(rng):
    x = _rand_canonical(rng, 1000)
    xm = bb.to_mont(jnp.asarray(x))
    back = np.asarray(bb.from_mont(xm))
    np.testing.assert_array_equal(back, x)


def test_mulhi32(rng):
    a = rng.integers(0, 2**32, size=1000, dtype=np.uint64)
    b = rng.integers(0, 2**32, size=1000, dtype=np.uint64)
    expect = ((a * b) >> 32).astype(np.uint32)
    got = np.asarray(bb.mulhi32(jnp.asarray(a.astype(np.uint32)), jnp.asarray(b.astype(np.uint32))))
    np.testing.assert_array_equal(got, expect)


def test_add_sub_neg(rng):
    a = _rand_canonical(rng, 1000)
    b = _rand_canonical(rng, 1000)
    np.testing.assert_array_equal(
        np.asarray(bb.add(jnp.asarray(a), jnp.asarray(b))),
        ((a.astype(np.uint64) + b) % P).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(bb.sub(jnp.asarray(a), jnp.asarray(b))),
        ((a.astype(np.int64) - b) % P).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(bb.neg(jnp.asarray(a))), ((-a.astype(np.int64)) % P).astype(np.uint32)
    )


def test_mul_matches_python(rng):
    a = _rand_canonical(rng, 1000)
    b = _rand_canonical(rng, 1000)
    am, bm = bb.to_mont(jnp.asarray(a)), bb.to_mont(jnp.asarray(b))
    got = np.asarray(bb.from_mont(bb.mont_mul(am, bm)))
    expect = (a.astype(np.uint64) * b % P).astype(np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_mul_edge_cases():
    edges = np.array([0, 1, P - 1, P - 2, 2**27, 15], dtype=np.uint32)
    a, b = np.meshgrid(edges, edges)
    a, b = a.ravel(), b.ravel()
    am, bm = bb.to_mont(jnp.asarray(a)), bb.to_mont(jnp.asarray(b))
    got = np.asarray(bb.from_mont(bb.mont_mul(am, bm)))
    expect = (a.astype(np.uint64) * b % P).astype(np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_inv(rng):
    a = _rand_canonical(rng, 200)
    a[0] = 0  # inv(0) = 0 convention
    am = bb.to_mont(jnp.asarray(a))
    got = np.asarray(bb.from_mont(bb.inv(am)))
    expect = np.array([pow(int(x), P - 2, P) if x else 0 for x in a], dtype=np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_pow():
    g = bb.to_mont(jnp.uint32(bb.GENERATOR))
    # g^(p-1) = 1
    assert int(bb.from_mont(bb.mont_pow(g, P - 1))) == 1
    assert int(bb.from_mont(bb.mont_pow(g, 15))) == pow(31, 15, P)


# -- extension field ----------------------------------------------------------


def _rand_ext(rng, n):
    return rng.integers(0, P, size=(n, 4), dtype=np.uint64).astype(np.uint32)


def test_ext_mul(rng):
    a = _rand_ext(rng, 100)
    b = _rand_ext(rng, 100)
    am = bb.to_mont(jnp.asarray(a))
    bm = bb.to_mont(jnp.asarray(b))
    got = np.asarray(bb.from_mont(ext.mul(am, bm)))
    for i in range(100):
        expect = ext.py_mul([int(x) for x in a[i]], [int(x) for x in b[i]])
        assert tuple(got[i]) == expect, i


def test_ext_inv(rng):
    a = _rand_ext(rng, 50)
    am = bb.to_mont(jnp.asarray(a))
    im = ext.inv(am)
    prod = np.asarray(bb.from_mont(ext.mul(am, im)))
    np.testing.assert_array_equal(prod, np.tile(np.array([1, 0, 0, 0], np.uint32), (50, 1)))


def test_ext_inv_python_crosscheck(rng):
    a = _rand_ext(rng, 20)
    am = bb.to_mont(jnp.asarray(a))
    got = np.asarray(bb.from_mont(ext.inv(am)))
    for i in range(20):
        expect = ext.py_inv([int(x) for x in a[i]])
        assert tuple(got[i]) == expect


def test_ext_pow_order():
    # the multiplicative group of F_p4 has order p^4 - 1; a random element to
    # that power must be 1
    import jax

    a = bb.to_mont(jnp.asarray(np.array([[5, 7, 11, 13]], np.uint32)))
    r = np.asarray(bb.from_mont(jax.jit(lambda v: ext.pow_scan(v, P**4 - 1))(a)))
    np.testing.assert_array_equal(r[0], [1, 0, 0, 0])


def test_field_registry():
    """Host field families (the reference number crate's surface)."""
    from powdr_tpu.field.fields import FIELDS, BABY_BEAR, GOLDILOCKS

    for f in FIELDS.values():
        # generator really generates: check order divisors for small factors
        assert f.pow(f.generator, f.p - 1) == 1
        if f.two_adicity:
            w = f.root_of_unity(f.two_adicity)
            assert f.pow(w, 1 << f.two_adicity) == 1
            assert f.pow(w, 1 << (f.two_adicity - 1)) != 1
        a, b = 123456789 % f.p, 987654321 % f.p
        assert f.mul(a, f.inv(a)) == 1
        assert f.from_bytes_le(f.to_bytes_le(a)) == a
    assert BABY_BEAR.p == bb.P
    assert GOLDILOCKS.p == 2**64 - 2**32 + 1
