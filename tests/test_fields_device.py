"""Device kernels for the non-BabyBear fields of the reference's number
crate: KoalaBear / Mersenne31 (u32 Montgomery) and Goldilocks (u32 limb
pairs).  Every op is cross-checked against python-int ground truth; the
NTTs round-trip and match the naive DFT."""
import numpy as np
import jax.numpy as jnp
import pytest

from powdr_tpu.field.u32mont import KOALA_BEAR_DEV, MERSENNE31_DEV
from powdr_tpu.field import goldilocks as gl


@pytest.mark.parametrize("F", [KOALA_BEAR_DEV, MERSENNE31_DEV], ids=lambda f: f.name)
def test_u32_field_ops_match_python(F, rng):
    n = 256
    a = rng.integers(0, F.p, size=n, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, F.p, size=n, dtype=np.uint64).astype(np.uint32)
    am, bm = F.to_mont(jnp.asarray(a)), F.to_mont(jnp.asarray(b))
    for op, py in [
        (F.add, lambda x, y: (x + y) % F.p),
        (F.sub, lambda x, y: (x - y) % F.p),
        (F.mont_mul, lambda x, y: x * y % F.p),
    ]:
        got = F.np_from_mont(np.asarray(op(am, bm)))
        exp = py(a.astype(np.int64), b.astype(np.int64)) % F.p
        np.testing.assert_array_equal(got.astype(np.int64), exp)
    inv = F.np_from_mont(np.asarray(F.inv(am)))
    assert all(int(x) * int(i) % F.p == 1 for x, i in zip(a, inv) if x)


def test_koalabear_ntt_roundtrip_and_dft(rng):
    F = KOALA_BEAR_DEV
    log_n = 6
    n = 1 << log_n
    x = rng.integers(0, F.p, size=n, dtype=np.uint64).astype(np.uint32)
    xm = F.to_mont(jnp.asarray(x))
    fwd = F.ntt(xm)
    back = F.np_from_mont(np.asarray(F.intt(fwd)))
    np.testing.assert_array_equal(back, x)
    # bit-reversed output matches the naive DFT
    w = F.py_root_of_unity(log_n)
    rev = [int(bin(i)[2:].zfill(log_n)[::-1], 2) for i in range(n)]
    got = F.np_from_mont(np.asarray(fwd))
    for k in (0, 1, 5, n - 1):
        exp = sum(int(x[j]) * pow(w, k * j, F.p) for j in range(n)) % F.p
        assert int(got[rev[k]]) == exp


def test_goldilocks_ops_match_python(rng):
    n = 256
    a = rng.integers(0, gl.P, size=n, dtype=np.uint64)
    b = rng.integers(0, gl.P, size=n, dtype=np.uint64)
    ap, bp = gl.from_u64(a), gl.from_u64(b)
    for op, py in [
        (gl.add, lambda x, y: (int(x) + int(y)) % gl.P),
        (gl.sub, lambda x, y: (int(x) - int(y)) % gl.P),
        (gl.mul, lambda x, y: int(x) * int(y) % gl.P),
    ]:
        got = gl.to_u64(op(ap, bp))
        exp = np.array([py(x, y) for x, y in zip(a, b)], dtype=np.uint64)
        np.testing.assert_array_equal(got, exp)
    got = gl.to_u64(gl.neg(ap))
    exp = np.array([(gl.P - int(x)) % gl.P for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)
    inv = gl.to_u64(gl.inv(ap))
    assert all(int(x) * int(i) % gl.P == 1 for x, i in zip(a, inv) if x)


def test_goldilocks_edge_values():
    edges = np.array(
        [0, 1, 2, gl.P - 1, gl.P - 2, 0xFFFFFFFF, 1 << 32, (1 << 63) + 12345],
        dtype=np.uint64,
    )
    ap = gl.from_u64(edges)
    for i, x in enumerate(edges):
        for j, y in enumerate(edges):
            a1 = gl.from_u64(np.array([x], dtype=np.uint64))
            b1 = gl.from_u64(np.array([y], dtype=np.uint64))
            assert int(gl.to_u64(gl.mul(a1, b1))[0]) == int(x) * int(y) % gl.P
            assert int(gl.to_u64(gl.add(a1, b1))[0]) == (int(x) + int(y)) % gl.P
            assert int(gl.to_u64(gl.sub(a1, b1))[0]) == (int(x) - int(y)) % gl.P


def test_goldilocks_ntt_roundtrip(rng):
    log_n = 5
    n = 1 << log_n
    x = rng.integers(0, gl.P, size=n, dtype=np.uint64)
    fwd = gl.ntt(gl.from_u64(x))
    back = gl.to_u64(gl.intt(fwd))
    np.testing.assert_array_equal(back, x)
    w = gl.py_root_of_unity(log_n)
    rev = [int(bin(i)[2:].zfill(log_n)[::-1], 2) for i in range(n)]
    got = gl.to_u64(fwd)
    for k in (0, 3, n - 1):
        exp = sum(int(x[j]) * pow(w, k * j, gl.P) for j in range(n)) % gl.P
        assert int(got[rev[k]]) == exp


def test_mersenne31_has_no_ntt():
    with pytest.raises(AssertionError):
        MERSENNE31_DEV.py_root_of_unity(3)
