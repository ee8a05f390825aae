"""Poseidon2 + Merkle tests: structural invariants and a python ground-truth
re-implementation of the permutation."""
import numpy as np
import jax
import jax.numpy as jnp

from powdr_tpu.field import babybear as bb
from powdr_tpu.hash import merkle, poseidon2 as p2

P = bb.P


def py_permute(state):
    """Independent python-int model of the same permutation."""
    rc_ext, rc_int, diag = p2.constants()
    rc_ext = bb.np_from_mont(rc_ext).astype(object)
    rc_int = bb.np_from_mont(rc_int).astype(object)
    diag = bb.np_from_mont(diag).astype(object)
    M4 = [[5, 7, 1, 3], [4, 6, 1, 1], [1, 3, 5, 7], [1, 1, 4, 6]]

    def ext_mat(x):
        g = []
        for i in range(0, 16, 4):
            blk = x[i : i + 4]
            g.append([sum(M4[r][c] * blk[c] for c in range(4)) % P for r in range(4)])
        s = [sum(gr[j] for gr in g) % P for j in range(4)]
        out = []
        for gr in g:
            out.extend((gr[j] + s[j]) % P for j in range(4))
        return out

    x = [int(v) for v in state]
    x = ext_mat(x)
    for r in range(4):
        x = [pow((v + int(rc_ext[r][i])) % P, 7, P) for i, v in enumerate(x)]
        x = ext_mat(x)
    for r in range(13):
        x[0] = pow((x[0] + int(rc_int[r])) % P, 7, P)
        s = sum(x) % P
        x = [(s + int(diag[i]) * v) % P for i, v in enumerate(x)]
    for r in range(4, 8):
        x = [pow((v + int(rc_ext[r][i])) % P, 7, P) for i, v in enumerate(x)]
        x = ext_mat(x)
    return x


def test_permute_matches_python_model(rng):
    state = rng.integers(0, P, size=16, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(bb.from_mont(p2.permute(bb.to_mont(jnp.asarray(state[None, :])))))[0]
    expect = py_permute(state)
    assert [int(v) for v in got] == expect


def test_permute_bijective_diffusion(rng):
    s1 = bb.to_mont(jnp.asarray(rng.integers(0, P, size=(1, 16), dtype=np.uint64).astype(np.uint32)))
    s2 = s1.at[0, 3].set(bb.add(s1[0, 3], bb.one()))
    o1, o2 = np.asarray(p2.permute(s1)), np.asarray(p2.permute(s2))
    assert (o1 != o2).all(), "single-lane change must diffuse to every lane"


def test_hash_rows_distinct_and_stable(rng):
    m = bb.to_mont(jnp.asarray(rng.integers(0, P, size=(8, 20), dtype=np.uint64).astype(np.uint32)))
    d1 = np.asarray(p2.hash_rows(m))
    d2 = np.asarray(p2.hash_rows(m))
    np.testing.assert_array_equal(d1, d2)
    assert len({tuple(r) for r in d1}) == 8


def test_merkle_roundtrip(rng):
    leaves = bb.to_mont(
        jnp.asarray(rng.integers(0, P, size=(16, 8), dtype=np.uint64).astype(np.uint32))
    )
    tree = merkle.build(leaves)
    root = np.asarray(tree.root)
    for idx in (0, 5, 15):
        path = tree.open(idx)
        assert merkle.verify_path(root, idx, np.asarray(leaves[idx]), path)
    # wrong leaf fails
    bad = np.asarray(leaves[3])
    assert not merkle.verify_path(root, 2, bad, tree.open(2))
