"""Recursion groundwork: the verifier-circuit cost profile.

First step of the aggregation plan (reference surface: leaf/internal
aggregation in /root/reference/openvm-riscv/src/lib.rs:309-325, built on
openvm-native-recursion): before an in-circuit verifier AIR can be
sized, count exactly what the host verifier does for a given proof —
Poseidon2 permutations (transcript duplexes, Merkle path compressions,
leaf re-hashes) and quartic-extension field operations (constraint fold
at zeta, PCS reduction, FRI folds, inversions).

The profile is measured by INSTRUMENTING an actual `verifier.verify`
run — counters wrap the live functions for the duration of the call —
so it cannot drift from the implementation the way an analytic formula
would.  `aggregation_row_estimate` converts the counts into trace-row
budgets for the two workhorse chips of a future aggregation circuit
(a Poseidon2 permutation AIR at one permutation per row, and an
extension-arithmetic AIR at one mul per row), which is the number that
decides the recursion tree's fan-in."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..field import ext
from ..hash import merkle
from ..hash import poseidon2 as p2
from . import pcs as pcs_mod
from . import verifier as verifier_mod
from .air import Air
from .challenger import Challenger
from .config import StarkConfig
from .prover import Proof


@dataclass
class VerifierProfile:
    """Operation counts for one complete proof verification."""

    transcript_permutations: int = 0
    merkle_path_permutations: int = 0
    leaf_hash_permutations: int = 0
    ext_muls: int = 0
    ext_adds: int = 0
    ext_invs: int = 0

    @property
    def total_poseidon2(self) -> int:
        return (
            self.transcript_permutations
            + self.merkle_path_permutations
            + self.leaf_hash_permutations
        )

    def aggregation_row_estimate(self) -> Dict[str, int]:
        """Trace-row budget for an aggregation AIR verifying this proof
        in-circuit: one row per Poseidon2 permutation in a permutation
        chip, one row per extension mul in an ext-ALU chip (adds ride
        along as linear terms; an inversion costs one mul plus one
        product==1 check row)."""
        mul_rows = self.ext_muls + self.ext_invs
        return {
            "poseidon2_rows": self.total_poseidon2,
            "ext_mul_rows": mul_rows,
            "log2_poseidon2_rows": int(np.ceil(np.log2(max(self.total_poseidon2, 1)))),
            "log2_ext_mul_rows": int(np.ceil(np.log2(max(mul_rows, 1)))),
        }

    def as_dict(self) -> Dict[str, int]:
        return {
            "transcript_permutations": self.transcript_permutations,
            "merkle_path_permutations": self.merkle_path_permutations,
            "leaf_hash_permutations": self.leaf_hash_permutations,
            "ext_muls": self.ext_muls,
            "ext_adds": self.ext_adds,
            "ext_invs": self.ext_invs,
            **self.aggregation_row_estimate(),
        }


class CountingChallenger(Challenger):
    """Challenger that counts duplex permutations (transcript cost)."""

    def __init__(self) -> None:
        super().__init__()
        self.permutations = 0

    def _duplex(self) -> None:
        self.permutations += 1
        super()._duplex()


def profile_verify(
    airs: Sequence[Air],
    proof: Proof,
    config: StarkConfig,
    vk: Optional[Sequence[Optional[np.ndarray]]] = None,
) -> VerifierProfile:
    """Run `verifier.verify` with instrumented hash/field primitives and
    return the measured cost profile.  The proof must be valid (the
    verification itself runs to completion)."""
    prof = VerifierProfile()
    ch = CountingChallenger()

    real_verify_path = merkle.verify_path
    real_hash_rows = p2.hash_rows_host
    real_py_mul = ext.py_mul
    real_py_inv = ext.py_inv
    real_add = pcs_mod.py_ext_add
    real_sub = pcs_mod.py_ext_sub

    def verify_path(root, index, leaf_digest, path, expected_depth=None):
        prof.merkle_path_permutations += len(path)
        return real_verify_path(root, index, leaf_digest, path, expected_depth)

    real_verify_paths = merkle.verify_paths

    def verify_paths(items):
        prof.merkle_path_permutations += sum(len(it[3]) for it in items)
        return real_verify_paths(items)

    def hash_rows(matrix):
        n, w = matrix.shape
        prof.leaf_hash_permutations += n * max((w + p2.RATE - 1) // p2.RATE, 1)
        return real_hash_rows(matrix)

    def py_mul(a, b):
        prof.ext_muls += 1
        return real_py_mul(a, b)

    def py_inv(a):
        prof.ext_invs += 1
        return real_py_inv(a)

    def py_add(a, b):
        prof.ext_adds += 1
        return real_add(a, b)

    def py_sub(a, b):
        prof.ext_adds += 1
        return real_sub(a, b)

    # patch module attributes (and the names verifier/pcs bound at import)
    patches = [
        (merkle, "verify_path", verify_path),
        (merkle, "verify_paths", verify_paths),
        (p2, "hash_rows_host", hash_rows),
        (ext, "py_mul", py_mul),
        (ext, "py_inv", py_inv),
        (pcs_mod, "py_ext_add", py_add),
        (pcs_mod, "py_ext_sub", py_sub),
        (verifier_mod, "py_ext_add", py_add),
        (verifier_mod, "py_ext_sub", py_sub),
    ]
    saved = [(m, n, getattr(m, n)) for m, n, _ in patches]
    try:
        for m, n, f in patches:
            setattr(m, n, f)
        verifier_mod.verify(airs, proof, config, ch, vk=vk)
    finally:
        for m, n, f in saved:
            setattr(m, n, f)
    prof.transcript_permutations = ch.permutations
    return prof
