"""STARK configuration.

Mirrors the parameter surface powdr pins on the stark-backend fork
(`/root/reference/openvm/src/lib.rs:29,97-101`): BabyBear + Poseidon2,
100-bit security preset, default constraint degree bound 2*log_blowup+1
for identities and one less for bus interactions."""
from __future__ import annotations

import os
from dataclasses import dataclass

from ..field import babybear as bb


def eager_prover() -> bool:
    """POWDR_TPU_EAGER_PROVER=1: evaluate the prover's per-chip graphs
    (perm, quotient, reduced codewords, FRI folds, Merkle levels)
    eagerly instead of jit-compiling them.  One-shot CPU runs — the
    driver's multichip dryrun, cold CI proves — pay far more for XLA
    compiles of every distinct constraint graph than for eager dispatch
    on small tables; serving runs on the real chip keep the jits."""
    return os.environ.get("POWDR_TPU_EAGER_PROVER", "0") == "1"


@dataclass(frozen=True)
class StarkConfig:
    log_blowup: int = 2
    num_queries: int = 50  # conjectured soundness: log_blowup * queries bits
    proof_of_work_bits: int = 8
    coset_shift: int = bb.GENERATOR
    log_final_poly_len: int = 0  # FRI terminates at this many coefficients

    @property
    def blowup(self) -> int:
        return 1 << self.log_blowup

    @property
    def max_constraint_degree(self) -> int:
        # reference: DegreeBound identities = 2*blowup_log+1 (openvm/src/lib.rs:97-101)
        return 2 * self.log_blowup + 1

    @property
    def bus_interaction_degree(self) -> int:
        return self.max_constraint_degree - 1


#: ~100-bit config matching the reference's security preset shape
DEFAULT = StarkConfig()

#: cheap config for tests (fewer queries, tiny grind)
TEST = StarkConfig(num_queries=12, proof_of_work_bits=4)
