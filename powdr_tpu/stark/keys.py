"""Proving/verifying keys.

Counterpart of the reference's MultiStarkProvingKey surface (SURVEY.md §1
L5): the verifying key pins the preprocessed (fixed) column commitments —
program tables, lookup tables — so the verifier need not trust the prover
for table contents."""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from . import pcs
from .air import Air
from .config import StarkConfig


@dataclass
class VerifyingKey:
    pre_roots: List[Optional[np.ndarray]]


def setup(airs: Sequence[Air], log_ns: Sequence[int], config: StarkConfig) -> VerifyingKey:
    """Commit every chip's preprocessed matrix (deterministic)."""
    log_n_max = max(log_ns)
    roots: List[Optional[np.ndarray]] = []
    for a, ln in zip(airs, log_ns):
        if a.preprocessed is None:
            roots.append(None)
            continue
        pm = bb.to_mont(jnp.asarray(a.preprocessed.astype(np.uint32)))
        cm = pcs.commit(pm, config, shift_pow=log_n_max - ln)
        roots.append(cm.root)
    # one fetch for all roots (commit leaves them on device)
    import jax

    live = [i for i, r in enumerate(roots) if r is not None]
    if live:
        fetched = jax.device_get([roots[i] for i in live])
        for i, r in zip(live, fetched):
            roots[i] = np.asarray(r)
    return VerifyingKey(pre_roots=roots)
