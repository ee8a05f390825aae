"""Fiat-Shamir transcript: duplex-sponge challenger over Poseidon2.

Same duplex discipline as the challenger the reference relies on through
the stark-backend fork (SURVEY.md §7 step 5): absorb field elements into
the rate, permute on overflow or before squeezing; sampling drains squeezed
lanes.  Proof-of-work grinding is TPU-batched: candidate witnesses are
checked thousands-at-a-time with the vectorized permutation.

State lives as a (16,) device array but all bookkeeping is host-side -
transcript traffic is tiny (commitment roots, sampled challenges)."""
from __future__ import annotations

from typing import Iterable, List

import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from ..hash import poseidon2 as p2


class Challenger:
    def __init__(self) -> None:
        self._state = np.zeros(p2.WIDTH, dtype=np.uint32)  # Montgomery lanes
        self._input: List[int] = []  # canonical values pending absorption
        self._output: List[int] = []  # canonical values ready to squeeze

    # -- absorption ---------------------------------------------------------

    def observe(self, value: int) -> None:
        """Absorb one canonical field element."""
        self._output.clear()
        self._input.append(int(value) % bb.P)
        if len(self._input) == p2.RATE:
            self._duplex()

    def observe_slice(self, values: Iterable[int]) -> None:
        for v in values:
            self.observe(v)

    def observe_digest(self, digest: np.ndarray) -> None:
        """Absorb a Poseidon2 digest (8 Montgomery lanes)."""
        self.observe_slice(bb.np_from_mont(np.asarray(digest, dtype=np.uint32)))

    def observe_ext(self, value) -> None:
        """Absorb a quartic-extension element given as 4 canonical ints."""
        self.observe_slice(int(v) for v in value)

    # -- squeezing ----------------------------------------------------------

    def sample(self) -> int:
        """One canonical base-field element."""
        if self._input or not self._output:
            self._duplex()
        return int(self._output.pop())

    def sample_ext(self):
        return tuple(self.sample() for _ in range(4))

    def sample_bits(self, bits: int) -> int:
        return self.sample() & ((1 << bits) - 1)

    def _duplex(self) -> None:
        buf = self._input
        self._input = []
        mont = bb.np_to_mont(np.array(buf, dtype=np.uint32)) if buf else np.zeros(0, np.uint32)
        st = self._state.copy()
        st[: len(mont)] = mont  # overwrite-rate duplex
        st = np.asarray(p2.permute_host(jnp.asarray(st[None, :])))[0]
        self._state = st
        self._output = list(bb.np_from_mont(st[: p2.RATE]))

    # -- device-transcript handoff ------------------------------------------

    def export_state(self) -> np.ndarray:
        """Sponge state (16 Montgomery lanes) for a DEVICE-side transcript
        segment (stark.fri's fused commit phase).  Only valid with no
        pending absorptions — the device segment replays the duplex
        discipline exactly from this state."""
        assert not self._input, "pending absorptions; flush before handoff"
        return self._state.copy()

    def resume_state(self, state_mont: np.ndarray) -> None:
        """Adopt the state a device transcript segment ended in.  Pending
        outputs are dropped, so the next host operation MUST be an
        observe (which clears squeezed output anyway)."""
        self._state = np.asarray(state_mont, dtype=np.uint32).copy()
        self._input = []
        self._output = []

    # -- proof of work ------------------------------------------------------

    def grind(self, bits: int, batch: int = 4096) -> int:
        """Find a witness w such that observing w makes the next sample end
        in `bits` zero bits.  Candidates are tested in device batches."""
        if bits == 0:
            self.observe(0)
            self.sample()
            return 0
        mask = (1 << bits) - 1
        base = 0
        while True:
            cand = np.arange(base, base + batch, dtype=np.uint32) % bb.P
            states = np.tile(self._state, (batch, 1))
            buf = list(self._input)
            cols = bb.np_to_mont(np.array(buf + [0], dtype=np.uint32))
            states[:, : len(buf)] = cols[:-1]
            states[:, len(buf)] = bb.np_to_mont(cand)
            out = np.asarray(p2.permute_host(jnp.asarray(states)))
            samples = bb.np_from_mont(out[:, p2.RATE - 1])
            hits = np.nonzero((samples & mask) == 0)[0]
            if hits.size:
                w = int(cand[hits[0]])
                self.observe(w)
                s = self.sample()
                assert s & mask == 0
                return w
            base += batch

    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe(witness)
        return self.sample() & ((1 << bits) - 1) == 0
