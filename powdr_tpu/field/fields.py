"""Host-side field registry: the field families the reference's `number`
crate provides (/root/reference/number/src/lib.rs:20-29 — BabyBear,
KoalaBear, Goldilocks, Mersenne31, BN254).

The proving pipeline pins BabyBear (the field powdr's OpenVM path uses,
BabyBearPoseidon2Config) with its tuned kernels in field/babybear.py.
Device kernels for the other fields live next door: field/u32mont.py
(KoalaBear, Mersenne31 — parametric u32 Montgomery + radix-2 NTT) and
field/goldilocks.py (u32 limb pairs with the 2^64 ≡ 2^32 - 1 reduction +
NTT).  This module is the host arithmetic/metadata surface (two-adicity,
generators, (de)serialization) shared by all of them; BN254 stays
host-only (no proving-path need — it is powdr's wrapping field)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional


@dataclass(frozen=True)
class PrimeField:
    name: str
    p: int
    generator: int  # multiplicative generator
    two_adicity: int

    @property
    def bits(self) -> int:
        return self.p.bit_length()

    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return a * b % self.p

    def inv(self, a: int) -> int:
        if a % self.p == 0:
            raise ZeroDivisionError(f"inverse of 0 in {self.name}")
        return pow(a, self.p - 2, self.p)

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def root_of_unity(self, log_n: int) -> int:
        assert log_n <= self.two_adicity, f"{self.name} two-adicity exceeded"
        return pow(self._two_adic_root(), 1 << (self.two_adicity - log_n), self.p)

    def _two_adic_root(self) -> int:
        odd = (self.p - 1) >> self.two_adicity
        return pow(self.generator, odd, self.p)

    def from_bytes_le(self, b: bytes) -> int:
        return int.from_bytes(b, "little") % self.p

    def to_bytes_le(self, a: int) -> bytes:
        return (a % self.p).to_bytes((self.bits + 7) // 8, "little")


BABY_BEAR = PrimeField("BabyBear", 2**31 - 2**27 + 1, 31, 27)
KOALA_BEAR = PrimeField("KoalaBear", 2**31 - 2**24 + 1, 3, 24)
GOLDILOCKS = PrimeField("Goldilocks", 2**64 - 2**32 + 1, 7, 32)
MERSENNE31 = PrimeField("Mersenne31", 2**31 - 1, 7, 0)
BN254 = PrimeField(
    "Bn254",
    21888242871839275222246405745257275088548364400416034343698204186575808495617,
    5,
    28,
)

FIELDS: Dict[str, PrimeField] = {
    f.name: f for f in (BABY_BEAR, KOALA_BEAR, GOLDILOCKS, MERSENNE31, BN254)
}


def get_field(name: str) -> PrimeField:
    return FIELDS[name]
