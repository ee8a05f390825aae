"""Range constraints: wrapping interval + bitmask abstract domain.

Counterpart of /root/reference/constraint-solver/src/range_constraint.rs:
a set over-approximation of a variable's possible field values, as the
intersection of a (possibly wrapping) interval [min, max] and a bitmask.
All operations preserve validity (the result allows at least every value
the true set contains)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

P = 2013265921
FULL_MASK = (1 << 31) - 1


def _mask_for(v: int) -> int:
    return (1 << v.bit_length()) - 1 if v else 0


@dataclass(frozen=True)
class RangeConstraint:
    min: int = 0
    max: int = P - 1
    mask: int = FULL_MASK

    # -- constructors --------------------------------------------------------

    @staticmethod
    def default() -> "RangeConstraint":
        return RangeConstraint()

    @staticmethod
    def from_value(v: int) -> "RangeConstraint":
        v %= P
        return RangeConstraint(min=v, max=v, mask=_mask_for(v))

    @staticmethod
    def from_range(lo: int, hi: int) -> "RangeConstraint":
        lo %= P
        hi %= P
        mask = FULL_MASK if lo > hi else _mask_for(hi)
        return RangeConstraint(min=lo, max=hi, mask=mask)

    @staticmethod
    def from_mask(mask: int) -> "RangeConstraint":
        mask &= FULL_MASK
        return RangeConstraint(min=0, max=min(mask, P - 1), mask=mask)

    # -- predicates ----------------------------------------------------------

    def is_wrapping(self) -> bool:
        return self.min > self.max

    def try_to_single_value(self) -> Optional[int]:
        if self.min == self.max:
            return self.min
        return None

    def allows_value(self, v: int) -> bool:
        v %= P
        if v & ~self.mask:
            return False
        if self.is_wrapping():
            return v >= self.min or v <= self.max
        return self.min <= v <= self.max

    def range_size(self) -> int:
        """Number of values the interval admits (ignores mask)."""
        if self.is_wrapping():
            return P - self.min + self.max + 1
        return self.max - self.min + 1

    def is_unconstrained(self) -> bool:
        return self.range_size() >= P and self.mask == FULL_MASK

    def values(self, limit: int = 64):
        """Explicit value list if the set is small, else None."""
        if self.is_wrapping() or self.range_size() > 4 * limit:
            return None
        out = [v for v in range(self.min, self.max + 1) if not (v & ~self.mask)]
        return out if len(out) <= limit else None

    # -- lattice + arithmetic ------------------------------------------------

    def conjunction(self, other: "RangeConstraint") -> "RangeConstraint":
        """Intersection (both constraints hold)."""
        mask = self.mask & other.mask
        if not self.is_wrapping() and not other.is_wrapping():
            lo = max(self.min, other.min)
            hi = min(self.max, other.max)
            if lo > hi:
                # empty set; keep a canonical near-empty constraint
                return RangeConstraint(min=lo, max=lo, mask=0 if lo & ~mask else mask)
            return RangeConstraint(min=lo, max=hi, mask=mask)
        # wrapping cases: fall back to whichever is smaller, keep mask
        a = self if self.range_size() <= other.range_size() else other
        return RangeConstraint(min=a.min, max=a.max, mask=mask)

    def disjunction(self, other: "RangeConstraint") -> "RangeConstraint":
        """Union over-approximation."""
        if self.is_wrapping() or other.is_wrapping():
            return RangeConstraint(mask=self.mask | other.mask)
        return RangeConstraint(
            min=min(self.min, other.min),
            max=max(self.max, other.max),
            mask=self.mask | other.mask,
        )

    def combine_sum(self, other: "RangeConstraint") -> "RangeConstraint":
        """Constraint on x + y given constraints on x and y."""
        if self.is_wrapping() or other.is_wrapping():
            return RangeConstraint.default()
        if self.max + other.max >= P:
            return RangeConstraint.default()
        smask = self.mask + other.mask
        mask = _mask_for(smask) if smask < P else FULL_MASK
        return RangeConstraint(
            min=self.min + other.min, max=self.max + other.max, mask=mask
        )

    def combine_product(self, other: "RangeConstraint") -> "RangeConstraint":
        if self.is_wrapping() or other.is_wrapping():
            return RangeConstraint.default()
        if self.max * other.max >= P:
            return RangeConstraint.default()
        return RangeConstraint(
            min=self.min * other.min,
            max=self.max * other.max,
            mask=_mask_for(self.max * other.max),
        )

    def multiple(self, c: int) -> "RangeConstraint":
        """Constraint on c * x."""
        c %= P
        if c == 0:
            return RangeConstraint.from_value(0)
        if not self.is_wrapping() and self.max * c < P:
            return RangeConstraint(min=self.min * c, max=self.max * c, mask=_mask_for(self.max * c))
        neg_c = P - c
        # c*x = -(neg_c * x): handle small negative multiples (common: -1)
        if not self.is_wrapping() and self.max * neg_c < P:
            lo = (P - self.max * neg_c) % P
            hi = (P - self.min * neg_c) % P
            if self.min == 0:
                # wraps through 0: [P - max*neg_c, 0] i.e. wrapping interval
                return RangeConstraint(min=lo, max=0, mask=FULL_MASK)
            return RangeConstraint(min=lo, max=hi, mask=_mask_for(hi))
        return RangeConstraint.default()

    def offset(self, c: int) -> "RangeConstraint":
        """Constraint on x + c."""
        c %= P
        if c == 0:
            return self
        if self.is_wrapping():
            return RangeConstraint.default()
        lo, hi = (self.min + c) % P, (self.max + c) % P
        if lo <= hi and self.max + c < P:
            return RangeConstraint(min=lo, max=hi, mask=_mask_for(hi))
        return RangeConstraint(min=lo, max=hi, mask=FULL_MASK)


BOOLEAN = RangeConstraint(min=0, max=1, mask=1)
