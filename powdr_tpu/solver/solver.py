"""Fixed-point deduction engine over a constraint system.

Counterpart of the reference's BaseSolver
(/root/reference/constraint-solver/src/solver/base.rs:24-57) with the
single-constraint analysis of algebraic_constraint/solve.rs: each
constraint (== 0) yields Effects — assignments, range-constraint
refinements, substitutions — which are applied to the indexed system and
re-enqueue the touched constraints until nothing changes.

Implemented deductions (reference parity noted per item):
  * constant contradiction check
  * affine single-variable solving -> assignment
  * affine multi-variable interval propagation -> range refinement
  * bit-decomposition of affine constraints whose variables carry
    disjoint power-of-two-scaled masks (constraint_splitter.rs analog)
  * product-form analysis: l*r == 0 with one factor's range excluding 0;
    two-root quadratics in one variable -> 2-value range (boolean
    extractor analog for x(x-1) = 0)
  * equivalence substitution x = c*y + d derived from 2-term affine
    constraints (var_transformation / inliner building block)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from .constraint_system import ConstraintSystemGE, IndexedSystem
from .grouped_expression import GroupedExpression, P
from .range_constraint import FULL_MASK, RangeConstraint


class Contradiction(Exception):
    pass


def _signed_c(c: int) -> int:
    c %= P
    return c if c <= P // 2 else c - P


@dataclass
class SolveResult:
    assignments: Dict[int, int] = field(default_factory=dict)
    ranges: Dict[int, RangeConstraint] = field(default_factory=dict)
    substitutions: Dict[int, GroupedExpression] = field(default_factory=dict)


MAX_VARS_FOR_PROPAGATION = 10


class Solver:
    def __init__(
        self,
        system: ConstraintSystemGE,
        ranges: Optional[Dict[int, RangeConstraint]] = None,
        derive_substitutions: bool = True,
    ):
        self.indexed = IndexedSystem(system)
        self.result = SolveResult(ranges=dict(ranges or {}))
        self.derive_substitutions = derive_substitutions
        self._queue: List[Tuple] = [("c", i, 0) for i in range(len(system.constraints))]
        self._queued: Set[Tuple] = set(self._queue)

    # -- range helpers -------------------------------------------------------

    def range_of_var(self, v: int) -> RangeConstraint:
        return self.result.ranges.get(v, RangeConstraint.default())

    def range_of(self, e: GroupedExpression) -> RangeConstraint:
        c = e.try_to_constant()
        if c is not None:
            return RangeConstraint.from_value(c)
        if not e.is_affine() or len(e.linear) > MAX_VARS_FOR_PROPAGATION:
            return RangeConstraint.default()
        acc = RangeConstraint.from_value(0)
        for v, coeff in e.linear.items():
            acc = acc.combine_sum(self.range_of_var(v).multiple(coeff))
            if acc.is_unconstrained():
                return acc
        # apply the constant as an offset at the end: wrap-aware, so small
        # negative constants (p - c) still give tight intervals
        return acc.offset(e.constant)

    def _update_range(self, v: int, rc: RangeConstraint) -> bool:
        cur = self.range_of_var(v)
        new = cur.conjunction(rc)
        if new.range_size() < cur.range_size() or (new.mask & ~cur.mask) == 0 and new.mask != cur.mask:
            self.result.ranges[v] = new
            single = new.try_to_single_value()
            if single is not None and v not in self.result.assignments:
                self._assign(v, single)
            else:
                for slot in self.indexed.occurrences(v):
                    self._enqueue(slot)
            return True
        return False

    # -- effect application --------------------------------------------------

    def _enqueue(self, slot):
        if slot not in self._queued:
            self._queue.append(slot)
            self._queued.add(slot)

    def _assign(self, v: int, value: int):
        value %= P
        prev = self.result.assignments.get(v)
        if prev is not None:
            if prev != value:
                raise Contradiction(f"x{v} = {prev} and {value}")
            return
        if not self.range_of_var(v).allows_value(value):
            raise Contradiction(f"x{v} = {value} outside its range")
        self.result.assignments[v] = value
        self.result.ranges[v] = RangeConstraint.from_value(value)
        for slot in self.indexed.substitute(v, GroupedExpression.from_const(value)):
            self._enqueue(slot)

    def _substitute(self, v: int, repl: GroupedExpression):
        if v in self.result.assignments or v in self.result.substitutions:
            return
        self.result.substitutions[v] = repl
        for slot in self.indexed.substitute(v, repl):
            self._enqueue(slot)

    # -- single-constraint analysis ------------------------------------------

    def _process(self, slot):
        kind, i, j = slot
        if kind != "c":
            return  # bus expressions carry no == 0 semantics here
        e = self.indexed.get(slot).normalized()
        self.indexed.set(slot, e)
        c = e.try_to_constant()
        if c is not None:
            if c != 0:
                raise Contradiction(f"constraint {i} reduces to {c} != 0")
            return
        if e.is_affine():
            self._process_affine(e)
        else:
            self._process_quadratic(e)

    def _process_affine(self, e: GroupedExpression):
        if len(e.linear) == 1:
            ((v, coeff),) = e.linear.items()
            self._assign(v, (-e.constant) * pow(coeff, P - 2, P) % P)
            return
        if self._try_bit_decomposition(e) or self._try_bit_decomposition(-e):
            return
        if self.derive_substitutions and len(e.linear) == 2:
            # x = c*y + d equivalence: substitute the higher id (later col)
            (v1, c1), (v2, c2) = sorted(e.linear.items())
            repl = e.solve_for(v2)
            if repl is not None:
                self._substitute(v2, repl)
                return
        # signed-interval propagation: handles mixed-sign coefficients
        # (e.g. byte decompositions written as -x0 - 256*x1 + C = 0)
        if len(e.linear) <= MAX_VARS_FOR_PROPAGATION:
            self._signed_interval_narrowing(e)

    def _signed_interval_narrowing(self, e: GroupedExpression) -> None:
        """For `sum c_i v_i + b = 0`, narrow each variable by solving the
        wrap-branch arithmetic over signed intervals (reference:
        algebraic_constraint/solve.rs range-constraint effects; this is
        what pins byte-decomposed immediates like
        `-x0 - 256*x1 - 65536*x2 + 31 = 0` to constants)."""
        infos = {}
        for v, c in e.linear.items():
            rc = self.range_of_var(v)
            infos[v] = None if rc.is_wrapping() else (rc.min, rc.max)
        for v, cv0 in e.linear.items():
            rc_v = self.range_of_var(v)
            if rc_v.is_wrapping():
                continue
            lo = hi = _signed_c(e.constant)
            ok = True
            for u, cu in e.linear.items():
                if u == v:
                    continue
                if infos[u] is None:
                    ok = False
                    break
                cc = _signed_c(cu)
                t0, t1 = cc * infos[u][0], cc * infos[u][1]
                lo += min(t0, t1)
                hi += max(t0, t1)
            if not ok or hi - lo >= P:
                continue
            cv = _signed_c(cv0)
            cmin = min(cv * rc_v.min, cv * rc_v.max)
            cmax = max(cv * rc_v.min, cv * rc_v.max)
            # cv*x = k*P - r with r in [lo, hi] for some integer k
            k_lo = (cmin + lo) // P
            k_hi = (cmax + hi) // P + 1
            if k_hi - k_lo > 8:
                continue
            spans = []
            for k in range(k_lo, k_hi + 1):
                b_lo, b_hi = k * P - hi, k * P - lo
                if cv > 0:
                    x_lo, x_hi = -(-b_lo // cv), b_hi // cv
                else:
                    x_lo, x_hi = -(-b_hi // cv), b_lo // cv
                x_lo = max(x_lo, rc_v.min)
                x_hi = min(x_hi, rc_v.max)
                if x_lo <= x_hi:
                    spans.append((x_lo, x_hi))
            if not spans:
                raise Contradiction(f"affine constraint unsatisfiable for x{v}")
            x_lo = min(s[0] for s in spans)
            x_hi = max(s[1] for s in spans)
            if (x_hi - x_lo + 1) < rc_v.range_size():
                self._update_range(v, RangeConstraint.from_range(x_lo % P, x_hi % P))

    def _try_bit_decomposition(self, e: GroupedExpression) -> bool:
        """sum 2^k_i * x_i = C with disjoint shifted masks -> assignments.

        (constraint_splitter.rs analog, restricted to non-negated
        power-of-two coefficients.)"""
        target = (-e.constant) % P
        items = []
        covered = 0
        for v, coeff in e.linear.items():
            if coeff & (coeff - 1):  # not a power of two
                return False
            rc = self.range_of_var(v)
            if rc.is_wrapping() or rc.mask == FULL_MASK:
                return False
            shifted = rc.mask * coeff
            if shifted >= P or shifted & covered:
                return False
            covered |= shifted
            items.append((v, coeff, rc.mask))
        if target & ~covered:
            return False
        total = 0
        assigns = []
        for v, coeff, mask in items:
            val = (target & (mask * coeff)) // coeff
            if not self.range_of_var(v).allows_value(val):
                return False
            assigns.append((v, val))
            total += val * coeff
        if total != target:
            return False
        for v, val in assigns:
            self._assign(v, val)
        return True

    def _process_quadratic(self, e: GroupedExpression):
        if e.linear or e.constant or len(e.quadratic) != 1:
            self._try_two_root(e)
            return
        l, r = e.quadratic[0]
        # l * r == 0: a factor whose range excludes 0 forces the other to 0
        if not self.range_of(l).allows_value(0):
            self._factor_zero(r)
            return
        if not self.range_of(r).allows_value(0):
            self._factor_zero(l)
            return
        self._try_two_root(e)

    def _factor_zero(self, f: GroupedExpression):
        f = f.normalized()
        if f.is_affine() and len(f.linear) == 1:
            ((v, coeff),) = f.linear.items()
            self._assign(v, (-f.constant) * pow(coeff, P - 2, P) % P)
        elif f.is_affine():
            self._process_affine(f)

    def _try_two_root(self, e: GroupedExpression):
        """Single-variable constraint -> root set -> range.

        Handles the boolean pattern x(x-1)=0 (boolean_extractor.rs), the
        ternary x(x-1)(x-2)=0 keccak flags, and generally any nested
        product of affine/quadratic single-variable factors."""
        vs = e.variables()
        if len(vs) != 1:
            return
        (v,) = vs
        roots = _single_var_roots(e, v)
        if roots is None:
            return
        if not roots:
            raise Contradiction(f"single-variable constraint in x{v} has no roots")
        rc = RangeConstraint.from_value(roots[0])
        for r in roots[1:]:
            rc = rc.disjunction(RangeConstraint.from_value(r))
        self._update_range(v, rc)

    # -- main loop -----------------------------------------------------------

    def solve(self) -> SolveResult:
        while self._queue:
            slot = self._queue.pop()
            self._queued.discard(slot)
            self._process(slot)
        self._finalize_substitutions()
        return self.result

    def _finalize_substitutions(self):
        """Resolve substitution chains against the final assignments; a
        substitution that collapses to a constant becomes an assignment."""
        changed = True
        while changed:
            changed = False
            for v, repl in list(self.result.substitutions.items()):
                r = repl
                for u in list(r.variables()):
                    if u in self.result.assignments:
                        r = r.substitute(u, GroupedExpression.from_const(self.result.assignments[u]))
                    elif u in self.result.substitutions and u != v:
                        r = r.substitute(u, self.result.substitutions[u])
                r = r.normalized()
                if r.key() != repl.key():
                    self.result.substitutions[v] = r
                    changed = True
                c = r.try_to_constant()
                if c is not None:
                    del self.result.substitutions[v]
                    self.result.assignments[v] = c
                    self.result.ranges[v] = RangeConstraint.from_value(c)
                    changed = True


def _poly_coeffs(e: GroupedExpression, v: int, max_deg: int = 8) -> Optional[List[int]]:
    """Coefficients [c0, c1, ...] of e as a polynomial in its single
    variable v, or None if not expressible within max_deg."""
    if e.is_affine():
        return [e.constant, e.linear.get(v, 0)]
    coeffs = [e.constant % P, e.linear.get(v, 0) % P]
    for l, r in e.quadratic:
        lc = _poly_coeffs(l, v, max_deg)
        rc = _poly_coeffs(r, v, max_deg)
        if lc is None or rc is None:
            return None
        if len(lc) + len(rc) - 2 > max_deg:
            return None
        prod = [0] * (len(lc) + len(rc) - 1)
        for i, a in enumerate(lc):
            for j, b in enumerate(rc):
                prod[i + j] = (prod[i + j] + a * b) % P
        while len(coeffs) < len(prod):
            coeffs.append(0)
        for i, c in enumerate(prod):
            coeffs[i] = (coeffs[i] + c) % P
    while len(coeffs) > 1 and coeffs[-1] == 0:
        coeffs.pop()
    return coeffs


def _single_var_roots(e: GroupedExpression, v: int) -> Optional[List[int]]:
    """Roots of a single-variable constraint, when tractable.

    Fast path: products of factors (roots = union).  General path:
    expand to polynomial of degree <= 3 and factor via root search on
    degree <= 2 after trial division is not applicable — degree 1/2 have
    closed forms; degree 3 handled by checking small candidate roots
    {0,1,2,3} then deflating."""
    # product-only form: roots = union of factor roots
    if not e.linear and e.constant == 0 and len(e.quadratic) == 1:
        l, r = e.quadratic[0]

        def factor_roots(f):
            c = f.try_to_constant()
            if c is None:
                return _single_var_roots(f, v)
            return None if c % P == 0 else []

        lr = factor_roots(l)
        rr = factor_roots(r)
        if lr is not None and rr is not None:
            return sorted(set(lr) | set(rr))
    coeffs = _poly_coeffs(e, v, max_deg=3)
    if coeffs is None:
        return None
    deg = len(coeffs) - 1
    if deg <= 0:
        return None
    if deg == 1:
        c0, c1 = coeffs
        return [(-c0) * pow(c1, P - 2, P) % P]
    if deg == 2:
        c0, c1, c2 = coeffs
        disc = (c1 * c1 - 4 * c2 * c0) % P
        s = _sqrt_mod(disc)
        if s is None:
            return []
        inv2a = pow(2 * c2 % P, P - 2, P)
        return sorted({(-c1 + s) * inv2a % P, (-c1 - s) * inv2a % P})
    # degree 3: look for a small root, deflate, solve the quadratic
    for cand in (0, 1, 2, 3, P - 1, P - 2):
        val = 0
        for c in reversed(coeffs):
            val = (val * cand + c) % P
        if val == 0:
            # synthetic division by (v - cand)
            out = []
            acc = 0
            for c in reversed(coeffs):
                acc = (acc * cand + c) % P
                out.append(acc)
            quot = out[:-1]  # coefficients of quotient, highest first
            q = list(reversed(quot))
            rest_roots = _quad_roots_from_coeffs(q)
            if rest_roots is None:
                return None
            return sorted(set([cand] + rest_roots))
    return None


def _quad_roots_from_coeffs(q: List[int]) -> Optional[List[int]]:
    while len(q) > 1 and q[-1] % P == 0:
        q.pop()
    if len(q) == 2:
        return [(-q[0]) * pow(q[1], P - 2, P) % P]
    if len(q) == 3:
        c0, c1, c2 = [c % P for c in q]
        disc = (c1 * c1 - 4 * c2 * c0) % P
        s = _sqrt_mod(disc)
        if s is None:
            return []
        inv2a = pow(2 * c2 % P, P - 2, P)
        return sorted({(-c1 + s) * inv2a % P, (-c1 - s) * inv2a % P})
    return None


def _sqrt_mod(a: int) -> Optional[int]:
    """Tonelli-Shanks for BabyBear (p - 1 = 2^27 * 15)."""
    a %= P
    if a == 0:
        return 0
    if pow(a, (P - 1) // 2, P) != 1:
        return None
    # p-1 = q * 2^s with q = 15, s = 27
    q, s = 15, 27
    z = 31  # generator: a quadratic non-residue
    m, c, t, r = s, pow(z, q, P), pow(a, q, P), pow(a, (q + 1) // 2, P)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % P
            i += 1
        b = pow(c, 1 << (m - i - 1), P)
        m, c = i, b * b % P
        t, r = t * c % P, r * b % P
    return r


def solve_system(
    system: ConstraintSystemGE,
    ranges: Optional[Dict[int, RangeConstraint]] = None,
    derive_substitutions: bool = True,
) -> SolveResult:
    return Solver(system, ranges, derive_substitutions).solve()


# -- linearizer ---------------------------------------------------------------

AUX_BASE = 1 << 28  # linearizer-internal variable ids (never leak)


def linearize_constraints(
    constraints: List[GroupedExpression],
) -> Tuple[List[GroupedExpression], int]:
    """Substitute shared quadratic products by fresh internal variables
    with defining constraints aux = l*r (solver/linearizer.rs:16-35
    counterpart).  Only products occurring >= 2 times (by canonical key)
    are extracted — that is where cross-constraint propagation through
    the affine machinery gains anything.  Returns (new constraint list,
    number of aux variables); aux ids start at AUX_BASE and must be
    filtered from any result handed back to a real system."""
    from collections import Counter

    def pkey(l: GroupedExpression, r: GroupedExpression):
        lk, rk = l.key(), r.key()
        return (lk, rk) if lk <= rk else (rk, lk)

    counts: Counter = Counter()
    for c in constraints:
        for l, r in c.quadratic:
            if l.is_affine() and r.is_affine():
                counts[pkey(l, r)] += 1
    shared = {k for k, n in counts.items() if n >= 2}
    if not shared:
        return list(constraints), 0

    aux_of: Dict = {}
    defs: List[GroupedExpression] = []
    out: List[GroupedExpression] = []
    for c in constraints:
        if not c.quadratic:
            out.append(c)
            continue
        kept = []
        lin = dict(c.linear)
        for l, r in c.quadratic:
            k = pkey(l, r) if l.is_affine() and r.is_affine() else None
            if k in shared:
                if k not in aux_of:
                    aux = AUX_BASE + len(aux_of)
                    aux_of[k] = aux
                    defs.append(
                        GroupedExpression(quadratic=[(l, r)], linear={aux: P - 1})
                    )
                aux = aux_of[k]
                lin[aux] = (lin.get(aux, 0) + 1) % P
            else:
                kept.append((l, r))
        out.append(
            GroupedExpression(quadratic=kept, linear=lin, constant=c.constant)
        )
    return out + defs, len(aux_of)


def solve_system_linearized(
    system: ConstraintSystemGE,
    ranges: Optional[Dict[int, RangeConstraint]] = None,
) -> SolveResult:
    """Solve a linearized COPY of the system and return only deductions
    over the original variables (aux facts are internal).  The input
    system is left untouched — unlike solve_system, whose Solver rewrites
    constraints in place as it substitutes."""
    lin_cons, n_aux = linearize_constraints(system.constraints)
    if n_aux == 0:
        return SolveResult()
    from .constraint_system import BusInteractionGE

    copy = ConstraintSystemGE(
        constraints=lin_cons,
        bus_interactions=[
            BusInteractionGE(id=b.id, mult=b.mult, args=list(b.args))
            for b in system.bus_interactions
        ],
    )
    res = Solver(copy, ranges=dict(ranges or {})).solve()
    out = SolveResult()
    for v, c in res.assignments.items():
        if v < AUX_BASE:
            out.assignments[v] = c
    for v, repl in res.substitutions.items():
        if v < AUX_BASE and all(u < AUX_BASE for u in repl.variables()):
            out.substitutions[v] = repl
    for v, rc in res.ranges.items():
        if v < AUX_BASE:
            out.ranges[v] = rc
    return out
