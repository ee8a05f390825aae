"""Rule-based optimizer: the action semantics of the reference's datalog
rule engine, as direct pattern-matching passes.

The reference encodes these as crepe datalog rules
(/root/reference/constraint-solver/src/rule_based_optimizer/rules.rs:48,
driver.rs:40-46) whose only outputs are five Action kinds: range-constraint
updates, substitute-by-constant, substitute-by-variable, replace-constraint,
and replace-constraint-set.  A datalog engine buys incrementality the Rust
side needs; here each action family is a targeted pass over the
GroupedExpression system — same fixpoint semantics (the outer optimizer
loop re-runs the passes until stats stabilize), far less machinery.

Passes:
  * no_wrap_zero_sum        — rules.rs "NO-WRAP ZERO SUM" (EntailsZeroHeadAndTail)
  * product_range_pass      — rules.rs UpdateRangeConstraintOnVar from
                              `(v - c1) * (v - c2) = 0` product constraints
  * one_hot_pass            — rules.rs "ONE-HOT FLAG" (ExactlyOneSet + coeff count)
  * free_var_combine        — rules.rs "SINGLE-OCCURRENCE VARIABLES"
                              (FreeVariableCombinationCandidate)
  * nonneg_product_combine  — rules.rs "COMBINE CONSTRAINTS WITH NON-NEGATIVE FACTORS"
  * quadratic_equivalence   — rules.rs "QUADRATIC EQUIVALENCE" (exact
                              one-variable-differ form; the interval variant
                              lives in optimizer.twin_square_pass)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

from ..solver.grouped_expression import GroupedExpression as GE, P
from ..solver.range_constraint import RangeConstraint


def _rc_of_expr(e: GE, ranges: Dict[int, RangeConstraint]) -> RangeConstraint:
    from .optimizer import rc_of_expr

    return rc_of_expr(e, ranges)


def _single_product(c: GE) -> Optional[Tuple[GE, GE]]:
    """(l, r) if the constraint is exactly l * r (no affine part)."""
    if not c.linear and c.constant == 0 and len(c.quadratic) == 1:
        return c.quadratic[0]
    return None


def _affine_single_var(e: GE) -> Optional[Tuple[int, int, int]]:
    """(coeff, var, offset) if e = coeff * var + offset."""
    if e.quadratic or len(e.linear) != 1:
        return None
    ((v, c),) = e.linear.items()
    return (c, v, e.constant)


def _apply_assignments(state, assignments: Dict[int, int]) -> bool:
    """Substitute known values through the occurrence index."""
    if not assignments:
        return False
    from ..solver.constraint_system import IndexedSystem

    idx = IndexedSystem(state.system)
    for v, val in assignments.items():
        state.derived.append((v, GE.from_const(val)))
        state.bus_ranges[v] = RangeConstraint.from_value(val)
        idx.substitute(v, GE.from_const(val))
    return True


# ---------------------------------------------------------------------------
# no-wrap zero sum: if `s1 + ... + sk = 0` and every summand is known
# non-negative with the max-sum below the field size, every summand is zero.
# ---------------------------------------------------------------------------


def no_wrap_zero_sum(state) -> None:
    assignments: Dict[int, int] = {}
    new_cons: List[GE] = []
    drop: Set[int] = set()
    for ci, c in enumerate(state.system.constraints):
        if c.constant != 0:
            continue
        if not c.linear and len(c.quadratic) <= 1:
            continue
        total = 0
        parts: List[Tuple[str, object]] = []
        ok = True
        for v, k in c.linear.items():
            rc = state.bus_ranges.get(v, RangeConstraint.default()).multiple(k)
            if rc.is_wrapping() or rc.min != 0 or rc.max >= P - 1:
                ok = False
                break
            total += rc.max
            parts.append(("v", v))
        if ok:
            for l, r in c.quadratic:
                rc = _rc_of_expr(l, state.bus_ranges).combine_product(
                    _rc_of_expr(r, state.bus_ranges)
                )
                if rc.is_wrapping() or rc.min != 0 or rc.max >= P - 1:
                    ok = False
                    break
                total += rc.max
                parts.append(("q", (l, r)))
        if not ok or total >= P - 1 or len(parts) < 2:
            continue
        for kind, item in parts:
            if kind == "v":
                assignments[item] = 0
            else:
                l, r = item
                new_cons.append(GE(quadratic=[(l, r)]))
        drop.add(ci)
    if drop:
        state.system.constraints = [
            c for i, c in enumerate(state.system.constraints) if i not in drop
        ]
    state.system.constraints.extend(new_cons)
    _apply_assignments(state, assignments)


# ---------------------------------------------------------------------------
# product constraints -> value-set range constraints
# ---------------------------------------------------------------------------


def product_range_pass(state) -> None:
    """`(a1*v + b1) * (a2*v + b2) = 0` pins v to one of two values; the
    disjunction refines the range knowledge, a singleton becomes an
    assignment (rules.rs UpdateRangeConstraintOnVar via Solvable pairs)."""
    assignments: Dict[int, int] = {}
    for c in state.system.constraints:
        prod = _single_product(c)
        if prod is None:
            continue
        l, r = prod
        al = _affine_single_var(l)
        ar = _affine_single_var(r)
        if al is None or ar is None or al[1] != ar[1]:
            continue
        v = al[1]
        c1 = -al[2] * pow(al[0], P - 2, P) % P
        c2 = -ar[2] * pow(ar[0], P - 2, P) % P
        rc = RangeConstraint.from_value(c1).disjunction(RangeConstraint.from_value(c2))
        cur = state.bus_ranges.get(v, RangeConstraint.default())
        new = cur.conjunction(rc)
        if new == cur:
            continue
        val = new.try_to_single_value()
        if val is not None:
            assignments[v] = val
        else:
            state.bus_ranges[v] = new
    _apply_assignments(state, assignments)


# ---------------------------------------------------------------------------
# one-hot flags
# ---------------------------------------------------------------------------


def _is_boolean(state, v: int) -> bool:
    rc = state.bus_ranges.get(v)
    return rc is not None and not rc.is_wrapping() and rc.min >= 0 and rc.max <= 1


def one_hot_pass(state) -> None:
    """From `f*(v1 + ... + vn) - f = 0` over boolean vars (exactly one
    set), any other affine constraint over a subset of those booleans
    assigns all its variables (rules.rs "ONE-HOT FLAG")."""
    one_hot_sets: List[Set[int]] = []
    for c in state.system.constraints:
        if c.quadratic or not c.linear:
            continue
        coeffs = set(c.linear.values())
        if len(coeffs) != 1:
            continue
        f = next(iter(coeffs))
        if (f + c.constant) % P != 0:
            continue
        if all(_is_boolean(state, v) for v in c.linear):
            one_hot_sets.append(set(c.linear))
    if not one_hot_sets:
        return
    assignments: Dict[int, int] = {}
    for c in state.system.constraints:
        if c.quadratic or not c.linear:
            continue
        vars_c = set(c.linear)
        if not any(vars_c <= s for s in one_hot_sets):
            continue
        if not all(_is_boolean(state, v) for v in vars_c):
            continue
        f = (-c.constant) % P
        with_f = [v for v, k in c.linear.items() if k == f]
        if f != 0 and len(with_f) > 1:
            continue  # ambiguous: can't tell which flag is set
        v2 = with_f[0] if (f != 0 and len(with_f) == 1) else None
        for v in vars_c:
            assignments[v] = 1 if v == v2 else 0
    _apply_assignments(state, assignments)


# ---------------------------------------------------------------------------
# single-occurrence variable combination (diff_inv markers)
# ---------------------------------------------------------------------------


def _single_occurrence_info(state):
    """var -> slot list over constraints and bus interactions."""
    occ: Dict[int, List[Tuple[str, int]]] = {}
    for i, c in enumerate(state.system.constraints):
        for v in c.variables():
            occ.setdefault(v, []).append(("c", i))
    for i, b in enumerate(state.system.bus_interactions):
        vs: Set[int] = set()
        for e in b.exprs():
            vs |= e.variables()
        for v in vs:
            occ.setdefault(v, []).append(("b", i))
    return occ


def _linear_occurrences_in(c: GE, v: int) -> List[Tuple[int, int, GE]]:
    """Occurrences of v as `x * (coeff * v)` quadratic summands:
    (pair_index, coeff, cofactor)."""
    out = []
    for qi, (l, r) in enumerate(c.quadratic):
        for fac, other in ((l, r), (r, l)):
            a = _affine_single_var(fac)
            if a is not None and a[1] == v and a[2] == 0 and v not in other.variables():
                out.append((qi, a[0], other))
    return out


def new_var(state, prefix: str) -> int:
    vid = max(list(state.names) + list(state.system.variables()) + [0]) + 1
    state.names[vid] = f"{prefix}_{vid}"
    return vid


def free_var_combine(state, degree_bound=None) -> None:
    """Combine two variables that occur only once, in the same constraint,
    each as a linear factor of a product summand, into one fresh free
    variable (rules.rs "SINGLE-OCCURRENCE VARIABLES"):

        c1*v1*x1 + c2*v2*x2 + r = 0,  x1 >= 0, x2 >= 0 (squared if needed),
        c1*rc(x1) + c2*rc(x2) bounded below the field size
        =>  r + v3 * (c1*x1 + c2*x2) = 0,   v3 = QuotientOrZero(-r, factor)

    The only unsatisfiable combination of the original was x1 = x2 = 0 with
    r != 0, which the replacement preserves; each application removes one
    variable, and the fixpoint collapses chains of diff_inv markers."""
    occ = _single_occurrence_info(state)
    single: Set[int] = {v for v, slots in occ.items() if len(slots) == 1 and slots[0][0] == "c"}
    if not single:
        return
    replacements: List[Tuple[int, GE]] = []
    for ci, c in enumerate(state.system.constraints):
        cvars = c.variables() & single
        cands = []
        for v in cvars:
            hits = _linear_occurrences_in(c, v)
            if len(hits) == 1:
                cands.append((v, *hits[0]))
        if len(cands) < 2:
            continue
        cands.sort(key=lambda t: t[0], reverse=True)
        (v1, q1, coeff1, x1), (v2, q2, coeff2, x2) = cands[0], cands[1]
        if q1 == q2:
            continue

        def square_if_needed(x: GE):
            rc = _rc_of_expr(x, state.bus_ranges)
            if not rc.is_wrapping() and rc.min == 0:
                return x, rc
            return x * x, rc.combine_product(rc)

        x1s, rc1 = square_if_needed(x1)
        x2s, rc2 = square_if_needed(x2)
        if rc1.is_wrapping() or rc2.is_wrapping() or rc1.min != 0 or rc2.min != 0:
            continue
        sum_rc = rc1.multiple(coeff1).combine_sum(rc2.multiple(coeff2))
        if sum_rc.is_wrapping() or sum_rc.min != 0 or sum_rc.max >= P - 1:
            continue
        r = GE(
            quadratic=[q for qi, q in enumerate(c.quadratic) if qi not in (q1, q2)],
            linear=dict(c.linear),
            constant=c.constant,
        )
        factor = x1s.scale(coeff1) + x2s.scale(coeff2)
        v3 = new_var(state, "free_var")
        replacement = (r + GE.from_var(v3) * factor).normalized()
        limit = degree_bound.identities if degree_bound is not None else c.degree()
        if replacement.degree() > limit:
            del state.names[v3]
            continue
        state.derived_quot.append((v3, (-r).normalized(), factor.normalized()))
        # v1/v2 keep their dummy-trace witgen values; placeholders recorded
        state.derived.append((v1, GE.from_const(0)))
        state.derived.append((v2, GE.from_const(0)))
        replacements.append((ci, replacement))
    for ci, repl in replacements:
        state.system.constraints[ci] = repl


# ---------------------------------------------------------------------------
# combine product constraints with a shared factor
# ---------------------------------------------------------------------------


def nonneg_product_combine(state) -> None:
    """`x * a = 0` and `x * b = 0` with a, b >= 0 and a + b bounded
    becomes `x * (a + b) = 0` (rules.rs "COMBINE CONSTRAINTS WITH
    NON-NEGATIVE FACTORS")."""
    by_factor: Dict[tuple, List[Tuple[int, GE, GE]]] = {}
    for ci, c in enumerate(state.system.constraints):
        prod = _single_product(c)
        if prod is None:
            continue
        l, r = prod
        by_factor.setdefault(l.key(), []).append((ci, l, r))
        if r.key() != l.key():
            by_factor.setdefault(r.key(), []).append((ci, r, l))
    drop: Set[int] = set()
    new_cons: List[GE] = []
    for group in by_factor.values():
        group = [(ci, x, a) for ci, x, a in group if ci not in drop]
        if len(group) < 2:
            continue
        x = group[0][1]
        acc: Optional[GE] = None
        acc_rc = RangeConstraint.from_value(0)
        members: List[int] = []
        for ci, _, a in group:
            rc = _rc_of_expr(a, state.bus_ranges)
            if rc.is_wrapping() or rc.min != 0:
                continue
            nrc = acc_rc.combine_sum(rc)
            if nrc.is_unconstrained():
                continue
            acc = a if acc is None else acc + a
            acc_rc = nrc
            members.append(ci)
        if len(members) < 2:
            continue
        drop |= set(members)
        new_cons.append((x * acc).normalized())
    if drop:
        state.system.constraints = [
            c for i, c in enumerate(state.system.constraints) if i not in drop
        ]
        state.system.constraints.extend(new_cons)


# ---------------------------------------------------------------------------
# quadratic equivalence (exact one-variable-differ form)
# ---------------------------------------------------------------------------


def _affinely_related(l: GE, r: GE) -> Optional[Tuple[int, int]]:
    """(f, c) with l = f * r + c, for affine l, r sharing the same
    variable set (rules.rs AffinelyRelated)."""
    if l.quadratic or r.quadratic or set(l.linear) != set(r.linear) or not r.linear:
        return None
    f = None
    for v, cr in r.linear.items():
        cl = l.linear[v]
        fv = cl * pow(cr, P - 2, P) % P
        if f is None:
            f = fv
        elif f != fv:
            return None
    c = (l.constant - f * r.constant) % P
    return (f, c)


def quadratic_equivalence(state) -> None:
    """Two constraints `e1*(e1+d) = 0` and `e2*(e2+d') = 0` where e1 equals
    factor*e2 with exactly one variable v1 swapped for v2 (and d = d'*factor)
    force v1 = v2 when their shared range constraint is disjoint from its
    shift by d/coeff (rules.rs QuadraticEquivalence; see also tests.rs
    add_with_carry).  The larger variable is substituted by the smaller."""
    cands: List[Tuple[GE, int]] = []  # (expr, delta/coeff-normalizable offset)
    for c in state.system.constraints:
        prod = _single_product(c)
        if prod is None:
            continue
        l, r = prod
        for a, b in ((l, r), (r, l)):
            rel = _affinely_related(a, b)
            if rel is None or len(b.linear) < 2:
                continue
            f, off = rel
            delta = off * pow(f, P - 2, P) % P
            cands.append((b, delta))
    subs: Dict[int, int] = {}
    # index: dropping each variable from a candidate's var set keys the
    # candidates that could differ from it in exactly that variable
    by_rest: Dict[frozenset, List[Tuple[GE, int, int]]] = {}
    for e, d in cands:
        vs = frozenset(e.linear)
        for v in vs:
            by_rest.setdefault(vs - {v}, []).append((e, d, v))
    for group in by_rest.values():
        if len(group) < 2:
            continue
        for i in range(len(group)):
            for j in range(i + 1, len(group)):
                e1, d1, v1 = group[i]
                e2, d2, v2 = group[j]
                if v1 == v2 or e1 is e2:
                    continue
                # expr1 = factor * expr2 with v2 replaced by v1?
                factor = e1.linear[v1] * pow(e2.linear[v2], P - 2, P) % P
                if any(
                    e1.linear[u] != factor * e2.linear[u] % P
                    for u in e1.linear
                    if u != v1
                ):
                    continue
                if e1.constant != factor * e2.constant % P or d1 != factor * d2 % P:
                    continue
                coeff = e1.linear[v1]
                offset = d1 * pow(coeff, P - 2, P) % P
                rc1 = state.bus_ranges.get(v1)
                rc2 = state.bus_ranges.get(v2)
                if rc1 is None or rc1 != rc2 or rc1.is_wrapping():
                    continue
                shifted = rc1.offset(offset)
                if shifted.is_wrapping():
                    continue
                if shifted.min > rc1.max or shifted.max < rc1.min:
                    hi, lo = (max(v1, v2), min(v1, v2))
                    subs.setdefault(hi, lo)
    if subs:
        from ..solver.constraint_system import IndexedSystem

        idx = IndexedSystem(state.system)
        for hi, lo in subs.items():
            lo_final = lo
            while lo_final in subs:
                lo_final = subs[lo_final]
            state.derived.append((hi, GE.from_var(lo_final)))
            idx.substitute(hi, GE.from_var(lo_final))


def factor_exclusion_pass(state, bus_map=None) -> None:
    """For a product constraint `l * r = 0`, if signed-interval analysis
    over the known ranges proves one factor cannot be zero, the other
    factor must be (reference: the BaseSolver's quadratic analysis over
    range constraints; this is what resolves the two-case immediate
    decompositions `(C - imm) * (C - imm - 2^16 stuff) = 0` to C = imm
    when C is a byte-limb composition)."""
    from .optimizer import affine_value_excluded, collect_scaled_checks

    scaled = collect_scaled_checks(state, bus_map) if bus_map is not None else {}
    new_cons: List[GE] = []
    drop: Set[int] = set()
    for ci, c in enumerate(state.system.constraints):
        prod = _single_product(c)
        if prod is None:
            continue
        l, r = prod
        if l.is_affine() and affine_value_excluded(l, (0,), state.bus_ranges, scaled):
            new_cons.append(r.normalized())
            drop.add(ci)
        elif r.is_affine() and affine_value_excluded(r, (0,), state.bus_ranges, scaled):
            new_cons.append(l.normalized())
            drop.add(ci)
    if drop:
        state.system.constraints = [
            c for i, c in enumerate(state.system.constraints) if i not in drop
        ]
        state.system.constraints.extend(new_cons)


def rule_based_pass(state, bus_map=None, degree_bound=None) -> None:
    """Driver: run all action families once (the outer optimizer loop
    provides the fixpoint, mirroring driver.rs:68-246)."""
    product_range_pass(state)
    factor_exclusion_pass(state, bus_map)
    no_wrap_zero_sum(state)
    one_hot_pass(state)
    quadratic_equivalence(state)
    nonneg_product_combine(state)
    free_var_combine(state, degree_bound)
