"""Autoprecompile optimizer pipeline.

Counterpart of the reference's optimizer stack
(/root/reference/autoprecompiles/src/optimizer.rs:34 `optimize` and
constraint_optimizer.rs:50 `optimize_constraints`): a loop of passes over
the constraint system until the stats reach a fixpoint:

  * solver pass — constant propagation, equivalence substitution, range
    refinement (the BaseSolver fixpoint, solver/base.rs:24)
  * trivial-constraint removal
  * free-variable elimination (vars in a single constraint and no bus
    interaction)
  * disconnected-component removal (reachability from bus interactions,
    reachability.rs:13)
  * affine inlining under a degree/size budget (inliner.rs:13-31)
  * bus-interaction cancellation (same bus + syntactically equal args ->
    summed multiplicities; zero-mult interactions dropped) — subsumes the
    exec-bus send/receive collapsing (optimizer.rs:199-249) and the
    syntactic half of the memory optimizer (memory_optimizer.rs:16)

Every eliminated variable is recorded as a derived column so witness
generation can recompute it (trace_handler parity)."""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from ..ir import expression as ir
from ..solver.constraint_system import BusInteractionGE, ConstraintSystemGE
from ..solver.grouped_expression import GroupedExpression as GE, P, from_expr, to_expr
from ..solver.range_constraint import RangeConstraint
from ..solver.solver import Contradiction, Solver
from .symbolic_machine import DerivedColumn, SymbolicBusInteraction, SymbolicMachine


@dataclass
class DegreeBound:
    """Reference: identities = 2*log_blowup+1, bus interactions one less
    (openvm/src/lib.rs:97-101)."""

    identities: int = 5
    bus_interactions: int = 4


@dataclass
class OptimizerState:
    system: ConstraintSystemGE
    names: Dict[int, str]
    derived: List[Tuple[int, GE]] = field(default_factory=list)  # (var, defining expr)
    #: fresh vars with QuotientOrZero witgen semantics: (var, num, den),
    #: value = num/den when den != 0 else 0 (reference ComputationMethod)
    derived_quot: List[Tuple[int, GE, GE]] = field(default_factory=list)
    bus_ranges: Dict[int, RangeConstraint] = field(default_factory=dict)

    def stats(self) -> Tuple[int, int, int]:
        return (
            len(self.system.constraints),
            len(self.system.bus_interactions),
            len(self.system.variables()),
        )


def machine_to_system(m: SymbolicMachine) -> Tuple[ConstraintSystemGE, Dict[int, str]]:
    names = m.variables()
    sys = ConstraintSystemGE(
        constraints=[from_expr(c).normalized() for c in m.constraints],
        bus_interactions=[
            BusInteractionGE(
                id=b.id,
                mult=from_expr(b.mult).normalized(),
                args=[from_expr(a).normalized() for a in b.args],
            )
            for b in m.bus_interactions
        ],
    )
    return sys, names


def system_to_machine(
    state: OptimizerState, prior_derived: Optional[List[DerivedColumn]] = None
) -> SymbolicMachine:
    names = state.names
    constraints = [to_expr(c, names) for c in state.system.constraints]
    bus = [
        SymbolicBusInteraction(
            id=b.id, mult=to_expr(b.mult, names), args=[to_expr(a, names) for a in b.args]
        )
        for b in state.system.bus_interactions
    ]
    derived = list(prior_derived or [])
    for v, e in state.derived:
        derived.append(
            DerivedColumn(var=ir.Var(name=names.get(v, f"x{v}"), id=v), expr=to_expr(e, names))
        )
    for v, num, den in state.derived_quot:
        derived.append(
            DerivedColumn(
                var=ir.Var(name=names.get(v, f"x{v}"), id=v),
                expr=to_expr(num, names),
                den=to_expr(den, names),
            )
        )
    return SymbolicMachine(constraints=constraints, bus_interactions=bus, derived_columns=derived)


# -- individual passes --------------------------------------------------------


def solver_pass(state: OptimizerState) -> None:
    solver = Solver(state.system, ranges=dict(state.bus_ranges))
    result = solver.solve()
    for v, c in result.assignments.items():
        state.derived.append((v, GE.from_const(c)))
    for v, repl in result.substitutions.items():
        state.derived.append((v, repl))
    state.bus_ranges.update(
        {v: rc for v, rc in result.ranges.items() if v not in result.assignments}
    )


def linearizer_pass(state: OptimizerState) -> None:
    """Solve a linearized copy (shared quadratic products as internal
    variables, solver/linearizer.rs analog) and apply the original-variable
    deductions: catches cross-constraint facts the direct quadratic
    analysis misses."""
    from ..solver.solver import solve_system_linearized
    from ..solver.constraint_system import IndexedSystem

    result = solve_system_linearized(state.system, ranges=state.bus_ranges)
    if not (result.assignments or result.substitutions or result.ranges):
        return
    idx = IndexedSystem(state.system)
    for v, c in result.assignments.items():
        state.derived.append((v, GE.from_const(c)))
        idx.substitute(v, GE.from_const(c))
    for v, repl in result.substitutions.items():
        if v in result.assignments:
            continue
        state.derived.append((v, repl))
        idx.substitute(v, repl)
    for v, rc in result.ranges.items():
        if v in result.assignments:
            continue
        cur = state.bus_ranges.get(v, RangeConstraint.default())
        state.bus_ranges[v] = cur.conjunction(rc)


def remove_trivial(state: OptimizerState) -> None:
    """Drop zero constraints and exact duplicates (same canonical key)."""
    seen = set()
    out = []
    for c in (c.normalized() for c in state.system.constraints):
        if c.is_zero():
            continue
        k = c.key()
        if k in seen:
            continue
        seen.add(k)
        out.append(c)
    state.system.constraints = out


def _occurrence_counts(system: ConstraintSystemGE):
    counts: Dict[int, int] = {}
    bus_vars: Set[int] = set()
    for c in system.constraints:
        for v in c.variables():
            counts[v] = counts.get(v, 0) + 1
    for b in system.bus_interactions:
        for e in b.exprs():
            bus_vars |= e.variables()
    return counts, bus_vars


STATEFUL_BUSES = {"ExecutionBridge", "Memory"}


def _satisfiable_via_free_var(c: GE, v: int) -> bool:
    """True if the constraint can always be satisfied by choosing v,
    regardless of the other variables (constraint_optimizer.rs
    `can_always_be_satisfied_via_free_variable`)."""
    if c.solve_for(v) is not None:
        return True
    if not c.linear and c.constant == 0 and len(c.quadratic) == 1:
        l, r = c.quadratic[0]
        return _satisfiable_via_free_var(l, v) or _satisfiable_via_free_var(r, v)
    return False


def remove_free_vars(state: OptimizerState, bus_map=None) -> None:
    """Free-variable elimination (constraint_optimizer.rs:286-344):

    * a var referenced by exactly one algebraic constraint (and nothing
      else) makes that constraint satisfiable by choice -> drop both;
    * a var referenced by exactly one *stateless* bus interaction (pc
      lookup, range/bitwise/tuple checker) whose payload has exactly one
      unknown field, linear in the var -> the prover can always satisfy
      the lookup -> drop the interaction.  This is what ultimately removes
      every pc lookup (their operands become constants)."""
    stateless_ids = set()
    if bus_map is not None:
        for bid, btype in bus_map.bus_ids.items():
            name = btype if isinstance(btype, str) else btype[0]
            if name not in STATEFUL_BUSES:
                stateless_ids.add(bid)
    changed = True
    while changed:
        changed = False
        # occurrence slots: var -> list of ('c', idx) / ('b', idx)
        occ: Dict[int, List[Tuple[str, int]]] = {}
        for i, c in enumerate(state.system.constraints):
            for v in c.variables():
                occ.setdefault(v, []).append(("c", i))
        for i, b in enumerate(state.system.bus_interactions):
            vs = set()
            for e in b.exprs():
                vs |= e.variables()
            for v in vs:
                occ.setdefault(v, []).append(("b", i))
        drop_c: set = set()
        drop_b: set = set()
        for v, slots in occ.items():
            if len(slots) != 1:
                continue
            kind, i = slots[0]
            if kind == "c" and i not in drop_c:
                c = state.system.constraints[i]
                repl = c.solve_for(v)
                if repl is None and _satisfiable_via_free_var(c, v):
                    # product form: one factor can be zeroed by choosing v
                    # (constraint_optimizer.rs can_always_be_satisfied_via_
                    # free_variable recursing into single products)
                    repl = GE.from_const(0)
                if repl is not None:
                    state.derived.append((v, repl))
                    drop_c.add(i)
                    changed = True
                elif c.variables() == {v}:
                    # single-variable constraint on an otherwise-unused var:
                    # satisfiable by picking any root (e.g. boolean/ternary
                    # checks on dead witness bits)
                    from ..solver.solver import _single_var_roots

                    roots = _single_var_roots(c.normalized(), v)
                    if roots:
                        state.derived.append((v, GE.from_const(roots[0])))
                        drop_c.add(i)
                        changed = True
            elif kind == "b" and i not in drop_b:
                b = state.system.bus_interactions[i]
                if b.id not in stateless_ids:
                    continue
                if v in b.mult.variables():
                    continue
                unknown_fields = [a for a in b.args if a.try_to_constant() is None]
                if len(unknown_fields) != 1:
                    continue
                # linear in v (affine payload suffices)
                if not unknown_fields[0].is_affine():
                    continue
                # witgen note: v keeps its original gathered value; only a
                # placeholder derived entry is recorded for the freed var
                state.derived.append((v, GE.from_const(0)))
                drop_b.add(i)
                changed = True
        if drop_c:
            state.system.constraints = [
                c for i, c in enumerate(state.system.constraints) if i not in drop_c
            ]
        if drop_b:
            state.system.bus_interactions = [
                b for i, b in enumerate(state.system.bus_interactions) if i not in drop_b
            ]


def remove_lookup_residues(state: OptimizerState, bus_map) -> None:
    """Remove vars whose ONLY occurrences are unguarded range checks on
    single-variable affine payloads, when the checks are jointly
    satisfiable (a value for the var exists).

    This is the tail of a timestamp less-than proof after memory pair
    cancellation (memory_optimizer.rs + range_constraint_optimizer.rs in
    the reference): the diff is constant, leaving `C - 2^17*hi in
    [0,2^17)` and `hi in [0,2^12)` over an otherwise-unused hi — both
    checks and the column disappear, with the witness value recorded as
    a derived column."""
    import numpy as np

    range_ids = {
        bid for bid, t in (bus_map.bus_ids.items() if bus_map else [])
        if t == "VariableRangeChecker"
    }
    if not range_ids:
        return
    # var -> list of (slot, a, b, bits) | None if disqualified
    cand: Dict[int, Optional[List[Tuple[int, int, int, int]]]] = {}
    for c in state.system.constraints:
        for v in c.variables():
            cand[v] = None
    for i, b in enumerate(state.system.bus_interactions):
        vs = set()
        for e in b.exprs():
            vs |= e.variables()
        ok = (
            b.id in range_ids
            and len(b.args) == 2
            and b.mult.try_to_constant() == 1
            and b.args[0].is_affine()
            and len(b.args[0].linear) == 1
            and b.args[1].try_to_constant() is not None
        )
        if ok:
            ((v, a),) = b.args[0].linear.items()
            bits = b.args[1].try_to_constant()
            if bits > 20:
                ok = False
            else:
                for u in vs:
                    if u != v:
                        cand[u] = None
                if cand.get(v, []) is not None:
                    cand.setdefault(v, []).append((i, a, b.args[0].constant, bits))
                continue
        if not ok:
            for u in vs:
                cand[u] = None
    drop: Set[int] = set()
    for v, checks in cand.items():
        if not checks:
            continue
        # enumerate the smallest check's solution set, filter by the rest
        checks = sorted(checks, key=lambda t: t[3])
        _, a0, b0, bits0 = checks[0]
        if bits0 > 14:
            continue
        inv_a0 = pow(a0, P - 2, P)
        xs = np.arange(1 << bits0, dtype=np.int64)
        vs_ = (xs - b0) % P * inv_a0 % P
        ok_mask = np.ones(vs_.shape, dtype=bool)
        for _, a, b_, bits in checks[1:]:
            ok_mask &= ((vs_ * a + b_) % P) < (1 << bits)
        idx = np.nonzero(ok_mask)[0]
        if idx.size == 0:
            continue  # unsatisfiable residue: leave for the solver to flag
        state.derived.append((v, GE.from_const(int(vs_[idx[0]]))))
        drop |= {slot for slot, *_ in checks}
    if drop:
        state.system.bus_interactions = [
            b for i, b in enumerate(state.system.bus_interactions) if i not in drop
        ]


def _stateful_ids(state: OptimizerState, bus_map) -> Optional[Set[int]]:
    """Bus ids of stateful buses (memory / execution bridge) — the only
    channels through which the circuit interacts with the rest of the
    zkVM (constraint_optimizer.rs `IsBusStateful`)."""
    if bus_map is None:
        return None
    out = set()
    for bid, btype in bus_map.bus_ids.items():
        name = btype if isinstance(btype, str) else btype[0]
        if name in STATEFUL_BUSES:
            out.add(bid)
    return out


def remove_disconnected(state: OptimizerState, bus_map=None) -> None:
    """Drop columns not reachable from any *stateful* bus interaction
    (memory/exec bridge), plus the constraints and stateless interactions
    that reference them (constraint_optimizer.rs
    `remove_disconnected_columns`: assuming the system is satisfiable, the
    prover can always satisfy components disconnected from the rest of the
    zkVM, so removing them is safe).  Reachability propagates through both
    algebraic constraints and bus interactions (reachability.rs)."""
    stateful = _stateful_ids(state, bus_map)
    con_vars = [c.variables() for c in state.system.constraints]
    bus_vars_per = []
    reach: Set[int] = set()
    for b in state.system.bus_interactions:
        vs = set()
        for e in b.exprs():
            vs |= e.variables()
        bus_vars_per.append(vs)
        if stateful is None or b.id in stateful:
            reach |= vs
    changed = True
    while changed:
        changed = False
        for vs in con_vars:
            if vs & reach and not vs <= reach:
                reach |= vs
                changed = True
        for vs in bus_vars_per:
            if vs & reach and not vs <= reach:
                reach |= vs
                changed = True
    keep_c = []
    for c, vs in zip(state.system.constraints, con_vars):
        if vs and not vs & reach:
            # dead component: witgen keeps the dummy-trace values, the
            # columns just stop being committed
            for v in sorted(vs):
                state.derived.append((v, GE.from_const(0)))
            continue
        keep_c.append(c)
    state.system.constraints = keep_c
    keep_b = []
    for b, vs in zip(state.system.bus_interactions, bus_vars_per):
        if stateful is not None and b.id not in stateful and vs and not vs & reach:
            continue
        keep_b.append(b)
    state.system.bus_interactions = keep_b


def _virtual_degree(e: GE, v: int, rdeg: int) -> int:
    """Degree of e if v were replaced by an expression of degree rdeg
    (inliner.rs `expression_degree_with_virtual_substitution`)."""
    d = 0
    if e.linear:
        d = rdeg if v in e.linear else 1
    for l, r in e.quadratic:
        d = max(d, _virtual_degree(l, v, rdeg) + _virtual_degree(r, v, rdeg))
    return d


def inline_below_degree_bound(state: OptimizerState, bound: DegreeBound) -> None:
    """Inline every witness column that appears linearly in some algebraic
    constraint, as long as no constraint exceeds `bound.identities` and no
    bus-interaction field exceeds `bound.bus_interactions` after the
    substitution (inliner.rs `replace_constrained_witness_columns` +
    `inline_everything_below_degree_bound`: no term-count heuristics —
    the degree bound is the only limit)."""
    from ..solver.constraint_system import IndexedSystem

    idx_sys = IndexedSystem(state.system)
    removed: Set[int] = set()
    n = len(state.system.constraints)
    while True:
        progress = False
        for ci in range(n - 1, -1, -1):
            if ci in removed:
                continue
            c = state.system.constraints[ci]
            for v in sorted(c.linear, reverse=True):
                repl = c.solve_for(v)
                if repl is None:
                    continue
                rdeg = repl.degree()
                ok = True
                for slot in idx_sys.occurrences(v):
                    limit = bound.identities if slot[0] == "c" else bound.bus_interactions
                    if _virtual_degree(idx_sys.get(slot), v, rdeg) > limit:
                        ok = False
                        break
                if not ok:
                    continue
                idx_sys.substitute(v, repl)
                removed.add(ci)
                state.derived.append((v, repl))
                progress = True
                break
        if not progress:
            break
    state.system.constraints = [
        c for i, c in enumerate(state.system.constraints) if i not in removed and not c.normalized().is_zero()
    ]


def rc_of_expr(e: GE, ranges: Dict[int, RangeConstraint]) -> RangeConstraint:
    """Range constraint of an expression from its variables' ranges
    (validity-preserving over-approximation)."""
    acc = RangeConstraint.from_value(e.constant)
    for v, c in e.linear.items():
        acc = acc.combine_sum(ranges.get(v, RangeConstraint.default()).multiple(c))
        if acc.is_unconstrained():
            return acc
    for l, r in e.quadratic:
        acc = acc.combine_sum(rc_of_expr(l, ranges).combine_product(rc_of_expr(r, ranges)))
        if acc.is_unconstrained():
            return acc
    return acc


def substitute_bus_fields(state: OptimizerState) -> None:
    """Replace bus-interaction fields the range knowledge pins to a single
    value by that constant, adding an asserting algebraic constraint for
    soundness (constraint_optimizer.rs `substitute_bus_interaction_fields`;
    the assert is usually optimized away by later passes)."""
    new_cons: List[GE] = []
    for b in state.system.bus_interactions:
        for j, f in enumerate(b.exprs()):
            if f.try_to_constant() is not None:
                continue
            if f.is_affine() and len(f.linear) <= 1:
                continue  # solver would already know the variable itself
            val = rc_of_expr(f, state.bus_ranges).try_to_single_value()
            if val is None:
                continue
            new_cons.append((f - GE.from_const(val)).normalized())
            if j == 0:
                b.mult = GE.from_const(val)
            else:
                b.args[j - 1] = GE.from_const(val)
    state.system.constraints.extend(new_cons)


def exhaustive_search_pass(state: OptimizerState, bus_map=None) -> None:
    """Enumerate small-range variable groups; apply the resulting
    assignments, substitutions and range refinements
    (exhaustive_search.rs analog).  Range/byte-check facts participate
    as membership predicates."""
    from ..solver.constraint_system import IndexedSystem
    from ..solver.exhaustive import exhaustive_pass

    facts = collect_range_facts(state, bus_map) if bus_map is not None else []
    facts = [(e, M) for e, M in facts if e.linear and len(e.linear) <= 12]
    if not hasattr(state, "_exhaustive_cache"):
        state._exhaustive_cache = {}
    agg = exhaustive_pass(
        state.system, state.bus_ranges, facts=facts, cache=state._exhaustive_cache
    )
    if agg.get("contradiction"):
        raise RuntimeError("exhaustive search found an unsatisfiable group")
    if not (agg["assign"] or agg["subs"] or agg["ranges"]):
        return
    idx_sys = IndexedSystem(state.system)
    for v, val in agg["assign"].items():
        state.derived.append((v, GE.from_const(val)))
        idx_sys.substitute(v, GE.from_const(val))
    for vb, (va, s, t) in agg["subs"].items():
        if vb in agg["assign"] or va in agg["assign"]:
            continue
        repl = GE.from_var(va).scale(s) + GE.from_const(t)
        state.derived.append((vb, repl))
        idx_sys.substitute(vb, repl)
    for v, rc in agg["ranges"].items():
        if v in agg["assign"] or v in agg["subs"]:
            continue
        cur = state.bus_ranges.get(v, RangeConstraint.default())
        state.bus_ranges[v] = cur.conjunction(rc)
    remove_trivial(state)


#: max enumerated input-domain size for the hypothesis engine
#: (low_degree_bus_interaction_optimizer.rs:314 MAX_DOMAIN_SIZE)
MAX_DOMAIN_SIZE = 256

#: well-known low-degree functions tested against the lookup's graph
#: (low_degree_bus_interaction_optimizer.rs `hypotheses`)
_HYPOTHESES_2 = [
    ("first", lambda x, y: x),
    ("sum", lambda x, y: x + y),
    ("and", lambda x, y: x * y),
    ("or", lambda x, y: x + y - x * y),
    ("xor", lambda x, y: x + y - (x * y).scale(2)),
]


def _try_bitwise_low_degree(
    b, ranges: Dict[int, RangeConstraint], bound: DegreeBound
) -> "Optional[Tuple[List[GE], List[Tuple[GE, int]]]]":
    """General hypothesis engine for the bitwise-xor lookup (x, y, z, 1):
    pick two fields as inputs, enumerate their (small) joint domain,
    derive the third from z = x ^ y, and test the hypothesis table; a
    surviving hypothesis replaces the lookup by an algebraic constraint
    plus plain range checks on the inputs
    (low_degree_bus_interaction_optimizer.rs:96-150).  Returns
    (constraints, [(expr, bits)] input range checks) or None."""
    if len(b.args) != 4 or b.args[3].try_to_constant() != 1:
        return None
    fields = b.args[:3]
    rcs = [rc_of_expr(f, ranges) for f in fields]
    # the emitted range checks must EXACTLY cover the enumerated domain
    # (a wider check would accept inputs the hypothesis was never tested
    # on — the reference's batch_make_range_constraints soundness note),
    # so only exact [0, 2^k) domains qualify
    sizes = []
    for rc in rcs:
        bits = _pow2_mask_bits(rc)
        if bits is None or (1 << bits) > MAX_DOMAIN_SIZE:
            sizes.append(None)
        else:
            sizes.append(list(range(1 << bits)))
    # input pairs among (x, y, z); the remaining field is the output,
    # derived via xor semantics (x^y=z <=> x^z=y <=> y^z=x)
    for i, j in ((0, 1), (0, 2), (1, 2)):
        vi, vj = sizes[i], sizes[j]
        if vi is None or vj is None or len(vi) * len(vj) > MAX_DOMAIN_SIZE:
            continue
        k = 3 - i - j
        surviving = list(_HYPOTHESES_2)
        ok = True
        for a in vi:
            for c in vj:
                if i == 0 and j == 1:
                    out = a ^ c
                elif i == 0 and j == 2:
                    out = a ^ c  # y = x ^ z
                else:
                    out = a ^ c  # x = y ^ z
                surviving = [
                    (n, f) for n, f in surviving
                    if (f(GE.from_const(a), GE.from_const(c)).normalized()
                        - GE.from_const(out)).normalized().try_to_constant() == 0
                ]
                if not surviving:
                    ok = False
                    break
            if not ok:
                break
        if not surviving:
            continue
        _, f = surviving[0]
        con = (fields[k] - f(fields[i], fields[j])).normalized()
        mult_c = b.mult.try_to_constant()
        if mult_c != 1:
            if (b.mult.degree() + con.degree()) > bound.identities:
                continue
            con = (b.mult * con).normalized()
        if con.degree() > bound.identities:
            continue
        checks = []
        for idx in (i, j):
            bits = (len(sizes[idx]) - 1).bit_length()
            checks.append((fields[idx], bits))
        return ([con] if con.try_to_constant() != 0 else []), checks
    return None


def low_degree_bus_opt(state: OptimizerState, bus_map, bound: DegreeBound) -> None:
    """Replace stateless lookups by low-degree algebraic constraints
    (low_degree_bus_interaction_optimizer.rs:19-31):

    * a range check (x, bits) with 2^bits + deg(mult) + deg(x) <= bound
      becomes mult * x * (x-1) * ... * (x-2^bits+1) = 0;
    * a bitwise-xor lookup whose input domain is small (<= 256 joint
      values) is matched against the hypothesis table (identity, sum,
      bit-AND/OR/XOR); a surviving hypothesis replaces the lookup with
      the algebraic function plus input range checks (which the range
      optimizer then minimizes)."""
    keep = []
    bw_id = None
    for bid, btype in (bus_map.bus_ids.items() if bus_map else []):
        name = btype if isinstance(btype, str) else btype[0]
        if name == "BitwiseLookup":
            bw_id = bid
    vrc_id = None
    for bid, btype in (bus_map.bus_ids.items() if bus_map else []):
        if btype == "VariableRangeChecker":
            vrc_id = bid
    for b in state.system.bus_interactions:
        btype = bus_map.bus_ids.get(b.id) if bus_map else None
        if btype == "VariableRangeChecker" and len(b.args) == 2:
            bits = b.args[1].try_to_constant()
            x = b.args[0]
            if bits is not None and bits <= 2:
                deg = (1 << bits) * max(x.degree(), 1) + b.mult.degree()
                if deg <= bound.identities:
                    prod = b.mult
                    for v in range(1 << bits):
                        prod = prod * (x - GE.from_const(v))
                    state.system.constraints.append(prod.normalized())
                    continue
        elif b.id == bw_id and vrc_id is not None:
            repl = _try_bitwise_low_degree(b, state.bus_ranges, bound)
            if repl is not None:
                cons, checks = repl
                state.system.constraints.extend(cons)
                for e, bits in checks:
                    keep.append(
                        BusInteractionGE(
                            id=vrc_id, mult=b.mult, args=[e, GE.from_const(bits)]
                        )
                    )
                continue
        keep.append(b)
    state.system.bus_interactions = keep


def range_check_opt(state: OptimizerState, bus_map) -> None:
    """Minimize range-check interactions (range_constraint_optimizer.rs):
    * drop checks whose argument is a constant already inside the range;
    * for several checks on the same (guard, argument), keep only the
      tightest (it implies the looser ones; table counts are free cols);
    * drop checks already implied by the solver's range knowledge when the
      knowledge derives from a kept check on the same variable."""
    range_ids = {
        bid for bid, t in (bus_map.bus_ids.items() if bus_map else [])
        if t == "VariableRangeChecker"
    }
    best: Dict[Tuple, Tuple[int, int]] = {}  # (guard, arg) -> (bits, index)
    drop: Set[int] = set()
    for i, b in enumerate(state.system.bus_interactions):
        if b.id not in range_ids or len(b.args) != 2:
            continue
        bits = b.args[1].try_to_constant()
        if bits is None:
            continue
        cval = b.args[0].try_to_constant()
        if cval is not None:
            if cval < (1 << bits):
                drop.add(i)
            continue
        key = (b.mult.key(), b.args[0].key())
        prev = best.get(key)
        if prev is None:
            best[key] = (bits, i)
        elif bits >= prev[0]:
            drop.add(i)  # looser (or equal) than the kept one
        else:
            drop.add(prev[1])
            best[key] = (bits, i)
    if drop:
        state.system.bus_interactions = [
            b for i, b in enumerate(state.system.bus_interactions) if i not in drop
        ]


def _signed(c: int) -> int:
    c %= P
    return c if c <= P // 2 else c - P


def _residue_reachable(lo: int, hi: int, t: int) -> bool:
    """Is there an integer x in [lo, hi] with x === t (mod P)?"""
    t %= P
    # smallest representative of t's class that is >= lo
    x = t + ((lo - t + P - 1) // P) * P
    return x <= hi


def affine_value_excluded(
    D: GE,
    targets,
    ranges: Dict[int, RangeConstraint],
    scaled_checks: Optional[Dict[int, Tuple[int, int, int]]] = None,
) -> bool:
    """Certify (by signed-interval analysis over the variables' known
    ranges, trying rescalings of D by inverses of its coefficients) that
    the affine expression D can take NONE of `targets` (mod P).

    The rescaling matters: a difference like 30720*(a - b) with 16-bit
    a, b overflows the field as an interval, but divided by 30720 it is
    a - b in (-2^16, 2^16), which excludes +-2^16 exactly.

    Variables without a direct range but covered by a range check on a
    scaled expression (`scaled_checks[v] = (a, b, bits)` meaning
    a*v + b is checked to `bits` bits — OpenVM checks mem_ptr_limbs/4,
    for example) are rewritten onto the checked expression first."""
    if not D.is_affine() or not D.linear:
        return False
    # rewrite vars lacking ranges through their scaled range checks
    lin: Dict[int, int] = {}
    local_ranges = dict(ranges)
    const = D.constant
    pseudo = -1
    for v, c in D.linear.items():
        rc = ranges.get(v)
        if rc is not None and not rc.is_wrapping():
            lin[v] = (lin.get(v, 0) + c) % P
            continue
        sc = (scaled_checks or {}).get(v)
        if sc is None:
            return False
        a, b, bits = sc
        inv_a = pow(a, P - 2, P)
        lin[pseudo] = c * inv_a % P
        const = (const - c * b % P * inv_a) % P
        local_ranges[pseudo] = RangeConstraint.from_range(0, (1 << bits) - 1)
        pseudo -= 1
    cands = [1] + [pow(c, P - 2, P) for c in set(lin.values())]
    cands += [P - k for k in list(cands)]
    for k in cands:
        lo = hi = _signed(const * k)
        ok = True
        for v, c in lin.items():
            rc = local_ranges.get(v)
            if rc is None or rc.is_wrapping():
                ok = False
                break
            cc = _signed(c * k)
            t0, t1 = cc * rc.min, cc * rc.max
            lo += min(t0, t1)
            hi += max(t0, t1)
        if not ok or hi - lo >= P:
            continue
        if all(not _residue_reachable(lo, hi, t * k % P) for t in targets):
            return True
    return False


def collect_range_facts(state: OptimizerState, bus_map) -> List[Tuple[GE, int]]:
    """(expr, M) facts `expr in [0, M]` implied by unguarded stateless
    lookups — range checks and bitwise byte checks.  This is the
    information the reference's solver receives through its
    BusInteractionHandler (constraint-solver/src/bus_interaction_handler
    usage in solver/base.rs): byte-decomposition lookups like
    `x0 = c - 256*c1 - 65536*c2` with x0, c1 checked to bytes are what
    pin instruction operands to constants."""
    facts: List[Tuple[GE, int]] = []
    if bus_map is None:
        return facts
    for b in state.system.bus_interactions:
        btype = bus_map.bus_ids.get(b.id)
        name = btype if isinstance(btype, str) else (btype[0] if btype else None)
        m = b.mult.try_to_constant()
        if m is None or m == 0:
            continue
        if name == "VariableRangeChecker" and len(b.args) == 2:
            bits = b.args[1].try_to_constant()
            if bits is not None and b.args[0].is_affine():
                facts.append((b.args[0], (1 << bits) - 1))
        elif name == "BitwiseLookup" and len(b.args) == 4:
            op = b.args[3].try_to_constant()
            if op == 0:
                args = b.args[:2]
            elif op == 1:
                args = b.args[:3]
            else:
                continue
            for a in args:
                if a.is_affine() and not a.try_to_constant() == 0:
                    facts.append((a, 255))
    return facts


def expr_range_pass(state: OptimizerState, bus_map) -> None:
    """Interval propagation from expression-range facts: for
    `sum c_i v_i + b in [0, M]`, any variable whose siblings have known
    finite ranges gets its candidate set narrowed; a single candidate
    becomes an assignment (substituted by the next solver pass via a new
    affine constraint)."""
    facts = [(e, M) for e, M in collect_range_facts(state, bus_map)
             if e.linear and len(e.linear) <= 12]
    if not facts:
        return
    new: List[GE] = []
    assigned: Set[int] = set()
    for _ in range(3):
        progress = False
        for e, M in facts:
            lin = e.linear
            for v, c in lin.items():
                if v in assigned:
                    continue
                rc_v = state.bus_ranges.get(v)
                if rc_v is None or rc_v.is_wrapping() or rc_v.range_size() > (1 << 22):
                    continue
                # siblings' reachable signed interval [rest_lo, rest_hi]
                rest_lo = rest_hi = _signed(e.constant)
                ok = True
                for u, cu in lin.items():
                    if u == v:
                        continue
                    rcu = state.bus_ranges.get(u)
                    if rcu is None or rcu.is_wrapping():
                        ok = False
                        break
                    cc = _signed(cu)
                    t0, t1 = cc * rcu.min, cc * rcu.max
                    rest_lo += min(t0, t1)
                    rest_hi += max(t0, t1)
                if not ok or rest_hi - rest_lo >= P:
                    continue
                cv = _signed(c)
                # cv*x must land in some wrap branch [k*P - rest_hi,
                # k*P + M - rest_lo]; collect candidate x intervals
                cmin = min(cv * rc_v.min, cv * rc_v.max)
                cmax = max(cv * rc_v.min, cv * rc_v.max)
                k_lo = (cmin + rest_lo - M) // P
                k_hi = (cmax + rest_hi) // P + 1
                if k_hi - k_lo > 8:
                    continue
                spans = []
                for k in range(k_lo, k_hi + 1):
                    b_lo, b_hi = k * P - rest_hi, k * P + M - rest_lo
                    if cv > 0:
                        x_lo, x_hi = -(-b_lo // cv), b_hi // cv
                    else:
                        x_lo, x_hi = -(-b_hi // cv), b_lo // cv
                    x_lo = max(x_lo, rc_v.min)
                    x_hi = min(x_hi, rc_v.max)
                    if x_lo <= x_hi:
                        spans.append((x_lo, x_hi))
                if not spans:
                    continue  # no candidate: leave to solver/mock check
                x_lo = min(s[0] for s in spans)
                x_hi = max(s[1] for s in spans)
                total = sum(s[1] - s[0] + 1 for s in spans)
                if total == 1 and rc_v.range_size() > 1:
                    new.append(GE.from_var(v) - GE.from_const(x_lo % P))
                    assigned.add(v)
                    state.bus_ranges[v] = RangeConstraint.from_value(x_lo % P)
                    progress = True
                elif (x_hi - x_lo + 1) < rc_v.range_size():
                    state.bus_ranges[v] = state.bus_ranges[v].conjunction(
                        RangeConstraint.from_range(x_lo % P, x_hi % P)
                    )
                    progress = True
        if not progress:
            break
    if new:
        state.system.constraints.extend(new)


def collect_scaled_checks(state: OptimizerState, bus_map) -> Dict[int, Tuple[int, int, int]]:
    """var -> (a, b, bits) for unguarded range checks on a*v + b."""
    out: Dict[int, Tuple[int, int, int]] = {}
    if bus_map is None:
        return out
    range_ids = {bid for bid, t in bus_map.bus_ids.items() if t == "VariableRangeChecker"}
    for b in state.system.bus_interactions:
        if b.id not in range_ids or len(b.args) != 2:
            continue
        if b.mult.try_to_constant() != 1:
            continue
        bits = b.args[1].try_to_constant()
        arg = b.args[0]
        if bits is None or not arg.is_affine() or len(arg.linear) != 1:
            continue
        ((v, a),) = arg.linear.items()
        prev = out.get(v)
        if prev is None or bits < prev[2]:
            out[v] = (a, arg.constant, bits)
    return out


def bool_square_form(c: GE) -> Optional[GE]:
    """F if the constraint is F*(F-1) = 0 with F affine, else None."""
    if c.linear or c.constant % P or len(c.quadratic) != 1:
        return None
    a, b = c.quadratic[0]
    if not a.is_affine() or not b.is_affine():
        return None
    d = (a - b).try_to_constant()
    if d == 1:
        return a
    if d == P - 1:
        return b
    return None


def twin_square_pass(state: OptimizerState, bus_map=None) -> None:
    """Unify per-instance witness decompositions.

    Two constraints F*(F-1)=0 and G*(G-1)=0 force F, G in {0,1}; if
    interval analysis proves F-G cannot be +-1, then F = G, and the
    affine difference (typically `limb_a - limb_b` for the carry
    decompositions each load/store instance re-creates) becomes a new
    constraint that the solver/inliner turns into substitutions.  The
    reference reaches the same canonicalization through boolean
    extraction plus its solver's equivalence detection
    (constraint-solver/src/solver/boolean_extractor.rs,
    autoprecompiles/src/optimizer_documentation.md 'Quadratic
    Equivalence Detection'); on keccak this is what makes heap
    addresses syntactically equal so memory pairs can cancel."""
    scaled = collect_scaled_checks(state, bus_map)
    squares: List[GE] = []
    for c in state.system.constraints:
        f = bool_square_form(c)
        if f is not None:
            squares.append(f)
    groups: Dict[tuple, List[GE]] = {}
    for f in squares:
        key = (tuple(sorted(f.linear.values())), f.constant)
        groups.setdefault(key, []).append(f)
    # exclusion results cached across the fixpoint's repeated sweeps:
    # positives stay valid (range knowledge only tightens); negatives are
    # retried only when the range state grew (version counter), which
    # keeps the pass from re-running interval analysis on thousands of
    # unchanged pairs every round (the byte seeds made this the hottest
    # pass on ecrecover: 210s -> seconds)
    version = len(state.bus_ranges)
    cache = getattr(state, "_twin_cache", None)
    if cache is None or cache[0] != version:
        cache = (version, dict(cache[1]) if cache else {})
        # drop stale negatives on version change; keep positives
        cache = (version, {k: v for k, v in cache[1].items() if v})
        state._twin_cache = cache
    results = cache[1]
    new: List[GE] = []
    for fs in groups.values():
        if len(fs) < 2:
            continue
        reps: List[GE] = [fs[0]]
        for f in fs[1:]:
            matched = False
            for r in reps[:64]:
                D = (f - r).normalized()
                if D.is_zero():
                    matched = True
                    break
                if not D.is_affine() or len(D.linear) > 8:
                    continue
                k = D.key()
                hit = results.get(k)
                if hit is None:
                    hit = affine_value_excluded(D, (1, P - 1), state.bus_ranges, scaled)
                    results[k] = hit
                if hit:
                    new.append(D)
                    matched = True
                    break
            if not matched:
                reps.append(f)
    if new:
        state.system.constraints.extend(new)


_STATIC_CHECKED_BUSES = {"PcLookup", "VariableRangeChecker", "BitwiseLookup"}


def drop_constant_lookups(state: OptimizerState, bus_map) -> None:
    """Remove stateless lookups whose payload is fully constant,
    verifying table membership statically (constraint_optimizer.rs
    removes pc lookups once the pc is pinned to the block; range and
    bitwise tables are checked right here).  Pc lookups are dropped
    unconditionally: APC construction pins every operand from the
    actual program, so membership was established at build time."""
    keep = []
    for b in state.system.bus_interactions:
        btype = bus_map.bus_ids.get(b.id) if bus_map else None
        name = btype if isinstance(btype, str) else (btype[0] if btype else None)
        if name in _STATIC_CHECKED_BUSES and b.mult.try_to_constant() is not None:
            vals = [a.try_to_constant() for a in b.args]
            if all(v is not None for v in vals):
                if name == "PcLookup":
                    continue
                if name == "VariableRangeChecker" and len(vals) == 2:
                    if vals[0] < (1 << vals[1]):
                        continue
                if name == "BitwiseLookup" and len(vals) == 4:
                    x, y, z, op = vals
                    if x < 256 and y < 256 and (
                        (op == 0 and z == 0) or (op == 1 and z == (x ^ y))
                    ):
                        continue
        keep.append(b)
    state.system.bus_interactions = keep


def cancel_bus_interactions(state: OptimizerState, bus_map=None) -> None:
    """Sum multiplicities of interactions with identical (bus, args) and
    drop zero-mult interactions.  For *stateless* lookup buses, identical
    interactions are deduplicated instead (the table-side multiplicity is
    prover-chosen, so one check implies the other —
    constraint_optimizer.rs `remove_equal_bus_interactions`)."""
    stateful = _stateful_ids(state, bus_map)
    groups: Dict[Tuple, List[int]] = {}
    for i, b in enumerate(state.system.bus_interactions):
        key = (b.id, tuple(a.key() for a in b.args))
        groups.setdefault(key, []).append(i)
    drop: Set[int] = set()
    for key, idxs in groups.items():
        if len(idxs) < 2:
            continue
        b0 = state.system.bus_interactions[idxs[0]]
        if stateful is not None and b0.id not in stateful:
            mults = {state.system.bus_interactions[i].mult.key() for i in idxs}
            if len(mults) == 1:
                drop |= set(idxs[1:])
                continue
        total = b0.mult
        for i in idxs[1:]:
            total = total + state.system.bus_interactions[i].mult
        total = total.normalized()
        b0.mult = total
        drop |= set(idxs[1:])
    kept = []
    for i, b in enumerate(state.system.bus_interactions):
        if i in drop:
            continue
        if b.mult.normalized().is_zero():
            continue
        kept.append(b)
    state.system.bus_interactions = kept


def _pow2_mask_bits(rc: RangeConstraint) -> Optional[int]:
    """bits if rc is exactly [0, 2^bits - 1] with matching mask
    (range_constraint_optimizer.rs `range_constraint_to_num_bits`)."""
    for bits in range(31):
        m = (1 << bits) - 1
        if rc.min == 0 and rc.max == m and rc.mask == m:
            return bits
    return None


def batch_range_checks(state: OptimizerState, bus_map, bound: DegreeBound) -> None:
    """Minimize range-check interactions (range_constraint_optimizer.rs
    `optimize_range_constraints` + the OpenVM handler's
    `batch_make_range_constraints`):

    1. strip every unconditional *pure* range check (variable range
       checker with constant bits; bitwise lookup with op=0, z=0; tuple
       range checker), collecting expr -> required range;
    2. drop requirements already implied by the remaining system;
    3. implement single-bit requirements as `x*(x-1) = 0` constraints
       when the degree bound allows;
    4. re-emit the rest batched: byte + [0,2047] pairs on the tuple
       checker, byte pairs two-at-a-time on the bitwise lookup, the rest
       on the variable range checker."""
    from . import bus_handlers

    ids = {}
    for bid, btype in (bus_map.bus_ids.items() if bus_map else []):
        name = btype if isinstance(btype, str) else btype[0]
        ids.setdefault(name, bid)
    vrc_id = ids.get("VariableRangeChecker")
    bw_id = ids.get("BitwiseLookup")
    tup_id = ids.get("TupleRangeChecker")
    if vrc_id is None:
        return
    tup_sizes = (256, 2048)
    for bid, btype in (bus_map.bus_ids.items() if bus_map else []):
        if isinstance(btype, tuple) and btype[0] == "TupleRangeChecker":
            tup_sizes = btype[1]

    # pure range checks grouped by MULTIPLICITY (a guarded check only
    # enforces where its guard is nonzero, so only same-guard checks may
    # batch together; APC systems guard everything with is_valid)
    groups: Dict[Tuple, Dict] = {}  # mult key -> {mult, order, required}
    kept: List[BusInteractionGE] = []

    def require(mult: GE, e: GE, rc: RangeConstraint):
        g = groups.setdefault(mult.key(), {"mult": mult, "order": [], "required": {}})
        k = e.key()
        if k in g["required"]:
            g["required"][k] = (e, g["required"][k][1].conjunction(rc))
        else:
            g["required"][k] = (e, rc)
            g["order"].append(k)

    for b in state.system.bus_interactions:
        mc = b.mult.try_to_constant()
        if mc is not None and mc != 1:
            kept.append(b)  # negative mults are table sides, not checks
            continue
        if b.id == vrc_id and len(b.args) == 2:
            bits = b.args[1].try_to_constant()
            if bits is not None and bits <= 30:
                require(b.mult, b.args[0], RangeConstraint.from_mask((1 << bits) - 1))
                continue
        elif b.id == bw_id and len(b.args) == 4:
            if b.args[3].try_to_constant() == 0 and b.args[2].try_to_constant() == 0:
                require(b.mult, b.args[0], RangeConstraint.from_mask(255))
                require(b.mult, b.args[1], RangeConstraint.from_mask(255))
                continue
        elif b.id == tup_id and len(b.args) == 2:
            require(b.mult, b.args[0], RangeConstraint.from_mask(tup_sizes[0] - 1))
            require(b.mult, b.args[1], RangeConstraint.from_mask(tup_sizes[1] - 1))
            continue
        kept.append(b)
    if not groups:
        return
    state.system.bus_interactions = kept

    # range knowledge from the REMAINING system only (the requirement must
    # be implied without the stripped checks)
    try:
        seeded, _ = bus_handlers.seed_ranges(state.system, bus_map)
    except Exception:
        seeded = {}
    remaining_ranges: Dict[int, RangeConstraint] = {}
    for v, rc in seeded.items():
        remaining_ranges[v] = rc
    # single-value knowledge survives independently of checks
    for v, rc in state.bus_ranges.items():
        if rc.try_to_single_value() is not None:
            remaining_ranges[v] = rc
    # boolean knowledge from x*(x-1)=0 constraints still in the system
    for c in state.system.constraints:
        f = bool_square_form(c)
        if f is not None:
            sv = f.try_to_simple_var()
            if sv is not None:
                cur = remaining_ranges.get(sv, RangeConstraint.default())
                remaining_ranges[sv] = cur.conjunction(RangeConstraint(0, 1, 1))

    byte_bits = (tup_sizes[0] - 1).bit_length()
    second_bits = (tup_sizes[1] - 1).bit_length()
    new_cons: List[GE] = []
    out: List[BusInteractionGE] = []
    for g in groups.values():
        mult: GE = g["mult"]
        is_one = mult.try_to_constant() == 1
        mult_deg = 0 if is_one else mult.degree()
        to_emit: List[Tuple[GE, RangeConstraint, int]] = []
        for k in g["order"]:
            e, rc = g["required"][k]
            cur = rc_of_expr(e, remaining_ranges)
            if cur.conjunction(rc) == cur:
                continue  # already implied for every row
            bits = _pow2_mask_bits(rc)
            if bits is None:
                # shouldn't happen (all sources are pow2 masks); keep exact check
                to_emit.append((e, rc, 31))
                continue
            if bits == 1 and 2 * max(e.degree(), 1) + mult_deg <= bound.identities:
                sq = (e * (e - GE.from_const(1))).normalized()
                new_cons.append(sq if is_one else (mult * sq).normalized())
                continue
            to_emit.append((e, rc, bits))

        bytes_ = [e for e, rc, bits in to_emit if bits == byte_bits]
        seconds = (
            [e for e, rc, bits in to_emit if bits == second_bits]
            if tup_id is not None
            else []
        )
        others = [
            (e, bits)
            for e, rc, bits in to_emit
            if bits != byte_bits and not (tup_id is not None and bits == second_bits)
        ]
        n_tup = min(len(seconds), len(bytes_)) if tup_id is not None else 0
        for i in range(n_tup):
            out.append(BusInteractionGE(id=tup_id, mult=mult, args=[bytes_[i], seconds[i]]))
        for e in seconds[n_tup:]:
            out.append(
                BusInteractionGE(id=vrc_id, mult=mult, args=[e, GE.from_const(second_bits)])
            )
        rest_bytes = bytes_[n_tup:]
        if bw_id is not None:
            zero = GE.from_const(0)
            for i in range(0, len(rest_bytes), 2):
                b1 = rest_bytes[i]
                b2 = rest_bytes[i + 1] if i + 1 < len(rest_bytes) else zero
                out.append(BusInteractionGE(id=bw_id, mult=mult, args=[b1, b2, zero, zero]))
        else:
            for e in rest_bytes:
                out.append(BusInteractionGE(id=vrc_id, mult=mult, args=[e, GE.from_const(8)]))
        # NOTE: sub-byte checks cannot ride the byte table by scaling
        # (x*2^(8-k) wraps mod p for adversarial x) — they stay exact
        for e, bits in others:
            out.append(BusInteractionGE(id=vrc_id, mult=mult, args=[e, GE.from_const(bits)]))
    state.system.constraints.extend(new_cons)
    state.system.bus_interactions.extend(out)


# -- driver -------------------------------------------------------------------


@dataclass
class OptimizeReport:
    before: Dict[str, int]
    after: Dict[str, int]
    passes: List[Tuple[str, float]] = field(default_factory=list)


def optimize_machine(
    machine: SymbolicMachine,
    bus_map=None,
    degree_bound: Optional[DegreeBound] = None,
    bus_ranges: Optional[Dict[int, RangeConstraint]] = None,
    max_rounds: int = 10,
) -> Tuple[SymbolicMachine, OptimizeReport]:
    """The outer fixpoint loop (optimizer.rs:93-111): exec-bus collapsing
    once up front, then solver / cleanup / memory / inline passes until the
    stats stop changing."""
    from . import bus_handlers
    from .exec_bus import collapse_exec_bus
    from .memory_optimizer import optimize_memory

    bound = degree_bound or DegreeBound()
    before = machine.stats()
    system, names = machine_to_system(machine)
    state = OptimizerState(system=system, names=names, bus_ranges=dict(bus_ranges or {}))
    report = OptimizeReport(before=before, after={})

    exec_bus_id = memory_bus_id = None
    if bus_map is not None:
        seeded, extra = bus_handlers.seed_ranges(system, bus_map)
        for v, rc in seeded.items():
            cur = state.bus_ranges.get(v, RangeConstraint.default())
            state.bus_ranges[v] = cur.conjunction(rc)
        system.constraints.extend(extra)
        exec_bus_id = bus_map.bus_of("ExecutionBridge")
        memory_bus_id = bus_map.bus_of("Memory")

    def timed(name, fn):
        t0 = time.perf_counter()
        fn(state)
        report.passes.append((name, time.perf_counter() - t0))

    from .rule_opt import rule_based_pass

    if exec_bus_id is not None:
        timed("exec_bus", lambda s: collapse_exec_bus(s, exec_bus_id))
    # one-shot: name shared quadratic products so the affine machinery can
    # propagate across them (solver/linearizer.rs counterpart); the fixpoint
    # passes below subsume repeated application
    timed("linearizer", linearizer_pass)

    def reseed_pass(s: OptimizerState) -> None:
        """Re-run the bus handler's range semantics on the CURRENT system:
        facts that only become available once guards resolve to constants
        (e.g. Memory receives reaching mult == -1, whose data limbs are
        then known bytes) enter the solver's domain mid-fixpoint — the
        reference's handler is consulted at every solver iteration
        (solver/base.rs), not once up front."""
        if bus_map is None:
            return
        seeded2, _ = bus_handlers.seed_ranges(s.system, bus_map)
        for v, rc in seeded2.items():
            cur = s.bus_ranges.get(v, RangeConstraint.default())
            s.bus_ranges[v] = cur.conjunction(rc)

    # inner pass list, mirroring constraint_optimizer.rs optimize_constraints
    # (solver -> trivial -> free vars -> disconnected -> exhaustive ->
    #  rule-based -> bus-field substitution -> memory -> low-degree bus),
    # plus the fact-driven passes that stand in for the reference's
    # BusInteractionHandler-aware solver (expr_range / twin_square / ...)
    passes = [
        ("reseed", reseed_pass),
        ("solver", solver_pass),
        ("trivial", remove_trivial),
        ("free_vars", lambda s: remove_free_vars(s, bus_map)),
        ("disconnected", lambda s: remove_disconnected(s, bus_map)),
        ("exhaustive", lambda s: exhaustive_search_pass(s, bus_map)),
        ("expr_range", lambda s: expr_range_pass(s, bus_map)),
        ("twin_square", lambda s: twin_square_pass(s, bus_map)),
        ("rule_based", lambda s: rule_based_pass(s, bus_map)),
        ("bus_fields", substitute_bus_fields),
        ("cancel_bus", lambda s: cancel_bus_interactions(s, bus_map)),
    ]
    if memory_bus_id is not None:
        passes.append(("memory", lambda s: optimize_memory(s, memory_bus_id)))
    if bus_map is not None:
        passes.append(("low_degree_bus", lambda s: low_degree_bus_opt(s, bus_map, bound)))
        passes.append(("const_lookups", lambda s: drop_constant_lookups(s, bus_map)))
        passes.append(("lookup_residues", lambda s: remove_lookup_residues(s, bus_map)))

    prev = None
    for _ in range(max_rounds):
        for name, fn in passes:
            timed(name, fn)
        cur = state.stats()
        if cur == prev:
            break
        prev = cur

    # after the fixpoint: inline everything below the degree bound (the
    # single big inlining step, optimizer.rs:112-116), clean up, run the
    # rule engine once more with the degree bound, then minimize range
    # checks (optimizer.rs:120-158)
    timed("inline", lambda s: inline_below_degree_bound(s, bound))
    timed("disconnected_post", lambda s: remove_disconnected(s, bus_map))
    timed("rule_based_post", lambda s: rule_based_pass(s, bus_map, bound))
    timed("solver_post", solver_pass)
    timed("trivial_post", remove_trivial)
    timed("cancel_bus_post", lambda s: cancel_bus_interactions(s, bus_map))
    if bus_map is not None:
        timed("range_opt", lambda s: range_check_opt(s, bus_map))
        timed("batch_ranges", lambda s: batch_range_checks(s, bus_map, bound))
        timed("const_lookups_post", lambda s: drop_constant_lookups(s, bus_map))
        timed("lookup_residues_post", lambda s: remove_lookup_residues(s, bus_map))
        timed("free_vars_post", lambda s: remove_free_vars(s, bus_map))
        timed("disconnected_final", lambda s: remove_disconnected(s, bus_map))
    timed("inline_final", lambda s: inline_below_degree_bound(s, bound))
    timed("trivial_final", remove_trivial)

    out = system_to_machine(state, machine.derived_columns)
    report.after = out.stats()
    return out, report
