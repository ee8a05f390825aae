"""Solver tests, mirroring the reference's solver integration test themes
(/root/reference/constraint-solver/tests/solver.rs): propagation chains,
bit decomposition, boolean extraction, factor analysis, contradictions."""
import pytest

from powdr_tpu.solver.constraint_system import ConstraintSystemGE
from powdr_tpu.solver.grouped_expression import GroupedExpression as GE, P
from powdr_tpu.solver.range_constraint import BOOLEAN, RangeConstraint
from powdr_tpu.solver.solver import Contradiction, Solver, solve_system


def var(v):
    return GE.from_var(v)


def const(c):
    return GE.from_const(c)


def test_constant_chain():
    # x0 = 5 ; x1 - x0 - 2 = 0 ; x2 - x1*x1 = 0
    sys = ConstraintSystemGE(
        constraints=[
            var(0) - const(5),
            var(1) - var(0) - const(2),
            var(2) - var(1) * var(1),
        ]
    )
    res = solve_system(sys)
    assert res.assignments == {0: 5, 1: 7, 2: 49}


def test_bit_decomposition():
    # x0 + 256*x1 = 0x1234 with byte ranges
    sys = ConstraintSystemGE(constraints=[var(0) + var(1).scale(256) - const(0x1234)])
    ranges = {0: RangeConstraint.from_mask(0xFF), 1: RangeConstraint.from_mask(0xFF)}
    res = solve_system(sys, ranges)
    assert res.assignments == {0: 0x34, 1: 0x12}


def test_boolean_two_root():
    # x*(x-1) = 0  ->  x in {0,1}
    sys = ConstraintSystemGE(constraints=[var(0) * (var(0) - const(1))])
    res = solve_system(sys)
    assert res.ranges[0].min == 0 and res.ranges[0].max == 1


def test_factor_forced_zero():
    # (x0 - 3) * x1 = 0 with x0 in [5, 10]  ->  x1 = 0
    sys = ConstraintSystemGE(constraints=[(var(0) - const(3)) * var(1)])
    ranges = {0: RangeConstraint.from_range(5, 10)}
    res = solve_system(sys, ranges)
    assert res.assignments.get(1) == 0


def test_two_var_substitution():
    # x1 = 2*x0 + 1 everywhere; x1 + x0 = 10 then solves x0 = 3
    sys = ConstraintSystemGE(
        constraints=[
            var(1) - var(0).scale(2) - const(1),
            var(1) + var(0) - const(10),
        ]
    )
    res = solve_system(sys)
    assert res.assignments[0] == 3
    assert res.assignments.get(1, None) in (7, None)  # may be via substitution
    if 1 not in res.assignments:
        repl = res.substitutions[1]
        assert repl.substitute(0, GE.from_const(3)).try_to_constant() == 7


def test_contradiction():
    sys = ConstraintSystemGE(constraints=[var(0) - const(1), var(0) - const(2)])
    with pytest.raises(Contradiction):
        solve_system(sys)


def test_range_propagation_sum():
    # x2 = x0 + x1 with x0,x1 bytes -> x2 in [0, 510]
    sys = ConstraintSystemGE(constraints=[var(2) - var(0) - var(1)])
    ranges = {0: RangeConstraint.from_mask(0xFF), 1: RangeConstraint.from_mask(0xFF)}
    res = solve_system(sys, ranges, derive_substitutions=False)
    rc = res.ranges[2]
    assert rc.min == 0 and rc.max == 510


def test_grouped_expression_algebra():
    e = (var(0) + const(3)) * (var(1) - const(2))
    e2 = e.substitute(0, const(7))  # (10)*(x1-2) = 10*x1 - 20
    n = e2.normalized()
    assert n.is_affine()
    assert n.linear == {1: 10}
    assert n.constant == (P - 20) % P
    assert e.degree() == 2 and n.degree() == 1


def test_solve_for():
    e = var(0).scale(3) + var(1) - const(12)
    r = e.solve_for(0)
    # x0 = (12 - x1)/3
    inv3 = pow(3, P - 2, P)
    assert r.linear == {1: (P - inv3) % P}
    assert r.constant == 12 * inv3 % P


def test_linearizer_shared_products():
    """Naming a shared quadratic product lets the affine machinery solve
    across it (solver/linearizer.rs:16-35 counterpart): x = a*b together
    with a*b = 3 yields x = 3, which the plain quadratic analysis misses."""
    from powdr_tpu.solver.solver import solve_system_linearized

    ab = (var(1), var(2))
    sys = ConstraintSystemGE(
        constraints=[
            GE(quadratic=[ab], linear={3: P - 1}),  # a*b - x = 0
            GE(quadratic=[ab], constant=P - 3),  # a*b - 3 = 0
        ]
    )
    assert solve_system(sys).assignments == {}
    res = solve_system_linearized(sys)
    assert res.assignments == {3: 3}
    # no aux variables may leak into the result
    from powdr_tpu.solver.solver import AUX_BASE

    assert all(v < AUX_BASE for v in res.assignments)
    assert all(v < AUX_BASE for v in res.ranges)


def test_split_system():
    """Independent components separate; shared variables (including via
    bus interactions) keep constraints together; constant residue drops
    (system_splitter.rs:16-59)."""
    from powdr_tpu.solver.constraint_system import (
        BusInteractionGE,
        ConstraintSystemGE,
        split_system,
    )

    sys = ConstraintSystemGE(
        constraints=[
            var(0) + var(1) - const(3),  # comp A
            var(2) * var(2) - var(2),  # comp B
            const(0),  # redundant, dropped
        ],
        bus_interactions=[
            # ties comp A to variable 4
            BusInteractionGE(id=7, mult=var(4), args=[var(1)]),
            # variable-free interaction: its own subsystem
            BusInteractionGE(id=8, mult=const(1), args=[const(5)]),
        ],
    )
    parts = split_system(sys)
    assert len(parts) == 3
    by_vars = {frozenset(p.variables()): p for p in parts}
    a = by_vars[frozenset({0, 1, 4})]
    assert len(a.constraints) == 1 and len(a.bus_interactions) == 1
    b = by_vars[frozenset({2})]
    assert len(b.constraints) == 1 and not b.bus_interactions
    loose = by_vars[frozenset()]
    assert not loose.constraints and loose.bus_interactions[0].id == 8
