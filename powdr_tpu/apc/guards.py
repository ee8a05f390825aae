"""Padding-row guards for optimized APC machines.

Reference: `add_guards` in /root/reference/autoprecompiles/src/lib.rs:427-524.
After optimization a machine may carry constraints that an all-zero
(padding) row violates — inverse-witness identities with constant terms,
pinned-pc constraints, constant bus multiplicities.  `add_guards`
introduces an `is_valid` column (derived: constant 1 on real rows, zero
on padding) and guards every constraint and multiplicity WITHOUT raising
the machine's degree:

- a constraint already satisfied by the zero witness is left alone;
- otherwise additions/subtractions are guarded on both sides, products
  only on the left factor (the right keeps its degree headroom), bare
  constants become `c * is_valid`;
- a bus multiplicity that is nonzero at the zero witness becomes
  `is_valid * mult`; one that is zero gets the constraint
  `(1 - is_valid) * mult = 0` so padding rows cannot smuggle bus flow;
- finally `is_valid * (is_valid - 1) = 0` pins it boolean.
"""
from __future__ import annotations

from typing import List

from ..field.babybear import P
from ..ir import expression as ir
from .symbolic_machine import DerivedColumn, SymbolicMachine


def zero_witness_value(e: ir.Expr) -> int:
    """Value of `e` with every variable set to 0 (canonical, mod P)."""
    if isinstance(e, ir.Const):
        return e.value % P
    if isinstance(e, ir.Var):
        return 0
    if isinstance(e, ir.Add):
        return (zero_witness_value(e.lhs) + zero_witness_value(e.rhs)) % P
    if isinstance(e, ir.Sub):
        return (zero_witness_value(e.lhs) - zero_witness_value(e.rhs)) % P
    if isinstance(e, ir.Mul):
        return zero_witness_value(e.lhs) * zero_witness_value(e.rhs) % P
    if isinstance(e, ir.Neg):
        return (-zero_witness_value(e.operand)) % P
    raise TypeError(type(e))


def _guard_expr(e: ir.Expr, iv: ir.Var) -> ir.Expr:
    """lib.rs `add_guards_constraint`: guard so the zero witness satisfies
    the constraint, multiplying only where it cannot raise the degree."""
    if zero_witness_value(e) == 0:
        return e
    if isinstance(e, (ir.Add, ir.Sub)):
        cls = type(e)
        return cls(_guard_expr(e.lhs, iv), _guard_expr(e.rhs, iv))
    if isinstance(e, ir.Mul):
        # zero-witness(e) != 0 implies zero-witness(lhs) != 0, so the
        # recursion terminates with the left factor guarded
        return ir.Mul(_guard_expr(e.lhs, iv), e.rhs)
    if isinstance(e, ir.Neg):
        return ir.Neg(_guard_expr(e.operand, iv))
    if isinstance(e, ir.Const):
        return ir.Mul(e, iv)
    # a bare Var has zero-witness value 0 and is handled above
    raise TypeError(type(e))


def needs_guards(machine: SymbolicMachine) -> bool:
    """True when some constraint or multiplicity is violated by / active
    on the all-zero padding row."""
    return any(zero_witness_value(c) != 0 for c in machine.constraints) or any(
        zero_witness_value(b.mult) != 0 for b in machine.bus_interactions
    )


def add_guards(machine: SymbolicMachine, name: str = "is_valid") -> SymbolicMachine:
    """Guard `machine` in place with a fresh `is_valid` column; returns it."""
    next_id = max(machine.variables(), default=-1) + 1
    iv = ir.Var(name=name, id=next_id)

    machine.constraints = [_guard_expr(c, iv) for c in machine.constraints]

    forced_zero: List[ir.Expr] = []
    for b in machine.bus_interactions:
        if zero_witness_value(b.mult) != 0:
            b.mult = ir.Mul(iv, b.mult)
        else:
            # padding rows must not contribute bus flow even if filled
            # with junk by a malicious prover
            forced_zero.append(ir.Mul(ir.Sub(ir.Const(1), iv), b.mult))
    machine.constraints.extend(forced_zero)

    machine.constraints.append(ir.Mul(iv, ir.Sub(iv, ir.Const(1))))
    machine.derived_columns.append(DerivedColumn(var=iv, expr=ir.Const(1)))
    return machine
