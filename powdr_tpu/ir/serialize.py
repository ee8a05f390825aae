"""Reference-compatible JSON serialization of algebraic expressions.

Format (observed in the reference's ApcWithBusMap fixtures,
/root/reference/autoprecompiles/tests/*.json.gz, produced by the serde
impls of expression/src/lib.rs):
  expression := int                      # field constant (canonical)
             | "name@id"                 # AlgebraicReference
             | [lhs, "+"|"-"|"*", rhs]   # BinaryOperation
             | ["-", operand]            # UnaryOperation (negation)
"""
from __future__ import annotations

from typing import Any

from . import expression as ir

_P = 2013265921


def expr_from_json(v: Any) -> ir.Expr:
    if isinstance(v, int):
        return ir.Const(v % _P)
    if isinstance(v, str):
        name, _, idx = v.rpartition("@")
        return ir.Var(name=name, id=int(idx))
    if isinstance(v, list):
        if len(v) == 2 and v[0] == "-":
            return ir.Neg(expr_from_json(v[1]))
        if len(v) == 3 and isinstance(v[1], str):
            lhs, op, rhs = v
            l, r = expr_from_json(lhs), expr_from_json(rhs)
            if op == "+":
                return ir.Add(l, r)
            if op == "-":
                return ir.Sub(l, r)
            if op == "*":
                return ir.Mul(l, r)
            raise ValueError(f"unknown operator {op!r}")
    raise ValueError(f"cannot parse expression node {v!r}")


def expr_to_json(e: ir.Expr) -> Any:
    if isinstance(e, ir.Const):
        return int(e.value)
    if isinstance(e, ir.Var):
        return f"{e.name}@{e.id}"
    if isinstance(e, ir.Neg):
        return ["-", expr_to_json(e.operand)]
    if isinstance(e, ir.Add):
        return [expr_to_json(e.lhs), "+", expr_to_json(e.rhs)]
    if isinstance(e, ir.Sub):
        return [expr_to_json(e.lhs), "-", expr_to_json(e.rhs)]
    if isinstance(e, ir.Mul):
        return [expr_to_json(e.lhs), "*", expr_to_json(e.rhs)]
    raise ValueError(f"cannot serialize node {type(e).__name__}")
