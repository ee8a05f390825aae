"""SymbolicMachine: the autoprecompile circuit representation.

Counterpart of the reference's `SymbolicMachine<T>` {constraints,
bus_interactions, derived_columns}
(/root/reference/autoprecompiles/src/symbolic_machine.rs:115-124) and the
`Apc` container {block, machine, subs, optimistic_constraints}
(autoprecompiles/src/lib.rs:186-195), including the ApcWithBusMap JSON
format its test fixtures use — we load those fixtures directly as golden
inputs for the optimizer."""
from __future__ import annotations

import gzip
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple, Union

from ..ir import expression as ir
from ..ir.serialize import expr_from_json, expr_to_json


@dataclass
class SymbolicBusInteraction:
    """One bus interaction: multiplicity + argument tuple on bus `id`."""

    id: int
    mult: ir.Expr
    args: List[ir.Expr]

    def exprs(self) -> List[ir.Expr]:
        return [self.mult, *self.args]


@dataclass
class DerivedColumn:
    """Column computed from others at witgen time (not constrained).

    den = None: value = expr.  den set: QuotientOrZero semantics —
    value = expr/den when den != 0 else 0 (reference ComputationMethod,
    constraint-solver/src/constraint_system.rs)."""

    var: ir.Var
    expr: ir.Expr
    den: Optional[ir.Expr] = None


@dataclass
class SymbolicMachine:
    constraints: List[ir.Expr] = field(default_factory=list)
    bus_interactions: List[SymbolicBusInteraction] = field(default_factory=list)
    derived_columns: List[DerivedColumn] = field(default_factory=list)

    def all_exprs(self) -> List[ir.Expr]:
        out = list(self.constraints)
        for b in self.bus_interactions:
            out.extend(b.exprs())
        return out

    def variables(self) -> Dict[int, str]:
        """id -> name of every Var referenced."""
        out: Dict[int, str] = {}

        def walk(e: ir.Expr):
            if isinstance(e, ir.Var):
                out[e.id] = e.name
            for c in e.children():
                walk(c)

        for e in self.all_exprs():
            walk(e)
        for d in self.derived_columns:
            out[d.var.id] = d.var.name
            walk(d.expr)
            if d.den is not None:
                walk(d.den)
        return out

    def main_columns(self) -> Dict[int, str]:
        """id -> name of vars in constraints/bus interactions only (the
        committed witness columns; derived columns are recomputed at
        witgen — matches the reference's main_columns() count)."""
        out: Dict[int, str] = {}

        def walk(e: ir.Expr):
            if isinstance(e, ir.Var):
                out[e.id] = e.name
            for c in e.children():
                walk(c)

        for e in self.all_exprs():
            walk(e)
        return out

    def stats(self) -> Dict[str, int]:
        return {
            "constraints": len(self.constraints),
            "bus_interactions": len(self.bus_interactions),
            "columns": len(self.main_columns()),
        }


# -- bus map ------------------------------------------------------------------

BusType = Union[str, Tuple[str, Tuple[int, ...]]]


@dataclass
class BusMap:
    """bus id -> semantic type (reference: autoprecompiles/src/bus_map.rs)."""

    bus_ids: Dict[int, BusType] = field(default_factory=dict)

    def bus_of(self, kind: BusType) -> Optional[int]:
        for k, v in self.bus_ids.items():
            if v == kind:
                return k
        return None

    @staticmethod
    def from_json(d: Dict[str, Any]) -> "BusMap":
        out: Dict[int, BusType] = {}
        for k, v in d["bus_ids"].items():
            if isinstance(v, str):
                out[int(k)] = v
            elif isinstance(v, dict) and "Other" in v:
                o = v["Other"]
                if isinstance(o, str):
                    out[int(k)] = o
                else:  # {"TupleRangeChecker": [256, 2048]}
                    ((name, args),) = o.items()
                    out[int(k)] = (name, tuple(args))
            else:
                raise ValueError(f"unknown bus type {v!r}")
        return BusMap(out)

    def to_json(self) -> Dict[str, Any]:
        enc: Dict[str, Any] = {}
        for k, v in self.bus_ids.items():
            if isinstance(v, tuple):
                enc[str(k)] = {"Other": {v[0]: list(v[1])}}
            elif v in ("ExecutionBridge", "Memory", "PcLookup"):
                enc[str(k)] = v
            else:
                enc[str(k)] = {"Other": v}
        return {"bus_ids": enc}


# -- Apc container ------------------------------------------------------------


@dataclass
class Apc:
    block: Dict[str, Any]  # basic-block description (opaque instruction lists)
    machine: SymbolicMachine
    subs: List[List[Dict[str, int]]]  # per-instruction column substitutions
    optimistic_constraints: Dict[str, Any]
    bus_map: Optional[BusMap] = None


def machine_from_json(m: Dict[str, Any]) -> SymbolicMachine:
    constraints = [expr_from_json(c) for c in m["constraints"]]
    bus = [
        SymbolicBusInteraction(
            id=b["id"], mult=expr_from_json(b["mult"]), args=[expr_from_json(a) for a in b["args"]]
        )
        for b in m["bus_interactions"]
    ]
    derived = []
    for d in m.get("derived_columns", []):
        var = expr_from_json(d[0]) if isinstance(d, list) else expr_from_json(d["var"])
        expr = expr_from_json(d[1]) if isinstance(d, list) else expr_from_json(d["expr"])
        den = None
        if isinstance(d, list) and len(d) > 2 and d[2] is not None:
            den = expr_from_json(d[2])
        elif isinstance(d, dict) and d.get("den") is not None:
            den = expr_from_json(d["den"])
        assert isinstance(var, ir.Var)
        derived.append(DerivedColumn(var=var, expr=expr, den=den))
    return SymbolicMachine(constraints=constraints, bus_interactions=bus, derived_columns=derived)


def machine_to_json(m: SymbolicMachine) -> Dict[str, Any]:
    return {
        "constraints": [expr_to_json(c) for c in m.constraints],
        "bus_interactions": [
            {"id": b.id, "mult": expr_to_json(b.mult), "args": [expr_to_json(a) for a in b.args]}
            for b in m.bus_interactions
        ],
        "derived_columns": [
            [expr_to_json(d.var), expr_to_json(d.expr)]
            if d.den is None
            else [expr_to_json(d.var), expr_to_json(d.expr), expr_to_json(d.den)]
            for d in m.derived_columns
        ],
    }


def load_apc(path: str) -> Apc:
    """Load an ApcWithBusMap JSON (optionally gzipped) — the reference's
    fixture format (autoprecompiles/tests/optimizer.rs:26-30)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        d = json.load(f)
    return Apc(
        block=d.get("block", {}),
        machine=machine_from_json(d["machine"]),
        subs=d.get("subs", []),
        optimistic_constraints=d.get("optimistic_constraints", {}),
        bus_map=BusMap.from_json(d["bus_map"]) if "bus_map" in d else None,
    )


def save_apc(apc: Apc, path: str) -> None:
    d = {
        "block": apc.block,
        "machine": machine_to_json(apc.machine),
        "subs": apc.subs,
        "optimistic_constraints": apc.optimistic_constraints,
    }
    if apc.bus_map is not None:
        d["bus_map"] = apc.bus_map.to_json()
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as f:
        json.dump(d, f)
