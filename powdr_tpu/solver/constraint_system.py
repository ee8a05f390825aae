"""Constraint system over GroupedExpressions + variable index.

Counterparts: ConstraintSystem (constraint-solver/src/constraint_system.rs:18-31)
and IndexedConstraintSystem (indexed_constraint_system.rs:20-35) — the
var -> occurrence index makes substitution propagation O(touched)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from .grouped_expression import GroupedExpression


@dataclass
class BusInteractionGE:
    id: int
    mult: GroupedExpression
    args: List[GroupedExpression]

    def exprs(self) -> List[GroupedExpression]:
        return [self.mult, *self.args]


@dataclass
class ConstraintSystemGE:
    """Algebraic constraints (== 0) + bus interactions, solver form."""

    constraints: List[GroupedExpression] = field(default_factory=list)
    bus_interactions: List[BusInteractionGE] = field(default_factory=list)

    def variables(self) -> Set[int]:
        out: Set[int] = set()
        for c in self.constraints:
            out |= c.variables()
        for b in self.bus_interactions:
            for e in b.exprs():
                out |= e.variables()
        return out


class IndexedSystem:
    """Occurrence index over a ConstraintSystemGE.

    Constraint slots are (kind, idx, sub) with kind 'c' for algebraic
    constraints (sub unused) and 'b' for bus interactions (sub = position
    in [mult, arg0, arg1, ...])."""

    def __init__(self, system: ConstraintSystemGE):
        self.system = system
        self.var_occurrences: Dict[int, Set[Tuple]] = {}
        for i, c in enumerate(system.constraints):
            self._index_expr(("c", i, 0), c)
        for i, b in enumerate(system.bus_interactions):
            for j, e in enumerate(b.exprs()):
                self._index_expr(("b", i, j), e)

    def _index_expr(self, slot, e: GroupedExpression):
        for v in e.variables():
            self.var_occurrences.setdefault(v, set()).add(slot)

    def get(self, slot) -> GroupedExpression:
        kind, i, j = slot
        if kind == "c":
            return self.system.constraints[i]
        b = self.system.bus_interactions[i]
        return b.mult if j == 0 else b.args[j - 1]

    def set(self, slot, e: GroupedExpression):
        kind, i, j = slot
        old_vars = self.get(slot).variables()
        if kind == "c":
            self.system.constraints[i] = e
        else:
            b = self.system.bus_interactions[i]
            if j == 0:
                b.mult = e
            else:
                b.args[j - 1] = e
        new_vars = e.variables()
        for v in old_vars - new_vars:
            occ = self.var_occurrences.get(v)
            if occ:
                occ.discard(slot)
                if not occ:
                    del self.var_occurrences[v]
        for v in new_vars - old_vars:
            self.var_occurrences.setdefault(v, set()).add(slot)

    def substitute(self, v: int, repl: GroupedExpression) -> List[Tuple]:
        """Replace v everywhere; returns the touched slots."""
        touched = list(self.var_occurrences.get(v, ()))
        for slot in touched:
            self.set(slot, self.get(slot).substitute(v, repl).normalized())
        return touched

    def occurrences(self, v: int) -> Set[Tuple]:
        return self.var_occurrences.get(v, set())

    def append_constraint(self, e: GroupedExpression) -> Tuple:
        self.system.constraints.append(e)
        slot = ("c", len(self.system.constraints) - 1, 0)
        self._index_expr(slot, e)
        return slot


def split_system(system: ConstraintSystemGE) -> List[ConstraintSystemGE]:
    """Split into independent subsystems: every variable lives in exactly
    one subsystem, and every constraint/bus interaction referencing it
    travels with it (system_splitter.rs:16-59 counterpart).  Constant
    constraints (no variables — already-substituted residue) are dropped,
    mirroring the reference's is_redundant cleanup; variable-free bus
    interactions form their own singleton subsystems."""
    parent: Dict[int, int] = {}

    def find(v: int) -> int:
        r = v
        while parent[r] != r:
            r = parent[r]
        while parent[v] != r:
            parent[v], v = r, parent[v]
        return r

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    def link(vars_: Set[int]) -> None:
        it = iter(vars_)
        first = next(it)
        if first not in parent:
            parent[first] = first
        for v in it:
            if v not in parent:
                parent[v] = v
            union(first, v)

    con_vars = [c.variables() for c in system.constraints]
    bus_vars = [set().union(*(e.variables() for e in b.exprs())) for b in system.bus_interactions]
    for vs in con_vars:
        if vs:
            link(vs)
    for vs in bus_vars:
        if vs:
            link(vs)

    groups: Dict[int, ConstraintSystemGE] = {}

    def group_of(root: int) -> ConstraintSystemGE:
        if root not in groups:
            groups[root] = ConstraintSystemGE()
        return groups[root]

    out_loose: List[ConstraintSystemGE] = []
    for c, vs in zip(system.constraints, con_vars):
        if vs:
            group_of(find(next(iter(vs)))).constraints.append(c)
        # else: constant constraint — redundant residue, dropped
    for b, vs in zip(system.bus_interactions, bus_vars):
        if vs:
            group_of(find(next(iter(vs)))).bus_interactions.append(b)
        else:
            out_loose.append(ConstraintSystemGE(bus_interactions=[b]))
    return list(groups.values()) + out_loose
