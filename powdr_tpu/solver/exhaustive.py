"""Exhaustive search over small-range variable groups.

Counterpart of the reference's exhaustive search
(/root/reference/constraint-solver/src/solver/exhaustive_search.rs:20-24
and constraint_optimizer's simplify_constraints_using_exhaustive_search):
for a set of variables whose range-size product is <= 2^10, enumerate
every assignment against ALL constraints that only touch those
variables.  From the satisfying set derive:
  * contradictions (empty set),
  * constant variables -> assignments,
  * tightened ranges (min/max/mask over observed values),
  * affine pairwise relations v2 = a*v1 + b -> substitutions,
  * constraints fully implied by the group -> removable.
"""
from __future__ import annotations

from itertools import product as iter_product
from typing import Dict, List, Optional, Set, Tuple

from .constraint_system import ConstraintSystemGE
from .grouped_expression import GroupedExpression as GE, P
from .range_constraint import RangeConstraint

MAX_COMBOS = 1 << 10


def _mask_of(values) -> int:
    m = 0
    for v in values:
        m |= v
    return m


def search_group(
    constraints: List[GE],
    var_values: Dict[int, List[int]],
) -> Optional[Dict]:
    """Enumerate; returns deductions or None if intractable/empty info."""
    vs = sorted(var_values)
    combos = 1
    for v in vs:
        combos *= len(var_values[v])
        if combos > MAX_COMBOS:
            return None
    sat: List[Tuple[int, ...]] = []
    for combo in iter_product(*(var_values[v] for v in vs)):
        assignment = dict(zip(vs, combo))
        if all(c.eval(assignment) == 0 for c in constraints):
            sat.append(combo)
    out: Dict = {"empty": not sat, "assign": {}, "ranges": {}, "subs": {}}
    if not sat:
        return out
    cols = list(zip(*sat))
    for i, v in enumerate(vs):
        vals = sorted(set(cols[i]))
        if len(vals) == 1:
            out["assign"][v] = vals[0]
        else:
            out["ranges"][v] = RangeConstraint(
                min=vals[0], max=vals[-1], mask=_mask_of(vals)
            )
    # affine pairwise relations among non-constant vars
    live = [i for i, v in enumerate(vs) if v not in out["assign"]]
    for ai in live:
        for bi in live:
            if ai == bi or vs[bi] in out["subs"]:
                continue
            # fit v_b = s * v_a + t from the first two distinct points
            pts = {}
            ok = True
            for row in sat:
                pts.setdefault(row[ai], set()).add(row[bi])
            if any(len(ys) > 1 for ys in pts.values()):
                continue  # not functional
            items = [(x, next(iter(ys))) for x, ys in pts.items()]
            if len(items) < 2:
                continue
            (x0, y0), (x1, y1) = items[0], items[1]
            s = (y1 - y0) * pow(x1 - x0, P - 2, P) % P
            t = (y0 - s * x0) % P
            for x, y in items[2:]:
                if (s * x + t) % P != y:
                    ok = False
                    break
            if ok:
                out["subs"][vs[bi]] = (vs[ai], s, t)
    return out


def exhaustive_pass(
    system: ConstraintSystemGE,
    ranges: Dict[int, RangeConstraint],
    max_group_vars: int = 8,
) -> Dict:
    """One sweep: groups are the var sets of individual constraints (plus
    all constraints falling inside the group).  Returns aggregated
    deductions: {assign, ranges, subs, drop_constraints}."""
    by_vars: List[Tuple[Set[int], int]] = [
        (c.variables(), i) for i, c in enumerate(system.constraints)
    ]
    occ: Dict[int, List[int]] = {}
    for vs, i in by_vars:
        for v in vs:
            occ.setdefault(v, []).append(i)
    agg = {"assign": {}, "ranges": {}, "subs": {}, "contradiction": False}
    seen_groups: Set[Tuple[int, ...]] = set()
    for vs, idx in by_vars:
        if not vs or len(vs) > max_group_vars:
            continue
        key = tuple(sorted(vs))
        if key in seen_groups:
            continue
        seen_groups.add(key)
        var_values = {}
        ok = True
        for v in vs:
            vals = ranges.get(v, RangeConstraint.default()).values(limit=32)
            if vals is None:
                ok = False
                break
            var_values[v] = vals
        if not ok:
            continue
        cand = set()
        for v in vs:
            cand.update(occ.get(v, ()))
        group_cons = [
            system.constraints[i] for i in sorted(cand) if by_vars[i][0] <= vs
        ]
        res = search_group(group_cons, var_values)
        if res is None:
            continue
        if res["empty"]:
            agg["contradiction"] = True
            return agg
        agg["assign"].update(res["assign"])
        for v, rc in res["ranges"].items():
            cur = agg["ranges"].get(v)
            # deductions from different groups all hold: intersect
            agg["ranges"][v] = rc if cur is None else cur.conjunction(rc)
        for vb, rel in res["subs"].items():
            agg["subs"].setdefault(vb, rel)
    return agg
