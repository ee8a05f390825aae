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


def _eval_ge_vec(c: GE, cols, n: int):
    """Evaluate a GroupedExpression over all assignment rows at once.
    cols: var -> (n,) uint64 column.  Values < P so products < 2^62."""
    import numpy as np

    acc = np.full(n, c.constant % P, dtype=np.uint64)
    for v, k in c.linear.items():
        acc = (acc + (k % P) * cols[v]) % np.uint64(P)
    for l, r in c.quadratic:
        acc = (acc + _eval_ge_vec(l, cols, n) * _eval_ge_vec(r, cols, n)) % np.uint64(P)
    return acc


def _mask_of(values) -> int:
    m = 0
    for v in values:
        m |= v
    return m


def _one_hot_clusters(
    constraints: List[GE], var_values
) -> List[Tuple[Tuple[int, ...], int, bool]]:
    """Disjoint clusters (vars, k, allow_zero) over boolean vars:

    * `sum(m_i) = k` -> exactly k set (C(n,k) assignments);
    * `(1 - sum(m_i)) * sum(m_i) = 0` (any scaling) -> at most one set
      (n+1 assignments) — the shift-marker selector form.

    Joint enumeration replaces 2^n blowup with the selection count."""
    used: Set[int] = set()
    out = []

    def boolean_sum_vars(e: GE) -> Optional[Tuple[Tuple[int, ...], int]]:
        """(vars, k) if e = f*(sum v_i) - f*k over booleans, same coeff f."""
        if e.quadratic or not e.linear:
            return None
        coeffs = set(e.linear.values())
        if len(coeffs) != 1:
            return None
        f = next(iter(coeffs))
        k = (-e.constant) * pow(f, P - 2, P) % P
        if k > 3:
            return None
        vs = tuple(sorted(e.linear))
        if any(var_values.get(v) not in ([0, 1],) for v in vs):
            return None
        return vs, k

    for c in constraints:
        # product form: (a) * (b) with a = f*(k' - sum), b = g*(sum - k'')
        if not c.linear and c.constant == 0 and len(c.quadratic) == 1:
            l, r = c.quadratic[0]
            bl = boolean_sum_vars(l)
            br = boolean_sum_vars(r)
            if bl and br and bl[0] == br[0] and {bl[1], br[1]} == {0, 1}:
                vs = bl[0]
                if len(vs) >= 3 and not any(v in used for v in vs):
                    used.update(vs)
                    out.append((vs, 1, True))  # at most one set
            continue
        bs = boolean_sum_vars(c)
        if bs is None:
            continue
        vs, k = bs
        if any(v in used for v in vs):
            continue
        used.update(vs)
        out.append((vs, k, False))
    return out


def search_group(
    constraints: List[GE],
    var_values: Dict[int, List[int]],
    facts: Optional[List[Tuple[GE, int]]] = None,
) -> Optional[Dict]:
    """Enumerate; returns deductions or None if intractable/empty info.

    `facts` are membership predicates `expr mod P in [0, M]` from
    stateless lookups (range / byte checks) whose variables fall inside
    the group — the channel through which one-hot selector families
    (shift markers) get pinned by their selection range check."""
    from itertools import combinations

    clusters = _one_hot_clusters(constraints, var_values)
    clustered = {v for vs, _, _ in clusters for v in vs}
    # blocks: (vars, list of joint assignments)
    blocks: List[Tuple[Tuple[int, ...], List[Tuple[int, ...]]]] = []
    for cvars, k, allow_zero in clusters:
        assigns = []
        if allow_zero:
            assigns.append((0,) * len(cvars))
        for ones in combinations(range(len(cvars)), k):
            row = [0] * len(cvars)
            for i in ones:
                row[i] = 1
            assigns.append(tuple(row))
        blocks.append((cvars, assigns))
    for v in sorted(var_values):
        if v not in clustered:
            blocks.append(((v,), [(x,) for x in var_values[v]]))
    combos = 1
    for _, assigns in blocks:
        combos *= len(assigns)
        if combos > MAX_COMBOS:
            return None
    order: List[int] = [v for bvars, _ in blocks for v in bvars]
    vs = sorted(var_values)
    pos = {v: i for i, v in enumerate(order)}
    # vectorized enumeration: build the full (n_combos, n_vars) assignment
    # matrix (bounded by MAX_COMBOS) and evaluate every constraint over
    # all combos at once — the scalar per-assignment eval dominated the
    # keccak-fixture optimize time otherwise
    import numpy as np

    mat = np.zeros((1, 0), dtype=np.uint64)
    for _bvars, assigns in blocks:
        a = np.asarray(assigns, dtype=np.uint64).reshape(len(assigns), -1)
        mat = np.concatenate(
            [
                np.repeat(mat, len(a), axis=0),
                np.tile(a, (len(mat), 1)),
            ],
            axis=1,
        )
    cols = {v: mat[:, i] for i, v in enumerate(order)}
    mask = np.ones(len(mat), dtype=bool)
    for c in constraints:
        mask &= _eval_ge_vec(c, cols, len(mat)) == 0
        if not mask.any():
            break
    if mask.any():
        for e, M in facts or []:
            mask &= _eval_ge_vec(e, cols, len(mat)) <= M
            if not mask.any():
                break
    sel = mat[mask]
    vcols = [pos[v] for v in vs]
    sat: List[Tuple[int, ...]] = [tuple(int(x) for x in row) for row in sel[:, vcols]]
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
    facts: Optional[List[Tuple[GE, int]]] = None,
    cache: Optional[Dict] = None,
) -> Dict:
    """One sweep: groups are the var sets of individual constraints (plus
    all constraints falling inside the group).  Returns aggregated
    deductions: {assign, ranges, subs, drop_constraints}."""
    by_vars: List[Tuple[Set[int], int]] = [
        (c.variables(), i) for i, c in enumerate(system.constraints)
    ]
    key_hash = (
        [hash(c.key()) for c in system.constraints] if cache is not None else []
    )
    occ: Dict[int, List[int]] = {}
    for vs, i in by_vars:
        for v in vs:
            occ.setdefault(v, []).append(i)
    agg = {"assign": {}, "ranges": {}, "subs": {}, "contradiction": False}
    seen_groups: Set[Tuple[int, ...]] = set()
    max_closed_vars = 2 * max_group_vars
    fact_vars = [e.variables() for e, _ in (facts or [])]
    fact_occ: Dict[int, List[int]] = {}
    for fi, fv in enumerate(fact_vars):
        for v in fv:
            fact_occ.setdefault(v, []).append(fi)
    # vars eligible to be pulled into a group closure, computed once —
    # checking range smallness per (seed, candidate, var) dominated the
    # pass (tens of millions of RangeConstraint calls on keccak)
    small_vars: Set[int] = {
        v
        for v, r in ranges.items()
        if r is not None and not r.is_wrapping() and r.range_size() <= 4
    }
    # per-candidate non-small vars, computed once: a candidate can only
    # join a group closure when its non-small vars already lie inside the
    # group, so checking `nonsmall <= vs` FIRST rejects almost everything
    # before any set difference is built (the per-seed set math over all
    # candidates dominated the pass otherwise)
    nonsmall_c = [vs - small_vars for vs, _ in by_vars]
    nonsmall_f = [fv - small_vars for fv in fact_vars]
    seen_seeds: Set[Tuple[int, ...]] = set()
    for vs0, idx in by_vars:
        if not vs0 or len(vs0) > max_group_vars:
            continue
        # identical seed var-sets close to identical groups: skip the
        # closure loop for repeats (keccak has thousands of same-shape
        # constraint families)
        seed_key = tuple(sorted(vs0))
        if seed_key in seen_seeds:
            continue
        seen_seeds.add(seed_key)
        # closure: pull in constraints (and range facts — the shift-marker
        # selection lives in a range check spanning two one-hot families)
        # that add a few small-range vars to the group; only multi-var
        # seeds close (single-var seeds are the thousands of boolean
        # squares, whose groups need no completion)
        vs = set(vs0)
        if len(vs0) >= 3:
            for _ in range(2):
                cand0 = set()
                fand0 = set()
                for v in vs:
                    cand0.update(occ.get(v, ()))
                    fand0.update(fact_occ.get(v, ()))
                cand_pairs = [(by_vars[i][0], nonsmall_c[i]) for i in cand0]
                cand_pairs += [(fact_vars[i], nonsmall_f[i]) for i in fand0]
                for cset, nonsmall in cand_pairs:
                    if not nonsmall <= vs:
                        continue
                    extra = cset - vs
                    if not extra or len(extra) > 6 or len(vs) + len(extra) > max_closed_vars:
                        continue
                    vs |= extra
        key = tuple(sorted(vs))
        if key in seen_groups:
            continue
        seen_groups.add(key)
        cand = set()
        for v in vs:
            cand.update(occ.get(v, ()))
        contained = sorted(i for i in cand if by_vars[i][0] <= vs)
        if cache is not None:
            # skip a group whose inputs (constraints, ranges, facts) are
            # unchanged since a prior pass that yielded no deductions —
            # the optimizer fixpoint re-sweeps mostly-converged systems
            fp = hash((
                tuple(sorted(key_hash[i] for i in contained)),
                tuple((v, (ranges[v].min, ranges[v].max, ranges[v].mask)) if v in ranges else (v, None) for v in key),
            ))
            if cache.get(key) == fp:
                continue
            cache[key] = fp
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
        group_cons = [system.constraints[i] for i in contained]
        fcand = set()
        for v in vs:
            fcand.update(fact_occ.get(v, ()))
        group_facts = [
            (facts[i][0], facts[i][1]) for i in fcand if fact_vars[i] and fact_vars[i] <= vs
        ]
        res = search_group(group_cons, var_values, group_facts)
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
