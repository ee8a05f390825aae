"""Memory bus optimizer.

Counterpart of /root/reference/autoprecompiles/src/memory_optimizer.rs:16-46:
after exec-bus collapsing rebases all timestamps onto the block entry,
consecutive accesses to a provably-equal address form send->receive pairs
whose data must agree (the memory LogUp argument with ordered timestamps
admits no other matching inside the block).  Unifying the receive's free
prev-data/prev-timestamp variables with the preceding send's expressions
cancels both interactions and eliminates their columns.

Aliasing care: a pair is only cancelled when every memory access with a
timestamp strictly between the two is provably at a different address
(same base expression, different constant offset, or different constant
address space).  Unknown addresses act as barriers."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from ..solver.constraint_system import IndexedSystem
from ..solver.grouped_expression import GroupedExpression as GE, P
from .exec_bus import _unify, split_sign
from .optimizer import OptimizerState


@dataclass
class _Access:
    slot: int  # index into bus_interactions
    sign: int  # +1 send, -1 receive
    guard_key: tuple
    space: int  # constant address space
    base_key: tuple  # canonical key of pointer minus constant offset
    offset: int
    ts_base_key: Optional[tuple]  # timestamp base (None for receive prev-ts var)
    ts_offset: Optional[int]
    canon: Optional[GE] = None  # address over shared vars + carry pseudo-vars


class _AddrCanon:
    """Rewrites addresses over per-access private limbs into canonical
    form over shared variables plus boolean carry pseudo-variables.

    Each load/store instance decomposes its pointer into private limbs
    via carry constraints F*(F-1)=0 with F affine (F is the carry).
    Solving F = u for the limb (u a fresh pseudo-variable in {0,1},
    one per carry constraint) expresses the address over the shared
    register limbs plus the carries.  Two canonical addresses whose
    difference has no real variables and whose pseudo-variable
    combinations never sum to zero are provably different — the
    aliasing test the reference gets from its solver's
    `are_expressions_known_to_be_different`
    (constraint-solver/src/solver/base.rs:243-262)."""

    _PSEUDO_BASE = -1_000_000

    def __init__(self, constraints):
        from ..apc.optimizer import bool_square_form

        # var -> (defining F, pseudo id); only private limbs (vars in at
        # most 2 algebraic constraints — shared register limbs appear in
        # many) get definitions, and the F with fewest vars (the
        # low-carry constraint) wins so substitution chains terminate
        counts: dict = {}
        for c in constraints:
            for v in c.variables():
                counts[v] = counts.get(v, 0) + 1
        self.defs = {}
        for ci, c in enumerate(constraints):
            f = bool_square_form(c)
            if f is None:
                # affine equalities (word-compose constraints like
                # word = b0 + 256*b1 + ... - C) also rewrite private vars
                # onto shared bases — pseudo id None marks "exact, no
                # carry variable"
                if c.is_affine() and c.linear:
                    for v in c.linear:
                        if counts.get(v, 0) > 2:
                            continue
                        prev = self.defs.get(v)
                        if prev is None or len(c.linear) < len(prev[0].linear):
                            self.defs[v] = (c, None)
                continue
            pid = self._PSEUDO_BASE - ci
            for v in f.linear:
                if counts.get(v, 0) > 2:
                    continue
                prev = self.defs.get(v)
                if prev is None or len(f.linear) < len(prev[0].linear):
                    self.defs[v] = (f, pid)

    def canon(self, expr: GE) -> Optional[GE]:
        if not expr.is_affine():
            return None
        cur = expr
        for _ in range(8):  # chain: high limb -> low limb -> shared
            target = None
            for v in cur.linear:
                if v >= 0 and v in self.defs:
                    target = v
                    break
            if target is None:
                return cur
            f, pid = self.defs[target]
            # carry defs: F = u  =>  limb = solve_for(target) of (F - u);
            # affine equality defs (pid None): F = 0 directly
            g = f if pid is None else (f - GE.from_var(pid))
            repl = g.solve_for(target)
            if repl is None:
                return None
            coeff = cur.linear[target]
            cur = GE(
                linear={u: c for u, c in cur.linear.items() if u != target},
                constant=cur.constant,
            ) + repl.scale(coeff)
        return None  # substitution chain too deep (cycle guard)

    @staticmethod
    def provably_different(a: GE, b: GE) -> bool:
        """True if a - b has only pseudo-vars and no {0,1} assignment
        of them makes the difference zero mod P."""
        d = (a - b).normalized()
        real = [v for v in d.linear if v >= 0]
        if real:
            return False
        pseudos = list(d.linear.items())
        if len(pseudos) > 6:
            return False
        sums = {d.constant % P}
        for _, c in pseudos:
            sums = {s % P for s in sums} | {(s + c) % P for s in sums}
        return 0 not in sums


def _addr_parts(ptr: GE) -> Tuple[tuple, int]:
    base = GE(linear=dict(ptr.linear), quadratic=list(ptr.quadratic))
    return base.key(), ptr.constant


def _ts_parts(ts: GE) -> Optional[Tuple[tuple, int]]:
    t = ts.normalized()
    if not t.is_affine() or len(t.linear) != 1:
        return None
    return _addr_parts(t)


def optimize_memory(state: OptimizerState, memory_bus_id: int) -> None:
    sys = state.system
    idx_sys = IndexedSystem(sys)
    canoniser = _AddrCanon(sys.constraints)

    # interval-based aliasing fallback: two addresses are provably
    # different when their difference excludes 0 under the solver's range
    # knowledge (the reference gets this from
    # are_expressions_known_to_be_different's range arithmetic)
    from .optimizer import affine_value_excluded
    from ..solver.range_constraint import RangeConstraint

    _excl_ranges = dict(state.bus_ranges)
    _bool_rc = RangeConstraint(0, 1, 1)
    # cache shared across the optimizer fixpoint's repeated sweeps (sound:
    # range knowledge only tightens, so a cached True stays valid and a
    # cached False merely misses a late-round opportunity)
    if not hasattr(state, "_mem_excl_cache"):
        state._mem_excl_cache = {}
    _excl_cache: Dict[tuple, bool] = state._mem_excl_cache

    def _range_distinct(a: GE, b: GE) -> bool:
        d = (a - b).normalized()
        if len(d.linear) > 8:
            return False  # interval analysis is hopeless on wide diffs
        key = d.key()
        hit = _excl_cache.get(key)
        if hit is None:
            for v in d.linear:
                # only _AddrCanon's pseudo ids are known bits; other
                # negative ids must NOT be assumed boolean
                if v <= _AddrCanon._PSEUDO_BASE and v not in _excl_ranges:
                    _excl_ranges[v] = _bool_rc
            hit = affine_value_excluded(d, [0], _excl_ranges)
            _excl_cache[key] = hit
        return hit

    def parse(i) -> Optional[_Access]:
        b = sys.bus_interactions[i]
        if len(b.args) < 3:
            return None
        s = split_sign(b.mult)
        if s is None:
            return None
        space = b.args[0].normalized().try_to_constant()
        if space is None:
            # unknown address space: representable, but acts as a universal
            # aliasing barrier (space = -1 never equals a constant space)
            space = -1
        addr = b.args[1].normalized()
        base_key, off = _addr_parts(addr)
        tp = _ts_parts(b.args[-1])
        return _Access(
            slot=i,
            sign=s[0],
            guard_key=s[1].key(),
            space=space,
            base_key=base_key,
            offset=off,
            ts_base_key=tp[0] if tp else None,
            ts_offset=tp[1] if tp else None,
            canon=canoniser.canon(addr),
        )

    def same_addr(a: _Access, b: _Access) -> bool:
        if a.space != b.space:
            return False
        if a.base_key == b.base_key and a.offset == b.offset:
            return True
        if a.canon is not None and b.canon is not None:
            return (a.canon - b.canon).normalized().is_zero()
        return False

    def provably_distinct(a: _Access, b: _Access) -> bool:
        if a.space != b.space and a.space != -1 and b.space != -1:
            return True
        if a.space == b.space and a.base_key == b.base_key and a.offset != b.offset:
            return True
        if a.canon is not None and b.canon is not None:
            if _AddrCanon.provably_different(a.canon, b.canon):
                return True
            return _range_distinct(a.canon, b.canon)
        return False

    mem_slots = [i for i, b in enumerate(sys.bus_interactions) if b.id == memory_bus_id]
    drop = set()
    changed = True
    while changed:
        changed = False
        accesses = []
        for i in mem_slots:
            if i in drop:
                continue
            a = parse(i)
            if a is None:
                return
            accesses.append(a)
        cancelled_this_round = set()
        # program order: the generator emits accesses in timestamp order
        # within the block; sends carry concrete ts offsets, receives carry
        # free prev-ts vars matched to their paired send.  Pair rule: a
        # send S and the NEXT access R to the same (space, base, offset)
        # with R a receive, no intervening access to a possibly-aliasing
        # address.  Many pairs cancel per scan (substitutions only replace
        # equals-by-equals, so stale parse keys stay sound; newly-enabled
        # pairs are caught by the next round).
        for si in range(len(accesses)):
            s = accesses[si]
            if s.sign != 1 or si in cancelled_this_round:
                continue
            for ri in range(si + 1, len(accesses)):
                r = accesses[ri]
                if ri in cancelled_this_round:
                    continue
                if same_addr(s, r):
                    if r.sign != -1 or r.guard_key != s.guard_key:
                        break
                    # check intervening accesses can't alias
                    blocked = False
                    for mi in range(si + 1, ri):
                        m = accesses[mi]
                        if mi in cancelled_this_round:
                            continue
                        if provably_distinct(m, s):
                            continue
                        blocked = True
                        break
                    if blocked:
                        break
                    send_b = sys.bus_interactions[s.slot]
                    recv_b = sys.bus_interactions[r.slot]
                    if len(send_b.args) != len(recv_b.args):
                        break
                    ok = True
                    for k in range(2, len(send_b.args)):
                        if not _unify(idx_sys, state, send_b.args[k], recv_b.args[k]):
                            ok = False
                            break
                    if ok:
                        drop.add(s.slot)
                        drop.add(r.slot)
                        cancelled_this_round.add(si)
                        cancelled_this_round.add(ri)
                        changed = True
                    break
                # different address with unknown relation -> barrier
                if not provably_distinct(s, r):
                    break
    if drop:
        sys.bus_interactions = [b for i, b in enumerate(sys.bus_interactions) if i not in drop]
