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

        # var -> (defining affine F, pseudo id):  F = 0 (pid None, an
        # affine equality) or F = u_pid with u_pid boolean (F*(F-1)=0,
        # the carry form).  A def for v is only admitted when every OTHER
        # real variable in F has a SMALLER id — substitution then strictly
        # decreases the id multiset, so chains terminate and every
        # expression over the same data reaches the same base columns
        # (allocation order puts sources before results, so this resolves
        # pointer limbs -> register bytes -> the oldest shared columns;
        # the reference reaches the same forms through its solver's
        # substitutions + try_solve_for_expr equivalences,
        # constraint-solver/src/solver/base.rs:242-262).
        self.defs = {}

        def admit(f: GE, pid, ci_len: int):
            for v in f.linear:
                if v < 0:
                    continue
                if any(u >= v for u in f.linear if u >= 0 and u != v):
                    continue
                prev = self.defs.get(v)
                if prev is None or ci_len < len(prev[0].linear):
                    self.defs[v] = (f, pid)

        for ci, c in enumerate(constraints):
            f = bool_square_form(c)
            if f is not None:
                admit(f, self._PSEUDO_BASE - ci, len(f.linear))
            elif c.is_affine() and c.linear:
                admit(c, None, len(c.linear))

    def canon(self, expr: GE) -> Optional[GE]:
        if not expr.is_affine():
            return None
        cur = expr
        for _ in range(64):
            target = None
            for v in cur.linear:
                if v >= 0 and v in self.defs and (target is None or v > target):
                    target = v
            if target is None or len(cur.linear) > 24:
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
        return cur  # deep chain: return the partially-canonical form

    @staticmethod
    def provably_different(a: GE, b: GE) -> bool:
        """True if a - b has only pseudo-vars and no {0,1} assignment
        of them makes the difference zero mod P (the reference's
        possible_concrete_values check, utils.rs:49-74, with the carry
        booleans as the enumerated variables)."""
        d = (a - b).normalized()
        real = [v for v in d.linear if v >= 0]
        if real:
            return False
        pseudos = list(d.linear.items())
        if len(pseudos) > 10:
            return False
        sums = {d.constant % P}
        for _, c in pseudos:
            sums = {s % P for s in sums} | {(s + c) % P for s in sums}
        return 0 not in sums


class _DiffReducer:
    """Decides `d != 0 always` for an affine difference d by eliminating
    unbounded variables through the system's affine equalities (including
    carry forms F*(F-1)=0 read as F = u with u boolean) and then
    enumerating the reachable values of the bounded residue.

    This is the working core of the reference's
    are_expressions_known_to_be_different (base.rs:242-262): equivalent
    forms of the two addresses via try_solve_for_expr, then
    possible_concrete_values over the (small) assignment space.  The
    canonical case it discharges: two heap pointers based on different
    registers where one register was computed from the other by an
    in-block add — eliminating the result bytes through the limb/carry
    equations cancels the shared base and leaves
    `K + sum 256^i * (+-carry_i)`, whose 2^k concrete values exclude 0."""

    def __init__(self, constraints, ranges: Dict[int, "RangeConstraint"]):
        from .optimizer import bool_square_form
        from ..solver.range_constraint import RangeConstraint

        self.ranges = ranges
        self.bool_rc = RangeConstraint(0, 1, 1)
        self.booleans: set = set()
        #: var -> list of affine equations (e == 0) usable to eliminate it
        self.eqs: Dict[int, List[GE]] = {}
        pid = _AddrCanon._PSEUDO_BASE
        for ci, c in enumerate(constraints):
            f = bool_square_form(c)
            if f is not None:
                sv = f.try_to_simple_var()
                if sv is not None:
                    self.booleans.add(sv)
                    continue
                eq = f - GE.from_var(pid - ci)  # F = u, u boolean
            elif c.is_affine() and c.linear:
                eq = c
            else:
                continue
            for v in eq.linear:
                if v >= 0:
                    self.eqs.setdefault(v, []).append(eq)
        self.cache: Dict[tuple, bool] = {}

    def _allowed(self, v: int):
        """Sorted candidate values if v has a small known range, else None."""
        if v < 0 or v in self.booleans:
            return (0, 1)
        rc = self.ranges.get(v)
        if rc is None or rc.is_wrapping():
            return None
        size = rc.range_size()
        if size > 16:
            return None
        return tuple(range(rc.min, rc.max + 1))

    def _unbounded(self, d: GE) -> List[int]:
        return [v for v in d.linear if self._allowed(v) is None]

    def exclude_zero(self, d: GE, max_steps: int = 48, max_combos: int = 4096) -> bool:
        d = d.normalized()
        if not d.is_affine():
            return False
        key = d.key()
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        out = self._exclude_zero(d, max_steps, max_combos)
        self.cache[key] = out
        return out

    def _exclude_zero(self, d: GE, max_steps: int, max_combos: int) -> bool:
        eliminated: set = set()
        for _ in range(max_steps):
            unbounded = self._unbounded(d)
            if not unbounded:
                break
            if len(d.linear) > 24:
                return False
            # eliminate the youngest unbounded var (results come after
            # their sources in allocation order, so this walks toward
            # the shared base columns)
            v = max(unbounded)
            best = None
            for eq in self.eqs.get(v, ()):  # pick the equation introducing
                if eq.variables() & eliminated:  # no eliminated vars back
                    continue
                repl = eq.solve_for(v)
                if repl is None:
                    continue
                new_unb = sum(
                    1
                    for u in repl.linear
                    if u not in d.linear and self._allowed(u) is None
                )
                score = (new_unb, len(repl.linear))
                if best is None or score < best[0]:
                    best = (score, repl)
            if best is None or best[0][0] > 2:
                return False
            eliminated.add(v)
            d = d.substitute(v, best[1]).normalized()
            if not d.is_affine():
                return False
        else:
            return False
        # enumerate reachable sums over the bounded variables
        combos = 1
        allowed = {}
        for v in d.linear:
            vals = self._allowed(v)
            if vals is None:
                return False
            combos *= len(vals)
            if combos > max_combos:
                return False
            allowed[v] = vals
        sums = {d.constant % P}
        for v, c in d.linear.items():
            sums = {(s + c * val) % P for s in sums for val in allowed[v]}
            if len(sums) > max_combos:
                return False
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
    # positive results cached across the optimizer fixpoint's repeated
    # sweeps (sound: range knowledge only tightens, so a True stays
    # valid); negatives are only cached within this invocation — a later
    # round's richer knowledge may flip them
    if not hasattr(state, "_mem_excl_cache"):
        state._mem_excl_cache = {}
    _excl_pos: Dict[tuple, bool] = state._mem_excl_cache
    _excl_cache: Dict[tuple, bool] = dict(_excl_pos)

    reducer = _DiffReducer(sys.constraints, state.bus_ranges)

    def _range_distinct(a: GE, b: GE) -> bool:
        d = (a - b).normalized()
        key = d.key()
        hit = _excl_cache.get(key)
        if hit is None:
            hit = False
            if len(d.linear) <= 8:
                for v in d.linear:
                    # only _AddrCanon's pseudo ids are known bits; other
                    # negative ids must NOT be assumed boolean
                    if v <= _AddrCanon._PSEUDO_BASE and v not in _excl_ranges:
                        _excl_ranges[v] = _bool_rc
                hit = affine_value_excluded(d, [0], _excl_ranges)
            if not hit:
                hit = reducer.exclude_zero(d)
            _excl_cache[key] = hit
            if hit:
                _excl_pos[key] = True
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
