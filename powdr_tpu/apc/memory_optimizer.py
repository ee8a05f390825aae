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
        base_key, off = _addr_parts(b.args[1].normalized())
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
        )

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
                same_addr = (
                    r.space == s.space and r.base_key == s.base_key and r.offset == s.offset
                )
                if same_addr:
                    if r.sign != -1 or r.guard_key != s.guard_key:
                        break
                    # check intervening accesses can't alias
                    blocked = False
                    for mi in range(si + 1, ri):
                        m = accesses[mi]
                        if mi in cancelled_this_round:
                            continue
                        if m.space != s.space and m.space != -1 and s.space != -1:
                            continue
                        if (
                            m.space == s.space
                            and m.base_key == s.base_key
                            and m.offset != s.offset
                        ):
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
                if (r.space == s.space or r.space == -1 or s.space == -1) and (
                    r.base_key != s.base_key
                ):
                    break
    if drop:
        sys.bus_interactions = [b for i, b in enumerate(sys.bus_interactions) if i not in drop]
