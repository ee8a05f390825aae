"""Execution-bridge bus collapsing.

Counterpart of the reference's optimize_exec_bus
(/root/reference/autoprecompiles/src/optimizer.rs:199-249): inside a basic
block, instruction i's execution-bridge *send* (next pc/timestamp/state)
must match instruction i+1's *receive* (its from-state, all free witness
variables).  Unifying them (substituting the receive's free vars with the
send's expressions, and the next instruction's guard with the previous
one's) removes both interactions; only the block's first receive and last
send remain.  This also rebases every instruction's timestamp onto the
block entry timestamp, which is what enables the memory optimizer."""
from __future__ import annotations

from typing import Optional, Tuple

from ..solver.constraint_system import IndexedSystem
from ..solver.grouped_expression import GroupedExpression as GE, P
from .optimizer import OptimizerState


def split_sign(mult: GE) -> Optional[Tuple[int, GE]]:
    """Normalize mult to (sign, guard) with a canonical 'positive' guard."""
    m = mult.normalized()
    c = m.try_to_constant()
    if c is not None:
        if c == 0:
            return None
        if c <= P // 2:
            return (1, GE.from_const(c))
        return (-1, GE.from_const((-c) % P))
    if m.is_affine() and len(m.linear) == 1 and m.constant == 0:
        ((v, coeff),) = m.linear.items()
        if coeff <= P // 2:
            return (1, GE.from_var(v).scale(coeff))
        return (-1, GE.from_var(v).scale((-coeff) % P))
    neg = (-m).normalized()
    if m.key() <= neg.key():
        return (1, m)
    return (-1, neg)


def _unify(idx_sys: IndexedSystem, state: OptimizerState, a: GE, b: GE) -> bool:
    """Make b equal a: substitute a simple var, solve an affine difference
    for any of its variables, or (fallback) add a - b = 0 as an explicit
    constraint — all three preserve the equality needed to cancel the
    interaction pair."""
    diff = (a - b).normalized()
    if diff.is_zero():
        return True
    v = b.try_to_simple_var()
    if v is not None and v not in a.variables():
        state.derived.append((v, a))
        idx_sys.substitute(v, a)
        return True
    v = a.try_to_simple_var()
    if v is not None and v not in b.variables():
        state.derived.append((v, b))
        idx_sys.substitute(v, b)
        return True
    if diff.is_affine() and diff.linear:
        # prefer eliminating a variable of b (the "later" side)
        cands = sorted(diff.linear, key=lambda u: (u not in b.variables(), u))
        v = cands[0]
        repl = diff.solve_for(v)
        if repl is not None:
            state.derived.append((v, repl))
            idx_sys.substitute(v, repl)
            return True
    idx_sys.append_constraint(diff)
    return True


def collapse_exec_bus(state: OptimizerState, exec_bus_id: int) -> None:
    sys = state.system
    idx_sys = IndexedSystem(sys)
    slots = [i for i, b in enumerate(sys.bus_interactions) if b.id == exec_bus_id]
    if len(slots) < 4:
        return
    drop = set()
    # machine order: recv_0, send_0, recv_1, send_1, ...; collapse each
    # (send_j, recv_{j+1}) pair, refetching after substitutions
    j = 1
    while j + 1 < len(slots):
        i_send, i_recv = slots[j], slots[j + 1]
        send = sys.bus_interactions[i_send]
        recv = sys.bus_interactions[i_recv]
        ss = split_sign(send.mult)
        rs = split_sign(recv.mult)
        if ss is None or rs is None or ss[0] != 1 or rs[0] != -1 or len(send.args) != len(recv.args):
            j += 2
            continue
        if not _unify(idx_sys, state, ss[1], rs[1]):
            j += 2
            continue
        ok = True
        for a_idx in range(len(send.args)):
            if not _unify(idx_sys, state, send.args[a_idx], recv.args[a_idx]):
                ok = False
                break
        if ok:
            drop.add(i_send)
            drop.add(i_recv)
        j += 2
    if drop:
        sys.bus_interactions = [b for i, b in enumerate(sys.bus_interactions) if i not in drop]
