"""Aggregation circuit: compile a verification Tape into provable chips.

Two chips realize the tape (reference surface: the aggregation STARKs of
openvm-native-recursion used by /root/reference/openvm-riscv/src/lib.rs:309-325;
the design here is TPU-native — a straight-line op trace rather than a
recursion VM, see stark/tape.py):

* **ExtAlu chip** — one tape op per row.  Witness: operand values a, b, c
  and output o (4 base columns each).  Preprocessed: op-kind selectors,
  wire ids, use flags, output fanout, constant payloads, public one-hots.
  Constraints implement the quartic arithmetic (x^4 = 11) per op kind.

* **Poseidon2 chip** — one permutation per row.  Witness: the 16 input
  lanes plus two columns (x^3 and the S-box output) per S-box, keeping
  every constraint within the degree bound; linear layers stay symbolic.
  Preprocessed: per-lane wire ids, fanouts, and an `active` flag.

The chips are linked by a LogUp **wire bus**: the row that produces wire
w sends (w, value) with multiplicity = number of uses; every use receives
it once.  All multiplicities and wire ids are preprocessed, so the proof
binds the circuit structure through the vk while values remain witness.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from ..ir import expression as ir
from . import tape as tape_mod
from .air import Air, Interaction, receive, send
from .tape import (
    ADD,
    BIT,
    CONST,
    EQ,
    MUL,
    MULADD,
    N_KINDS,
    PUBLIC,
    SELECT,
    SUB,
    WITNESS,
    M4,
    Tape,
)

P = bb.P
WIRE_BUS = 0

W_EXT = 11  # x^4 = 11 (field/ext.py)

# -- ExtAlu chip -------------------------------------------------------------

# witness columns
A0, B0, C0, O0 = 0, 4, 8, 12
ALU_WIDTH = 16

# preprocessed columns
SEL0 = 0  # N_KINDS selectors
WA, WB, WC, WO = N_KINDS, N_KINDS + 1, N_KINDS + 2, N_KINDS + 3
USE_A, USE_B, USE_C, FANOUT = N_KINDS + 4, N_KINDS + 5, N_KINDS + 6, N_KINDS + 7
CV0 = N_KINDS + 8  # 4 constant-payload columns
PUBSEL0 = CV0 + 4  # one-hot per public index


def _ext_mul_exprs(a: List[ir.Expr], b: List[ir.Expr]) -> List[ir.Expr]:
    """Component expressions of (a * b) mod (x^4 - 11)."""
    m = ir.Mul
    w = ir.Const(W_EXT)

    def s(*xs):
        acc = xs[0]
        for x in xs[1:]:
            acc = ir.Add(acc, x)
        return acc

    return [
        s(m(a[0], b[0]), m(w, s(m(a[1], b[3]), m(a[2], b[2]), m(a[3], b[1])))),
        s(m(a[0], b[1]), m(a[1], b[0]), m(w, s(m(a[2], b[3]), m(a[3], b[2])))),
        s(m(a[0], b[2]), m(a[1], b[1]), m(a[2], b[0]), m(w, m(a[3], b[3]))),
        s(m(a[0], b[3]), m(a[1], b[2]), m(a[2], b[1]), m(a[3], b[0])),
    ]


def build_alu_air(n_publics: int) -> Air:
    A = [ir.Col(A0 + k) for k in range(4)]
    B = [ir.Col(B0 + k) for k in range(4)]
    C = [ir.Col(C0 + k) for k in range(4)]
    O = [ir.Col(O0 + k) for k in range(4)]
    sel = [ir.PreCol(SEL0 + k) for k in range(N_KINDS)]
    cons: List[ir.Expr] = []

    for k in range(4):
        cons.append(ir.Mul(sel[CONST], ir.Sub(O[k], ir.PreCol(CV0 + k))))
        cons.append(ir.Mul(sel[ADD], ir.Sub(O[k], ir.Add(A[k], B[k]))))
        cons.append(ir.Mul(sel[SUB], ir.Sub(O[k], ir.Sub(A[k], B[k]))))
        cons.append(ir.Mul(sel[EQ], ir.Sub(A[k], B[k])))
    for k, mk in enumerate(_ext_mul_exprs(A, B)):
        cons.append(ir.Mul(sel[MUL], ir.Sub(O[k], mk)))
        cons.append(ir.Mul(sel[MULADD], ir.Sub(O[k], ir.Add(mk, C[k]))))
    for k in range(4):
        cons.append(
            ir.Mul(
                sel[SELECT],
                ir.Sub(O[k], ir.Add(C[k], ir.Mul(A[0], ir.Sub(B[k], C[k])))),
            )
        )
    cons.append(ir.Mul(sel[BIT], ir.Mul(O[0], ir.Sub(O[0], ir.Const(1)))))
    for k in range(1, 4):
        cons.append(ir.Mul(sel[BIT], O[k]))
    # publics: rows with sel[PUBLIC] carry a one-hot index selector
    for k in range(1, 4):
        cons.append(ir.Mul(sel[PUBLIC], A[k]))
    if n_publics:
        acc: Optional[ir.Expr] = None
        for i in range(n_publics):
            term = ir.Mul(ir.PreCol(PUBSEL0 + i), ir.Sub(A[0], ir.Public(i)))
            acc = term if acc is None else ir.Add(acc, term)
        cons.append(acc)

    inters = [
        receive(WIRE_BUS, ir.PreCol(USE_A), [ir.PreCol(WA)] + A),
        receive(WIRE_BUS, ir.PreCol(USE_B), [ir.PreCol(WB)] + B),
        receive(WIRE_BUS, ir.PreCol(USE_C), [ir.PreCol(WC)] + C),
        send(WIRE_BUS, ir.PreCol(FANOUT), [ir.PreCol(WO)] + O),
    ]
    return Air(
        width=ALU_WIDTH,
        constraints=cons,
        interactions=inters,
        name="agg_alu",
        num_publics=n_publics,
    )


# -- Poseidon2 chip ----------------------------------------------------------
# Optional per-row half-swap: Merkle path steps need compress(sib, cur) or
# compress(cur, sib) by an index bit; doing the swap in-chip (one received
# bit + 16 swapped-state columns) replaces 16 ExtALU select rows per level.

P2_IN0 = 0
P2_SW = 16  # swap bit (0 on rows without use_swap)
P2_SS0 = 17  # swapped state: ss_i = in_i + sw*(in_{i^8} - in_i)
P2_FR1 = 33  # rounds 0..3: x3 at FR1 + r*32 + i, y at + 16
P2_PR = P2_FR1 + 4 * 32  # partial rounds: x3 at PR + 2r, y at PR + 2r + 1
P2_FR2 = P2_PR + 2 * 13  # rounds 4..7
P2_WIDTH = P2_FR2 + 4 * 32

P2_WIN0 = 0
P2_WOUT0 = 16
P2_FAN0 = 32
P2_ACTIVE = 48
P2_WBIT = 49  # wire id of the swap bit
P2_USESWAP = 50
P2_PRE_WIDTH = 51


def _ext_mat_exprs(xs: List[ir.Expr]) -> List[ir.Expr]:
    """Symbolic M_E = circ(2*M4, M4, M4, M4) (tape.ext_mat counterpart)."""

    def cmul(c: int, e: ir.Expr) -> ir.Expr:
        return e if c == 1 else ir.Mul(ir.Const(c), e)

    g: List[List[ir.Expr]] = []
    for i in range(0, 16, 4):
        blk = xs[i : i + 4]
        g.append(
            [
                _sum_exprs([cmul(M4[r][c], blk[c]) for c in range(4)])
                for r in range(4)
            ]
        )
    s = [_sum_exprs([gr[j] for gr in g]) for j in range(4)]
    out: List[ir.Expr] = []
    for gr in g:
        out.extend(ir.Add(gr[j], s[j]) for j in range(4))
    return out


def _sum_exprs(es: Sequence[ir.Expr]) -> ir.Expr:
    acc = es[0]
    for e in es[1:]:
        acc = ir.Add(acc, e)
    return acc


def build_poseidon_air() -> Air:
    rc_ext, rc_int, diag = tape_mod._perm_tables()
    active = ir.PreCol(P2_ACTIVE)
    cons: List[ir.Expr] = []

    def sbox(x_expr: ir.Expr, x3_col: int, y_col: int) -> ir.Expr:
        x3 = ir.Col(x3_col)
        y = ir.Col(y_col)
        cons.append(ir.Mul(active, ir.Sub(x3, ir.Mul(ir.Mul(x_expr, x_expr), x_expr))))
        cons.append(ir.Mul(active, ir.Sub(y, ir.Mul(ir.Mul(x3, x3), x_expr))))
        return y

    # swapped state: sw is a received bit wire (producer constrains
    # booleanness); rows without use_swap force sw = 0 so ss == in
    sw = ir.Col(P2_SW)
    cons.append(ir.Mul(ir.Sub(active, ir.PreCol(P2_USESWAP)), sw))
    for i in range(16):
        a = ir.Col(P2_IN0 + i)
        b = ir.Col(P2_IN0 + (i ^ 8))
        cons.append(
            ir.Mul(active, ir.Sub(ir.Col(P2_SS0 + i), ir.Add(a, ir.Mul(sw, ir.Sub(b, a)))))
        )

    state: List[ir.Expr] = _ext_mat_exprs([ir.Col(P2_SS0 + i) for i in range(16)])
    for r in range(4):
        ys = []
        for i in range(16):
            x = ir.Add(state[i], ir.Const(rc_ext[r][i]))
            ys.append(sbox(x, P2_FR1 + r * 32 + i, P2_FR1 + r * 32 + 16 + i))
        state = _ext_mat_exprs(ys)
    for r in range(13):
        x = ir.Add(state[0], ir.Const(rc_int[r]))
        y = sbox(x, P2_PR + 2 * r, P2_PR + 2 * r + 1)
        state[0] = y
        s = _sum_exprs(state)
        state = [
            ir.Add(s, state[i] if diag[i] == 1 else ir.Mul(ir.Const(diag[i]), state[i]))
            for i in range(16)
        ]
    for r in range(4, 8):
        ys = []
        for i in range(16):
            x = ir.Add(state[i], ir.Const(rc_ext[r][i]))
            ys.append(sbox(x, P2_FR2 + (r - 4) * 32 + i, P2_FR2 + (r - 4) * 32 + 16 + i))
        state = _ext_mat_exprs(ys)

    zero = ir.Const(0)
    inters: List[Interaction] = []
    for i in range(16):
        inters.append(
            receive(
                WIRE_BUS,
                ir.PreCol(P2_ACTIVE),
                [ir.PreCol(P2_WIN0 + i), ir.Col(P2_IN0 + i), zero, zero, zero],
            )
        )
    inters.append(
        receive(
            WIRE_BUS,
            ir.PreCol(P2_USESWAP),
            [ir.PreCol(P2_WBIT), sw, zero, zero, zero],
        )
    )
    for i in range(16):
        inters.append(
            send(
                WIRE_BUS,
                ir.PreCol(P2_FAN0 + i),
                [ir.PreCol(P2_WOUT0 + i), state[i], zero, zero, zero],
            )
        )
    return Air(width=P2_WIDTH, constraints=cons, interactions=inters, name="agg_poseidon2")


# -- trace generation --------------------------------------------------------


def _pad_pow2(n: int) -> int:
    n = max(n, 2)
    return 1 << int(np.ceil(np.log2(n)))


def _fanouts(t: Tape) -> np.ndarray:
    fan = np.zeros(len(t.vals), dtype=np.int64)
    for op in t.alu:
        if op.kind == WITNESS:
            continue  # a/b/c slots are extra OUTPUTS on witness rows
        for wid, used in ((op.a, True), (op.b, True), (op.c, True)):
            if wid >= 0:
                fan[wid] += 1
    for perm in t.perms:
        for wid in perm.ins:
            fan[wid] += 1
        if perm.swap >= 0:
            fan[perm.swap] += 1
    return fan


def build_alu_trace(t: Tape, fan: np.ndarray) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """Returns (main (n, 16) canonical, pre (n, pre_w) canonical, publics)."""
    n_ops = len(t.alu)
    n = _pad_pow2(n_ops)
    vals = np.asarray(t.vals, dtype=np.uint32).reshape(-1, 4)
    pre_w = PUBSEL0 + t.n_publics
    main = np.zeros((n, ALU_WIDTH), dtype=np.uint32)
    pre = np.zeros((n, pre_w), dtype=np.uint32)
    publics: List[int] = [0] * t.n_publics

    kinds = np.array([op.kind for op in t.alu], dtype=np.int64)
    aw = np.array([op.a for op in t.alu], dtype=np.int64)
    bw = np.array([op.b for op in t.alu], dtype=np.int64)
    cw = np.array([op.c for op in t.alu], dtype=np.int64)
    ow = np.array([op.out for op in t.alu], dtype=np.int64)
    r = np.arange(n_ops)

    for base, wids in ((A0, aw), (B0, bw), (C0, cw), (O0, ow)):
        mask = wids >= 0
        main[r[mask], base : base + 4] = vals[wids[mask]]
    pre[r, SEL0 + kinds] = 1
    for col, wids in ((WA, aw), (WB, bw), (WC, cw), (WO, ow)):
        mask = wids >= 0
        pre[r[mask], col] = wids[mask].astype(np.uint32)
    pre[r[aw >= 0], USE_A] = 1
    pre[r[bw >= 0], USE_B] = 1
    pre[r[cw >= 0], USE_C] = 1
    mask = ow >= 0
    pre[r[mask], FANOUT] = fan[ow[mask]].astype(np.uint32)
    # witness rows: a/b/c are extra outputs — the receive interaction with
    # multiplicity -(fanout) IS a send of multiplicity fanout on the bus
    wit = kinds == WITNESS
    for col, wids in ((USE_A, aw), (USE_B, bw), (USE_C, cw)):
        m = wit & (wids >= 0)
        f = fan[wids[m]]
        pre[r[m], col] = np.where(f > 0, (P - f) % P, 0).astype(np.uint32)
    for i, op in enumerate(t.alu):
        if op.kind == CONST:
            pre[i, CV0 : CV0 + 4] = np.asarray(op.cval, dtype=np.uint32)
        elif op.kind == PUBLIC:
            pre[i, PUBSEL0 + op.pub] = 1
            publics[op.pub] = int(t.vals[op.a][0])
    return main, pre, publics


def build_poseidon_trace(t: Tape, fan: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    rc_ext, rc_int, diag = tape_mod._perm_tables()
    n_rows = len(t.perms)
    n = _pad_pow2(n_rows)
    main = np.zeros((n, P2_WIDTH), dtype=np.uint32)
    pre = np.zeros((n, P2_PRE_WIDTH), dtype=np.uint32)
    if n_rows == 0:
        return main, pre

    vals = np.asarray(t.vals, dtype=np.uint32).reshape(-1, 4)
    ins = np.array([p.ins for p in t.perms], dtype=np.int64)  # (m, 16)
    outs = np.array([p.outs for p in t.perms], dtype=np.int64)
    swaps = np.array([p.swap for p in t.perms], dtype=np.int64)
    raw = vals[ins][:, :, 0].astype(np.uint64)  # (m, 16) canonical
    main[:n_rows, P2_IN0 : P2_IN0 + 16] = raw.astype(np.uint32)
    sw = np.where(swaps >= 0, vals[np.maximum(swaps, 0)][:, 0], 0).astype(np.uint64)
    main[:n_rows, P2_SW] = sw.astype(np.uint32)
    x = np.where(sw[:, None] == 1, np.roll(raw, 8, axis=1), raw)
    main[:n_rows, P2_SS0 : P2_SS0 + 16] = x.astype(np.uint32)

    def ext_mat_np(x: np.ndarray) -> np.ndarray:
        g = x.reshape(-1, 4, 4)
        m4 = np.asarray(M4, dtype=np.uint64)
        g = np.einsum("rc,bkc->bkr", m4, g) % P
        s = g.sum(axis=1) % P
        return ((g + s[:, None, :]) % P).reshape(-1, 16)

    def sbox_np(v: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        x3 = v * v % P * v % P
        return x3, x3 * x3 % P * v % P

    st = ext_mat_np(x)
    for r in range(4):
        xi = (st + np.asarray(rc_ext[r], dtype=np.uint64)) % P
        x3, y = sbox_np(xi)
        main[:n_rows, P2_FR1 + r * 32 : P2_FR1 + r * 32 + 16] = x3.astype(np.uint32)
        main[:n_rows, P2_FR1 + r * 32 + 16 : P2_FR1 + r * 32 + 32] = y.astype(np.uint32)
        st = ext_mat_np(y)
    for r in range(13):
        xi = (st[:, 0] + rc_int[r]) % P
        x3, y = sbox_np(xi)
        main[:n_rows, P2_PR + 2 * r] = x3.astype(np.uint32)
        main[:n_rows, P2_PR + 2 * r + 1] = y.astype(np.uint32)
        st[:, 0] = y
        s = st.sum(axis=1) % P
        st = (s[:, None] + st * np.asarray(diag, dtype=np.uint64)) % P
    for r in range(4, 8):
        xi = (st + np.asarray(rc_ext[r], dtype=np.uint64)) % P
        x3, y = sbox_np(xi)
        main[:n_rows, P2_FR2 + (r - 4) * 32 : P2_FR2 + (r - 4) * 32 + 16] = x3.astype(np.uint32)
        main[:n_rows, P2_FR2 + (r - 4) * 32 + 16 : P2_FR2 + (r - 4) * 32 + 32] = y.astype(
            np.uint32
        )
        st = ext_mat_np(y)
    # cross-check the vectorized witgen against the tape's canonical model
    expect = vals[outs][:, :, 0].astype(np.uint64)
    assert (st == expect).all(), "poseidon witgen mismatch vs tape"

    pre[:n_rows, P2_WIN0 : P2_WIN0 + 16] = ins.astype(np.uint32)
    pre[:n_rows, P2_WOUT0 : P2_WOUT0 + 16] = outs.astype(np.uint32)
    pre[:n_rows, P2_FAN0 : P2_FAN0 + 16] = fan[outs].astype(np.uint32)
    pre[:n_rows, P2_ACTIVE] = 1
    pre[:n_rows, P2_WBIT] = np.maximum(swaps, 0).astype(np.uint32)
    pre[:n_rows, P2_USESWAP] = (swaps >= 0).astype(np.uint32)
    return main, pre


@dataclass
class AggregationCircuit:
    airs: List[Air]
    traces: List[jnp.ndarray]
    publics: List[Optional[List[int]]]


def mock_check_airs(
    airs: Sequence[Air],
    traces: Sequence[jnp.ndarray],
    publics: Sequence[Optional[List[int]]],
) -> None:
    """Cheap full satisfiability check (no FRI): every row-local constraint
    must vanish on the trace domain, and the LogUp bus totals across the
    chips must sum to zero under random challenges.  Counterpart of
    vm.system.mock_check for generic Airs."""
    from . import prover as prover_mod
    from ..field import ext as ext_mod
    from ..ir import expression as ir_mod

    rng = np.random.default_rng(7)
    alpha = tuple(int(v) for v in rng.integers(1, P, size=4))
    beta = tuple(int(v) for v in rng.integers(1, P, size=4))
    total = (0, 0, 0, 0)
    for air, trace, pub in zip(airs, traces, publics):
        n = trace.shape[0]
        log_n = int(np.log2(n))
        sel = prover_mod._trace_selectors(log_n)
        pre = (
            bb.to_mont(jnp.asarray(air.preprocessed.astype(np.uint32)))
            if air.preprocessed is not None
            else None
        )
        from .air import _mixed_algebra

        alg = _mixed_algebra(
            main_col=lambda i, r: prover_mod._roll_rows(trace[:, i], r, 1),
            perm_col=lambda i, r: (_ for _ in ()).throw(ValueError("no perm")),
            challenges={},
            selectors=sel,
            publics=dict(enumerate(pub)) if pub else None,
            pre_col=(lambda i, r: prover_mod._roll_rows(pre[:, i], r, 1))
            if pre is not None
            else None,
        )
        cache: Dict[int, object] = {}
        for ci, con in enumerate(air.constraints):
            tag, arr = ir_mod.evaluate(con, alg, cache)
            bad = np.nonzero(np.asarray(arr))[0]
            assert bad.size == 0, (
                f"{air.name}: constraint {ci} violated at rows {bad[:8]}"
            )
        if air.interactions:
            from .air import batch_interactions

            groups = batch_interactions(air, 4)
            _, tot = prover_mod.build_perm_trace(air, trace, groups, alpha, beta, pre_trace=pre)
            total = tuple((x + y) % P for x, y in zip(total, tot))
    assert total == (0, 0, 0, 0), f"wire bus imbalance: {total}"


def compile_tape(t: Tape) -> AggregationCircuit:
    """Compile a verification tape into the two aggregation chips."""
    fan = _fanouts(t)
    alu_main, alu_pre, publics = build_alu_trace(t, fan)
    p2_main, p2_pre = build_poseidon_trace(t, fan)

    alu_air = build_alu_air(t.n_publics)
    alu_air.preprocessed = alu_pre
    p2_air = build_poseidon_air()
    p2_air.preprocessed = p2_pre

    return AggregationCircuit(
        airs=[alu_air, p2_air],
        traces=[
            bb.to_mont(jnp.asarray(alu_main)),
            bb.to_mont(jnp.asarray(p2_main)),
        ],
        publics=[publics, None],
    )
