"""AIR definition, LogUp permutation argument, and constraint evaluation.

An `Air` is row-local constraints + bus interactions, the same shape as the
reference's `SymbolicMachine` (constraints + bus_interactions,
`/root/reference/autoprecompiles/src/symbolic_machine.rs:115-124`) and
OpenVM's instruction AIRs (which are row-local by construction — rotation
references are rejected at extraction, `openvm/src/utils.rs:43-57`).

The LogUp argument (the reference's bus semantics: every interaction is a
signed multiset contribution keyed by bus id) is compiled here into:
  * helper columns h_G per degree-bounded batch G of interactions,
        h_G * prod_t f_t  ==  sum_t m_t * prod_{t' != t} f_t'
    with fingerprint f_t = alpha + beta^0*bus_id + sum_j beta^(j+1)*arg_j,
  * one running-sum column s with first/transition/last-row constraints,
  * a per-chip cumulative total; the verifier checks chip totals sum to 0.

Constraint evaluation runs under the generic IR evaluator with a
base/extension mixed algebra on device arrays (SURVEY.md §7: the AIR->XLA
compiler replacing the CUDA bytecode VM)."""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import babybear as bb
from ..field import ext
from ..ir import expression as ir
from .config import StarkConfig
from .pcs import ExtVal, py_ext_add, py_ext_sub, py_ext_pow
from .fri import _pow_table

ALPHA_LOGUP = "logup_alpha"
BETA_LOGUP = "logup_beta"
TOTAL_LOGUP = "logup_total"


@dataclass
class Interaction:
    """Signed multiset contribution to bus `bus_id`.

    Send convention: positive multiplicity; a receive is a send with
    negated multiplicity (mirrors the reference's signed LogUp mults)."""

    bus_id: int
    mult: ir.Expr
    args: List[ir.Expr]

    def fingerprint_degree(self) -> int:
        return max([a.degree() for a in self.args], default=0)


@dataclass
class Air:
    width: int
    constraints: List[ir.Expr]
    interactions: List[Interaction] = field(default_factory=list)
    name: str = "air"
    #: canonical (n, wp) fixed columns committed at setup (vk-bound)
    preprocessed: Optional["np.ndarray"] = None
    #: number of public values the AIR's constraints reference
    num_publics: int = 0

    @property
    def preprocessed_width(self) -> int:
        return 0 if self.preprocessed is None else self.preprocessed.shape[1]

    def max_constraint_degree(self) -> int:
        return max([c.degree() for c in self.constraints], default=0)


def receive(bus_id: int, mult: ir.Expr, args: List[ir.Expr]) -> Interaction:
    return Interaction(bus_id=bus_id, mult=ir.Neg(mult), args=args)


def send(bus_id: int, mult: ir.Expr, args: List[ir.Expr]) -> Interaction:
    return Interaction(bus_id=bus_id, mult=mult, args=args)


# ---------------------------------------------------------------------------
# interaction batching under the degree bound


def batch_interactions(air: Air, max_degree: int) -> List[List[int]]:
    """Greedy grouping of interaction indices so each group constraint
    stays within `max_degree` (reference keeps bus-interaction degree one
    below the identity bound, openvm/src/lib.rs:97-101)."""
    groups: List[List[int]] = []
    cur: List[int] = []
    cur_fp_deg = 0
    for idx, t in enumerate(air.interactions):
        fp = max(t.fingerprint_degree(), 1)
        m_deg = t.mult.degree()
        # adding t: h(1) + sum fp degrees; also m_t * prod others
        new_fp = cur_fp_deg + fp
        bound = max(1 + new_fp, m_deg + new_fp - fp + cur_fp_deg)
        if cur and bound > max_degree:
            groups.append(cur)
            cur = [idx]
            cur_fp_deg = fp
        else:
            cur.append(idx)
            cur_fp_deg = new_fp
    if cur:
        groups.append(cur)
    return groups


# ---------------------------------------------------------------------------
# fingerprint expression + LogUp constraint construction


def _beta_pow_exprs(max_len: int) -> List[ir.Expr]:
    out: List[ir.Expr] = [ir.Const(1)]
    b = ir.Challenge(BETA_LOGUP)
    cur: ir.Expr = b
    for _ in range(max_len):
        out.append(cur)
        cur = ir.Mul(cur, b)
    return out


def fingerprint_expr(t: Interaction, beta_pows: List[ir.Expr]) -> ir.Expr:
    f: ir.Expr = ir.Add(ir.Challenge(ALPHA_LOGUP), ir.Const(t.bus_id))
    for j, a in enumerate(t.args):
        f = ir.Add(f, ir.Mul(beta_pows[j + 1], a))
    return f


def logup_constraints(air: Air, groups: List[List[int]]) -> Tuple[List[ir.Expr], int]:
    """Build the permutation constraints.  Perm columns: [h_0..h_{G-1}, s].
    Returns (constraints, perm_width_ext)."""
    max_args = max([len(t.args) for t in air.interactions], default=0)
    beta_pows = _beta_pow_exprs(max_args)
    cons: List[ir.Expr] = []
    n_groups = len(groups)
    h_tot: Optional[ir.Expr] = None
    for g_idx, group in enumerate(groups):
        ts = [air.interactions[i] for i in group]
        fs = [fingerprint_expr(t, beta_pows) for t in ts]
        prod_all: ir.Expr = fs[0]
        for f in fs[1:]:
            prod_all = ir.Mul(prod_all, f)
        lhs = ir.Mul(ir.PermCol(g_idx), prod_all)
        rhs: Optional[ir.Expr] = None
        for i, t in enumerate(ts):
            term: ir.Expr = t.mult
            for j, f in enumerate(fs):
                if j != i:
                    term = ir.Mul(term, f)
            rhs = term if rhs is None else ir.Add(rhs, term)
        cons.append(ir.Sub(lhs, rhs))
        h_g: ir.Expr = ir.PermCol(g_idx)
        h_tot = h_g if h_tot is None else ir.Add(h_tot, h_g)

    s = ir.PermCol(n_groups)
    s_next = ir.PermCol(n_groups, rot=1)
    cons.append(ir.Mul(ir.IsFirstRow(), s))
    cons.append(ir.Mul(ir.IsTransition(), ir.Sub(s_next, ir.Add(s, h_tot))))
    cons.append(
        ir.Mul(ir.IsLastRow(), ir.Sub(ir.Add(s, h_tot), ir.Challenge(TOTAL_LOGUP)))
    )
    return cons, n_groups + 1


# ---------------------------------------------------------------------------
# device evaluation algebras


def _mixed_algebra(
    main_col,  # (index, rot) -> (n,) base Montgomery
    perm_col,  # (index, rot) -> (n, 4) Montgomery
    challenges: Dict[str, jnp.ndarray],  # name -> (4,) Montgomery
    selectors: Dict[str, jnp.ndarray],
    publics: Optional[Dict[int, int]] = None,
    pre_col=None,  # (index, rot) -> (n,) base Montgomery
) -> ir.Algebra:
    """Values are ('b', (n,)) or ('e', (n,4)); promotion is lazy."""

    def promote(v):
        tag, arr = v
        if tag == "e":
            return arr
        return ext.from_base(arr)

    def add(a, b):
        if a[0] == b[0]:
            return (a[0], bb.add(a[1], b[1]))
        ea, eb = promote(a), promote(b)
        return ("e", ext.add(ea, eb))

    def sub(a, b):
        if a[0] == b[0]:
            return (a[0], bb.sub(a[1], b[1]))
        return ("e", ext.sub(promote(a), promote(b)))

    def mul(a, b):
        if a[0] == "b" and b[0] == "b":
            return ("b", bb.mont_mul(a[1], b[1]))
        if a[0] == "b":
            return ("e", ext.mul_base(b[1], a[1]))
        if b[0] == "b":
            return ("e", ext.mul_base(a[1], b[1]))
        return ("e", ext.mul(a[1], b[1]))

    def neg(a):
        return (a[0], bb.neg(a[1]))

    def const(v):
        return ("b", bb.to_mont(jnp.uint32(v)))

    def challenge(name):
        return ("e", challenges[name])

    def public(i):
        if publics is None:
            raise KeyError(f"public {i} referenced but no publics provided")
        return ("b", bb.to_mont(jnp.uint32(publics[i])))

    return ir.Algebra(
        add=add,
        sub=sub,
        mul=mul,
        neg=neg,
        const=const,
        col=lambda i, r: ("b", main_col(i, r)),
        pre_col=(lambda i, r: ("b", pre_col(i, r))) if pre_col else None,
        perm_col=lambda i, r: ("e", perm_col(i, r)),
        challenge=challenge,
        public=public,
        is_first=lambda: ("b", selectors["is_first"]),
        is_last=lambda: ("b", selectors["is_last"]),
        is_transition=lambda: ("b", selectors["is_transition"]),
    )


# selector tables on the LDE coset ------------------------------------------


@functools.lru_cache(maxsize=None)
def lde_selectors_np(log_n: int, log_blowup: int, shift: int):
    """Base-field selector evaluations over the coset domain (numpy host).

    Z_H(x) = x^n - 1;  L_first = Z_H/(n(x-1));  L_last = Z_H*w^{n-1}
    / (n(x - w^{n-1}));  is_transition = x - w^{n-1}."""
    n = 1 << log_n
    log_N = log_n + log_blowup
    N = 1 << log_N
    x = _pow_table(bb.py_root_of_unity(log_N), N).astype(np.uint64) * (shift % bb.P) % bb.P
    # x^n has period `blowup`: (shift * w_N^j)^n = shift^n * w_b^(j mod b)
    b = 1 << log_blowup
    shift_n = pow(shift, n, bb.P)
    wb = bb.py_root_of_unity(log_blowup) if log_blowup > 0 else 1
    xn_period = np.array([shift_n * pow(wb, j, bb.P) % bb.P for j in range(b)], dtype=np.uint64)
    xn = np.tile(xn_period, N // b)
    z_h = (xn - 1) % bb.P
    n_inv = pow(n, bb.P - 2, bb.P)
    w_last = pow(bb.py_root_of_unity(log_n), n - 1, bb.P)
    return {
        "x": x.astype(np.uint32),
        "z_h": z_h.astype(np.uint32),
        "n_inv": n_inv,
        "w_last": w_last,
    }


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def lde_selectors(log_n: int, log_blowup: int, shift: int) -> Dict[str, jnp.ndarray]:
    """Montgomery selector arrays over the coset (device)."""
    t = lde_selectors_np(log_n, log_blowup, shift)
    x = bb.to_mont(jnp.asarray(t["x"]))
    z_h = bb.to_mont(jnp.asarray(t["z_h"]))
    one = bb.one()
    n_inv = bb.to_mont(jnp.uint32(t["n_inv"]))
    w_last = bb.to_mont(jnp.uint32(t["w_last"]))
    znh = bb.mont_mul(z_h, n_inv)
    is_first = bb.mont_mul(znh, bb.inv(bb.sub(x, one)))
    is_last = bb.mont_mul(bb.mont_mul(znh, w_last), bb.inv(bb.sub(x, w_last)))
    is_transition = bb.sub(x, w_last)
    return {
        "is_first": is_first,
        "is_last": is_last,
        "is_transition": is_transition,
        "z_h": z_h,
        "x": x,
    }


# verifier-side selector values at an extension point ------------------------


def selectors_at_point(z: ExtVal, log_n: int) -> Dict[str, ExtVal]:
    n = 1 << log_n
    zn = py_ext_pow(z, n)
    z_h = py_ext_sub(zn, (1, 0, 0, 0))
    n_inv = pow(n, bb.P - 2, bb.P)
    w_last = pow(bb.py_root_of_unity(log_n), n - 1, bb.P)
    znh = tuple(v * n_inv % bb.P for v in z_h)
    d1 = py_ext_sub(z, (1, 0, 0, 0))
    is_first = ext.py_mul(znh, ext.py_inv(d1))
    dl = py_ext_sub(z, (w_last, 0, 0, 0))
    is_last = ext.py_mul(tuple(v * w_last % bb.P for v in znh), ext.py_inv(dl))
    is_transition = py_ext_sub(z, (w_last, 0, 0, 0))
    return {
        "is_first": is_first,
        "is_last": is_last,
        "is_transition": is_transition,
        "z_h": z_h,
    }


def host_algebra(
    main_at: Dict[Tuple[int, int], ExtVal],
    perm_at: Dict[Tuple[int, int], ExtVal],
    challenges: Dict[str, ExtVal],
    selectors: Dict[str, ExtVal],
    publics: Optional[Dict[int, int]] = None,
    pre_at: Optional[Dict[Tuple[int, int], ExtVal]] = None,
) -> ir.Algebra:
    """Scalar extension-field algebra for the verifier's at-zeta check."""

    def c(v: int) -> ExtVal:
        return (v % bb.P, 0, 0, 0)

    return ir.Algebra(
        add=py_ext_add,
        sub=py_ext_sub,
        mul=ext.py_mul,
        neg=lambda a: tuple((-x) % bb.P for x in a),
        const=c,
        col=lambda i, r: main_at[(i, r)],
        pre_col=(lambda i, r: pre_at[(i, r)]) if pre_at is not None else None,
        perm_col=lambda i, r: perm_at[(i, r)],
        challenge=lambda name: challenges[name],
        public=lambda i: c(publics[i]),
        is_first=lambda: selectors["is_first"],
        is_last=lambda: selectors["is_last"],
        is_transition=lambda: selectors["is_transition"],
    )
