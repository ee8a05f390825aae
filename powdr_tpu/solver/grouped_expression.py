"""GroupedExpression: canonical quadratic + linear + constant form.

Counterpart of the reference's core solver representation
(/root/reference/constraint-solver/src/grouped_expression.rs:37-48):
an expression is kept as
    sum_i (l_i * r_i)  +  sum_v coeff_v * v  +  constant
with the quadratic pairs unexpanded.  All coefficients are canonical
BabyBear ints; variables are integer ids (names live in a side table).

This is the hot data structure of the host-plane compiler; the pure-python
implementation is the semantic reference, with the heavy inner loops
(bulk substitution over indexed systems) designed so a C++ core can slot
in underneath (see native/)."""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

from ..ir import expression as ir

P = 2013265921


class GroupedExpression:
    __slots__ = ("quadratic", "linear", "constant", "_key", "_norm", "_vars")

    def __init__(
        self,
        quadratic: Optional[List[Tuple["GroupedExpression", "GroupedExpression"]]] = None,
        linear: Optional[Dict[int, int]] = None,
        constant: int = 0,
    ):
        self.quadratic = quadratic or []
        self.linear = {v: c % P for v, c in (linear or {}).items() if c % P}
        self.constant = constant % P

    @classmethod
    def _raw(cls, quadratic, linear, constant) -> "GroupedExpression":
        """Construct WITHOUT canonicalizing — internal arithmetic already
        produces reduced, zero-free coefficients; the __init__ dict sweep
        was the solver's hottest line on big systems."""
        self = object.__new__(cls)
        self.quadratic = quadratic
        self.linear = linear
        self.constant = constant
        return self

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_const(c: int) -> "GroupedExpression":
        return GroupedExpression(constant=c)

    @staticmethod
    def from_var(v: int) -> "GroupedExpression":
        return GroupedExpression(linear={v: 1})

    # -- predicates ----------------------------------------------------------

    def is_zero(self) -> bool:
        return not self.quadratic and not self.linear and self.constant == 0

    def is_affine(self) -> bool:
        return not self.quadratic

    def try_to_constant(self) -> Optional[int]:
        if not self.quadratic and not self.linear:
            return self.constant
        return None

    def try_to_simple_var(self) -> Optional[int]:
        """v if expression == 1 * v."""
        if not self.quadratic and self.constant == 0 and len(self.linear) == 1:
            ((v, c),) = self.linear.items()
            if c == 1:
                return v
        return None

    def degree(self) -> int:
        d = 1 if self.linear else 0
        for l, r in self.quadratic:
            d = max(d, l.degree() + r.degree())
        return d

    def variables(self) -> frozenset:
        v = getattr(self, "_vars", None)
        if v is None:
            out = set(self.linear)
            for l, r in self.quadratic:
                out |= l.variables()
                out |= r.variables()
            self._vars = v = frozenset(out)
        return v

    # -- arithmetic ----------------------------------------------------------

    def __add__(self, other: "GroupedExpression") -> "GroupedExpression":
        lin = dict(self.linear)
        for v, c in other.linear.items():
            s = (lin.get(v, 0) + c) % P
            if s:
                lin[v] = s
            elif v in lin:
                del lin[v]
        return GroupedExpression._raw(
            self.quadratic + other.quadratic,
            lin,
            (self.constant + other.constant) % P,
        )

    def __sub__(self, other: "GroupedExpression") -> "GroupedExpression":
        return self + (-other)

    def __neg__(self) -> "GroupedExpression":
        return self.scale(P - 1)

    def scale(self, c: int) -> "GroupedExpression":
        c %= P
        if c == 0:
            return GroupedExpression()
        if c == 1:
            return self
        # c != 0 and P prime: k*c stays nonzero, no re-filter needed
        return GroupedExpression._raw(
            [(l.scale(c), r) for l, r in self.quadratic],
            {v: k * c % P for v, k in self.linear.items()},
            self.constant * c % P,
        )

    def __mul__(self, other: "GroupedExpression") -> "GroupedExpression":
        sc = self.try_to_constant()
        if sc is not None:
            return other.scale(sc)
        oc = other.try_to_constant()
        if oc is not None:
            return self.scale(oc)
        return GroupedExpression._raw([(self, other)], {}, 0)

    def eval(self, assignment: Dict[int, int]) -> int:
        """Evaluate under a (complete) variable assignment."""
        acc = self.constant
        for v, c in self.linear.items():
            acc = (acc + c * assignment[v]) % P
        for l, r in self.quadratic:
            acc = (acc + l.eval(assignment) * r.eval(assignment)) % P
        return acc

    # -- substitution --------------------------------------------------------

    def substitute(self, v: int, repl: "GroupedExpression") -> "GroupedExpression":
        """Replace variable v by `repl` (returns a normalized copy).

        Accumulates into one mutable (quad, linear, constant) triple
        instead of chaining `__add__` copies — the add chain re-copied the
        full linear dict once per quadratic pair, which dominated solver
        substitution time on large systems."""
        lin = {u: c for u, c in self.linear.items() if u != v}
        const = self.constant
        quad: List[Tuple[GroupedExpression, GroupedExpression]] = []

        def accumulate(e: "GroupedExpression") -> None:
            nonlocal const
            for u, c in e.linear.items():
                s = (lin.get(u, 0) + c) % P
                if s:
                    lin[u] = s
                elif u in lin:
                    del lin[u]
            const = (const + e.constant) % P
            quad.extend(e.quadratic)

        coeff = self.linear.get(v, 0)
        if coeff:
            accumulate(repl.scale(coeff))
        for l, r in self.quadratic:
            ls = l.substitute(v, repl) if v in l.variables() else l
            rs = r.substitute(v, repl) if v in r.variables() else r
            accumulate(ls * rs)
        return GroupedExpression._raw(quad, lin, const)

    def substitute_all(self, subs: Dict[int, "GroupedExpression"]) -> "GroupedExpression":
        out = self
        for v in list(out.variables() & set(subs)):
            out = out.substitute(v, subs[v])
        return out

    # -- solving -------------------------------------------------------------

    def solve_for(self, v: int) -> Optional["GroupedExpression"]:
        """If affine in v with invertible coefficient: v = result."""
        if any(v in l.variables() or v in r.variables() for l, r in self.quadratic):
            return None
        c = self.linear.get(v, 0)
        if c == 0:
            return None
        inv = pow(c, P - 2, P)
        rest = GroupedExpression(
            quadratic=list(self.quadratic),
            linear={u: k for u, k in self.linear.items() if u != v},
            constant=self.constant,
        )
        return rest.scale((P - inv) % P)

    # -- canonical form ------------------------------------------------------

    def normalized(self) -> "GroupedExpression":
        """Fold constant-valued quadratic factors into the affine part and
        drop vanished pairs.  Cached: a normalized() result returns itself
        (expressions are immutable after construction)."""
        if getattr(self, "_norm", False):
            return self
        if not self.quadratic:
            self._norm = True
            return self
        out = GroupedExpression._raw([], dict(self.linear), self.constant)
        for l, r in self.quadratic:
            ln, rn = l.normalized(), r.normalized()
            lc, rc = ln.try_to_constant(), rn.try_to_constant()
            if lc is not None:
                out = out + rn.scale(lc)
            elif rc is not None:
                out = out + ln.scale(rc)
            else:
                out.quadratic.append((ln, rn))
        out._norm = True
        return out

    def key(self):
        """Hashable canonical key (for syntactic dedup / cancellation).
        Cached — expressions are treated as immutable after construction
        (all mutation sites build new objects)."""
        k = getattr(self, "_key", None)
        if k is None:
            qk = tuple(sorted((l.key(), r.key()) for l, r in self.quadratic))
            lk = tuple(sorted(self.linear.items()))
            k = (qk, lk, self.constant)
            self._key = k
        return k

    def __eq__(self, other):
        return isinstance(other, GroupedExpression) and self.key() == other.key()

    def __hash__(self):
        return hash(self.key())

    def __repr__(self):
        parts = []
        for l, r in self.quadratic:
            parts.append(f"({l!r})*({r!r})")
        for v, c in sorted(self.linear.items()):
            parts.append(f"{c}*x{v}" if c != 1 else f"x{v}")
        if self.constant or not parts:
            parts.append(str(self.constant))
        return " + ".join(parts)


# -- conversion to/from the expression IR ------------------------------------


def from_expr(e: ir.Expr) -> GroupedExpression:
    if isinstance(e, ir.Const):
        return GroupedExpression.from_const(e.value)
    if isinstance(e, ir.Var):
        return GroupedExpression.from_var(e.id)
    if isinstance(e, ir.Add):
        return from_expr(e.lhs) + from_expr(e.rhs)
    if isinstance(e, ir.Sub):
        return from_expr(e.lhs) - from_expr(e.rhs)
    if isinstance(e, ir.Mul):
        return from_expr(e.lhs) * from_expr(e.rhs)
    if isinstance(e, ir.Neg):
        return -from_expr(e.operand)
    raise TypeError(f"cannot convert {type(e).__name__} to GroupedExpression")


def _balanced_add(terms: List[ir.Expr]) -> ir.Expr:
    """Balanced Add tree: keeps recursion depth O(log n) for downstream
    walkers and compilers even on thousand-term inlined payloads."""
    while len(terms) > 1:
        nxt = [
            ir.Add(terms[i], terms[i + 1]) if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
        terms = nxt
    return terms[0]


def to_expr(g: GroupedExpression, names: Dict[int, str]) -> ir.Expr:
    terms: List[ir.Expr] = []
    for l, r in g.quadratic:
        terms.append(ir.Mul(to_expr(l, names), to_expr(r, names)))
    for v, c in sorted(g.linear.items()):
        var = ir.Var(name=names.get(v, f"x{v}"), id=v)
        terms.append(var if c == 1 else ir.Mul(ir.Const(c), var))
    if g.constant or not terms:
        terms.append(ir.Const(g.constant))
    return _balanced_add(terms)
