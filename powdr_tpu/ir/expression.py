"""Algebraic expression IR.

Counterpart of the reference's `expression` crate
(`/root/reference/expression/src/lib.rs:26-72`: Reference / Number /
BinaryOperation{+,-,*} / UnaryOperation{-}) extended with the node kinds a
full AIR needs (rotations, row selectors, challenges, extension-field
column groups).  One generic evaluator walks the DAG under an arbitrary
"algebra", which is how the same constraint compiles to:
  * a vectorized base-field evaluation over an LDE domain (device),
  * a vectorized quartic-extension evaluation (device, LogUp terms),
  * a host scalar evaluation at an out-of-domain point (verifier).
This replaces both the reference's `PowdrAir::eval` interpreter and its
CUDA bytecode VM (SURVEY.md §2 #31): on TPU each machine's constraints are
traced once into a jitted XLA computation.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple


class Expr:
    """Base expression node; overloaded operators build the DAG."""

    __slots__ = ()

    def __add__(self, other):
        return Add(self, _wrap(other))

    def __radd__(self, other):
        return Add(_wrap(other), self)

    def __sub__(self, other):
        return Sub(self, _wrap(other))

    def __rsub__(self, other):
        return Sub(_wrap(other), self)

    def __mul__(self, other):
        return Mul(self, _wrap(other))

    def __rmul__(self, other):
        return Mul(_wrap(other), self)

    def __neg__(self):
        return Neg(self)

    # degree of the polynomial in the trace columns (selectors count 1)
    def degree(self) -> int:
        raise NotImplementedError

    def children(self) -> Sequence["Expr"]:
        return ()


def _wrap(v) -> "Expr":
    if isinstance(v, Expr):
        return v
    if isinstance(v, int):
        return Const(v)
    raise TypeError(f"cannot use {type(v)} in expression")


@dataclass(frozen=True)
class Const(Expr):
    value: int  # canonical

    def degree(self) -> int:
        return 0


@dataclass(frozen=True)
class Col(Expr):
    """Main-trace column reference with rotation (0 = local, 1 = next)."""

    index: int
    rot: int = 0

    def degree(self) -> int:
        return 1


@dataclass(frozen=True)
class PreCol(Expr):
    """Preprocessed (fixed/setup-committed) column reference."""

    index: int
    rot: int = 0

    def degree(self) -> int:
        return 1


@dataclass(frozen=True)
class PermCol(Expr):
    """Extension-valued permutation-trace column (4 base columns)."""

    index: int
    rot: int = 0

    def degree(self) -> int:
        return 1


@dataclass(frozen=True)
class Var(Expr):
    """Named witness variable (autoprecompile space: `name@id`).

    Counterpart of the reference's AlgebraicReference {name, id}
    (autoprecompiles/src/expression.rs:12-50).  Compiled APCs map Var ids
    to concrete trace column indices (Col) before proving."""

    name: str
    id: int

    def degree(self) -> int:
        return 1


@dataclass(frozen=True)
class Challenge(Expr):
    name: str

    def degree(self) -> int:
        return 0


@dataclass(frozen=True)
class Public(Expr):
    index: int

    def degree(self) -> int:
        return 0


@dataclass(frozen=True)
class IsFirstRow(Expr):
    def degree(self) -> int:
        return 1


@dataclass(frozen=True)
class IsLastRow(Expr):
    def degree(self) -> int:
        return 1


@dataclass(frozen=True)
class IsTransition(Expr):
    """Vanishes on the last row (degree-1: x - w^{n-1})."""

    def degree(self) -> int:
        return 1


class _Bin(Expr):
    # _deg caches degree(): constraint DAGs with heavy sharing (e.g. the
    # Poseidon2 AIR's linear layers) make uncached recursion exponential
    __slots__ = ("lhs", "rhs", "_deg")

    def __init__(self, lhs: Expr, rhs: Expr):
        self.lhs = lhs
        self.rhs = rhs
        self._deg = None

    def children(self):
        return (self.lhs, self.rhs)


class Add(_Bin):
    def degree(self):
        if self._deg is None:
            self._deg = max(self.lhs.degree(), self.rhs.degree())
        return self._deg


class Sub(_Bin):
    def degree(self):
        if self._deg is None:
            self._deg = max(self.lhs.degree(), self.rhs.degree())
        return self._deg


class Mul(_Bin):
    def degree(self):
        if self._deg is None:
            self._deg = self.lhs.degree() + self.rhs.degree()
        return self._deg


class Neg(Expr):
    __slots__ = ("operand", "_deg")

    def __init__(self, operand: Expr):
        self.operand = operand
        self._deg = None

    def degree(self):
        if self._deg is None:
            self._deg = self.operand.degree()
        return self._deg

    def children(self):
        return (self.operand,)


@dataclass
class Algebra:
    """Operations an evaluator needs; values are opaque to the walker."""

    add: Callable[[Any, Any], Any]
    sub: Callable[[Any, Any], Any]
    mul: Callable[[Any, Any], Any]
    neg: Callable[[Any], Any]
    const: Callable[[int], Any]  # canonical int -> value
    col: Callable[[int, int], Any]  # (index, rot)
    perm_col: Callable[[int, int], Any]
    challenge: Callable[[str], Any]
    public: Callable[[int], Any]
    is_first: Callable[[], Any]
    is_last: Callable[[], Any]
    is_transition: Callable[[], Any]
    var: Callable[[str, int], Any] = None  # (name, id) — APC-space variables
    pre_col: Callable[[int, int], Any] = None  # preprocessed columns


def evaluate(expr: Expr, alg: Algebra, cache: Optional[Dict[int, Any]] = None) -> Any:
    """Evaluate the DAG bottom-up with memoization on node identity."""
    if cache is None:
        cache = {}
    # iterative post-order to avoid recursion limits on deep chains
    stack: List[Tuple[Expr, bool]] = [(expr, False)]
    while stack:
        node, ready = stack.pop()
        key = id(node)
        if key in cache:
            continue
        if not ready:
            stack.append((node, True))
            for c in node.children():
                if id(c) not in cache:
                    stack.append((c, False))
            continue
        if isinstance(node, Const):
            val = alg.const(node.value % _P)
        elif isinstance(node, Var):
            val = alg.var(node.name, node.id)
        elif isinstance(node, Col):
            val = alg.col(node.index, node.rot)
        elif isinstance(node, PreCol):
            val = alg.pre_col(node.index, node.rot)
        elif isinstance(node, PermCol):
            val = alg.perm_col(node.index, node.rot)
        elif isinstance(node, Challenge):
            val = alg.challenge(node.name)
        elif isinstance(node, Public):
            val = alg.public(node.index)
        elif isinstance(node, IsFirstRow):
            val = alg.is_first()
        elif isinstance(node, IsLastRow):
            val = alg.is_last()
        elif isinstance(node, IsTransition):
            val = alg.is_transition()
        elif isinstance(node, Add):
            val = alg.add(cache[id(node.lhs)], cache[id(node.rhs)])
        elif isinstance(node, Sub):
            val = alg.sub(cache[id(node.lhs)], cache[id(node.rhs)])
        elif isinstance(node, Mul):
            val = alg.mul(cache[id(node.lhs)], cache[id(node.rhs)])
        elif isinstance(node, Neg):
            val = alg.neg(cache[id(node.operand)])
        else:
            raise TypeError(f"unknown node {type(node)}")
        cache[key] = val
    return cache[id(expr)]


_P = 2013265921


def walk_nodes(exprs: Sequence[Expr]):
    """Iterate each DAG node exactly once (id-deduplicated, iterative)."""
    seen = set()
    stack = list(exprs)
    while stack:
        e = stack.pop()
        if id(e) in seen:
            continue
        seen.add(id(e))
        yield e
        stack.extend(e.children())


def max_col_index(exprs: Sequence[Expr]) -> int:
    best = -1
    for e in walk_nodes(exprs):
        if isinstance(e, Col):
            best = max(best, e.index)
    return best


def uses_next_row(exprs: Sequence[Expr]) -> bool:
    for e in walk_nodes(exprs):
        if isinstance(e, (Col, PermCol, PreCol)) and e.rot != 0:
            return True
    return False
