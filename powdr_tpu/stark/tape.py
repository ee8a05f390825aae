"""Straight-line verification tape: the wire-level IR of the aggregation
circuit.

The recursion design (reference surface: leaf/internal aggregation built
on openvm-native-recursion, /root/reference/openvm-riscv/src/lib.rs:309-325)
re-runs this repo's STARK verifier as a *fixed program*: for a fixed
(airs, config, proof shape) the verifier's control flow is static, so its
entire execution is a straight-line sequence of field operations and
Poseidon2 permutations.  `Tape` records that sequence as ops over *wires*
(SSA values in the quartic extension, canonical form).  Data-dependent
behaviour (Merkle left/right ordering, FRI fold sides, query positions)
is expressed through boolean `bit` witness wires and `select` ops, so the
op *structure* stays static while values are witness.

The tape is compiled by powdr_tpu.stark.aggregation into two chips — an
extension-ALU AIR (one op per row) and a Poseidon2 permutation AIR (one
permutation per row) — linked by a LogUp "wire bus": each producing row
sends (wire_id, value) with multiplicity = consumer count, each use
receives it once.  Wire ids and op selectors are preprocessed columns, so
the circuit structure is vk-bound; only the values are witness.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from ..field import babybear as bb
from ..field import ext

ExtVal = Tuple[int, int, int, int]

# ALU op kinds (order fixed: preprocessed selector column layout)
CONST = 0
WITNESS = 1
ADD = 2
SUB = 3
MUL = 4
SELECT = 5  # out = c + a0*(b - c): a is a bit wire, b = taken, c = not-taken
BIT = 6  # out0 boolean witness, out1..3 == 0
EQ = 7  # assert a == b (no output)
PUBLIC = 8  # assert a == publics[pub_index] (base-valued wire)
MULADD = 9  # out = a*b + c (fused: halves the dot-product / Horner rows)

N_KINDS = 10

P = bb.P


@dataclass
class AluOp:
    kind: int
    out: int = -1
    a: int = -1
    b: int = -1
    c: int = -1
    cval: Optional[ExtVal] = None  # CONST payload
    pub: int = -1  # PUBLIC index


@dataclass
class PermOp:
    ins: List[int]  # 16 wire ids
    outs: List[int]  # 16 wire ids
    swap: int = -1  # optional bit wire: permute the half-swapped state


def _as_ext(v) -> ExtVal:
    if isinstance(v, tuple):
        assert len(v) == 4
        return tuple(int(x) % P for x in v)
    return (int(v) % P, 0, 0, 0)


class Tape:
    """Records the verification program; computes concrete wire values as
    it goes (the builder runs on a real proof, so every wire has a value —
    used both for witgen and for fail-fast checks during construction)."""

    def __init__(self) -> None:
        self.vals: List[ExtVal] = []
        self.alu: List[AluOp] = []
        self.perms: List[PermOp] = []
        self._consts: Dict[ExtVal, int] = {}
        self.n_publics = 0

    # -- wire creation -------------------------------------------------------

    def _new(self, val: ExtVal) -> int:
        self.vals.append(val)
        return len(self.vals) - 1

    def const(self, v) -> int:
        cv = _as_ext(v)
        w = self._consts.get(cv)
        if w is None:
            w = self._new(cv)
            self._consts[cv] = w
            self.alu.append(AluOp(CONST, out=w, cval=cv))
        return w

    def witness(self, v) -> int:
        w = self._new(_as_ext(v))
        self.alu.append(AluOp(WITNESS, out=w))
        return w

    def witness_many(self, vs: Sequence) -> List[int]:
        """Witness wires packed 4 per row: a WITNESS row has no
        constraints, so the a/b/c operand slots double as extra outputs
        (their receive interactions flip into sends via negative
        preprocessed multiplicities — see aggregation.build_alu_trace)."""
        out: List[int] = []
        vals = [_as_ext(v) for v in vs]
        for i in range(0, len(vals), 4):
            chunk = [self._new(v) for v in vals[i : i + 4]]
            op = AluOp(WITNESS, out=chunk[0])
            if len(chunk) > 1:
                op.a = chunk[1]
            if len(chunk) > 2:
                op.b = chunk[2]
            if len(chunk) > 3:
                op.c = chunk[3]
            self.alu.append(op)
            out.extend(chunk)
        return out

    def bit(self, b: int) -> int:
        assert b in (0, 1)
        w = self._new((b, 0, 0, 0))
        self.alu.append(AluOp(BIT, out=w))
        return w

    # -- arithmetic ----------------------------------------------------------

    def add(self, a: int, b: int) -> int:
        out = self._new(
            tuple((x + y) % P for x, y in zip(self.vals[a], self.vals[b]))
        )
        self.alu.append(AluOp(ADD, out=out, a=a, b=b))
        return out

    def sub(self, a: int, b: int) -> int:
        out = self._new(
            tuple((x - y) % P for x, y in zip(self.vals[a], self.vals[b]))
        )
        self.alu.append(AluOp(SUB, out=out, a=a, b=b))
        return out

    def mul(self, a: int, b: int) -> int:
        out = self._new(ext.py_mul(self.vals[a], self.vals[b]))
        self.alu.append(AluOp(MUL, out=out, a=a, b=b))
        return out

    def muladd(self, a: int, b: int, c: int) -> int:
        """out = a*b + c in one row."""
        prod = ext.py_mul(self.vals[a], self.vals[b])
        out = self._new(tuple((x + y) % P for x, y in zip(prod, self.vals[c])))
        self.alu.append(AluOp(MULADD, out=out, a=a, b=b, c=c))
        return out

    def select(self, bit_w: int, taken: int, not_taken: int) -> int:
        bv = self.vals[bit_w]
        assert bv[0] in (0, 1) and bv[1:] == (0, 0, 0), "select needs a bit wire"
        out = self._new(self.vals[taken] if bv[0] else self.vals[not_taken])
        self.alu.append(AluOp(SELECT, out=out, a=bit_w, b=taken, c=not_taken))
        return out

    def eq(self, a: int, b: int) -> None:
        assert self.vals[a] == self.vals[b], (
            f"tape eq failed: {self.vals[a]} != {self.vals[b]}"
        )
        self.alu.append(AluOp(EQ, a=a, b=b))

    def assert_zero(self, a: int) -> None:
        self.eq(a, self.const(0))

    def public(self, a: int, index: Optional[int] = None) -> int:
        """Bind wire `a` (base-valued) as the circuit's next public value;
        returns the public index."""
        if index is None:
            index = self.n_publics
        assert self.vals[a][1:] == (0, 0, 0), "publics are base field values"
        self.alu.append(AluOp(PUBLIC, a=a, pub=index))
        self.n_publics = max(self.n_publics, index + 1)
        return index

    # -- derived helpers -----------------------------------------------------

    def inv(self, a: int) -> int:
        """Witness inverse with an in-circuit product check a * w == 1."""
        av = self.vals[a]
        assert av != (0, 0, 0, 0), "inverting zero wire"
        w = self.witness(ext.py_inv(av))
        self.eq(self.mul(a, w), self.const(1))
        return w

    def mul_const(self, a: int, c) -> int:
        return self.mul(a, self.const(c))

    def add_const(self, a: int, c) -> int:
        return self.add(a, self.const(c))

    def dot(self, pairs: Sequence[Tuple[int, int]]) -> int:
        """sum of products over (wire, wire) pairs (fused mul-adds)."""
        acc = None
        for x, y in pairs:
            acc = self.mul(x, y) if acc is None else self.muladd(x, y, acc)
        return acc if acc is not None else self.const(0)

    def sum(self, wires: Sequence[int]) -> int:
        acc = None
        for w in wires:
            acc = w if acc is None else self.add(acc, w)
        return acc if acc is not None else self.const(0)

    def ext_pow(self, a: int, e: int) -> int:
        """Square-and-multiply with the static exponent `e`."""
        e = int(e)
        if e == 0:
            return self.const(1)
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else self.mul(result, base)
            e >>= 1
            if e:
                base = self.mul(base, base)
        return result

    def assemble_ext(self, comps: Sequence[int]) -> int:
        """Combine 4 base wires into one extension wire:
        e = c0 + c1*X + c2*X^2 + c3*X^3."""
        acc = comps[0]
        for k in range(1, 4):
            basis = tuple(1 if i == k else 0 for i in range(4))
            acc = self.muladd(comps[k], self.const(basis), acc)
        return acc

    def decompose(self, a: int, nbits: int = 31) -> List[int]:
        """Canonical 31-bit decomposition of a base-valued wire.

        Returns bit wires b_0..b_30 with: each boolean, sum b_i 2^i == a,
        and canonicity (value < p = 2^31 - 2^27 + 1: if the top four bits
        b27..b30 are all set, the low 27 bits must be zero) — without it a
        malicious prover could choose the v+p representation of small v
        and flip the low bits the queries and PoW depend on."""
        v = self.vals[a][0]
        assert self.vals[a][1:] == (0, 0, 0)
        bits = [self.bit((v >> i) & 1) for i in range(nbits)]
        # recomposition: a == sum b_i 2^i (fused mul-adds)
        acc = bits[0]
        for i in range(1, nbits):
            acc = self.muladd(bits[i], self.const(1 << i), acc)
        self.eq(acc, a)
        if nbits == 31:
            top = self.mul(self.mul(bits[27], bits[28]), self.mul(bits[29], bits[30]))
            low = bits[0]
            for i in range(1, 27):
                low = self.muladd(bits[i], self.const(1 << i), low)
            self.assert_zero(self.mul(top, low))
        return bits

    # -- poseidon2 -----------------------------------------------------------

    def permute(self, ins: Sequence[int], swap: Optional[int] = None) -> List[int]:
        """One Poseidon2 permutation row; 16 base-valued wires in/out.

        With `swap` (a bit wire), the permuted state is the half-swapped
        input (lane i <-> lane i^8 when the bit is 1) — the Merkle
        left/right ordering without per-lane select ops."""
        assert len(ins) == 16
        for w in ins:
            assert self.vals[w][1:] == (0, 0, 0), "poseidon lanes are base values"
        state = [self.vals[w][0] for w in ins]
        if swap is not None:
            bv = self.vals[swap]
            assert bv[0] in (0, 1) and bv[1:] == (0, 0, 0), "swap needs a bit wire"
            if bv[0]:
                state = state[8:] + state[:8]
        out_vals = poseidon2_canonical(state)
        outs = [self._new((v, 0, 0, 0)) for v in out_vals]
        self.perms.append(
            PermOp(ins=list(ins), outs=outs, swap=-1 if swap is None else swap)
        )
        return outs

    # -- stats ---------------------------------------------------------------

    def stats(self) -> Dict[str, int]:
        from collections import Counter

        kinds = Counter(op.kind for op in self.alu)
        return {
            "alu_rows": len(self.alu),
            "perm_rows": len(self.perms),
            "wires": len(self.vals),
            "publics": self.n_publics,
            **{f"kind_{k}": v for k, v in sorted(kinds.items())},
        }


# ---------------------------------------------------------------------------
# canonical-domain Poseidon2 (python ints; ground truth for tape + witgen)


def _perm_tables():
    from ..hash import poseidon2 as p2

    rc_ext, rc_int, diag = p2.constants()
    return (
        bb.np_from_mont(rc_ext).tolist(),
        bb.np_from_mont(rc_int).tolist(),
        bb.np_from_mont(diag).tolist(),
    )


_TABLES = None

M4 = [[5, 7, 1, 3], [4, 6, 1, 1], [1, 3, 5, 7], [1, 1, 4, 6]]


def ext_mat(x: List[int]) -> List[int]:
    """M_E = circ(2*M4, M4, M4, M4) on 16 canonical ints."""
    g = []
    for i in range(0, 16, 4):
        blk = x[i : i + 4]
        g.append([sum(M4[r][c] * blk[c] for c in range(4)) % P for r in range(4)])
    s = [sum(gr[j] for gr in g) % P for j in range(4)]
    out = []
    for gr in g:
        out.extend((gr[j] + s[j]) % P for j in range(4))
    return out


def poseidon2_canonical(state: List[int]) -> List[int]:
    """Canonical-form Poseidon2 (same permutation as hash.poseidon2.permute
    on Montgomery lanes; pinned against it in tests/test_hash.py)."""
    global _TABLES
    if _TABLES is None:
        _TABLES = _perm_tables()
    rc_ext, rc_int, diag = _TABLES
    x = ext_mat([v % P for v in state])
    for r in range(4):
        x = [pow((v + rc_ext[r][i]) % P, 7, P) for i, v in enumerate(x)]
        x = ext_mat(x)
    for r in range(13):
        x[0] = pow((x[0] + rc_int[r]) % P, 7, P)
        s = sum(x) % P
        x = [(s + diag[i] * v) % P for i, v in enumerate(x)]
    for r in range(4, 8):
        x = [pow((v + rc_ext[r][i]) % P, 7, P) for i, v in enumerate(x)]
        x = ext_mat(x)
    return x
