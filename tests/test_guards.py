"""Padding-row guard semantics (reference add_guards,
/root/reference/autoprecompiles/src/lib.rs:427-524)."""
import numpy as np

from powdr_tpu.apc.guards import add_guards, needs_guards, zero_witness_value
from powdr_tpu.apc.symbolic_machine import SymbolicBusInteraction, SymbolicMachine
from powdr_tpu.field.babybear import P
from powdr_tpu.ir import expression as ir


def _machine():
    x = ir.Var(name="x", id=0)
    inv = ir.Var(name="inv", id=1)
    return SymbolicMachine(
        constraints=[
            # inverse witness: x * inv - 1 = 0 — violated by the zero row
            ir.Sub(ir.Mul(x, inv), ir.Const(1)),
            # already padding-closed: x * (x - 1) = 0
            ir.Mul(x, ir.Sub(x, ir.Const(1))),
        ],
        bus_interactions=[
            # constant multiplicity: active on padding without a guard
            SymbolicBusInteraction(id=3, mult=ir.Const(1), args=[x]),
            # variable multiplicity: zero at the zero witness
            SymbolicBusInteraction(id=3, mult=x, args=[inv]),
        ],
    )


def _degree(e):
    if isinstance(e, (ir.Const,)):
        return 0
    if isinstance(e, ir.Var):
        return 1
    if isinstance(e, ir.Mul):
        return _degree(e.lhs) + _degree(e.rhs)
    if isinstance(e, (ir.Add, ir.Sub)):
        return max(_degree(e.lhs), _degree(e.rhs))
    if isinstance(e, ir.Neg):
        return _degree(e.operand)
    raise TypeError(type(e))


def test_add_guards_makes_machine_padding_closed():
    m = _machine()
    assert needs_guards(m)
    pre_deg = max(_degree(c) for c in m.constraints)  # 2
    add_guards(m)
    # every constraint now satisfied by the all-zero row
    assert all(zero_witness_value(c) == 0 for c in m.constraints)
    # every multiplicity zero on the all-zero row
    assert all(zero_witness_value(b.mult) == 0 for b in m.bus_interactions)
    assert not needs_guards(m)
    # degree unchanged for the guarded originals (the boolean pin is
    # allowed to be quadratic, like the reference)
    assert max(_degree(c) for c in m.constraints[:2]) == pre_deg
    # is_valid is a derived constant-1 column and a main column
    d = m.derived_columns[-1]
    assert d.var.name == "is_valid" and isinstance(d.expr, ir.Const) and d.expr.value == 1
    assert "is_valid" in m.main_columns().values()


def test_add_guards_forces_padding_multiplicity_zero():
    """A variable multiplicity gains (1 - is_valid) * mult = 0, so junk
    padding rows cannot contribute bus flow."""
    m = _machine()
    add_guards(m)
    # find the forced-zero constraint: at is_valid=0, it reduces to mult=0
    forced = m.constraints[-2]  # [-1] is the boolean pin
    # evaluate at is_valid=0, x=5 (junk padding): constraint must equal x
    def ev(e, env):
        if isinstance(e, ir.Const):
            return e.value % P
        if isinstance(e, ir.Var):
            return env.get(e.name, 0) % P
        if isinstance(e, ir.Add):
            return (ev(e.lhs, env) + ev(e.rhs, env)) % P
        if isinstance(e, ir.Sub):
            return (ev(e.lhs, env) - ev(e.rhs, env)) % P
        if isinstance(e, ir.Mul):
            return ev(e.lhs, env) * ev(e.rhs, env) % P
        if isinstance(e, ir.Neg):
            return (-ev(e.operand, env)) % P
        raise TypeError(type(e))

    assert ev(forced, {"is_valid": 0, "x": 5}) == 5  # junk mult caught
    assert ev(forced, {"is_valid": 1, "x": 5}) == 0  # real rows free


def test_guarded_apc_machine_passes_mock_check():
    """End-to-end: a superblock APC whose optimized machine is not
    padding-closed (sha256's apc_0x20 exposed this) must mock-check after
    guarding (exact constraint + bus multiset check over padded traces)."""
    from powdr_tpu.vm.apc import build_chips_with_apcs
    from powdr_tpu.vm.executor import Executor
    from powdr_tpu.vm.guests import sha256_guest
    from powdr_tpu.vm.pgo import generate_candidates, select_apcs
    from powdr_tpu.vm.system import mock_check

    prog, mem, _ = sha256_guest()
    res = Executor(prog, mem).run()
    cands = generate_candidates(prog, res, superblocks=True, optimistic=True)
    apcs = select_apcs(cands, max_apcs=2)
    chips = build_chips_with_apcs(prog, res, apcs)
    assert any(c.name.startswith("apc_") for c in chips)
    mock_check(chips)
