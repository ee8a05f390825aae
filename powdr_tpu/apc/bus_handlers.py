"""OpenVM bus-interaction semantics for the solver.

Counterpart of /root/reference/openvm-bus-interaction-handler/: each bus
type induces range constraints on interaction arguments, which seed the
solver's abstract domain:
  * VariableRangeChecker (x, bits): x in [0, 2^bits)     (variable_range_checker.rs)
  * BitwiseLookup (x, y, z, op): op=0 -> x,y bytes, z=0; op=1 -> bytes    (bitwise_lookup.rs)
  * TupleRangeChecker[m1,m2] (a, b): a < m1, b < m2      (tuple_range_checker.rs)
  * Memory receive (space, ptr, data..., ts) with mult exactly -1 and
    space in {1 (registers), 2 (heap)}: data limbs are bytes (everything
    written to registers/memory is range-checked at write time — the
    system invariant memory.rs:31-46 encodes); a register-0 read is all
    zeros (x0 is never written)
  * ExecutionBridge / PcLookup: no pure range semantics
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..solver.constraint_system import ConstraintSystemGE
from ..solver.grouped_expression import GroupedExpression as GE, P
from ..solver.range_constraint import RangeConstraint
from .symbolic_machine import BusMap

MAX_VAR_RANGE_BITS = 25
BYTE = RangeConstraint.from_mask(0xFF)


def _arg_ranges(bus_type, args: List[GE]) -> Optional[List[Optional[RangeConstraint]]]:
    if bus_type == "VariableRangeChecker" and len(args) == 2:
        bits = args[1].try_to_constant()
        if bits is not None and bits <= MAX_VAR_RANGE_BITS:
            return [RangeConstraint.from_mask((1 << bits) - 1), None]
        return [RangeConstraint.from_mask((1 << MAX_VAR_RANGE_BITS) - 1), None]
    if bus_type == "BitwiseLookup" and len(args) == 4:
        op = args[3].try_to_constant()
        if op == 0:
            return [BYTE, BYTE, RangeConstraint.from_value(0), None]
        if op == 1:
            return [BYTE, BYTE, BYTE, None]
        return [BYTE, BYTE, BYTE, RangeConstraint.from_mask(1)]
    if isinstance(bus_type, tuple) and bus_type[0] == "ByteOperations" and len(args) == 4:
        # SP1-style opcode-tagged byte bus (adapters/sp1.py): op 0 is a
        # U8 pair range check with z pinned to 0; ops 1..3 are xor/or/and
        op = args[0].try_to_constant()
        if op == 0:
            return [None, BYTE, BYTE, RangeConstraint.from_value(0)]
        if op in (1, 2, 3):
            return [None, BYTE, BYTE, BYTE]
        return None
    if isinstance(bus_type, tuple) and bus_type[0] == "TupleRangeChecker" and len(args) == 2:
        m1, m2 = bus_type[1]
        return [
            RangeConstraint.from_range(0, m1 - 1),
            RangeConstraint.from_range(0, m2 - 1),
        ]
    return None


def _memory_ranges(b) -> Optional[List[Optional[RangeConstraint]]]:
    """Memory-bus receive semantics (memory.rs handle_memory): a receive
    (mult == -1 exactly) from register space (1) or heap space (2) yields
    byte-ranged data limbs — the zkVM's invariant that every written limb
    was range-checked at write time.  Register 0 reads are all zero."""
    if b.mult.try_to_constant() != P - 1 or len(b.args) < 3:
        return None
    space = b.args[0].try_to_constant()
    if space not in (1, 2):
        return None
    ptr = b.args[1].try_to_constant()
    if space == 1 and ptr == 0:
        data_rc = RangeConstraint.from_value(0)
    else:
        data_rc = BYTE
    return [None, None] + [data_rc] * (len(b.args) - 3) + [None]


def seed_ranges(
    system: ConstraintSystemGE, bus_map: BusMap
) -> Tuple[Dict[int, RangeConstraint], List[GE]]:
    """Initial per-variable range constraints + extra equality constraints
    (for args forced to a single value, e.g. z=0 on op-0 bitwise rows)."""
    ranges: Dict[int, RangeConstraint] = {}
    extra: List[GE] = []
    for b in system.bus_interactions:
        bus_type = bus_map.bus_ids.get(b.id)
        if bus_type is None:
            continue
        if bus_type == "Memory":
            rcs = _memory_ranges(b)
        else:
            rcs = _arg_ranges(bus_type, b.args)
        if rcs is None:
            continue
        for arg, rc in zip(b.args, rcs):
            if rc is None:
                continue
            v = arg.try_to_simple_var()
            if v is not None:
                cur = ranges.get(v, RangeConstraint.default())
                ranges[v] = cur.conjunction(rc)
            else:
                single = rc.try_to_single_value()
                if single is not None and arg.try_to_constant() is None:
                    extra.append(arg - GE.from_const(single))
    return ranges, extra
