"""VM tests: executor semantics (vs python ground truth), full-system mock
checks (constraints + exact bus balance), guest workloads."""
import numpy as np
import pytest

from powdr_tpu.vm.executor import Executor, assemble
from powdr_tpu.vm.guests import matmul_guest, sha256_guest, u256_add_guest
from powdr_tpu.vm.system import build_chips, mock_check


def _loop_program():
    return assemble([
        ("addi", 1, 0, 0, 5),
        ("addi", 2, 0, 0, 0),
        ("addi", 3, 0, 0, 0),
        "loop:",
        ("add", 2, 2, 1),
        ("addi", 3, 3, 0, 1),
        ("bne", 0, 3, 1, "loop"),
        ("sw", 0, 0, 2, 256),
        ("halt",),
    ])


def test_executor_loop():
    res = Executor(_loop_program()).run()
    assert res.final_mem[(2, 256)][1] == 25
    assert res.instret == 20


def test_mock_check_loop():
    prog = _loop_program()
    res = Executor(prog).run()
    mock_check(build_chips(prog, res))


def test_mock_check_catches_bad_witness():
    prog = _loop_program()
    res = Executor(prog).run()
    chips = build_chips(prog, res)
    add = next(c for c in chips if c.name == "add")
    add.trace["alu__sum__0"] = add.trace["alu__sum__0"].copy()
    add.trace["alu__sum__0"][0] += 1
    with pytest.raises(AssertionError):
        mock_check(chips)


def test_guest_u256_add():
    prog, mem, check = u256_add_guest()
    res = Executor(prog, mem).run()
    check(res)
    mock_check(build_chips(prog, res))


def test_guest_matmul():
    prog, mem, check = matmul_guest()
    res = Executor(prog, mem).run()
    check(res)
    mock_check(build_chips(prog, res))


def test_guest_sha256():
    prog, mem, check = sha256_guest()
    res = Executor(prog, mem).run()
    check(res)  # digest matches hashlib


@pytest.mark.slow
def test_guest_sha256_mock_check():
    prog, mem, check = sha256_guest()
    res = Executor(prog, mem).run()
    mock_check(build_chips(prog, res))
