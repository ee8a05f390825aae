"""PGO candidate generation/selection and the staged CLI pipeline."""
import json
import os

import pytest

from powdr_tpu.vm.executor import Executor
from powdr_tpu.vm.guests import sha256_guest
from powdr_tpu.vm.pgo import generate_candidates, select_apcs
from powdr_tpu.vm.system import mock_check
from powdr_tpu.vm.apc import build_chips_with_apcs


@pytest.fixture(scope="module")
def sha_run():
    prog, mem, check = sha256_guest()
    res = Executor(prog, mem).run()
    check(res)
    return prog, res


def test_pgo_candidates(sha_run):
    prog, res = sha_run
    cands = generate_candidates(prog, res, superblocks=False)
    assert len(cands) >= 3
    # the 64x round loop must rank first among basic blocks
    assert cands[0].execution_count == 64
    assert cands[0].cells_saved > cands[1].cells_saved
    # the optimizer must shrink every selected block
    for c in cands:
        assert c.apc.report.after["columns"] < c.apc.report.before["columns"]


def test_pgo_superblocks_rank_higher(sha_run):
    prog, res = sha_run
    plain = generate_candidates(prog, res, superblocks=False)
    with_sb = generate_candidates(prog, res, superblocks=True)
    assert with_sb[0].cells_saved >= plain[0].cells_saved
    assert with_sb[0].apc.block.is_superblock


def test_pgo_selection_budget(sha_run):
    prog, res = sha_run
    cands = generate_candidates(prog, res)
    sel = select_apcs(cands, max_apcs=2)
    assert len(sel) == 2
    sel_cols = select_apcs(cands, max_total_columns=cands[0].width + 1)
    assert len(sel_cols) >= 1
    assert sum(c.report.after["columns"] for c in sel_cols) <= cands[0].width + 1


def test_sha256_with_apcs_mock(sha_run):
    prog, res = sha_run
    cands = generate_candidates(prog, res, superblocks=False)
    apcs = select_apcs(cands, max_apcs=2)
    chips = build_chips_with_apcs(prog, res, apcs)
    names = {c.name for c in chips}
    assert any(n.startswith("apc_") for n in names)
    assert "xor" not in names  # every xor lives inside an APC now
    mock_check(chips)


def test_sha256_superblock_apcs_mock(sha_run):
    prog, res = sha_run
    cands = generate_candidates(prog, res, superblocks=True, optimistic=True)
    apcs = select_apcs(cands, max_apcs=2)
    chips = build_chips_with_apcs(prog, res, apcs)
    assert any(c.name.startswith("apc_") for c in chips)
    mock_check(chips)


def test_cli_pipeline(tmp_path):
    from powdr_tpu import cli

    metrics = tmp_path / "metrics.json"
    rc = cli.main([
        "prove", "--guest", "loop", "--apcs", "1", "--mode", "mock",
        "--artifacts-dir", str(tmp_path / "artifacts"),
        "--metrics-json", str(metrics),
    ])
    assert rc == 0
    m = json.loads(metrics.read_text())
    assert "total_proof_time_ms" in m["counter"]
    assert m["gauge"]["num_apcs"] == 1
    # second run hits the artifact cache
    rc = cli.main([
        "prove", "--guest", "loop", "--apcs", "1", "--mode", "mock",
        "--artifacts-dir", str(tmp_path / "artifacts"),
    ])
    assert rc == 0


def test_empirical_detection(sha_run):
    from powdr_tpu.vm.empirical import detect

    prog, res = sha_run
    emp = detect(res, prog)
    # every executed pc has facts; loop-invariant columns become constants
    assert len(emp) == len(set(res.pc_trace))
    some = emp[res.pc_trace[0]]
    assert some.rows >= 1 and some.ranges


def test_optimistic_apc(sha_run):
    from powdr_tpu.vm.apc import build_apc, build_chips_with_apcs
    from powdr_tpu.vm.blocks import block_execution_count, detect_basic_blocks, pc_profile
    from powdr_tpu.vm.empirical import detect
    from powdr_tpu.vm.system import mock_check

    prog, res = sha_run
    emp = detect(res, prog)
    blocks = detect_basic_blocks(prog)
    prof = pc_profile(res.pc_trace)
    hot = max(blocks, key=lambda b: block_execution_count(b, prof) * len(b))
    plain = build_apc(hot)
    optimistic = build_apc(hot, empirical=emp)
    # optimistic assumptions must shrink the machine substantially
    assert optimistic.report.after["columns"] < plain.report.after["columns"] * 0.5
    assert optimistic.optimistic.constants
    chips = build_chips_with_apcs(prog, res, [optimistic])
    mock_check(chips)


def test_optimistic_runtime_check_rejects():
    from powdr_tpu.vm.empirical import OptimisticConstraints

    opt = OptimisticConstraints(constants={(0, "x"): 5}, equalities=[((0, "a"), (1, "b"))])
    assert opt.check_rows([{"x": 5, "a": 7}, {"b": 7}])
    assert not opt.check_rows([{"x": 6, "a": 7}, {"b": 7}])
    assert not opt.check_rows([{"x": 5, "a": 7}, {"b": 8}])


def test_apc_export_roundtrip(tmp_path, sha_run):
    """APCs export in the reference's ApcWithBusMap format and load back."""
    from powdr_tpu.apc.symbolic_machine import load_apc
    from powdr_tpu.vm.apc import export_apc

    prog, res = sha_run
    cands = generate_candidates(prog, res, superblocks=False)
    apc = cands[0].apc
    path = str(tmp_path / "apc.json.gz")
    export_apc(apc, path)
    back = load_apc(path)
    assert back.machine.stats() == apc.machine.stats()
    assert back.bus_map is not None


def test_columnar_apc_witgen_matches_dict(sha_run):
    """APC chip traces gathered from the native columnar core must be
    bit-identical to the python-interpreter dict-record path (the CLI
    executes on the columnar core by default)."""
    import numpy as np

    from powdr_tpu.vm.executor_native import run_native_columnar

    prog, res_dict = sha_run
    _, mem, _ = sha256_guest()
    res_col = run_native_columnar(prog, mem)
    assert not res_col.records and res_col.records_columnar is not None
    cands = generate_candidates(prog, res_dict, superblocks=False)
    apcs = select_apcs(cands, max_apcs=1)
    chips_a = build_chips_with_apcs(prog, res_dict, apcs)
    chips_b = build_chips_with_apcs(prog, res_col, apcs)
    assert [c.name for c in chips_a] == [c.name for c in chips_b]
    for ca, cb in zip(chips_a, chips_b):
        assert set(ca.trace) == set(cb.trace), ca.name
        for col in ca.trace:
            np.testing.assert_array_equal(
                np.asarray(ca.trace[col]), np.asarray(cb.trace[col]), err_msg=f"{ca.name}.{col}"
            )


def _fake_candidate(name, occurrences, per_exec_saved, width, n_ins=4):
    """Synthetic Candidate for selection-policy tests (select_apcs only
    touches value/cost fields and the opaque .apc)."""
    from powdr_tpu.vm.pgo import Candidate

    count = len(occurrences)
    return Candidate(
        apc=name,
        execution_count=count,
        cells_saved=count * per_exec_saved,
        width=width,
        n_instructions=n_ins,
        occurrences=[list(o) for o in occurrences],
    )


def test_overlap_aware_selection_no_double_count():
    """Two overlapping superblock candidates must not double-count shared
    savings (reference pgo/cell/selection.rs:132): after A is selected,
    B's value is re-counted over the execution with A's occurrences
    removed, so the disjoint candidate C wins the second slot."""
    from powdr_tpu.vm.pgo import select_apcs

    occ_a = [list(range(10 * k, 10 * k + 4)) for k in range(10)]  # 10 execs
    # B overlaps A in 9 of its 10 occurrences (offset +2 into A's span)
    occ_b = [list(range(10 * k + 2, 10 * k + 6)) for k in range(9)] + [[990, 991, 992, 993]]
    occ_c = [list(range(500 + 10 * k, 500 + 10 * k + 4)) for k in range(5)]
    a = _fake_candidate("A", occ_a, per_exec_saved=100, width=10)  # value 1000
    b = _fake_candidate("B", occ_b, per_exec_saved=90, width=10)  # naive 900, live 90
    c = _fake_candidate("C", occ_c, per_exec_saved=100, width=10)  # value 500
    chosen = select_apcs([a, b, c], max_apcs=2)
    assert chosen == ["A", "C"], chosen
    # without overlap info the naive greedy would have taken B second
    for cand in (a, b, c):
        cand.occurrences = None
    naive = select_apcs([a, b, c], max_apcs=2)
    assert naive == ["A", "B"], naive


def test_instruction_and_none_pgo_modes():
    """Reference PGO modes (pgo/mod.rs:29-34): instruction = block length
    x executions; none = block length only (no profile)."""
    from powdr_tpu.vm.pgo import select_apcs

    short_hot = _fake_candidate("short_hot", [[i] for i in range(100)], 1, 5, n_ins=2)
    long_cold = _fake_candidate("long_cold", [[1000], [1001]], 1, 5, n_ins=40)
    # instruction mode: 2*100=200 beats 40*2=80
    assert select_apcs([long_cold, short_hot], max_apcs=1, mode="instruction") == ["short_hot"]
    # none mode: block length only, 40 beats 2
    assert select_apcs([short_hot, long_cold], max_apcs=1, mode="none") == ["long_cold"]


def test_column_budget_skips_but_continues():
    """A candidate over the column budget is skipped, not a hard stop
    (the reference 'item does not fit, skip it')."""
    from powdr_tpu.vm.pgo import select_apcs

    wide = _fake_candidate("wide", [[i] for i in range(50)], 100, width=90)
    slim = _fake_candidate("slim", [[100 + i] for i in range(10)], 50, width=10)
    assert select_apcs([wide, slim], max_total_columns=20) == ["slim"]
