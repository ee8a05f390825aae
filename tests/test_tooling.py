"""Analysis tooling tests: nightly-regression analyzer + HTML viewers
(reference counterparts: scripts/analyze_nightly.py and the two web SPAs,
SURVEY.md §2 #42/#43)."""
import json
import re

from powdr_tpu.utils.analyze import compare, format_table, load_run
from powdr_tpu.utils.report_html import apc_stats_from, build_report


def _runs(tmp_path, name, total):
    d = tmp_path / name
    d.mkdir()
    (d / "sha256.json").write_text(
        json.dumps(
            {
                "counter": {"total_proof_time_ms": total, "verify_time_ms": 900.0},
                "gauge": {"instret": 1000},
            }
        )
    )
    return str(d)


def test_analyze_flags_regression(tmp_path):
    cur = load_run(_runs(tmp_path, "cur", 15000.0))
    base = load_run(_runs(tmp_path, "base", 10000.0))
    res = compare(cur, base, threshold=0.1)
    assert len(res["regressions"]) == 1
    assert "total_proof_time_ms" in res["regressions"][0]
    assert "REGRESSION" in format_table(res)


def test_analyze_within_threshold_clean(tmp_path):
    cur = load_run(_runs(tmp_path, "cur", 10400.0))
    base = load_run(_runs(tmp_path, "base", 10000.0))
    res = compare(cur, base, threshold=0.1)
    assert res["regressions"] == []


def test_report_html_self_contained():
    metrics = {"keccak": {"total_proof_time_ms": 1234.5, "instret": 99}}
    apcs = [
        {
            "name": "apc_x",
            "execution_count": 5,
            "before_cols": 100,
            "after_cols": 30,
            "before_interactions": 60,
            "after_interactions": 20,
            "cells_saved": 4200,
        }
    ]
    page = build_report(metrics, apcs, title="t")
    # embedded data round-trips and the page carries its own JS/CSS
    m = re.search(r"const DATA = (.*?);\n", page, re.S)
    data = json.loads(m.group(1))
    assert data["metrics"]["keccak"]["total_proof_time_ms"] == 1234.5
    assert data["apcs"][0]["name"] == "apc_x"
    js = page[page.index("<script>") : page.index("</script>")]
    assert js.count("{") == js.count("}") and js.count("(") == js.count(")")
    for frag in ("barChart", "prefers-color-scheme", "sortT", "showTip", "legend"):
        assert frag in page, frag
    assert "http://" not in page and "https://" not in page  # no external assets


def test_apc_stats_from_candidates():
    class R:
        before = {"columns": 10, "bus_interactions": 6}
        after = {"columns": 4, "bus_interactions": 2}

    class A:
        name = "apc_1"
        report = R()

    class C:
        apc = A()
        execution_count = 7
        cells_saved = 99

    rows = apc_stats_from([C()])
    assert rows == [
        {
            "name": "apc_1",
            "execution_count": 7,
            "before_cols": 10,
            "after_cols": 4,
            "before_interactions": 6,
            "after_interactions": 2,
            "cells_saved": 99,
        }
    ]


def test_layered_config(tmp_path):
    """Config layering: file defaults < per-guest section < env vars
    (reference's per-guest config + env knob surface)."""
    from powdr_tpu.utils.config import apply_to_args, load_config

    cfg = tmp_path / "powdr_tpu.toml"
    cfg.write_text(
        "[defaults]\nqueries = 9\npow_bits = 3\n"
        "[guest.keccak]\napcs = 2\nsuperblocks = true\n"
    )
    out = load_config("keccak", path=str(cfg), env={})
    assert out == {"queries": 9, "pow_bits": 3, "apcs": 2, "superblocks": True}
    out = load_config("sha256", path=str(cfg), env={"POWDR_TPU_QUERIES": "4"})
    assert out["queries"] == 4 and "apcs" not in out

    class A:
        queries = 20
        apcs = 0

    a = apply_to_args(A(), {"queries": 9, "apcs": 2}, {"queries": 20, "apcs": 0})
    assert a.queries == 9 and a.apcs == 2
    # explicit CLI value (differs from parser default) survives
    class B:
        queries = 7
        apcs = 0

    b = apply_to_args(B(), {"queries": 9}, {"queries": 20, "apcs": 0})
    assert b.queries == 7

    import pytest as _pytest

    with _pytest.raises(KeyError):
        bad = tmp_path / "bad.toml"
        bad.write_text("[defaults]\nnope = 1\n")
        load_config("x", path=str(bad), env={})


def test_proof_size_breakdown():
    """Per-component proof size accounting sums to the raw total and the
    compressed container stays below it."""
    import numpy as np
    import jax.numpy as jnp
    from powdr_tpu.field import babybear as bb
    from powdr_tpu.ir import expression as ir
    from powdr_tpu.stark import prover
    from powdr_tpu.stark.air import Air
    from powdr_tpu.stark.challenger import Challenger
    from powdr_tpu.stark.config import StarkConfig
    from powdr_tpu.stark.serialize import proof_size_breakdown, proof_to_bytes

    cfg = StarkConfig(log_blowup=2, num_queries=2, proof_of_work_bits=1)
    c0 = ir.Col(0)
    air = Air(width=1, constraints=[ir.Mul(c0, ir.Sub(c0, ir.Const(1)))], name="bool")
    trace = bb.to_mont(jnp.asarray(np.zeros((16, 1), dtype=np.uint32)))
    proof = prover.prove([(air, trace)], cfg, Challenger())
    sizes = proof_size_breakdown(proof)
    parts = {k: v for k, v in sizes.items() if k != "total_raw"}
    assert sizes["total_raw"] == sum(parts.values())
    assert sizes["fri_queries"] > 0 and sizes["pcs_queries"] > 0
    assert sizes["commitments"] > 0 and sizes["claimed_evals"] > 0
