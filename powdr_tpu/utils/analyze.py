"""Nightly-benchmark analysis: compare metrics runs, flag regressions.

Counterpart of the reference's `scripts/analyze_nightly.py` (compares
nightly metrics against the previous run pulled from a bench-results
branch; benchmark list at `:31`) built on the same key surface our
metrics.json shares with `openvm-riscv/scripts/basic_metrics.py:40-70`.

Usage:
    python -m powdr_tpu.utils.analyze current_dir baseline_dir \
        [--threshold 0.1] [--json out.json]

Each dir holds one metrics JSON per benchmark (`<guest>.json`).  Output:
a per-benchmark/per-metric comparison table; exit code 1 if any tracked
time metric regressed beyond the threshold (for CI gating).  `--json`
also writes the structured comparison (the input to report_html)."""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List, Optional

# lower-is-better metrics gated on regression (basic_metrics.py key set)
TRACKED = [
    "total_proof_time_ms",
    "trace_gen_time_ms",
    "verify_time_ms",
    "apc_gen_time_ms",
    "execute_preflight_time_ms",
]
# higher-is-worse structural metrics (column/interaction counts)
STRUCTURAL = [
    "after_opt_cols",
    "after_opt_constraints",
    "after_opt_interactions",
]


def load_run(path: str) -> Dict[str, Dict[str, float]]:
    """Directory of `<bench>.json` metrics snapshots -> flat per-bench map."""
    out: Dict[str, Dict[str, float]] = {}
    for name in sorted(os.listdir(path)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(path, name)) as f:
            snap = json.load(f)
        flat: Dict[str, float] = {}
        for section in ("counter", "gauge"):
            flat.update(snap.get(section, {}))
        out[name[: -len(".json")]] = flat
    return out


def compare(
    current: Dict[str, Dict[str, float]],
    baseline: Dict[str, Dict[str, float]],
    threshold: float = 0.1,
) -> Dict:
    """Per-benchmark metric deltas; a tracked metric regresses when it is
    more than `threshold` (fractional) above baseline."""
    rows: List[Dict] = []
    regressions: List[str] = []
    for bench in sorted(set(current) | set(baseline)):
        cur, base = current.get(bench), baseline.get(bench)
        if cur is None or base is None:
            rows.append({"bench": bench, "status": "added" if base is None else "removed"})
            continue
        for key in sorted(set(cur) & set(base)):
            b, c = base[key], cur[key]
            ratio = c / b if b else (0.0 if c == 0 else float("inf"))
            row = {
                "bench": bench,
                "metric": key,
                "baseline": round(b, 3),
                "current": round(c, 3),
                "ratio": round(ratio, 4),
            }
            if key in TRACKED + STRUCTURAL and ratio > 1 + threshold:
                row["regression"] = True
                regressions.append(f"{bench}.{key} {b:.1f} -> {c:.1f} ({ratio:.2f}x)")
            rows.append(row)
    return {"rows": rows, "regressions": regressions, "threshold": threshold}


def format_table(result: Dict, only_tracked: bool = True) -> str:
    lines = [f"{'bench':<16} {'metric':<32} {'baseline':>12} {'current':>12} {'ratio':>8}"]
    for r in result["rows"]:
        if "metric" not in r:
            lines.append(f"{r['bench']:<16} [{r['status']}]")
            continue
        if only_tracked and r["metric"] not in TRACKED + STRUCTURAL:
            continue
        flag = "  <-- REGRESSION" if r.get("regression") else ""
        lines.append(
            f"{r['bench']:<16} {r['metric']:<32} {r['baseline']:>12} "
            f"{r['current']:>12} {r['ratio']:>8}{flag}"
        )
    if result["regressions"]:
        lines.append("")
        lines.append(f"{len(result['regressions'])} regression(s) beyond "
                     f"{result['threshold']:.0%}:")
        lines.extend("  " + s for s in result["regressions"])
    else:
        lines.append("")
        lines.append("no regressions")
    return "\n".join(lines)


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("current", help="directory of current-run metrics JSONs")
    ap.add_argument("baseline", help="directory of baseline metrics JSONs")
    ap.add_argument("--threshold", type=float, default=0.1)
    ap.add_argument("--all-metrics", action="store_true")
    ap.add_argument("--json", default=None, help="write structured comparison")
    args = ap.parse_args(argv)
    result = compare(load_run(args.current), load_run(args.baseline), args.threshold)
    print(format_table(result, only_tracked=not args.all_metrics))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
    return 1 if result["regressions"] else 0


if __name__ == "__main__":
    sys.exit(main())
