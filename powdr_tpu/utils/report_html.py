"""Self-contained HTML viewers: proof metrics + APC effectiveness.

Counterpart of the reference's two web viewers (SURVEY.md §2 #43:
`autoprecompile-analyzer/index.html` — APC effectiveness SPA — and
`openvm/metrics-viewer/index.html` — proof metrics SPA).  One generated
standalone page, no external assets: embedded JSON data, inline SVG bar
charts with hover tooltips, sortable tables, light/dark theme, and a file
picker to load a different metrics/stats JSON into the same viewer.

Usage:
    python -m powdr_tpu.utils.report_html --metrics-dir runs/ \
        --apc-stats apc_stats.json -o report.html

The CLI writes `apc_stats.json` from `select-apcs --apc-stats-json`.
"""
from __future__ import annotations

import argparse
import html
import json
import os
import sys
from typing import Dict, List, Optional

from .analyze import TRACKED, load_run

_TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
.viz-root {{
  color-scheme: light;
  --surface-1: #fcfcfb; --surface-2: #f1f0ec;
  --text-primary: #0b0b0b; --text-secondary: #52514e;
  --grid: #e3e2dd; --series-1: #2a78d6; --series-2: #eb6834;
}}
@media (prefers-color-scheme: dark) {{
  :root:where(:not([data-theme="light"])) .viz-root {{
    color-scheme: dark;
    --surface-1: #1a1a19; --surface-2: #242423;
    --text-primary: #ffffff; --text-secondary: #c3c2b7;
    --grid: #3a3a38; --series-1: #3987e5; --series-2: #d95926;
  }}
}}
:root[data-theme="dark"] .viz-root {{
  color-scheme: dark;
  --surface-1: #1a1a19; --surface-2: #242423;
  --text-primary: #ffffff; --text-secondary: #c3c2b7;
  --grid: #3a3a38; --series-1: #3987e5; --series-2: #d95926;
}}
body {{ margin: 0; }}
.viz-root {{ background: var(--surface-1); color: var(--text-primary);
  font: 14px/1.45 system-ui, sans-serif; min-height: 100vh; padding: 24px; }}
h1 {{ font-size: 20px; margin: 0 0 4px; }}
h2 {{ font-size: 16px; margin: 28px 0 8px; }}
.sub {{ color: var(--text-secondary); margin-bottom: 16px; }}
.tiles {{ display: flex; gap: 12px; flex-wrap: wrap; margin: 16px 0; }}
.tile {{ background: var(--surface-2); border-radius: 8px; padding: 12px 16px;
  min-width: 150px; }}
.tile .v {{ font-size: 22px; font-weight: 600; }}
.tile .k {{ color: var(--text-secondary); font-size: 12px; }}
table {{ border-collapse: collapse; margin: 8px 0 16px; }}
th, td {{ padding: 4px 12px 4px 0; text-align: right;
  border-bottom: 1px solid var(--grid); }}
th {{ color: var(--text-secondary); font-weight: 500; cursor: pointer; }}
th:first-child, td:first-child {{ text-align: left; }}
.legend {{ display: flex; gap: 16px; margin: 4px 0; color: var(--text-secondary);
  font-size: 12px; }}
.legend span::before {{ content: ""; display: inline-block; width: 10px;
  height: 10px; border-radius: 2px; margin-right: 5px; }}
.legend .s1::before {{ background: var(--series-1); }}
.legend .s2::before {{ background: var(--series-2); }}
svg text {{ fill: var(--text-primary); font: 12px system-ui, sans-serif; }}
svg .muted {{ fill: var(--text-secondary); }}
svg .grid {{ stroke: var(--grid); stroke-width: 1; }}
.tip {{ position: fixed; pointer-events: none; background: var(--surface-2);
  color: var(--text-primary); border: 1px solid var(--grid); border-radius: 6px;
  padding: 4px 8px; font-size: 12px; display: none; z-index: 9; }}
.controls {{ display: flex; gap: 12px; align-items: center; margin: 8px 0; }}
button {{ background: var(--surface-2); color: var(--text-primary);
  border: 1px solid var(--grid); border-radius: 6px; padding: 4px 10px;
  cursor: pointer; }}
</style></head>
<body class="viz-root" data-palette="#2a78d6,#eb6834">
<h1>{title}</h1>
<div class="sub">powdr-tpu proof metrics &amp; APC effectiveness</div>
<div class="controls">
  <button onclick="toggleTheme()">light / dark</button>
  <label>load data <input type="file" accept=".json" onchange="loadFile(event)"></label>
</div>
<div id="content"></div>
<div class="tip" id="tip"></div>
<script>
const DATA = {data_json};

function toggleTheme() {{
  const r = document.documentElement;
  r.dataset.theme = r.dataset.theme === "dark" ? "light" : "dark";
}}
function loadFile(ev) {{
  const f = ev.target.files[0];
  if (!f) return;
  f.text().then(t => {{
    const d = JSON.parse(t);
    if (d.metrics) DATA.metrics = d.metrics;
    if (d.apcs) DATA.apcs = d.apcs;
    render();
  }});
}}
const esc = v => String(v).replace(/[&<>"]/g,
  ch => ({{"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}})[ch]);
const tip = () => document.getElementById("tip");
function showTip(ev, text) {{
  const t = tip(); t.textContent = text; t.style.display = "block";
  t.style.left = (ev.clientX + 12) + "px"; t.style.top = (ev.clientY + 12) + "px";
}}
function hideTip() {{ tip().style.display = "none"; }}

// horizontal bar with a 4px rounded data end, flat at the baseline
function barPath(x, y, w, h) {{
  const r = Math.min(4, w);
  return `M${{x}},${{y}} h${{Math.max(w - r, 0)}} a${{r}},${{r}} 0 0 1 ${{r}},${{r}}` +
         ` v${{h - 2 * r}} a${{r}},${{r}} 0 0 1 -${{r}},${{r}} h-${{Math.max(w - r, 0)}} z`;
}}

// rows: [{{label, values: [..]}}], series: [{{name, cssVar}}]
function barChart(rows, series, fmt) {{
  const labW = 170, valW = 70, barMax = 420, barH = 14, gap = 2, groupGap = 10;
  const maxV = Math.max(...rows.flatMap(r => r.values), 1);
  const rowH = series.length * (barH + gap) - gap + groupGap;
  const H = rows.length * rowH + 8;
  let s = `<svg width="${{labW + barMax + valW}}" height="${{H}}" role="img">`;
  [0.25, 0.5, 0.75, 1].forEach(f => {{
    const gx = labW + f * barMax;
    s += `<line class="grid" x1="${{gx}}" y1="0" x2="${{gx}}" y2="${{H - 8}}"/>`;
  }});
  rows.forEach((r, i) => {{
    const y0 = i * rowH;
    s += `<text x="0" y="${{y0 + barH}}">${{esc(r.label)}}</text>`;
    r.values.forEach((v, j) => {{
      const w = Math.max(v / maxV * barMax, 1);
      const y = y0 + j * (barH + gap);
      s += `<path d="${{barPath(labW, y, w, barH)}}" fill="var(--${{series[j].cssVar}})"` +
           ` data-tip="${{esc(r.label)}} — ${{esc(series[j].name)}}: ${{esc(fmt(v))}}"/>`;
      s += `<text class="muted" x="${{labW + w + 6}}" y="${{y + barH - 2}}">${{fmt(v)}}</text>`;
    }});
  }});
  s += `</svg>`;
  return s;
}}

function table(cols, rows) {{
  let s = "<table><tr>" + cols.map((c, i) =>
    `<th onclick="sortT(this, ${{i}})">${{esc(c)}}</th>`).join("") + "</tr>";
  rows.forEach(r => {{
    s += "<tr>" + r.map(v => `<td>${{esc(v)}}</td>`).join("") + "</tr>";
  }});
  return s + "</table>";
}}
function sortT(th, i) {{
  const tb = th.closest("table");
  const rows = [...tb.rows].slice(1);
  const asc = th.dataset.asc !== "1";
  th.dataset.asc = asc ? "1" : "0";
  rows.sort((a, b) => {{
    const x = a.cells[i].textContent, y = b.cells[i].textContent;
    const nx = parseFloat(x), ny = parseFloat(y);
    const c = isNaN(nx) || isNaN(ny) ? x.localeCompare(y) : nx - ny;
    return asc ? c : -c;
  }});
  rows.forEach(r => tb.appendChild(r));
}}

const ms = v => v >= 10000 ? (v / 1000).toFixed(1) + " s" : v.toFixed(0) + " ms";
const num = v => v.toLocaleString();

function render() {{
  const el = document.getElementById("content");
  let out = "";
  const benches = Object.keys(DATA.metrics || {{}});
  if (benches.length) {{
    const tot = k => benches.reduce((a, b) => a + (DATA.metrics[b][k] || 0), 0);
    out += `<div class="tiles">` + [
      ["total proof time", ms(tot("total_proof_time_ms"))],
      ["trace generation", ms(tot("trace_gen_time_ms"))],
      ["verification", ms(tot("verify_time_ms"))],
      ["benchmarks", String(benches.length)],
    ].map(([k, v]) => `<div class="tile"><div class="v">${{v}}</div>` +
                      `<div class="k">${{k}}</div></div>`).join("") + `</div>`;
    out += "<h2>Proof time by benchmark</h2>";
    out += barChart(
      benches.map(b => ({{label: b, values: [DATA.metrics[b].total_proof_time_ms || 0]}})),
      [{{name: "total proof time", cssVar: "series-1"}}], ms);
    out += "<h2>All metrics</h2>";
    const keys = [...new Set(benches.flatMap(b => Object.keys(DATA.metrics[b])))].sort();
    out += table(["bench", ...keys], benches.map(b =>
      [b, ...keys.map(k => DATA.metrics[b][k] != null ? num(+DATA.metrics[b][k].toFixed(1)) : "—")]));
  }}
  const apcs = DATA.apcs || [];
  if (apcs.length) {{
    out += "<h2>APC effectiveness (columns before → after optimization)</h2>";
    out += `<div class="legend"><span class="s1">before</span>` +
           `<span class="s2">after</span></div>`;
    out += barChart(
      apcs.map(a => ({{label: a.name, values: [a.before_cols, a.after_cols]}})),
      [{{name: "before", cssVar: "series-1"}}, {{name: "after", cssVar: "series-2"}}],
      num);
    out += table(
      ["apc", "executions", "cols before", "cols after", "interactions before",
       "interactions after", "cells saved"],
      apcs.map(a => [a.name, num(a.execution_count), num(a.before_cols),
                     num(a.after_cols), num(a.before_interactions),
                     num(a.after_interactions), num(a.cells_saved)]));
  }}
  el.innerHTML = out || "<p>no data</p>";
  el.querySelectorAll("[data-tip]").forEach(n => {{
    n.addEventListener("mousemove", e => showTip(e, n.dataset.tip));
    n.addEventListener("mouseleave", hideTip);
  }});
}}
render();
</script>
</body></html>
"""


def apc_stats_from(cands) -> List[Dict]:
    """Effectiveness rows from PGO candidates (or bare VmApc objects)."""
    out = []
    for c in cands:
        a = getattr(c, "apc", c)
        r = a.report
        out.append(
            {
                "name": a.name,
                "execution_count": getattr(c, "execution_count", 0),
                "before_cols": r.before["columns"],
                "after_cols": r.after["columns"],
                "before_interactions": r.before["bus_interactions"],
                "after_interactions": r.after["bus_interactions"],
                "cells_saved": getattr(c, "cells_saved", 0),
            }
        )
    return out


def build_report(
    metrics: Dict[str, Dict[str, float]],
    apcs: Optional[List[Dict]] = None,
    title: str = "powdr-tpu report",
) -> str:
    data = {"metrics": metrics, "apcs": apcs or []}
    return _TEMPLATE.format(
        title=html.escape(title), data_json=json.dumps(data, sort_keys=True)
    )


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--metrics-dir", default=None)
    ap.add_argument("--apc-stats", default=None, help="apc_stats.json from select-apcs")
    ap.add_argument("-o", "--out", default="report.html")
    ap.add_argument("--title", default="powdr-tpu report")
    args = ap.parse_args(argv)
    metrics = load_run(args.metrics_dir) if args.metrics_dir else {}
    apcs = None
    if args.apc_stats:
        with open(args.apc_stats) as f:
            apcs = json.load(f)
    with open(args.out, "w") as f:
        f.write(build_report(metrics, apcs, args.title))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
