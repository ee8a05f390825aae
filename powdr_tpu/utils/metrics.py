"""Metrics recording + serialization.

Counterpart of the reference's metrics pipeline (SURVEY.md §5): counters
and gauges recorded during APC generation and proving, serialized to a
metrics.json whose keys match what the reference's analysis scripts read
(openvm-riscv/scripts/basic_metrics.py:40-70: total_proof_time_ms,
trace_gen_time_ms, execute_preflight_time_ms, ... and the optimizer's
before/after_opt_cols|constraints|interactions, apc_gen_time_ms from
autoprecompiles/src/lib.rs:349-387)."""
from __future__ import annotations

import json
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class Metrics:
    counters: Dict[str, float] = field(default_factory=dict)
    gauges: Dict[str, float] = field(default_factory=dict)
    labels: Dict[str, str] = field(default_factory=dict)

    def counter(self, name: str, value: float = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + value

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = value

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        yield
        self.counter(name, (time.perf_counter() - t0) * 1000.0)

    def snapshot(self) -> Dict:
        return {"counter": dict(self.counters), "gauge": dict(self.gauges)}

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.snapshot(), f, indent=1)


GLOBAL = Metrics()


class StatsLogger:
    """Per-pass timing/stats log (autoprecompiles/src/stats_logger.rs:11-35)."""

    def __init__(self, name: str = "optimizer", metrics: Optional[Metrics] = None):
        self.name = name
        self.metrics = metrics or GLOBAL
        self.t0 = time.perf_counter()
        self.entries: List[Dict] = []

    def log(self, step: str, stats: Dict[str, int]) -> None:
        dt = (time.perf_counter() - self.t0) * 1000.0
        self.t0 = time.perf_counter()
        self.entries.append({"step": step, "ms": round(dt, 2), **stats})
        self.metrics.counter(f"{self.name}_{step}_ms", dt)
