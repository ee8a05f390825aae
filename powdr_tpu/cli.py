"""Staged command-line pipeline with content-addressed artifact caching.

Counterpart of the reference's cli-openvm-riscv (README.md:1-41,
src/main.rs:31-130): subcommands `execute -> select-apcs -> prove` where
each stage persists its artifact under
<artifacts-dir>/<stage>/<hash>/artifact.pkl keyed by the stage's
arguments + the program identity, so later-stage flag changes don't
invalidate earlier stages.

    python -m powdr_tpu.cli execute --guest sha256
    python -m powdr_tpu.cli select-apcs --guest sha256 --apcs 2
    python -m powdr_tpu.cli prove --guest loop --mode mock --apcs 1
    python -m powdr_tpu.cli prove --guest loop --mode stark --small-tables
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import pickle
import sys
import time
from typing import Optional


def _guest(name: str):
    from .vm import guests
    from .vm.executor import assemble

    if name == "loop":
        prog = assemble([
            ("addi", 1, 0, 0, 50),
            ("addi", 2, 0, 0, 0),
            ("addi", 3, 0, 0, 0),
            "loop:",
            ("add", 2, 2, 1),
            ("addi", 3, 3, 0, 1),
            ("bne", 0, 3, 1, "loop"),
            ("sw", 0, 0, 2, 256),
            ("halt",),
        ])
        return prog, {}, lambda res: None
    fn = {
        "sha256": guests.sha256_guest,
        "keccak": guests.keccak_guest,  # chained keccak256 (guest-keccak)
        "keccak-f": guests.keccak_f_guest,  # one bare permutation
        "matmul": guests.matmul_guest,
        "u256_add": guests.u256_add_guest,
        "ecrecover": guests.ecrecover_guest,
        "pairing": guests.pairing_guest,
    }[name]
    return fn()


def _program_hash(program) -> str:
    h = hashlib.sha256()
    for ins in program:
        h.update(repr((ins.op, ins.rd, ins.rs1, ins.rs2, ins.imm)).encode())
    return h.hexdigest()[:16]


class ArtifactCache:
    def __init__(self, root: str):
        self.root = root

    def key(self, stage: str, **kwargs) -> str:
        blob = json.dumps(kwargs, sort_keys=True, default=str).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def path(self, stage: str, key: str) -> str:
        return os.path.join(self.root, stage, key, "artifact.pkl")

    def load(self, stage: str, key: str):
        p = self.path(stage, key)
        if os.path.exists(p):
            with open(p, "rb") as f:
                return pickle.load(f)
        return None

    def store(self, stage: str, key: str, value) -> None:
        p = self.path(stage, key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            pickle.dump(value, f)


def stage_execute(args, cache: ArtifactCache):
    program, mem, check = _guest(args.guest)
    # small_tables changes DT_BITS and hence the executor's segmenting and
    # range-check shapes: a cached full-size execution must not be reused
    key = cache.key(
        "execute",
        guest=args.guest,
        program=_program_hash(program),
        small_tables=args.small_tables,
    )
    result = cache.load("execute", key)
    if result is None or args.no_cache:
        t0 = time.time()
        # native columnar core (27M instr/s + vectorized witgen),
        # record-identical to the python executor (tests/test_vm.py);
        # python interpreter as the fallback of last resort
        try:
            from .vm.executor_native import run_native_columnar

            result = run_native_columnar(program, mem)
        except Exception as e:
            print(f"native executor unavailable ({e!r}); python fallback")
            from .vm.executor import Executor

            result = Executor(program, mem).run()
        print(f"executed {result.instret} instructions in {time.time()-t0:.2f}s")
        cache.store("execute", key, result)
    else:
        print(f"execute: cache hit ({result.instret} instructions)")
    if check:
        check(result)
    return program, result


def stage_select_apcs(args, cache: ArtifactCache, program, result):
    from .vm.pgo import generate_candidates, select_apcs

    key = cache.key(
        "select-apcs", guest=args.guest, program=_program_hash(program), apcs=args.apcs,
        superblocks=args.superblocks, optimistic=args.optimistic,
        pgo_mode=getattr(args, "pgo_mode", "cell"),
        max_total_columns=getattr(args, "max_total_columns", None),
    )
    cached = cache.load("select-apcs", key)
    if cached is None or args.no_cache:
        t0 = time.time()
        cands = generate_candidates(
            program, result, superblocks=args.superblocks, optimistic=args.optimistic
        )
        apcs = select_apcs(
            cands,
            max_apcs=args.apcs,
            max_total_columns=getattr(args, "max_total_columns", None),
            mode=getattr(args, "pgo_mode", "cell"),
        )
        for c in cands[: args.apcs]:
            r = c.apc.report
            print(
                f"  apc {c.apc.name}: {c.execution_count} execs, "
                f"{r.before['columns']}->{r.after['columns']} cols, "
                f"{r.before['bus_interactions']}->{r.after['bus_interactions']} interactions, "
                f"saves {c.cells_saved} cells"
            )
        print(f"selected {len(apcs)} APCs in {time.time()-t0:.2f}s")
        from .utils.report_html import apc_stats_from

        stats = apc_stats_from(cands[: args.apcs])
        cache.store("select-apcs", key, {"apcs": apcs, "stats": stats})
        if args.apc_export_dir:
            from .vm.apc import export_apc

            os.makedirs(args.apc_export_dir, exist_ok=True)
            for a in apcs:
                path = os.path.join(args.apc_export_dir, f"{a.name}.json.gz")
                export_apc(a, path)
                print(f"  exported {path}")
    else:
        # stats ride the cache so --apc-stats-json works on cache hits
        # (older caches stored the bare APC list)
        apcs = cached["apcs"] if isinstance(cached, dict) else cached
        stats = cached.get("stats", []) if isinstance(cached, dict) else []
        print(f"select-apcs: cache hit ({len(apcs)} APCs)")
    if args.apc_stats_json:
        with open(args.apc_stats_json, "w") as f:
            json.dump(stats, f, indent=1)
        print(f"apc stats written to {args.apc_stats_json}")
    return apcs


def stage_prove(args, program, result, apcs):
    from .utils.metrics import GLOBAL as metrics
    from .vm.apc import build_chips_with_apcs
    from .vm.system import build_chips, mock_check

    t0 = time.time()
    with metrics.timer("trace_gen_time_ms"):
        if apcs:
            chips = build_chips_with_apcs(program, result, apcs)
        else:
            chips = build_chips(program, result)
    print(
        "chips:",
        ", ".join(f"{c.name}(h={c.height},w={len(c.cols)})" for c in chips),
    )
    if args.mode == "mock":
        with metrics.timer("total_proof_time_ms"):
            mock_check(chips)
        print("mock check passed")
    else:
        from .stark.config import StarkConfig
        from .vm.prove import prove_chips, prove_chips_aggregated, verify_chips

        cfg = StarkConfig(
            log_blowup=2,
            num_queries=args.queries,
            proof_of_work_bits=args.pow_bits,
        )
        if args.mode == "stark-agg":
            with metrics.timer("total_proof_time_ms"):
                airs, proof, app_airs, app_proof = prove_chips_aggregated(chips, cfg)
            print(
                f"app proof ({len(app_airs)} chips) verified in-circuit; "
                f"aggregation publics bind its roots"
            )
        else:
            with metrics.timer("total_proof_time_ms"):
                airs, proof = prove_chips(chips, cfg)
        with metrics.timer("verify_time_ms"):
            verify_chips(airs, proof, cfg)
        from .stark.serialize import proof_size_breakdown, proof_to_bytes

        sizes = proof_size_breakdown(proof)
        blob = proof_to_bytes(proof)
        metrics.gauge("proof_bytes", len(blob))
        for k, v in sizes.items():
            metrics.gauge(f"proof_raw_{k}", v)
        out_path = args.proof_out or os.path.join(
            args.artifacts_dir, "prove", f"{args.guest}.proof.npz"
        )
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "wb") as f:
            f.write(blob)
        print(
            f"STARK proof verified; {len(blob)} bytes -> {out_path} "
            f"(raw: {sizes})"
        )
    metrics.gauge("instret", result.instret)
    metrics.gauge("num_apcs", len(apcs))
    if args.metrics_json:
        metrics.write(args.metrics_json)
        print(f"metrics written to {args.metrics_json}")
    print(f"prove stage: {time.time()-t0:.2f}s")


def _enable_jax_cache():
    """Persistent XLA compile cache: on the tunneled TPU a cold full-VM
    proof spends ~20 min in remote compiles; cached reruns skip all of it.

    Also honor JAX_PLATFORMS here: the container's sitecustomize pins
    jax_platforms="axon,cpu" at interpreter boot, which silently overrides
    the env var — so `JAX_PLATFORMS=cpu powdr_tpu ...` would still
    initialize (and hang on a dead) TPU tunnel without this."""
    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        jax.config.update("jax_platforms", env_platforms)
    # cache dirs keyed per platform AND host machine: CPU AOT entries
    # carry the compile host's machine features (utils/jaxcache.py)
    from .utils import jaxcache

    jaxcache.enable((env_platforms or "axon").split(",")[0])


def main(argv=None):
    ap = argparse.ArgumentParser(prog="powdr_tpu", description=__doc__)
    ap.add_argument("command", choices=["execute", "select-apcs", "prove"])
    ap.add_argument("--guest", default="loop")
    ap.add_argument("--apcs", type=int, default=0)
    ap.add_argument("--mode", choices=["mock", "stark", "stark-agg"], default="mock",
                    help="mock = constraints + bus balance; stark = real "
                         "proof; stark-agg = proof wrapped in the "
                         "aggregation circuit (app -> leaf recursion)")
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--pow-bits", type=int, default=4)
    ap.add_argument("--artifacts-dir", default=".powdr_artifacts")
    ap.add_argument("--metrics-json", default=None)
    ap.add_argument("--proof-out", default=None,
                    help="write the serialized proof here (default "
                         "<artifacts-dir>/prove/<guest>.proof.npz)")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--apc-stats-json", default=None,
                    help="write APC effectiveness stats (report_html input)")
    ap.add_argument("--apc-export-dir", default=None,
                    help="export selected APCs as ApcWithBusMap JSON "
                         "(the reference analyzer's format)")
    ap.add_argument("--superblocks", action="store_true",
                    help="mine multi-block APC candidates")
    ap.add_argument("--pgo-mode", choices=["cell", "instruction", "none"],
                    default="cell",
                    help="APC selection cost model (reference pgo/mod.rs:29-34): "
                         "cell = cells saved x executions under a column "
                         "budget with overlap accounting; instruction = "
                         "block length x executions; none = block length")
    ap.add_argument("--max-total-columns", type=int, default=None,
                    help="column budget for cell-mode selection")
    ap.add_argument("--optimistic", action="store_true",
                    help="bake empirically-observed constraints into APCs "
                         "(runtime-checked per occurrence)")
    ap.add_argument(
        "--small-tables",
        action="store_true",
        help="shrink periphery tables (CI-sized proving; see vm.isa)",
    )
    ap.add_argument(
        "--config",
        default=None,
        help="TOML config ([defaults] + [guest.<name>]; default "
             "powdr_tpu.toml if present). Env POWDR_TPU_<KEY> overrides "
             "the file; explicit CLI flags win (utils/config.py)",
    )
    args = ap.parse_args(argv)
    from .utils.config import apply_to_args, load_config

    defaults = {a.dest: a.default for a in ap._actions}
    apply_to_args(args, load_config(args.guest, path=args.config), defaults)
    _enable_jax_cache()

    if args.small_tables:
        from .vm import isa, machines, system

        isa.USE_BITWISE_FOR_BYTE_RANGE = False
        isa.DT_BITS = 10
        system.MAX_RANGE_BITS = 10
        machines.rebuild_registry()

    cache = ArtifactCache(args.artifacts_dir)
    program, result = stage_execute(args, cache)
    if args.command == "execute":
        return 0
    apcs = stage_select_apcs(args, cache, program, result) if args.apcs else []
    if args.command == "select-apcs":
        return 0
    stage_prove(args, program, result, apcs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
