"""Headline benchmark: BabyBear NTT throughput at 2^24 on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (headline)
plus an "extra" object with secondary end-to-end metrics
(guest_keccak_proofs_per_min, loop guest proof seconds) when BENCH_E2E=1
— the e2e run proves a full VM execution on the chip, so it is opt-out
by default only where the chip is unreachable.

Methodology (headline): the transform is the Bailey four-step NTT
(ntt/fourstep.py: two leading-axis DIF ladders + mid twiddle + two
transposes; natural input, bit-reversed output — the order convention the
whole prover pipeline uses; data at rest never needs the bitrev gather).
Timing chains k transforms inside one jitted fori_loop and differences
two chain lengths, which cancels the ~0.4s dispatch round-trip of the
tunneled TPU plus any constant overheads.

vs_baseline reference point: 2^30 elems/s (~1.07e9), an estimate of the
reference stack's CUDA BabyBear NTT throughput on the L40S GPUs its
nightly bench rents (BASELINE.md: the repo publishes no absolute
numbers; this constant is our fixed comparison anchor across rounds).
"""
import functools
import json
import os
import sys
import time

BASELINE_ELEMS_PER_S = float(1 << 30)
LOG_N = 24
SHORT, LONG = 2, 18


def _run_guest(name: str):
    from powdr_tpu.cli import _guest

    prog, mem, _check = _guest(name)
    try:
        from powdr_tpu.vm.executor_native import run_native_columnar

        # 2^27 covers the largest guest (pairing, ~61M instructions)
        res = run_native_columnar(prog, mem, max_steps=1 << 27)
    except Exception:
        from powdr_tpu.vm.executor import Executor

        res = Executor(prog, mem).run()
    return prog, res


def e2e_proof_metrics() -> dict:
    """End-to-end per-guest proof metrics over ALL FIVE BASELINE configs
    (reference surface: openvm-riscv/scripts/basic_metrics.py
    total_proof_time_ms; nightly list scripts/analyze_nightly.py:31):

      1. guest-keccak + APC  (the north-star proofs/min config)
      2. guest-keccak (plain; continuity with earlier rounds)
      3. guest-sha256
      4. guest-u256 + guest-matmul
      5. guest-ecrecover  (segmented continuation proof)
      6. guest-pairing    (largest trace; segmented)

    at the DEFAULT ~100-bit security preset.  Ordered so a budget stop
    never leaves the north-star metric dark.  The first proof of a guest
    pays tracing (XLA compiles land in the persistent cache across
    runs); proofs/min is the warm steady state — the serving regime,
    where compiled programs are reused across proofs."""
    from powdr_tpu.stark.config import DEFAULT as cfg
    from powdr_tpu.vm.prove import (
        prove_chips,
        prove_chips_segmented,
        verify_chips,
    )
    from powdr_tpu.vm.system import build_chip_segments, build_chips

    import signal
    out = {}
    budget = float(os.environ.get("BENCH_E2E_BUDGET_S", "4200"))

    def _alarm(signum, frame):
        raise TimeoutError("e2e budget exhausted")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(budget))
    t_start = time.perf_counter()

    def remaining():
        return budget - (time.perf_counter() - t_start)

    def prove_once(label, chips_or_segments, segmented=False, warm_rep=True):
        t0 = time.perf_counter()
        if segmented:
            airs, proof = prove_chips_segmented(chips_or_segments, cfg)
        else:
            airs, proof = prove_chips(chips_or_segments, cfg)
        dt_cold = time.perf_counter() - t0
        out[f"guest_{label}_proof_cold_s"] = round(dt_cold, 2)
        # warm rep only if it plausibly fits the budget
        if warm_rep and remaining() > 1.5 * dt_cold * 0.2 + 60:
            t0 = time.perf_counter()
            if segmented:
                airs, proof = prove_chips_segmented(chips_or_segments, cfg)
            else:
                airs, proof = prove_chips(chips_or_segments, cfg)
            dt = time.perf_counter() - t0
            out[f"guest_{label}_proof_s"] = round(dt, 2)
            out[f"guest_{label}_proofs_per_min"] = round(60.0 / dt, 3)
        verify_chips(airs, proof, cfg)
        out[f"guest_{label}_verified"] = True

    try:
        # 1. keccak + APC (north star)
        prog, res = _run_guest("keccak")
        try:
            from powdr_tpu.vm.apc import build_chips_with_apcs
            from powdr_tpu.vm.pgo import generate_candidates, select_apcs

            cands = generate_candidates(
                prog, res, superblocks=True, max_candidates=6
            )
            apcs = select_apcs(cands, max_apcs=3)
            out["keccak_apcs_selected"] = len(apcs)
            chips = build_chips_with_apcs(prog, res, apcs)
            prove_once("keccak_apc", chips)
        except TimeoutError:
            raise
        except Exception as e:
            out["keccak_apc_error"] = repr(e)[:200]
        # 2. keccak plain (r3-continuity metric)
        if remaining() > 600:
            chips = build_chips(prog, res)
            prove_once("keccak", chips)
        # 3-4. sha256, u256, matmul (single segment)
        for guest in ("sha256", "u256_add", "matmul"):
            if remaining() < 400:
                out["budget_stop"] = guest
                break
            prog, res = _run_guest(guest)
            prove_once(guest, build_chips(prog, res), warm_rep=remaining() > 900)
        else:
            # 5-6. ecrecover + pairing, segmented continuation proofs
            for guest in ("ecrecover", "pairing"):
                if remaining() < 600:
                    out["budget_stop"] = guest
                    break
                prog, res = _run_guest(guest)
                segments = build_chip_segments(
                    prog, res, max_rows_per_segment=1 << 20
                )
                out[f"guest_{guest}_segments"] = len(segments)
                prove_once(guest, segments, segmented=True, warm_rep=False)
    except TimeoutError:
        out["budget_stop"] = "timeout"  # report whatever finished
    except Exception as e:  # keep the headline metric alive
        out["e2e_error_late"] = repr(e)[:300]
    finally:
        signal.alarm(0)
    return out


def _probe_backend(timeout_s: int = 300, attempts: int = 5) -> bool:
    """Initialize the JAX backend in a THROWAWAY subprocess first: a dead
    TPU tunnel hangs inside the PJRT client C call, where no in-process
    signal can interrupt it.  The tunnel flaps with recovery windows, so
    retry a few times; on persistent failure the bench reports an error
    line instead of hanging the driver."""
    import subprocess

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i + 1 < attempts:
            time.sleep(60)
    return False


def main() -> None:
    if not _probe_backend():
        print(
            json.dumps(
                {
                    "metric": f"babybear_ntt_2^{LOG_N}_elems_per_s",
                    "value": 0.0,
                    "unit": "elems/s",
                    "vs_baseline": 0.0,
                    "extra": {"error": "jax backend unreachable (tunnel down?)"},
                }
            )
        )
        return

    import jax

    from powdr_tpu.utils import jaxcache

    jaxcache.enable("axon")

    # e2e proof metrics FIRST (BASELINE's guest-keccak proofs/min is the
    # north-star number; the NTT sweep runs on whatever budget remains)
    extra = {}
    if os.environ.get("BENCH_E2E", "1") != "0":
        try:
            extra = e2e_proof_metrics()
        except Exception as e:  # the headline metric must still report
            extra = {"e2e_error": repr(e)[:200]}

    import jax.numpy as jnp
    import numpy as np

    from powdr_tpu.field import babybear as bb
    from powdr_tpu.ntt import fourstep

    n = 1 << LOG_N

    def sync(a):
        return np.asarray(jax.jit(lambda v: jnp.sum(v, dtype=jnp.uint32).reshape(1))(a))

    @jax.jit
    def make_input():
        x = jax.lax.iota(jnp.uint32, n)
        return bb.mont_mul(x, jnp.uint32(bb.R2_MOD_P))

    x = make_input()
    sync(x)
    tables = fourstep.tables_for(LOG_N, False)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain(x, tables, iters):
        return jax.lax.fori_loop(
            0, iters, lambda i, v: fourstep.fourstep_nat_to_rev(v, *tables), x
        )

    # compile both chain lengths
    sync(chain(x, tables, SHORT))
    sync(chain(x, tables, LONG))

    t_short = min(_timed(sync, chain, x, tables, SHORT) for _ in range(3))
    t_long = min(_timed(sync, chain, x, tables, LONG) for _ in range(3))
    dt = (t_long - t_short) / (LONG - SHORT)

    elems_per_s = n / dt
    result = {
        "metric": f"babybear_ntt_2^{LOG_N}_elems_per_s",
        "value": round(elems_per_s, 1),
        "unit": "elems/s",
        "vs_baseline": round(elems_per_s / BASELINE_ELEMS_PER_S, 4),
    }
    if extra:
        result["extra"] = extra
    # basic_metrics.py-compatible per-guest keys (reference:
    # openvm-riscv/scripts/basic_metrics.py total_proof_time_ms)
    metrics = {}
    for k, v in extra.items():
        if k.endswith("_proof_s"):
            g = k[len("guest_"):-len("_proof_s")]
            metrics[f"{g}_total_proof_time_ms"] = round(v * 1000)
    if metrics:
        with open("bench_metrics.json", "w") as f:
            json.dump(metrics, f, indent=1)
    print(json.dumps(result))


def _timed(sync, chain, x, tables, iters):
    t0 = time.perf_counter()
    sync(chain(x, tables, iters))
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())
