"""Headline benchmark: BabyBear NTT throughput at 2^24 on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline reference point: 2^30 elems/s (~1.07e9), an estimate of the
reference stack's CUDA BabyBear NTT throughput on the L40S GPUs its
nightly bench rents (BASELINE.md: the repo publishes no absolute numbers;
this constant is our fixed comparison anchor across rounds).
"""
import json
import sys
import time

BASELINE_ELEMS_PER_S = float(1 << 30)
LOG_N = 24
ITERS = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from powdr_tpu.field import babybear as bb
    from powdr_tpu.ntt import ntt

    n = 1 << LOG_N

    @jax.jit
    def make_input():
        # generate on device: iota folded into the field (avoid pushing
        # 64 MB through the host tunnel)
        x = jax.lax.iota(jnp.uint32, n)
        return bb.mont_mul(x, jnp.uint32(bb.R2_MOD_P))

    x = make_input()
    x.block_until_ready()

    f = jax.jit(ntt)
    f(x).block_until_ready()  # compile + warm cache

    t0 = time.perf_counter()
    y = x
    for _ in range(ITERS):
        y = f(y)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS

    elems_per_s = n / dt
    print(
        json.dumps(
            {
                "metric": f"babybear_ntt_2^{LOG_N}_elems_per_s",
                "value": round(elems_per_s, 1),
                "unit": "elems/s",
                "vs_baseline": round(elems_per_s / BASELINE_ELEMS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
