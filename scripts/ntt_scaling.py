"""NTT scaling-efficiency table (BASELINE north-star: >=80% at N>=2).

Measures the sharded four-step BabyBear NTT at a given size on
1 device vs an N-device mesh and prints elems/s + efficiency.

On real multi-chip hardware the mesh axis rides ICI; in this container
only ONE real chip exists, so `--platform cpu` (default) uses the
virtual CPU mesh: all N virtual devices share the host's cores, so the
aggregate throughput ceiling is the HOST's, and the printed efficiency
measures collective/partitioning overhead rather than true scale-out.
The 2-process variant (tests/test_multiprocess.py) exercises the
cross-process (DCN-path) collectives the same way.

Run:  JAX_PLATFORMS=cpu python scripts/ntt_scaling.py --log-n 20 --devices 8
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    # the container's sitecustomize boots the axon (tunneled-TPU) PJRT
    # plugin with jax_platforms="axon,cpu" — env vars alone can't override
    # it, so force the virtual CPU platform the way tests/conftest.py does
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) >= args.devices
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from powdr_tpu.field import babybear as bb
    from powdr_tpu.ntt import ntt as single_ntt
    from powdr_tpu.parallel.ntt import AXIS, make_sharded_ntt

    n = 1 << args.log_n
    rng = np.random.default_rng(3)
    x_host = rng.integers(0, bb.P, size=n, dtype=np.uint64).astype(np.uint32)

    def sync(a):
        jax.block_until_ready(a)

    def timed(fn, x, iters):
        sync(fn(x))  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(x))
        return (time.perf_counter() - t0) / iters

    rows = []
    for ndev in (1, args.devices):
        mesh = Mesh(np.array(jax.devices()[:ndev]), (AXIS,))
        x = jax.device_put(jnp.asarray(x_host), NamedSharding(mesh, P(AXIS)))
        fn = make_sharded_ntt(mesh, args.log_n)
        dt = timed(fn, x, args.iters)
        rows.append({"devices": ndev, "elems_per_s": n / dt})
    base = rows[0]["elems_per_s"]
    for r in rows:
        r["speedup"] = r["elems_per_s"] / base
        r["efficiency_pct"] = round(100 * r["speedup"] / r["devices"], 1)
        r["elems_per_s"] = round(r["elems_per_s"], 1)
    # bit-exactness vs the single-device reference transform
    want = np.asarray(single_ntt(jnp.asarray(x_host)))
    mesh = Mesh(np.array(jax.devices()[: args.devices]), (AXIS,))
    x = jax.device_put(jnp.asarray(x_host), NamedSharding(mesh, P(AXIS)))
    got = np.asarray(make_sharded_ntt(mesh, args.log_n)(x))
    assert (got == want).all(), "sharded NTT mismatch"
    print(json.dumps({
        "metric": f"ntt_2^{args.log_n}_scaling",
        "platform": jax.devices()[0].platform,
        "note": "virtual CPU mesh shares host cores; efficiency measures "
                "partitioning overhead, not true scale-out" if jax.devices()[0].platform == "cpu" else "",
        "rows": rows,
        "bit_exact": True,
    }))


if __name__ == "__main__":
    main()
