"""Real-chip smoke tests (opt-in: pytest -m tpu).

These run on the DEFAULT backend (the tunneled TPU in this container —
everything else in the suite forces the virtual CPU mesh) and pin the
device kernels' correctness on actual hardware: NTT round-trip vs the
host tables, Poseidon2 vs the python model, and a small end-to-end
commit.  Keep them tiny: every dispatch is a tunnel round trip."""
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    """Skip cleanly when no accelerator is reachable (the tunnel flaps).

    conftest pins jax_platforms=cpu for the rest of the suite; this
    fixture switches to the default platform set and back."""
    import subprocess
    import sys

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=120,
            capture_output=True,
        )
        ok = probe.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        pytest.skip("accelerator backend unreachable")
    import jax
    from jax.extend.backend import clear_backends

    jax.config.update("jax_platforms", None)
    clear_backends()
    if jax.devices()[0].platform == "cpu":
        pytest.skip("no accelerator platform registered")
    yield jax.devices()[0]
    jax.config.update("jax_platforms", "cpu")
    clear_backends()


def test_ntt_roundtrip_on_chip(tpu_backend, rng):
    import jax.numpy as jnp

    from powdr_tpu.field import babybear as bb
    from powdr_tpu.ntt import intt, ntt

    x = rng.integers(0, bb.P, size=1 << 12, dtype=np.uint64).astype(np.uint32)
    xm = bb.to_mont(jnp.asarray(x[None, :]))
    back = np.asarray(bb.from_mont(intt(ntt(xm))))[0]
    np.testing.assert_array_equal(back, x)


def test_poseidon2_on_chip(tpu_backend, rng):
    import jax.numpy as jnp

    from powdr_tpu.field import babybear as bb
    from powdr_tpu.hash import poseidon2 as p2
    from powdr_tpu.stark.tape import poseidon2_canonical

    state = [int(v) for v in rng.integers(0, bb.P, size=16, dtype=np.uint64)]
    arr = bb.to_mont(jnp.asarray(np.asarray(state, dtype=np.uint32)[None, :]))
    got = [int(v) for v in np.asarray(bb.from_mont(p2.permute(arr)))[0]]
    assert got == poseidon2_canonical(state)


def test_commit_on_chip(tpu_backend, rng):
    import jax.numpy as jnp

    from powdr_tpu.field import babybear as bb
    from powdr_tpu.stark import pcs
    from powdr_tpu.stark.config import StarkConfig

    cfg = StarkConfig(log_blowup=1)
    evals = bb.to_mont(
        jnp.asarray(rng.integers(0, bb.P, size=(256, 4), dtype=np.uint64).astype(np.uint32))
    )
    cm = pcs.commit(evals, cfg)
    root = np.asarray(cm.root)
    assert root.shape == (8,) and root.any()
