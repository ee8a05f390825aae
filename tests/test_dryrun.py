"""Quick-tier gate for the driver's multichip dryrun (VERDICT r3 #1).

Runs `__graft_entry__.dryrun_multichip(8)` in a FRESH subprocess — the
exact entry path the driver executes — under a hard timeout, so the gate
can never silently rot inside a long-lived warm test session.  The
subprocess is cold (no persistent compile cache is configured by the
dryrun), which is precisely the regime the driver measures.
"""
import os
import signal
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: hard wall-clock bound; the dryrun cold-finishes in ~165 s on a 4-core
#: box, so 600 s flags a 3.5x regression while tolerating slow CI hosts
BUDGET_S = 600


def test_dryrun_multichip_cold_within_budget():
    env = dict(os.environ)
    # the driver sets its own platform/device flags; mirror its setup and
    # drop any test-session overrides that would warm or skew the run
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("POWDR_TPU_EAGER_PROVER", None)
    env.pop("POWDR_TPU_SHARD_MIN_LOG_N", None)
    env.pop("POWDR_TPU_MIN_LOG_HEIGHT", None)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)" % REPO
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=BUDGET_S,
            capture_output=True,
            text=True,
            cwd=REPO,
            env=env,
        )
    except subprocess.TimeoutExpired as e:
        tail = ((e.stdout or b"").decode() if isinstance(e.stdout, bytes) else e.stdout or "")[-2000:]
        pytest.fail(f"dryrun_multichip exceeded {BUDGET_S}s; tail:\n{tail}")
    assert r.returncode == 0, f"dryrun failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    assert "dryrun_multichip ok" in r.stdout


def test_entry_compiles():
    """entry() must stay jittable (the driver compile-checks it)."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    def _alarm(signum, frame):
        raise TimeoutError("entry() compile exceeded budget")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(300)
    try:
        import jax

        fn, args = g.entry()
        out = fn.lower(*args).compile()
        jax.block_until_ready(out(*args))
    finally:
        signal.alarm(0)
