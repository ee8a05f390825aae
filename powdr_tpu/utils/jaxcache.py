"""Machine-keyed persistent XLA compile cache.

XLA:CPU AOT entries embed the compile host's CPU features; loading them
on a different machine errors (or risks SIGILL — the r3 driver run lost
its whole budget to exactly this, MULTICHIP_r03).  Cache directories are
therefore keyed by platform AND a host-CPU fingerprint, so a repo moved
between machines never replays a foreign host's CPU code."""
from __future__ import annotations

import hashlib
import os
import platform as _platform


def machine_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    h = hashlib.sha256((_platform.machine() + flags).encode()).hexdigest()[:12]
    return h


def enable(platform_label: str, repo_root: str = "/root/repo") -> None:
    """Point jax's persistent compile cache at the right directory under
    <repo_root>/.jax_cache.

    The CPU platform's cache is keyed by machine (its AOT entries embed
    host CPU features).  Accelerator platforms (axon/tpu) share ONE
    directory across machines: their big executables target the chip, not
    the host, so a bench run on a new host reuses this session's warm
    compiles; the few CPU-backend entries mixed into that directory just
    warn and recompile on a foreign host."""
    import jax

    name = (
        f"{platform_label}-{machine_tag()}"
        if platform_label == "cpu"
        else platform_label
    )
    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(repo_root, ".jax_cache", name)
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
