"""AOT-exported prover programs (ROADMAP: "cold != 23 min").

A cold proof spends most of its wall clock TRACING and LOWERING the
fused round programs (the persistent XLA cache only skips the backend
compile).  Here each fused program is exported once with jax.export and
serialized under .jax_cache/aot/ keyed by (platform, code hash, air
fingerprints, shapes, config); later processes deserialize — skipping
trace+lower entirely — and the backend compile hits the persistent
cache.  Keys include a hash of the compute-path sources, so editing the
prover invalidates stale artifacts automatically.
"""
from __future__ import annotations

import functools
import hashlib
import os
from typing import Callable, Optional

_AOT_DIR = os.environ.get("POWDR_TPU_AOT_DIR", "/root/repo/.jax_cache/aot")

#: modules whose source defines the traced computations
_CODE_MODULES = (
    "powdr_tpu.stark.prover",
    "powdr_tpu.stark.pcs",
    "powdr_tpu.stark.fri",
    "powdr_tpu.stark.air",
    "powdr_tpu.stark.config",
    "powdr_tpu.ir.expression",
    "powdr_tpu.field.babybear",
    "powdr_tpu.field.ext",
    "powdr_tpu.hash.poseidon2",
    "powdr_tpu.hash.merkle",
    "powdr_tpu.ntt.ntt",
    "powdr_tpu.ntt.fourstep",
)


@functools.lru_cache(maxsize=1)
def _code_hash() -> str:
    import importlib

    h = hashlib.sha256()
    for name in _CODE_MODULES:
        try:
            mod = importlib.import_module(name)
            with open(mod.__file__, "rb") as f:
                h.update(f.read())
        except Exception:
            h.update(name.encode())
    return h.hexdigest()[:16]


def enabled() -> bool:
    return os.environ.get("POWDR_TPU_AOT", "1") == "1"


def get_or_export(key_parts: tuple, make_jit: Callable, example_args: tuple):
    """Return a callable equivalent to make_jit() applied to arguments of
    example_args' shapes; loads a serialized export when one exists, else
    traces+lowers once and persists it.  Returns None when AOT is
    disabled or the platform/key can't support it (callers fall back to
    plain jit)."""
    if not enabled():
        return None
    import jax

    platform = jax.devices()[0].platform
    try:
        key = hashlib.sha256(
            repr((platform, _code_hash(), key_parts)).encode()
        ).hexdigest()
    except Exception:
        return None
    path = os.path.join(_AOT_DIR, f"{key}.bin")
    from jax import export as jexport

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                exp = jexport.deserialize(f.read())
            return exp.call
        except Exception:
            pass  # stale/corrupt artifact: re-export below
    try:
        exp = jexport.export(jax.jit(make_jit))(*example_args)
        blob = exp.serialize()
        os.makedirs(_AOT_DIR, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return exp.call
    except Exception:
        return None
