"""Layered run configuration: defaults < config file < env vars < CLI.

Counterpart of the reference's config surface beyond CLI flags (per-guest
benchmark configs and env knobs; SURVEY.md §5 'Config/flag system').
A TOML file (default `powdr_tpu.toml` in the working directory) provides
a `[defaults]` table plus per-guest `[guest.<name>]` tables; environment
variables `POWDR_TPU_<KEY>` override the file; explicit CLI flags win.

    [defaults]
    queries = 20
    pow_bits = 4

    [guest.keccak]
    apcs = 2
    superblocks = true

    POWDR_TPU_QUERIES=12 python -m powdr_tpu.cli prove --guest keccak
"""
from __future__ import annotations

import os
import tomllib
from typing import Any, Dict, Optional

#: known keys and their types (env parsing + validation)
SCHEMA: Dict[str, type] = {
    "apcs": int,
    "mode": str,
    "queries": int,
    "pow_bits": int,
    "artifacts_dir": str,
    "metrics_json": str,
    "no_cache": bool,
    "apc_stats_json": str,
    "apc_export_dir": str,
    "superblocks": bool,
    "optimistic": bool,
    "small_tables": bool,
}

ENV_PREFIX = "POWDR_TPU_"


def _coerce(key: str, raw: Any) -> Any:
    ty = SCHEMA[key]
    if isinstance(raw, ty):
        return raw
    if ty is bool:
        if isinstance(raw, str):
            return raw.strip().lower() in ("1", "true", "yes", "on")
        return bool(raw)
    return ty(raw)


def load_config(
    guest: str,
    path: Optional[str] = None,
    env: Optional[Dict[str, str]] = None,
) -> Dict[str, Any]:
    """Effective (file + env) settings for `guest`; unknown keys raise."""
    out: Dict[str, Any] = {}
    if path is None and os.path.exists("powdr_tpu.toml"):
        path = "powdr_tpu.toml"
    if path is not None:
        with open(path, "rb") as f:
            doc = tomllib.load(f)
        for section in (doc.get("defaults", {}), doc.get("guest", {}).get(guest, {})):
            for k, v in section.items():
                if k not in SCHEMA:
                    raise KeyError(f"unknown config key {k!r} (known: {sorted(SCHEMA)})")
                out[k] = _coerce(k, v)
    for name, val in (env if env is not None else os.environ).items():
        if not name.startswith(ENV_PREFIX):
            continue
        key = name[len(ENV_PREFIX) :].lower()
        if key in SCHEMA:
            out[key] = _coerce(key, val)
    return out


def apply_to_args(args, config: Dict[str, Any], parser_defaults: Dict[str, Any]):
    """Fill argparse `args` with config values wherever the user did not
    pass an explicit flag (detected as 'attr still equals the parser
    default')."""
    for key, val in config.items():
        if getattr(args, key, None) == parser_defaults.get(key):
            setattr(args, key, val)
    return args
