"""Minimal TOML emitter for sidecar write-back.

The stdlib ships ``tomllib`` (read-only); mixed deployments where
reference tooling keeps reading its own ``_dataset.toml`` sidecars
(reference src/pydala/dataset/timefly.py:50) need us to WRITE them too.
This covers exactly the shapes our configs use — nested tables, strings,
numbers, bools, flat lists — and every output round-trips through
``tomllib.loads`` (pinned by test)."""

from __future__ import annotations

import json


def _scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_scalar(x) for x in v) + "]"
    # JSON string escaping is a valid TOML basic string
    return json.dumps(str(v))


def dumps(config: dict) -> str:
    """Serialize a nested dict of scalars/lists/sub-dicts to TOML."""
    lines: list[str] = []

    def emit(table: dict, prefix: str) -> None:
        subs = []
        for key, val in table.items():
            if val is None:
                continue  # TOML has no null; absent key is the convention
            if isinstance(val, dict):
                subs.append((key, val))
            else:
                lines.append(f"{json.dumps(str(key))} = {_scalar(val)}"
                             if _needs_quoting(key) else f"{key} = {_scalar(val)}")
        for key, val in subs:
            seg = key if not _needs_quoting(key) else json.dumps(str(key))
            name = f"{prefix}.{seg}" if prefix else seg
            lines.append("")
            lines.append(f"[{name}]")
            emit(val, name)

    emit(config, "")
    return "\n".join(lines).lstrip("\n") + "\n"


def _needs_quoting(key: str) -> bool:
    return not key.replace("-", "").replace("_", "").isalnum()
