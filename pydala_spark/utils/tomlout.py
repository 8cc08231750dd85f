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
    if v is None or isinstance(v, dict):
        # stringifying these would emit "None" / a Python repr that
        # parses cleanly as a STRING — silent sidecar corruption the
        # reference tooling would consume without any error
        raise TypeError(
            f"TOML emitter: unsupported value {v!r} inside an array "
            "(TOML has no null; use a sub-table for mappings)"
        )
    return _quote(str(v))


def _quote(text: str) -> str:
    # JSON string escaping is a valid TOML basic string — with two
    # fixes (both found by the hypothesis round-trip fuzz):
    # ensure_ascii=False (ASCII-escaping emits astral-plane characters
    # as \ud800-surrogate PAIRS, which TOML forbids) and an explicit
    # escape for DEL, the one control char JSON leaves raw
    return json.dumps(text, ensure_ascii=False).replace("\x7f", "\\u007f")


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
                lines.append(f"{_quote(str(key))} = {_scalar(val)}"
                             if _needs_quoting(key) else f"{key} = {_scalar(val)}")
        for key, val in subs:
            seg = key if not _needs_quoting(key) else _quote(str(key))
            name = f"{prefix}.{seg}" if prefix else seg
            lines.append("")
            lines.append(f"[{name}]")
            emit(val, name)

    emit(config, "")
    return "\n".join(lines).lstrip("\n") + "\n"


import re

_BARE_KEY = re.compile(r"[A-Za-z0-9_-]+")  # TOML bare keys are ASCII-only
# (str.isalnum would wrongly accept Unicode letters like 'µ' — caught by
# the hypothesis round-trip fuzz in tests/test_properties.py)


def _needs_quoting(key: str) -> bool:
    # fullmatch, not match-with-$: '$' would accept a trailing newline
    return not _BARE_KEY.fullmatch(key)
