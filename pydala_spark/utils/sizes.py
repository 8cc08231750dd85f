"""Byte-size unit conversion (reference ``convert_size_unit``,
src/pydala/utils/base.py:63-75)."""

from __future__ import annotations

_UNITS = {"B": 0, "KB": 1, "MB": 2, "GB": 3, "TB": 4, "PB": 5}


def convert_size_unit(n_bytes: float, unit: str = "MB") -> float:
    """Bytes -> the requested unit (1024-based), rounded to 2 decimals."""
    exponent = _UNITS.get(unit.upper())
    if exponent is None:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    return round(n_bytes / (1024.0**exponent), 2)
