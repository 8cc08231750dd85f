"""Typed error for documented, up-front config refusals.

``ConfigError`` subclasses :class:`ValueError`, so every existing
``except ValueError`` / ``pytest.raises(ValueError)`` keeps working —
the subclass exists so the CLI cron can tell a *method-level config
refusal* (exit 2, the operator typo'd the TOML) apart from a *genuine
runtime* ``ValueError`` raised mid-sweep from driver-side code (numpy,
sidecar parsing), which must be recorded as a per-section failure
(exit 1) without aborting the remaining cron sections (ADVICE r10,
``cli.py`` ``_cmd_cron``).

Rule of thumb: raise ``ConfigError`` only from validation that runs
BEFORE any sweep work touches data — if the message tells the caller
to fix an argument/TOML key, it's a ``ConfigError``.
"""

from __future__ import annotations


class ConfigError(ValueError):
    """A documented method-level refusal of the caller's configuration."""
