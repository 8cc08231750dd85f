"""Thin timing/logging decorator (reference parity: SURVEY §2.10 M11,
src/pydala/utils/logging.py:24-133 — a decorator capturing call args and
wall time). Spark's own UI/event log carries the heavy telemetry; this
covers driver-side library calls.
"""

from __future__ import annotations

import functools
import logging
import time

_LOGGER_NAME = "pydala_spark"


def get_logger() -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


def logged(func=None, *, level: int = logging.INFO, with_args: bool = False):
    """Decorator: log entry/exit + wall time of a function.

    >>> @logged
    ... def compact(path): ...
    """

    def wrap(f):
        @functools.wraps(f)
        def inner(*args, **kwargs):
            logger = get_logger()
            label = f.__qualname__
            if with_args:
                label += f" args={args!r} kwargs={kwargs!r}"
            t0 = time.time()
            try:
                result = f(*args, **kwargs)
            except Exception as exc:
                logger.log(
                    logging.ERROR, "%s failed after %.3fs: %s", label,
                    time.time() - t0, exc,
                )
                raise
            logger.log(level, "%s finished in %.3fs", label, time.time() - t0)
            return result

        return inner

    return wrap(func) if func is not None else wrap
