"""Plan inspection utilities: verify that Catalyst produced the plan we
designed for — filters pushed to the parquet scan, small dims broadcast,
expressions inside whole-stage codegen.

The reference delegates planning entirely to its embedded engine and has
no plan introspection; at 100 TB plan shape IS the performance model, so
these helpers are first-class here (used by tests to pin plan properties,
and by humans to iterate on operators).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def executed_plan_str(df: DataFrame) -> str:
    """Final (post-AQE) physical plan — RUNS the query (count) first.

    Pre-execution explain of an adaptive plan hides whole-stage-codegen
    spans and runtime re-planning (coalesced partitions, skew splits,
    broadcast demotions); inspect the executed plan for those. Note it
    must be ``collect`` (not ``count``) — count() builds a *new* query
    execution and this DataFrame's own plan would never finalize.
    """
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _balanced(text: str, start: int, opens: str, closes: str) -> str:
    """Substring from ``start`` (at an opener) to its matching closer,
    content only. Depth counts every opener/closer class so nested
    brackets/parens/angles survive (``In(id, [1,2,3])``,
    ``decimal(18,2)``, ``struct<a: struct<b: int>>``)."""
    depth = 0
    for i in range(start, len(text)):
        ch = text[i]
        if ch in opens:
            depth += 1
        elif ch in closes:
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    return text[start + 1 :]


def _split_depth0(s: str) -> list[str]:
    parts: list[str] = []
    depth, cur = 0, []
    for ch in s:
        if ch in "([<":
            depth += 1
        elif ch in ")]>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters reported by every file scan in the physical plan.
    Bracket-aware: an ``In(id, [1,2,3])`` filter is ONE entry, and
    filters after it are not lost to a greedy first-``]`` match."""
    text = explain_str(df)
    out: list[str] = []
    marker = "PushedFilters: "
    idx = text.find(marker)
    while idx != -1:
        body = _balanced(text, idx + len(marker), "[(", ")]")
        out.extend(_split_depth0(body))
        idx = text.find(marker, idx + len(marker))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column pruning check).
    Splits the struct body at depth 0 only, so ``decimal(18,2)`` and
    nested ``struct<...>`` types don't shed phantom columns."""
    text = explain_str(df)
    schemas = []
    marker = "ReadSchema: struct"
    idx = text.find(marker)
    while idx != -1:
        body = _balanced(text, idx + len(marker), "<([", ")]>")
        cols = [c.split(":")[0].strip() for c in _split_depth0(body)]
        schemas.append(cols)
        idx = text.find(marker, idx + len(marker))
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    text = explain_str(df)
    return "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text


def shuffle_count(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges in the physical plan (broadcast
    exchanges excluded — they move only the small side). AQE may still
    remove some at runtime."""
    text = explain_str(df)
    # formatted mode: node headers like "(5) Exchange" vs "(7) BroadcastExchange"
    n = len(re.findall(r"\(\d+\) Exchange\b", text))
    if n == 0:
        # simple/tree mode fallback
        n = len(re.findall(r"(?<!Broadcast)Exchange (?:hash|range|Single|RoundRobin)", text))
    return n


def codegen_stage_count(df: DataFrame, executed: bool = True) -> int:
    """Distinct whole-stage-codegen spans; 0 means everything runs
    interpreted (a red flag for row-at-a-time hot paths). Executes the
    query by default — AQE only reveals codegen in the final plan."""
    text = executed_plan_str(df) if executed else explain_str(df)
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", text))
    ids |= set(re.findall(r"\[codegen id : (\d+)\]", text))
    ids |= set(re.findall(r"\*\((\d+)\) ", text))  # tree-string marker
    return len(ids)


def plan_report(df: DataFrame, executed: bool = False) -> dict:
    """One-stop structured summary for notebooks/tests (pass
    ``executed=True`` to run the query and report post-AQE facts)."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schema_columns(df),
        "broadcast_join": has_broadcast_join(df),
        "shuffles": shuffle_count(df),
        "codegen_stages": codegen_stage_count(df, executed=executed),
    }
