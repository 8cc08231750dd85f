"""Shared state-machine helpers for the lake-global incremental sweeps.

The three partial-incremental sweeps (`Datalake.neardup_dedup`,
`Datalake.span_dedup_report`, `Datalake.semantic_dedup(cross_dataset=
True)`) run the same three-mode night: **full** (rebuild everything),
**fresh** (the lake is provably unchanged — reuse the prior verdict
wholesale), or **partial** (K of N datasets changed — reuse the
unchanged bulk, recompute the delta). Round 11 (VERDICT r10 #5)
extracts the mode-selection rules they share so `catalog_sweeps.py` holds
orchestration only and the invalidation logic is testable in one place:

- :func:`load_prior_summary` — the prior-validity rule: a prior
  summary seeds tonight's incremental decisions ONLY if every pinned
  key (sweep config, benchmark markers, ...) matches; anything moved
  means yesterday's verdict answered a different question, so the
  sweep falls back to full.
- :func:`sweep_fresh_map` — the per-dataset provable-freshness rule
  (identical across the three sweeps modulo the completion-proof key).
- :func:`lake_unchanged` — the all-fresh gate over that map.

No behavior change vs round 10: these bodies are verbatim extractions;
the sweep-specific carve-outs (verdict-table existence, token checks,
size guards) stay at the call sites where their artifacts live.
"""

from __future__ import annotations

import json
import posixpath


def load_prior_summary(po, rep_base: str, expect: dict) -> dict | None:
    """Load ``<rep_base>/_summary.json`` as the prior-night seed.

    Returns ``None`` (→ full sweep) when the summary is missing,
    unreadable, or any ``expect[key] != prior.get(key)`` — the
    config/benchmark invalidation rule every incremental sweep applies
    before trusting a prior. Nested checks (e.g. the semantic sweep's
    codebook sha) stay with the caller.
    """
    try:
        prior = json.loads(po.read_text(
            posixpath.join(rep_base, "_summary.json")))
    except Exception:
        return None
    for key, want in expect.items():
        if prior.get(key) != want:
            return None
    return prior


def sweep_fresh_map(
    results: dict, prior: dict, completion_key: str
) -> dict[str, bool]:
    """Per-dataset provable freshness vs a validated prior summary.

    A dataset is FRESH tonight iff (the rule shared verbatim by the
    neardup / span / semantic sweeps):

    - it was skipped both nights for the SAME reason (it contributes
      nothing to either sweep's union, so identical skips keep the
      global verdict identical), or
    - no error either night, AND its sidecar was ``reused`` this night
      (``materialized`` means first contact or a content change), AND
      its content marker is non-None and equal to the prior's, AND —
      when the sweep is scored — the scored flag and score marker match
      too (scores pick keepers, and the content marker is blind to the
      score column), AND the prior entry carries ``completion_key``
      (``n_docs``/``n_spans``/``n_vectors``) proving the prior run
      completed the global phase for it — an entry without counts
      proves nothing about a verdict table.
    """
    def _fresh(name: str, entry: dict) -> bool:
        pe = prior.get(name)
        if not isinstance(pe, dict):
            return False
        if "skipped" in entry or "skipped" in pe:
            return entry.get("skipped") == pe.get("skipped")
        if "error" in entry or "error" in pe:
            return False
        if entry.get("sidecar") != "reused":
            return False
        if entry.get("marker") is None \
                or entry.get("marker") != pe.get("marker"):
            return False
        if entry.get("scored") != pe.get("scored"):
            return False
        if entry.get("scored") and (
                entry.get("score_marker") != pe.get("score_marker")):
            return False
        return completion_key in pe

    return {n: _fresh(n, e) for n, e in results.items()}


def lake_unchanged(results: dict, prior: dict, fresh: dict) -> bool:
    """The all-fresh gate: every current dataset provably fresh AND the
    prior covered exactly the same dataset set (an added or removed
    dataset changes the lake-global verdict even when every survivor
    is individually unchanged)."""
    prior_names = {k for k in prior if not k.startswith("_")}
    return prior_names == set(results) and all(fresh.values())


def dataset_report_counts(spark, path: str) -> dict[str, int] | None:
    """Count-by-dataset over a ``dataset=``-partitioned report table —
    the carry-over integrity primitive (round-11 review find): a commit
    token proves a write COMPLETED, not that every file survived since,
    so partial/fresh nights verify the rows they are about to trust
    against the prior summary's recorded counts. Metadata-priced: the
    aggregate touches only the partition column (row-group footers +
    directory names, no data pages). Returns ``None`` when the table is
    unreadable (every partition gone) — callers treat that as
    nothing-trustable."""
    from pyspark.sql import functions as F

    try:
        return {
            r["dataset"]: int(r["n"])
            for r in spark.read.parquet(path)
            .groupBy("dataset").agg(F.count("*").alias("n")).collect()
        }
    except Exception:
        return None


def counts_intact(
    counts: dict[str, int] | None, prior: dict, names, key: str
) -> set[str]:
    """The subset of ``names`` whose report-table count equals the
    prior summary's recorded ``key`` (``n_vectors``/``n_spans``/
    ``n_docs``; a dataset absent from the table counts 0, matching a
    legitimately-zero recorded count). ``counts=None`` (unreadable
    table) trusts nothing."""
    if counts is None:
        return set()
    return {
        n for n in names
        if counts.get(n, 0) == int((prior.get(n) or {}).get(key, -1))
    }
