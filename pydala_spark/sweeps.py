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

Round 12 (VERDICT r11 #3) hoists the remaining shared night
scaffolding here so each sweep body is mode dispatch + its unique
joins:

- :class:`NightGate` — the freshness map, completed-prior set, lazy
  row-count integrity and the ``all_fresh`` / ``unchanged`` facts,
  computed once per incremental night.
- :func:`fresh_summary` — the ALL-FRESH night's summary assembly
  (prior entries carried over + tonight's sidecar facts + the
  sweep-specific artifact echoes) and persist.
- :func:`read_token` / :func:`write_token` — the ``_token.json``
  commit-token protocol artifact tables ride.
- :func:`write_summary` / :func:`content_marker` — the canonical
  summary serialization and the sidecar marker-entry rule.

No behavior change at any extraction: these bodies are verbatim moves;
the sweep-specific carve-outs (verdict-table existence, byte checks,
size guards, demotion rules) stay at the call sites where their
artifacts live.
"""

from __future__ import annotations

import json
import posixpath


def content_marker(params: dict) -> dict | None:
    """The sidecar's recorded content marker as the summary-entry dict
    every sweep stores and compares (``None`` when the sidecar predates
    markers)."""
    if "content_rows" in params:
        return {"rows": int(params["content_rows"]),
                "xor": int(params["content_xor"])}
    return None


def read_token(po, path: str) -> str | None:
    """Read ``<path>/_token.json`` — the commit token artifact tables
    carry (underscore prefix ⇒ Spark's parquet reader ignores it).
    ``None`` on missing/unreadable, which every caller treats as a
    mismatch (→ full rebuild)."""
    try:
        return json.loads(po.read_text(posixpath.join(path, "_token.json")))
    except Exception:
        return None


def write_token(po, path: str, token: str) -> None:
    """Commit ``<path>/_token.json`` — written AFTER the table's
    parquet so a crash in between reads as token-mismatch, never as a
    blessed-but-stale artifact."""
    po.write_text(posixpath.join(path, "_token.json"), json.dumps(token))


def write_summary(po, rep_base: str, results: dict) -> None:
    """Persist ``<rep_base>/_summary.json`` — the canonical summary
    serialization every sweep uses (stable key order so diffs and the
    property tests read clean)."""
    po.write_text(
        posixpath.join(rep_base, "_summary.json"),
        json.dumps(results, indent=2, sort_keys=True, default=str),
    )


def fresh_summary(
    po,
    rep_base: str,
    results: dict,
    prior: dict,
    msg: str,
    lake_default: dict,
    config: dict,
    extra: dict | None = None,
) -> dict:
    """Assemble, persist and return the ALL-FRESH night's summary: every
    dataset's prior entry carried over (tonight's sidecar/marker facts
    layered on top) plus a ``fresh`` note, the prior lake stats, and
    ``_sweep_mode: "fresh"``. ``extra`` carries the sweep-specific
    artifact echoes (``_artifacts`` / ``_codebook`` / ``_state`` /
    ``_overcap`` ...) the caller computed."""
    out = {n: {**prior[n], **results[n], "fresh": msg} for n in results}
    out["_lake"] = prior.get("_lake", lake_default)
    out["_config"] = config
    out["_sweep_mode"] = "fresh"
    if extra:
        out.update(extra)
    write_summary(po, rep_base, out)
    return out


class NightGate:
    """The shared incremental-night facts a lake-global sweep dispatches
    its (full | fresh | partial) mode on, computed once per night
    (round 12, VERDICT r11 #3 — hoisted off the five sweep bodies):

    - ``fresh_map`` — per-dataset provable freshness
      (:func:`sweep_fresh_map`).
    - ``prior_counted`` — datasets whose prior entry carries the
      completion key (the only ones whose report rows exist to verify).
    - ``intact`` — of those, the ones whose report partition still
      holds exactly the recorded row count
      (:func:`dataset_report_counts` + :func:`counts_intact`),
      computed LAZILY so nights that never consult it (e.g. a
      no-prior full sweep) pay no listing.
    - ``all_fresh(require_counts)`` — the fast-path gate:
      :func:`lake_unchanged` plus, when the prior actually produced
      report rows, the row-count integrity check (``require_counts=
      False`` is the zero-output carve-out: a prior that legitimately
      wrote no table must not be barred from the fresh path forever).
    - ``unchanged`` — the provably-fresh datasets that contributed to
      tonight's union (the partial night's carry-over base).
    """

    def __init__(
        self, spark, po, results: dict, prior: dict,
        completion_key: str, target: str, tagged_names: set,
    ):
        self._spark, self._po = spark, po
        self.results, self.prior = results, prior
        self.key, self.target = completion_key, target
        self.tagged_names = tagged_names
        self.fresh_map = sweep_fresh_map(results, prior, completion_key)
        self.prior_counted = {
            k for k in prior if not k.startswith("_")
            and isinstance(prior[k], dict) and completion_key in prior[k]}
        self._intact: set | None = None

    @property
    def intact(self) -> set:
        if self._intact is None:
            counts = (
                dataset_report_counts(self._spark, self.target)
                if self.prior_counted and self._po.is_dir(self.target)
                else None)
            self._intact = counts_intact(
                counts, self.prior, self.prior_counted, self.key)
        return self._intact

    def all_fresh(self, require_counts: bool = True) -> bool:
        return lake_unchanged(
            self.results, self.prior, self.fresh_map
        ) and (not require_counts or self.intact == self.prior_counted)

    @property
    def unchanged(self) -> set:
        return {n for n, ok in self.fresh_map.items()
                if ok and n in self.tagged_names}


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
