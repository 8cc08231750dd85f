"""Unit tests for the shared sweep state-machine rules (round 11,
VERDICT r10 #5 — extracted from catalog.py; these pin the invalidation
semantics independently of any Spark session)."""

import json

from pydala_spark.sweeps import (
    lake_unchanged,
    load_prior_summary,
    sweep_fresh_map,
)


class FakePO:
    def __init__(self, files: dict[str, str]):
        self.files = files

    def read_text(self, path: str) -> str:
        return self.files[path]


def test_load_prior_summary_rules():
    good = {"_config": {"k": 1}, "da": {"n_docs": 2}}
    po = FakePO({"/lake/_rep/_summary.json": json.dumps(good)})
    assert load_prior_summary(po, "/lake/_rep", {"_config": {"k": 1}}) \
        == good
    # any pinned key mismatch -> None (config moved)
    assert load_prior_summary(po, "/lake/_rep", {"_config": {"k": 2}}) \
        is None
    # extra pinned keys must ALL match
    assert load_prior_summary(
        po, "/lake/_rep",
        {"_config": {"k": 1}, "_benchmark": {"rows": 5}}) is None
    # missing/unreadable summary -> None
    assert load_prior_summary(FakePO({}), "/lake/_rep", {}) is None
    bad = FakePO({"/lake/_rep/_summary.json": "{not json"})
    assert load_prior_summary(bad, "/lake/_rep", {}) is None


def test_sweep_fresh_map_rules():
    m = {"rows": 3, "xor": 7}
    prior = {
        "ok": {"sidecar": "materialized", "marker": m, "scored": False,
               "n_docs": 3},
        "skipped_same": {"skipped": "no (text) column"},
        "skipped_diff": {"skipped": "no data files"},
        "errored": {"error": "Boom"},
        "incomplete": {"sidecar": "materialized", "marker": m,
                       "scored": False},  # no completion key
        "score_moved": {"sidecar": "materialized", "marker": m,
                        "scored": True, "score_marker": {"rows": 3,
                                                         "xor": 1},
                        "n_docs": 3},
        "_config": {"k": 1},  # private keys never enter the map
    }
    results = {
        "ok": {"sidecar": "reused", "marker": m, "scored": False},
        "skipped_same": {"skipped": "no (text) column"},
        "skipped_diff": {"skipped": "no (text) column"},
        "errored": {"sidecar": "reused", "marker": m, "scored": False},
        "incomplete": {"sidecar": "reused", "marker": m,
                       "scored": False},
        "score_moved": {"sidecar": "reused", "marker": m, "scored": True,
                        "score_marker": {"rows": 3, "xor": 2}},
        "new_ds": {"sidecar": "materialized", "marker": m,
                   "scored": False},
    }
    fm = sweep_fresh_map(results, prior, "n_docs")
    assert fm == {
        "ok": True,              # reused + marker match + completed
        "skipped_same": True,    # identical skip reasons
        "skipped_diff": False,   # skip reason moved
        "errored": False,        # prior error
        "incomplete": False,     # prior never completed global phase
        "score_moved": False,    # content same, scores moved
        "new_ds": False,         # no prior entry / materialized
    }
    # marker mismatch and materialized both break freshness
    r2 = dict(results, ok={"sidecar": "reused",
                           "marker": {"rows": 4, "xor": 7},
                           "scored": False})
    assert sweep_fresh_map(r2, prior, "n_docs")["ok"] is False
    # the completion key is sweep-specific
    assert sweep_fresh_map(
        {"ok": results["ok"]}, prior, "n_spans")["ok"] is False


def test_lake_unchanged_gate():
    prior = {"a": {}, "b": {}, "_config": {}}
    fresh_all = {"a": True, "b": True}
    assert lake_unchanged({"a": 1, "b": 2}, prior, fresh_all)
    # one stale dataset
    assert not lake_unchanged({"a": 1, "b": 2}, prior,
                              {"a": True, "b": False})
    # added dataset (prior didn't cover it)
    assert not lake_unchanged({"a": 1, "b": 2, "c": 3}, prior,
                              {"a": True, "b": True, "c": True})
    # removed dataset (prior covered more)
    assert not lake_unchanged({"a": 1}, prior, {"a": True})
