"""Null and edge-case semantics: the reference's delta/dedup operators
hinge on EXCEPT-distinct (null-safe) behavior (SURVEY §2.5 J1-J2,
utils/table.py:135-228); these tests pin our equivalents."""

import datetime as dt

import pytest
from pyspark.sql import Row

from pydala_spark.dataset.reader import apply_distinct
from pydala_spark.dataset.writer import parse_interval, tables_diff
from pydala_spark.operators.asof import asof_join

TS = dt.datetime


def test_tables_diff_fullrow_null_safe(spark):
    existing = spark.createDataFrame(
        [Row(k=None, v="x"), Row(k=1, v=None)], "k int, v string"
    )
    incoming = spark.createDataFrame(
        [Row(k=None, v="x"), Row(k=1, v=None), Row(k=2, v="new")],
        "k int, v string",
    )
    out = tables_diff(incoming, existing).collect()
    # null rows match null rows (EXCEPT is null-safe): only (2,'new') is new
    assert [(r["k"], r["v"]) for r in out] == [(2, "new")]


def test_tables_diff_subset_null_keys(spark):
    existing = spark.createDataFrame([Row(k=None, v=1)], "k int, v int")
    incoming = spark.createDataFrame(
        [Row(k=None, v=99), Row(k=3, v=3)], "k int, v int"
    )
    out = tables_diff(incoming, existing, subset=["k"]).collect()
    assert [(r["k"], r["v"]) for r in out] == [(3, 3)]


def test_apply_distinct_null_keys_group_together(spark):
    df = spark.createDataFrame(
        [Row(k=None, ord=1, v="first"), Row(k=None, ord=2, v="second"),
         Row(k=1, ord=1, v="only")],
        "k int, ord int, v string",
    )
    out = apply_distinct(df, subset=["k"], keep="first", presort=[("ord", True)])
    got = {r["k"]: r["v"] for r in out.collect()}
    # NULL keys form ONE group (Spark groupBy treats nulls equal — same
    # as the reference's polars/DuckDB grouping)
    assert got == {None: "first", 1: "only"}


def test_apply_distinct_presort_nulls_last(spark):
    df = spark.createDataFrame(
        [Row(k=1, ord=None, v="null-ord"), Row(k=1, ord=5, v="real-ord")],
        "k int, ord int, v string",
    )
    first = apply_distinct(df, subset=["k"], keep="first", presort=[("ord", True)])
    assert first.first()["v"] == "real-ord"  # nulls sort last on keep-first
    last = apply_distinct(df, subset=["k"], keep="last", presort=[("ord", True)])
    assert last.first()["v"] == "null-ord"


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=TS(2024, 1, 1), tag="a")], "k int, ts timestamp, tag string"
    )
    right = spark.createDataFrame([], "k int, ts timestamp, px double")
    out = asof_join(left, right, on="ts", by="k", right_cols=["px"]).collect()
    assert len(out) == 1 and out[0]["px"] is None


def test_asof_join_name_collision_suffix(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=TS(2024, 1, 2), px=7.0)], "k int, ts timestamp, px double"
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=TS(2024, 1, 1), px=1.0)], "k int, ts timestamp, px double"
    )
    out = asof_join(left, right, on="ts", by="k", right_cols=["px"]).first()
    assert out["px"] == 7.0 and out["px_right"] == 1.0


def test_parse_interval_bad_unit():
    with pytest.raises(ValueError):
        parse_interval("5parsecs")


def test_writer_mode_validation(spark, tmp_path):
    from pydala_spark import Writer

    w = Writer(spark, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="mode must be one of"):
        w.write(spark.range(1), mode="merge_into")


def test_dedup_empty_and_null_text(spark):
    from pydala_spark.operators.dedup import minhash_signatures
    from pydala_spark.operators.textstats import fingerprint

    df = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text=None), Row(doc_id=3, text="hello world")],
        "doc_id long, text string",
    )
    fps = df.select("doc_id", fingerprint("text").alias("fp")).collect()
    by_id = {r["doc_id"]: r["fp"] for r in fps}
    # round 5: EMPTY normalized text fingerprints as NULL too — a shared
    # md5('') sentinel would dedup all contentless docs into one
    assert by_id[1] is None
    assert by_id[2] is None  # null text stays null, never equal to anything
    sigs = minhash_signatures(df, "doc_id")
    ids = {r["doc_id"] for r in sigs.collect()}
    # contentless docs (empty or null text) yield no shingles at all —
    # they never become LSH candidates of each other
    assert ids == {3}
