"""Timestamp-unit boundary (SURVEY §7.4 hard part #3): the reference data
carries timestamp[ns] (events.ts) and timestamp[ms] (l_shipdate); Spark
normalizes to µs. These tests pin that the normalization is numerically
identical to DuckDB's CAST truncation — the contract every oracle query
relies on."""

import duckdb

from pydala_spark.sources import load_table


def test_ns_truncation_matches_duckdb(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    got = df.selectExpr(
        "date_format(min(ts), 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS lo",
        "date_format(max(ts), 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS hi",
        "count(*) AS n",
    ).first()
    want = duckdb.sql(
        f"""SELECT strftime(min(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f') lo,
                   strftime(max(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S.%f') hi,
                   count(*) n
            FROM '{sf_dir}/events.parquet'"""
    ).fetchone()
    assert (got["lo"], got["hi"], got["n"]) == want


def test_ms_timestamps_native(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem")
    got = df.selectExpr(
        "date_format(min(l_shipdate), 'yyyy-MM-dd HH:mm:ss') AS lo"
    ).first()["lo"]
    want = duckdb.sql(
        f"""SELECT strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S')
            FROM '{sf_dir}/lineitem.parquet'"""
    ).fetchone()[0]
    assert got == want
