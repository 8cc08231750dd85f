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


def test_ntz_write_roundtrip(spark, tmp_path):
    # Pin the SCOPE of session.py's inferTimestampNTZ=false: it only
    # affects parquet without Spark footer metadata (pyarrow/reference-
    # written). Our own Writer's files carry Spark's schema in the
    # footer, so NTZ round-trips as NTZ — no type fidelity loss for
    # framework-written data.
    import datetime as dt

    from pydala_spark import Dataset, Writer

    path = str(tmp_path / "ntz_ds")
    src = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1, 12, 30, 45, 123456))],
        "id long, ts timestamp_ntz",
    )
    assert dict(src.dtypes)["ts"] == "timestamp_ntz"
    Writer(spark, path).write(src)
    back = Dataset(spark, path).load()
    assert dict(back.dtypes)["ts"] == "timestamp_ntz"
    assert back.first()["ts"] == dt.datetime(2024, 3, 1, 12, 30, 45, 123456)

    # ...whereas the same data written by pyarrow (no Spark footer
    # metadata) reads as session-zoned TIMESTAMP, same stored micros
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"id": [1], "ts": pa.array(
            [dt.datetime(2024, 3, 1, 12, 30, 45, 123456)], pa.timestamp("us")
        )}),
        str(tmp_path / "ntz_ext.parquet"),
    )
    ext = spark.read.parquet(str(tmp_path / "ntz_ext.parquet"))
    assert dict(ext.dtypes)["ts"] == "timestamp"
    assert ext.first()["ts"] == dt.datetime(2024, 3, 1, 12, 30, 45, 123456)


def test_pinned_schema_matches_inferred_timestamp_type(spark, tmp_path):
    # ADVICE round-2 item: a pinned tz-naive arrow schema must produce
    # the SAME Spark type as an inferred read of the same file
    import datetime as dt

    import pyarrow as pa

    from pydala_spark import Dataset

    path = str(tmp_path / "pin_ts")
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2, 3, 4, 5))], "id long, ts timestamp"
    ).write.parquet(path)
    inferred = Dataset(spark, path).load()
    pinned = Dataset(
        spark, path,
        schema=pa.schema([("id", pa.int64()), ("ts", pa.timestamp("us"))]),
    ).load()
    assert dict(inferred.dtypes)["ts"] == dict(pinned.dtypes)["ts"] == "timestamp"
    assert inferred.first()["ts"] == pinned.first()["ts"]
