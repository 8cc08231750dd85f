#!/usr/bin/env python
"""Local replica of the correctness driver: run every __spark_entry__
query on Spark AND its DuckDB oracle, compare row count + canonical
values, print PASS/FAIL per query with first diffs.

Usage:
  python tools/check_oracle.py                     # all queries @ sf0.01
  python tools/check_oracle.py --sf /root/testdata/sf0.001 -q q01 q03
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(value)
    if isinstance(value, bytes):
        return value.hex()
    return str(value)


def canonical_rows(df_pandas) -> list[tuple]:
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(canon(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    # action="extend": `-q a -q b` accumulates — the overwrite default
    # silently narrowed a verification sweep to the last flag's value
    ap.add_argument("-q", "--queries", nargs="*", action="extend", default=None)
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a bare SparkSession (driver simulation: no engine confs "
        "preset; queries must self-configure)",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.queries or list(queries)

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_oracle_vanilla")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from pydala_spark.session import get_session

        spark = get_session(app_name="check_oracle", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        matches = [q for q in queries if q == name or q.startswith(name)]
        if not matches:
            # an unknown name must FAIL the run — "0 pass, 0 fail, exit 0"
            # on a typo would green-light an unverified commit
            print(f"FAIL  {name}: UNKNOWN query name")
            n_fail += 1
            continue
        for qname in matches:
            t0 = time.time()
            try:
                sdf = queries[qname](spark, args.sf).toPandas()
            except Exception as exc:
                print(f"FAIL  {qname}: spark error: {exc}")
                n_fail += 1
                continue
            if qname not in oracles:
                print(
                    f"rows  {qname}: {len(sdf)} rows, no oracle "
                    f"({time.time()-t0:.1f}s)"
                )
                n_rows_only += 1
                continue
            try:
                odf = con.sql(oracles[qname]).df()
            except Exception as exc:
                print(f"FAIL  {qname}: duckdb error: {exc}")
                n_fail += 1
                continue
            problems = []
            if len(sdf) != len(odf):
                problems.append(f"rows spark={len(sdf)} oracle={len(odf)}")
            if sorted(sdf.columns) != sorted(odf.columns):
                problems.append(
                    f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
                )
            else:
                dtype_mismatch = [
                    (c, str(sdf[c].dtype), str(odf[c].dtype))
                    for c in sorted(sdf.columns)
                    if str(sdf[c].dtype) != str(odf[c].dtype)
                ]
                if dtype_mismatch:
                    print(f"warn  {qname}: pandas dtypes differ: {dtype_mismatch}")
            if not problems:
                s_rows, o_rows = canonical_rows(sdf), canonical_rows(odf)
                if s_rows != o_rows:
                    diffs = [
                        (a, b) for a, b in zip(s_rows, o_rows) if a != b
                    ][:3]
                    problems.append(f"values differ, first diffs: {diffs}")
            if problems:
                print(f"FAIL  {qname}: {'; '.join(problems)}")
                n_fail += 1
            else:
                print(f"PASS  {qname}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
                n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
