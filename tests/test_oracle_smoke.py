"""Fast DuckDB-oracle parity smoke: a representative subset of the
declared queries at sf0.001 (the full sweep is tools/check_oracle.py)."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SMOKE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q_dedup_keep_last",
    "q_sessionize",
    "q_asof_purchase",
    # round 12: the 9-family delegated-subquery union (q21/q02/q22/
    # q16/q15/q11/q20 shapes) and the 5-family set-operations union
    # (UNION ALL / INTERSECT / EXCEPT / FULL OUTER / q13-shaped LEFT
    # OUTER) — parity-pinned in pytest, not only in the
    # tools/check_oracle.py sweep
    "q_subqueries",
    "q_set_operations",
    "q_fingerprint_winnowing",
    "q_minhash_lsh",
    "q_cosine_topk",
]

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SMOKE)
def test_oracle_parity(spark, sf_dir, ddb, name):
    sdf = entrymod.queries()[name](spark, sf_dir).toPandas()
    odf = ddb.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    cols = sorted(sdf.columns)
    srows = sorted(
        tuple(canon(v) for v in r) for r in sdf[cols].itertuples(index=False, name=None)
    )
    orows = sorted(
        tuple(canon(v) for v in r) for r in odf[cols].itertuples(index=False, name=None)
    )
    assert srows == orows


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) == 10


def test_registry_fits_driver_window():
    """The correctness driver records only the first ~50 queries()
    entries; round 1 lost 13 queries past that boundary. Every entry
    must fit — adding query #51 requires merging function-family demos
    first (see queries/merged.py)."""
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(queries) <= 50, (
        f"{len(queries)} registry entries — the driver records ~50; "
        "consolidate before adding more"
    )
    # every oracle key maps to a real query
    assert set(oracles) <= set(queries)
