"""Declared queries for the deterministic sampling operators.

Oracle portability: the bucket value is the first 8 md5 hex digits as an
integer. Spark computes it with ``conv(substring(md5(k),1,8),16,10)``;
DuckDB has no base-conversion function, so the oracle folds the digits
with ``instr('0123456789abcdef', d) - 1`` positional arithmetic — the
same trick as the SimHash oracle. Thresholds are Python-computed once
and inlined into BOTH sides so they can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydala_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    sample_threshold,
    stratified_sample,
    train_test_split,
)
from pydala_spark.sources import load_table


def _hex_val_sql(hexpr: str, digits: int = 8) -> str:
    """DuckDB SQL for the integer value of the first ``digits`` hex chars."""
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({hexpr}, {i + 1}, 1)) - 1) * "
        f"{16 ** (digits - 1 - i)}"
        for i in range(digits)
    )
    return f"({terms})"


_BUCKET_SQL = _hex_val_sql("md5(CAST(doc_id AS VARCHAR))")


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic Bernoulli sample of documents (zero-shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.10).select(
        "doc_id", "lang", hash_bucket("doc_id").alias("bucket")
    )


_Q_HASH_SAMPLE_SQL = f"""
SELECT doc_id, lang, {_BUCKET_SQL} AS bucket
FROM documents
WHERE {_BUCKET_SQL} < {sample_threshold(0.10)}
"""


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 70/20/10 train/test/val split: counts per (lang, split)."""
    docs = load_table(spark, sf_dir, "documents")
    split = train_test_split(docs, "doc_id", test_fraction=0.2, val_fraction=0.1)
    return split.groupBy("lang", "split").agg(F.count("*").alias("n"))


_TEST_HI = sample_threshold(0.2)
_VAL_HI = _TEST_HI + sample_threshold(0.1)

_Q_SPLIT_SQL = f"""
SELECT lang,
  CASE WHEN {_BUCKET_SQL} < {_TEST_HI} THEN 'test'
       WHEN {_BUCKET_SQL} < {_VAL_HI} THEN 'val'
       ELSE 'train' END AS split,
  CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced sample: exactly 20 documents per language, picked
    by deterministic hash order."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "doc_id", ["lang"], 20).select("doc_id", "lang")


_Q_STRATIFIED_SQL = """
SELECT doc_id, lang FROM documents
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
"""


SAMPLING_QUERIES = {
    "q_hash_sample": q_hash_sample,
    "q_train_test_split": q_train_test_split,
    "q_stratified_sample": q_stratified_sample,
}

SAMPLING_ORACLE = {
    "q_hash_sample": _Q_HASH_SAMPLE_SQL,
    "q_train_test_split": _Q_SPLIT_SQL,
    "q_stratified_sample": _Q_STRATIFIED_SQL,
}
