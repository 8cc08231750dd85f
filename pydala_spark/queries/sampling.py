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
    shuffle_key,
    stratified_sample,
    train_test_split,
    weighted_domain_sample,
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


#: mixture rates for the weighted-domain family of q_hash_sample
_MIX_RATES = {"en": 0.05, "de": 0.5}
_MIX_DEFAULT = 0.15


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-selection families as a tagged union (keeps the
    registry at 50 entries): 'hash' = 10% Bernoulli sample; 'mix' =
    per-domain weighted mixture resampling (round 3); 'shuffle' = the
    seeded md5 permutation key of deterministic_shuffle for a bounded
    doc subset (the driver compare sorts rows, so the KEY is what an
    oracle can verify — it fully determines the order). All three are
    zero-shuffle map-side projections/filters."""
    docs = load_table(spark, sf_dir, "documents")
    null_s = F.lit(None).cast("string")
    hash_part = hash_sample(docs, "doc_id", 0.10).select(
        F.lit("hash").alias("src"), "doc_id", "lang",
        hash_bucket("doc_id").alias("bucket"), null_s.alias("skey"),
    )
    mix_part = weighted_domain_sample(
        docs, "doc_id", "lang", _MIX_RATES, default_rate=_MIX_DEFAULT
    ).select(
        F.lit("mix").alias("src"), "doc_id", "lang",
        hash_bucket("doc_id").alias("bucket"), null_s.alias("skey"),
    )
    shuffle_part = docs.where(F.col("doc_id") < 100).select(
        F.lit("shuffle").alias("src"), "doc_id", "lang",
        F.lit(None).cast("long").alias("bucket"),
        shuffle_key("doc_id", seed=7).alias("skey"),
    )
    return hash_part.unionByName(mix_part).unionByName(shuffle_part)


_MIX_CASE_SQL = "CASE lang " + " ".join(
    f"WHEN '{d}' THEN {sample_threshold(r)}" for d, r in _MIX_RATES.items()
) + f" ELSE {sample_threshold(_MIX_DEFAULT)} END"

_Q_HASH_SAMPLE_SQL = f"""
SELECT 'hash' AS src, doc_id, lang, {_BUCKET_SQL} AS bucket,
       CAST(NULL AS VARCHAR) AS skey
FROM documents
WHERE {_BUCKET_SQL} < {sample_threshold(0.10)}
UNION ALL
SELECT 'mix' AS src, doc_id, lang, {_BUCKET_SQL} AS bucket,
       CAST(NULL AS VARCHAR) AS skey
FROM documents
WHERE {_BUCKET_SQL} < {_MIX_CASE_SQL}
UNION ALL
SELECT 'shuffle' AS src, doc_id, lang, CAST(NULL AS BIGINT) AS bucket,
       md5('7' || '|' || CAST(doc_id AS VARCHAR)) AS skey
FROM documents
WHERE doc_id < 100
"""


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 70/20/10 train/test/val split, two families
    tag-unioned: ``counts`` — docs per (lang, split); ``leak`` (round
    6) — the train/test LEAKAGE audit (dedup.split_leakage_report:
    word-3-gram Jaccard >= 0.2 pairs whose hash-assigned splits differ
    — near-dups the split scattered across the eval boundary)."""
    from pydala_spark.operators.dedup import split_leakage_report
    from pydala_spark.queries.merged import _tagged_union

    docs = load_table(spark, sf_dir, "documents")
    split = train_test_split(docs, "doc_id", test_fraction=0.2, val_fraction=0.1)
    counts = split.groupBy("lang", "split").agg(F.count("*").alias("n"))
    leak = split_leakage_report(
        split, "doc_id", "split", "text", shingle_size=3, threshold=0.2
    )
    return _tagged_union([("counts", counts), ("leak", leak)])


_TEST_HI = sample_threshold(0.2)
_VAL_HI = _TEST_HI + sample_threshold(0.1)

_SPLIT_CASE = f"""CASE WHEN {_BUCKET_SQL} < {_TEST_HI} THEN 'test'
       WHEN {_BUCKET_SQL} < {_VAL_HI} THEN 'val'
       ELSE 'train' END"""


def _split_sql() -> str:
    from pydala_spark.queries.ext import _SHINGLES_SQL

    return f"""
WITH sh AS ({_SHINGLES_SQL}),
ex AS (SELECT doc_id, LEN(shs) AS sh_size, UNNEST(shs) AS s FROM sh),
pairs AS (
  SELECT id_a, id_b, CAST(inter AS DOUBLE) / (size_a + size_b - inter)
           AS jaccard
  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.sh_size AS size_a, b.sh_size AS size_b, COUNT(*) AS inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4)
  WHERE CAST(inter AS DOUBLE) / (size_a + size_b - inter) >= 0.2
),
sp AS (SELECT doc_id, {_SPLIT_CASE} AS split FROM documents)
SELECT 'counts' AS family, lang, {_SPLIT_CASE} AS split,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
       CAST(NULL AS VARCHAR) AS split_a, CAST(NULL AS VARCHAR) AS split_b,
       CAST(NULL AS DOUBLE) AS jaccard
FROM documents GROUP BY 1, 2, 3
UNION ALL
SELECT 'leak', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), id_a, id_b, sa.split, sb.split, jaccard
FROM pairs
JOIN sp sa ON sa.doc_id = id_a
JOIN sp sb ON sb.doc_id = id_b
WHERE sa.split <> sb.split
"""


_Q_SPLIT_SQL = _split_sql()


#: token budgets for the round-6 ``mix`` family (recipe execution)
_TOKEN_BUDGETS = {"en": 2000, "de": 1000}
_TOKEN_DEFAULT = 500


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic selection, two families tag-unioned: ``strat`` —
    class-balanced sample (exactly 20 documents per language, picked by
    hash order); ``mix`` (round 6) — TOKEN-budgeted mixture execution
    (``token_budget_mixture``: per language, docs in md5 order until the
    recipe's token budget fills — the distributed per-domain prefix
    sum)."""
    from pydala_spark.operators.sampling import token_budget_mixture
    from pydala_spark.operators.textstats import token_count
    from pydala_spark.queries.merged import _tagged_union

    docs = load_table(spark, sf_dir, "documents")
    strat = stratified_sample(docs, "doc_id", ["lang"], 20).select(
        "doc_id", "lang"
    )
    mix = token_budget_mixture(
        docs.select("doc_id", "lang", token_count("text").alias("tok")),
        "doc_id", "lang", "tok",
        budgets=_TOKEN_BUDGETS, default_budget=_TOKEN_DEFAULT,
    ).select("doc_id", "lang", "n_tokens", "cum_before")
    return _tagged_union([("strat", strat), ("mix", mix)])


_Q_STRATIFIED_SQL = f"""
SELECT 'strat' AS family, doc_id, lang,
       CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS cum_before
FROM documents
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
UNION ALL
SELECT 'mix', doc_id, lang, n_tokens, cum_before FROM (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM (SELECT doc_id, lang,
               CAST(LEN(list_filter(string_split_regex(TRIM(text),
                 '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents))
WHERE cum_before < CASE lang
  {" ".join(f"WHEN '{d}' THEN {b}" for d, b in _TOKEN_BUDGETS.items())}
  ELSE {_TOKEN_DEFAULT} END
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
