"""Training-shard packing: assign rows to fixed-token-budget shards.

A training-data pipeline's last step before serialization is packing
documents into shards of ~N tokens each (sequence-packing prep, shard
manifests for data loaders). The math is a prefix sum over a total
order: shard(doc) = floor(tokens_before_doc / target).

The naive Spark spelling — ``sum(tokens).over(Window.orderBy(key))`` —
is the classic scale trap: an ORDER BY window with no PARTITION BY pulls
the entire dataset into ONE task. This module computes the same exact
prefix sum distributed:

1. bucket rows by an order-monotonic range function of the (unique)
   order key — buckets parallelize, and monotonicity means bucket-major
   order equals global order;
2. local prefix sums per bucket (one shuffle, all cores busy);
3. per-bucket totals (tiny: ``n_buckets`` rows) carry the only global
   window, then broadcast back as offsets;
4. global prefix = bucket offset + local prefix.

Cost at scale: three passes over the input — a columnar min/max scan
(parquet footer stats make it cheap), the per-bucket totals
aggregation, and the windowed local pass — but each reads only the
order and token columns (column pruning), the data shuffles exactly
once (keyed by bucket), and the offsets come back as a broadcast.
The single-task global window it replaces would move and sort the
whole dataset through ONE core. The result is bit-identical to the
naive spelling because the order key is unique and token counts are
integers.

The reference engine has no shard packer; this extends the surface the
way SURVEY.md §2.11 ("LLM-pipeline additions") prescribes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    df: DataFrame,
    token_col: str | Column,
    order_col: str,
    target_tokens: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """Add ``n_tokens`` (long cast of ``token_col``), ``cum_before``
    (exact global prefix sum of tokens in ``order_col`` order, excluding
    the current row) and ``shard_id`` (``floor(cum_before /
    target_tokens)``) columns.

    ``order_col`` must be numeric and unique (doc ids); ties would make
    the prefix sum order-dependent. Documents straddling a boundary
    belong to the shard their first token lands in — the standard
    fixed-budget contract (a loader reading shard k starts at offset
    ``k * target_tokens``).
    """
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    order_type = dict(df.dtypes).get(order_col, "")
    if order_type not in ("tinyint", "smallint", "int", "bigint", "float",
                          "double") and not order_type.startswith("decimal"):
        raise ValueError(
            f"pack_shards: order_col {order_col!r} must be numeric "
            f"(got {order_type or 'missing column'}); hash string ids to a "
            "numeric key first (e.g. operators.sampling.hash_bucket)"
        )
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    if n_buckets is None:
        n_buckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    n_buckets = max(n_buckets, 1)

    lo, hi = df.agg(
        F.min(order_col).cast("double"), F.max(order_col).cast("double")
    ).first()
    if lo is None:
        raise ValueError(f"pack_shards: {order_col!r} has no non-NULL values")
    span = (hi - lo) or 1.0
    # order-monotonic range bucketing: floor of an increasing affine map,
    # so bucket-major order == global order. Skewed key distributions
    # unbalance buckets but never break correctness (SCALE.md).
    bucket = F.least(
        F.floor((F.col(order_col).cast("double") - F.lit(lo)) / F.lit(span) * n_buckets),
        F.lit(n_buckets - 1),
    ).cast("int")

    with_b = df.withColumn("__bucket", bucket).withColumn(
        "n_tokens", tok.cast("long")
    )
    local = with_b.withColumn(
        "__local",
        F.sum("n_tokens").over(
            Window.partitionBy("__bucket")
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    offsets = (
        with_b.groupBy("__bucket")
        .agg(F.sum("n_tokens").alias("__btotal"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__btotal").over(
                    Window.orderBy("__bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("__btotal")
    )
    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn("cum_before", F.col("__offset") + F.col("__local") - F.col("n_tokens"))
        .withColumn(
            "shard_id", F.floor(F.col("cum_before") / target_tokens).cast("long")
        )
        .drop("__bucket", "__local", "__offset")
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    order_col: str,
    target_tokens: int,
    token_col: str | Column | None = None,
    sep: str = "\n\n",
    n_buckets: int | None = None,
    prepacked: bool = False,
    with_offsets: bool = False,
) -> DataFrame:
    """Materialize one packed TRAINING SEQUENCE per shard: the shard's
    documents concatenated in ``order_col`` order with ``sep`` between
    them — the standard sequence-packing step feeding a tokenizer/data
    loader. Returns (shard_id, n_docs, seq_tokens, first_key, last_key,
    seq_text) — the key range comes free from the sorted array ends, so
    one call yields both the sequences and the manifest columns
    :func:`shard_summary` computes (no second pass over the packing).

    ``prepacked=True`` takes :func:`pack_shards` output directly (reuse
    one packing for both the manifest and the sequences); otherwise
    ``token_col`` is required and the packing runs here.

    Scale shape: one groupBy on shard_id; each aggregation buffer holds
    exactly one shard's text, which is BOUNDED by construction
    (~``target_tokens`` tokens plus one straddling document) — packing
    is the rare case where collect_list is safe at any corpus size.
    In-shard ordering is deterministic via array_sort over (key, text)
    structs, not collect_list arrival order.

    ``with_offsets=True`` (round 6) additionally emits ``doc_offsets``
    — each document's cumulative TOKEN start within its shard (in
    concatenated-token space, separators excluded) — the
    loss-masking/attention-reset boundary list a trainer needs to stop
    attention bleeding across packed documents. A JVM ``aggregate``
    fold over the already-sorted doc array; no extra pass.
    """
    if prepacked:
        packed = df
    else:
        if token_col is None:
            raise ValueError("token_col is required unless prepacked=True")
        packed = pack_shards(df, token_col, order_col, target_tokens, n_buckets)
    doc = F.struct(
        F.col(order_col).alias("k"),
        F.col(text_col).alias("t"),
        F.col("n_tokens").alias("n"),
    )
    extra = []
    if with_offsets:
        extra.append(
            F.aggregate(
                F.col("__docs"),
                F.struct(
                    F.lit(0).cast("long").alias("cur"),
                    F.array().cast("array<bigint>").alias("arr"),
                ),
                lambda acc, d: F.struct(
                    (acc["cur"] + d["n"]).alias("cur"),
                    F.concat(acc["arr"], F.array(acc["cur"])).alias("arr"),
                ),
                lambda acc: acc["arr"],
            ).alias("doc_offsets")
        )
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.array_sort(F.collect_list(doc)).alias("__docs"),
        )
        .select(
            "shard_id",
            "n_docs",
            "seq_tokens",
            F.element_at("__docs", 1)["k"].alias("first_key"),
            F.element_at("__docs", -1)["k"].alias("last_key"),
            F.array_join(
                F.transform("__docs", lambda d: d["t"]), sep
            ).alias("seq_text"),
            *extra,
        )
    )


def shard_summary(packed: DataFrame, order_col: str) -> DataFrame:
    """Per-shard manifest over :func:`pack_shards` output: document
    count, token total, order-key range. This is the table a data-loader
    consumes; one small groupBy on ``shard_id``."""
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.min(order_col).cast("long").alias("first_doc"),
        F.max(order_col).cast("long").alias("last_doc"),
    )
