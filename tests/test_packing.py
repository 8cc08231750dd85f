"""Shard packing: the distributed prefix sum must be bit-identical to
the naive single-task global window, under skew and tiny inputs."""

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from pydala_spark.operators.packing import pack_shards, shard_summary


def _naive(df, token_col, order_col, target):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn(
        "cum_before", F.coalesce(F.sum(token_col).over(w), F.lit(0))
    ).withColumn("shard_id", F.floor(F.col("cum_before") / target).cast("long"))


def _rows(df):
    return sorted(
        (r["doc"], r["cum_before"], r["shard_id"])
        for r in df.select("doc", "cum_before", "shard_id").collect()
    )


def test_pack_matches_global_window(spark):
    # deterministic pseudo-random token counts, non-contiguous ids
    df = (
        spark.range(0, 500)
        .select((F.col("id") * 7 + 3).alias("doc"))
        .withColumn("tok", F.pmod(F.col("doc") * 2654435761, F.lit(97)) + 1)
    )
    packed = pack_shards(df, "tok", "doc", target_tokens=128, n_buckets=8)
    assert _rows(packed) == _rows(_naive(df, "tok", "doc", 128))
    # every doc appears exactly once
    assert packed.count() == 500


def test_pack_skewed_keys_and_few_rows(spark):
    # all ids in a narrow band -> most land in one bucket; correctness holds
    rows = [Row(doc=i, tok=10) for i in [1, 2, 3, 1000000]]
    df = spark.createDataFrame(rows)
    packed = pack_shards(df, "tok", "doc", target_tokens=25, n_buckets=16)
    assert _rows(packed) == _rows(_naive(df, "tok", "doc", 25))
    # single row
    one = spark.createDataFrame([Row(doc=5, tok=7)])
    got = pack_shards(one, "tok", "doc", target_tokens=3).first()
    assert got["cum_before"] == 0 and got["shard_id"] == 0


def test_shard_summary_totals(spark):
    df = spark.createDataFrame([Row(doc=i, tok=100) for i in range(1, 21)])
    packed = pack_shards(df, "tok", "doc", target_tokens=500, n_buckets=4)
    summary = shard_summary(packed, "doc").orderBy("shard_id").collect()
    # 20 docs x 100 tok / 500 budget -> 4 shards of 5 docs each
    assert [r["n_docs"] for r in summary] == [5, 5, 5, 5]
    assert [r["shard_tokens"] for r in summary] == [500] * 4
    assert summary[0]["first_doc"] == 1 and summary[-1]["last_doc"] == 20
    # shards partition the docs contiguously in id order
    for a, b in zip(summary, summary[1:]):
        assert a["last_doc"] < b["first_doc"]


def test_pack_validates_inputs(spark):
    df = spark.createDataFrame([Row(doc=1, tok=1)])
    with pytest.raises(ValueError, match="positive"):
        pack_shards(df, "tok", "doc", target_tokens=0)
    empty = df.where(F.lit(False))
    with pytest.raises(ValueError, match="non-NULL"):
        pack_shards(empty, "tok", "doc", target_tokens=10)


def test_pack_plan_has_no_global_data_window(spark):
    """The full-data window must be partitioned (parallel); only the
    n_buckets-row offsets frame may carry an unpartitioned window."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc"), (F.pmod(F.col("id"), F.lit(50)) + 1).alias("tok")
    )
    packed = pack_shards(df, "tok", "doc", target_tokens=64, n_buckets=8)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    win_lines = [l for l in plan.splitlines() if "Window [" in l]
    assert len(win_lines) == 2, plan
    data_win = next(l for l in win_lines if "__local" in l)
    # partition spec is printed after the function list: bucket-partitioned
    assert "], [__bucket" in data_win, data_win
    # the only single-partition exchange feeds the n_buckets-row offsets
    # frame (below the broadcast), never the full data
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pack_sequences_concatenates_in_order(spark):
    from pydala_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, f"doc{i}", 4) for i in range(10)],
        "doc_id long, text string, tok int",
    )
    seqs = pack_sequences(
        df, "text", "doc_id", target_tokens=12, token_col="tok", sep=" | "
    )
    rows = {r["shard_id"]: r for r in seqs.collect()}
    # 4 tokens/doc, budget 12 -> 3 docs per shard, ordered by doc_id
    assert rows[0]["seq_text"] == "doc0 | doc1 | doc2"
    assert rows[1]["seq_text"] == "doc3 | doc4 | doc5"
    assert rows[0]["n_docs"] == 3 and rows[0]["seq_tokens"] == 12
    assert rows[3]["seq_text"] == "doc9"  # tail shard
    # deterministic under repartition (array_sort, not arrival order)
    seqs2 = pack_sequences(
        df.repartition(7), "text", "doc_id", 12, token_col="tok", sep=" | "
    )
    assert {(r["shard_id"], r["seq_text"]) for r in seqs2.collect()} == {
        (k, v["seq_text"]) for k, v in rows.items()
    }

def test_pack_sequences_doc_offsets(spark):
    # round 6: per-doc token-start boundaries within each packed
    # sequence — the trainer's loss-masking/attention-reset list
    from pydala_spark.operators.packing import pack_sequences

    rows = [(1, "a b c", 3), (2, "d e", 2), (3, "f g h i", 4),
            (4, "j", 1)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "tok"])
    out = pack_sequences(
        df, "text", "doc_id", target_tokens=5, token_col="tok",
        with_offsets=True,
    ).orderBy("shard_id").collect()
    # shard 0: docs 1 (cum 0) + 2 (cum 3); shard 1: doc 3 (cum 5);
    # shard 2: doc 4 (cum 9 -> shard 9//5=1? 9/5=1.8 -> shard 1)
    by_shard = {r["shard_id"]: r for r in out}
    assert list(by_shard[0]["doc_offsets"]) == [0, 3]
    # doc 3 starts shard 1 at offset 0; doc 4 (cum_before 9) also
    # lands in shard 1 and starts at token 4 within it
    assert list(by_shard[1]["doc_offsets"]) == [0, 4]
    # offsets align with n_docs and are strictly increasing
    for r in out:
        offs = list(r["doc_offsets"])
        assert len(offs) == r["n_docs"]
        assert offs == sorted(set(offs)) and offs[0] == 0
    # default path unchanged: no doc_offsets column
    plain = pack_sequences(
        df, "text", "doc_id", target_tokens=5, token_col="tok"
    )
    assert "doc_offsets" not in plain.columns
