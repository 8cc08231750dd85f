import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from pydala_spark.operators.skew import salted_agg, salted_join

TS = dt.datetime


def test_salted_agg_matches_plain(spark):
    # heavily skewed: one key holds 90% of rows
    df = spark.createDataFrame(
        [Row(k="hot", v=float(i)) for i in range(900)]
        + [Row(k=f"cold{i}", v=float(i)) for i in range(100)]
    )
    out = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in salted_agg(
            df, ["k"],
            {"n": ("count", "*"), "total": ("sum", "v"), "mx": ("max", "v")},
            salt_buckets=8, seed=7,
        ).collect()
    }
    plain = {
        r["k"]: (r["n"], r["total"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    assert out == plain
    assert out["hot"][0] == 900


def test_salted_agg_rejects_nonmergeable(spark):
    df = spark.createDataFrame([Row(k="a", v=1.0)])
    with pytest.raises(ValueError, match="mergeable"):
        salted_agg(df, ["k"], {"a": ("avg", "v")})


def test_salted_agg_count_column_skips_nulls(spark):
    df = spark.createDataFrame(
        [Row(k=1, v=1.0), Row(k=1, v=None), Row(k=1, v=3.0)]
    )
    got = salted_agg(
        df, ["k"], {"n_rows": ("count", "*"), "n_v": ("count", "v")},
        salt_buckets=4, seed=1,
    ).first()
    # count(v) must skip nulls exactly like the unsalted aggregation
    assert got["n_rows"] == 3 and got["n_v"] == 2


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [Row(k=1, lv=i) for i in range(500)] + [Row(k=2, lv=-1)]
    )
    right = spark.createDataFrame([Row(k=1, rv="x"), Row(k=2, rv="y")])
    salted = salted_join(left, right, ["k"], salt_buckets=4, seed=3)
    assert salted.count() == left.count()
    plain = left.join(right, "k").count()
    assert salted.count() == plain
    assert set(salted.columns) == {"k", "lv", "rv"}


def test_stateful_running_totals(spark, tmp_path):
    from pydala_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "in")
    schema = "user_id long, value double"
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], schema
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out_dir = str(tmp_path / "out")

    def run_once(epoch_tag: str) -> None:
        def sink(batch_df, epoch_id: int) -> None:
            batch_df.withColumn("tag", F.lit(epoch_tag)).write.mode(
                "append"
            ).parquet(out_dir)

        q = (
            running_user_totals(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once("b1")
    first = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out_dir).where("tag = 'b1'").collect()
    }
    assert first == {1: (2, 15.0), 2: (1, 1.0)}

    # second run resumes state from the checkpoint and accumulates
    spark.createDataFrame([(1, 1.0), (3, 7.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once("b2")
    second = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out_dir).where("tag = 'b2'").collect()
    }
    assert second == {1: (3, 16.0), 3: (1, 7.0)}  # user 1 state carried over


def test_dedup_clusters_chain(spark):
    from pydala_spark.operators.dedup import dedup_clusters

    # chain 1-2-3-4, pair (10,11), singleton edges absent
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    out = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_session_windows_streaming(spark, tmp_path):
    import datetime as dt

    from pydala_spark.streaming import session_windows

    TS = dt.datetime
    src = str(tmp_path / "sess_in")
    df = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10, 0)), (1, TS(2024, 1, 1, 10, 10)),
         (1, TS(2024, 1, 1, 12, 0)), (2, TS(2024, 1, 1, 9, 0))],
        "user_id long, ts timestamp",
    )
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        session_windows(stream, gap="30 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT user_id, n_events FROM sess_out ORDER BY user_id, session_start"
    ).collect()
    # user 1: one 2-event session + one 1-event session; user 2: one session
    assert [(r["user_id"], r["n_events"]) for r in rows] == [(1, 2), (1, 1), (2, 1)]


def test_dedup_clusters_deep_chain_pointer_jumping(spark):
    # a duplicate chain deeper than max_iterations converges anyway:
    # pointer jumping (label-of-label) makes rounds O(log diameter), so
    # 10 iterations cover chains ~2^10 deep — diameter 60 must not raise
    from pydala_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], ["id_a", "id_b"]
    )
    out = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert set(out) == set(range(61))
    assert set(out.values()) == {0}  # one cluster labeled by its minimum


def test_skew_report_flags_hot_key(spark):
    from pydala_spark.operators.skew import skew_report

    rows = [(1, "hot") for _ in range(900)] + [(i, f"k{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "v int, k string")
    rep = skew_report(df, "k", top=3).collect()
    assert rep[0]["k"] == "hot" and rep[0]["n_rows"] == 900
    assert rep[0]["row_share"] == 900 / 1000
    # 101 distinct keys, uniform share would be ~9.9 rows -> ~91x
    assert 85 < rep[0]["x_uniform"] < 95
    assert rep[1]["n_rows"] == 1  # everything else is uniform


def test_stream_interval_join(spark, tmp_path):
    # r4: stream-stream interval join — clicks match purchases by the
    # same user within [click, click + 10 min); watermarks bound state
    import datetime as dt

    from pydala_spark.streaming import stream_interval_join

    TS = dt.datetime
    clicks = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 10, 0), "c1"),
            (2, TS(2024, 1, 1, 10, 0), "c2"),
            (1, TS(2024, 1, 1, 12, 0), "c3"),
        ],
        "user_id long, ts timestamp, click string",
    )
    purchases = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 10, 5), 9.99),   # matches c1
            (2, TS(2024, 1, 1, 11, 0), 5.00),   # outside c2's window
            (1, TS(2024, 1, 1, 12, 1), 20.00),  # matches c3
        ],
        "user_id long, ts timestamp, amount double",
    )
    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks.write.parquet(csrc)
    purchases.write.parquet(psrc)
    cs = spark.readStream.schema(clicks.schema).parquet(csrc)
    ps = spark.readStream.schema(purchases.schema).parquet(psrc)
    joined = stream_interval_join(
        cs, ps, key="user_id", lower="0 seconds", upper="10 minutes",
        watermark="1 hour",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["click"], r["right_amount"])
        for r in spark.sql("SELECT * FROM ij_out").collect()
    }
    assert rows == {("c1", 9.99), ("c3", 20.00)}


def test_streaming_semantic_dedup_matches_batch(spark, tmp_path):
    # round 5 stretch: under a pinned codebook, in-id-order arrival and
    # mutually-similar near-dup groups, the streaming survivor set must
    # equal batch semantic_dedup's kept set — including state carried
    # across micro-batches (maxFilesPerTrigger=1 over sorted files)
    from pydala_spark.operators.similarity import semantic_dedup
    from pydala_spark.streaming.stateful import streaming_semantic_dedup

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    # cell 0: {0,1,2} a mutually-similar group + 3 dissimilar;
    # cell 1: {10,11} similar pair. Batch keeps 0, 3, 10.
    rows = [
        (0, [10.0, 0.1, 0.0]),
        (1, [10.0, 0.2, 0.0]),
        (2, [10.1, 0.1, 0.0]),
        (3, [10.0, 0.0, 9.9]),   # cell 0, similarity < threshold
        (10, [0.1, 8.0, 0.0]),
        (11, [0.1, 8.1, 0.0]),
    ]
    schema = "vec_id long, embedding array<double>"
    df = spark.createDataFrame(rows, schema)
    batch_kept = {
        r["id"] for r in semantic_dedup(
            df, cents, threshold=0.9).collect() if r["kept"]
    }
    assert batch_kept == {0, 3, 10}

    src = str(tmp_path / "sem_in")
    # two sorted files -> two micro-batches; ids 0-3 land before 10-11
    spark.createDataFrame(rows[:3], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows[3:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out_dir = str(tmp_path / "sem_out")
    q = (
        streaming_semantic_dedup(stream, cents, threshold=0.9)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "sem_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {r["id"] for r in spark.read.parquet(out_dir).collect()}
    assert streamed == batch_kept
    # state survives across runs: a near-dup of survivor 0 arriving in a
    # LATER run is dropped against the checkpointed representatives
    spark.createDataFrame(
        [(20, [10.05, 0.15, 0.0]), (21, [0.0, 0.1, 12.0])], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = (
        streaming_semantic_dedup(stream, cents, threshold=0.9)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "sem_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    streamed2 = {r["id"] for r in spark.read.parquet(out_dir).collect()}
    assert streamed2 == batch_kept | {21}  # 20 dropped vs survivor 0's state


def test_streaming_semantic_dedup_string_ids(spark, tmp_path):
    # r5 review: the id keeps its own type — string doc ids must work
    # (a hard long cast NULLed them and crashed the state update)
    from pydala_spark.streaming.stateful import streaming_semantic_dedup

    cents = [[1.0, 0.0]]
    rows = [("doc-a", [10.0, 0.1]), ("doc-b", [10.0, 0.2]),
            ("doc-c", [10.0, 9.9])]
    schema = "vec_id string, embedding array<double>"
    src = str(tmp_path / "sid_in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out_dir = str(tmp_path / "sid_out")
    q = (
        streaming_semantic_dedup(stream, cents, threshold=0.9)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "sid_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["id"] for r in spark.read.parquet(out_dir).collect()}
    assert kept == {"doc-a", "doc-c"}  # doc-b near-dups doc-a


def test_streaming_semantic_dedup_state_cap_passthrough(spark, tmp_path):
    # max_state_per_cell: when a cell's representative list is full, new
    # non-duplicate docs still PASS THROUGH (never silently dropped) but
    # stop being added as representatives — a later dup of an un-added
    # doc is the documented recall loss, a dup of a stored rep still drops
    from pydala_spark.streaming.stateful import streaming_semantic_dedup

    cents = [[1.0, 0.0, 0.0]]
    rows = [
        (1, [10.0, 0.0, 0.1]),   # rep (cap 1)
        (2, [10.0, 9.9, 0.0]),   # dissimilar -> kept, NOT stored (cap)
        (3, [10.0, 9.89, 0.01]), # dup of 2 -> kept anyway (recall loss)
        (4, [10.0, 0.01, 0.1]),  # dup of stored rep 1 -> dropped
    ]
    schema = "vec_id long, embedding array<double>"
    src = str(tmp_path / "cap_in")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out_dir = str(tmp_path / "cap_out")
    q = (
        streaming_semantic_dedup(
            stream, cents, threshold=0.9, max_state_per_cell=1
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cap_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["id"] for r in spark.read.parquet(out_dir).collect()}
    assert kept == {1, 2, 3}

def test_streaming_semantic_dedup_out_of_order_buffered(spark, tmp_path):
    # round 6: with event_time_col + watermark_delay, shuffled arrival
    # order within the watermark still dedups to the SMALLEST id — the
    # buffered stream matches batch semantic_dedup where the immediate
    # mode would keep the first arrival (id 2 here)
    import datetime as dt

    from pydala_spark.operators.similarity import semantic_dedup
    from pydala_spark.streaming.stateful import streaming_semantic_dedup

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    # near-dup group {0,1,2} + dissimilar 3, all cell 0; batch keeps 0,3
    group = [
        (0, [10.0, 0.1, 0.0], ts(3)),
        (1, [10.0, 0.2, 0.0], ts(1)),
        (2, [10.1, 0.1, 0.0], ts(2)),
        (3, [10.0, 0.0, 9.9], ts(4)),
    ]
    batch_kept = {
        r["id"]
        for r in semantic_dedup(
            spark.createDataFrame(
                [(i, v) for i, v, _ in group],
                "vec_id long, embedding array<double>",
            ),
            cents, threshold=0.9,
        ).collect()
        if r["kept"]
    }
    assert batch_kept == {0, 3}

    schema = "vec_id long, embedding array<double>, evt timestamp"
    src = str(tmp_path / "ooo_in")
    # arrival order SHUFFLED across micro-batches: the near-dup group's
    # HIGHEST ids arrive first, smallest id last; two far-future
    # sentinels (cell 0, dissimilar) advance the watermark past the
    # group so the buffered cohort flushes
    batches = [
        [group[2], group[1]],                      # ids 2, 1 first
        [group[0], group[3]],                      # id 0 arrives LAST
        [(90, [10.0, 0.0, -9.9], ts(100))],        # watermark push
        [(91, [10.0, 0.5, -9.8], ts(101))],        # flush trigger
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out_dir = str(tmp_path / "ooo_out")
    q = (
        streaming_semantic_dedup(
            stream, cents, threshold=0.9,
            event_time_col="evt", watermark_delay="10 seconds",
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ooo_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {r["id"] for r in spark.read.parquet(out_dir).collect()}
    # the planted cohort dedups exactly like batch: smallest id 0 kept,
    # first-arrivals 1/2 dropped (immediate mode would keep 2)
    assert streamed & {0, 1, 2, 3} == batch_kept
    # sentinel 91 is still inside the watermark -> pending, not emitted
    assert 91 not in streamed


def test_streaming_semantic_dedup_buffered_drops_null_event_time(
    spark, tmp_path
):
    # round-7 advice: a NULL event timestamp (NaT) used to convert via
    # astype('int64') to int64-min — always watermark-eligible, flushing
    # ahead of its cohort and bypassing the smallest-id ordering. Such
    # rows are now dropped in the keyed projection, matching how Spark's
    # own watermark operators treat null event times.
    import datetime as dt

    from pydala_spark.streaming.stateful import streaming_semantic_dedup

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    schema = "vec_id long, embedding array<double>, evt timestamp"
    src = str(tmp_path / "nullts_in")
    batches = [
        [(50, [10.0, 0.3, 0.0], None),             # NULL evt -> dropped
         (1, [10.0, 0.2, 0.0], ts(1))],
        [(90, [10.0, 0.0, -9.9], ts(100))],        # watermark push
        [(91, [10.0, 0.5, -9.8], ts(101))],        # flush trigger
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out_dir = str(tmp_path / "nullts_out")
    q = (
        streaming_semantic_dedup(
            stream, cents, threshold=0.9,
            event_time_col="evt", watermark_delay="10 seconds",
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "nullts_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {r["id"] for r in spark.read.parquet(out_dir).collect()}
    assert 50 not in streamed        # null-ts row never emitted
    assert 1 in streamed             # its timestamped cohort flushes


def test_streaming_semantic_dedup_buffered_knob_validation(spark):
    from pydala_spark.streaming.stateful import streaming_semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="come together"):
        streaming_semantic_dedup(df, [[1.0, 0.0]], event_time_col="evt")

def test_streaming_neardup_lsh(spark, tmp_path):
    # round 6: MinHash-LSH near-dup dedup on ingest — cross-batch
    # duplicates drop against the persisted bucket store (keep first
    # arrival), intra-batch keeps the smallest id, and the store
    # survives a query restart
    import hashlib

    from pydala_spark.streaming import streaming_neardup

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu")

    def distinct_doc(i):
        return " ".join(
            hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:6]
            for j in range(25)
        )

    schema = "doc_id long, text string"
    src = str(tmp_path / "nd_in")
    batches = [
        # intra-batch near-dup pair: 5 (smaller id) survives; 50 has
        # NULL text -> no shingles, no signature -> must PASS THROUGH
        [(5, base + " first"), (6, base + " second"), (50, None)],
        # 1 is a near-dup of 5 arriving LATER: dropped even though its
        # id is smaller (keep-first-arrival); 7 is distinct: kept
        [(1, base + " third"), (7, distinct_doc(7))],
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out = str(tmp_path / "nd_out")
    state = str(tmp_path / "nd_state")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = streaming_neardup(
        stream, out, state,
        checkpoint_dir=str(tmp_path / "nd_ckpt"),
    )
    q.awaitTermination(120)
    ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert ids == {5, 7, 50}
    # restart with more data: the on-disk store keeps deduping
    spark.createDataFrame(
        [(8, base + " fourth"), (9, distinct_doc(9))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = streaming_neardup(
        stream, out, state,
        checkpoint_dir=str(tmp_path / "nd_ckpt"),
    )
    q2.awaitTermination(120)
    ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert ids == {5, 7, 9, 50}
    # the store holds n_bands rows per surviving doc
    store = spark.read.parquet(state)
    assert store.count() == 3 * 4
    assert set(store.columns) == {"doc_id", "band_id", "band_hash"}

def test_streaming_neardup_replay_idempotence(spark, tmp_path):
    # round-6 review: foreachBatch is at-least-once — replayed epochs
    # (fresh checkpoint over the same files) must append NOTHING new,
    # and an out-committed/bands-missing crash (simulated by deleting
    # the store) must heal: bands rewritten, out unchanged
    import hashlib
    import shutil

    from pydala_spark.streaming import streaming_neardup

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu")

    def distinct_doc(i):
        return " ".join(
            hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:6]
            for j in range(25)
        )

    schema = "doc_id long, text string"
    src = str(tmp_path / "ri_in")
    for b in [[(1, base + " one"), (2, base + " two")],
              [(3, distinct_doc(3))]]:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    out, state = str(tmp_path / "ri_out"), str(tmp_path / "ri_state")

    def run(ckpt):
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = streaming_neardup(stream, out, state, checkpoint_dir=ckpt)
        q.awaitTermination(120)

    run(str(tmp_path / "ck1"))
    rows1 = spark.read.parquet(out).collect()
    assert {r["doc_id"] for r in rows1} == {1, 3}
    n_state = spark.read.parquet(state).count()
    assert n_state == 2 * 4

    # full replay (fresh checkpoint, same files): nothing duplicates
    run(str(tmp_path / "ck2"))
    rows2 = spark.read.parquet(out).collect()
    assert len(rows2) == len(rows1)
    assert spark.read.parquet(state).count() == n_state

    # crash window: out committed, bands lost -> replay heals the store
    shutil.rmtree(state)
    run(str(tmp_path / "ck3"))
    rows3 = spark.read.parquet(out).collect()
    assert len(rows3) == len(rows1)  # no duplicate out rows
    healed = spark.read.parquet(state)
    assert healed.count() == n_state  # bands fully rewritten
    assert {r["doc_id"] for r in healed.select("doc_id").collect()} == {1, 3}


def test_streaming_neardup_store_compaction_bounds_files(spark, tmp_path):
    # round 8: compact_store_every folds store maintenance into the
    # stream — file count stays bounded across many micro-batches while
    # dedup semantics and restart/replay idempotence hold
    import glob
    import hashlib

    from pydala_spark.streaming import streaming_neardup

    def distinct_doc(i):
        return " ".join(
            hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:6]
            for j in range(25)
        )

    schema = "doc_id long, text string"
    src = str(tmp_path / "ndc_in")
    n_batches = 8
    for i in range(n_batches):
        spark.createDataFrame(
            [(i * 10, distinct_doc(i)),          # distinct: kept
             (i * 10 + 1, distinct_doc(0))],     # near-dup of batch 0
            schema,
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = streaming_neardup(
            stream, out, state,
            checkpoint_dir=str(tmp_path / "ndc_ckpt"),
            compact_store_every=2,
        )
        q.awaitTermination(180)

    out = str(tmp_path / "ndc_out")
    state = str(tmp_path / "ndc_state")
    run()

    ids = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # batch 0 keeps the smaller member of its intra-batch pair; later
    # batches keep only their distinct doc (the near-dup collides with
    # the store)
    assert ids == [0] + [i * 10 for i in range(1, n_batches)]
    store_files = glob.glob(state + "/*.parquet")
    # without compaction: one file set per epoch (>= n_batches files);
    # the every-2-epochs rewrite keeps the tail bounded
    assert 0 < len(store_files) <= 3
    # the compacted store still holds every survivor's bands
    store = spark.read.parquet(state)
    assert set(
        r["doc_id"] for r in store.select("doc_id").distinct().collect()
    ) == set(ids)

    # restart on the same checkpoint + one replayed-looking batch: no
    # duplicate appends, store still deduping
    spark.createDataFrame(
        [(900, distinct_doc(0)), (901, distinct_doc(99))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    ids2 = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert ids2 == ids + [901]
