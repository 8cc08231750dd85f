"""Round 8: contract tests for the round-7 span-fingerprint sidecar
(materialize_signatures kinds=("spans",)) and the sidecar content-
staleness marker (read_signatures verify_against=) — the tests the
round-7 snapshot commit shipped without (VERDICT r7 item 1)."""

import json
import posixpath

import pytest
from pyspark.sql import functions as F

from pydala_spark.dataset.maintain import (
    SIGNATURES_DIR,
    materialize_signatures,
    read_signatures,
)
from pydala_spark.operators.dedup import (
    duplicate_spans,
    remove_duplicate_spans,
    span_fingerprints,
)

_SHARED = ("it was the best of times it was the worst of times it was "
           "the age of wisdom it was the age of foolishness indeed")


def _span_docs(spark):
    texts = {
        1: f"unique opening about gardens and trees. {_SHARED} unique "
           "closing about rivers and stones in the valley below here",
        2: f"completely different preamble text goes here now. {_SHARED} "
           "and then a different ending altogether for this one too",
        3: "this document shares nothing with the others at all and "
           "talks at length about cooking pasta with garlic and olive "
           "oil on a slow flame until fragrant and golden",
    }
    return spark.createDataFrame(list(texts.items()), ["doc_id", "text"])


K, WINDOW, MIN_SPAN, MIN_DF = 20, 8, 50, 2


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_spans_sidecar_roundtrip_equals_inline(spark, tmp_path):
    # (a) sidecar round-trip == inline span_fingerprints, and
    # duplicate_spans(fingerprints=sidecar) row-equal to the inline path
    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    df.write.parquet(base + "/data")
    out = materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    assert out == {"spans": posixpath.join(base, SIGNATURES_DIR, "spans")}

    sidecar, params = read_signatures(
        spark, base, "spans", expect={"k": K, "window": WINDOW}
    )
    inline_fps = span_fingerprints(df, "doc_id", k=K, window=WINDOW)
    assert _rows(sidecar) == _rows(inline_fps)

    inline = duplicate_spans(
        df, "doc_id", k=K, window=WINDOW, min_span=MIN_SPAN, min_df=MIN_DF
    )
    pre = duplicate_spans(
        df, "doc_id", min_span=MIN_SPAN, min_df=MIN_DF,
        fingerprints=sidecar, params=params,
    )
    assert _rows(pre) == _rows(inline)
    assert pre.count() > 0  # the fixture genuinely has duplicated spans

    # the surgery half agrees too, end to end
    inline_cut = remove_duplicate_spans(
        df, "doc_id", k=K, window=WINDOW, min_span=MIN_SPAN, min_df=MIN_DF
    )
    pre_cut = remove_duplicate_spans(
        df, "doc_id", min_span=MIN_SPAN, min_df=MIN_DF,
        fingerprints=sidecar, params=params,
    )
    assert _rows(pre_cut.select("doc_id", "text")) == _rows(
        inline_cut.select("doc_id", "text")
    )


def test_spans_sidecar_plan_never_hashes_or_scans_text(spark, tmp_path):
    # (b) the precomputed-span plan reads ONLY the sidecar: no md5
    # hashing anywhere, no corpus data-file scan, no text column in any
    # ReadSchema (mirror of the winnowing zero-scan pin)
    from pydala_spark.plans import explain_str, read_schema_columns

    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    df.write.parquet(base + "/data")
    materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    sidecar, params = read_signatures(spark, base, "spans")
    spans = duplicate_spans(
        df, "doc_id", min_span=MIN_SPAN, min_df=MIN_DF,
        fingerprints=sidecar, params=params,
    )
    plan = explain_str(spans)
    assert "md5" not in plan.lower()  # zero hashing in the sweep
    assert "/data" not in plan  # corpus parquet never scanned
    assert "_signatures/spans" in plan  # the sidecar is the only scan
    for cols in read_schema_columns(spans):
        assert "text" not in cols


def test_duplicate_spans_params_guard(spark, tmp_path):
    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    sidecar, params = read_signatures(spark, base, "spans")
    # params without a fingerprints frame is a caller bug — fail loud
    with pytest.raises(ValueError, match="fingerprints"):
        duplicate_spans(df, "doc_id", params=params)
    # a non-spans sidecar's params must not drive span-boundary math
    with pytest.raises(ValueError, match="kind"):
        duplicate_spans(
            df, "doc_id", fingerprints=sidecar,
            params={"kind": "winnowing", "k": 8, "window": 4},
        )
    # with params=, the RECORDED k/window win over bogus caller values
    inline = duplicate_spans(
        df, "doc_id", k=K, window=WINDOW, min_span=MIN_SPAN, min_df=MIN_DF
    )
    pre = duplicate_spans(
        df, "doc_id", k=5, window=2,  # wrong on purpose — params override
        min_span=MIN_SPAN, min_df=MIN_DF,
        fingerprints=sidecar, params=params,
    )
    assert _rows(pre) == _rows(inline)


def test_verify_against_fresh_passes_and_mutation_raises(spark, tmp_path):
    # (c) staleness marker: fresh corpus verifies; a text mutation (the
    # silent zero-overlap failure mode) raises LOUD
    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    sidecar, params = read_signatures(spark, base, "spans",
                                      verify_against=df)
    assert params["content_rows"] == df.count()

    mutated = df.withColumn(
        "text",
        F.when(F.col("doc_id") == 1, F.concat(F.col("text"), F.lit(" x")))
        .otherwise(F.col("text")),
    )
    with pytest.raises(ValueError, match="STALE"):
        read_signatures(spark, base, "spans", verify_against=mutated)
    # row-count drift (a dropped doc) is also a mutation
    with pytest.raises(ValueError, match="STALE"):
        read_signatures(
            spark, base, "spans",
            verify_against=df.where(F.col("doc_id") != 3),
        )


def test_verify_against_append_folds_marker(spark, tmp_path):
    # appends fold the marker (rows add, xor xors): after an append the
    # UNION verifies and equals a from-scratch materialization's marker
    base = str(tmp_path / "ds")
    more_base = str(tmp_path / "full")
    df = _span_docs(spark)
    extra = spark.createDataFrame(
        [(4, f"a fourth document carrying the passage too. {_SHARED} "
             "plus trailing words of its own making here")],
        ["doc_id", "text"],
    )
    materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    materialize_signatures(
        spark, extra, base, kinds=("spans",), span_k=K,
        span_window=WINDOW, mode="append",
    )
    union = df.unionByName(extra)
    _, params = read_signatures(spark, base, "spans", verify_against=union)
    # against only the original slice the folded marker must NOT verify
    with pytest.raises(ValueError, match="STALE"):
        read_signatures(spark, base, "spans", verify_against=df)
    # folded marker == full re-materialization's marker
    materialize_signatures(
        spark, union, more_base, kinds=("spans",), span_k=K,
        span_window=WINDOW,
    )
    _, full = read_signatures(spark, more_base, "spans")
    assert (params["content_rows"], params["content_xor"]) == (
        full["content_rows"], full["content_xor"]
    )


def test_append_onto_premarker_sidecar_raises(spark, tmp_path):
    # r7 advice: a pre-round-7 sidecar (no content marker recorded) must
    # refuse appends instead of folding against an implicit zero marker
    # that would later misdiagnose a complete sidecar as stale
    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    materialize_signatures(spark, df, base, kinds=("spans",))
    params_path = (tmp_path / "ds" / SIGNATURES_DIR / "spans"
                   / "_params.json")
    recorded = json.loads(params_path.read_text())
    recorded.pop("content_rows")
    recorded.pop("content_xor")
    params_path.write_text(json.dumps(recorded))
    # the out-of-band rewrite invalidates Hadoop's local-FS checksum
    crc = params_path.parent / "._params.json.crc"
    if crc.exists():
        crc.unlink()
    with pytest.raises(ValueError, match="predates content markers"):
        materialize_signatures(spark, df, base, kinds=("spans",),
                               mode="append")
    # and the read-side guard gives the same diagnosis
    with pytest.raises(ValueError, match="predates content markers"):
        read_signatures(spark, base, "spans", verify_against=df)


def test_prep_documents_precomputed_spans_matches_inline(spark, tmp_path):
    # round 8: the flagship pipeline consumes the spans sidecar — same
    # output as the inline span_dedup path, including with a row-dropping
    # stage (lang filter) upstream (the sidecar is semi-joined down)
    from pydala_spark.operators.pipeline import prep_documents

    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    materialize_signatures(
        spark, df, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    sidecar = read_signatures(spark, base, "spans", verify_against=df)
    kwargs = dict(
        min_quality=0, near_dup=False, span_dedup=True,
        span_k=K, span_window=WINDOW, span_min_chars=MIN_SPAN,
        span_min_df=MIN_DF, keep_langs=["en"],
    )
    inline = prep_documents(df, **kwargs)
    pre = prep_documents(df, precomputed_spans=sidecar, **kwargs)
    assert _rows(pre.select("doc_id", "text")) == _rows(
        inline.select("doc_id", "text")
    )
    # bogus span_k/span_window are overridden by the recorded params
    # when the (frame, params) tuple is passed
    pre2 = prep_documents(
        df, precomputed_spans=sidecar,
        **{**kwargs, "span_k": 5, "span_window": 2},
    )
    assert _rows(pre2.select("doc_id", "text")) == _rows(
        inline.select("doc_id", "text")
    )


def test_prep_documents_precomputed_spans_plan_is_hash_free(spark, tmp_path):
    # the span_dedup stage with a sidecar scans corpus text exactly ONCE
    # (the surgery) and performs zero md5 hashing
    from pydala_spark.operators.pipeline import prep_documents
    from pydala_spark.plans import explain_str, read_schema_columns

    base = str(tmp_path / "ds")
    df = _span_docs(spark)
    df.write.parquet(base + "/data")
    corpus = spark.read.parquet(base + "/data")
    materialize_signatures(
        spark, corpus, base, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    sidecar = read_signatures(spark, base, "spans")
    frames: dict = {}
    prep_documents(
        corpus, min_quality=0, near_dup=False, span_dedup=True,
        span_min_chars=MIN_SPAN, span_min_df=MIN_DF,
        precomputed_spans=sidecar, stage_frames=frames,
    )
    stage = frames["span_dedup"]
    plan = explain_str(stage)
    assert "md5" not in plan.lower()  # zero hashing in the sweep
    assert "_signatures/spans" in plan
    text_scans = [c for c in read_schema_columns(stage) if "text" in c]
    assert len(text_scans) == 1  # the surgery scan, nothing else


def test_prep_documents_precomputed_spans_guards(spark, tmp_path):
    from pydala_spark.operators.pipeline import prep_documents

    df = _span_docs(spark)
    sidecar = span_fingerprints(df, "doc_id", k=K, window=WINDOW)
    with pytest.raises(ValueError, match="span_dedup=True"):
        prep_documents(df, precomputed_spans=sidecar)
    with pytest.raises(ValueError, match="rewrite"):
        prep_documents(
            df, span_dedup=True, paragraph_dedup=True,
            precomputed_spans=sidecar,
        )
    # minhash/fps sidecars still cannot ride along with span_dedup:
    # the span rewrite would make their raw-text hashes stale
    with pytest.raises(ValueError, match="span_dedup"):
        prep_documents(
            df, span_dedup=True, near_dup=True,
            precomputed_spans=sidecar,
            precomputed_minhash=df.select("doc_id"),
        )


def test_cli_pipeline_consumes_and_verifies_sidecars(spark, tmp_path):
    # round 8: [pipeline] signatures=["spans"] reads the sidecar, the
    # content marker verifies by default, and a stale sidecar fails the
    # run LOUD instead of silently finding nothing
    from pydala_spark.cli import main

    src = str(tmp_path / "corpus")
    df = _span_docs(spark)
    df.write.parquet(src)
    corpus = spark.read.parquet(src)
    materialize_signatures(
        spark, corpus, src, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    dest = str(tmp_path / "cleaned")
    cfg = tmp_path / "clean.toml"
    cfg.write_text(
        "[pipeline]\n"
        f'source = "{src}"\n'
        f'dest = "{dest}"\n'
        "min_quality = 0\n"
        "near_dup = false\n"
        "span_dedup = true\n"
        f"span_min_chars = {MIN_SPAN}\n"
        f"span_min_df = {MIN_DF}\n"
        'signatures = ["spans"]\n'
    )
    assert main(["--master", "local[4]", "pipeline", str(cfg)]) == 0
    got = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(dest).select("doc_id", "text").collect()}
    want = {r["doc_id"]: r["text"]
            for r in remove_duplicate_spans(
                corpus, "doc_id", k=K, window=WINDOW,
                min_span=MIN_SPAN, min_df=MIN_DF).collect()}
    assert got == want

    # corpus mutates out-of-band -> the CLI run dies loud on the marker
    spark.createDataFrame(
        [(9, "a brand new document appended after materialization ok")],
        ["doc_id", "text"],
    ).write.mode("append").parquet(src)
    with pytest.raises(ValueError, match="STALE"):
        main(["--master", "local[4]", "pipeline", str(cfg)])

    # unknown kind is a usage error, and signatures_verify=false opts out
    cfg.write_text(cfg.read_text().replace('["spans"]', '["bogus"]'))
    assert main(["--master", "local[4]", "pipeline", str(cfg)]) == 2
    cfg.write_text(
        cfg.read_text().replace('["bogus"]', '["spans"]')
        + "signatures_verify = false\n"
    )
    assert main(["--master", "local[4]", "pipeline", str(cfg)]) == 0


def test_writer_without_ridealong_invalidates_sidecars(spark, tmp_path):
    # round 8 (r7 review item 4): a write that skips the signature
    # ride-along mutates the corpus out from under the sidecars —
    # the Writer deletes them so no consumer can read silently-stale
    # fingerprints; ride-along writes keep theirs
    from pydala_spark.dataset.writer import Writer

    base = str(tmp_path / "wds")
    df = _span_docs(spark)
    Writer(spark, base, mode="overwrite").write(df)
    corpus = spark.read.parquet(base)
    materialize_signatures(spark, corpus, base, kinds=("winnowing",))
    read_signatures(spark, base, "winnowing")  # present

    extra = spark.createDataFrame(
        [(9, "a new document appended without signing it first ok")],
        ["doc_id", "text"],
    )
    Writer(spark, base, mode="append").write(extra)
    with pytest.raises(Exception):  # sidecar gone -> loud missing path
        read_signatures(spark, base, "winnowing")

    # ride-along writes keep the sidecar fresh instead (marker folds)
    base2 = str(tmp_path / "wds2")
    w = Writer(spark, base2, mode="overwrite", signatures=["winnowing"])
    w.write(df)
    Writer(spark, base2, mode="append", signatures=["winnowing"]).write(extra)
    live = spark.read.parquet(base2)
    _, params = read_signatures(spark, base2, "winnowing",
                                verify_against=live)
    assert params["content_rows"] == live.count()


def test_cli_spans_config_mismatch_fails_loud(spark, tmp_path):
    # a config span_k contradicting the sidecar's recorded k must raise
    # (not silently defer to the recorded value)
    from pydala_spark.cli import main

    src = str(tmp_path / "corpus")
    _span_docs(spark).write.parquet(src)
    corpus = spark.read.parquet(src)
    materialize_signatures(
        spark, corpus, src, kinds=("spans",), span_k=K, span_window=WINDOW
    )
    cfg = tmp_path / "clean.toml"
    cfg.write_text(
        "[pipeline]\n"
        f'source = "{src}"\n'
        f'dest = "{tmp_path / "out"}"\n'
        "min_quality = 0\nnear_dup = false\nspan_dedup = true\n"
        "span_k = 30\n"  # sidecar was hashed with k=20
        'signatures = ["spans"]\n'
    )
    with pytest.raises(ValueError, match="disagree"):
        main(["--master", "local[4]", "pipeline", str(cfg)])


def test_incremental_append_signature_ridealong_streams(spark, tmp_path):
    # round 8: the streaming ingest path (incremental_append +
    # Writer(signatures=...)) folds the content marker exactly across
    # micro-batches — the sidecar stays verified, and a sweep consumes
    # it without re-hashing
    import os

    from pydala_spark.dataset.writer import Writer
    from pydala_spark.streaming import incremental_append

    src = str(tmp_path / "stream_in")
    os.makedirs(src)
    dest = str(tmp_path / "stream_ds")
    for b in range(3):
        spark.createDataFrame(
            [(b * 10 + j, f"streamed document {b * 10 + j} body words")
             for j in range(4)],
            "doc_id long, text string",
        ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = incremental_append(
        stream,
        Writer(spark, dest, signatures=("winnowing",),
               signature_kwargs={"id_col": "doc_id"}),
        delta_subset=["doc_id"],
        checkpoint_dir=str(tmp_path / "stream_ckpt"),
    )
    q.awaitTermination(120)
    live = spark.read.parquet(dest)
    assert live.count() == 12
    fps, params = read_signatures(spark, dest, "winnowing",
                                  verify_against=live)
    assert params["content_rows"] == 12
    assert fps.count() == 12


def test_upsert_invalidates_sidecars(spark, tmp_path):
    # upsert takes an early-return path around the ride-along block —
    # it REPLACES rows, so sidecars must not survive it either
    from pydala_spark.dataset.writer import Writer

    base = str(tmp_path / "ups_ds")
    df = _span_docs(spark)
    Writer(spark, base, mode="overwrite").write(df)
    materialize_signatures(spark, spark.read.parquet(base), base,
                           kinds=("winnowing",))
    Writer(spark, base, mode="upsert").write(
        spark.createDataFrame([(1, "entirely rewritten text body here")],
                              ["doc_id", "text"]),
        mode="upsert", delta_subset=["doc_id"],
    )
    with pytest.raises(Exception):
        read_signatures(spark, base, "winnowing")


def test_restore_and_distinct_rewrite_invalidate_sidecars(spark, tmp_path):
    # two more content-changing paths must not strand stale sidecars:
    # a TimeFly POINTER restore (renames data files around the sidecar)
    # and an in-place Repartition(distinct=True) (removes rows); a pure
    # in-place repartition preserves content and KEEPS its sidecar
    from pydala_spark.dataset.repartition import Repartition
    from pydala_spark.dataset.timefly import TimeFly
    from pydala_spark.dataset.writer import Writer

    # --- pointer restore
    root = str(tmp_path / "tf_ds")
    df = _span_docs(spark)
    df.write.parquet(root)
    tf = TimeFly(spark, root, snapshot_mode="pointer")
    tf.new()
    tf.create_current()
    stamp = tf.add_snapshot()
    Writer(spark, tf.current_path, mode="append").write(
        spark.createDataFrame([(9, "a doc appended after the snapshot ok")],
                              ["doc_id", "text"]))
    cur = spark.read.parquet(tf.current_path)
    materialize_signatures(spark, cur, tf.current_path,
                           kinds=("winnowing",))
    tf.load_snapshot(stamp)  # roll back -> sidecar must go
    with pytest.raises(Exception):
        read_signatures(spark, tf.current_path, "winnowing")

    # --- in-place rewrites
    base = str(tmp_path / "rp_ds")
    dup = df.unionByName(df.where(F.col("doc_id") == 1))
    dup.repartition(4).write.parquet(base)
    materialize_signatures(spark, spark.read.parquet(base), base,
                           kinds=("winnowing",))
    # pure repartition: content unchanged -> sidecar survives + verifies
    Repartition(spark, base, max_records_per_file=100).run()
    _, params = read_signatures(
        spark, base, "winnowing",
        verify_against=spark.read.parquet(base))
    assert params["content_rows"] == 4
    # distinct rewrite: rows removed -> sidecar must go
    Repartition(spark, base, distinct=True).run()
    with pytest.raises(Exception):
        read_signatures(spark, base, "winnowing")


def test_duplicate_spans_min_df_spellings(spark):
    # round 16: min_df=2 plans min(id) != max(id) instead of
    # count_distinct(id) >= 2. The semantic edge the rewrite must
    # preserve: an fp repeated at several POSITIONS of one doc is not
    # multi-doc (min == max), while a genuinely cross-doc fp is. Doc 4
    # repeats the shared passage twice internally; only the 1<->2
    # shared passage may produce spans in docs 1/2, and doc 4's
    # internal repeat alone must not mark doc 4 (its fps pair with
    # nothing outside itself). min_df=3 exercises the count_distinct
    # branch on the same corpus: the passage lives in 2 docs, so no
    # spans survive.
    solo = ("entirely private musings on the migration of storks over "
            "warm plains during the early weeks of a dry september")
    df = _span_docs(spark).unionByName(
        spark.createDataFrame(
            [(4, f"intro words here. {solo} middle filler. {solo} done")],
            ["doc_id", "text"],
        )
    )
    two = duplicate_spans(
        df, "doc_id", k=K, window=WINDOW, min_span=MIN_SPAN, min_df=2
    )
    assert {r["id"] for r in two.collect()} == {1, 2}
    three = duplicate_spans(
        df, "doc_id", k=K, window=WINDOW, min_span=MIN_SPAN, min_df=3
    )
    assert three.count() == 0
