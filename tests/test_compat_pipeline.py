import os

import pytest
from pyspark.sql import functions as F

from pydala_spark.operators.pipeline import prep_documents
from pydala_spark.sources import load_table


def test_compat_reader_workflow(spark, sf_dir, tmp_path):
    from pydala_spark.compat import Manager, Reader, Writer

    r = Reader(
        os.path.join(sf_dir, "lineitem.parquet"),
        name="li_compat",
        sort_by="l_orderkey",
        ddb_memory_limit="1GB",  # engine-specific: accepted + ignored
        caching=True,
    )
    df = r.load_dataset("li_compat")
    assert df.count() > 1000
    out = r.query("SELECT count(*) AS n FROM li_compat WHERE l_quantity > 40").first()
    assert out["n"] > 0
    tbl = r.load_pa_table()
    assert tbl.num_rows == df.count()

    w = Writer(str(tmp_path / "compat_ds"), partitioning=["l_returnflag"], mode="append")
    w.write_dataset(df.limit(100))
    back = Reader(str(tmp_path / "compat_ds"))
    assert back.count() == 100
    # delta append of the same rows: nothing new
    w.write_dataset(df.limit(100), mode="delta")
    assert Reader(str(tmp_path / "compat_ds")).load(reload=True).count() == 100

    with pytest.raises(TypeError, match="unknown arguments"):
        Reader(str(tmp_path / "compat_ds"), bogus_option=1)

    lake = Manager(str(tmp_path))
    lake.add_dataset("compat_ds")
    assert lake.sql("SELECT count(*) AS n FROM compat_ds").first()["n"] == 100


def test_compat_time_bucket_batch_size(spark, tmp_path):
    import datetime as dt

    from pydala_spark.compat import Writer

    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i // 4, i % 4), float(i)) for i in range(12)],
        "event_id long, ts timestamp, v double",
    )
    w = Writer(str(tmp_path / "tb"))
    w.write_dataset(df, batch_size="1d", datetime_column="ts")
    buckets = {d for d in os.listdir(tmp_path / "tb") if d.startswith("bucket=")}
    assert len(buckets) == 3


def test_prep_documents_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    # inject exact dups (new ids) and near dups (one word changed)
    exact_dups = docs.limit(20).withColumn("doc_id", F.col("doc_id") + 100000)
    near_dups = (
        docs.limit(10)
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzz")))
    )
    corpus = docs.unionByName(exact_dups).unionByName(near_dups)

    cleaned = prep_documents(corpus, min_quality=0, near_dup=True)
    ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    # all injected exact dups removed (keep-first kept the original id)
    assert not any(i >= 100000 and i < 200000 for i in ids)
    # near dups mostly removed by LSH (word-salad docs: allow a miss)
    near_remaining = sum(1 for i in ids if i >= 200000)
    assert near_remaining <= 3
    # originals retained, minus the corpus's own natural near-dup pairs
    baseline_ids = {
        r["doc_id"]
        for r in prep_documents(docs, min_quality=0, near_dup=True)
        .select("doc_id")
        .collect()
    }
    assert {i for i in ids if i < 100000} == baseline_ids
    assert len(baseline_ids) >= n_docs - 50

    # quality gate actually filters
    strict = prep_documents(corpus, min_quality=3, near_dup=False)
    assert 0 < strict.count() < corpus.count()
    assert "q_score" in strict.columns


def test_prep_documents_decontaminate_and_pack(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    packed = prep_documents(
        corpus,
        min_quality=0,
        near_dup=False,
        benchmark=bench,
        decontaminate_min_hits=1,
        shard_tokens=2048,
    )
    rows = packed.select("doc_id", "n_tokens", "cum_before", "shard_id").collect()
    assert rows
    # no benchmark doc leaked through, and contaminated ids are gone
    ids = {r["doc_id"] for r in rows}
    assert all(i % 50 != 0 for i in ids)
    baseline = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert ids < baseline  # decontamination dropped at least one doc
    # shards are contiguous in id order with a gap-free prefix sum
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    run = 0
    for r in by_id:
        assert r["cum_before"] == run
        assert r["shard_id"] == run // 2048
        run += r["n_tokens"]


def test_prep_documents_repetition_gate(spark):
    from pydala_spark.operators.pipeline import prep_documents

    corpus = spark.createDataFrame(
        [
            (1, "a normal sentence with a healthy variety of distinct words"),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
            (3, "another perfectly ordinary document with plenty words here"),
        ],
        "doc_id long, text string",
    )
    kept = prep_documents(
        corpus, min_quality=0, near_dup=False, max_dup_ngram_frac=0.5
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3]  # the repeated-ngram doc is gated out
    # no thresholds -> no gate, no extra joins
    assert prep_documents(corpus, min_quality=0, near_dup=False).count() == 3


def test_prep_documents_scrub_stage(spark):
    # round 4: blocklist filter runs first; redaction lands before
    # fingerprinting so contact-info-only variants dedup together
    from pydala_spark.operators.pipeline import prep_documents

    corpus = spark.createDataFrame(
        [
            (1, "wholesome training text with plenty of ordinary words"),
            (2, "wholesome training text with plenty of ordinary words "
                "reach me: alice@corp.example.com"),
            (3, "wholesome training text with plenty of ordinary words "
                "reach me: bob@other.example.net"),
            (4, "spam document linking https://bad.example.com/deal now"),
        ],
        "doc_id long, text string",
    )
    kept = prep_documents(
        corpus,
        min_quality=0,
        near_dup=False,
        blocked_hosts=["bad.example.com"],
        redact=True,
    )
    rows = {r["doc_id"]: r["text"] for r in kept.collect()}
    # doc 4 dropped by the blocklist; docs 2 and 3 redact to the SAME
    # text and exact-dedup onto the lowest surviving id alongside doc 1
    assert 4 not in rows
    assert sorted(rows) == [1, 2]
    assert "<email>" in rows[2] and "alice" not in rows[2]


def test_prep_documents_strip_markup_stage(spark):
    # r4: strip_markup=True cleans tags before any signal/fingerprint —
    # two docs identical up to markup dedup together
    from pydala_spark.operators.pipeline import prep_documents

    df = spark.createDataFrame(
        [
            (1, "<p>the quick brown fox jumps over the lazy dog today</p>"),
            (2, "the quick <b>brown</b> fox jumps over the lazy dog today"),
            (3, "a completely different document about spark and parquet files"),
        ],
        ["doc_id", "text"],
    )
    out = prep_documents(
        df, min_quality=0, near_dup=False, strip_markup=True
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {1, 3}  # 2 is an exact dup of 1 after the strip
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert "<p>" not in texts[1] and texts[1].startswith("the quick")


def test_prep_documents_paragraph_dedup_stage(spark):
    # r4: paragraph_dedup=True strips corpus-wide boilerplate lines
    # before fingerprinting; docs reduced to nothing drop out
    from pydala_spark.operators.pipeline import prep_documents

    footer = "subscribe to our newsletter today friends"
    df = spark.createDataFrame(
        [
            (1, f"the quick brown fox jumps high\n{footer}"),
            (2, f"a very different second document entirely\n{footer}"),
            (3, footer),  # boilerplate-only: hollowed out, dropped
        ],
        ["doc_id", "text"],
    )
    out = prep_documents(
        df, min_quality=0, near_dup=False, paragraph_dedup=True
    )
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(texts) == {1, 2}
    assert texts[1] == f"the quick brown fox jumps high\n{footer}"  # first keeps it
    assert texts[2] == "a very different second document entirely"


def test_prep_documents_strip_markup_preserves_lines_for_paragraph_dedup(spark):
    # r4 review: strip_markup + paragraph_dedup together must still
    # remove the shared boilerplate LINE (the strip may not fuse docs
    # into single lines)
    from pydala_spark.operators.pipeline import prep_documents

    footer = "copyright footer two thousand twenty six all rights"
    df = spark.createDataFrame(
        [
            (1, f"<p>the quick brown fox jumps high</p>\n<i>{footer}</i>"),
            (2, f"<b>another entirely different page body</b>\n{footer}"),
        ],
        ["doc_id", "text"],
    )
    out = prep_documents(
        df, min_quality=0, near_dup=False,
        strip_markup=True, paragraph_dedup=True,
    )
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[1] == f"the quick brown fox jumps high\n{footer}"
    assert texts[2] == "another entirely different page body"  # footer deduped


def test_pipeline_report_counts_stages(spark):
    # r4: the per-stage survivor report comes from prep_documents' own
    # stage frames (cannot drift from the real pipeline)
    from pydala_spark.operators.pipeline import pipeline_report

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),  # dup
            (3, "an entirely different document about spark and parquet"),
            (4, "x"),  # fails the quality gate
        ],
        ["doc_id", "text"],
    )
    rep = pipeline_report(df, min_quality=2, near_dup=False)
    assert rep["input"] == 4
    assert rep["exact_dedup"] == 3  # dup collapsed
    assert rep["quality"] == 2  # the one-token doc dropped
    assert "near_dup" not in rep  # disabled stages don't appear


def test_prep_documents_near_dup_keeps_best_score(spark):
    # r4: near_dup_score_col drops the lower-quality member of each LSH
    # pair — the higher id survives when it scores better
    from pydala_spark.operators.pipeline import prep_documents

    short = "the quick brown fox jumps over the lazy dog today"
    long_ = short + " with much more useful additional context attached here"
    df = spark.createDataFrame(
        [(1, short), (2, long_)], ["doc_id", "text"]
    )
    # default: lower id (the SHORT doc) wins
    base = prep_documents(df, min_quality=0, near_dup=True)
    assert {r["doc_id"] for r in base.collect()} == {1}
    # scored on length: the richer doc 2 wins despite the higher id
    scored = df.withColumn("len_score", F.length("text").cast("double"))
    best = prep_documents(
        scored, min_quality=0, near_dup=True, near_dup_score_col="len_score"
    )
    assert {r["doc_id"] for r in best.collect()} == {2}


def test_prep_documents_knob_validation(spark):
    # r4 review: paragraph_max_occurrences implies the paragraph stage;
    # near_dup_score_col without near_dup is an error, not a silent no-op
    from pydala_spark.operators.pipeline import prep_documents

    footer = "subscribe to the newsletter today please friends"
    df = spark.createDataFrame(
        [(i, f"{footer}\ncontent {i} number {i}") for i in range(4)],
        ["doc_id", "text"],
    )
    out = prep_documents(
        df, min_quality=0, near_dup=False, paragraph_max_occurrences=2
    )
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert all(footer not in t for t in texts.values())  # stage implied
    import pytest as _pt

    with _pt.raises(ValueError, match="near_dup_score_col"):
        prep_documents(df, near_dup=False, near_dup_score_col="x")


def test_prep_documents_viral_bucket_cap(spark):
    # round 5: near_dup_max_bucket plumbs the LSH degenerate-bucket cap
    # through the flagship pipeline — a viral near-identical template
    # family (NOT byte-identical, so exact dedup keeps every copy) can't
    # go quadratic; with the cap below the family size its bucket drops
    # and the copies survive the near-dup stage
    from pydala_spark.operators.pipeline import prep_documents

    viral = [
        (i, f"breaking news template shared everywhere variant {i} "
            "read all about the story today")
        for i in range(30)
    ]
    distinct = [
        (100, "a completely unrelated original research document"),
        (101, "another genuinely different piece of quality writing"),
    ]
    df = spark.createDataFrame(viral + distinct, ["doc_id", "text"])
    # default cap (1000) > family size: greedy pair-drop prunes the virals
    pruned = prep_documents(df, min_quality=0, near_dup=True)
    n_viral_kept = sum(
        1 for r in pruned.collect() if r["doc_id"] < 100
    )
    assert n_viral_kept < 30
    # cap below the family size: the viral bucket drops, no pairs form,
    # every copy survives (route such families through exact/paragraph
    # dedup instead) — and the distinct docs are untouched either way
    capped = prep_documents(
        df, min_quality=0, near_dup=True, near_dup_max_bucket=10
    )
    kept = {r["doc_id"] for r in capped.collect()}
    assert all(i in kept for i in range(30))
    assert {100, 101} <= kept


def test_prep_documents_scored_near_dup_string_ids(spark):
    # r4 advice: the scored-loser tiebreak must not negate the id column
    # — string doc ids go through the same (score asc, id desc) rule
    from pydala_spark.operators.pipeline import prep_documents

    short = "the quick brown fox jumps over the lazy dog today"
    long_ = short + " with much more useful additional context attached here"
    df = spark.createDataFrame(
        [("doc-b", short), ("doc-a", long_)], ["doc_id", "text"]
    )
    scored = df.withColumn("len_score", F.length("text").cast("double"))
    best = prep_documents(
        scored, min_quality=0, near_dup=True, near_dup_score_col="len_score"
    )
    assert {r["doc_id"] for r in best.collect()} == {"doc-a"}


def test_pipeline_report_rejects_stage_frames_kwarg(spark):
    from pydala_spark.operators.pipeline import pipeline_report

    df = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="stage_frames"):
        pipeline_report(df, stage_frames={})


def test_prep_documents_cjk_char_shingles(spark):
    # round 5: a CJK corpus through the flagship pipeline — word-mode
    # near-dup misses the unsegmented near-dup pair; char mode drops it
    from pydala_spark.operators.pipeline import prep_documents

    df = spark.createDataFrame(
        [
            (1, "今日は良い天気ですね散歩に行きましょう"),
            (2, "今日は良い天気ですね散歩に出かけましょう"),  # near-dup of 1
            (3, "機械学習モデルの訓練には大量のデータが必要です"),
        ],
        ["doc_id", "text"],
    )
    word = prep_documents(df, min_quality=0, near_dup=True)
    assert {r["doc_id"] for r in word.collect()} == {1, 2, 3}
    char = prep_documents(
        df, min_quality=0, near_dup=True, near_dup_shingle_mode="char"
    )
    assert {r["doc_id"] for r in char.collect()} == {1, 3}


def test_prep_documents_cjk_decontamination(spark):
    # r5 review: near_dup_shingle_mode also governs the decontamination
    # stage — word shingles are blind on unsegmented benchmark overlap
    from pydala_spark.operators.pipeline import prep_documents

    corpus = spark.createDataFrame(
        [
            (1, "機械学習モデルの訓練には大量のデータが必要です"),
            (2, "全く別の話題について書かれた独自の文書です"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "機械学習モデルの訓練には")], ["doc_id", "text"]
    )
    out = prep_documents(
        corpus, min_quality=0, near_dup=False, benchmark=bench,
        decontaminate_min_hits=2, near_dup_shingle_mode="char",
    )
    assert {r["doc_id"] for r in out.collect()} == {2}


def _sem_corpus(spark):
    # three textually-distinct docs; 1 and 2 are embedding paraphrases
    # (near-identical vectors) that ONLY the semantic stage can merge
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta words", [1.0, 0.0, 0.0]),
            (2, "totally different phrasing of the same idea", [1.0, 0.001, 0.0]),
            (3, "third unrelated document about other topics", [0.0, 1.0, 0.0]),
        ],
        "doc_id long, text string, embedding array<double>",
    )


def test_prep_documents_semantic_dedup_stage(spark):
    # round 9: SemDeDup inside the one-call pipeline — the paraphrase
    # pair collapses to its smallest id; the standalone operator agrees
    from pydala_spark.operators.similarity import semantic_dedup

    df = _sem_corpus(spark)
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    stages: dict = {}
    out = prep_documents(
        df, min_quality=0, near_dup=False, semantic_dedup=True,
        semantic_centroids=cents, vec_col="embedding",
        semantic_threshold=0.999, stage_frames=stages,
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 3}
    assert "semantic_dedup" in stages
    standalone = {
        r["id"] for r in semantic_dedup(
            df, cents, id_col="doc_id", vec_col="embedding",
            threshold=0.999,
        ).collect() if r["kept"]
    }
    assert standalone == {1, 3}

    # scored variant: the BEST-scored member of the pair survives
    scored = df.withColumn(
        "sc", F.when(F.col("doc_id") == 2, 9.0).otherwise(1.0)
    )
    best = prep_documents(
        scored, min_quality=0, near_dup=False, semantic_dedup=True,
        semantic_centroids=cents, vec_col="embedding",
        semantic_threshold=0.999, semantic_score_col="sc",
    )
    assert {r["doc_id"] for r in best.collect()} == {2, 3}


def test_prep_documents_semantic_dedup_validation(spark):
    df = _sem_corpus(spark)
    cells_stub = df.select(
        F.col("doc_id").alias("id"), F.lit(0).alias("cell"),
        F.lit(1.0).alias("norm"),
    )
    with pytest.raises(ValueError, match="precomputed_cells requires"):
        prep_documents(df, semantic_dedup=False,
                       precomputed_cells=cells_stub)
    with pytest.raises(ValueError, match="semantic_score_col requires"):
        prep_documents(df, semantic_score_col="sc")
    with pytest.raises(ValueError, match="requires vec_col"):
        prep_documents(df, semantic_dedup=True,
                       semantic_centroids=[[1.0]], vec_col=None)
    with pytest.raises(ValueError, match="semantic_centroids"):
        prep_documents(df, semantic_dedup=True, vec_col="embedding")


def test_prep_documents_semantic_cells_sidecar(spark, tmp_path):
    # round 9: the embedding_cells sidecar feeds the pipeline stage —
    # verdicts equal the inline-centroids path, the plan contains ZERO
    # assignment UDF evals, and (unlike the TEXT sidecars) the cells
    # compose with text-rewriting stages, which never touch embeddings
    from pydala_spark.dataset.maintain import (
        materialize_signatures,
        read_signatures,
    )
    from pydala_spark.plans import explain_str

    df = _sem_corpus(spark)
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    import numpy as np

    cb = np.asarray(cents, dtype=np.float64)
    base = str(tmp_path / "sem_ds")
    df.write.parquet(base)
    stored = spark.read.parquet(base)
    materialize_signatures(
        spark, stored, base, id_col="doc_id", vec_col="embedding",
        kinds=("embedding_cells",), centroids=cb,
    )
    cells, params = read_signatures(
        spark, base, "embedding_cells", verify_against=stored
    )

    inline = prep_documents(
        df, min_quality=0, near_dup=False, semantic_dedup=True,
        semantic_centroids=cents, vec_col="embedding",
        semantic_threshold=0.999,
    )
    pre = prep_documents(
        df, min_quality=0, near_dup=False, semantic_dedup=True,
        vec_col="embedding", semantic_threshold=0.999,
        precomputed_cells=(cells, params),
    )
    assert ({r["doc_id"] for r in pre.collect()}
            == {r["doc_id"] for r in inline.collect()} == {1, 3})
    plan = explain_str(pre)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    # text surgery composes: strip_markup rewrites text, not embeddings
    html = df.withColumn("text", F.concat(F.lit("<p>"), F.col("text"),
                                          F.lit("</p>")))
    washed = prep_documents(
        html, min_quality=0, near_dup=False, semantic_dedup=True,
        vec_col="embedding", semantic_threshold=0.999,
        precomputed_cells=(cells, params), strip_markup=True,
    )
    assert {r["doc_id"] for r in washed.collect()} == {1, 3}

    # span_dedup composes too (the TEXT sidecars refuse this pairing;
    # cells must not — embeddings are untouched by span surgery)
    spanned = prep_documents(
        df, min_quality=0, near_dup=False, semantic_dedup=True,
        vec_col="embedding", semantic_threshold=0.999,
        precomputed_cells=(cells, params), span_dedup=True,
    )
    assert {r["doc_id"] for r in spanned.collect()} == {1, 3}


def test_prep_documents_classifier_gate(spark):
    # round 9: a TRAINED quality filter ships inside the pipeline —
    # pinned weights over the quality_stats features, logit-gated, and
    # usable as the dedup score (keep the classifier-best duplicate)
    from pydala_spark.operators.textstats import classifier_score, quality_stats

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
            (3, "a well formed sentence with many common stop words in it"),
        ],
        ["doc_id", "text"],
    )
    weights = [["q_stop_ratio", 4.0], ["q_punct_ratio", -6.0]]
    stages: dict = {}
    out = prep_documents(
        df, min_quality=0, near_dup=False,
        classifier_weights=weights, classifier_bias=-0.5,
        min_classifier_logit=0.0, stage_frames=stages,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert "classifier" in stages
    assert "clf_logit" in out.columns and "clf_prob" in out.columns
    assert 2 not in rows          # punctuation junk gated out
    assert {1, 3} <= set(rows)    # wordy docs pass
    # the stage IS classifier_score with the same fold order
    expect = classifier_score(
        quality_stats(df, "text"),
        [(F.col(n), w) for n, w in weights], bias=-0.5,
    )
    exp = {r["doc_id"]: r["clf_logit"] for r in expect.collect()}
    assert all(rows[i]["clf_logit"] == exp[i] for i in rows)

    # weights without a threshold: score attached, nothing gated
    scored_only = prep_documents(
        df, min_quality=0, near_dup=False, classifier_weights=weights,
    )
    assert scored_only.count() == 3
    assert "clf_prob" in scored_only.columns

    # orphaned threshold refuses loud
    with pytest.raises(ValueError, match="min_classifier_logit requires"):
        prep_documents(df, min_classifier_logit=0.0)

    # classifier prob drives near-dup keeper choice: two near-identical
    # docs, the higher-classifier one survives
    dup = spark.createDataFrame(
        [
            (10, "shared template words one two three four five six !!!!!!!!"),
            (11, "shared template words one two three four five six seven"),
        ],
        ["doc_id", "text"],
    )
    best = prep_documents(
        dup, min_quality=0, near_dup=True, n_hashes=8, n_bands=8,
        classifier_weights=[["q_punct_ratio", -10.0]],
        near_dup_score_col="clf_prob",
    )
    assert {r["doc_id"] for r in best.collect()} == {11}
