"""Round 6: ingest-time signature materialization (maintain.
materialize_signatures / read_signatures), cluster-mode near-dup, and
the three-way decontaminate_mode in prep_documents."""

import pytest
from pyspark.sql import functions as F

from pydala_spark.dataset.maintain import (
    materialize_signatures,
    read_signatures,
)
from pydala_spark.operators.dedup import winnowing_contamination
from pydala_spark.operators.pipeline import prep_documents
from pydala_spark.operators.textstats import winnowing_fingerprints

#: 38-word base doc; b = base with "apple" at position 8, c = b with
#: "stone" at position 28. Under n_hashes=32 / n_bands=4 the realized
#: (md5-deterministic) LSH candidate pairs are EXACTLY {(1,2),(2,3)} —
#: a duplicate CHAIN with no a~c edge, the topology greedy pair-drop
#: under-merges (pinned by search; stable forever, no RNG anywhere).
_BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four "
    "five six seven eight nine ten eleven twelve"
).split()


def _chain_docs(spark):
    def variant(subs):
        w = list(_BASE)
        for p, word in subs.items():
            w[p] = word
        return " ".join(w)

    return spark.createDataFrame(
        [
            (1, variant({})),
            (2, variant({8: "apple"})),
            (3, variant({8: "apple", 28: "stone"})),
        ],
        ["doc_id", "text"],
    )


def _docs(spark):
    rows = [
        (i, f"document number {i} talks about topic {i % 7} in detail "
            f"with several words of content body text segment {i * 3}")
        for i in range(1, 21)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_materialize_signatures_roundtrip_and_params_guard(spark, tmp_path):
    base = str(tmp_path / "ds")
    df = _docs(spark)
    df.write.parquet(base + "/data")
    out = materialize_signatures(
        spark, df, base, kinds=("winnowing", "minhash")
    )
    assert set(out) == {"winnowing", "minhash"}

    # winnowing sidecar == inline computation, row for row
    fps, params = read_signatures(spark, base, "winnowing")
    assert params["k"] == 8 and params["window"] == 4
    inline = winnowing_fingerprints(df, "doc_id")
    got = {r["id"]: r["fps"] for r in fps.collect()}
    want = {r["id"]: r["fps"] for r in inline.collect()}
    assert got == want

    # minhash sidecar == inline computation
    from pydala_spark.operators.dedup import minhash_signatures

    mh, mh_params = read_signatures(
        spark, base, "minhash", expect={"n_hashes": 8, "seed": 0}
    )
    got = {tuple(r) for r in mh.collect()}
    want = {tuple(r) for r in minhash_signatures(df, "doc_id").collect()}
    assert got == want

    # the params guard refuses a mismatched consumer expectation
    with pytest.raises(ValueError, match="disagree"):
        read_signatures(spark, base, "winnowing", expect={"k": 5})
    with pytest.raises(ValueError):
        materialize_signatures(spark, df, base, kinds=("bogus",))


def test_signatures_path_out_of_place_sidecar(spark, tmp_path):
    # round 8 (late): READ-ONLY datasets — signatures_path hosts the
    # _signatures dir under an alternate base; nothing touches the
    # dataset dir, the marker still verifies, staleness still raises
    import os

    base = str(tmp_path / "readonly_ds")
    alt = str(tmp_path / "derived" / "ds")
    df = _docs(spark)
    df.write.parquet(base + "/data")
    before = sorted(os.listdir(base))

    out = materialize_signatures(
        spark, df, base, kinds=("winnowing",), signatures_path=alt
    )
    assert out["winnowing"].startswith(alt)
    assert sorted(os.listdir(base)) == before  # dataset dir untouched
    assert os.path.isdir(os.path.join(alt, "_signatures", "winnowing"))

    # default-location read finds nothing; the override finds the
    # sidecar, marker-verified against the live corpus
    with pytest.raises(Exception):
        read_signatures(spark, base, "winnowing")
    fps, params = read_signatures(
        spark, base, "winnowing", verify_against=df, signatures_path=alt
    )
    inline = winnowing_fingerprints(df, "doc_id")
    assert ({r["id"]: r["fps"] for r in fps.collect()}
            == {r["id"]: r["fps"] for r in inline.collect()})

    # staleness detection is location-independent
    mutated = df.withColumn(
        "text", F.concat(F.col("text"), F.lit(" tail")))
    with pytest.raises(ValueError, match="STALE"):
        read_signatures(spark, base, "winnowing",
                        verify_against=mutated, signatures_path=alt)

    # append folds the marker at the alternate location too
    extra = spark.createDataFrame(
        [(99, "ninety nine brand new words appended here")],
        ["doc_id", "text"])
    materialize_signatures(spark, extra, base, kinds=("winnowing",),
                           mode="append", signatures_path=alt)
    read_signatures(spark, base, "winnowing",
                    verify_against=df.unionByName(extra),
                    signatures_path=alt)


def test_datalake_sweep_signatures_root(spark, tmp_path):
    # round 8 (late): lake sweeps host per-dataset sidecars under
    # signatures_root/<name> — the read-only-lake cron layout
    import os

    from pydala_spark.catalog import Datalake

    root = str(tmp_path / "rolake")
    sig_root = str(tmp_path / "sidecar_store")
    lake = Datalake(spark, root)
    _docs(spark).write.parquet(os.path.join(root, "docs"))
    lake.add_dataset("docs")

    bench = spark.createDataFrame(
        [(0, "alpha bravo charlie delta echo foxtrot golf hotel")],
        ["doc_id", "text"])
    res = lake.decontaminate({"b": bench}, signatures_root=sig_root)
    assert res["docs"]["sidecar"] == "materialized"
    assert os.path.isdir(os.path.join(
        sig_root, "docs", "_signatures", "winnowing"))
    assert not os.path.exists(os.path.join(root, "docs", "_signatures"))
    again = lake.decontaminate({"b": bench}, signatures_root=sig_root)
    assert again["docs"]["sidecar"] == "reused"
    # without the override the sweep can't see those sidecars
    default = lake.decontaminate({"b": bench})
    assert default["docs"]["sidecar"] == "materialized"


def test_precomputed_fps_plan_never_scans_corpus_text(spark, tmp_path):
    # THE round-6 contract: the precomputed decontamination path's
    # physical plan reads ONLY the signature sidecar — zero scans of the
    # corpus data files, no 'text' column in any ReadSchema
    from pydala_spark.plans import explain_str, read_schema_columns

    base = str(tmp_path / "ds")
    df = _docs(spark)
    df.write.parquet(base + "/data")
    materialize_signatures(spark, df, base, kinds=("winnowing",))

    fps, _ = read_signatures(spark, base, "winnowing")
    bench = spark.createDataFrame(
        [(100, "document number 3 talks about topic 3 in detail")],
        ["doc_id", "text"],
    )
    hits = winnowing_contamination(
        fps, winnowing_fingerprints(bench, "doc_id"), "doc_id",
        precomputed_fps=True,
    )
    plan = explain_str(hits)
    assert "/data" not in plan  # corpus parquet never scanned
    assert "_signatures/winnowing" in plan  # the sidecar is the scan
    for cols in read_schema_columns(hits):
        assert "text" not in cols

    # and it finds the same contaminated docs as the inline path
    inline = winnowing_contamination(df, bench, "doc_id")
    assert {r["id"] for r in hits.collect()} == {
        r["id"] for r in inline.collect()
    }


def test_prep_documents_precomputed_signatures_match_inline(spark, tmp_path):
    base = str(tmp_path / "ds")
    chain = _chain_docs(spark)
    corpus = _docs(spark).unionByName(chain.where(F.col("doc_id") == 1))
    bench = _docs(spark).where(F.col("doc_id") == 7)
    materialize_signatures(
        spark, corpus, base, kinds=("winnowing", "minhash")
    )
    mh, _ = read_signatures(spark, base, "minhash")
    fps, _ = read_signatures(spark, base, "winnowing")

    kwargs = dict(
        min_quality=0, near_dup=True, benchmark=bench,
        decontaminate_mode="winnowing", decontaminate_min_hits=1,
    )
    inline = prep_documents(corpus, **kwargs)
    pre = prep_documents(
        corpus, precomputed_minhash=mh, precomputed_fps=fps, **kwargs
    )
    assert sorted(r["doc_id"] for r in pre.collect()) == sorted(
        r["doc_id"] for r in inline.collect()
    )


def test_prep_documents_cluster_mode_chain(spark):
    # a~b, b~c candidate pairs with no a~c edge. The under-merge greedy
    # exhibits on chains: score the MIDDLE doc worst — greedy drops only
    # the per-pair loser (doc 2, twice), keeping BOTH chain ends {1, 3}
    # even though they are transitive near-dups; cluster mode resolves
    # the full component and keeps exactly one representative.
    chain = _chain_docs(spark)
    scored = chain.withColumn(
        "sc", F.when(F.col("doc_id") == 2, 1.0).otherwise(9.0)
    )
    greedy = prep_documents(
        scored, min_quality=0, near_dup=True, n_hashes=32, n_bands=4,
        near_dup_score_col="sc",
    )
    assert {r["doc_id"] for r in greedy.collect()} == {1, 3}
    cluster = prep_documents(
        scored, min_quality=0, near_dup=True, n_hashes=32, n_bands=4,
        near_dup_mode="cluster", near_dup_score_col="sc",
    )
    assert {r["doc_id"] for r in cluster.collect()} == {1}

    # unscored: greedy drops every pair's higher id ({2, 3} here —
    # transitively correct by luck of the id order); cluster keeps the
    # component minimum, same answer, ONE representative by construction
    assert {
        r["doc_id"]
        for r in prep_documents(
            chain, min_quality=0, near_dup=True, n_hashes=32, n_bands=4,
            near_dup_mode="cluster",
        ).collect()
    } == {1}

    # scored cluster mode keeps the BEST member, not the smallest id
    best = prep_documents(
        chain.withColumn(
            "sc", F.when(F.col("doc_id") == 2, 9.0).otherwise(1.0)
        ),
        min_quality=0, near_dup=True, n_hashes=32, n_bands=4,
        near_dup_mode="cluster", near_dup_score_col="sc",
    )
    assert {r["doc_id"] for r in best.collect()} == {2}


def test_prep_documents_decontaminate_winnowing_mode(spark):
    # DIVERSE corpus (no shared template — winnowing fingerprints of a
    # common template would legitimately hit every doc)
    import hashlib

    def words(i):
        return " ".join(
            hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:6]
            for j in range(12)
        )

    corpus = spark.createDataFrame(
        [(i, words(i)) for i in range(1, 21)], ["doc_id", "text"]
    )
    # tokenizer-hostile edit of doc 5's text: inserted punctuation and
    # casing churn — word shingles diverge, winnowing fingerprints don't
    hostile = words(5).replace(" ", ",  ").upper()
    bench = spark.createDataFrame([(900, hostile)], ["doc_id", "text"])
    out = prep_documents(
        corpus, min_quality=0, near_dup=False, benchmark=bench,
        decontaminate_mode="winnowing", decontaminate_min_hits=2,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 5 not in kept
    assert len(kept) >= 15  # only near-matches of doc 5 dropped


def test_prep_documents_decontaminate_embedding_mode(spark):
    rows = [
        (1, "first clean document with enough words here", [1.0, 0.0, 0.0]),
        (2, "second clean document with enough words here", [0.0, 1.0, 0.0]),
        (3, "paraphrased benchmark leak with other words", [0.6, 0.8, 0.0]),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text", "emb"])
    bench = spark.createDataFrame(
        [(99, [0.6, 0.8, 0.0])], ["doc_id", "emb"]
    )
    out = prep_documents(
        corpus, min_quality=0, near_dup=False, benchmark=bench,
        decontaminate_mode="embedding", vec_col="emb",
        decontaminate_threshold=0.95,
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 2}


def test_prep_documents_mode_validation(spark):
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="near_dup_mode"):
        prep_documents(df, near_dup_mode="bogus")
    with pytest.raises(ValueError, match="decontaminate_mode"):
        prep_documents(df, decontaminate_mode="bogus")
    with pytest.raises(ValueError, match="vec_col"):
        prep_documents(
            df, benchmark=df, decontaminate_mode="embedding"
        )
    sidecar = df.select("doc_id", F.array(F.lit("x")).alias("fps"))
    with pytest.raises(ValueError, match="rewrite the text"):
        prep_documents(
            df, strip_markup=True, decontaminate_mode="winnowing",
            precomputed_fps=sidecar,
        )
    with pytest.raises(ValueError, match="winnowing"):
        prep_documents(df, precomputed_fps=sidecar)  # mode left ngram
    # round-7 advice: the remaining silent-ignore gaps now raise too
    with pytest.raises(ValueError, match="requires a benchmark"):
        prep_documents(
            df, decontaminate_mode="winnowing", precomputed_fps=sidecar
        )
    with pytest.raises(ValueError, match="near_dup_mode requires"):
        prep_documents(df, near_dup=False, near_dup_mode="cluster")

def test_prep_documents_embedding_mode_blocked(spark):
    # round 6: the LSH-blocking knobs reach the pipeline's embedding
    # decontamination (orthogonal planted set — blocking cannot change
    # the answer here, only the join strategy)
    rows = [
        (1, "first clean document with enough words here", [1.0, 0.0, 0.0]),
        (2, "second clean document with enough words here", [0.0, 1.0, 0.0]),
        (3, "paraphrased benchmark leak with other words", [0.6, 0.8, 0.0]),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text", "emb"])
    bench = spark.createDataFrame([(99, [0.6, 0.8, 0.0])], ["doc_id", "emb"])
    out = prep_documents(
        corpus, min_quality=0, near_dup=False, benchmark=bench,
        decontaminate_mode="embedding", vec_col="emb",
        decontaminate_threshold=0.95,
        decontaminate_block_bits=4, decontaminate_dim=3,
        decontaminate_n_probes=4,
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 2}

def test_writer_signature_ride_along(spark, tmp_path):
    # round 6: Writer(signatures=...) materializes signature sidecars
    # per batch after each successful write — the W9 per-batch-hook seam
    # applied to hash-once-at-ingest
    from pydala_spark.dataset.writer import Writer
    from pydala_spark.operators.textstats import winnowing_fingerprints

    base = str(tmp_path / "lake_ds")
    d1 = _docs(spark).where(F.col("doc_id") <= 10)
    d2 = _docs(spark).where(F.col("doc_id") > 10)
    w = Writer(spark, base, mode="append", signatures=("winnowing",))
    w.write(d1)
    fps, params = read_signatures(spark, base, "winnowing")
    assert params["k"] == 8
    assert fps.count() == 10
    # append signs ONLY the new batch; sidecar accumulates to the corpus
    w.write(d2)
    fps, _ = read_signatures(spark, base, "winnowing")
    got = {r["id"]: r["fps"] for r in fps.collect()}
    want = {
        r["id"]: r["fps"]
        for r in winnowing_fingerprints(_docs(spark), "doc_id").collect()
    }
    assert got == want
    # delta mode with nothing new: empty diff -> no write, no signing
    Writer(spark, base, mode="delta", signatures=("winnowing",)).write(
        _docs(spark)
    )
    assert read_signatures(spark, base, "winnowing")[0].count() == 20
    # full overwrite rewrites the sidecar to the new corpus
    Writer(spark, base, mode="overwrite", signatures=("winnowing",)).write(d1)
    assert read_signatures(spark, base, "winnowing")[0].count() == 10
    # row-replacing modes refuse the ride-along (stale-sidecar hazard)
    with pytest.raises(ValueError, match="ride-along"):
        Writer(spark, base, signatures=("winnowing",)).write(
            d1, mode="upsert", delta_subset=["doc_id"]
        )

def test_prep_documents_span_dedup_stage(spark):
    # round 6: the duplicated-span stage rewrites text before any
    # fingerprint/signal — the shared passage disappears from BOTH
    # carriers while their original content survives
    shared = ("it was the best of times it was the worst of times it "
              "was the age of wisdom it was the age of foolishness "
              "indeed")
    rows = [
        (1, f"unique opening about gardens and trees. {shared} unique "
            "closing about rivers and stones in the valley below"),
        (2, f"completely different preamble text goes here now. {shared}"
            " and then a different ending altogether for this one"),
        (3, "this document shares nothing with the others at all and "
            "talks at length about cooking pasta with garlic and oil"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    frames = {}
    out = prep_documents(
        df, min_quality=0, near_dup=False, span_dedup=True,
        stage_frames=frames,
    )
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(texts) == {1, 2, 3}
    assert shared not in texts[1] and shared not in texts[2]
    # original content outside the span survives (boundaries are
    # approximate within ~k+window chars — the documented trade; the
    # exact behavior is pinned by the Python-reference test)
    assert "unique opening about gardens" in texts[1]
    assert "rivers and stones" in texts[1]
    assert "different preamble text" in texts[2]
    assert texts[3] == rows[2][1]
    assert "span_dedup" in frames
    # precomputed signatures refuse the text-mutating stage
    sidecar = df.select("doc_id", F.array(F.lit("x")).alias("fps"))
    with pytest.raises(ValueError, match="span_dedup"):
        prep_documents(
            df, span_dedup=True, decontaminate_mode="winnowing",
            precomputed_fps=sidecar,
        )

def test_materialize_signatures_append_params_guard(spark, tmp_path):
    # round-6 review: appending under DIFFERENT hashing params would
    # silently mix schemes in one sidecar — must fail loud
    base = str(tmp_path / "apg")
    df = _docs(spark)
    materialize_signatures(spark, df, base, kinds=("winnowing",))
    with pytest.raises(ValueError, match="mix"):
        materialize_signatures(
            spark, df, base, kinds=("winnowing",), winnowing_k=5,
            mode="append",
        )
    # same params append is fine; overwrite with new params is fine
    materialize_signatures(spark, df, base, kinds=("winnowing",),
                           mode="append")
    materialize_signatures(spark, df, base, kinds=("winnowing",),
                           winnowing_k=5, mode="overwrite")
    _, params = read_signatures(spark, base, "winnowing")
    assert params["k"] == 5


def test_precomputed_minhash_requires_near_dup(spark):
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    sidecar = df.select("doc_id", F.lit("x").alias("mh_0"))
    with pytest.raises(ValueError, match="precomputed_minhash"):
        prep_documents(df, near_dup=False, precomputed_minhash=sidecar)

def test_prep_documents_bpe_shard_budgets(spark):
    # round 6: shard packing can budget by learned BPE subword counts
    from pydala_spark.operators.bpe import bpe_token_count, train_bpe

    rows = [
        (i, f"doc number {i} says " + "the theater thesis there " * (2 + i))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = train_bpe(df, n_merges=20)
    out = prep_documents(
        df, min_quality=0, near_dup=False, shard_tokens=64,
        shard_bpe_merges=merges,
    )
    got = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    want = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count("text", merges).alias("n")
        ).collect()
    }
    assert got == want  # shard budgets use the BPE counts
    ws = {
        r["doc_id"]: r["n_tokens"]
        for r in prep_documents(
            df, min_quality=0, near_dup=False, shard_tokens=64
        ).collect()
    }
    assert got != ws  # and they differ from whitespace counts

def test_prep_documents_language_filter(spark):
    # round 6: language routing in the flagship pipeline — keep_langs
    # filters on the two-stage label, drop_mixed removes code-switch
    # docs whose single label is unreliable
    rows = [
        (1, "the quick brown fox is definitely an english sentence here"),
        (2, "le chat est sur la table pour le test dans ce cas present"),
        (3, "это русский текст для проверки системы сегодня"),
        (4, "machine learning 機械学習の手法と自然言語処理 is used 研究でも"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    frames = {}
    out = prep_documents(
        df, min_quality=0, near_dup=False, keep_langs=["en", "fr"],
        stage_frames=frames,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 1 in kept and 2 in kept and 3 not in kept
    assert "lang_filter" in frames
    # doc 4 is mixed Latin+CJK: its label lands SOMEWHERE, but
    # drop_mixed removes it regardless
    strict = prep_documents(
        df, min_quality=0, near_dup=False, keep_langs=["en", "fr"],
        drop_mixed=True,
    )
    assert {r["doc_id"] for r in strict.collect()} == kept - {4}

def test_prep_documents_keep_langs_validation(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox is definitely an english sentence")],
        ["doc_id", "text"],
    )
    with pytest.raises(ValueError, match="keep_langs"):
        prep_documents(df, keep_langs=["eng"])  # unknown code
    with pytest.raises(ValueError, match="keep_langs"):
        prep_documents(df, keep_langs=[])  # silently-empty corpus trap
    # case-normalized: "EN" works
    out = prep_documents(df, min_quality=0, near_dup=False,
                         keep_langs=["EN"])
    assert out.count() == 1
