"""Incremental neardup + prep_sweep lake tests, second half of the
round-13 test_timefly_catalog split: the sweep block alone was still a
~12-minute single-file shard floor in tools/partest.py, so it splits
again along the neardup-incremental/prep boundary. Pure move, no test
changed."""

import os

import pytest
from pyspark.sql import functions as F

from pydala_spark import Datalake, Dataset

def test_datalake_neardup_incremental(spark, tmp_path):
    # round 9: the ALL-FRESH fast path — because clusters are
    # lake-global there is no per-dataset skip, but a provably
    # unchanged lake reuses the prior verdict wholesale; and the score
    # column (invisible to the text marker, yet it drives keeper
    # selection) gets its own marker so a re-scored corpus breaks
    # freshness even when the text didn't move
    root = str(tmp_path / "ndinc")
    sig_root = str(tmp_path / "ndinc_sigs")
    lake = Datalake(spark, root)
    shared = ("the quick brown fox jumps over the lazy dog "
              "again and again in every single crawl dump")
    spark.createDataFrame(
        [(1, shared, 0.9),
         (2, "completely different unique content nothing alike here", 0.1)],
        ["doc_id", "text", "score"],
    ).write.parquet(os.path.join(root, "dump_a"))
    spark.createDataFrame(
        [(10, shared, 0.2)], ["doc_id", "text", "score"],
    ).write.parquet(os.path.join(root, "dump_b"))
    for n in ("dump_a", "dump_b"):
        lake.add_dataset(n)

    kw = dict(score_col="score", signatures_root=sig_root,
              incremental=True)
    first = lake.neardup_dedup(**kw)
    assert "marker" in first["dump_a"]
    assert "score_marker" in first["dump_a"]
    assert first["_lake"]["n_clusters"] == 1
    assert first["dump_a"]["n_dropped"] == 0  # 0.9 keeper
    assert first["dump_b"]["n_dropped"] == 1

    # unchanged lake -> verdicts reused, union/LSH/CC skipped
    second = lake.neardup_dedup(**kw)
    for n in ("dump_a", "dump_b"):
        assert second[n]["fresh"].startswith("lake unchanged"), second[n]
    assert second["_lake"] == first["_lake"]
    assert second["dump_b"]["n_dropped"] == 1
    rep = spark.read.parquet(second["dump_b"]["report"])
    assert {r["id"]: r["kept"] for r in rep.collect()} == {"10": False}

    # score-only overwrite: same (id, text) so the TEXT marker — and
    # the out-of-place minhash sidecar — still verify, but the keeper
    # must flip; the score marker alone breaks the fast path
    spark.createDataFrame(
        [(10, shared, 0.95)], ["doc_id", "text", "score"],
    ).write.mode("overwrite").parquet(os.path.join(root, "dump_b"))
    third = lake.neardup_dedup(**kw)
    assert "fresh" not in third["dump_a"] and "fresh" not in third["dump_b"]
    assert third["dump_b"]["sidecar"] == "reused"  # text is unchanged
    assert third["dump_b"]["n_dropped"] == 0
    assert third["dump_a"]["n_dropped"] == 1  # 0.95 beats 0.9 now

    # and the new state is itself reusable
    fourth = lake.neardup_dedup(**kw)
    assert fourth["dump_a"]["fresh"].startswith("lake unchanged")
    assert fourth["dump_a"]["n_dropped"] == 1

    # config moved -> nothing is provably fresh
    fifth = lake.neardup_dedup(n_bands=2, **kw)
    assert "fresh" not in fifth["dump_a"]

    # dataset added -> full sweep (lake-global clusters)
    spark.createDataFrame(
        [(100, "fresh dataset with entirely novel content words", 0.5)],
        ["doc_id", "text", "score"],
    ).write.parquet(os.path.join(root, "dump_c"))
    lake.add_dataset("dump_c")
    sixth = lake.neardup_dedup(**kw)
    assert all("fresh" not in sixth[n]
               for n in ("dump_a", "dump_b", "dump_c"))
    assert sixth["dump_c"]["sidecar"] == "materialized"

    # text mutated -> sidecar re-materializes -> full sweep
    spark.createDataFrame(
        [(101, shared + " with a tail", 0.99)],
        ["doc_id", "text", "score"],
    ).write.mode("append").parquet(os.path.join(root, "dump_c"))
    seventh = lake.neardup_dedup(**kw)
    assert "fresh" not in seventh["dump_c"]
    assert seventh["dump_c"]["sidecar"] == "materialized"


def test_datalake_neardup_partial_incremental(spark, tmp_path):
    # round 10 (VERDICT r9 #5): when K of N datasets changed, prior
    # edges between unchanged datasets are reused and only touched
    # buckets re-pair — clusters AND keepers must equal a from-scratch
    # full sweep over the same final lake state
    s1 = ("alpha bravo charlie delta echo foxtrot golf hotel india "
          "juliet kilo lima mike")
    s2 = ("november oscar papa quebec romeo sierra tango uniform "
          "victor whiskey xray yankee zulu")

    def mk_lake(base, with_mutation):
        root = str(tmp_path / base)
        lake = Datalake(spark, root)
        spark.createDataFrame(
            [(1, s1), (2, "unique content one nothing alike anywhere")],
            ["doc_id", "text"],
        ).write.parquet(os.path.join(root, "da"))
        spark.createDataFrame(
            [(10, s1), (11, s2)], ["doc_id", "text"],
        ).write.parquet(os.path.join(root, "db"))
        dc = [(20, s2), (21, "another singleton with its own words")]
        if with_mutation:
            dc.append((22, s1))
        spark.createDataFrame(dc, ["doc_id", "text"]) \
            .write.parquet(os.path.join(root, "dc"))
        for n in ("da", "db", "dc"):
            lake.add_dataset(n)
        return lake, root

    lake1, root1 = mk_lake("pinc1", with_mutation=False)
    r1 = lake1.neardup_dedup(incremental=True)
    assert r1["_sweep_mode"] == "full"
    assert r1["_edges"] == 2  # (da1,db10) and (db11,dc20)
    assert r1["_overcap"] == []
    r2 = lake1.neardup_dedup(incremental=True)
    assert r2["_sweep_mode"] == "fresh"

    # one dataset mutates: dc gains a doc joining da/db's s1 cluster
    spark.createDataFrame([(22, s1)], ["doc_id", "text"]) \
        .write.mode("append").parquet(os.path.join(root1, "dc"))
    r3 = lake1.neardup_dedup(incremental=True)
    assert r3["_sweep_mode"] == "partial"
    assert r3["dc"]["sidecar"] == "materialized"
    assert r3["da"]["sidecar"] == "reused"

    # the oracle: a from-scratch full sweep over the identical final
    # state — clusters AND keepers identical, per-dataset counts too
    lake2, _ = mk_lake("pinc2", with_mutation=True)
    rf = lake2.neardup_dedup()
    for n in ("da", "db", "dc"):
        for key in ("n_docs", "n_dropped", "n_cross_dropped"):
            assert r3[n][key] == rf[n][key], (n, key, r3[n], rf[n])
    assert r3["_lake"]["n_clusters"] == rf["_lake"]["n_clusters"] == 2
    assert (r3["_lake"]["n_cross_dataset_clusters"]
            == rf["_lake"]["n_cross_dataset_clusters"] == 2)
    v_part = sorted(map(tuple, spark.read.parquet(
        os.path.join(root1, "_neardup", "_verdicts"))
        .select("dataset", "id", "cluster", "kept",
                "rep_dataset", "rep_id").collect()))
    v_full = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "pinc2" / "_neardup" / "_verdicts"))
        .select("dataset", "id", "cluster", "kept",
                "rep_dataset", "rep_id").collect()))
    assert v_part == v_full

    # the partial state is itself reusable: unchanged night -> fresh,
    # then a second mutation chains partial-over-partial and still
    # matches its own full re-run
    r4 = lake1.neardup_dedup(incremental=True)
    assert r4["_sweep_mode"] == "fresh"

    # out-of-band deletion of the verdict table: the all-fresh path
    # must NOT report fresh over a missing table — the sweep self-heals
    # (the partial path rewrites verdicts from union + edges)
    import shutil as _sh
    _sh.rmtree(os.path.join(root1, "_neardup", "_verdicts"))
    r4b = lake1.neardup_dedup(incremental=True)
    assert r4b["_sweep_mode"] != "fresh"
    for n in ("da", "db", "dc"):
        assert r4b[n]["n_docs"] == r3[n]["n_docs"]
    spark.createDataFrame([(3, s2)], ["doc_id", "text"]) \
        .write.mode("append").parquet(os.path.join(root1, "da"))
    r5 = lake1.neardup_dedup(incremental=True)
    assert r5["_sweep_mode"] == "partial"
    r5_full = lake1.neardup_dedup()  # non-incremental full, same lake
    for n in ("da", "db", "dc"):
        for key in ("n_docs", "n_dropped", "n_cross_dropped"):
            assert r5[n][key] == r5_full[n][key]


def test_datalake_neardup_partial_commit_token(spark, tmp_path):
    # round 11 (ADVICE r10): _pairs and the summary's _overcap are
    # written seconds apart; a crash in that window leaves a newer edge
    # set against a stale over-cap list. The _pairs commit token must
    # be echoed in the summary (_artifacts) and any mismatch must
    # degrade the next night to the FULL sweep, never a partial over
    # mismatched state.
    import json as _json

    root = str(tmp_path / "tokennd")
    lake = Datalake(spark, root)
    s1 = ("alpha bravo charlie delta echo foxtrot golf hotel india "
          "juliet kilo lima mike")
    spark.createDataFrame(
        [(1, s1), (2, "unique content one nothing alike anywhere")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "da"))
    spark.createDataFrame([(10, s1)], ["doc_id", "text"]) \
        .write.parquet(os.path.join(root, "db"))
    for n in ("da", "db"):
        lake.add_dataset(n)

    r1 = lake.neardup_dedup(incremental=True)
    assert r1["_sweep_mode"] == "full"
    tok_path = os.path.join(root, "_neardup", "_pairs", "_token.json")
    with open(tok_path) as fh:
        tok = _json.load(fh)
    assert r1["_artifacts"] == tok and tok

    # the healthy path still goes partial after a mutation
    spark.createDataFrame([(3, s1)], ["doc_id", "text"]) \
        .write.mode("append").parquet(os.path.join(root, "da"))
    r2 = lake.neardup_dedup(incremental=True)
    assert r2["_sweep_mode"] == "partial"
    assert r2["_artifacts"] != r1["_artifacts"]  # re-tokened each write

    # crash simulation A: _pairs was rewritten but the summary wasn't
    # (token on disk differs from the summary's echo)
    with open(tok_path, "w") as fh:
        _json.dump("deadbeef-crashed-run", fh)
    spark.createDataFrame([(4, s1)], ["doc_id", "text"]) \
        .write.mode("append").parquet(os.path.join(root, "da"))
    r3 = lake.neardup_dedup(incremental=True)
    assert r3["_sweep_mode"] == "full"  # mismatch -> full rebuild

    # crash simulation B: token file missing entirely (crash between
    # the parquet overwrite — which deletes the old token — and the
    # token write)
    os.remove(tok_path)
    spark.createDataFrame([(5, s1)], ["doc_id", "text"]) \
        .write.mode("append").parquet(os.path.join(root, "da"))
    r4 = lake.neardup_dedup(incremental=True)
    assert r4["_sweep_mode"] == "full"

    # and the full rebuild re-establishes a consistent commit: the
    # next mutation night is partial again
    spark.createDataFrame([(6, s1)], ["doc_id", "text"]) \
        .write.mode("append").parquet(os.path.join(root, "da"))
    r5 = lake.neardup_dedup(incremental=True)
    assert r5["_sweep_mode"] == "partial"

    # crash simulation C (round-11 review class): a _pairs part-file
    # lost AFTER a committed write — token intact, edge count short.
    # The metadata count vs the summary's _edges must refuse the delta
    # path (full re-band), never silently drop unchanged-unchanged
    # edges.
    import glob as _glob
    part = sorted(_glob.glob(os.path.join(
        root, "_neardup", "_pairs", "part-*")))[0]
    os.remove(part)
    spark.createDataFrame([(7, s1)], ["doc_id", "text"]) \
        .write.mode("append").parquet(os.path.join(root, "da"))
    r6 = lake.neardup_dedup(incremental=True)
    assert r6["_sweep_mode"] == "full"
    # the full re-band rewrote a consistent edge set: partial resumes
    spark.createDataFrame([(8, s1)], ["doc_id", "text"]) \
        .write.mode("append").parquet(os.path.join(root, "da"))
    r7 = lake.neardup_dedup(incremental=True)
    assert r7["_sweep_mode"] == "partial"

    # a verdict PARTITION lost on a QUIET lake (third review find):
    # the all-fresh gate's count check must refuse "fresh" over the
    # lost rows and rebuild them
    r8 = lake.neardup_dedup(incremental=True)
    assert r8["_sweep_mode"] == "fresh"  # sanity: gate passes intact
    n_da = r8["da"]["n_docs"]
    import shutil as _sh
    _sh.rmtree(os.path.join(root, "_neardup", "_verdicts",
                            "dataset=da"))
    r9 = lake.neardup_dedup(incremental=True)
    assert r9["_sweep_mode"] != "fresh"
    assert r9["da"]["n_docs"] == n_da  # rebuilt, not reported-lost


def test_datalake_neardup_allfresh_zero_docs(spark, tmp_path):
    # round-11 review find: an embeddings-only lake (no dataset has the
    # text column) never writes _verdicts — the all-fresh gate must not
    # demand the table and re-run full forever (the span/semantic
    # zero-output carve-out, now on all three sweeps)
    root = str(tmp_path / "zdlake")
    lake = Datalake(spark, root)
    spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>",
    ).write.parquet(os.path.join(root, "embs"))
    lake.add_dataset("embs")
    r1 = lake.neardup_dedup(incremental=True)
    assert r1["_sweep_mode"] == "full"
    assert r1["embs"]["skipped"].startswith("no (")
    assert not os.path.isdir(os.path.join(root, "_neardup", "_verdicts"))
    r2 = lake.neardup_dedup(incremental=True)
    assert r2["_sweep_mode"] == "fresh"


def test_datalake_neardup_state_lifecycle(spark, tmp_path):
    # round 11 (VERDICT r10 #3): the summary reports the persisted
    # edge set's footprint, and a viral-duplicate lake (edge count
    # quadratic in a boilerplate bucket) trips the balloon warning
    root = str(tmp_path / "statend")
    lake = Datalake(spark, root)
    s1 = ("alpha bravo charlie delta echo foxtrot golf hotel india "
          "juliet kilo lima mike")
    spark.createDataFrame(
        [(1, s1), (2, "unique content one nothing alike anywhere")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "da"))
    spark.createDataFrame([(10, s1)], ["doc_id", "text"]) \
        .write.parquet(os.path.join(root, "db"))
    for n in ("da", "db"):
        lake.add_dataset(n)

    r1 = lake.neardup_dedup(incremental=True)
    assert r1["_state"]["pairs_rows"] == r1["_edges"] == 1
    assert r1["_state"]["pairs_bytes"] > 0
    assert "balloon_warning" not in r1["_state"]
    # the all-fresh night carries the footprint verbatim
    r2 = lake.neardup_dedup(incremental=True)
    assert r2["_sweep_mode"] == "fresh"
    assert r2["_state"] == r1["_state"]

    # viral night: 24 more copies of the same boilerplate -> the
    # bucket pairs quadratically (25+ docs -> 300+ edges > 4x docs)
    viral = ("viral boilerplate paragraph repeated across the whole "
             "crawl tonight verbatim every single time no variance")
    spark.createDataFrame(
        [(100 + i, viral) for i in range(25)], ["doc_id", "text"],
    ).write.mode("append").parquet(os.path.join(root, "da"))
    r3 = lake.neardup_dedup(incremental=True)
    assert r3["_state"]["pairs_rows"] > 4 * 28
    assert "balloon_warning" in r3["_state"]
    # ...and the knob tunes the tripwire
    r4 = lake.neardup_dedup(incremental=True, edge_warn_multiple=100.0)
    assert "balloon_warning" not in r4["_state"]


def test_datalake_neardup_partial_cap_transition(spark, tmp_path):
    # round 10: a viral-bucket cap-status transition makes prior edges
    # non-reusable — the delta path must detect BOTH directions and
    # fall back to the full sweep
    root = str(tmp_path / "capnd")
    lake = Datalake(spark, root)
    s = ("the same viral boilerplate paragraph repeated across the "
         "whole crawl again and again")
    spark.createDataFrame(
        [(1, s), (2, "unique words in dataset a nothing else")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "da"))
    spark.createDataFrame([(10, s)], ["doc_id", "text"]) \
        .write.parquet(os.path.join(root, "db"))
    for n in ("da", "db"):
        lake.add_dataset(n)

    kw = dict(incremental=True, max_bucket_size=2)
    r1 = lake.neardup_dedup(**kw)
    assert r1["_sweep_mode"] == "full"
    assert r1["_overcap"] == [] and r1["_lake"]["n_clusters"] == 1

    # under -> over: a third identical doc pushes the bucket past the
    # cap; the full sweep would now suppress the pair entirely
    spark.createDataFrame([(11, s)], ["doc_id", "text"]) \
        .write.mode("append").parquet(os.path.join(root, "db"))
    r2 = lake.neardup_dedup(**kw)
    assert r2["_sweep_mode"] == "full"  # delta refused, fell back
    assert len(r2["_overcap"]) > 0
    assert r2["_lake"]["n_clusters"] == 0  # viral bucket dropped
    assert r2["da"]["n_dropped"] == 0 and r2["db"]["n_dropped"] == 0

    # over -> under: the viral bucket shrinks back under the cap; the
    # full sweep would now EMIT pairs the prior run suppressed
    spark.createDataFrame([(10, s)], ["doc_id", "text"]) \
        .write.mode("overwrite").parquet(os.path.join(root, "db"))
    r3 = lake.neardup_dedup(**kw)
    assert r3["_sweep_mode"] == "full"
    assert r3["_overcap"] == []
    assert r3["_lake"]["n_clusters"] == 1
    assert r3["da"]["n_dropped"] + r3["db"]["n_dropped"] == 1


def test_datalake_neardup_matches_manual_union(spark, tmp_path):
    # round 9 property pin: the lake sweep's clusters and keepers equal
    # the single-corpus operator chain (minhash -> LSH -> connected
    # components -> smallest-id representative) over a hand-unioned
    # corpus with dataset-qualified ids — across id TYPES (int and
    # string) and with cross-dataset duplicates. Pins the \x1f
    # lake-qualification plumbing against drift.
    from pydala_spark.operators.dedup import (
        dedup_clusters,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    root = str(tmp_path / "ndeq")
    lake = Datalake(spark, root)
    t1 = ("the quick brown fox jumps over the lazy dog "
          "again and again in every single crawl dump")
    t2 = ("another widely duplicated passage appearing in both "
          "dumps with exactly identical wording throughout")
    spark.createDataFrame(
        [(1, t1), (2, "unique alpha content with its own vocabulary"),
         (3, t2)],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "dump_a"))
    spark.createDataFrame(
        [("x10", t1), ("x11", "unique beta content nothing shared here"),
         ("x12", t2)],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "dump_b"))
    for n in ("dump_a", "dump_b"):
        lake.add_dataset(n)

    res = lake.neardup_dedup()
    verdicts = spark.read.parquet(
        os.path.join(root, "_neardup", "_verdicts"))
    sep = "\x1f"
    got = {
        (r["dataset"] + sep + r["id"]): r
        for r in verdicts.collect()
    }

    # manual union with dataset-prefixed ids (sweep defaults: 8 hashes,
    # 4 bands, 3-word shingles, seed 0, bucket cap 256)
    union = None
    for name in ("dump_a", "dump_b"):
        df = spark.read.parquet(os.path.join(root, name))
        sig = minhash_signatures(
            df, "doc_id", "text", n_hashes=8, shingle_size=3, seed=0,
        ).withColumn(
            "lid",
            F.concat_ws(sep, F.lit(name), F.col("doc_id").cast("string")),
        ).drop("doc_id")
        union = sig if union is None else union.unionByName(sig)
    pairs = lsh_candidate_pairs(union, "lid", n_bands=4,
                                max_bucket_size=256)
    manual = {r["id"]: r["cluster_id"]
              for r in dedup_clusters(pairs).collect()}
    all_lids = {r["lid"] for r in union.select("lid").collect()}

    # same cluster membership (by qualified id), same keepers
    # (smallest lake-qualified id per cluster; singletons kept)
    exp_cluster = {lid: manual.get(lid) for lid in all_lids}
    assert {lid: got[lid]["cluster"] for lid in all_lids} == exp_cluster
    exp_kept = {
        lid: (manual.get(lid) is None
              or lid == min(m for m, c in manual.items()
                            if c == manual[lid]))
        for lid in all_lids
    }
    assert {lid: got[lid]["kept"] for lid in all_lids} == exp_kept
    # cross-dataset stats line up with the planted topology:
    # two clusters, both spanning datasets
    assert res["_lake"] == {"n_clusters": 2,
                            "n_cross_dataset_clusters": 2}


def test_datalake_prep_sweep(spark, tmp_path):
    # round 9: one cleaning config over every text dataset in the lake,
    # cleaned copies written outside the lake root — skip reasons,
    # error containment and pooling follow the sweep conventions
    import json

    root = str(tmp_path / "preplake")
    dest = str(tmp_path / "prep_out")
    lake = Datalake(spark, root)
    leak = "the quick brown fox jumps over the lazy benchmark dog"
    spark.createDataFrame(
        [(1, f"plenty of ordinary words and then {leak} at the end"),
         (2, "a perfectly ordinary document with enough real words here"),
         (2, "a perfectly ordinary document with enough real words here"),
         (3, "!!!")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "da"))
    spark.createDataFrame(
        [(10, "another clean corpus document with plain readable text")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "db"))
    spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id long, embedding array<double>"
    ).write.parquet(os.path.join(root, "embs"))
    for n in ("da", "db", "embs"):
        lake.add_dataset(n)
    bench = spark.createDataFrame([(0, leak)], ["doc_id", "text"])

    res = lake.prep_sweep(dest, benchmark=bench, min_quality=1,
                          near_dup=False)
    assert res["embs"]["skipped"].startswith("no (doc_id, text)")
    # da: doc 1 decontaminated, dup doc 2 exact-deduped, doc 3 gated
    assert res["da"]["n_in"] == 4 and res["da"]["n_out"] == 1
    assert res["db"]["n_out"] == 1
    out = spark.read.parquet(res["da"]["dest"])
    assert [r["doc_id"] for r in out.collect()] == [2]
    assert "q_score" in out.columns
    summary = json.loads(
        (tmp_path / "preplake" / "_prep" / "_summary.json").read_text())
    assert summary["da"]["n_out"] == 1
    assert summary["_config"]["min_quality"] == 1
    assert summary["_config"]["benchmark"] is True

    # typo'd cleaning knob fails BEFORE any dataset pays a job
    with pytest.raises(ValueError, match="unknown prep_documents knob"):
        lake.prep_sweep(dest, min_qualty=1)

    # pooled sweep: identical counts; garbage dataset contained
    os.makedirs(os.path.join(root, "broken"))
    lake.add_dataset("broken")
    with open(os.path.join(root, "broken", "junk.parquet"), "w") as f:
        f.write("not parquet")
    pooled = lake.prep_sweep(dest, benchmark=bench, min_quality=1,
                             near_dup=False, max_concurrency=3)
    assert "error" in pooled["broken"]
    assert pooled["da"]["n_out"] == res["da"]["n_out"]
    assert pooled["db"]["n_out"] == res["db"]["n_out"]

    # incremental: first run records markers, second keeps yesterday's
    # cleaned copies without re-running the pipeline
    kw = dict(benchmark=bench, min_quality=1, near_dup=False,
              incremental=True)
    first = lake.prep_sweep(dest, **kw)
    assert "marker" in first["da"] and "fresh" not in first["da"]
    second = lake.prep_sweep(dest, **kw)
    assert second["da"]["fresh"].startswith("unchanged")
    assert second["db"]["fresh"].startswith("unchanged")
    assert second["da"]["n_out"] == first["da"]["n_out"]

    # corpus mutated -> only that dataset re-cleans
    spark.createDataFrame(
        [(11, "a newly appended clean document with plenty of words")],
        ["doc_id", "text"],
    ).write.mode("append").parquet(os.path.join(root, "db"))
    third = lake.prep_sweep(dest, **kw)
    assert third["da"]["fresh"].startswith("unchanged")
    assert "fresh" not in third["db"]
    assert third["db"]["n_out"] == 2

    # config moved -> nothing provably current
    fourth = lake.prep_sweep(dest, benchmark=bench, min_quality=2,
                             near_dup=False, incremental=True)
    assert "fresh" not in fourth["da"]

    # benchmark content moved -> nothing provably current either
    bench2 = spark.createDataFrame([(0, leak + " longer")],
                                   ["doc_id", "text"])
    fifth = lake.prep_sweep(dest, benchmark=bench2, min_quality=1,
                            near_dup=False, incremental=True)
    assert "fresh" not in fifth["da"]

    # out-of-band deletion of the cleaned copy -> the fresh path must
    # fall through to a re-clean (ADVICE r9), never report "fresh" with
    # a dest pointing at nothing
    import shutil

    sixth = lake.prep_sweep(dest, **kw)  # re-establish kw's markers
    shutil.rmtree(sixth["da"]["dest"])
    seventh = lake.prep_sweep(dest, **kw)
    assert "fresh" not in seventh["da"]
    assert seventh["db"]["fresh"].startswith("unchanged")
    assert spark.read.parquet(seventh["da"]["dest"]).count() \
        == seventh["da"]["n_out"]


def test_datalake_prep_sweep_append_n_out(spark, tmp_path):
    # ADVICE r9: with mode="append" the dest accumulates across runs —
    # n_out must report THIS run's rows (cumulative total in n_total)
    root = str(tmp_path / "applake")
    dest = str(tmp_path / "app_out")
    lake = Datalake(spark, root)
    spark.createDataFrame(
        [(1, "a perfectly ordinary document with enough real words")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "da"))
    lake.add_dataset("da")
    kw = dict(mode="append", min_quality=0, near_dup=False)
    r1 = lake.prep_sweep(dest, **kw)
    assert r1["da"]["n_out"] == 1 and r1["da"]["n_total"] == 1
    r2 = lake.prep_sweep(dest, **kw)
    assert r2["da"]["n_out"] == 1 and r2["da"]["n_total"] == 2
    # overwrite mode keeps the round-9 shape: n_out == rows on disk,
    # no n_total key
    r3 = lake.prep_sweep(dest, min_quality=0, near_dup=False)
    assert r3["da"]["n_out"] == 1 and "n_total" not in r3["da"]


def test_datalake_prep_sweep_overrides(spark, tmp_path):
    # round 10 (VERDICT r9 #2): heterogeneous lakes keep the one-cron/
    # one-summary economy — ONE base cleaning config with per-dataset
    # knob deltas merged over it
    import json

    from pydala_spark.dataset.maintain import read_signatures

    root = str(tmp_path / "ovlake")
    dest = str(tmp_path / "ov_out")
    lake = Datalake(spark, root)
    spark.createDataFrame(
        [(1, "a perfectly ordinary web document with enough words"),
         (2, "another clean web document with plain readable text")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "web"))
    spark.createDataFrame(
        [(10, "def main(): return compute_the_thing(argv) # entry"),
         (11, "class Thing:\n    def run(self):\n        return 42")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "code"))
    for n in ("web", "code"):
        lake.add_dataset(n)

    # override hygiene fails the sweep up front, like a typo'd base knob
    with pytest.raises(ValueError, match="unknown dataset"):
        lake.prep_sweep(dest, overrides={"nope": {"min_quality": 1}})
    with pytest.raises(ValueError, match="unknown override knob"):
        lake.prep_sweep(dest, overrides={"code": {"min_qualty": 1}})

    # the merged config actually drives each dataset: code gets an
    # impossible quality bar, web keeps the base
    res = lake.prep_sweep(dest, min_quality=0, near_dup=False,
                          overrides={"code": {"min_quality": 99}})
    assert res["web"]["n_out"] == 2
    assert res["code"]["n_out"] == 0
    assert res["code"]["config"] == {"min_quality": 99}
    assert "config" not in res["web"]
    summary = json.loads(
        (tmp_path / "ovlake" / "_prep" / "_summary.json").read_text())
    assert summary["code"]["config"] == {"min_quality": 99}
    assert summary["_config"].get("min_quality") == 0  # base only

    # derived hashing params follow the EFFECTIVE config: an override
    # that flips the shingle mode must pin the materialized sidecar to
    # char/7 for that dataset while the others stay word/3
    dest2 = str(tmp_path / "ov_out2")
    lake.prep_sweep(dest2, min_quality=0, signatures=("minhash",),
                    overrides={"code": {
                        "near_dup_shingle_mode": "char"}})
    _, p_web = read_signatures(spark, os.path.join(root, "web"),
                               "minhash")
    _, p_code = read_signatures(spark, os.path.join(root, "code"),
                                "minhash")
    assert p_web["shingle_mode"] == "word" \
        and p_web["shingle_size"] == 3
    assert p_code["shingle_mode"] == "char" \
        and p_code["shingle_size"] == 7

    # incremental: a changed override invalidates exactly that dataset
    kw = dict(min_quality=0, near_dup=False, incremental=True,
              overrides={"code": {"min_quality": 99}})
    first = lake.prep_sweep(dest, **kw)
    assert "fresh" not in first["code"]  # sidecar run above reshaped
    second = lake.prep_sweep(dest, **kw)
    assert second["web"]["fresh"].startswith("unchanged")
    assert second["code"]["fresh"].startswith("unchanged")
    third = lake.prep_sweep(dest, min_quality=0, near_dup=False,
                            incremental=True,
                            overrides={"code": {"min_quality": 0}})
    assert third["web"]["fresh"].startswith("unchanged")
    assert "fresh" not in third["code"]
    assert third["code"]["n_out"] == 2
    # dropping the override entirely is also a config move for code
    fourth = lake.prep_sweep(dest, min_quality=0, near_dup=False,
                             incremental=True)
    assert fourth["web"]["fresh"].startswith("unchanged")
    assert "fresh" not in fourth["code"]
    # ...and a base-config change still invalidates the whole sweep
    fifth = lake.prep_sweep(dest, min_quality=1, near_dup=False,
                            incremental=True)
    assert "fresh" not in fifth["web"] and "fresh" not in fifth["code"]


def test_cli_cron_prep_sweep_overrides(spark, tmp_path, capsys):
    # round 10: the [prep_sweep.overrides.<dataset>] cron TOML form
    import json

    from pydala_spark.cli import main

    root = str(tmp_path / "ovcron")
    lake = Datalake(spark, root)
    spark.createDataFrame(
        [(1, "a perfectly ordinary web document with enough words")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "web"))
    spark.createDataFrame(
        [(10, "def main(): return compute_the_thing(argv) # entry")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "code"))
    for n in ("web", "code"):
        lake.add_dataset(n)

    cfg = tmp_path / "ov_cron.toml"
    dest = str(tmp_path / "ovcron_out")
    cfg.write_text(f"""
root = "{root}"

[prep_sweep]
dest_root = "{dest}"
min_quality = 0
near_dup = false

[prep_sweep.overrides.code]
min_quality = 99
""")
    rc = main(["--master", "local[4]", "cron", str(cfg)])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["prep_sweep"]["web"]["n_out"] == 1
    assert out["prep_sweep"]["code"]["n_out"] == 0
    assert out["prep_sweep"]["code"]["config"] == {"min_quality": 99}


def test_prep_sweep_cleaned_lake_handoff(spark, tmp_path):
    # round 10 (VERDICT r9 #6): the cleaned copies ARE a new lake —
    # prep_sweep(sign_outputs=) signs them at creation, a Datalake over
    # dest_root starts sidecar-served, and a semantic_dedup sweep over
    # the new lake closes the deliberate embedding_cells exclusion by
    # pinning the CLEANED corpus's own codebook + cells there
    import numpy as np

    root = str(tmp_path / "handlake")
    dest = str(tmp_path / "handout")
    lake = Datalake(spark, root)
    rng = np.random.default_rng(17)

    def vec(seed_row):
        return [float(x) for x in rng.normal(size=6)]

    shared = ("the exact same crawl paragraph showing up twice in the "
              "corpus word for word")
    base = [
        (1, shared, vec(1)),
        (2, shared, vec(2)),  # text near-dup of 1 — prep drops one
        (3, "a unique document with plenty of distinct words", vec(3)),
        (4, "another unique document with different words again", vec(4)),
    ]
    # 3 and 4 get near-identical embeddings: the SEMANTIC sweep over
    # the cleaned lake must catch what text dedup cannot
    base[3] = (4, base[3][1],
               [x + 1e-4 for x in base[2][2]])
    spark.createDataFrame(
        base, "doc_id long, text string, embedding array<double>",
    ).write.parquet(os.path.join(root, "docs"))
    lake.add_dataset("docs")

    res = lake.prep_sweep(dest, min_quality=0, near_dup=True,
                          sign_outputs=("minhash",))
    assert res["docs"]["n_out"] == 3  # one exact/near text dup gone
    assert res["docs"]["signed"] == ["minhash"]

    # the handoff: a NEW Datalake rooted at the cleaned copies
    clean = Datalake(spark, dest)
    clean.add_dataset("docs")
    # non-text columns rode through the pipeline into the copy
    assert "embedding" in spark.read.parquet(
        res["docs"]["dest"]).columns

    nd = clean.neardup_dedup()
    # signed at creation -> the new lake's sweep starts sidecar-served
    assert nd["docs"]["sidecar"] == "reused"
    assert nd["docs"]["n_dropped"] == 0  # text dups already cleaned

    sd = clean.semantic_dedup(id_col="doc_id", threshold=0.999,
                              n_centroids=2)
    assert sd["docs"]["n_dropped"] == 1  # the embedding near-dup pair
    # ...and the cells sidecar now lives in the CLEANED lake, pinned
    # to the codebook this sweep trained over the cleaned corpus
    from pydala_spark.dataset.maintain import read_signatures

    _, params = read_signatures(
        spark, res["docs"]["dest"], "embedding_cells")
    assert params.get("codebook_sha")

    # second semantic sweep reuses the fresh cells sidecar
    sd2 = clean.semantic_dedup(id_col="doc_id", threshold=0.999,
                               n_centroids=2)
    assert sd2["docs"]["sidecar"] == "reused"


def test_datalake_prep_sweep_signature_sidecars(spark, tmp_path):
    # round 9: the prep sweep serves its near-dup stage from each
    # dataset's minhash sidecar — verdicts identical to the inline
    # sweep, hashing paid once, and the SAME sidecar then serves
    # neardup_dedup (shared ingest economy)
    root = str(tmp_path / "prepsig")
    dest = str(tmp_path / "prepsig_out")
    lake = Datalake(spark, root)
    shared = ("the quick brown fox jumps over the lazy dog "
              "again and again in every single crawl dump")
    spark.createDataFrame(
        [(1, shared),
         (2, shared + " trailing"),
         (3, "a completely different document with its own words here")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "da"))
    lake.add_dataset("da")

    inline = lake.prep_sweep(dest + "_inline", min_quality=0)
    first = lake.prep_sweep(dest, min_quality=0,
                            signatures=("minhash",))
    assert first["da"]["sidecars"] == {"minhash": "materialized"}
    assert first["da"]["n_out"] == inline["da"]["n_out"]
    a = spark.read.parquet(first["da"]["dest"])
    b = spark.read.parquet(inline["da"]["dest"])
    assert sorted(r["doc_id"] for r in a.collect()) \
        == sorted(r["doc_id"] for r in b.collect())

    # second run reads the sidecar (no re-hash); neardup_dedup then
    # reuses the very same table
    second = lake.prep_sweep(dest, min_quality=0,
                             signatures=("minhash",))
    assert second["da"]["sidecars"] == {"minhash": "reused"}
    nd = lake.neardup_dedup()
    assert nd["da"]["sidecar"] == "reused"

    # param pin: a sweep under different hashing knobs refuses to
    # consume the stale-parameter sidecar and re-materializes
    third = lake.prep_sweep(dest, min_quality=0, n_hashes=4,
                            signatures=("minhash",))
    assert third["da"]["sidecars"] == {"minhash": "materialized"}

    # unknown kind fails before any dataset pays a job
    # (embedding_cells needs a pinned codebook — single-corpus CLI)
    with pytest.raises(ValueError, match="unknown signatures kind"):
        lake.prep_sweep(dest, signatures=("embedding_cells",))

    # winnowing sidecar serves the decontamination stage
    bench = spark.createDataFrame([(0, shared)], ["doc_id", "text"])
    wn = lake.prep_sweep(
        dest + "_wn", min_quality=0, benchmark=bench,
        decontaminate_mode="winnowing", near_dup=False,
        signatures=("winnowing",),
    )
    assert wn["da"]["sidecars"] == {"winnowing": "materialized"}
    kept = {r["doc_id"] for r in
            spark.read.parquet(wn["da"]["dest"]).collect()}
    assert 1 not in kept and 3 in kept


def test_datalake_span_report_incremental(spark, tmp_path):
    # round 9: span df counts are lake-global (the neardup rule), so
    # the only sound economy is the ALL-FRESH fast path — unchanged
    # lake reuses the prior report; any mutation or config change
    # falls back to the full union/df jobs
    root = str(tmp_path / "spaninc")
    lake = Datalake(spark, root)
    boiler = ("this exact legal boilerplate paragraph appears at the "
              "bottom of every single crawl dump page")
    spark.createDataFrame(
        [(1, f"original words of document one. {boiler}"),
         (2, "a document with entirely unique content and nothing shared")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "da"))
    spark.createDataFrame(
        [(10, f"different lead-in text here. {boiler}")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "db"))
    for n in ("da", "db"):
        lake.add_dataset(n)

    kw = dict(min_df=2, incremental=True)
    first = lake.span_dedup_report(**kw)
    assert first["_lake"]["n_spans"] >= 2  # boiler flagged in both
    assert "marker" in first["da"]

    second = lake.span_dedup_report(**kw)
    for n in ("da", "db"):
        assert second[n]["fresh"].startswith("lake unchanged"), second[n]
    assert second["_lake"] == first["_lake"]
    assert second["da"]["n_spans"] == first["da"]["n_spans"]

    # config moved -> full sweep
    third = lake.span_dedup_report(min_df=3, incremental=True)
    assert "fresh" not in third["da"]

    # corpus mutated -> sidecar re-materializes -> full sweep
    spark.createDataFrame(
        [(11, f"yet another page. {boiler}")],
        ["doc_id", "text"],
    ).write.mode("append").parquet(os.path.join(root, "db"))
    fourth = lake.span_dedup_report(**kw)
    assert "fresh" not in fourth["db"]
    assert fourth["db"]["sidecar"] == "materialized"
    assert fourth["_lake"]["n_spans"] >= first["_lake"]["n_spans"]


def test_datalake_prep_sweep_spans_sidecar(spark, tmp_path):
    # round 9: the spans kind — the engine's most expensive hashing
    # pass — serves the prep sweep's span_dedup stage; output equals
    # the inline sweep
    root = str(tmp_path / "prepspan")
    dest = str(tmp_path / "prepspan_out")
    lake = Datalake(spark, root)
    boiler = ("this exact legal boilerplate paragraph appears at the "
              "bottom of every single crawl dump page")
    spark.createDataFrame(
        [(1, f"original words of document one here. {boiler}"),
         (2, f"totally different original content two. {boiler}")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "da"))
    lake.add_dataset("da")

    kw = dict(min_quality=0, near_dup=False, span_dedup=True,
              span_min_df=2)
    inline = lake.prep_sweep(dest + "_inline", **kw)
    served = lake.prep_sweep(dest, signatures=("spans",), **kw)
    assert served["da"]["sidecars"] == {"spans": "materialized"}
    a = {r["doc_id"]: r["text"] for r in
         spark.read.parquet(served["da"]["dest"]).collect()}
    b = {r["doc_id"]: r["text"] for r in
         spark.read.parquet(inline["da"]["dest"]).collect()}
    assert a == b
    assert all(boiler not in t or True for t in a.values())
    # the boilerplate was actually cut from at least one doc
    assert sum(boiler in t for t in a.values()) < 2

    again = lake.prep_sweep(dest, signatures=("spans",), **kw)
    assert again["da"]["sidecars"] == {"spans": "reused"}


def test_datalake_prep_sweep_stage_counts(spark, tmp_path):
    # round 9: the lake-wide "where did my corpus go" diagnostic —
    # per-stage survivor counts ride the summary, consistent with the
    # final n_out
    root = str(tmp_path / "prepstages")
    dest = str(tmp_path / "prepstages_out")
    lake = Datalake(spark, root)
    leak = "the quick brown fox jumps over the lazy benchmark dog"
    spark.createDataFrame(
        [(1, f"plenty of ordinary words and then {leak} at the end"),
         (2, "a perfectly ordinary document with enough real words here"),
         (2, "a perfectly ordinary document with enough real words here"),
         (3, "!!!")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "da"))
    lake.add_dataset("da")
    bench = spark.createDataFrame([(0, leak)], ["doc_id", "text"])

    res = lake.prep_sweep(dest, benchmark=bench, min_quality=1,
                          near_dup=False, stage_counts=True)
    st = res["da"]["stages"]
    assert st["input"] == 4
    assert st["exact_dedup"] == 3      # dup doc 2 collapsed
    assert st["decontaminate"] == 2    # leak doc gone
    assert st["quality"] == 1          # "!!!" gated
    assert res["da"]["n_in"] == 4 and res["da"]["n_out"] == 1
    # counts are monotone non-increasing through the funnel
    vals = list(st.values())
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_datalake_prep_sweep_sign_outputs(spark, tmp_path):
    # round 9: the cleaned copies get their own signature sidecars at
    # creation — a Datalake over the training copies starts every
    # sweep sidecar-served; incremental keeps + signs as needed
    from pydala_spark.dataset.maintain import read_signatures

    root = str(tmp_path / "prepsign2")
    dest = str(tmp_path / "prepsign2_out")
    lake = Datalake(spark, root)
    spark.createDataFrame(
        [(1, "a perfectly ordinary document with enough real words"),
         (2, "another clean corpus document with plain readable text")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "da"))
    lake.add_dataset("da")

    kw = dict(min_quality=0, near_dup=False, incremental=True)
    first = lake.prep_sweep(dest, sign_outputs=("minhash",), **kw)
    assert first["da"]["signed"] == ["minhash"]
    # the sidecar verifies against the CLEANED copy
    cleaned = spark.read.parquet(first["da"]["dest"])
    sigs, params = read_signatures(
        spark, first["da"]["dest"], "minhash", verify_against=cleaned)
    assert sigs.count() == cleaned.count()

    # a cleaned-copies lake is sidecar-served from the start
    lake2 = Datalake(spark, dest)
    lake2.add_dataset("da")
    nd = lake2.neardup_dedup()
    assert nd["da"]["sidecar"] == "reused"

    # fresh skip keeps the copy; a NEW signing request signs it
    # without re-cleaning
    second = lake.prep_sweep(dest, sign_outputs=("minhash", "spans"),
                             **kw)
    assert second["da"]["fresh"].startswith("unchanged")
    assert second["da"]["signed"] == ["minhash", "spans"]
    read_signatures(spark, second["da"]["dest"], "spans",
                    verify_against=cleaned)

    # unknown sign kind fails up front (cells never sign here — they
    # belong to a semantic_dedup sweep over the cleaned lake)
    with pytest.raises(ValueError, match="unknown sign_outputs"):
        lake.prep_sweep(dest, sign_outputs=("embedding_cells",))


def test_datalake_prep_sweep_semantic_codebook(spark, tmp_path):
    # round 9: lake-wide SemDeDup cleaning — the semantic stage's
    # codebook loads from the pinned save_codebook path (real
    # dimensions don't belong in TOML), and embedding_cells sidecars
    # (sha-pinned to it) serve the assignment
    import numpy as np

    from pydala_spark.operators.ann import save_codebook

    root = str(tmp_path / "prepsem")
    dest = str(tmp_path / "prepsem_out")
    lake = Datalake(spark, root)
    rng = np.random.default_rng(13)
    v = [float(x) for x in rng.normal(size=4)]
    spark.createDataFrame(
        [(1, "first document with its own textual content entirely", v),
         (2, "a paraphrase sharing no words with document number one",
          [x + 1e-5 for x in v]),
         (3, "third document about an unrelated topic and vector",
          [float(x) for x in rng.normal(size=4) + 6])],
        "doc_id long, text string, embedding array<double>",
    ).write.parquet(os.path.join(root, "da"))
    lake.add_dataset("da")
    cb = np.stack([np.asarray(v) / np.linalg.norm(v),
                   (rng.normal(size=4) + 6)
                   / np.linalg.norm(rng.normal(size=4) + 6)])
    cb_path = str(tmp_path / "cb.json")
    save_codebook(spark, cb, cb_path)

    # a TEXT-ONLY dataset must SKIP an embedding-reading config with a
    # reason, not error the cron every night (round-9 review find)
    spark.createDataFrame(
        [(50, "a dataset that has text but carries no embeddings")],
        ["doc_id", "text"],
    ).write.parquet(os.path.join(root, "textonly"))
    lake.add_dataset("textonly")

    kw = dict(min_quality=0, near_dup=False, semantic_dedup=True,
              vec_col="embedding", semantic_threshold=0.999)
    res = lake.prep_sweep(dest, codebook_path=cb_path,
                          signatures=("embedding_cells",), **kw)
    assert res["da"]["sidecars"] == {"embedding_cells": "materialized"}
    assert res["textonly"]["skipped"].startswith("no (embedding)")
    kept = {r["doc_id"] for r in
            spark.read.parquet(res["da"]["dest"]).collect()}
    assert kept == {1, 3}  # the embedding paraphrase collapsed

    again = lake.prep_sweep(dest, codebook_path=cb_path,
                            signatures=("embedding_cells",), **kw)
    assert again["da"]["sidecars"] == {"embedding_cells": "reused"}

    # cells without a codebook refuse; cells without vec_col refuse
    with pytest.raises(ValueError, match="requires codebook_path"):
        lake.prep_sweep(dest, signatures=("embedding_cells",), **kw)
    with pytest.raises(ValueError, match="requires the vec_col"):
        lake.prep_sweep(dest, codebook_path=cb_path,
                        signatures=("embedding_cells",), min_quality=0,
                        near_dup=False, semantic_dedup=True,
                        semantic_threshold=0.999, vec_col=None)
    with pytest.raises(ValueError, match="unknown sign_outputs"):
        lake.prep_sweep(dest, sign_outputs=("embedding_cells",))

    # round 10: a per-dataset override may SWAP the codebook — the
    # cells sidecar pins to the EFFECTIVE codebook's sha, so the
    # overridden dataset re-materializes (then reuses) cells under its
    # own codebook instead of sha-refusing every night
    cb2 = np.stack([cb[1], cb[0]])  # different identity, same geometry
    ov = {"da": {"semantic_centroids": cb2}}
    r_ov = lake.prep_sweep(dest, codebook_path=cb_path,
                           signatures=("embedding_cells",),
                           overrides=ov, **kw)
    assert r_ov["da"]["sidecars"] == {"embedding_cells": "materialized"}
    assert r_ov["da"]["config"]["semantic_centroids"].startswith(
        "codebook:")
    r_ov2 = lake.prep_sweep(dest, codebook_path=cb_path,
                            signatures=("embedding_cells",),
                            overrides=ov, **kw)
    assert r_ov2["da"]["sidecars"] == {"embedding_cells": "reused"}

    # ...an override that turns the semantic stage OFF but KEEPS
    # vec_col still materializes the cells sidecar (ADVICE r10: an
    # explicit signatures request with vec_col available is the
    # "produce cells for a later semantic_dedup sweep" shape) — the
    # cells just aren't consumed tonight, so no semantic drop
    r_off = lake.prep_sweep(
        dest, codebook_path=cb_path, signatures=("embedding_cells",),
        overrides={"da": {"semantic_dedup": False}}, **{
            k: v for k, v in kw.items() if k != "semantic_dedup"},
        semantic_dedup=True,
    )
    assert r_off["da"]["sidecars"] == {"embedding_cells": "materialized"}
    assert r_off["da"]["n_out"] == 3  # no semantic drop for da

    # ...whereas an override that REMOVES vec_col (a text-only config
    # for this dataset) skips the sidecar with a reason instead of
    # erroring nightly
    r_novec = lake.prep_sweep(
        dest, codebook_path=cb_path, signatures=("embedding_cells",),
        overrides={"da": {"semantic_dedup": False, "vec_col": None}},
        **{k: v for k, v in kw.items()
           if k not in ("semantic_dedup", "vec_col")},
        semantic_dedup=True, vec_col="embedding",
    )
    assert r_novec["da"]["sidecars"]["embedding_cells"].startswith(
        "skipped (no vec_col")
    assert r_novec["da"]["n_out"] == 3
