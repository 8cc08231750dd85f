import numpy as np
import pytest
from pyspark.sql import functions as F

from pydala_spark.operators.ann import ivf_topk, kmeans_centroids
from pydala_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def clustered(spark):
    """3 well-separated clusters in 8d."""
    rng = np.random.default_rng(0)
    centers = np.eye(3, 8) * 10
    rows = []
    for i in range(300):
        c = i % 3
        v = centers[c] + rng.normal(0, 0.5, 8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_centroids_deterministic(clustered):
    c1 = kmeans_centroids(clustered, n_centroids=3, seed=11)
    c2 = kmeans_centroids(clustered, n_centroids=3, seed=11)
    assert np.allclose(c1, c2)
    assert c1.shape == (3, 8)
    # unit norm (spherical k-means)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ivf_recall_on_separated_clusters(clustered):
    probes = clustered.where(F.col("vec_id") < 6)
    exact = cosine_topk(clustered, probes, k=5)
    approx = ivf_topk(clustered, probes, k=5, n_centroids=3, n_probe_centroids=1)
    exact_set = {(r["probe_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_set = {(r["probe_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9  # clean clusters: nearest cell has the neighbors


def test_ivf_full_probe_equals_bruteforce(clustered):
    probes = clustered.where(F.col("vec_id") < 3)
    exact = cosine_topk(clustered, probes, k=3)
    approx = ivf_topk(clustered, probes, k=3, n_centroids=4, n_probe_centroids=4)
    assert {(r["probe_id"], r["neighbor_id"], r["rnk"]) for r in exact.collect()} == {
        (r["probe_id"], r["neighbor_id"], r["rnk"]) for r in approx.collect()
    }


def test_codebook_roundtrip_and_reuse(clustered, spark, tmp_path):
    from pydala_spark.operators.ann import (
        ivf_topk,
        kmeans_centroids,
        load_codebook,
        save_codebook,
    )

    cb = kmeans_centroids(clustered, "embedding", n_centroids=4, seed=7)
    path = str(tmp_path / "codebook.json")
    save_codebook(spark, cb, path)
    cb2 = load_codebook(spark, path)
    assert (cb == cb2).all()
    probes = clustered.where(F.col("vec_id") < 3)
    a = ivf_topk(clustered, probes, k=3, centroids=cb)
    b = ivf_topk(clustered, probes, k=3, centroids=cb2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmeans_short_spread_sample_beats_prefix_bias(spark):
    # r4 review: a mid-size domain-sorted corpus (filtered spread sample
    # comes back short; unfiltered bounded scan would see only the first
    # domain) must still train on rows spanning the WHOLE corpus — the
    # short-but-uniform filtered sample wins over the file-order prefix
    import numpy as np

    from pydala_spark.operators.ann import kmeans_centroids

    n_half = 6400
    # unique vectors (the spread filter hashes the vector VALUE; exact
    # duplicates pass or fail together, which real embeddings never hit)
    rows = [([1.0, i * 1e-6, 0.0],) for i in range(n_half)] + [
        ([i * 1e-6, 1.0, 0.0],) for i in range(n_half)
    ]
    df = spark.createDataFrame(rows, "embedding array<double>").coalesce(1)
    # sample_size=1600: unfiltered limit sees 3200 rows = first domain
    # only; spread=16 keeps ~800 uniform rows (short, but >= the 64-row
    # floor) spanning both domains
    cents = kmeans_centroids(
        df, n_centroids=2, sample_size=1600, spread=16, iterations=4
    )
    # with the fix, one centroid lands near each domain axis
    axes = {int(np.argmax(np.abs(c))) for c in cents}
    assert axes == {0, 1}, f"centroids collapsed to one domain: {cents}"


def test_pq_recall_on_separated_clusters(clustered):
    from pydala_spark.operators.ann import pq_codebooks, pq_topk

    books = pq_codebooks(clustered, m=4, n_codes=8, seed=7)
    assert books.shape == (4, 8, 2)
    probes = clustered.where(F.col("vec_id") < 6)
    approx = pq_topk(clustered, probes, books, k=5)
    rows = approx.collect()
    assert len(rows) == 6 * 5
    # PQ quantizes same-cluster members onto the same few codewords, so
    # exact-rank overlap is meaningless (scores tie); the property that
    # matters is that the quantized score still separates clusters:
    # every retrieved neighbor shares the probe's cluster
    for r in rows:
        assert r["probe_id"] % 3 == r["neighbor_id"] % 3


def test_pq_encode_deterministic_and_precomputed_codes(clustered):
    from pydala_spark.operators.ann import pq_codebooks, pq_encode, pq_topk

    books = pq_codebooks(clustered, m=4, n_codes=8, seed=7)
    c1 = {r["id"]: r["codes"] for r in pq_encode(clustered, books).collect()}
    c2 = {r["id"]: r["codes"] for r in pq_encode(clustered, books).collect()}
    assert c1 == c2
    assert all(len(v) == 4 and all(0 <= x < 8 for x in v) for v in c1.values())
    # the 100 TB path: search a pre-encoded (id, codes) dataset — must
    # give identical results to encoding on the fly
    probes = clustered.where(F.col("vec_id") < 3)
    on_fly = pq_topk(clustered, probes, books, k=3)
    pre = pq_encode(clustered, books).withColumnRenamed("id", "vec_id")
    stored = pq_topk(pre, probes, books, k=3, codes_col="codes")
    assert sorted(map(tuple, on_fly.collect())) == sorted(map(tuple, stored.collect()))


def test_pq_codebooks_rejects_bad_split(clustered):
    from pydala_spark.operators.ann import pq_codebooks

    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(clustered, m=3)


def test_semantic_dedup_drops_in_cell_twins(spark):
    from pydala_spark.operators.similarity import semantic_dedup

    # two tight clusters; within each, ids are near-identical vectors —
    # only the smallest id per similar group survives; a lone outlier in
    # its own cell is always kept
    rows = []
    for i in range(5):
        rows.append((i, [10.0 + 0.001 * i, 0.0, 0.0, 0.0]))
    for i in range(5, 10):
        rows.append((i, [0.0, 10.0 + 0.001 * i, 0.0, 0.0]))
    rows.append((10, [0.0, 0.0, 10.0, 0.0]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]]
    out = {r["id"]: (r["cell"], r["kept"]) for r in
           semantic_dedup(df, cents, threshold=0.9).collect()}
    assert len(out) == 11
    kept = {i for i, (_, k) in out.items() if k}
    assert kept == {0, 5, 10}  # smallest id per cluster + the singleton
    assert out[0][0] == 0 and out[5][0] == 1 and out[10][0] == 2


def test_semantic_dedup_threshold_is_respected(spark):
    from pydala_spark.operators.similarity import semantic_dedup

    # same cell, but orthogonal-ish vectors: nothing is similar enough
    df = spark.createDataFrame(
        [(0, [10.0, 1.0, 0.0, 0.0]), (1, [10.0, -1.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    cents = [[1.0, 0, 0, 0]]
    out = semantic_dedup(df, cents, threshold=0.999)
    assert all(r["kept"] for r in out.collect())


def test_ivf_pq_topk_and_prebuilt_index(clustered):
    from pydala_spark.operators.ann import (
        ivf_pq_encode,
        ivf_pq_topk,
        kmeans_centroids,
        pq_codebooks,
    )

    cents = kmeans_centroids(clustered, n_centroids=3, seed=11)
    books = pq_codebooks(clustered, m=4, n_codes=8, seed=7)
    probes = clustered.where(F.col("vec_id") < 6)
    out = ivf_pq_topk(clustered, probes, cents, books, k=5, n_probe_centroids=1)
    rows = out.collect()
    assert len(rows) == 6 * 5
    # separated clusters: IVF restricts candidates to the probe's cell
    # and PQ scores keep them in-cluster
    for r in rows:
        assert r["probe_id"] % 3 == r["neighbor_id"] % 3
    # the 100 TB path: search the persisted (id, cell, codes) index —
    # identical results to on-the-fly assignment
    idx = ivf_pq_encode(clustered, cents, books)
    assert set(idx.columns) == {"id", "cell", "codes"}
    stored = ivf_pq_topk(
        idx, probes, cents, books, k=5, n_probe_centroids=1, encoded=True
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, stored.collect()))
    # r4 review: a renamed index id column is honored via id_col, like
    # pq_topk's codes_col contract
    renamed = idx.withColumnRenamed("id", "vec_id")
    stored2 = ivf_pq_topk(
        renamed, probes, cents, books, k=5, n_probe_centroids=1, encoded=True
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, stored2.collect()))


def test_persisted_ivfpq_index_roundtrip_and_partition_pruning(spark, tmp_path):
    # r4: the deployable index — save (cell-partitioned parquet +
    # codebook sidecars), load in a "fresh" context, search. The search
    # must (a) equal the direct in-memory computation and (b) read the
    # index through dynamic partition pruning, so only probed cells'
    # files are scanned at 100 TB.
    from pydala_spark.operators.ann import (
        ivf_pq_topk,
        kmeans_centroids,
        pq_codebooks,
        save_ivfpq_index,
        search_ivfpq_index,
    )

    rows = [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5]) for i in range(120)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    books = pq_codebooks(df, m=2, n_codes=4, seed=1)
    out = str(tmp_path / "ivfpq_idx")
    save_ivfpq_index(spark, df, out, cents, books)
    probes = df.where(F.col("vec_id") < 3)
    res = search_ivfpq_index(spark, out, probes, k=5, n_probe_centroids=1)
    direct = ivf_pq_topk(df, probes, cents, books, k=5, n_probe_centroids=1)
    assert sorted(map(tuple, res.collect())) == sorted(map(tuple, direct.collect()))
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()  # probe cells prune the scan


def test_semantic_dedup_score_based_survivor(spark):
    # r4: with score_col, the best-scored member of a similar group
    # survives (ties -> smaller id), not the lowest id
    from pydala_spark.operators.similarity import semantic_dedup

    rows = [
        (0, [10.0, 0.0], 0.1),
        (1, [10.001, 0.0], 0.9),  # best quality of the near-dup group
        (2, [10.002, 0.0], 0.9),  # ties with 1 -> 1 wins
        (3, [0.0, 10.0], 0.5),    # different cell, always kept
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "quality"])
    cents = [[1.0, 0.0], [0.0, 1.0]]
    out = {r["id"]: r["kept"] for r in semantic_dedup(
        df, cents, threshold=0.99, score_col="quality").collect()}
    assert out == {0: False, 1: True, 2: False, 3: True}
    # default stays lowest-id
    out2 = {r["id"]: r["kept"] for r in semantic_dedup(
        df, cents, threshold=0.99).collect()}
    assert out2 == {0: True, 1: False, 2: False, 3: True}


def test_semantic_dedup_null_scores_fall_back_to_id(spark):
    # r4 review: NULL scores rank as -inf — a scored doc beats an
    # unscored near-dup, two NULLs fall back to smallest id (the NULL
    # comparison must not silently keep both duplicates)
    from pydala_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [
            (0, [10.0, 0.0], None),   # unscored loses to scored 1
            (1, [10.001, 0.0], 0.4),
            (5, [0.0, 10.0], None),   # two NULLs: smaller id wins
            (6, [0.0, 10.001], None),
        ],
        "vec_id long, embedding array<double>, quality double",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    out = {r["id"]: r["kept"] for r in semantic_dedup(
        df, cents, threshold=0.99, score_col="quality").collect()}
    assert out == {0: False, 1: True, 5: True, 6: False}


def test_residual_ivfpq_recall_beats_raw(spark, sf_dir):
    # round 5 (the actual Jégou IVFADC): at equal (m, n_codes) budget,
    # anchor-residual codes rank candidates measurably better than raw
    # codes. All cells probed so the comparison isolates SCORING quality
    # from cell pruning. Fully deterministic: pinned fixtures + fixed
    # testdata (measured 0.267 vs 0.193 recall@10 at sf0.001).
    import numpy as np

    from pydala_spark.operators.ann import ivf_pq_topk
    from pydala_spark.operators.similarity import cosine_topk, topk_recall
    from pydala_spark.queries.ext import (
        _ivf_centroids,
        _pq_books,
        _pq_res_anchors,
        _pq_res_books,
    )
    from pydala_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 30)
    exact = cosine_topk(emb, probes, id_col="vec_id", vec_col="embedding", k=10)
    cents = np.array(_ivf_centroids(), dtype=np.float64)

    def mean_recall(books, residual, anchors=None):
        appx = ivf_pq_topk(
            emb, probes, cents, np.array(books, dtype=np.float64),
            k=10, n_probe_centroids=len(cents), residual=residual,
            anchors=None if anchors is None
            else np.array(anchors, dtype=np.float64),
        )
        return topk_recall(appx, exact).agg(F.avg("recall")).first()[0]

    raw = mean_recall(_pq_books(), residual=False)
    res = mean_recall(_pq_res_books(), residual=True, anchors=_pq_res_anchors())
    assert res > raw


def test_train_residual_pq_and_anchor_index_roundtrip(spark, tmp_path):
    # round 5: train_residual_pq learns cell-mean anchors + residual
    # books; the saved index stores them in the sidecar, so a fresh
    # session's search scores with exactly the encode-time math
    import numpy as np

    from pydala_spark.operators.ann import (
        ivf_pq_topk,
        kmeans_centroids,
        load_ivfpq_index,
        save_ivfpq_index,
        search_ivfpq_index,
        train_residual_pq,
    )

    rows = [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5]) for i in range(120)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(df, cents, m=2, n_codes=4, seed=1)
    assert anchors.shape == cents.shape and books.shape == (2, 4, 2)
    # anchors are cell means of unit vectors — inside the unit ball
    assert (np.linalg.norm(anchors, axis=1) <= 1.0 + 1e-9).all()
    out = str(tmp_path / "ivfpq_res_idx")
    save_ivfpq_index(spark, df, out, cents, books, anchors=anchors)
    _, _, books2, residual2, anchors2, _rot2 = load_ivfpq_index(spark, out)
    assert residual2 is True
    assert np.allclose(anchors2, anchors) and np.allclose(books2, books)
    probes = df.where(F.col("vec_id") < 3)
    res = search_ivfpq_index(spark, out, probes, k=5, n_probe_centroids=1)
    direct = ivf_pq_topk(
        df, probes, cents, books, k=5, n_probe_centroids=1,
        residual=True, anchors=anchors,
    )
    assert sorted(map(tuple, res.collect())) == sorted(map(tuple, direct.collect()))


def test_pre_round5_index_sidecar_loads_as_raw(spark, tmp_path):
    # a round-4 index (sidecar without residual/anchors keys) must load
    # with residual=False so search uses the raw-code math it was built with
    import json

    import numpy as np

    from pydala_spark.operators.ann import (
        PQ_CODEBOOK_SIDECAR,
        kmeans_centroids,
        load_ivfpq_index,
        pq_codebooks,
        save_ivfpq_index,
    )

    rows = [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    books = pq_codebooks(df, m=2, n_codes=4, seed=1)
    out = str(tmp_path / "old_idx")
    save_ivfpq_index(spark, df, out, cents, books, residual=False)
    # simulate the round-4 sidecar: strip the new keys entirely
    sidecar = f"{out}/{PQ_CODEBOOK_SIDECAR}"
    with open(sidecar) as f:
        meta = json.load(f)
    with open(sidecar, "w") as f:
        json.dump({"centroids": meta["centroids"]}, f)
    import os

    # the direct rewrite bypassed Hadoop's checksummed FS — drop the
    # stale .crc so the read-back doesn't fail on it
    crc = f"{out}/.{PQ_CODEBOOK_SIDECAR}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _, _, books2, residual, anchors, _rot = load_ivfpq_index(spark, out)
    assert residual is False and anchors is None
    assert np.allclose(books2, books)


def test_save_ivfpq_append_rejects_mixed_encoding(spark, tmp_path):
    # r5 review: appending residual codes onto a raw-coded index (or
    # vice versa) must fail loud — mixed encodings score half the index
    # with the wrong math
    from pydala_spark.operators.ann import (
        kmeans_centroids,
        pq_codebooks,
        save_ivfpq_index,
    )

    rows = [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    books = pq_codebooks(df, m=2, n_codes=4, seed=1)
    out = str(tmp_path / "mixed_idx")
    save_ivfpq_index(spark, df, out, cents, books, residual=False)
    with pytest.raises(ValueError, match="residual=False"):
        save_ivfpq_index(spark, df, out, cents, books,
                         mode="append", residual=True)
    # matching flag appends fine
    save_ivfpq_index(spark, df, out, cents, books,
                     mode="append", residual=False)


def test_semantic_decontamination(spark):
    # round 5: embedding-space benchmark decontamination — corpus rows
    # within cosine threshold of ANY benchmark vector are flagged; the
    # semi join is broadcast (no shuffle of the corpus)
    from pydala_spark.operators.similarity import (
        semantic_contamination,
        semantic_decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.99, 0.1, 0.0]),   # near bench 100 -> contaminated
            (2, [0.1, 5.0, 0.1]),    # near bench 101 -> contaminated
            (3, [0.0, 0.0, 7.0]),    # orthogonal -> clean
        ],
        ["vec_id", "embedding"],
    )
    hits = {r["id"] for r in
            semantic_contamination(corpus, bench, threshold=0.9).collect()}
    assert hits == {1, 2}
    kept = {r["vec_id"] for r in
            semantic_decontaminate(corpus, bench, threshold=0.9).collect()}
    assert kept == {3}
    plan = semantic_contamination(corpus, bench, threshold=0.9)\
        ._jdf.queryExecution().executedPlan().toString()
    # broadcast semi join: the benchmark broadcasts, the corpus is never
    # hash-shuffled (BroadcastExchange is expected; a shuffle is not)
    assert "hashpartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_semantic_contamination_lsh_blocked(spark):
    # round 6: block_bits turns the broadcast nested-loop into a
    # broadcast HASH join on an LSH bucket key — measurably fewer
    # cosine comparisons at a pinned (md5-deterministic) recall vs the
    # exact BNL path on a planted contaminated set
    import hashlib

    from pydala_spark.operators.similarity import (
        lsh_bucket,
        semantic_contamination,
    )

    DIM = 16

    def vec(seed):
        h = (
            hashlib.md5(f"v|{seed}".encode()).digest()
            + hashlib.md5(f"w|{seed}".encode()).digest()
        )
        return [(b - 127.5) / 127.5 for b in h[:DIM]]

    def perturb(v, seed):
        h = hashlib.md5(f"p|{seed}".encode()).digest() * 2
        d = [(b - 127.5) / 127.5 for b in h[:DIM]]
        return [a + 0.15 * x for a, x in zip(v, d)]

    N, B = 200, 20
    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(N)], ["vec_id", "embedding"]
    )
    bench = spark.createDataFrame(
        [(1000 + i, perturb(vec(i), i)) for i in range(B)],
        ["vec_id", "embedding"],
    )
    bnl = {
        r["id"]
        for r in semantic_contamination(corpus, bench, threshold=0.9).collect()
    }
    assert len(bnl) >= 15  # the planted contamination is found
    blocked_df = semantic_contamination(
        corpus, bench, threshold=0.9, block_bits=4, dim=DIM, n_probes=4
    )
    blocked = {r["id"] for r in blocked_df.collect()}
    # blocking only removes candidates, never invents hits
    assert blocked <= bnl
    # pinned recall at this (deterministic) hyperplane family
    assert len(blocked) / len(bnl) >= 0.9

    # measurably fewer comparisons: same-bucket pair count < half the
    # full cross size the BNL path evaluates
    c = corpus.select(lsh_bucket(F.col("embedding"), DIM, 4).alias("b"))
    bb = bench.withColumn("b", lsh_bucket(F.col("embedding"), DIM, 4))
    flips = F.array(
        F.col("b"), *[F.col("b").bitwiseXOR(F.lit(2**p)) for p in range(4)]
    )
    bb = bb.withColumn("b", F.explode(F.slice(flips, 1, 4)))
    comps = c.join(bb.select("b"), "b").count()
    assert comps < (N * B) / 2

    # the blocked plan is a broadcast HASH join (bucket lookup), not a
    # nested loop, and the corpus side is never shuffled
    plan = blocked_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning" not in plan

    with pytest.raises(ValueError, match="dim"):
        semantic_contamination(corpus, bench, block_bits=4)
    with pytest.raises(ValueError, match="n_probes"):
        semantic_contamination(
            corpus, bench, block_bits=2, dim=DIM, n_probes=9
        )


def test_save_ivfpq_append_rejects_different_books(spark, tmp_path):
    # r5 review follow-up: the residual flag alone is not enough — an
    # append with retrained books/centroids would silently re-key every
    # existing row when the sidecars rewrite
    from pydala_spark.operators.ann import (
        kmeans_centroids,
        pq_codebooks,
        save_ivfpq_index,
    )

    rows = [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    books = pq_codebooks(df, m=2, n_codes=4, seed=1)
    out = str(tmp_path / "rekey_idx")
    save_ivfpq_index(spark, df, out, cents, books, residual=False)
    books2 = pq_codebooks(df, m=2, n_codes=4, seed=2)  # retrained
    with pytest.raises(ValueError, match="different PQ codebooks"):
        save_ivfpq_index(spark, df, out, cents, books2,
                         mode="append", residual=False)
    cents2 = kmeans_centroids(df, n_centroids=3, seed=9)
    with pytest.raises(ValueError, match="different IVF codebook"):
        save_ivfpq_index(spark, df, out, cents2, books,
                         mode="append", residual=False)

def test_index_stats_health_report(spark, tmp_path):
    # round 6: the ops health check over a persisted IVFADC index —
    # cell balance, empty centroids, and the sidecar's encoding facts
    from pydala_spark.operators.ann import (
        index_stats,
        kmeans_centroids,
        pq_codebooks,
        save_ivfpq_index,
        train_residual_pq,
    )

    rows = [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5])
            for i in range(90)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(df, cents, m=2, n_codes=4, seed=1)
    out = str(tmp_path / "health_idx")
    save_ivfpq_index(spark, df, out, cents, books, anchors=anchors)
    st = index_stats(spark, out)
    assert st["n_vectors"] == 90
    assert st["n_cells"] == 3
    assert 0 <= st["empty_cells"] < 3
    assert st["min_cell"] >= 1 and st["max_cell"] <= 90
    assert st["imbalance"] >= 1.0
    # round-7 advice: avg_cell divides by ALL centroids (empty cells
    # are skew), avg_occupied_cell by occupied ones only
    assert st["avg_cell"] == 90 / st["n_cells"]
    occupied = st["n_cells"] - st["empty_cells"]
    assert st["avg_occupied_cell"] == 90 / occupied
    assert st["imbalance"] == st["max_cell"] / st["avg_cell"]
    assert st["residual"] is True
    assert st["dim"] == 4 and st["m"] == 2

def test_lsh_topk_n_probes_actually_limits_buckets(spark):
    # round-6 regression pin: the explode_cheaply conversion once
    # dropped the slice(flips, 1, n_probes), silently probing ALL
    # bits+1 buckets — n_probes settings must produce different
    # candidate sets
    import hashlib

    from pydala_spark.operators.similarity import lsh_topk

    DIM = 8

    def vec(seed):
        h = hashlib.md5(f"l|{seed}".encode()).digest()
        return [(b - 127.5) / 127.5 for b in h[:DIM]]

    corpus = spark.createDataFrame(
        [(i, vec(i)) for i in range(120)], ["vec_id", "embedding"]
    )
    probes = corpus.where(F.col("vec_id") < 8)
    res = {}
    for np_ in (1, 2, 5):
        res[np_] = {
            (r["probe_id"], r["neighbor_id"])
            for r in lsh_topk(
                corpus, probes, DIM, k=10, bits=4, n_probes=np_
            ).collect()
        }
    # monotone recall AND strictly growing candidate exposure: if the
    # slice were dead, all three sets would be identical
    assert res[1] != res[5]
    assert len(res[1] & res[5]) > 0
    assert res[2] != res[5] or res[1] != res[2]


def test_opq_rotation_improves_recall_in_distribution(spark, sf_dir):
    # round 8 (Ge et al. 2013 OPQ): at equal (m, n_codes) budget, the
    # alternating-minimization rotation reconstructs the residuals it
    # was trained on measurably better — recall@10 beats the unrotated
    # residual books when both train on the corpus being indexed (the
    # production usage; fully deterministic, all seeded)
    import numpy as np

    from pydala_spark.operators.ann import (
        ivf_pq_topk,
        train_residual_opq,
        train_residual_pq,
    )
    from pydala_spark.operators.similarity import cosine_topk, topk_recall
    from pydala_spark.queries.ext import _ivf_centroids
    from pydala_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 30)
    exact = cosine_topk(emb, probes, id_col="vec_id", vec_col="embedding", k=10)
    cents = np.array(_ivf_centroids(), dtype=np.float64)

    def mean_recall(books, anchors, rotation=None):
        appx = ivf_pq_topk(
            emb, probes, cents, books, k=10,
            n_probe_centroids=len(cents), residual=True,
            anchors=anchors, rotation=rotation,
        )
        return topk_recall(appx, exact).agg(F.avg("recall")).first()[0]

    r_anch, r_books = train_residual_pq(emb, cents)
    o_anch, o_books, o_rot = train_residual_opq(emb, cents)
    assert np.allclose(r_anch, o_anch)  # same anchors, different books
    # the rotation is orthogonal
    assert np.allclose(o_rot @ o_rot.T, np.eye(o_rot.shape[0]), atol=1e-9)
    base = mean_recall(r_books, r_anch)
    opq = mean_recall(o_books, o_anch, o_rot)
    assert opq > base, (opq, base)


def test_opq_rotation_rides_index_sidecar(spark, tmp_path):
    # the rotation persists with the index and search uses it; appends
    # under a different rotation fail loud; pre-round-8 sidecars load
    # with rotation=None
    import numpy as np
    import pytest

    from pydala_spark.operators.ann import (
        ivf_pq_topk,
        kmeans_centroids,
        load_ivfpq_index,
        save_ivfpq_index,
        search_ivfpq_index,
        train_residual_opq,
    )

    rows = [
        (i, [float((i % 3) + 1), float(i % 5), float(i % 7), 0.5])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    anchors, books, rot = train_residual_opq(
        df, cents, m=2, n_codes=4, seed=1, opq_iterations=4
    )
    out = str(tmp_path / "opq_idx")
    save_ivfpq_index(
        spark, df, out, cents, books, anchors=anchors, rotation=rot
    )
    _, _, books2, residual2, anchors2, rot2 = load_ivfpq_index(spark, out)
    assert residual2 is True and np.allclose(rot2, rot)
    probes = df.where(F.col("vec_id") < 3)
    via_index = search_ivfpq_index(spark, out, probes, k=5,
                                   n_probe_centroids=1)
    direct = ivf_pq_topk(
        df, probes, cents, books, k=5, n_probe_centroids=1,
        residual=True, anchors=anchors, rotation=rot,
    )
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # append under a DIFFERENT rotation (or none) fails loud
    with pytest.raises(ValueError, match="rotation"):
        save_ivfpq_index(
            spark, df, out, cents, books, anchors=anchors,
            rotation=np.eye(rot.shape[0]), mode="append",
        )
    with pytest.raises(ValueError, match="rotation"):
        save_ivfpq_index(
            spark, df, out, cents, books, anchors=anchors, mode="append"
        )
    # matching rotation appends fine
    save_ivfpq_index(
        spark, df, out, cents, books, anchors=anchors, rotation=rot,
        mode="append",
    )


def test_ivfpq_rerank_improves_recall_and_pins_exactness(spark, sf_dir):
    # round 9 (IVFADC+R, Jégou et al. 2011 §III.D): exact re-ranking of
    # the top-C PQ candidates lifts recall@10 over the PQ-only ranking,
    # and with the pool covering the whole corpus (all cells probed,
    # C = corpus size) the result IS brute-force cosine — identical
    # doubles, identical tie-breaks
    import numpy as np

    from pydala_spark.operators.ann import ivf_pq_topk
    from pydala_spark.operators.similarity import cosine_topk, topk_recall
    from pydala_spark.queries.ext import (
        _ivf_centroids,
        _pq_res_anchors,
        _pq_res_books,
    )
    from pydala_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 20)
    exact = cosine_topk(emb, probes, id_col="vec_id",
                        vec_col="embedding", k=10)
    cents = np.array(_ivf_centroids(), dtype=np.float64)
    books = np.array(_pq_res_books(), dtype=np.float64)
    anch = np.array(_pq_res_anchors(), dtype=np.float64)

    def mean_recall(**kw):
        appx = ivf_pq_topk(
            emb, probes, cents, books, k=10,
            n_probe_centroids=len(cents), residual=True, anchors=anch,
            **kw,
        )
        return topk_recall(appx, exact).agg(F.avg("recall")).first()[0]

    base = mean_recall()
    rr = mean_recall(rerank_top=50)
    assert rr > base  # the standard public fix actually lifts recall
    assert rr >= 0.6  # and by a production-meaningful margin

    # pool == everything -> bit-identical to brute force
    n = emb.count()
    full = ivf_pq_topk(
        emb, probes, cents, books, k=10,
        n_probe_centroids=len(cents), residual=True, anchors=anch,
        rerank_top=int(n),
    )
    assert sorted(map(tuple, full.collect())) \
        == sorted(map(tuple, exact.collect()))


def test_ivfpq_rerank_validation_and_index_path(spark, tmp_path):
    import numpy as np

    from pydala_spark.operators.ann import (
        ivf_pq_topk,
        kmeans_centroids,
        save_ivfpq_index,
        search_ivfpq_index,
        train_residual_pq,
    )

    rows = [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5])
            for i in range(120)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(df, cents, m=2, n_codes=4, seed=1)
    probes = df.where(F.col("vec_id") < 3)

    with pytest.raises(ValueError, match="rerank_top=2 < k=5"):
        ivf_pq_topk(df, probes, cents, books, k=5, rerank_top=2,
                    residual=True, anchors=anchors)
    idx = str(tmp_path / "rr_idx")
    save_ivfpq_index(spark, df, idx, cents, books, anchors=anchors)
    with pytest.raises(ValueError, match="requires.*rerank_source"):
        search_ivfpq_index(spark, idx, probes, k=5, rerank_top=20)

    # the index path with rerank_source equals the inline rerank path
    via_idx = search_ivfpq_index(
        spark, idx, probes, k=5, n_probe_centroids=1,
        rerank_top=20, rerank_source=df,
    )
    inline = ivf_pq_topk(
        df, probes, cents, books, k=5, n_probe_centroids=1,
        residual=True, anchors=anchors, rerank_top=20,
    )
    assert sorted(map(tuple, via_idx.collect())) \
        == sorted(map(tuple, inline.collect()))


def test_append_ivfpq_index_equals_rebuild(spark, tmp_path):
    # round 9: incremental index growth — new vectors encode under the
    # index's own pinned codebooks and land in the cell partitions;
    # search over the appended index == search over a full rebuild of
    # the combined corpus; duplicate ids refuse loud; sidecars untouched
    import json

    import numpy as np

    from pydala_spark.operators.ann import (
        PQ_CODEBOOK_SIDECAR,
        append_ivfpq_index,
        kmeans_centroids,
        save_ivfpq_index,
        search_ivfpq_index,
        train_residual_pq,
    )

    def mk(ids):
        return spark.createDataFrame(
            [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5])
             for i in ids],
            ["vec_id", "embedding"],
        )

    base = mk(range(100))
    newer = mk(range(100, 140))
    cents = kmeans_centroids(base, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(base, cents, m=2, n_codes=4, seed=1)

    grown = str(tmp_path / "idx_grown")
    save_ivfpq_index(spark, base, grown, cents, books, anchors=anchors)
    before = json.loads(open(f"{grown}/{PQ_CODEBOOK_SIDECAR}").read())
    append_ivfpq_index(spark, grown, newer)
    after = json.loads(open(f"{grown}/{PQ_CODEBOOK_SIDECAR}").read())
    assert after == before  # pinned training state survives the append

    rebuilt = str(tmp_path / "idx_rebuilt")
    save_ivfpq_index(spark, base.unionByName(newer), rebuilt, cents,
                     books, anchors=anchors)
    probes = mk(range(3))
    a = search_ivfpq_index(spark, grown, probes, k=5, n_probe_centroids=3)
    b = search_ivfpq_index(spark, rebuilt, probes, k=5, n_probe_centroids=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    # overlapping ids refuse loud (they would double every search hit)
    with pytest.raises(ValueError, match="already present"):
        append_ivfpq_index(spark, grown, mk([139, 200]))
    # if_exists="skip" is the idempotent cron form: only unseen ids
    # land, an all-duplicates batch appends nothing, and re-pointing
    # the job at the full corpus every night is safe
    assert append_ivfpq_index(spark, grown, mk([139, 200]),
                              if_exists="skip") == 1
    assert append_ivfpq_index(spark, grown, mk([139, 200]),
                              if_exists="skip") == 0
    c = search_ivfpq_index(spark, grown, mk([200]), k=3,
                           n_probe_centroids=3)
    assert c.count() == 3
    # ...and check_ids=False trusts ingest outright
    assert append_ivfpq_index(spark, grown, mk([300]),
                              check_ids=False) == 1


def test_ivfpq_rerank_full_pool_equals_exact_fuzz(spark):
    # seeded fuzz over dims/sizes/codebook shapes: whenever the rerank
    # pool covers every candidate (all cells probed, C = corpus size),
    # IVFADC+R degenerates to brute-force cosine EXACTLY — same rows,
    # same ranks, same doubles — regardless of how bad the PQ ranking
    # underneath is. Pins the pool-selection/exact-rescore plumbing
    # across geometries, not just the one testdata shape.
    import numpy as np

    from pydala_spark.operators.ann import (
        ivf_pq_topk,
        kmeans_centroids,
        train_residual_pq,
    )
    from pydala_spark.operators.similarity import cosine_topk

    for seed, n, dim, m in ((0, 40, 4, 2), (1, 60, 8, 4), (2, 30, 6, 3)):
        rng = np.random.default_rng(seed)
        rows = [(i, [float(x) for x in rng.normal(size=dim)])
                for i in range(n)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        cents = kmeans_centroids(df, n_centroids=3, seed=seed)
        anchors, books = train_residual_pq(df, cents, m=m, n_codes=4,
                                           seed=seed)
        probes = df.where(F.col("vec_id") < 4)
        exact = cosine_topk(df, probes, id_col="vec_id",
                            vec_col="embedding", k=7)
        rr = ivf_pq_topk(
            df, probes, cents, books, k=7, n_probe_centroids=3,
            residual=True, anchors=anchors, rerank_top=n,
        )
        assert sorted(map(tuple, rr.collect())) \
            == sorted(map(tuple, exact.collect())), f"seed={seed}"


def test_index_recall_harness(spark, tmp_path):
    # round 9: the "is my index still good" ops check — deterministic
    # probe panel, exact brute-force reference; the IVFADC+R config
    # with a full pool must read recall 1.0 (it IS brute force), and
    # repeated runs measure the SAME panel (week-over-week comparable)
    import numpy as np

    from pydala_spark.operators.ann import (
        index_recall,
        kmeans_centroids,
        save_ivfpq_index,
        train_residual_pq,
    )

    rng = np.random.default_rng(4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=6)]) for i in range(80)],
        ["vec_id", "embedding"],
    )
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(df, cents, m=2, n_codes=4, seed=1)
    idx = str(tmp_path / "recall_idx")
    save_ivfpq_index(spark, df, idx, cents, books, anchors=anchors)

    a = index_recall(spark, idx, df, k=5, n_probe_centroids=2,
                     n_probes=10)
    assert 0.0 <= a["recall_at_k"] <= 1.0 and a["n_probes"] == 10
    b = index_recall(spark, idx, df, k=5, n_probe_centroids=2,
                     n_probes=10)
    assert b == a  # fixed panel, fixed math — no sampling noise
    full = index_recall(spark, idx, df, k=5, n_probe_centroids=3,
                        n_probes=10, rerank_top=80)
    assert full["recall_at_k"] == 1.0  # full pool == brute force
    assert full["recall_at_k"] >= a["recall_at_k"]

    # round 10: the eval MEASURES a drifted index instead of erroring
    # on it — the index still holds ids the source dataset lost (the
    # exact drift the nightly eval exists to catch), and the rerank
    # pass runs in "prune" coverage mode so stale pool candidates drop
    # out and recall is still a number
    drifted_src = df.where(F.col("vec_id") % 3 != 0)
    d = index_recall(spark, idx, drifted_src, k=5, n_probe_centroids=3,
                     n_probes=10, rerank_top=80)
    assert d["recall_at_k"] is not None
    assert 0.0 <= d["recall_at_k"] <= 1.0


def test_remove_from_ivfpq_index(spark, tmp_path):
    # round 9: the deletion half of index maintenance — removal by id
    # rewrites only the affected cell partitions, equals a rebuild
    # without those rows, leaves the codebooks untouched, and an
    # emptied cell's stale directory actually disappears
    import json
    import os

    from pydala_spark.operators.ann import (
        PQ_CODEBOOK_SIDECAR,
        kmeans_centroids,
        remove_from_ivfpq_index,
        save_ivfpq_index,
        search_ivfpq_index,
        train_residual_pq,
    )

    def mk(ids):
        return spark.createDataFrame(
            [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5])
             for i in ids],
            ["vec_id", "embedding"],
        )

    base = mk(range(120))
    cents = kmeans_centroids(base, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(base, cents, m=2, n_codes=4, seed=1)
    idx = str(tmp_path / "del_idx")
    save_ivfpq_index(spark, base, idx, cents, books, anchors=anchors)
    before_cb = json.loads(open(f"{idx}/{PQ_CODEBOOK_SIDECAR}").read())

    drop = [5, 17, 40]
    assert remove_from_ivfpq_index(spark, idx, drop) == 3
    assert json.loads(open(f"{idx}/{PQ_CODEBOOK_SIDECAR}").read()) \
        == before_cb

    rebuilt = str(tmp_path / "del_rebuilt")
    keep = base.where(~F.col("vec_id").isin(drop))
    save_ivfpq_index(spark, keep, rebuilt, cents, books, anchors=anchors)
    probes = mk(range(3))
    a = search_ivfpq_index(spark, idx, probes, k=5, n_probe_centroids=3)
    b = search_ivfpq_index(spark, rebuilt, probes, k=5,
                           n_probe_centroids=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    # nothing matched -> no-op, nothing rewritten
    assert remove_from_ivfpq_index(spark, idx, [99999]) == 0

    # DataFrame form + emptying an entire cell: the stale partition
    # directory is gone and search over the remainder still works
    from pydala_spark.dataset.reader import Dataset

    rows = Dataset(spark, idx).load()
    cells = {r["cell"] for r in rows.select("cell").distinct().collect()}
    victim = sorted(cells)[0]
    # the stored index id column is ivf_pq_encode's "id"
    victim_ids = rows.where(F.col("cell") == victim).select("id")
    n_victim = victim_ids.count()
    assert remove_from_ivfpq_index(spark, idx, victim_ids) == n_victim
    assert not os.path.exists(os.path.join(idx, f"cell={victim}"))
    left = Dataset(spark, idx).load()
    assert left.where(F.col("cell") == victim).count() == 0
    assert left.count() == 117 - n_victim
    assert search_ivfpq_index(spark, idx, probes, k=3,
                              n_probe_centroids=3).count() == 9


def test_ivfpq_index_survives_compact(spark, tmp_path):
    # the nightly-cron collision a production user hits: maintain's
    # compaction over an index directory must keep the codebook
    # sidecars and leave search bit-identical
    from pydala_spark.dataset.maintain import compact
    from pydala_spark.operators.ann import (
        kmeans_centroids,
        save_ivfpq_index,
        search_ivfpq_index,
        train_residual_pq,
    )

    df = spark.createDataFrame(
        [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5])
         for i in range(200)],
        ["vec_id", "embedding"],
    )
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(df, cents, m=2, n_codes=4, seed=1)
    idx = str(tmp_path / "cpt_idx")
    save_ivfpq_index(spark, df, idx, cents, books, anchors=anchors)
    probes = df.where(F.col("vec_id") < 3)
    before = sorted(map(tuple, search_ivfpq_index(
        spark, idx, probes, k=5, n_probe_centroids=3).collect()))
    stats = compact(spark, idx, target_file_mb=64)
    assert stats["files_after"] <= stats["files_before"]
    after = sorted(map(tuple, search_ivfpq_index(
        spark, idx, probes, k=5, n_probe_centroids=3).collect()))
    assert after == before


def test_remove_from_ivfpq_index_generation_layout(spark, tmp_path):
    # review find (round 9): after maintain.compact(swap="generation")
    # the live data sits under gen-NNNNNN/ — the deletion's write and
    # emptied-cell deletes must land THERE, or the GDPR removal
    # silently does nothing while reporting success
    from pydala_spark.dataset.maintain import compact
    from pydala_spark.operators.ann import (
        kmeans_centroids,
        remove_from_ivfpq_index,
        save_ivfpq_index,
        search_ivfpq_index,
        train_residual_pq,
    )

    df = spark.createDataFrame(
        [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5])
         for i in range(90)],
        ["vec_id", "embedding"],
    )
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(df, cents, m=2, n_codes=4, seed=1)
    idx = str(tmp_path / "gen_idx")
    save_ivfpq_index(spark, df, idx, cents, books, anchors=anchors)
    compact(spark, idx, target_file_mb=64, swap="generation")

    assert remove_from_ivfpq_index(spark, idx, [7, 11]) == 2
    probes = df.where(F.col("vec_id") < 2)
    hits = search_ivfpq_index(spark, idx, probes, k=60,
                              n_probe_centroids=3)
    got = {r["neighbor_id"] for r in hits.collect()}
    assert 7 not in got and 11 not in got
    # a second removal of the same ids is a no-op
    assert remove_from_ivfpq_index(spark, idx, [7, 11]) == 0


def test_ivfpq_rerank_source_coverage_fail_loud(spark):
    # ADVICE r9: a caller-supplied rerank_source that does not cover
    # the PQ candidate pool must ERROR, not silently shrink the result
    # (fewer than k rows / quietly lower recall). A covering source
    # (and a superset) still works and equals the default path.
    from pydala_spark.operators.ann import (
        ivf_pq_topk,
        kmeans_centroids,
        train_residual_pq,
    )

    df = spark.createDataFrame(
        [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5])
         for i in range(120)],
        ["vec_id", "embedding"],
    )
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(df, cents, m=2, n_codes=4, seed=1)
    probes = df.where(F.col("vec_id") < 3)

    # full coverage == default path (rerank_source=None -> corpus)
    full = ivf_pq_topk(
        df, probes, cents, books, k=5, n_probe_centroids=1,
        residual=True, anchors=anchors, rerank_top=20, rerank_source=df,
    )
    default = ivf_pq_topk(
        df, probes, cents, books, k=5, n_probe_centroids=1,
        residual=True, anchors=anchors, rerank_top=20,
    )
    assert sorted(map(tuple, full.collect())) \
        == sorted(map(tuple, default.collect()))

    # a superset source is fine (extra vectors never join the pool)
    superset = df.union(
        spark.createDataFrame([(999, [9.0, 9.0, 9.0, 9.0])],
                              ["vec_id", "embedding"]))
    assert sorted(map(tuple, ivf_pq_topk(
        df, probes, cents, books, k=5, n_probe_centroids=1,
        residual=True, anchors=anchors, rerank_top=20,
        rerank_source=superset,
    ).collect())) == sorted(map(tuple, default.collect()))

    # a source missing pool members fails LOUD at execution
    partial = df.where(F.col("vec_id") % 2 == 0)
    with pytest.raises(Exception, match="rerank_source"):
        ivf_pq_topk(
            df, probes, cents, books, k=5, n_probe_centroids=1,
            residual=True, anchors=anchors, rerank_top=20,
            rerank_source=partial,
        ).collect()

    # ...including the worst shape: a DISJOINT source, where every
    # probe's entire pool is missing and an inner join would just
    # return zero rows with no error
    disjoint = spark.createDataFrame(
        [(10000 + i, [1.0, 2.0, 3.0, 4.0]) for i in range(5)],
        ["vec_id", "embedding"],
    )
    with pytest.raises(Exception, match="rerank_source"):
        ivf_pq_topk(
            df, probes, cents, books, k=5, n_probe_centroids=1,
            residual=True, anchors=anchors, rerank_top=20,
            rerank_source=disjoint,
        ).collect()

    # a DUPLICATED source id is caught too: it would join twice into
    # the exact re-score and push a genuine k-th neighbor out of the
    # top-k — quietly wrong where missing ids merely shrink
    duped = df.union(df.where(F.col("vec_id") == 1))
    with pytest.raises(Exception, match="duplicated"):
        ivf_pq_topk(
            df, probes, cents, books, k=5, n_probe_centroids=1,
            residual=True, anchors=anchors, rerank_top=20,
            rerank_source=duped,
        ).collect()

    # rerank_coverage="prune" opts back into dropping uncovered
    # candidates — the drifted-index measurement mode (index_recall)
    pruned = ivf_pq_topk(
        df, probes, cents, books, k=5, n_probe_centroids=1,
        residual=True, anchors=anchors, rerank_top=20,
        rerank_source=partial, rerank_coverage="prune",
    ).collect()
    assert 0 < len(pruned) <= len(default.collect())
    assert all(r["neighbor_id"] % 2 == 0 for r in pruned)
    with pytest.raises(ValueError, match="strict.*prune|prune.*strict"):
        ivf_pq_topk(
            df, probes, cents, books, k=5, n_probe_centroids=1,
            residual=True, anchors=anchors, rerank_top=20,
            rerank_source=partial, rerank_coverage="bogus",
        )


def test_remove_from_ivfpq_index_refuses_to_empty(spark, tmp_path):
    # ADVICE r9: removing EVERY remaining vector would leave an index
    # dir holding only sidecars — the next load would die on parquet
    # schema inference. Refuse up front, before any destructive step,
    # and leave the index fully intact.
    from pydala_spark.dataset.reader import Dataset
    from pydala_spark.operators.ann import (
        kmeans_centroids,
        remove_from_ivfpq_index,
        save_ivfpq_index,
        search_ivfpq_index,
        train_residual_pq,
    )

    df = spark.createDataFrame(
        [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5])
         for i in range(60)],
        ["vec_id", "embedding"],
    )
    cents = kmeans_centroids(df, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(df, cents, m=2, n_codes=4, seed=1)
    idx = str(tmp_path / "empty_idx")
    save_ivfpq_index(spark, df, idx, cents, books, anchors=anchors)

    with pytest.raises(ValueError, match="empty the index entirely"):
        remove_from_ivfpq_index(spark, idx, list(range(60)))

    # nothing was written or deleted: full row count, search still works
    assert Dataset(spark, idx).load().count() == 60
    probes = df.where(F.col("vec_id") < 2)
    assert search_ivfpq_index(spark, idx, probes, k=3,
                              n_probe_centroids=3).count() == 6


def test_similarity_sql_path_matches_column_path(spark):
    """Round 16: the scoring helpers' string fast path (one parsed SQL
    fragment, guide §7.3 build-time fix) must produce the same values
    as the legacy Column spelling — every helper, including all-negative
    vectors, zeros and float/int arrays."""
    from pydala_spark.operators.similarity import (
        cosine_similarity, dot, lsh_bucket, norm, sim_from_norms,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 3.0, 0.5], [0.0, 1.0, -1.0, 2.0]),
            (2, [0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]),
            (3, [-1.5, -2.5, -3.5, -4.5], [-1.0, 2.0, -3.0, 4.0]),
        ],
        ["id", "a", "b"],
    )
    pre = df.withColumn("na", norm(F.col("a"))).withColumn(
        "nb", norm(F.col("b"))
    )
    # ANSI mode (Spark 4 default) raises on /0 in BOTH spellings, so
    # the ratio helpers are compared on the non-zero-norm rows only;
    # dot/norm/lsh_bucket cover the zero vector below.
    zdot = pre.select(
        "id",
        dot(F.col("a"), F.col("b")).alias("d"),
        norm(F.col("a")).alias("n"),
        lsh_bucket(F.col("a"), 4, bits=6).alias("bkt"),
    ).collect()
    zdot_new = pre.select(
        "id",
        dot("a", "b").alias("d"),
        norm("a").alias("n"),
        lsh_bucket("a", 4, bits=6).alias("bkt"),
    ).collect()
    assert [tuple(r) for r in zdot] == [tuple(r) for r in zdot_new]
    pre = pre.where("id != 2")
    old = pre.select(
        "id",
        dot(F.col("a"), F.col("b")).alias("d"),
        norm(F.col("a")).alias("n"),
        cosine_similarity(F.col("a"), F.col("b")).alias("c"),
        sim_from_norms(
            F.col("a"), F.col("b"), F.col("na"), F.col("nb")
        ).alias("s"),
        lsh_bucket(F.col("a"), 4, bits=6).alias("bkt"),
    ).collect()
    new = pre.select(
        "id",
        dot("a", "b").alias("d"),
        norm("a").alias("n"),
        cosine_similarity("a", "b").alias("c"),
        sim_from_norms("a", "b", "na", "nb").alias("s"),
        lsh_bucket("a", 4, bits=6).alias("bkt"),
    ).collect()
    assert [tuple(r) for r in old] == [tuple(r) for r in new]
    # round 17 (ADVICE r16): MIXED str/Column calls take the algebra
    # fallback, where a bare string must coerce to F.col — the Column
    # operator overloads would otherwise lift it to a STRING LITERAL
    # ('na' * nb) and silently produce NULL/wrong sims
    mixed = pre.select(
        "id",
        dot(F.col("a"), "b").alias("d"),
        cosine_similarity("a", F.col("b")).alias("c"),
        sim_from_norms(F.col("a"), "b", "na", F.col("nb")).alias("s"),
    ).collect()
    assert [(r["id"], r["d"], r["c"], r["s"]) for r in old] == [
        tuple(r) for r in mixed
    ]
