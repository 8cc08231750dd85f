"""Round 8: contract tests for the ``embedding_cells`` signature sidecar
(materialize_signatures kinds=("embedding_cells",)) and its
semantic_dedup consumer — the SemDeDup cell-assignment matmul hashed
ONCE at ingest, pinned to its codebook by sha, content-markered over the
FULL vector (no octet_length blind spot for arrays)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pydala_spark.dataset.maintain import (
    materialize_signatures,
    read_signatures,
)
from pydala_spark.operators.ann import codebook_sha, kmeans_centroids
from pydala_spark.operators.similarity import semantic_dedup


def _emb(spark, n=24, dim=6, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(4, dim))
    rows = []
    for i in range(n):
        v = base[i % 4] + rng.normal(scale=0.05, size=dim)
        rows.append((i, [float(x) for x in v]))
    # a deliberate near-duplicate pair inside one cluster
    rows.append((n, [float(x) for x in base[0] + 1e-4]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cells_sidecar_roundtrip_and_dedup_equals_inline(spark, tmp_path):
    base = str(tmp_path / "emb_ds")
    df = _emb(spark)
    cb = kmeans_centroids(df, vec_col="embedding", n_centroids=4, seed=1)
    out = materialize_signatures(
        spark, df, base, id_col="vec_id", kinds=("embedding_cells",),
        centroids=cb,
    )
    assert set(out) == {"embedding_cells"}
    cells, params = read_signatures(
        spark, base, "embedding_cells",
        expect={"codebook_sha": codebook_sha(cb)},
    )
    assert params["n_centroids"] == 4 and params["dim"] == 6

    inline = semantic_dedup(df, cb, threshold=0.995)
    pre = semantic_dedup(df, threshold=0.995, cells=cells, params=params)
    assert _rows(pre) == _rows(inline)
    kept = {r["id"] for r in pre.collect() if r["kept"]}
    assert len(kept) < df.count()  # the planted near-dup was dropped

    # scored variant agrees through the sidecar too
    scored = df.withColumn("q", (F.col("vec_id") % 5).cast("double"))
    inline_s = semantic_dedup(scored, cb, threshold=0.995, score_col="q")
    pre_s = semantic_dedup(scored, threshold=0.995, score_col="q",
                           cells=cells, params=params)
    assert _rows(pre_s) == _rows(inline_s)


def test_cells_sidecar_plan_has_no_assignment_udf(spark, tmp_path):
    # the precomputed path must contain ZERO python/pandas UDF evals —
    # the matmul ran once at ingest; the sweep is pure JVM joins
    from pydala_spark.plans import explain_str

    base = str(tmp_path / "emb_ds")
    df = _emb(spark)
    cb = kmeans_centroids(df, vec_col="embedding", n_centroids=4, seed=1)
    materialize_signatures(
        spark, df, base, id_col="vec_id", kinds=("embedding_cells",),
        centroids=cb,
    )
    cells, params = read_signatures(spark, base, "embedding_cells")
    pre = semantic_dedup(df, threshold=0.995, cells=cells, params=params)
    plan = explain_str(pre)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "_signatures/embedding_cells" in plan
    # the inline path, by contrast, carries the assignment UDF
    inline_plan = explain_str(semantic_dedup(df, cb, threshold=0.995))
    assert "ArrowEvalPython" in inline_plan


def test_cells_marker_catches_vector_mutation(spark, tmp_path):
    # full-vector marker: UNLIKE text's octet_length, a same-length
    # in-place value edit IS caught
    base = str(tmp_path / "emb_ds")
    df = _emb(spark)
    cb = kmeans_centroids(df, vec_col="embedding", n_centroids=4, seed=1)
    materialize_signatures(
        spark, df, base, id_col="vec_id", kinds=("embedding_cells",),
        centroids=cb,
    )
    read_signatures(spark, base, "embedding_cells", verify_against=df)
    mutated = df.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 0,
               F.transform("embedding", lambda x: x + F.lit(1.0)))
        .otherwise(F.col("embedding")),
    )
    with pytest.raises(ValueError, match="STALE"):
        read_signatures(spark, base, "embedding_cells",
                        verify_against=mutated)


def test_dataset_signature_convenience_methods(spark, tmp_path):
    # Dataset.materialize_signatures / .read_signatures fill in the
    # frame + path and verify the content marker BY DEFAULT
    from pydala_spark.dataset.reader import Dataset

    base = str(tmp_path / "emb_ds")
    _emb(spark).write.parquet(base)
    ds = Dataset(spark, base)
    cb = kmeans_centroids(ds.load(), vec_col="embedding",
                          n_centroids=4, seed=1)
    out = ds.materialize_signatures(
        kinds=("embedding_cells",), id_col="vec_id", centroids=cb)
    assert set(out) == {"embedding_cells"}
    cells, params = ds.read_signatures(
        "embedding_cells", expect={"codebook_sha": codebook_sha(cb)})
    assert cells.count() == ds.load().count()
    assert params["content_rows"] == ds.load().count()

    # verify-by-default: mutate the dataset out-of-band -> loud raise;
    # verify=False opts out
    spark.createDataFrame(
        [(777, [0.2] * 6)], "vec_id long, embedding array<double>"
    ).write.mode("append").parquet(base)
    ds2 = Dataset(spark, base)
    with pytest.raises(ValueError, match="STALE"):
        ds2.read_signatures("embedding_cells")
    cells2, _ = ds2.read_signatures("embedding_cells", verify=False)
    assert cells2.count() == ds.load().count()


def test_writer_ridealong_embedding_cells(spark, tmp_path):
    # the Writer signature ride-along is kind-generic: an embeddings
    # ingest signs cell assignments as it lands, append folds the
    # full-vector marker exactly, and appending under a RETRAINED
    # codebook refuses (params mismatch) instead of mixing geometries
    from pydala_spark.dataset.writer import Writer

    base = str(tmp_path / "emb_ds")
    df = _emb(spark)
    cb = kmeans_centroids(df, vec_col="embedding", n_centroids=4, seed=1)
    kw = dict(id_col="vec_id", vec_col="embedding", centroids=cb)
    Writer(spark, base, mode="overwrite",
           signatures=("embedding_cells",), signature_kwargs=kw).write(df)
    extra = spark.createDataFrame(
        [(500, [0.5] * 6)], "vec_id long, embedding array<double>")
    Writer(spark, base, mode="append",
           signatures=("embedding_cells",), signature_kwargs=kw).write(extra)
    live = spark.read.parquet(base)
    cells, params = read_signatures(
        spark, base, "embedding_cells",
        expect={"codebook_sha": codebook_sha(cb)}, verify_against=live)
    assert params["content_rows"] == live.count()
    assert cells.count() == live.count()
    # the folded sidecar serves the full corpus end to end
    pre = semantic_dedup(live, threshold=0.995, cells=cells, params=params)
    inline = semantic_dedup(live, cb, threshold=0.995)
    assert _rows(pre) == _rows(inline)

    other = kmeans_centroids(df, vec_col="embedding", n_centroids=3, seed=9)
    with pytest.raises(ValueError, match="mix hashing schemes"):
        Writer(spark, base, mode="append",
               signatures=("embedding_cells",),
               signature_kwargs={**kw, "centroids": other}).write(
            spark.createDataFrame(
                [(501, [0.1] * 6)], "vec_id long, embedding array<double>"))


def test_cells_guards(spark, tmp_path):
    base = str(tmp_path / "emb_ds")
    df = _emb(spark)
    cb = kmeans_centroids(df, vec_col="embedding", n_centroids=4, seed=1)
    # no codebook at materialization is a usage error
    with pytest.raises(ValueError, match="centroids"):
        materialize_signatures(spark, df, base, id_col="vec_id",
                               kinds=("embedding_cells",))
    materialize_signatures(
        spark, df, base, id_col="vec_id", kinds=("embedding_cells",),
        centroids=cb,
    )
    cells, params = read_signatures(spark, base, "embedding_cells")
    # a retrained codebook must not be served by the old cell table
    other = kmeans_centroids(df, vec_col="embedding", n_centroids=3, seed=9)
    with pytest.raises(ValueError, match="codebook_sha"):
        read_signatures(spark, base, "embedding_cells",
                        expect={"codebook_sha": codebook_sha(other)})
    with pytest.raises(ValueError, match="codebook"):
        semantic_dedup(df, other, cells=cells, params=params)
    # a text sidecar's params cannot drive cell blocking
    with pytest.raises(ValueError, match="kind"):
        semantic_dedup(df, cells=cells,
                       params={"kind": "winnowing", "k": 8})
    # neither centroids nor cells is a usage error
    with pytest.raises(ValueError, match="centroids"):
        semantic_dedup(df)
    # params without the frame is a caller bug
    with pytest.raises(ValueError, match="cells"):
        semantic_dedup(df, params=params)
    # ids missing from the sidecar fail LOUD at execution
    wider = df.unionByName(spark.createDataFrame(
        [(999, [0.0] * 6)], "vec_id long, embedding array<double>"))
    broken = semantic_dedup(wider, threshold=0.995, cells=cells,
                            params=params)
    with pytest.raises(Exception, match="sidecar"):
        broken.collect()
