"""int8 embedding quantization: schema, reconstruction error, recall."""

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, ByteType

from pydala_spark.operators.similarity import (
    cosine_topk,
    quantize_embeddings,
    quantized_cosine_topk,
)
from pydala_spark.sources import load_table


def test_quantize_schema_and_range(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    field = dict((f.name, f.dataType) for f in q.schema.fields)["q_vec"]
    assert isinstance(field, ArrayType) and isinstance(field.elementType, ByteType)
    stats = q.select(
        F.max(F.aggregate("q_vec", F.lit(-128), lambda a, x: F.greatest(a, x.cast("int")))).alias("hi"),
        F.min(F.aggregate("q_vec", F.lit(127), lambda a, x: F.least(a, x.cast("int")))).alias("lo"),
        F.min("q_vec_scale").alias("smin"),
    ).first()
    assert -127 <= stats["lo"] and stats["hi"] <= 127
    assert stats["smin"] > 0


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
    row = quantize_embeddings(df).first()
    assert row["q_vec_scale"] == 1.0 and list(row["q_vec"]) == [0, 0, 0]


def test_quantized_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, probes, k=5)
    q_corpus = quantize_embeddings(emb)
    q_probes = quantize_embeddings(probes)
    approx = quantized_cosine_topk(q_corpus, q_probes, k=5)
    e = {(r["probe_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["probe_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, recall
