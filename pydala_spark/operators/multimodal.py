"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas iteration.

The decode step is STUBBED (this environment has no image/audio codecs):
``decode_stub=True`` substitutes a deterministic fake decoder so the
Spark-side contract — schema, batch shape, partitioning, UDF signature —
is real and tested; swapping in a real library (PIL/torchaudio/ffmpeg) is
a one-function change inside the ``mapInPandas`` worker.

Scale notes: ``mapInPandas`` streams Arrow batches per partition, so
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of corpus size. Keep binary payloads out of shuffles: derive
features first, then drop the blob column before any wide operation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the media manifest a multimodal dataset carries alongside
#: document rows: blob + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha1 string, feature array<float>"
)


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    decode_stub: bool = True,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode/feature-extract media blobs with an Arrow-batched iterator.

    With ``decode_stub=False`` this raises NotImplementedError inside the
    workers (no codec libraries in this environment) — the plumbing stays
    identical for a real decoder.
    """

    # worker closure: self-contained (stdlib-only refs) so cloudpickle
    # ships it by value — workers never import this package
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def fake_decode(payload: bytes, dim: int) -> list[float]:
            if not payload:
                return [0.0] * dim
            step = max(1, len(payload) // dim)
            return [
                float(sum(payload[i * step : (i + 1) * step]) % 997) / 997.0
                for i in range(dim)
            ]

        for pdf in batches:
            payloads = pdf[content_col]
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; pass decode_stub=True"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "sha1": [
                        hashlib.sha1(p or b"").hexdigest() for p in payloads
                    ],
                    "feature": [
                        fake_decode(p or b"", feature_dim) for p in payloads
                    ],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, content_col: str = "content"
) -> DataFrame:
    """Frame-sampling contract for video blobs: one output row per sampled
    frame offset (stubbed: offsets derived from duration metadata; a real
    implementation decodes frames at those offsets)."""
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.where(F.col("kind") == "video")
        .withColumn("frame_ms", F.explode(offsets))
        .drop(content_col)
    )
