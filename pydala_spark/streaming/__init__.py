"""Incremental / streaming ingestion.

The reference's incremental model is micro-batch append with delta
detection (SURVEY §2.8) — no true streaming operators exist there. Here:

- :func:`incremental_append` — the reference-parity path: a
  ``foreachBatch`` sink that funnels every micro-batch through
  ``Writer.write(mode='delta')``, so exactly the anti-diff semantics of
  batch delta mode apply continuously.
- :func:`windowed_counts` — the extension path: watermarked tumbling-
  window aggregation for late-data-tolerant rollups.

Both work against file sources (``readStream`` over a directory), which
is also how they're smoke-tested without a message bus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pydala_spark.dataset.writer import Writer


def incremental_append(
    stream_df: DataFrame,
    writer: Writer,
    delta_subset: Sequence[str] | None = None,
    datetime_column: str | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Continuously append only-new rows to a dataset (delta semantics per
    micro-batch; reference writer.py:219-249 made streaming)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        writer.write(
            batch_df,
            mode="delta",
            delta_subset=delta_subset,
            datetime_column=datetime_column,
        )

    ws = stream_df.writeStream.foreachBatch(sink)
    if checkpoint_dir:
        ws = ws.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        ws = ws.trigger(availableNow=True)
    return ws.start()


def session_windows(
    stream_df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key_cols: Sequence[str] = ("user_id",),
) -> DataFrame:
    """Session-window aggregation: events separated by less than ``gap``
    merge into one session per key (Structured Streaming's native
    session_window — the streaming form of the batch sessionize query)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *key_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *key_cols,
            "n_events",
        )
    )


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts/sums (Structured Streaming
    extension beyond reference parity)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), *group_cols)
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), *group_cols, "n")
    )
