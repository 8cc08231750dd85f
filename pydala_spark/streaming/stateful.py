"""Custom stateful streaming operator via applyInPandasWithState.

Beyond reference parity (the reference has no streaming at all, SURVEY
§2.8): a running per-key aggregate that survives across micro-batches —
the canonical "custom stateful operator" shape for Structured Streaming.
State is a single row per key (count, sum), bounded memory per key
regardless of stream length.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, batch_rows long"
STATE_SCHEMA = "n long, total double"


def running_user_totals(stream_df: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained as streaming state.

    Input schema needs ``user_id`` and ``value`` columns. Emits one row
    per user per micro-batch with the post-batch running totals.

    The update function is defined inside this factory on purpose:
    cloudpickle ships nested functions BY VALUE, so Python workers never
    need to import this package (a module-level function pickles by
    reference and breaks when the driver runs outside the repo).
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        add_n = 0
        add_total = 0.0
        for pdf in pdfs:
            add_n += len(pdf)
            add_total += float(pdf["value"].sum())
        if state.exists:
            (n, total) = state.get
        else:
            n, total = 0, 0.0
        n += add_n
        total += add_total
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "batch_rows": [add_n],
            }
        )

    return (
        stream_df.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_semantic_dedup(
    stream_df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.2,
    max_state_per_cell: int = 1000,
    event_time_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """SemDeDup at ingest (round 5 stretch): drop semantic near-dups
    from a stream, mirroring the batch
    :func:`~pydala_spark.operators.similarity.semantic_dedup` contract
    under the SAME pinned codebook — cell assignment is the identical
    Arrow-batched argmax (``ann._assigner``), and in-cell similarity is
    the same unit-vector cosine against the cell's surviving
    representatives. Emits one ``(id, cell)`` row per KEPT document
    (streams cannot retract, so only survivors flow downstream —
    semi-join against the payload stream to prune it).

    Contract vs batch: batch compares every doc against ALL smaller-id
    cell-mates; the stream compares each arrival against the cell's
    KEPT representatives (the standard online rule — first-arrived
    survives). When arrivals come in id order and near-dup groups are
    mutually similar, the two produce identical survivor sets (pinned
    by test); out-of-order arrival keeps the first arrival instead of
    the smallest id.

    **Out-of-order mode (round 6):** pass ``event_time_col`` +
    ``watermark_delay`` (e.g. ``"10 seconds"``) and arrivals are
    BUFFERED per cell instead of decided immediately: a doc is released
    only once the event-time watermark passes its timestamp, and each
    released cohort is processed in **id order** — so any group of
    near-dups whose arrival disorder stays within the watermark dedups
    to the SMALLEST id, exactly like batch ``semantic_dedup`` (pinned by
    a shuffled-arrival test). Mechanics: pending (id, vec, ts) rows ride
    in the group state next to the representatives; on every
    data-arrival AND on event-time timeout the watermark-eligible prefix
    flushes (sorted by id), and the timeout re-arms at the earliest
    still-pending timestamp so a quiet cell still drains without new
    arrivals. The trade: kept-rows are emitted one watermark delay
    late, and state additionally holds the in-flight window (bounded by
    arrival rate × delay). Arrivals later than the watermark are
    dropped by Spark's watermark filter upstream — that is the "bounded
    disorder" contract, not a silent reorder failure.

    State at 100 TB: one representative list per cell, capped at
    ``max_state_per_cell`` unit vectors — when a cell's list is full,
    new non-duplicate docs still pass through but stop being added as
    representatives (documented recall loss on overflowing hotspots;
    size the codebook so cells stay small, the same knob as batch
    SemDeDup). Rows are processed in id order within each micro-batch
    for determinism.
    """
    import numpy as np

    from pyspark.sql import functions as F

    from pydala_spark.operators.ann import _assigner

    cents = np.asarray(centroids, dtype=np.float64)
    assign = _assigner(cents, 1)
    # the id keeps ITS OWN type end-to-end (batch semantic_dedup works
    # with any orderable id; a hard cast to long would NULL string doc
    # ids and crash the state update) — output and state schemas are
    # derived from the input column
    id_type = stream_df.schema[id_col].dataType.simpleString()
    if (event_time_col is None) != (watermark_delay is None):
        raise ValueError(
            "event_time_col and watermark_delay come together — the "
            "buffered mode needs both the column and the bound"
        )
    thr = float(threshold)
    cap = int(max_state_per_cell)
    if event_time_col is not None:
        return _buffered_semantic_dedup(
            stream_df, assign, id_col, vec_col, id_type,
            event_time_col, watermark_delay, thr, cap,
        )
    keyed = stream_df.select(
        F.element_at(assign(F.col(vec_col)), 1).alias("cell"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__vec"),
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np  # worker-side import (nested closure rule)

        if state.exists:
            rep_ids, rep_vecs = state.get
            rep_ids = list(rep_ids)
            reps = [np.asarray(v, dtype=np.float64) for v in rep_vecs]
        else:
            rep_ids, reps = [], []
        rep_mat = np.array(reps) if reps else np.empty((0, 0))
        kept = []
        for pdf in pdfs:
            pdf = pdf.sort_values("__id")
            for _id, vec in zip(pdf["__id"], pdf["__vec"]):
                x = np.asarray(vec, dtype=np.float64)
                x = x / max(float(np.linalg.norm(x)), 1e-12)
                if rep_mat.size and float((rep_mat @ x).max()) >= thr:
                    continue
                kept.append(_id)
                if len(reps) < cap:
                    reps.append(x)
                    rep_ids.append(_id)
                    rep_mat = np.array(reps)
        state.update((rep_ids, [r.tolist() for r in reps]))
        yield pd.DataFrame(
            {"id": pd.Series(kept, dtype="object"),
             "cell": pd.Series([int(key[0])] * len(kept), dtype="int32")}
        )

    return keyed.groupBy("cell").applyInPandasWithState(
        update,
        outputStructType=f"id {id_type}, cell int",
        stateStructType=f"ids array<{id_type}>, vecs array<array<double>>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

def _buffered_semantic_dedup(
    stream_df: DataFrame,
    assign,
    id_col: str,
    vec_col: str,
    id_type: str,
    event_time_col: str,
    watermark_delay: str,
    thr: float,
    cap: int,
) -> DataFrame:
    """Watermark-buffered ordering layer under
    :func:`streaming_semantic_dedup` — see its docstring for the
    contract. Pending arrivals ride in state as parallel arrays
    (ids / unit vectors / epoch-ms timestamps); the watermark-eligible
    prefix flushes in id order on every group invocation (data or
    event-time timeout), and the timeout re-arms at the earliest
    pending timestamp so quiet cells drain."""
    from pyspark.sql import functions as F

    keyed = (
        stream_df.select(
            F.element_at(assign(F.col(vec_col)), 1).alias("cell"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__vec"),
            F.col(event_time_col).cast("timestamp").alias("__ts"),
        )
        # a NULL event time (NaT) would convert via astype('int64') to
        # int64-min and flush immediately ahead of its cohort, silently
        # bypassing the smallest-id ordering — drop it like Spark's own
        # watermark operators drop null-event-time rows
        .where(F.col("__ts").isNotNull())
        .withWatermark("__ts", watermark_delay)
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np  # worker-side import (nested closure rule)

        if state.exists:
            rep_ids, rep_vecs, p_ids, p_vecs, p_ts = state.get
            rep_ids = list(rep_ids)
            reps = [np.asarray(v, dtype=np.float64) for v in rep_vecs]
            pend = list(zip(p_ids, (list(v) for v in p_vecs), p_ts))
        else:
            rep_ids, reps, pend = [], [], []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_ms = pdf["__ts"].astype("int64") // 1_000_000
                for _id, vec, t in zip(pdf["__id"], pdf["__vec"], ts_ms):
                    x = np.asarray(vec, dtype=np.float64)
                    x = x / max(float(np.linalg.norm(x)), 1e-12)
                    pend.append((_id, x.tolist(), int(t)))
        wm = state.getCurrentWatermarkMs()
        ready = sorted(
            (p for p in pend if p[2] <= wm), key=lambda p: p[0]
        )
        pend = [p for p in pend if p[2] > wm]
        rep_mat = np.array(reps) if reps else np.empty((0, 0))
        kept = []
        for _id, vec, _t in ready:
            x = np.asarray(vec, dtype=np.float64)
            if rep_mat.size and float((rep_mat @ x).max()) >= thr:
                continue
            kept.append(_id)
            if len(reps) < cap:
                reps.append(x)
                rep_ids.append(_id)
                rep_mat = np.array(reps)
        state.update((
            rep_ids,
            [r.tolist() for r in reps],
            [p[0] for p in pend],
            [p[1] for p in pend],
            [p[2] for p in pend],
        ))
        if pend:
            # re-arm at the earliest pending event (must sit strictly
            # past the current watermark or Spark rejects it): the cell
            # drains even if no further data ever arrives for it
            state.setTimeoutTimestamp(max(min(p[2] for p in pend), wm + 1))
        yield pd.DataFrame(
            {"id": pd.Series(kept, dtype="object"),
             "cell": pd.Series([int(key[0])] * len(kept), dtype="int32")}
        )

    return keyed.groupBy("cell").applyInPandasWithState(
        update,
        outputStructType=f"id {id_type}, cell int",
        stateStructType=(
            f"ids array<{id_type}>, vecs array<array<double>>, "
            f"pend_ids array<{id_type}>, pend_vecs array<array<double>>, "
            "pend_ts array<long>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
