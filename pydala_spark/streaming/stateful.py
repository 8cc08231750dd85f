"""Custom stateful streaming operator via applyInPandasWithState.

Beyond reference parity (the reference has no streaming at all, SURVEY
§2.8): a running per-key aggregate that survives across micro-batches —
the canonical "custom stateful operator" shape for Structured Streaming.
State is a single row per key (count, sum), bounded memory per key
regardless of stream length.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

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
