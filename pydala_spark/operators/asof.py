"""As-of join: match each left row to the most recent right row
at-or-before (backward) or at-or-after (forward) it, per key.

Spark has no native as-of join (the reference has none either — its SQL
engine delegate gained ASOF JOIN upstream). This is the scalable
composition form: union both sides, one shuffle+sort per key, and a
running ``last(ignorenulls)`` window fill — wall-clock is a single
sort-merge pass, no driver loop, no per-group pandas. That plan survives
100 TB as long as keys fit the usual window-partition skew envelope
(salt extreme keys upstream if one key dominates).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    right_cols: Sequence[str],
    direction: str = "backward",
    inclusive: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join.

    ``right`` must be unique per (by, on) — pre-aggregate it otherwise
    (ties there would be nondeterministic). ``right_cols`` are the value
    columns pulled from the right side; names colliding with left columns
    get ``suffix``.
    """
    by = [by] if isinstance(by, str) else list(by)
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    clash = {"__rvals", "__side"} & (set(left.columns) | set(right.columns))
    if clash:
        # colliding internal markers would surface as AMBIGUOUS_REFERENCE
        # deep in the plan — reject clearly at the API boundary
        raise ValueError(f"asof_join: input columns {sorted(clash)} are reserved")
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }
    left_payload = [c for c in left.columns if c not in by and c != on]
    left_types = dict(left.dtypes)

    from pyspark.sql import types as T

    # the right row travels as ONE struct, so the window fill carries
    # whole rows atomically: per-column last(ignorenulls) would skip a
    # legitimate NULL in the matched row and splice in a stale value
    # from an older row — an output row no right row ever contained
    rstruct_type = T.StructType([right.schema[c] for c in right_cols])
    lhs = left.select(
        *by,
        F.col(on).alias(on),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(rstruct_type).alias("__rvals"),
        F.lit(1).alias("__side"),
    )
    rhs = right.where(F.col(on).isNotNull()).select(
        # a NULL-timestamp right row can never be an as-of match, but
        # ascending NULLS FIRST would make it the running fill for every
        # early left row — drop such rows up front
        *by,
        F.col(on).alias(on),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_payload],
        F.struct(*[F.col(c) for c in right_cols]).alias("__rvals"),
        F.lit(0).alias("__side"),
    )
    unioned = lhs.unionByName(rhs)

    # Right rows must sort before left rows at equal timestamps iff the
    # match is inclusive; flip for exclusive. Forward direction reverses
    # the time order and fills from the other end.
    side_order = F.col("__side").asc() if inclusive else F.col("__side").desc()
    time_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(time_order, side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # NULL-timestamp LEFT rows get no match (the mask, not sort order:
    # desc NULLS LAST would otherwise hand the forward direction's
    # null-ts rows the final running value)
    filled = unioned.withColumn(
        "__rvals",
        F.when(
            F.col(on).isNotNull(), F.last("__rvals", ignorenulls=True).over(w)
        ).otherwise(F.lit(None).cast(rstruct_type)),
    )
    return (
        filled.where(F.col("__side") == 1)
        .select(
            *by,
            on,
            *left_payload,
            *[F.col(f"__rvals.{c}").alias(out_names[c]) for c in right_cols],
        )
    )
