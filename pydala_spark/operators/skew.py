"""Skew-handling primitives for 100 TB workloads.

AQE's skew-join splitting (enabled by session default) covers most join
skew at runtime; these helpers cover the cases AQE can't re-plan:

- :func:`salted_agg` — two-phase aggregation for heavily skewed group
  keys: a random salt spreads one hot key over N partial groups, then a
  second (tiny) aggregation merges the partials. Supported aggregate
  specs are the algebraically mergeable ones (count/sum/min/max).
- :func:`salted_join` — replicate-right / salt-left
  pattern for a shuffle join whose LEFT side has a hot key but whose
  right side is too big to broadcast whole: the right side is exploded
  ``salt_buckets`` times (bounded blow-up), the left salted randomly, so
  one hot key lands on ``salt_buckets`` reducers instead of one.

Salting uses ``rand`` seeded deterministically per call site when
``seed`` is given, keeping tests reproducible; results are
salt-invariant by construction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "count": F.sum,  # partial counts merge by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    seed: int | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (function, input column), function in
    {count, sum, min, max}; e.g. ``{"n": ("count", "*"), "total":
    ("sum", "v")}``.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(
                f"{name}: {fn!r} is not algebraically mergeable; "
                f"supported: {sorted(_MERGE)}"
            )
    salt = (F.rand(seed) if seed is not None else F.rand()) * salt_buckets
    salted = df.withColumn("__salt", salt.cast("int"))
    partial_cols = []
    for name, (fn, col) in aggs.items():
        # count('*') counts rows; count(col) counts non-nulls — honoring
        # the input column keeps parity with the unsalted aggregation
        src = F.count("*") if (fn == "count" and col == "*") else getattr(F, fn)(col)
        partial_cols.append(src.alias(f"__p_{name}"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_cols)
    final_cols = [
        _MERGE[fn](f"__p_{name}").alias(name) for name, (fn, _c) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    seed: int | None = None,
) -> DataFrame:
    """Inner equi-join resilient to a hot key on ``left``: right rows are
    replicated once per salt bucket (explode of a small int array), left
    rows get a random bucket, and the join key becomes (keys..., bucket).
    Total right-side blow-up = ``salt_buckets``x — keep it small."""
    on = list(on)
    buckets = F.array(*[F.lit(i) for i in range(salt_buckets)])
    r = right.withColumn("__salt", F.explode(buckets))
    salt = (F.rand(seed) if seed is not None else F.rand()) * salt_buckets
    l = left.withColumn("__salt", salt.cast("int"))
    return l.join(r, on + ["__salt"], "inner").drop("__salt")


#: Round-1 name; kept for compatibility. The operator performs a salted
#: SHUFFLE join (the name oversold a broadcast that never happens).
salted_broadcast_left_join = salted_join


def skew_report(
    df: DataFrame,
    keys: Sequence[str] | str,
    top: int = 20,
) -> DataFrame:
    """Heavy-hitter diagnostic for a prospective join/groupBy key: the
    ``top`` most frequent key values with their row counts, the share of
    all rows they carry, and the ratio to a perfectly uniform key
    (``x_uniform`` > ~100 on a top key is the signal to reach for
    :func:`salted_agg`/:func:`salted_join` or AQE skew splitting).

    One shuffle keyed by the (high-cardinality) key for the partial
    counts; the totals ride a single-row broadcast join, and only
    ``top`` rows ever reach the driver. Run it on a sample for a quick
    look — frequencies, not exact counts, drive the decision.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.count("*").alias("__n_keys")
    )
    return (
        counts.join(F.broadcast(totals))
        .orderBy(F.desc("n_rows"), *keys)
        .limit(top)
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("__total")).alias("row_share"),
            (F.col("n_rows") * F.col("__n_keys") / F.col("__total")).alias(
                "x_uniform"
            ),
        )
    )
