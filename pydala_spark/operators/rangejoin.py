"""Bucketized range (interval-containment) join.

The reference delegates range predicates to DuckDB's IEJoin
(src/pydala/dataset/reader.py:478-484). Open-source Spark has no
range-join optimization: a raw ``l.ts BETWEEN r.lo AND r.hi`` with no
equi-key plans as BroadcastNestedLoopJoin — O(n*m) comparisons, and an
outright driver OOM once the broadcast side exceeds memory. This
operator restores an equi-join shape, the classic bucketization trick:

1. bin the point side by ``floor(epoch(ts) / bucket)``;
2. explode each interval into every bin it overlaps (expansion factor
   ``len(interval)/bucket + 1`` — pick ``bucket`` near the typical
   interval length to keep it ~2x);
3. hash-join on (bin [+ user equi-keys]) and re-check the exact
   BETWEEN predicate.

Bin coverage is exact: epoch-second truncation and floor division are
monotonic, so a contained point's bin always lies within its interval's
bin range. Both sides shuffle-partition on (bin, keys), so a 100 TB
point table joins against millions of intervals with ordinary
sort-merge/hash machinery, AQE skew-splitting included.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_SECS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def _bucket_secs(bucket: str) -> int:
    from pydala_spark.dataset.writer import parse_interval

    n, unit = parse_interval(bucket)
    secs = _UNIT_SECS.get(unit)
    if secs is None:
        raise ValueError(f"bucket must be a fixed-length interval, got {bucket!r}")
    return n * secs


def time_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    interval_start: str,
    interval_end: str,
    on: Sequence[str] = (),
    bucket: str = "15min",
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row whose
    ``[interval_start, interval_end]`` (inclusive) contains its
    ``point_ts``, optionally also matching equi-keys ``on``.

    ``how='inner'`` returns point columns + interval columns (equi-keys
    deduplicated); ``how='left_semi'`` returns the distinct point rows
    that fall inside at least one window.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError("how must be 'inner' or 'left_semi'")
    b = _bucket_secs(bucket)
    p = points.withColumn("__bin", (F.unix_timestamp(F.col(point_ts)) / b).cast("long"))
    lo_bin = (F.unix_timestamp(F.col(interval_start)) / b).cast("long")
    hi_bin = (F.unix_timestamp(F.col(interval_end)) / b).cast("long")
    # explode_cheaply, not F.explode: the inferred size(sequence(...))>0
    # filter would rebuild the bin array a second time (CLAUDE.md rule)
    from pydala_spark.operators.dedup import explode_cheaply

    iv = explode_cheaply(intervals, F.sequence(lo_bin, hi_bin), "__bin")

    cond = (F.col(point_ts) >= F.col(interval_start)) & (
        F.col(point_ts) <= F.col(interval_end)
    )
    if how == "left_semi":
        pa, ia = p.alias("p"), iv.alias("i")
        semi = (
            (F.col("p.__bin") == F.col("i.__bin"))
            & (F.col(f"p.{point_ts}") >= F.col(f"i.{interval_start}"))
            & (F.col(f"p.{point_ts}") <= F.col(f"i.{interval_end}"))
        )
        for k in on:
            semi = semi & (F.col(f"p.{k}") == F.col(f"i.{k}"))
        return pa.join(ia, semi, "left_semi").drop("__bin")
    return p.join(iv, on=["__bin", *on], how="inner").where(cond).drop("__bin")
