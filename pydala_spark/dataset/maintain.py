"""Bucketed table maintenance: co-located joins without a shuffle.

At 100 TB the dominant recurring cost is re-shuffling big fact tables for
every join on the same key. Bucketing (``bucketBy`` + ``saveAsTable``)
pre-partitions the data by key hash ONCE at write time; later equi-joins
between tables bucketed the same way run with zero shuffle exchanges
(verified by plan in tests). This is the Spark-native replacement for the
reference's repartitioned-dataset layout (SURVEY §2.2 W11) when a join
key is stable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from pydala_spark.session import configure_session


def bucketize(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int = 32,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> str:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    Same ``n_buckets`` + ``bucket_cols`` across tables => joins between
    them are exchange-free. Sorting within buckets additionally removes
    the sort from sort-merge joins.
    """
    configure_session(spark)
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.format(format)
        .mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.saveAsTable(table_name)
    return table_name
