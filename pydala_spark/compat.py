"""Reference-compatible facade: pydala-style names over the Spark engine.

A user of the reference drives it through ``pydala.dataset.Reader /
Writer / Repartition / TimeFly`` and ``pydala.datalake.Manager``
(reference src/pydala/dataset/reader.py:23-63, writer.py, datalake/
manager.py). This module exposes those names and call shapes so existing
code can switch imports and keep running; engine-specific arguments that
have no Spark meaning (embedded-engine memory limits, fsspec caching
knobs, s5cmd profiles) are accepted and ignored with a debug log.

``spark`` may be passed explicitly; otherwise the active (or a new)
session is used — mirroring how every reference object silently carries
its embedded connection.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import SparkSession

from pydala_spark.catalog import Datalake
from pydala_spark.dataset.reader import Dataset
from pydala_spark.dataset.repartition import Repartition
from pydala_spark.dataset.timefly import TimeFly
from pydala_spark.dataset.writer import Writer as _Writer
from pydala_spark.session import get_session
from pydala_spark.utils import get_logger

_IGNORED_KWARGS = {
    "ddb", "ddb_memory_limit", "caching", "cache_storage", "protocol",
    "profile", "endpoint_url", "storage_options", "base_name", "ascending",
}


def _session(spark: SparkSession | None) -> SparkSession:
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    return active if active is not None else get_session()


def _warn_ignored(kwargs: dict) -> None:
    ignored = sorted(set(kwargs) & _IGNORED_KWARGS)
    if ignored:
        get_logger().debug("compat: ignoring engine-specific kwargs %s", ignored)
    unknown = sorted(set(kwargs) - _IGNORED_KWARGS)
    if unknown:
        raise TypeError(f"unknown arguments: {unknown}")


class Reader(Dataset):
    """Reference ``Reader`` call shape (reader.py:23-63) over Dataset."""

    def __init__(
        self,
        path: str,
        bucket: str | None = None,
        name: str | None = None,
        partitioning: str | None = "hive",
        format: str = "parquet",
        sort_by: str | Sequence[str] | None = None,
        distinct: bool = False,
        drop: str | Sequence[str] | None = None,
        schema=None,
        spark: SparkSession | None = None,
        **kwargs,
    ):
        _warn_ignored(kwargs)
        full_path = f"{bucket.rstrip('/')}/{path.lstrip('/')}" if bucket else path
        super().__init__(
            _session(spark), full_path, format=format, schema=schema,
            partitioning=partitioning, name=name,
        )
        if sort_by:
            self.sort(sort_by)
        if distinct:
            self.distinct()
        if drop:
            self.drop(drop)

    # reference method names
    def load_dataset(self, name: str | None = None, **_kw):
        self.to_view(name)
        return self.load()

    def load_pa_table(self, name: str | None = None, **_kw):
        if name:
            self.to_view(name)
        return self.to_arrow()

    def to_relation(self, **_kw):
        return self.load()

    @property
    def dataset(self):
        return self.load()

    @property
    def pl(self):
        return self.to_polars()

    @property
    def pdf(self):
        return self.to_pandas()


class Writer(_Writer):
    """Reference ``Writer`` call shape over the Spark writer."""

    def __init__(
        self,
        path: str,
        bucket: str | None = None,
        partitioning: str | Sequence[str] | None = None,
        format: str = "parquet",
        compression: str = "zstd",
        mode: str = "append",
        spark: SparkSession | None = None,
        **kwargs,
    ):
        _warn_ignored(kwargs)
        full_path = f"{bucket.rstrip('/')}/{path.lstrip('/')}" if bucket else path
        super().__init__(
            _session(spark), full_path, format=format, mode=mode,
            partition_by=partitioning, compression=compression,
        )

    def write_dataset(
        self,
        table,
        mode: str | None = None,
        delta_subset: Sequence[str] | None = None,
        datetime_column: str | None = None,
        start_time=None,
        end_time=None,
        batch_size: str | int | None = None,
        transform_func=None,
        transform_func_kwargs=None,
        **_kw,
    ) -> None:
        """Reference ``write_dataset`` (writer.py:429-527): a string
        ``batch_size`` is the time-bucket grammar; integer row batching
        is handled by Spark's own partitioning (W7)."""
        time_bucket = batch_size if isinstance(batch_size, str) else None
        self.write(
            table,
            mode=mode,
            delta_subset=delta_subset,
            datetime_column=datetime_column,
            start_time=start_time,
            end_time=end_time,
            time_bucket=time_bucket,
            transform_func=transform_func,
            transform_func_kwargs=transform_func_kwargs,
        )

    def write_table(self, table, **_kw) -> None:
        self.write(table)


class Manager(Datalake):
    """Reference ``datalake.Manager`` over Datalake."""

    def __init__(self, root: str, spark: SparkSession | None = None, **kwargs):
        _warn_ignored(kwargs)
        super().__init__(_session(spark), root)


__all__ = ["Reader", "Writer", "Repartition", "TimeFly", "Manager"]
