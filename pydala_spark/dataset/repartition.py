"""Repartition: dataset rewrite with new sort/partitioning/format/layout.

Reference parity: ``Repartition`` (src/pydala/dataset/repartition.py:7-194)
is a Reader->Writer pipeline that rewrites a dataset with a new sort
order, partition columns, compression, format and mode, optionally
in place. The Spark form is a read -> (sort) -> partitioned write; small-
file compaction falls out of ``max_records_per_file`` + AQE coalescing.

Scale: this is the maintenance path for 100 TB datasets — compaction and
re-clustering are one shuffle. Sorting within partitions
(``sortWithinPartitions``) gives parquet min/max-statistics clustering
(the poor man's Z-ORDER) without a global sort barrier.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from pydala_spark.dataset.reader import Dataset, _parse_sort_spec
from pydala_spark.dataset.writer import Writer
from pydala_spark.session import configure_session

from pyspark.sql import functions as F


class Repartition:
    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        dest_path: str | None = None,
        source_format: str = "parquet",
        dest_format: str = "parquet",
        partition_by: Sequence[str] | None = None,
        sort_by: str | Sequence[str] | None = None,
        distinct: bool = False,
        drop: Sequence[str] | None = None,
        compression: str = "zstd",
        mode: str = "overwrite",
        max_records_per_file: int | None = None,
        transform_func: Callable[[DataFrame], DataFrame] | None = None,
        with_snapshot: bool = True,
    ):
        from pydala_spark.utils.pathops import strip_scheme

        self.spark = configure_session(spark)
        self.source_path = source_path
        self.dest_path = dest_path or source_path
        # scheme-insensitive: 'file:///data/ds' IS '/data/ds' — a raw
        # string compare would route the same directory through the
        # overwrite-own-input path
        self.in_place = (
            strip_scheme(self.dest_path).rstrip("/")
            == strip_scheme(source_path).rstrip("/")
        )
        self.source_format = source_format
        self.dest_format = dest_format
        self.partition_by = list(partition_by or [])
        self.sort_by = sort_by
        self.distinct = distinct
        self.drop = list(drop or [])
        self.compression = compression
        self.mode = mode
        self.max_records_per_file = max_records_per_file
        self.transform_func = transform_func
        self.with_snapshot = with_snapshot

    def read(self) -> DataFrame:
        ds = Dataset(self.spark, self.source_path, format=self.source_format)
        if self.drop:
            ds.drop(self.drop)
        if self.distinct:
            ds.distinct()
        df = ds.load()
        if self.transform_func is not None:
            df = self.transform_func(df)
        if self.sort_by:
            # cluster within partitions: preserves parquet stats locality
            # without a global sort barrier (Z-ORDER-lite)
            spec = _parse_sort_spec(self.sort_by)
            df = df.sortWithinPartitions(
                *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in spec]
            )
        return df

    def run(self) -> None:
        """Execute the rewrite. In-place rewrites go through a temp dir
        (Spark cannot overwrite its own input), optionally preceded by a
        TimeFly snapshot — mirroring the reference's guarded in-place
        overwrite + auto pre-snapshot (repartition.py:148-194)."""
        import posixpath

        from pydala_spark.dataset import generations
        from pydala_spark.utils.pathops import PathOps, strip_scheme

        # a generation-pointer dataset rewrites INSIDE its active
        # generation (matching the Dataset read below), keeping the
        # pointer layout intact instead of flattening it
        local = strip_scheme(
            generations.resolve(self.spark, self.source_path)
        ).rstrip("/")
        ops = PathOps(self.spark, local)
        if self.in_place and ops.is_dir(posixpath.join(local, "current")):
            # rewriting a TimeFly ROOT in place would delete current/ and
            # strand the snapshot layout — regardless of with_snapshot.
            # Checked BEFORE the read (the read of a root fails with its
            # own confusing schema error)
            raise ValueError(
                f"{self.source_path} is a TimeFly dataset root; point the "
                "in-place Repartition at its current/ subdirectory"
            )
        df = self.read()
        if not self.in_place:
            Writer(
                self.spark,
                self.dest_path,
                format=self.dest_format,
                mode=self.mode,
                partition_by=self.partition_by,
                compression=self.compression,
                max_records_per_file=self.max_records_per_file,
            ).write(df)
            return
        if self.with_snapshot:
            from pydala_spark.dataset.timefly import TimeFly

            parent = posixpath.dirname(local)
            if posixpath.basename(local) == "current" and any(
                ops.exists(posixpath.join(parent, side))
                for side in ("_dataset.json", "_dataset.toml")
            ):
                # the TimeFly lives at the PARENT of current/ — snapshot
                # there (TimeFly(local) would probe local/current, which
                # never exists, silently skipping the advertised snapshot)
                TimeFly(self.spark, parent, format=self.source_format).add_snapshot()

        tmp = local + "__repartition_tmp"
        Writer(
            self.spark,
            tmp,
            format=self.dest_format,
            mode="overwrite",
            partition_by=self.partition_by,
            compression=self.compression,
            max_records_per_file=self.max_records_per_file,
        ).write(df)
        # --- swap, crash-safely: nothing is DELETED until the rewrite is
        # fully in place. Old data files are MOVED out — to the TimeFly
        # snapshot archive when pointer manifests reference this current/
        # (deleting them would permanently break every pointer snapshot;
        # parked files stay resolvable and delete_snapshot's GC reclaims
        # the unreferenced ones), else to a __prepartition side dir
        # dropped only after the move-in succeeds. A crash at any point
        # leaves every byte in local, the side dir, the archive, or tmp.
        parent = posixpath.dirname(local)
        snap_dir = posixpath.join(parent, "snapshot")
        has_manifests = posixpath.basename(local) == "current" and any(
            e.endswith(".manifest.json") for e in ops.list_dir(snap_dir)
        )
        pre = local + "__prepartition"
        ops.delete(pre)
        park_root = posixpath.join(snap_dir, "archive") if has_manifests else pre
        for p, _sz in ops.data_files(local):
            rel = p[len(local):].lstrip("/")
            ops.rename(p, posixpath.join(park_root, rel))
        for entry in ops.list_dir(local):
            # drop now-empty partition dirs and stale markers; every
            # sidecar survives (snapshot/, _dataset.*, _pydala.toml, the
            # generation provenance _inputs.json, ...)
            if entry == "snapshot" or entry.startswith(("_", ".")):
                continue
            ops.delete(posixpath.join(local, entry))
        for entry in ops.list_dir(tmp):
            if entry.startswith(("_", ".")):  # tmp's own _SUCCESS marker
                continue
            ops.rename(posixpath.join(tmp, entry), posixpath.join(local, entry))
        ops.delete(pre)
        ops.delete(tmp)
        if self.distinct:
            # the rewrite REMOVED rows — any surviving signature sidecar
            # is stale (pure repartition/sort preserves content and keeps
            # its sidecars valid; distinct is the one content-changing
            # knob on this path). Same unsigned-write rule as Writer (r8).
            from pydala_spark.dataset.maintain import SIGNATURES_DIR

            ops.delete(posixpath.join(local, SIGNATURES_DIR))
        self.spark.catalog.refreshByPath(self.source_path)
