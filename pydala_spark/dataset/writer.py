"""Writer: partitioned dataset writes with append/overwrite/error/delta.

Reference parity (SURVEY.md §2.2):

- write modes append / overwrite / raise (src/pydala/dataset/writer.py:185-256)
- **delta mode**: append only rows not already in the dataset — full-row
  EXCEPT-DISTINCT semantics or subset-keyed null-safe anti-join, optionally
  restricted to a ``[start_time, end_time)`` window on a datetime column
  (writer.py:219-249 + src/pydala/utils/table.py:135-228)
- hive-partitioned writes (writer.py:130-137, 149-162, 462-498) — Spark's
  shuffle-based ``partitionBy`` replaces the reference's per-partition loop
- time-interval batch ingestion with the ``"1d"``/``"3mo"`` grammar
  (writer.py:292-385) — realized as a derived bucket partition column
  instead of a driver-side loop
- per-batch ``transform_func`` hook (writer.py:486-490)
- zstd default compression (writer.py:33)
- schema-unification rewrite (writer.py:529-571)

Scale: every mode is a single distributed write; the delta diff is a
shuffled anti-join (or set subtract) whose existing-side scan is pruned by
the datetime window — at 100 TB, keep datasets partitioned by a time
column so the window prunes partitions, and the diff only touches the
overlapping slice.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydala_spark.session import configure_session

WRITE_MODES = (
    "append", "overwrite", "overwrite_partitions", "error", "raise", "delta",
    "upsert",
)

#: row cap for the single-file feather driver bridge (VERDICT r12 #5):
#: ~2M narrow rows is comfortably inside a 4g driver while being far
#: above any sidecar/interchange file; env-overridable at the use site.
FEATHER_BRIDGE_MAX_ROWS = 2_000_000

#: unit aliases from the reference's batch-size grammar
#: (src/pydala/dataset/writer.py:312-334).
_UNIT_ALIASES = {
    "microseconds": "microsecond", "micro": "microsecond", "u": "microsecond",
    "us": "microsecond",
    "milliseconds": "millisecond", "milli": "millisecond", "ms": "millisecond",
    "seconds": "second", "sec": "second", "s": "second",
    "minutes": "minute", "miuntes": "minute", "min": "minute", "t": "minute",
    "hours": "hour", "h": "hour",
    "days": "day", "d": "day",
    "weeks": "week", "w": "week",
    "months": "month", "mo": "month", "m": "month",
    "years": "year", "y": "year", "a": "year",
}
# canonical singular forms parse as themselves ("1day", "2hour") — the
# property fuzz found they fell through the alias table
_UNIT_ALIASES.update(
    {u: u for u in (
        "microsecond", "millisecond", "second", "minute", "hour",
        "day", "week", "month", "year",
    )}
)


def parse_interval(spec: str) -> tuple[int, str]:
    """Parse ``"1d"``, ``"3mo"``, ``"15min"`` into ``(n, unit)``
    (reference grammar writer.py:300-334; defaults: n=1, unit=year)."""
    unit_match = re.findall("[a-z]+", spec.lower())
    val_match = re.findall("[0-9]+", spec)
    unit = _UNIT_ALIASES.get(unit_match[0] if unit_match else "y")
    if unit is None:
        raise ValueError(f"unknown interval unit in {spec!r}")
    return (int(val_match[0]) if val_match else 1), unit


def bucket_column(col: str, spec: str) -> F.Column:
    """Tumbling-window bucket start for a timestamp column — the Spark
    form of the reference's generate_series time grid (writer.py:342-375).
    """
    n, unit = parse_interval(spec)
    if unit in ("microsecond", "millisecond"):
        # sub-second grids: arithmetic on epoch micros
        micros = F.unix_micros(F.col(col))
        width = n if unit == "microsecond" else n * 1000
        return F.timestamp_micros((F.floor(micros / width) * width).cast("long"))
    if n == 1 and unit in ("second", "minute", "hour", "day", "week", "month", "year"):
        return F.date_trunc(unit, F.col(col))
    if unit == "week":
        # Monday-anchored (ISO) for ANY n, matching date_trunc('week')
        # at n=1 — the generic epoch-seconds grid would anchor weeks at
        # Thursday 1970-01-01, so '1w' and '2w' datasets would sit on
        # phase-shifted grids
        days = F.datediff(F.col(col), F.lit("1969-12-29"))
        start = (F.floor(days / (7 * n)) * (7 * n)).cast("int")
        return F.to_timestamp(F.date_add(F.lit("1969-12-29").cast("date"), start))
    if unit in ("second", "minute", "hour", "day"):
        seconds = {"second": 1, "minute": 60, "hour": 3600,
                   "day": 86400}[unit] * n
        epoch = F.unix_timestamp(F.col(col))
        return F.timestamp_seconds((F.floor(epoch / seconds) * seconds).cast("long"))
    # n-month / n-year grids anchored at epoch
    months_per = n * (12 if unit == "year" else 1)
    months = (F.year(F.col(col)) - F.lit(1970)) * 12 + F.month(F.col(col)) - 1
    start = (F.floor(months / months_per) * months_per).cast("int")
    # pmod, not %: Spark's % follows the dividend's sign, so pre-1970
    # timestamps (negative month offsets) would produce month 0/-1 —
    # an ANSI DATETIME_FIELD_OUT_OF_BOUNDS error or a NULL bucket
    return F.to_timestamp(
        F.make_date(
            F.lit(1970) + F.floor(start / 12).cast("int"),
            (F.pmod(start, F.lit(12)) + 1).cast("int"),
            F.lit(1),
        )
    )


def _hive_escape_partition_value(val) -> str:
    """Format a partition VALUE the way Spark writes its directory name:
    Hive path-escaping (the shared
    :func:`~pydala_spark.utils.pathops.escape_partition_value` table —
    one copy, so the writer's upsert probes and the catalog's partition
    deletes can never drift) over Spark's value rendering (booleans
    lowercase, timestamps space-separated). Mismatch here means upsert
    probes directories that don't exist — guarded by an existence check
    at the swap, but correct construction is what makes the swap work."""
    import datetime as _dt

    from pydala_spark.utils.pathops import escape_partition_value

    if val is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(val, bool):
        s = "true" if val else "false"
    elif isinstance(val, _dt.datetime):
        s = val.isoformat(sep=" ")
    else:
        s = str(val)
    return escape_partition_value(s)


def _null_safe_anti_join(
    incoming: DataFrame, existing: DataFrame, on: Sequence[str]
) -> DataFrame:
    """Rows of ``incoming`` whose key tuple is absent from ``existing``,
    treating NULL==NULL (the reference's EXCEPT-based key diff is
    null-safe — utils/table.py:158-185)."""
    ex = existing.select(*on).dropDuplicates(list(on)).alias("__ex")
    inc = incoming.alias("__in")
    cond = None
    for c in on:
        clause = F.col(f"__in.{c}").eqNullSafe(F.col(f"__ex.{c}"))
        cond = clause if cond is None else cond & clause
    return inc.join(ex, cond, "left_anti")


def tables_diff(
    incoming: DataFrame,
    existing: DataFrame,
    subset: Sequence[str] | None = None,
) -> DataFrame:
    """The reference's ``get_tables_diff`` (utils/table.py:135-228).

    Full-row: SQL ``EXCEPT`` (distinct) semantics — deduplicates the
    incoming side too; Spark's ``subtract`` implements exactly that,
    null-safe. Subset-keyed: ALL incoming rows whose key tuple does not
    occur in ``existing`` (incoming-internal duplicates are kept,
    matching the reference's is_in filter, utils/table.py:183-185).
    """
    if subset:
        return _null_safe_anti_join(incoming, existing, subset)
    missing = [c for c in incoming.columns if c not in existing.columns]
    if missing:
        raise ValueError(f"existing dataset lacks columns {missing} for full-row diff")
    aligned = existing.select(
        *[F.col(c).cast(dict(incoming.dtypes)[c]) for c in incoming.columns]
    )
    return incoming.subtract(aligned)


class Writer:
    """Partitioned dataset writer.

    >>> Writer(spark, "/lake/events", partition_by=["event_type"]).write(
    ...     df, mode="delta", delta_subset=["event_id"], datetime_column="ts")
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        format: str = "parquet",
        mode: str = "append",
        partition_by: str | Sequence[str] | None = None,
        compression: str = "zstd",
        max_records_per_file: int | None = None,
        filename_scheme: str = "spark",
        base_name: str = "data",
        partition_flavor: str = "hive",
        signatures: Sequence[str] | None = None,
        signature_kwargs: dict | None = None,
    ):
        if mode not in WRITE_MODES:
            raise ValueError(f"mode must be one of {WRITE_MODES}")
        if filename_scheme not in ("spark", "reference"):
            raise ValueError("filename_scheme must be 'spark' or 'reference'")
        if partition_flavor not in ("hive", "directory"):
            raise ValueError("partition_flavor must be 'hive' or 'directory'")
        self.spark = configure_session(spark)
        # appends/overwrites on a generation-pointer dataset land inside
        # the ACTIVE generation (dataset/generations.py) and are carried
        # forward by the next maintenance pass; re-resolved at every
        # write() so a long-lived Writer (streaming foreachBatch) follows
        # generation advances made by ride-along compaction
        from pydala_spark.dataset import generations

        self._orig_path = path
        self.path = generations.resolve(self.spark, path)
        self.format = format.lower()
        self.mode = mode
        self.partition_by = (
            [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
        )
        self.compression = compression
        self.max_records_per_file = max_records_per_file
        self.filename_scheme = filename_scheme
        self.base_name = base_name
        #: "directory" writes bare-value partition dirs (``2024/eu/``
        #: instead of ``year=2024/region=eu/``) — the WRITE side of the
        #: reference's pyarrow DirectoryPartitioning (reference
        #: dataset/writer.py:136-137; read side: Dataset(partitioning=)).
        #: SURVEY §7.4 accepted this as a divergence; round 5 closes it.
        self.partition_flavor = partition_flavor
        #: signature ride-along (round 6): kinds for
        #: maintain.materialize_signatures to run on each batch AFTER a
        #: successful write — the W9 per-batch-hook seam (reference
        #: dataset/writer.py:486-490) applied to the "hash the corpus
        #: once at ingest" pattern. Appends sign only the landed rows
        #: (delta mode: only the diff); a full overwrite rewrites the
        #: sidecar. signature_kwargs passes id_col/text_col/k/seed etc.
        #: Crash semantics: the data write commits before the sidecar
        #: write — a crash between the two leaves the batch unsigned
        #: (a delta re-run writes no rows, so it will NOT re-sign);
        #: heal with maintain.materialize_signatures over the dataset,
        #: which is idempotent.
        self.signatures = list(signatures or [])
        self.signature_kwargs = dict(signature_kwargs or {})

    # -- input coercion (reference to_relation, utils/table.py:58-92) --------

    def _coerce(self, data) -> DataFrame:
        if isinstance(data, DataFrame):
            return data
        if isinstance(data, str):
            # read the source in THIS writer's format (a csv writer fed
            # a csv dataset path must not scan it as parquet)
            if self.format in ("feather", "ipc", "arrow"):
                from pydala_spark.sources import read as _bridge_read

                return _bridge_read(self.spark, data, format="feather")
            from pydala_spark.dataset.reader import Dataset

            return Dataset(self.spark, data, format=self.format).load()
        try:
            import pyarrow as pa

            if isinstance(data, (pa.Table, pa.RecordBatch)):
                return self.spark.createDataFrame(
                    data.to_pandas() if isinstance(data, pa.RecordBatch) else data
                )
        except ImportError:  # pragma: no cover
            pass
        # pandas / polars / anything createDataFrame understands
        return self.spark.createDataFrame(data)

    def _existing_partitioning(self) -> list[str] | None:
        """Hive partition columns of the existing dataset, from file paths
        (schema.infer_partitioning — reference timefly.py:105-112).
        Listed through the Hadoop FileSystem, so this works on any scheme
        the Spark conf resolves (s3a/gs/abfs/...), not just local POSIX."""
        from pydala_spark.schema import infer_partitioning
        from pydala_spark.utils.pathops import PathOps, strip_scheme

        ops = PathOps(self.spark, self.path)
        base = strip_scheme(self.path).rstrip("/")
        rels = [
            p[len(base):].lstrip("/")
            for p, _ in ops.data_files(self.path)
            if p.startswith(base)
        ]
        return infer_partitioning(rels)

    def _dataset_exists(self) -> bool:
        from pydala_spark.utils.pathops import PathOps

        ops = PathOps(self.spark, self.path)
        if ops.is_file(self.path):  # single-file target (feather bridge)
            return True
        return bool(ops.data_files(self.path))

    # -- the write ------------------------------------------------------------

    def write(
        self,
        data,
        mode: str | None = None,
        delta_subset: Sequence[str] | None = None,
        datetime_column: str | None = None,
        start_time=None,
        end_time=None,
        time_bucket: str | None = None,
        transform_func: Callable[[DataFrame], DataFrame] | None = None,
        transform_func_kwargs: dict | None = None,
        skip_empty: bool = True,
    ) -> None:
        """Write ``data`` (DataFrame / arrow / pandas / path) to the dataset.

        ``time_bucket`` ("1d", "6h", "3mo", ...) derives a tumbling-window
        bucket column used as the leading physical partition — one
        shuffle-partitioned write replaces the reference's per-slice driver
        loop (writer.py:292-385).

        Delta mode divergence (documented): when the window bounds default
        to the batch min/max, the end bound is treated as *inclusive* so
        rows at exactly the max timestamp are still written — the
        reference's half-open default drops them (writer.py:196-200 +
        :227-240). Explicit ``end_time`` keeps half-open semantics.
        """
        from pydala_spark.dataset import generations

        # follow any generation advance since construction (one probe)
        self.path = generations.resolve(self.spark, self._orig_path)
        df = self._coerce(data)
        if transform_func is not None:
            df = transform_func(df, **(transform_func_kwargs or {}))

        mode = mode or self.mode
        if mode not in WRITE_MODES:
            raise ValueError(f"mode must be one of {WRITE_MODES}")
        if self.signatures and mode in ("upsert", "overwrite_partitions"):
            # both modes REPLACE existing rows, whose sidecar entries
            # would silently go stale (append) or survive a partition
            # swap (overwrite) — re-run materialize_signatures after
            # such maintenance instead of trusting a wrong sidecar
            raise ValueError(
                "signature ride-along supports append/overwrite/delta/"
                f"error modes, not mode={mode!r} — re-materialize "
                "signatures after row-replacing writes"
            )

        if time_bucket and not datetime_column:
            raise TypeError("datetime_column must be set when time_bucket is used")

        exists = self._dataset_exists()
        if (
            self.partition_flavor == "directory"
            and exists
            and not self.partition_by
            and not time_bucket
            # a full overwrite deletes the whole layout first — nothing
            # to inherit, nothing to mis-read (r5 review); only modes
            # that land files NEXT TO the existing layout need the guard
            and mode not in ("error", "raise", "overwrite")
        ):
            # bare-value layouts carry no column names, so nothing can be
            # inherited: a flat append onto a depth>0 directory layout
            # would land files the partition parser mis-reads. Fail loud.
            from pydala_spark.utils.pathops import PathOps, strip_scheme

            ops = PathOps(self.spark, self.path)
            base = strip_scheme(self.path).rstrip("/")
            if any(
                "/" in p[len(base):].lstrip("/")
                for p, _ in ops.data_files(self.path)
                if p.startswith(base)
            ):
                raise ValueError(
                    "partition_flavor='directory' dataset has a partitioned "
                    "layout but no partition_by was given — bare-value dirs "
                    "carry no column names to inherit; pass partition_by "
                    "matching the existing directory depth"
                )
        spark_mode = "append"
        if mode in ("error", "raise"):
            if exists:
                raise FileExistsError(
                    f"Path '{self.path}' already exists. Use mode='overwrite' or 'append'."
                )
        elif mode == "overwrite":
            spark_mode = "overwrite"
        elif mode == "overwrite_partitions":
            # dynamic partition overwrite: replace only the partitions
            # present in the incoming data — the scale-friendly variant of
            # the reference's rm-everything overwrite (writer.py:210-214):
            # a daily re-run rewrites one day, not the dataset.
            spark_mode = "overwrite"
        elif mode == "delta" and exists:
            df = self._delta_diff(df, delta_subset, datetime_column, start_time, end_time)
        elif mode == "upsert":
            if not delta_subset:
                raise ValueError("mode='upsert' needs delta_subset key columns")
            if self.partition_flavor == "directory":
                raise ValueError(
                    "mode='upsert' is not supported with "
                    "partition_flavor='directory' — the partition-swap "
                    "path keys on hive col=value directories"
                )
            if exists:
                self._upsert(df, delta_subset)
                # the early return skips the ride-along block below, and
                # an upsert REPLACES rows — any existing sidecar is now
                # stale (the ctor guard already rejects signatures= with
                # this mode, so there is never a fresh one to keep)
                self._invalidate_signatures()
                self._apply_filename_scheme()
                return
            # first write: plain append lays the dataset down

        delta_cached = False
        if skip_empty and spark_mode == "append":
            if mode == "delta" and exists:
                # the diff plan contains the existing-side scan + anti-
                # join; probing it uncached would run that whole plan
                # once for isEmpty and AGAIN for the write.
                # localCheckpoint, NOT persist (round 8): the append
                # below lands in the very path the diff's existing side
                # scans, and Spark's recacheByPath then RE-EXECUTES a
                # merely-persisted plan against the new file listing —
                # every post-write consumer (the signature ride-along)
                # saw an EMPTY diff and silently signed zero rows.
                # Checkpointing truncates the lineage to a LogicalRDD
                # with no path dependency, so the landed rows stay
                # readable after the write. Storage is freed when the
                # RDD is GC'd (the q_fingerprint_winnowing pattern).
                df = df.localCheckpoint(eager=True)
                delta_cached = True
            if df.isEmpty():
                # empty-write gate (reference checks rel.shape[0] before
                # every write, SURVEY §2.6 A3) — keeps delta no-ops from
                # littering the dataset with empty part files.
                if delta_cached:
                    df.unpersist()
                return
        try:
            self._write_resolved(
                df, mode, spark_mode, exists, datetime_column, time_bucket
            )
            if self.signatures:
                # inside the try: delta mode's diff frame is still
                # persisted here, so signing the landed rows re-reads
                # the cached diff instead of re-running the anti-join
                from pydala_spark.dataset.maintain import (
                    materialize_signatures,
                )

                materialize_signatures(
                    self.spark, df, self.path,
                    kinds=self.signatures,
                    mode="overwrite" if spark_mode == "overwrite" else "append",
                    **self.signature_kwargs,
                )
            else:
                # round 8 (r7 review): a write WITHOUT the ride-along
                # mutates the corpus out from under any existing
                # signature sidecars — delete them so the next consumer
                # re-materializes (loud missing-sidecar path) instead of
                # serving stale hashes to a reader that skipped
                # verify_against. Ride-along writers above keep theirs
                # fresh (markers fold); this only fires on the mismatch.
                self._invalidate_signatures()
        finally:
            if delta_cached:
                df.unpersist()
        if self.partition_flavor == "directory":
            self._dehive_layout(mode)
        self._apply_filename_scheme()

    def _invalidate_signatures(self) -> None:
        """Delete any ``_signatures`` sidecars under the dataset base: a
        write that did not carry the signature ride-along just mutated
        the text the sidecars were hashed from, so keeping them would
        hand every verify-less consumer silently-stale fingerprints —
        the exact failure the content marker exists to catch, closed at
        the source instead (r7 review item 4). The next sweep
        re-materializes (Datalake.decontaminate does so automatically)."""
        import posixpath

        from pydala_spark.dataset.maintain import SIGNATURES_DIR
        from pydala_spark.utils.pathops import PathOps

        sig_dir = posixpath.join(self.path, SIGNATURES_DIR)
        po = PathOps(self.spark, sig_dir)
        if po.is_dir(sig_dir):
            po.delete(sig_dir, recursive=True)

    def _dehive_layout(self, mode: str) -> None:
        """Convert the hive ``col=value/`` directories THIS write
        produced into bare-value directories (``2024/eu/``) — the WRITE
        side of directory-flavor partitioning (reference
        dataset/writer.py:136-137; pyarrow DirectoryPartitioning).
        Round 5 closes what SURVEY §7.4 had accepted as a divergence.

        Invariant: an established directory-flavor dataset contains NO
        hive dirs (every prior write dehived them), so every ``col=``
        directory found here belongs to the current write. Metadata-only
        cost: one listing + one rename per new file (object stores:
        copy+delete, same caveat as compact). For
        ``overwrite_partitions`` the touched partitions' bare dirs are
        cleared BEFORE the move — Spark's dynamic overwrite only
        replaced the hive-side dirs it could see, and merging into the
        old bare files would resurrect replaced data. That clear+move
        is NOT atomic (same caveat ``maintain.compact``'s swap and
        PathOps.rename carry): a crash between the delete and the last
        rename leaves the new files under ``col=value`` dirs that a
        flavor reader skips until the next write's dehive pass — rerun
        the write (idempotent: the moves resume) to heal. Appends into
        existing bare dirs are collision-free (Spark part names embed a
        job UUID). Reads go through ``Dataset(partitioning=[...])``;
        appends must re-pass ``partition_by`` (bare layouts carry no
        column names to inherit — documented flavor contract)."""
        import posixpath

        from pydala_spark.utils.pathops import PathOps, strip_scheme

        ops = PathOps(self.spark, self.path)
        base = strip_scheme(self.path).rstrip("/")
        moves: list[tuple[str, str]] = []
        hive_tops: set[str] = set()
        targets: set[str] = set()
        for p, _ in ops.data_files(self.path):
            rel = p[len(base):].lstrip("/") if p.startswith(base) else None
            if not rel:
                continue
            segs = rel.split("/")
            dirs = segs[:-1]
            if not any("=" in s and not s.startswith("_") for s in dirs):
                continue
            bare = [s.split("=", 1)[1] if "=" in s else s for s in dirs]
            moves.append((p, posixpath.join(base, *bare, segs[-1])))
            targets.add(posixpath.join(base, *bare))
            hive_tops.add(next(s for s in dirs if "=" in s))
        if not moves:
            return
        if mode == "overwrite_partitions":
            for t in sorted(targets):
                ops.delete(t)
        for src, dst in moves:
            ops.rename(src, dst)
        for top in hive_tops:
            # the now-empty hive tree (rename created the bare one)
            ops.delete(posixpath.join(base, top))

    def _apply_filename_scheme(self) -> None:
        """Opt-in reference filename compatibility (SURVEY §7.4 W2, which
        accepted Spark's ``part-*`` names as a divergence): with
        ``filename_scheme="reference"`` every write finishes by renaming
        part files to the reference's ``{base}-{YYYYmmdd_HHMMSSfff}-{seq}
        .{ext}`` scheme (reference src/pydala/dataset/writer.py:141) via
        :func:`pydala_spark.dataset.maintain.normalize_filenames`.
        Metadata-only (one listing + one FileSystem rename per NEW file —
        already-conformant files are skipped, so appends touch only the
        files this write produced). Skipped for the single-file feather
        bridge target, which the reference names explicitly anyway."""
        if self.filename_scheme != "reference":
            return
        from pydala_spark.dataset.maintain import normalize_filenames
        from pydala_spark.utils.pathops import PathOps

        if PathOps(self.spark, self.path).is_file(self.path):
            return
        normalize_filenames(self.spark, self.path, base_name=self.base_name)

    def _write_resolved(
        self,
        df: DataFrame,
        mode: str,
        spark_mode: str,
        exists: bool,
        datetime_column: str | None,
        time_bucket: str | None,
    ) -> None:

        # derive the time bucket BEFORE the inheritance gate: a repeat
        # append to a time-bucketed dataset inherits ['bucket'] from the
        # existing layout, and the column must exist by then
        if time_bucket:
            df = df.withColumn("bucket", bucket_column(datetime_column, time_bucket))
        partition_cols = list(self.partition_by)
        if not partition_cols and exists and (
            spark_mode == "append" or mode == "overwrite_partitions"
        ):
            # Inherit the existing hive layout: appending flat files into a
            # partitioned dataset would land them at the root, where Spark's
            # partition discovery silently ignores them on read; and a
            # dynamic partition overwrite without partitionBy degrades to a
            # full-dataset overwrite (silent loss of absent partitions).
            inherited = self._existing_partitioning()
            if inherited:
                missing = [c for c in inherited if c not in df.columns]
                if missing:
                    raise ValueError(
                        f"dataset at {self.path} is partitioned by {inherited} "
                        f"but the incoming data lacks columns {missing}"
                    )
                partition_cols = inherited
        if time_bucket and "bucket" not in partition_cols:
            partition_cols = ["bucket"] + partition_cols
        if mode == "overwrite_partitions" and not partition_cols:
            raise ValueError(
                "mode='overwrite_partitions' needs partition columns "
                "(partition_by=, time_bucket=, or an existing hive layout to "
                "inherit) — without partitionBy the dynamic overwrite would "
                "silently replace the WHOLE dataset"
            )

        if self.format in ("feather", "ipc", "arrow"):
            if partition_cols:
                raise ValueError(
                    "feather/IPC write is a single-file driver bridge and does "
                    "not support partitioning — use parquet for partitioned data"
                )
            self._write_feather(df, spark_mode)
            return

        compression = self.compression
        if self.format in ("csv", "json") and compression == "zstd":
            # zstd is parquet/feather-native; the hadoop text codecs don't
            # ship it — degrade to gzip (still transparent on read) rather
            # than silently writing uncompressed text
            compression = "gzip"
        writer = df.write.mode(spark_mode).option("compression", compression)
        if mode == "overwrite_partitions":
            writer = writer.option("partitionOverwriteMode", "dynamic")
        if self.max_records_per_file:
            writer = writer.option("maxRecordsPerFile", str(self.max_records_per_file))
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        if self.format == "parquet":
            writer.parquet(self.path)
        elif self.format == "csv":
            writer.option("header", True).csv(self.path)
        elif self.format == "json":
            writer.json(self.path)
        elif self.format == "orc":
            writer.orc(self.path)
        else:
            raise ValueError(f"unsupported write format {self.format!r}")

    def _write_feather(self, df: DataFrame, spark_mode: str) -> None:
        """Feather/IPC write. A path ending in .feather/.ipc/.arrow is a
        SINGLE-FILE driver bridge (append concatenates through Arrow —
        sidecar/interchange files only); a directory path is a
        DISTRIBUTED dataset write via :func:`write_feather_dataset` —
        one part-file per partition, no driver materialization
        (reference writes feather natively per batch, writer.py:390-427).
        """
        import pyarrow as pa
        import pyarrow.feather as pf

        local = self.path.removeprefix("file:")
        is_single = local.lower().endswith((".feather", ".ipc", ".arrow"))
        if not is_single:
            write_feather_dataset(
                self.spark, df, self.path,
                mode="overwrite" if spark_mode == "overwrite" else "append",
                compression=self.compression,
            )
            return
        # hard small-data guard (VERDICT r12 #5): the single-file form
        # materializes on the driver, so enforce the docstring's
        # sidecar/interchange-only caveat instead of trusting it — a
        # misuse at data scale should fail HERE, loudly, not as a
        # driver OOM. The cap is rows (the cheap pre-collect signal);
        # override via SPARK_GRAFT_FEATHER_BRIDGE_MAX_ROWS for hosts
        # with known-larger driver headroom.
        max_rows = int(
            os.environ.get("SPARK_GRAFT_FEATHER_BRIDGE_MAX_ROWS", "")
            or FEATHER_BRIDGE_MAX_ROWS
        )
        # A plain count() is the scale-safe probe here, measured against
        # the two alternatives: count prunes every unused projection
        # (a wide sha2 column costs 0.21 s to count vs 0.39 s through a
        # limit probe at sf0.1) and tree-reduces per-partition partial
        # counts, so the "double computation" before toPandas is mostly
        # pruned away; limit(cap+1).count() plans
        # Exchange SinglePartition under GlobalLimit — every partition
        # may funnel up to cap rows into ONE reducer, exactly the shape
        # that falls over at misuse scale; persist() before counting
        # forces full column materialization that count alone avoids.
        n_rows = df.count()
        if n_rows > max_rows:
            raise ValueError(
                f"single-file feather write of {n_rows} rows exceeds the "
                f"driver-bridge cap ({max_rows}); this path is for sidecar/"
                "interchange files only — write to a DIRECTORY target for "
                "the distributed feather dataset form "
                "(write_feather_dataset), or use parquet"
            )
        table = pa.Table.from_pandas(df.toPandas(), preserve_index=False)
        comp = self.compression if self.compression in ("zstd", "lz4") else "uncompressed"
        if "://" in self.path:
            # remote single-file bridge (round 5 — previously raised):
            # GET the existing file for append, write a local temp, PUT
            # through the Hadoop FileSystem, so the bridge works on any
            # configured scheme. Still a driver bridge — sidecar and
            # interchange files only, use directory targets for data.
            import tempfile

            from pydala_spark.utils.pathops import PathOps

            ops = PathOps(self.spark, self.path)
            with tempfile.TemporaryDirectory() as tmp:
                scratch = os.path.join(tmp, "bridge.feather")
                if spark_mode == "append" and ops.is_file(self.path):
                    ops.get_file(self.path, scratch)
                    existing = pf.read_table(scratch)
                    table = pa.concat_tables(
                        [existing, table], promote_options="default"
                    )
                pf.write_feather(table, scratch, compression=comp)
                ops.put_file(scratch, self.path)
            return
        if spark_mode == "append" and os.path.exists(local):
            existing = pf.read_table(local)
            table = pa.concat_tables([existing, table], promote_options="default")
        os.makedirs(os.path.dirname(local) or ".", exist_ok=True)
        pf.write_feather(table, local, compression=comp)

    def _upsert(self, df: DataFrame, keys: Sequence[str]) -> None:
        """Update-or-insert by key: incoming rows replace existing rows
        with the same (null-safe) key tuple; everything else survives.

        Scale shape: on a hive-partitioned dataset only the partitions
        the batch TOUCHES are read, rewritten and swapped — the batch's
        distinct partition tuples come to the driver (small: it's the
        partition count, not rows), prune the existing read (partition
        pruning keeps it a metadata operation), and name the directories
        to swap. The rewrite stages into a sibling directory and swaps
        per-partition-directory via rename (atomic on HDFS/local;
        copy+delete on object stores — same caveat as compact). An
        unpartitioned dataset is read, merged and swapped whole.

        The upsert key should align with the partition key at scale: an
        incoming row whose key exists in an UNTOUCHED partition (key and
        partition disagree) is appended, not replaced — documented
        limitation of partition-pruned upserts.
        """
        import posixpath

        from pydala_spark.dataset.reader import Dataset
        from pydala_spark.utils.pathops import PathOps, strip_scheme

        if self.format in ("feather", "ipc", "arrow"):
            raise ValueError("mode='upsert' is not supported for the feather bridge")
        missing = [k for k in keys if k not in df.columns]
        if missing:
            raise ValueError(f"upsert keys missing from incoming data: {missing}")

        local = strip_scheme(self.path).rstrip("/")
        ops = PathOps(self.spark, local)
        part_cols = list(self.partition_by) or (self._existing_partitioning() or [])
        existing = Dataset(self.spark, self.path, format=self.format).load()

        touched_dirs: list[str] | None = None
        if part_cols:
            pmissing = [c for c in part_cols if c not in df.columns]
            if pmissing:
                raise ValueError(
                    f"upsert into a dataset partitioned by {part_cols} needs "
                    f"those columns in the incoming data; missing {pmissing}"
                )
            touched = df.select(*part_cols).distinct().collect()
            # directory names must match what SPARK writes: values are
            # Hive-escaped (':' in a timestamp becomes %3A, booleans
            # lowercase) — raw str(value) would probe names that don't
            # exist and silently drop the staged merge
            touched_dirs = [
                "/".join(
                    f"{c}={_hive_escape_partition_value(r[c])}"
                    for c in part_cols
                )
                for r in touched
            ]
            pred = None
            for r in touched:
                clause = None
                for c in part_cols:
                    t = F.col(c).eqNullSafe(F.lit(r[c]))
                    clause = t if clause is None else (clause & t)
                pred = clause if pred is None else (pred | clause)
            existing = existing.where(pred)

        survivors = _null_safe_anti_join(existing, df, keys)
        merged = survivors.unionByName(df.select(*survivors.columns))

        tmp = local + "__upserting"
        ops.delete(tmp)
        writer = merged.write.mode("overwrite").format(self.format)
        if self.format in ("parquet", "orc"):
            writer = writer.option("compression", self.compression)
        elif self.format == "csv":
            writer = writer.option("header", True)
        if self.max_records_per_file:
            writer = writer.option("maxRecordsPerFile", self.max_records_per_file)
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.save(tmp)

        if touched_dirs is not None:
            for rel in touched_dirs:
                src = posixpath.join(tmp, rel)
                dst = posixpath.join(local, rel)
                src_exists = ops.exists(src)
                if not src_exists and not ops.exists(dst):
                    # the constructed name matches NEITHER the staged
                    # output nor the dataset: a partition-value
                    # formatting mismatch. Raising (with tmp left on
                    # disk) beats silently discarding the merge.
                    raise RuntimeError(
                        f"upsert: partition directory {rel!r} not found "
                        f"in staging or dataset — partition-value "
                        f"escaping/formatting mismatch; staged data "
                        f"preserved at {tmp!r}"
                    )
                ops.delete(dst)
                if src_exists:  # a touched partition can merge to empty
                    ops.rename(src, dst)
            # data FILES (not the empty parent dirs multi-level renames
            # leave behind) still in staging mean Spark named a partition
            # differently than we constructed it
            leftover = [p for p, _sz in ops.data_files(tmp)]
            if leftover:
                # Spark staged partition dirs under names we did not
                # construct — deleting tmp would discard merged rows
                raise RuntimeError(
                    f"upsert: staged partition dir(s) {leftover} do not "
                    f"match any constructed touched-partition name; "
                    f"staged data preserved at {tmp!r}"
                )
        else:
            for p, _ in ops.data_files(local):
                ops.delete(p)
            for entry in ops.list_dir(tmp):
                if entry == "_SUCCESS" or entry.endswith(".crc"):
                    continue
                ops.rename(posixpath.join(tmp, entry), posixpath.join(local, entry))
        ops.delete(tmp)
        self.spark.catalog.refreshByPath(local)

    def _delta_diff(
        self,
        df: DataFrame,
        delta_subset: Sequence[str] | None,
        datetime_column: str | None,
        start_time,
        end_time,
    ) -> DataFrame:
        if self.format in ("feather", "ipc", "arrow"):
            # Dataset has no feather reader; the driver-side bridge does
            from pydala_spark.sources import read as _bridge_read

            existing = _bridge_read(self.spark, self.path, format="feather")
        else:
            from pydala_spark.dataset.reader import Dataset

            existing = Dataset(self.spark, self.path, format=self.format).load()
        if "bucket" in existing.columns and "bucket" not in df.columns:
            existing = existing.drop("bucket")
        incoming = df
        if datetime_column:
            defaulted_end = end_time is None
            if start_time is None or end_time is None:
                bounds = incoming.agg(
                    F.min(datetime_column).alias("lo"), F.max(datetime_column).alias("hi")
                ).first()
                start_time = start_time if start_time is not None else bounds["lo"]
                end_time = end_time if end_time is not None else bounds["hi"]
            lo, hi = F.lit(start_time), F.lit(end_time)
            upper = (F.col(datetime_column) <= hi) if defaulted_end else (
                F.col(datetime_column) < hi
            )
            window = (F.col(datetime_column) >= lo) & upper
            incoming = incoming.where(window)
            existing = existing.where(window)  # prunes partitions at scale
        return tables_diff(incoming, existing, subset=delta_subset)

    # -- maintenance: schema-unification rewrite (writer.py:529-571) ----------

    def unify_schema(self, sort_columns: bool = False) -> bool:
        """Rewrite the dataset so every file conforms to the unified schema.

        Returns True if a rewrite happened. Parquet-only (the unified
        schema is built from parquet footers). Hive partition columns live
        in directory names, not footers, so they are re-attached to the
        projection and the rewrite preserves the partition layout —
        otherwise a partitioned mixed-schema dataset would lose its
        partition-column values permanently. Local-path implementation
        (write-aside then swap); on object stores prefer table formats
        with schema evolution.
        """
        from pydala_spark import schema as schema_mod
        from pydala_spark.dataset.reader import Dataset

        if self.format != "parquet":
            raise ValueError(
                f"unify_schema supports parquet datasets only, not {self.format!r}"
            )
        unified, equal = schema_mod.unified_dataset_schema(self.path)
        if equal:
            return False
        if sort_columns:
            unified = schema_mod.sort_schema(unified)
        part_cols = self._existing_partitioning() or []
        df = Dataset(self.spark, self.path, format=self.format).load()
        footer_names = [f.name for f in unified]
        names = footer_names + [c for c in part_cols if c not in footer_names]
        df = df.select(*names)
        tmp = self.path.rstrip("/") + "__unify_tmp"
        writer = df.write.mode("overwrite").option("compression", self.compression)
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(tmp)
        local, local_tmp = self.path.removeprefix("file:"), tmp.removeprefix("file:")
        shutil.rmtree(local)
        os.rename(local_tmp, local)
        # drop cached file listings that still name the deleted parts
        self.spark.catalog.refreshByPath(self.path)
        return True


def _check_pyarrow_scheme(path: str) -> None:
    """Feather IO runs worker-side through ``pyarrow.fs`` — reject
    schemes pyarrow has no filesystem for BEFORE launching a job that
    would fail per-task (``s3a``/``s3n`` translate to ``s3``; ``gs`` and
    ``hdfs`` pass through; ``abfss`` et al have no pyarrow backend)."""
    if "://" not in path:
        return
    scheme = path.split("://", 1)[0].lower()
    mapped = {"s3a": "s3", "s3n": "s3", "gcs": "gs"}.get(scheme, scheme)
    if mapped not in ("file", "s3", "gs", "hdfs", "viewfs"):
        raise NotImplementedError(
            f"distributed feather IO needs a pyarrow filesystem for "
            f"{scheme!r}:// and pyarrow has none (supported: local, s3/s3a, "
            "gs, hdfs) — write parquet instead, or mount the store"
        )


def write_feather_dataset(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> dict:
    """Distributed feather/Arrow-IPC dataset write: one ``.feather``
    part-file per DataFrame partition, streamed task-side via
    ``mapInArrow`` (reference writes feather natively per batch,
    src/pydala/dataset/writer.py:390-427; rounds 1-3 bridged this
    through a driver collect — the last driver materialization on the
    write path).

    Mechanics: each task streams its Arrow batches straight into a
    ``part-NNNNN.feather`` file inside a job-unique ``_staging-<job>``
    directory (worker memory bounded by Arrow batch size; feather v2 IS
    the Arrow IPC file format, so pyarrow/polars read the parts
    directly). Workers write through ``pyarrow.fs`` — Hadoop's
    ``s3a://`` spelling translates to pyarrow's ``s3://``; schemes
    pyarrow has no filesystem for (``abfss://`` et al) are rejected
    driver-side BEFORE any staging state exists. The job returns one METADATA row per non-empty partition
    (file name + row count — data bytes never reach the driver). The
    driver then COMMITS: staged files move into the dataset root with
    job-suffixed names via PathOps renames (so two concurrent appends
    cannot collide), and for ``mode="overwrite"`` the superseded part
    files are deleted only AFTER every new part is in place — a failure
    while renaming rolls the new parts back out, leaving the old data
    intact; a failure while deleting old parts leaves old+new visible
    (re-runnable), never a dataset with neither. (PathOps is a
    driver-side JVM wrapper and cannot cross the worker boundary, hence
    pyarrow.fs on workers.) Returns ``{"n_files", "n_rows"}``.
    """
    import uuid

    from pydala_spark.utils.pathops import PathOps, strip_scheme

    configure_session(spark)
    _check_pyarrow_scheme(path)
    local = strip_scheme(path).rstrip("/")
    po = PathOps(spark, path)
    job = uuid.uuid4().hex[:12]
    staging = f"{local}/_staging-{job}"
    comp = compression if compression in ("zstd", "lz4") else None

    # worker closure: pyarrow/pyspark refs only (no package imports —
    # workers may not have the repo on sys.path)
    def write_parts(iterator):
        import itertools

        import pyarrow as pa
        from pyarrow import fs as pafs
        from pyspark import TaskContext

        it = iter(iterator)
        first = next(it, None)
        if first is None:
            return  # empty partition: no file, no metadata row
        pid = TaskContext.get().partitionId()
        if "://" in staging:
            # pyarrow spells S3 's3://'; Hadoop paths arrive as 's3a://'
            uri = staging.replace("s3a://", "s3://", 1).replace(
                "s3n://", "s3://", 1
            )
            fs, root = pafs.FileSystem.from_uri(uri)
        else:
            fs, root = pafs.LocalFileSystem(), staging
        fs.create_dir(root, recursive=True)
        name = f"part-{pid:05d}.feather"
        n = 0
        with fs.open_output_stream(f"{root}/{name}") as sink:
            with pa.ipc.new_file(
                sink, first.schema,
                options=pa.ipc.IpcWriteOptions(compression=comp),
            ) as w:
                for batch in itertools.chain([first], it):
                    w.write_batch(batch)
                    n += batch.num_rows
        yield pa.record_batch(
            [pa.array([name]), pa.array([n], pa.int64())],
            names=["part", "n_rows"],
        )

    stats = df.mapInArrow(write_parts, "part string, n_rows long").collect()
    renamed: list[str] = []
    try:
        # list the superseded files BEFORE renaming anything in (the
        # job-suffixed new names cannot collide with them), rename every
        # staged part in, and only then delete the old files: a rename
        # failure rolls the new parts back out, so the old dataset is
        # never touched until the new one is fully in place
        old = (
            [
                p
                for p, _sz in po.data_files(local)
                if p.lower().endswith((".feather", ".ipc", ".arrow"))
            ]
            if mode == "overwrite"
            else []
        )
        try:
            for r in stats:
                name = r["part"]
                dest = f"{local}/{name.removesuffix('.feather')}-{job}.feather"
                po.rename(f"{staging}/{name}", dest)
                renamed.append(dest)
        except BaseException:
            for p in renamed:  # roll back; old data remains the dataset
                try:
                    po.delete(p, recursive=False)
                except Exception:
                    pass
            raise
        for p in old:
            po.delete(p, recursive=False)
    finally:
        po.delete(staging, recursive=True)
    return {"n_files": len(stats), "n_rows": sum(r["n_rows"] for r in stats)}
