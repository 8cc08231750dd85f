"""TimeFly: snapshot-based time travel for plain-parquet datasets.

Reference parity (src/pydala/dataset/timefly.py): live data lives under
``<base>/current/``, snapshots under ``<base>/snapshot/<YYYYMMDD_HHMMSS>/``,
tracked in a sidecar manifest (the reference uses ``_dataset.toml``,
timefly.py:50; we use ``_dataset.json`` — same content, no TOML
None-sanitization quirk needed, SURVEY §2.10 M6).

Semantics reproduced:

- ``create_current`` migrates root data files into ``current/``
  (timefly.py:150-174, 488-507)
- ``add_snapshot`` copies current -> snapshot/<ts> and appends to the
  ``available`` history (timefly.py:246-310)
- ``load_snapshot`` restores a snapshot into current (timefly.py:354-387)
- ``delete_snapshot`` moves the ts to the ``deleted`` list
- snapshot resolution: the **earliest snapshot strictly after** the
  requested timestamp, ``None`` -> current (timefly.py:337-352 — note this
  is the opposite rounding of Delta Lake's ``timestampAsOf``, which picks
  the latest version <= ts; SURVEY §2.10 M8). ``resolve(..., rounding=
  "latest_before")`` gives the Delta-style behavior when wanted.

This backend is for local/posix paths (driver-side file ops are metadata
work). On real object stores, a transactional table format's time travel
is the right tool; this module keeps the reference's layout reproducible
and testable without extra jars.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from pydala_spark.session import configure_session

TS_FMT = "%Y%m%d_%H%M%S"
DATA_EXTS = (".parquet", ".csv", ".json", ".feather", ".arrow", ".ipc")


def _to_ts(value: str | dt.datetime) -> dt.datetime:
    if isinstance(value, dt.datetime):
        return value
    value = value.strip()
    for fmt in (TS_FMT, "%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            return dt.datetime.strptime(value, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable timestamp {value!r}")


class TimeFly:
    """Snapshot manager for one dataset rooted at ``base_path``."""

    def __init__(self, spark: SparkSession, base_path: str, format: str = "parquet"):
        self.spark = configure_session(spark)
        self.base_path = base_path.removeprefix("file:").rstrip("/")
        self.format = format
        self.config_path = os.path.join(self.base_path, "_dataset.json")

    # -- manifest --------------------------------------------------------------

    def read_config(self) -> dict:
        if os.path.exists(self.config_path):
            with open(self.config_path) as f:
                return json.load(f)
        # read-only migration compat: a dataset written by the reference
        # carries a TOML sidecar (_dataset.toml, reference timefly.py:50);
        # writes stay JSON (_dataset.json)
        toml_path = os.path.join(self.base_path, "_dataset.toml")
        if os.path.exists(toml_path):
            import tomllib

            with open(toml_path, "rb") as f:
                return tomllib.load(f)
        return {}

    def write_config(self, config: dict) -> None:
        os.makedirs(self.base_path, exist_ok=True)
        with open(self.config_path, "w") as f:
            json.dump(config, f, indent=2, default=str)

    # -- layout ------------------------------------------------------------------

    @property
    def current_path(self) -> str:
        return os.path.join(self.base_path, "current")

    def snapshot_path(self, ts: str) -> str:
        return os.path.join(self.base_path, "snapshot", ts)

    def _datafiles_in_root(self) -> list[str]:
        """Data files sitting directly in the dataset root (to be migrated
        into current/ — reference timefly.py:488-507)."""
        found = []
        for dirpath, dirnames, filenames in os.walk(self.base_path):
            rel = os.path.relpath(dirpath, self.base_path)
            if rel.split(os.sep)[0] in ("current", "snapshot"):
                dirnames[:] = []
                continue
            for fn in filenames:
                if fn.lower().endswith(DATA_EXTS) and not fn.startswith(("_", ".")):
                    found.append(os.path.join(dirpath, fn))
        return found

    def new(self, save_config: bool = True) -> dict:
        """Initialize the manifest (reference timefly.py:130-148)."""
        config = {
            "dataset": {
                "name": os.path.basename(self.base_path),
                "init": dt.datetime.utcnow().strftime(TS_FMT),
                "format": self.format,
            },
            "timefly": {"available": [], "deleted": []},
        }
        if save_config:
            self.write_config(config)
        return config

    def _current_datafiles(self) -> list[str]:
        found = []
        for dirpath, _dirs, files in os.walk(self.current_path):
            for fn in files:
                if fn.lower().endswith(DATA_EXTS) and not fn.startswith(("_", ".")):
                    found.append(os.path.join(dirpath, fn))
        return found

    def _infer_current_properties(self) -> dict:
        """Dataset properties inferred from current/ files — the
        reference persists these in the snapshot config
        (timefly.py:176-217: format, compression, partitioning, schema +
        schema_unique)."""
        from pydala_spark import schema as schema_mod

        files = self._current_datafiles()
        if not files:
            return {}
        rels = [os.path.relpath(f, self.current_path) for f in files]
        props: dict = {
            "format": schema_mod.infer_format(rels),
            "partitioning": schema_mod.infer_partitioning(rels),
        }
        if props["format"] == "parquet":
            props["compression"] = schema_mod.infer_compression(files[0])
            unified, unique = schema_mod.unified_dataset_schema(self.current_path)
            props["schema"] = schema_mod.schema_to_dict(unified)
            props["schema_unique"] = unique
        return props

    def create_current(self, **properties) -> None:
        """Move root-level data files into ``current/`` and record the
        current metadata (reference timefly.py:150-217)."""
        os.makedirs(self.current_path, exist_ok=True)
        for src in self._datafiles_in_root():
            rel = os.path.relpath(src, self.base_path)
            dst = os.path.join(self.current_path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(src, dst)
        # sweep spark markers and emptied partition-dir shells off the root
        for dirpath, dirnames, filenames in os.walk(self.base_path, topdown=False):
            rel = os.path.relpath(dirpath, self.base_path)
            if rel.split(os.sep)[0] in ("current", "snapshot"):
                continue
            for fn in filenames:
                if fn in ("_SUCCESS",) or fn.endswith(".crc"):
                    os.remove(os.path.join(dirpath, fn))
            if dirpath != self.base_path and not os.listdir(dirpath):
                os.rmdir(dirpath)
        config = self.read_config() or self.new(save_config=False)
        now = dt.datetime.utcnow().strftime(TS_FMT)
        current = {"created": now, "comment": "initialized", "latest_update": now}
        current.update(self._infer_current_properties())
        current.update(properties)
        config.setdefault("current", {}).update(current)
        self.write_config(config)

    def update_current(self, **properties) -> None:
        """Merge properties + refreshed inference into the current
        metadata (reference ``update_current``, timefly.py:219-237)."""
        config = self.read_config()
        if "current" not in config or not os.path.isdir(self.current_path):
            self.create_current(**properties)
            return
        config["current"].update(self._infer_current_properties())
        config["current"].update(properties)
        config["current"]["latest_update"] = dt.datetime.utcnow().strftime(TS_FMT)
        self.write_config(config)

    # -- snapshots ------------------------------------------------------------------

    def snapshots(self, include_deleted: bool = False) -> list[str]:
        config = self.read_config()
        timefly = config.get("timefly", {})
        out = list(timefly.get("available", []))
        if include_deleted:
            out += list(timefly.get("deleted", []))
        return sorted(out)

    def add_snapshot(self, ts: dt.datetime | None = None) -> str:
        """Copy current/ into snapshot/<ts>/ (reference timefly.py:246-310)."""
        auto = ts is None
        t = ts or dt.datetime.utcnow()
        ts_str = t.strftime(TS_FMT)
        if not os.path.isdir(self.current_path):
            self.create_current()
        dst = self.snapshot_path(ts_str)
        if os.path.exists(dst):
            if not auto:
                raise FileExistsError(f"snapshot {ts_str} already exists")
            # second-granularity stamps: two auto snapshots in the same
            # second (e.g. back-to-back load_snapshot restores) bump
            # forward instead of failing
            while os.path.exists(dst):
                t += dt.timedelta(seconds=1)
                ts_str = t.strftime(TS_FMT)
                dst = self.snapshot_path(ts_str)
        shutil.copytree(self.current_path, dst)
        config = self.read_config() or self.new(save_config=False)
        config.setdefault("timefly", {}).setdefault("available", []).append(ts_str)
        self.write_config(config)
        return ts_str

    def delete_snapshot(self, ts: str | dt.datetime) -> None:
        ts_str = ts if isinstance(ts, str) else ts.strftime(TS_FMT)
        path = self.snapshot_path(ts_str)
        if os.path.exists(path):
            shutil.rmtree(path)
        config = self.read_config()
        timefly = config.setdefault("timefly", {})
        if ts_str in timefly.get("available", []):
            timefly["available"].remove(ts_str)
        timefly.setdefault("deleted", []).append(ts_str)
        self.write_config(config)

    def vacuum(
        self,
        older_than: str | dt.datetime | None = None,
        retain_last: int | None = None,
    ) -> list[str]:
        """Physically delete old snapshots (Delta-style ``VACUUM`` for the
        copy-on-snapshot layout; the reference keeps every snapshot
        forever — timefly.py:313-326 only tombstones one at a time).

        ``older_than`` drops snapshots taken at or before that time;
        ``retain_last=N`` always keeps the newest N regardless. With
        neither given, keeps the newest one. Returns deleted stamps.
        At 100 TB this is the knob that bounds storage amplification:
        each snapshot is a full copy until manifest-pointer snapshots
        replace it (SCALE.md).
        """
        stamps = self.snapshots()
        keep = set(stamps[-(retain_last or 1):]) if retain_last or older_than is None else set()
        if older_than is not None:
            cutoff = _to_ts(older_than)
            keep |= {
                s for s in stamps
                if dt.datetime.strptime(s, TS_FMT) > cutoff
            }
        doomed = [s for s in stamps if s not in keep]
        for s in doomed:
            self.delete_snapshot(s)
        return doomed

    def load_snapshot(self, ts: str | dt.datetime) -> None:
        """Restore a snapshot into current/ (reference timefly.py:354-387).
        The replaced current is itself snapshotted first so nothing is lost.

        An exact stamp match wins before any rounding: the reference's
        default usage is ``match='exact'`` (timefly.py:354), and routing
        the stamp returned by :meth:`add_snapshot` through the
        strictly-after ``resolve`` rounding would skip that snapshot (and
        restore a later one, or silently no-op).
        """
        want = ts if isinstance(ts, str) else ts.strftime(TS_FMT)
        try:
            want = _to_ts(want).strftime(TS_FMT)
        except ValueError:
            pass
        if want in self.snapshots():
            ts_str = f"snapshot/{want}"
        else:
            ts_str = self.resolve(ts)
        if ts_str == "current":
            return
        src = self.snapshot_path(ts_str.removeprefix("snapshot/"))
        if not os.path.isdir(src):
            raise FileNotFoundError(f"snapshot {ts_str} not found")
        if os.path.isdir(self.current_path):
            self.add_snapshot()
            shutil.rmtree(self.current_path)
        shutil.copytree(src, self.current_path)

    def resolve(
        self, timefly: str | dt.datetime | None, rounding: str = "earliest_after"
    ) -> str:
        """Map a requested timestamp to a dataset subpath.

        ``None`` -> ``"current"``. Default rounding picks the earliest
        snapshot strictly **after** the requested time (reference
        timefly.py:337-352); ``rounding="latest_before"`` gives
        Delta-style ``timestampAsOf`` rounding (SURVEY §7.4 hard part #2).
        """
        if timefly is None:
            return "current"
        want = _to_ts(timefly)
        stamps = [(s, dt.datetime.strptime(s, TS_FMT)) for s in self.snapshots()]
        if rounding == "earliest_after":
            matches = [s for s, t in stamps if t > want]
            pick = min(matches) if matches else None
        elif rounding == "latest_before":
            matches = [s for s, t in stamps if t <= want]
            pick = max(matches) if matches else None
        else:
            raise ValueError("rounding must be 'earliest_after' or 'latest_before'")
        if pick is None:
            return "current"
        return f"snapshot/{pick}"

    # -- reads ------------------------------------------------------------------------

    def read(
        self, timefly: str | dt.datetime | None = None, rounding: str = "earliest_after"
    ) -> DataFrame:
        """DataFrame over the dataset as of ``timefly``
        (reference TimeFlyReader, src/pydala/dataset/reader.py:584-653)."""
        from pydala_spark.dataset.reader import Dataset

        sub = self.resolve(timefly, rounding)
        return Dataset(self.spark, os.path.join(self.base_path, sub), self.format).load()
