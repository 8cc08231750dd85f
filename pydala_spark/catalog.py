"""Datalake: a root path holding many datasets, discoverable and
registerable on one SparkSession.

Reference parity (src/pydala/datalake/manager.py): datasets carry a
``_dataset.toml`` sidecar and the lake root a ``_pydala.toml`` manifest;
discovery is a ``**/_dataset.toml`` glob (manager.py:93-96, 128-131), and
``add_dataset`` registers a new member (manager.py:137-181). We use JSON
sidecars (``_dataset.json`` / ``_pydala.json``) and register every dataset
as a temp view — fixing the reference's broken multi-dataset reader
(datalake/reader.py:65-80 references undefined variables).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession

from pydala_spark.dataset.reader import Dataset
from pydala_spark.session import configure_session

MANIFEST_NAME = "_pydala.json"
DATASET_SIDECAR = "_dataset.json"
#: reference-layout sidecars (TOML) are discovered read-only so pointing
#: this catalog at an existing reference lake finds its datasets
#: (manager.py:48, 93-96); writes stay JSON.
TOML_MANIFEST_NAME = "_pydala.toml"
TOML_DATASET_SIDECAR = "_dataset.toml"


class Datalake:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = configure_session(spark)
        self.root = root.removeprefix("file:").rstrip("/")
        self.manifest_path = os.path.join(self.root, MANIFEST_NAME)
        self.datasets: dict[str, Dataset] = {}

    # -- manifest ---------------------------------------------------------------

    def read_manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        toml_path = os.path.join(self.root, TOML_MANIFEST_NAME)
        if os.path.exists(toml_path):
            import tomllib

            with open(toml_path, "rb") as f:
                manifest = tomllib.load(f)
            if isinstance(manifest.get("datasets"), dict):
                return manifest
        return {"datasets": {}}

    def write_manifest(self, manifest: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        with open(self.manifest_path, "w") as f:
            json.dump(manifest, f, indent=2)

    # -- discovery (manager.py:90-131) --------------------------------------------

    def discover(self) -> dict[str, str]:
        """name -> dataset base path, by ``**/_dataset.json`` glob (plus
        reference-layout ``**/_dataset.toml``) plus any directory directly
        containing data files."""
        found: dict[str, str] = {}
        for sidecar_name in (DATASET_SIDECAR, TOML_DATASET_SIDECAR):
            for sidecar in glob.glob(
                os.path.join(self.root, "**", sidecar_name), recursive=True
            ):
                base = os.path.dirname(sidecar)
                found.setdefault(
                    os.path.relpath(base, self.root).replace(os.sep, "."), base
                )
        manifest = self.read_manifest()
        for name, rel in manifest.get("datasets", {}).items():
            found.setdefault(name, os.path.join(self.root, rel))
        return found

    # -- registration ----------------------------------------------------------------

    def add_dataset(
        self, name: str, path: str | None = None, format: str = "parquet", **kwargs
    ) -> Dataset:
        """Track + register a dataset (manager.py:137-181)."""
        base = path or os.path.join(self.root, name.replace(".", os.sep))
        ds = Dataset(self.spark, base, format=format, name=name, **kwargs)
        self.datasets[name] = ds
        manifest = self.read_manifest()
        manifest.setdefault("datasets", {})[name] = os.path.relpath(base, self.root)
        self.write_manifest(manifest)
        if ds._dataset_has_files():
            ds.to_view(name.replace(".", "_"))
        return ds

    def _dataset_format(self, base: str) -> str:
        """Format recorded in the dataset's sidecar (JSON or reference
        TOML), defaulting to parquet."""
        for sidecar in (DATASET_SIDECAR, TOML_DATASET_SIDECAR):
            p = os.path.join(base, sidecar)
            if not os.path.exists(p):
                continue
            try:
                if sidecar.endswith(".toml"):
                    import tomllib

                    with open(p, "rb") as f:
                        cfg = tomllib.load(f)
                else:
                    with open(p) as f:
                        cfg = json.load(f)
                return cfg.get("dataset", {}).get("format") or "parquet"
            except Exception:
                return "parquet"
        return "parquet"

    def load(self, register_views: bool = True) -> dict[str, Dataset]:
        """Discover every dataset and (optionally) register each as a temp
        view named by its dotted relative path. Datasets with no data
        files are tracked but not registered (an empty dataset must not
        abort loading the rest of the lake), and each reads with the
        format its sidecar records."""
        for name, base in self.discover().items():
            # snapshot-managed datasets expose their live data
            current = os.path.join(base, "current")
            data_path = current if os.path.isdir(current) else base
            ds = Dataset(self.spark, data_path, name=name,
                         format=self._dataset_format(base))
            self.datasets[name] = ds
            if register_views and ds._dataset_has_files():
                ds.to_view(name.replace(".", "_"))
        if register_views:
            self._views_registered = True
        return self.datasets

    def sql(self, query: str) -> DataFrame:
        # register on demand — self.datasets being populated is NOT proof
        # the views exist (load(register_views=False) also populates it)
        if not getattr(self, "_views_registered", False):
            self.load()
        return self.spark.sql(query)

    def maintain(self, target_file_mb: int = 128) -> dict[str, dict]:
        """Compact every parquet dataset in the lake (lake-level form of
        ``maintain.compact``). Datasets that are empty or non-parquet are
        skipped with a reason instead of aborting the sweep — at a
        hundred datasets one bad entry must not kill the maintenance
        window. Returns per-dataset stats/skip reasons."""
        from pydala_spark.dataset.maintain import compact

        results: dict[str, dict] = {}
        for name, base in self.discover().items():
            current = os.path.join(base, "current")
            data_path = current if os.path.isdir(current) else base
            fmt = self._dataset_format(base)
            if fmt != "parquet":
                results[name] = {"skipped": f"format {fmt}"}
                continue
            try:
                results[name] = compact(
                    self.spark, data_path, target_file_mb=target_file_mb
                )
            except FileNotFoundError:
                results[name] = {"skipped": "no data files"}
        return results

    def __getitem__(self, name: str) -> Dataset:
        if name not in self.datasets:
            self.load(register_views=False)
        return self.datasets[name]
