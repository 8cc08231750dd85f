"""pydala_spark — a PySpark-native datalake engine.

A from-scratch rebuild of the capabilities of legout/pydala (reference at
/root/reference) on the Spark DataFrame/SQL/Catalyst stack:

- datasets as (partitioned) parquet/csv directories, lazily loaded as
  DataFrames with per-fragment schema inference and type-promoting
  schema unification (reference: src/pydala/utils/dataset.py:8-130)
- a full SQL surface over registered temp views (reference delegates SQL
  to an embedded DuckDB: src/pydala/dataset/reader.py:478-484)
- drop -> distinct(subset, keep first/last) -> sort post-pipeline
  (reference: src/pydala/dataset/base.py:118-142)
- partitioned writes with append / overwrite / error / delta (anti-diff)
  modes, time-bucketed batching, per-batch transform hook
  (reference: src/pydala/dataset/writer.py)
- snapshot time travel ("TimeFly", reference: src/pydala/dataset/timefly.py)
- multi-dataset catalog (reference: src/pydala/datalake/manager.py)
- beyond-reference extension operators for LLM-scale data pipelines:
  dedup (exact / minhash-LSH / simhash / ngram-jaccard / embedding),
  similarity search, text analysis, multimodal column plumbing.

Everything is expressed declaratively on DataFrames so Catalyst handles
pushdown, pruning, join strategy and whole-stage codegen; no custom
execution engine.
"""

from pydala_spark.session import configure_session, get_session
from pydala_spark.dataset.reader import Dataset
from pydala_spark.dataset.writer import Writer
from pydala_spark.dataset.timefly import TimeFly
from pydala_spark.dataset.repartition import Repartition
from pydala_spark.dataset.maintain import bucketize, compact, recluster, zorder_write
from pydala_spark.catalog import Datalake

__version__ = "0.1.0"

__all__ = [
    "configure_session",
    "get_session",
    "Dataset",
    "Writer",
    "TimeFly",
    "Repartition",
    "Datalake",
    "bucketize",
    "compact",
    "recluster",
    "zorder_write",
]
