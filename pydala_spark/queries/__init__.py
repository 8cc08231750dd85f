"""The declared query surface: one entry per implemented operator from
SURVEY.md §2, each with a DuckDB oracle SQL equivalent.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLE[name] -> str``
are consumed by ``/root/repo/__spark_entry__.py`` (the correctness-driver
contract) and by ``bench.py``.

Cross-engine exactness strategy (so the driver's value-hash compare is
bit-exact, not "close"):

- double aggregates go through a per-row ``CAST(x AS DECIMAL(p,s))`` so
  both engines sum exactly, then cast the exact decimal back to double;
- averages are computed as exact-decimal-sum cast to double, divided by
  the bigint count — one IEEE division of identical operands;
- timestamps are compared as dates / date_trunc'd values (the events
  table's ns unit is truncated to µs identically on both sides);
- md5 (identical hex output in Spark and DuckDB) powers fingerprints,
  MinHash and any "random" hashing.
"""

from pydala_spark.queries.core import CORE_ORACLE, CORE_QUERIES
from pydala_spark.queries.ext import EXT_ORACLE, EXT_QUERIES
from pydala_spark.queries.funcs import FUNC_ORACLE, FUNC_QUERIES
from pydala_spark.queries.merged import MERGED_ORACLE, MERGED_QUERIES
from pydala_spark.queries.sampling import SAMPLING_ORACLE, SAMPLING_QUERIES

# Registry order is part of the driver contract: the correctness driver
# records roughly the first 50 entries, so the differentiating extension
# surface (dedup/similarity/text/sampling) comes right after the core
# relational queries, and the total stays at <= 50 — pinned by
# tests/test_oracle_smoke.py::test_registry_fits_driver_window (round-2
# fix for the round-1 truncation where the EXT tail went unrecorded).
# To add a query, first merge function-family demos in merged.py.
QUERIES = {
    **CORE_QUERIES,
    **EXT_QUERIES,
    **SAMPLING_QUERIES,
    **FUNC_QUERIES,
    **MERGED_QUERIES,
}
ORACLE = {
    **CORE_ORACLE,
    **EXT_ORACLE,
    **SAMPLING_ORACLE,
    **FUNC_ORACLE,
    **MERGED_ORACLE,
}

__all__ = ["QUERIES", "ORACLE"]
