"""Schema inference, unification and round-tripping.

Reproduces the reference's distinctive schema behavior (see SURVEY.md
§1.3): per-fragment schema inference with a unified schema computed over a
type-promotion lattice ``int8 < int16 < int32 < int64 < float16 < float32
< float64 < string`` (reference src/pydala/utils/dataset.py:8-130), plus
schema<->dict string round-trips (utils/dataset.py:142-170), alphabetical
schema sort (utils/dataset.py:133-139) and format/partitioning/compression
inference (src/pydala/dataset/timefly.py:80-128).

All of this is driver-side metadata work on parquet footers — cheap even
for a 100 TB dataset (footers only, no data reads; for very large file
counts, use the dataset's ``_metadata`` sidecar or sample fragments).
The heavy lifting (reading data *with* the unified schema) stays
distributed in ``Dataset.load``.
"""

from __future__ import annotations

import posixpath
from typing import Iterable

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from pyspark.sql import types as T

#: Promotion lattice, lowest to highest rank
#: (reference src/pydala/utils/dataset.py:13-22).
_TYPE_RANK: list[pa.DataType] = [
    pa.int8(),
    pa.int16(),
    pa.int32(),
    pa.int64(),
    pa.float16(),
    pa.float32(),
    pa.float64(),
    pa.string(),
]


def _rank(dtype: pa.DataType) -> int:
    """Lattice rank; types outside the lattice rank lowest (0), matching
    the reference's fallback (utils/dataset.py:37-42)."""
    for i, t in enumerate(_TYPE_RANK):
        if dtype.equals(t):
            return i
    return 0


def promote_types(type1: pa.DataType, type2: pa.DataType) -> pa.DataType:
    """Resolve a type conflict: strictly-higher lattice rank wins, ties go
    to ``type2`` (the later schema) — reference utils/dataset.py:44."""
    if type1.equals(type2):
        return type1
    return type1 if _rank(type1) > _rank(type2) else type2


def unify_pair(
    schema1: pa.Schema, schema2: pa.Schema
) -> tuple[pa.Schema, bool]:
    """Union-of-columns merge of two schemas with lattice promotion.

    Field order in the result is alphabetical (the reference sorts the
    union of names — utils/dataset.py:24). Returns ``(schema, equal)``
    where ``equal`` is False iff any field's type conflicted.
    """
    equal = True
    fields = []
    names1, names2 = set(schema1.names), set(schema2.names)
    for name in sorted(names1 | names2):
        type1 = schema1.field(name).type if name in names1 else schema2.field(name).type
        type2 = schema2.field(name).type if name in names2 else schema1.field(name).type
        if not type1.equals(type2):
            equal = False
        fields.append(pa.field(name, promote_types(type1, type2)))
    return pa.schema(fields), equal


def get_unified_schema(
    schemas: Iterable[pa.Schema],
) -> tuple[pa.Schema, bool]:
    """Left-fold :func:`unify_pair` over fragment schemas
    (reference ``get_unified_schema`` utils/dataset.py:109-130)."""
    schemas = list(schemas)
    if not schemas:
        raise ValueError("no schemas to unify")
    unified = schemas[0]
    all_equal = True
    for other in schemas[1:]:
        unified, equal = unify_pair(unified, other)
        all_equal = all_equal and equal
    return unified, all_equal


def list_fragment_schemas(
    path: str, format: str = "parquet", partitioning: str | None = None
) -> list[pa.Schema]:
    """Physical schema of every fragment of a dataset
    (reference ``list_schemas`` utils/dataset.py:94-106)."""
    dataset = pads.dataset(path, format=format, partitioning=partitioning)
    return [frag.physical_schema for frag in dataset.get_fragments()]


def unified_dataset_schema(
    path: str, format: str = "parquet", partitioning: str | None = None
) -> tuple[pa.Schema, bool]:
    """Unified schema for every fragment under ``path``."""
    return get_unified_schema(list_fragment_schemas(path, format, partitioning))


def sort_schema(schema: pa.Schema) -> pa.Schema:
    """Alphabetically sorted fields (reference utils/dataset.py:133-139)."""
    return pa.schema([schema.field(n) for n in sorted(schema.names)])


# ---------------------------------------------------------------------------
# schema <-> dict round trip (reference utils/dataset.py:142-170): types
# serialized as strings, timestamps keeping unit and tz.


def schema_to_dict(schema: pa.Schema) -> dict[str, str]:
    return {field.name: str(field.type) for field in schema}


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at nesting depth 0 only (<>, (), [] nest)."""
    parts: list[str] = []
    depth, cur = 0, []
    for ch in s:
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts]


def _type_from_string(type_str: str) -> pa.DataType:
    """Parse ``str(pa.DataType)`` back to the type. ``type_for_alias``
    only knows the primitive aliases — the parametric forms pyarrow
    PRINTS (``decimal128(10, 2)``, ``list<item: string>``,
    ``struct<a: int64>``, ``map<string, int64>``) need explicit parsing,
    otherwise any snapshot manifest written for a dataset with such a
    column (decimal columns are first-class here) crashes on reload."""
    s = type_str.strip()
    if s.startswith("timestamp"):
        # "timestamp[us]" or "timestamp[us, tz=UTC]"
        inner = s[s.index("[") + 1 : s.rindex("]")]
        parts = [p.strip() for p in inner.split(",")]
        unit = parts[0]
        tz = None
        for part in parts[1:]:
            if part.startswith("tz="):
                tz = part[3:]
        return pa.timestamp(unit, tz=tz)
    if s.startswith(("decimal128(", "decimal256(", "decimal(")):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        prec, scale = (int(x) for x in inner.split(","))
        ctor = pa.decimal256 if s.startswith("decimal256") else pa.decimal128
        return ctor(prec, scale)
    for prefix, ctor in (("large_list<", pa.large_list), ("list<", pa.list_)):
        if s.startswith(prefix) and s.endswith(">"):
            inner = s[len(prefix):-1]
            _label, _, value = inner.partition(": ")
            return ctor(_type_from_string(value))
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_top(s[len("struct<"):-1]):
            name, _, value = part.partition(": ")
            fields.append(pa.field(name, _type_from_string(value)))
        return pa.struct(fields)
    if s.startswith("map<") and s.endswith(">"):
        key_s, val_s = _split_top(s[len("map<"):-1])
        return pa.map_(_type_from_string(key_s), _type_from_string(val_s))
    return pa.type_for_alias(s)


def schema_from_dict(mapping: dict[str, str]) -> pa.Schema:
    return pa.schema([pa.field(n, _type_from_string(t)) for n, t in mapping.items()])


# ---------------------------------------------------------------------------
# Arrow <-> Spark type conversion.

_ARROW_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    # Spark's parquet reader surfaces uint64 as decimal(20,0) (no
    # unsigned 64-bit type; long would overflow above 2^63-1) — a pinned
    # LongType schema makes the vectorized reader throw outright
    "uint64": T.DecimalType(20, 0),
    # Spark has no half-float; widen (documented divergence, SURVEY §1.2).
    "halffloat": T.FloatType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "large_string": T.StringType(),
    "binary": T.BinaryType(),
    "large_binary": T.BinaryType(),
    "date32[day]": T.DateType(),
    "date64[ms]": T.DateType(),
}


def arrow_type_to_spark(dtype: pa.DataType) -> T.DataType:
    """Map an Arrow type to the Spark SQL type it loads as.

    Timestamps of any unit map to (µs) TimestampType — unit preservation is
    a documented divergence (SURVEY §1.2); ns columns are handled at the
    read boundary (sources.load_table).
    """
    if pa.types.is_timestamp(dtype):
        # tz-naive also maps to session-zoned TimestampType: the session
        # sets inferTimestampNTZ=false (session.py), so inferred reads of
        # tz-naive parquet surface as TIMESTAMP — a pinned-schema read of
        # the same file must produce the SAME type, not TIMESTAMP_NTZ
        # (under the UTC session zone the stored micros are identical)
        return T.TimestampType()
    if pa.types.is_decimal(dtype):
        return T.DecimalType(dtype.precision, dtype.scale)
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype):
        return T.ArrayType(arrow_type_to_spark(dtype.value_type))
    if pa.types.is_map(dtype):
        return T.MapType(
            arrow_type_to_spark(dtype.key_type), arrow_type_to_spark(dtype.item_type)
        )
    if pa.types.is_struct(dtype):
        return T.StructType(
            [
                T.StructField(f.name, arrow_type_to_spark(f.type), True)
                for f in dtype
            ]
        )
    spark_type = _ARROW_TO_SPARK.get(str(dtype))
    if spark_type is None:
        raise ValueError(f"no Spark mapping for Arrow type {dtype}")
    return spark_type


def arrow_schema_to_spark(schema: pa.Schema) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f.name, arrow_type_to_spark(f.type), f.nullable)
            for f in schema
        ]
    )


# ---------------------------------------------------------------------------
# Inference helpers (reference src/pydala/dataset/timefly.py:80-128).

_FORMAT_BY_EXT = {
    ".parquet": "parquet",
    ".feather": "feather",
    ".ipc": "feather",
    ".arrow": "feather",
    ".csv": "csv",
    ".json": "json",
    ".orc": "orc",
}


def infer_format(paths: Iterable[str]) -> str | None:
    """Format from file extensions (reference timefly.py:91-103)."""
    for p in paths:
        ext = posixpath.splitext(p)[1].lower()
        if ext in _FORMAT_BY_EXT:
            return _FORMAT_BY_EXT[ext]
    return None


def infer_partitioning(paths: Iterable[str]) -> list[str] | None:
    """Hive partition column names from ``col=val`` path segments
    (reference timefly.py:105-112)."""
    for p in paths:
        # directory segments only — a '=' in the FILENAME (export=2024.parquet)
        # is not a partition and would poison the append-inheritance gate
        cols = [seg.split("=")[0] for seg in p.split("/")[:-1] if "=" in seg]
        if cols:
            return cols
    return None


def infer_compression(path: str) -> str | None:
    """Compression of the first column chunk of a parquet file
    (reference timefly.py:121-128)."""
    meta = pq.ParquetFile(path).metadata
    if meta.num_row_groups == 0 or meta.num_columns == 0:
        return None
    return meta.row_group(0).column(0).compression.lower()
