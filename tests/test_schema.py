import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pydala_spark import schema as S


def test_promote_lattice():
    assert S.promote_types(pa.int8(), pa.int64()) == pa.int64()
    assert S.promote_types(pa.int64(), pa.float32()) == pa.float32()
    assert S.promote_types(pa.float64(), pa.string()) == pa.string()
    assert S.promote_types(pa.int32(), pa.int32()) == pa.int32()
    # off-lattice conflicting types: tie at rank 0 -> second wins
    assert S.promote_types(pa.timestamp("ms"), pa.timestamp("ns")) == pa.timestamp("ns")


def test_unify_pair_union_of_columns():
    s1 = pa.schema([("id", pa.int32()), ("v", pa.int64())])
    s2 = pa.schema([("id", pa.int64()), ("v", pa.string()), ("extra", pa.float64())])
    unified, equal = S.unify_pair(s1, s2)
    assert not equal
    assert unified.names == ["extra", "id", "v"]  # alphabetical
    assert unified.field("id").type == pa.int64()
    assert unified.field("v").type == pa.string()
    assert unified.field("extra").type == pa.float64()


def test_unify_fold_and_equal_flag():
    s = pa.schema([("a", pa.int32())])
    unified, equal = S.get_unified_schema([s, s, s])
    assert equal and unified == s


def test_schema_dict_roundtrip():
    s = pa.schema(
        [("a", pa.int64()), ("ts", pa.timestamp("us", tz="UTC")), ("x", pa.string())]
    )
    assert S.schema_from_dict(S.schema_to_dict(s)) == s


def test_sort_schema():
    s = pa.schema([("b", pa.int64()), ("a", pa.string())])
    assert S.sort_schema(s).names == ["a", "b"]


def test_arrow_schema_to_spark():
    from pyspark.sql import types as T

    s = pa.schema(
        [
            ("i", pa.int32()),
            ("l", pa.list_(pa.float32())),
            ("t", pa.timestamp("ns")),
            ("s", pa.string()),
        ]
    )
    st = S.arrow_schema_to_spark(s)
    assert st["i"].dataType == T.IntegerType()
    assert st["l"].dataType == T.ArrayType(T.FloatType())
    # tz-naive maps to session-zoned TimestampType, matching the
    # inferTimestampNTZ=false session default (round-3 ADVICE fix)
    assert st["t"].dataType == T.TimestampType()
    assert st["s"].dataType == T.StringType()


def test_infer_helpers(tmp_path):
    f = tmp_path / "x.parquet"
    pq.write_table(pa.table({"a": [1, 2]}), f, compression="zstd")
    assert S.infer_format([str(f)]) == "parquet"
    assert S.infer_partitioning(["/data/col=3/x.parquet"]) == ["col"]
    assert S.infer_partitioning([str(f)]) is None
    assert S.infer_compression(str(f)) == "zstd"


def test_unified_dataset_schema(tmp_path):
    pq.write_table(pa.table({"id": pa.array([1], pa.int32())}), tmp_path / "a.parquet")
    pq.write_table(
        pa.table({"id": pa.array([2], pa.int64()), "v": ["x"]}), tmp_path / "b.parquet"
    )
    unified, equal = S.unified_dataset_schema(str(tmp_path))
    assert not equal
    assert unified.field("id").type == pa.int64()
    assert unified.field("v").type == pa.string()


def test_schema_dict_roundtrip_parametric_types():
    # r4 review: str(pa.DataType) for decimal/list/struct/map is not a
    # type_for_alias alias — snapshot manifests with such columns must
    # still reload
    import pyarrow as pa

    from pydala_spark.schema import schema_from_dict, schema_to_dict

    schema = pa.schema(
        [
            pa.field("d", pa.decimal128(10, 2)),
            pa.field("big", pa.decimal256(42, 6)),
            pa.field("xs", pa.list_(pa.string())),
            pa.field("nested", pa.list_(pa.list_(pa.int64()))),
            pa.field("st", pa.struct([("a", pa.int64()), ("b", pa.string())])),
            pa.field("deep", pa.struct([("inner", pa.struct([("x", pa.float64())]))])),
            pa.field("m", pa.map_(pa.string(), pa.int64())),
            pa.field("ts", pa.timestamp("us", tz="UTC")),
            pa.field("plain", pa.int32()),
        ]
    )
    assert schema_from_dict(schema_to_dict(schema)).equals(schema)


def test_uint64_maps_to_decimal(spark, tmp_path):
    # r4 review: Spark loads parquet uint64 as decimal(20,0); a pinned
    # LongType schema aborts the vectorized reader
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pydala_spark.schema import arrow_schema_to_spark

    p = str(tmp_path / "u64.parquet")
    pq.write_table(
        pa.table({"u": pa.array([1, 2, 2**63 + 5], pa.uint64())}), p
    )
    pinned = arrow_schema_to_spark(pa.schema([pa.field("u", pa.uint64())]))
    got = spark.read.schema(pinned).parquet(p).collect()
    assert {int(r["u"]) for r in got} == {1, 2, 2**63 + 5}
