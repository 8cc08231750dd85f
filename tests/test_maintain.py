import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pydala_spark.dataset.maintain import compact, zorder_value, zorder_write
from pydala_spark.sources import load_table


def _data_files(root):
    out = []
    for dirpath, _, files in os.walk(root):
        out.extend(
            os.path.join(dirpath, f)
            for f in files
            if not f.startswith(("_", "."))
        )
    return out


def test_compact_partitioned_small_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_frag")
    df = load_table(spark, sf_dir, "orders").limit(2000)
    # fragment: 8 files per hive partition
    (
        df.repartition(8)
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(path)
    )
    before_files = _data_files(path)
    before_count = spark.read.parquet(path).count()
    assert len(before_files) > 10

    stats = compact(spark, path, target_file_mb=128)
    assert stats["files_before"] == len(before_files)
    assert stats["partition_cols"] == ["o_orderpriority"]
    # one target-size chunk total -> one file per hive partition
    after_files = _data_files(path)
    assert stats["files_after"] == len(after_files)
    assert len(after_files) < len(before_files)

    out = spark.read.parquet(path)
    assert out.count() == before_count
    # hive layout preserved
    assert "o_orderpriority" in out.columns
    assert any("o_orderpriority=" in f for f in after_files)


def test_compact_unpartitioned(spark, sf_dir, tmp_path):
    path = str(tmp_path / "nation_frag")
    df = load_table(spark, sf_dir, "nation")
    df.repartition(12).write.mode("overwrite").parquet(path)
    assert len(_data_files(path)) >= 12
    stats = compact(spark, path)
    assert stats["partition_cols"] == []
    assert stats["files_after"] == 1
    assert spark.read.parquet(path).count() == 25


def test_compact_csv_keeps_headers(spark, tmp_path):
    from pydala_spark.dataset.reader import Dataset
    from pydala_spark.dataset.writer import Writer

    path = str(tmp_path / "csv_ds")
    df = spark.createDataFrame([(i, f"n{i}") for i in range(20)], ["id", "name"])
    Writer(spark, path, format="csv").write(df.repartition(4))
    compact(spark, path, format="csv")
    back = Dataset(spark, path, format="csv").load()
    # header lines were not ingested as rows, and the rewrite kept headers
    assert back.count() == 20
    assert set(back.columns) == {"id", "name"}
    assert back.where("CAST(id AS INT) IS NULL").count() == 0


def test_recluster_in_place(spark, tmp_path):
    from pydala_spark.dataset.maintain import recluster

    path = str(tmp_path / "recl")
    df = spark.createDataFrame(
        [(i, (i * 37) % 100, float(i)) for i in range(1000)], ["x", "y", "v"]
    )
    df.repartition(8).write.parquet(path)
    stats = recluster(spark, path, ["x", "y"], n_files=4, bits=8)
    assert stats["cols"] == ["x", "y"]
    back = spark.read.parquet(path)
    assert back.count() == 1000
    # clustered: each file covers a narrow x-range (arrival order did not)
    spans = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg((F.max("x") - F.min("x")).alias("span"))
        .collect()
    )
    assert min(r["span"] for r in spans) < 999  # at least one tight file


def test_streaming_append_with_zorder(spark, tmp_path):
    import os

    from pydala_spark.dataset.reader import Dataset
    from pydala_spark.dataset.writer import Writer
    from pydala_spark.streaming import incremental_append

    src = str(tmp_path / "in_z")
    os.makedirs(src)
    dest = str(tmp_path / "ds_z")
    for i in range(2):
        spark.createDataFrame(
            [(i * 100 + j, float(j % 7)) for j in range(50)], "event_id long, v double"
        ).repartition(2).write.mode("append").parquet(src)
    stream = spark.readStream.schema("event_id long, v double").option(
        "maxFilesPerTrigger", "2"
    ).parquet(src)
    q = incremental_append(
        stream,
        Writer(spark, dest),
        delta_subset=["event_id"],
        checkpoint_dir=str(tmp_path / "ckpt_z"),
        compact_every=1,
        zorder_by=["event_id", "v"],
    )
    q.awaitTermination(120)
    assert Dataset(spark, dest).count() == 100


def test_zorder_overflow_guard(spark):
    import pytest

    cols = [F.lit(1)] * 7
    with pytest.raises(ValueError, match="63 interleaved"):
        spark.range(1).select(zorder_value(cols, bits=10))
    # zorder_write clamps instead (scale and interleave stay consistent)
    df = spark.createDataFrame([(i, i, i, i, i, i, i) for i in range(10)],
                               ["a", "b", "c", "d", "e", "f", "g"])
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        stats = zorder_write(spark, df, f"{d}/z", list("abcdefg"), n_files=2, bits=10)
        assert spark.read.parquet(f"{d}/z").count() == 10


def test_zorder_value_interleaves_bits(spark):
    # x=0b11, y=0b00 with 2 bits -> z = x bits at even positions = 0b0101
    df = spark.createDataFrame([(3, 0)], ["x", "y"])
    z = df.select(
        zorder_value([F.col("x"), F.col("y")], bits=2).alias("z")
    ).first()["z"]
    assert z == 0b0101
    # symmetric: y bits land at odd positions
    df2 = spark.createDataFrame([(0, 3)], ["x", "y"])
    z2 = df2.select(
        zorder_value([F.col("x"), F.col("y")], bits=2).alias("z")
    ).first()["z"]
    assert z2 == 0b1010


def test_zorder_write_clusters_both_columns(spark, sf_dir, tmp_path):
    path = str(tmp_path / "li_z")
    df = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    n = df.count()
    zorder_write(spark, df, path, ["l_orderkey", "l_partkey"], n_files=8)
    out = spark.read.parquet(path)
    assert out.count() == n

    # every file should cover a small hyper-rectangle: the per-file
    # min/max span on EACH z-ordered column must be well below the
    # global span for most files (that's what enables min/max pruning).
    files = _data_files(path)
    assert len(files) > 1
    glb = df.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    spans = {"l_orderkey": glb[1] - glb[0], "l_partkey": glb[3] - glb[2]}
    for col in ("l_orderkey", "l_partkey"):
        tight = 0
        for f in files:
            md = pq.read_metadata(f)
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col:
                        los.append(c.statistics.min)
                        his.append(c.statistics.max)
            if max(his) - min(los) <= 0.75 * spans[col]:
                tight += 1
        assert tight >= len(files) // 2, col


def test_zorder_value_stays_jvm_side(spark, sf_dir):
    """The Morton interleave must be pure Column bit arithmetic: no
    Python UDF in the plan, and the write is range-partitioned on the
    z-value (that's the clustering mechanism)."""
    from pydala_spark.plans import explain_str

    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    zed = df.withColumn(
        "__z",
        zorder_value(
            [F.col("l_orderkey").cast("long"), F.col("l_partkey").cast("long")],
            bits=8,
        ),
    ).repartitionByRange(4, "__z")
    plan = explain_str(zed, mode="formatted")
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "rangepartitioning" in plan.lower()


def test_compact_splits_large_partition(spark, tmp_path):
    # a 'big' hive partition several times the target size must split
    # into multiple ~target files, while 'small' still collapses to one
    path = str(tmp_path / "skewed")
    big = spark.range(300000).select(
        F.lit("big").alias("part"), F.md5(F.col("id").cast("string")).alias("payload")
    )
    small = spark.range(10).select(
        F.lit("small").alias("part"), F.md5(F.col("id").cast("string")).alias("payload")
    )
    big.unionAll(small).repartition(6).write.partitionBy("part").parquet(path)
    stats = compact(spark, path, target_file_mb=1)
    files = _data_files(path)
    big_files = [f for f in files if "part=big" in f]
    small_files = [f for f in files if "part=small" in f]
    assert len(big_files) >= 2, "oversized partition was not split"
    assert len(small_files) == 1
    assert stats["partition_cols"] == ["part"]
    assert spark.read.parquet(path).count() == 300010


def test_zorder_write_rejects_all_null_bounds(spark):
    import pytest

    df = spark.createDataFrame([(1, None), (2, None)], "id long, v double")
    with pytest.raises(ValueError, match="no non-NULL values"):
        zorder_write(spark, df, "/tmp/unused_z", ["id", "v"])


def test_compact_generation_swap_lifecycle(spark, tmp_path):
    # object-store-safe swap: maintenance commits ONE pointer object
    # instead of directory renames; readers/appenders resolve the pointer
    import json
    import os

    from pydala_spark.dataset.maintain import compact
    from pydala_spark.dataset.reader import Dataset
    from pydala_spark.dataset.writer import Writer

    base = str(tmp_path / "gen_ds")
    spark.range(100).repartition(8).write.parquet(base)

    stats = compact(spark, base, swap="generation")
    assert stats["files_before"] == 8 and stats["files_after"] == 1
    with open(os.path.join(base, "_generation.json")) as f:
        ptr = json.load(f)
    assert ptr["active"] == "gen-000001"
    # the flat originals are RETAINED as pseudo-generation zero
    # (keep_previous=1 protects pre-migration in-flight readers too)
    root_parquet = [p for p in os.listdir(base) if p.endswith(".parquet")]
    assert len(root_parquet) == 8
    ds = Dataset(spark, base)
    assert ds.path.endswith("gen-000001")
    assert ds.count() == 100

    # appends land INSIDE the active generation
    Writer(spark, base).write(spark.range(100, 110).toDF("id"))
    assert Dataset(spark, base).count() == 110

    # second compact: next generation; flat originals fall out of the
    # retention window, gen-000001 is the retained previous
    compact(spark, base, swap="generation")
    with open(os.path.join(base, "_generation.json")) as f:
        ptr = json.load(f)
    assert ptr["active"] == "gen-000002"
    assert os.path.isdir(os.path.join(base, "gen-000001"))
    assert not [p for p in os.listdir(base) if p.endswith(".parquet")]
    assert Dataset(spark, base).count() == 110

    # third compact: gen-000001 falls out of the retention window
    compact(spark, base, swap="generation")
    assert not os.path.isdir(os.path.join(base, "gen-000001"))
    assert os.path.isdir(os.path.join(base, "gen-000002"))
    assert Dataset(spark, base).count() == 110


def test_recluster_generation_swap(spark, tmp_path):
    import os

    from pydala_spark.dataset.maintain import recluster
    from pydala_spark.dataset.reader import Dataset
    from pyspark.sql import functions as F

    base = str(tmp_path / "gen_zo")
    spark.range(1000).withColumn("a", F.col("id") % 37).withColumn(
        "b", F.col("id") % 11
    ).repartition(6).write.parquet(base)
    recluster(spark, base, ["a", "b"], n_files=4, swap="generation")
    assert os.path.exists(os.path.join(base, "_generation.json"))
    ds = Dataset(spark, base)
    assert ds.count() == 1000
    assert ds.path.endswith("gen-000001")


def test_compact_generation_swap_partitioned(spark, tmp_path):
    import os

    from pydala_spark.dataset.maintain import compact
    from pydala_spark.dataset.reader import Dataset
    from pydala_spark.dataset.writer import Writer
    from pyspark.sql import functions as F

    base = str(tmp_path / "gen_part")
    df = spark.range(60).withColumn("part", (F.col("id") % 3).cast("string"))
    Writer(spark, base, partition_by=["part"]).write(df.repartition(6))
    stats = compact(spark, base, swap="generation")
    assert stats["partition_cols"] == ["part"]
    out = Dataset(spark, base)
    assert out.count() == 60
    # hive layout preserved inside the generation
    assert os.path.isdir(os.path.join(base, "gen-000001", "part=0"))
    assert out.load().where("part = '1'").count() == 20


def test_repartition_preserves_generation_layout(spark, tmp_path):
    import json
    import os

    from pydala_spark import Dataset, Repartition
    from pydala_spark.dataset.maintain import compact

    base = str(tmp_path / "gen_rp")
    spark.range(50).repartition(5).write.parquet(base)
    compact(spark, base, swap="generation")
    # in-place rewrite happens INSIDE the active generation
    Repartition(spark, base, max_records_per_file=10, with_snapshot=False).run()
    with open(os.path.join(base, "_generation.json")) as f:
        assert json.load(f)["active"] == "gen-000001"  # layout intact
    ds = Dataset(spark, base)
    assert ds.path.endswith("gen-000001")
    assert ds.count() == 50


def test_generation_pointer_corruption_degrades_to_base(spark, tmp_path):
    # a corrupt/unreadable pointer must degrade to reading the base
    # path, never fail the job
    import os

    from pydala_spark.dataset import generations
    from pydala_spark.dataset.reader import Dataset

    base = str(tmp_path / "gen_bad")
    spark.range(10).write.parquet(base)
    with open(os.path.join(base, "_generation.json"), "w") as f:
        f.write("{not valid json")
    assert generations.read_pointer(spark, base) is None
    assert generations.resolve(spark, base) == base
    assert Dataset(spark, base).count() == 10
    # and next_generation restarts the counter cleanly
    assert generations.next_generation(spark, base) == "gen-000001"


def test_generation_pointer_corruption_with_migrated_layout(spark, tmp_path):
    # corrupt pointer on an ALREADY-migrated dataset (base holds only
    # gen-* dirs): resolve falls back to the highest generation, and
    # next_generation never collides with an existing directory
    import os

    from pydala_spark.dataset import generations
    from pydala_spark.dataset.maintain import compact
    from pydala_spark.dataset.reader import Dataset

    base = str(tmp_path / "gen_bad2")
    spark.range(40).repartition(4).write.parquet(base)
    compact(spark, base, swap="generation")
    compact(spark, base, swap="generation")  # gen-000002 active, 1 retained
    with open(os.path.join(base, "_generation.json"), "w") as f:
        f.write("{truncated")
    assert generations.resolve(spark, base).endswith("gen-000002")
    assert Dataset(spark, base).count() == 40  # reads still work
    assert generations.next_generation(spark, base) == "gen-000003"
    # and a lake sweep over it recovers instead of dying
    compact(spark, base, swap="generation")
    assert Dataset(spark, base).count() == 40


def test_generation_pending_delete_ledger_retry(spark, tmp_path):
    # simulate a crash between the pointer PUT and the prune deletes:
    # the doomed generation sits in pending_delete; the next commit
    # retries the delete instead of orphaning it forever
    import json
    import os

    from pydala_spark.dataset import generations
    from pydala_spark.dataset.maintain import compact
    from pydala_spark.dataset.reader import Dataset

    base = str(tmp_path / "gen_ledger")
    spark.range(30).repartition(3).write.parquet(base)
    compact(spark, base, swap="generation")  # gen-000001
    compact(spark, base, swap="generation")  # gen-000002, root pruned
    # craft the crashed state: gen-000001 doomed but not deleted
    ptr_path = os.path.join(base, "_generation.json")
    with open(ptr_path) as f:
        ptr = json.load(f)
    assert os.path.isdir(os.path.join(base, "gen-000001"))
    ptr["generations"] = ["gen-000002"]
    ptr["pending_delete"] = ["gen-000001"]
    with open(ptr_path, "w") as f:
        json.dump(ptr, f)

    compact(spark, base, swap="generation")  # gen-000003
    # the crashed commit's doomed dir was retried and removed
    assert not os.path.isdir(os.path.join(base, "gen-000001"))
    assert os.path.isdir(os.path.join(base, "gen-000002"))  # retained prev
    with open(ptr_path) as f:
        final = json.load(f)
    assert final["active"] == "gen-000003"
    # ledger does not accumulate already-deleted entries forever
    compact(spark, base, swap="generation")
    with open(ptr_path) as f:
        after = json.load(f)
    assert "gen-000001" not in after.get("pending_delete", [])
    assert Dataset(spark, base).count() == 30


def test_compact_then_recluster_generation_chain(spark, tmp_path):
    # maintenance operators chain on an already-generational dataset:
    # recluster reads the active generation and commits the next one
    import json
    import os

    from pydala_spark.dataset.maintain import compact, recluster
    from pydala_spark.dataset.reader import Dataset
    from pyspark.sql import functions as F

    base = str(tmp_path / "gen_chain2")
    spark.range(500).withColumn("a", F.col("id") % 13).repartition(
        5
    ).write.parquet(base)
    compact(spark, base, swap="generation")          # gen-000001
    recluster(spark, base, ["id", "a"], n_files=2, swap="generation")  # gen-000002
    with open(os.path.join(base, "_generation.json")) as f:
        ptr = json.load(f)
    assert ptr["active"] == "gen-000002"
    ds = Dataset(spark, base)
    assert ds.path.endswith("gen-000002")
    assert ds.count() == 500


def test_generation_commit_carries_straggler_append(spark, tmp_path):
    # ADVICE r3: an append landing in the active generation between
    # maintenance's input listing and the pointer commit must be carried
    # into the new generation, not silently dropped when the superseded
    # generation is pruned a sweep later
    import json

    from pydala_spark.dataset import generations
    from pydala_spark.dataset.reader import Dataset

    base = str(tmp_path / "gen_carry")
    spark.range(0, 30).repartition(3).write.parquet(base)
    compact(spark, base, swap="generation")  # gen-000001 active
    gen1 = os.path.join(base, "gen-000001")
    rels = sorted(
        f for f in os.listdir(gen1) if not f.startswith(("_", "."))
    )
    # the rewrite reads gen1's files-as-listed...
    gen2 = os.path.join(base, "gen-000002")
    spark.read.parquet(*[os.path.join(gen1, r) for r in rels]).coalesce(
        1
    ).write.parquet(gen2)
    # ...then an appender drops a straggler into gen1 before the commit
    spark.range(100, 110).coalesce(1).write.mode("append").parquet(gen1)
    generations.commit(
        spark, base, "gen-000002", keep_previous=1,
        source="gen-000001", input_files=rels,
    )
    # straggler rows are live in the ACTIVE generation immediately
    ds = Dataset(spark, base)
    assert ds.path.endswith("gen-000002")
    assert ds.count() == 40
    assert ds.load().agg(F.sum("id")).first()[0] == sum(range(30)) + sum(
        range(100, 110)
    )
    # provenance sidecar accounts for every gen1 file incl. the straggler
    with open(os.path.join(gen2, "_inputs.json")) as f:
        sc = json.load(f)
    assert sc["source"] == "gen-000001"
    assert set(rels) < set(sc["files"]) and len(sc["files"]) == len(rels) + 1
    # one sweep later gen1 is pruned and nothing is lost
    compact(spark, base, swap="generation")  # gen-000003
    assert not os.path.isdir(gen1)
    assert Dataset(spark, base).count() == 40


def test_generation_prune_time_carry(spark, tmp_path):
    # an append that becomes visible only AFTER the successor's commit
    # (appender held the previous pointer resolution through the PUT)
    # stays in the retained generation; the sweep that prunes it must
    # carry the unaccounted file into the active generation first
    from pydala_spark.dataset import generations
    from pydala_spark.dataset.reader import Dataset

    base = str(tmp_path / "gen_carry_late")
    spark.range(0, 30).repartition(3).write.parquet(base)
    compact(spark, base, swap="generation")  # gen-000001
    compact(spark, base, swap="generation")  # gen-000002 active, gen1 retained
    gen1 = os.path.join(base, "gen-000001")
    spark.range(200, 205).coalesce(1).write.mode("append").parquet(gen1)
    compact(spark, base, swap="generation")  # gen-000003: prunes gen1 -> carry
    assert not os.path.isdir(gen1)
    live = generations.resolve(spark, base)
    got = spark.read.parquet(live).agg(F.sum("id"), F.count("*")).first()
    assert got[1] == 35
    assert got[0] == sum(range(30)) + sum(range(200, 205))
    assert Dataset(spark, base).count() == 35


def test_generation_carry_retry_no_duplicates(spark, tmp_path, monkeypatch):
    # crash between the pointer PUT and the prune deletes, AFTER a
    # prune-time carry: the retry must delete the doomed generation
    # without re-copying files that were already carried (or treating
    # the compacted originals as stragglers) — carried rows appear
    # exactly once
    import json

    import pytest

    from pydala_spark.dataset.reader import Dataset
    from pydala_spark.utils.pathops import PathOps

    base = str(tmp_path / "gen_carry_retry")
    spark.range(0, 30).repartition(3).write.parquet(base)
    compact(spark, base, swap="generation")  # gen-000001
    compact(spark, base, swap="generation")  # gen-000002
    gen1 = os.path.join(base, "gen-000001")
    spark.range(200, 205).coalesce(1).write.mode("append").parquet(gen1)

    real_delete = PathOps.delete

    def boom(self, path, recursive=True):
        if path.rstrip("/").endswith("gen-000001"):
            raise OSError("injected crash")
        return real_delete(self, path, recursive)

    monkeypatch.setattr(PathOps, "delete", boom)
    with pytest.raises(OSError, match="injected crash"):
        compact(spark, base, swap="generation")  # gen-000003 committed
    monkeypatch.setattr(PathOps, "delete", real_delete)

    # pointer committed before the crash: carried rows already live
    with open(os.path.join(base, "_generation.json")) as f:
        ptr = json.load(f)
    assert ptr["active"] == "gen-000003"
    assert "gen-000001" in ptr.get("pending_delete", [])
    assert Dataset(spark, base).count() == 35

    compact(spark, base, swap="generation")  # gen-000004: retries the delete
    assert not os.path.isdir(gen1)
    assert Dataset(spark, base).count() == 35  # exactly once, no duplicates


def test_generation_orphan_dir_swept_on_next_commit(spark, tmp_path):
    # a maintenance run that crashed BEFORE its pointer PUT leaves an
    # unreferenced gen dir; the next successful commit sweeps it so it
    # can't accumulate or be picked by the corrupt-pointer fallback
    import json

    from pydala_spark.dataset.reader import Dataset

    base = str(tmp_path / "gen_orphan")
    spark.range(20).repartition(2).write.parquet(base)
    compact(spark, base, swap="generation")  # gen-000001 active
    # crashed next attempt: staged gen-000002 exists, pointer never moved
    orphan = os.path.join(base, "gen-000002")
    spark.range(999, 1002).write.parquet(orphan)
    assert Dataset(spark, base).count() == 20  # pointer still -> gen1

    compact(spark, base, swap="generation")  # commits gen-000003
    with open(os.path.join(base, "_generation.json")) as f:
        ptr = json.load(f)
    assert ptr["active"] == "gen-000003"
    assert not os.path.isdir(orphan)  # orphan swept
    assert os.path.isdir(os.path.join(base, "gen-000001"))  # retained prev
    assert Dataset(spark, base).count() == 20


def test_normalize_filenames_reference_scheme(spark, tmp_path):
    # closes the SURVEY §7.4 part-file naming divergence on demand:
    # part-*.parquet -> data-<YYYYmmdd_HHMMSSfff>-<seq>.parquet
    # (reference writer.py:141), partition dirs preserved, idempotent
    import os
    import re

    from pydala_spark.dataset.maintain import normalize_filenames

    root = str(tmp_path / "named")
    df = spark.range(0, 100).withColumn("part", (F.col("id") % 2).cast("string"))
    df.write.partitionBy("part").parquet(root)
    res = normalize_filenames(spark, root, timestamp="20260814_120000000")
    assert res["n_renamed"] > 0 and res["n_skipped"] == 0
    pat = re.compile(r"^data-20260814_120000000-\d{6}\.parquet$")
    for d in ("part=0", "part=1"):
        names = [f for f in os.listdir(os.path.join(root, d))
                 if not f.startswith((".", "_"))]
        assert names and all(pat.match(n) for n in names), names
    assert spark.read.parquet(root).count() == 100  # bytes unchanged
    # second run: everything already conforms -> pure no-op
    res2 = normalize_filenames(spark, root, timestamp="20260814_130000000")
    assert res2["n_renamed"] == 0 and res2["n_skipped"] == res["n_renamed"]


def test_carry_forward_name_collision_disambiguates(spark, tmp_path):
    # r4 review: a straggler whose relative name collides with a file
    # already in the new generation must land under a -carried- name,
    # not be silently skipped (and deleted one sweep later)
    from pydala_spark.dataset import generations

    base = str(tmp_path / "gen_collide")
    src_dir = os.path.join(base, "gen-000001")
    new_dir = os.path.join(base, "gen-000002")
    os.makedirs(src_dir)
    os.makedirs(new_dir)
    with open(os.path.join(src_dir, "a.parquet"), "wb") as fh:
        fh.write(b"input-bytes")
    with open(os.path.join(src_dir, "s.parquet"), "wb") as fh:
        fh.write(b"straggler-content-unique")
    # the new generation's compacted output happens to use the same name
    with open(os.path.join(new_dir, "s.parquet"), "wb") as fh:
        fh.write(b"xx")
    generations.commit(
        spark, base, "gen-000002", keep_previous=0,
        source="gen-000001", input_files=["a.parquet"],
    )
    names = sorted(os.listdir(new_dir))
    assert "s-carried-gen-000001.parquet" in names, names
    with open(os.path.join(new_dir, "s-carried-gen-000001.parquet"), "rb") as fh:
        assert fh.read() == b"straggler-content-unique"
    with open(os.path.join(new_dir, "s.parquet"), "rb") as fh:
        assert fh.read() == b"xx"  # compacted output untouched


def test_compact_orc_dataset(spark, tmp_path):
    # r4: compact is format-generic — ORC small files fold together too
    import os

    from pydala_spark.dataset.maintain import compact
    from pydala_spark.dataset.reader import Dataset
    from pydala_spark.dataset.writer import Writer

    base = str(tmp_path / "orc_compact")
    w = Writer(spark, base, format="orc")
    for i in range(4):
        w.write(spark.range(i * 10, (i + 1) * 10).repartition(3))
    n_before = len([f for f in os.listdir(base) if f.endswith(".orc")])
    assert n_before >= 8
    compact(spark, base, target_file_mb=128, format="orc")
    n_after = len([f for f in os.listdir(base) if f.endswith(".orc")])
    assert n_after < n_before
    assert Dataset(spark, base, format="orc").count() == 40


def test_compact_rename_swap_preserves_sidecars(spark, tmp_path):
    # round 8: the staged rename swap used to REPLACE the dataset dir
    # wholesale, silently destroying signature sidecars and ANN codebook
    # JSONs; compaction rewrites the same rows, so the sidecars (and
    # their content markers) remain exactly valid and must survive
    import numpy as np

    from pydala_spark.dataset.maintain import (
        compact,
        materialize_signatures,
        read_signatures,
    )
    from pydala_spark.operators.ann import (
        kmeans_centroids,
        save_ivfpq_index,
        search_ivfpq_index,
        train_residual_pq,
    )

    base = str(tmp_path / "sig_ds")
    docs = spark.createDataFrame(
        [(i, f"document number {i} body text words") for i in range(60)],
        ["doc_id", "text"],
    )
    docs.repartition(8).write.parquet(base)
    corpus = spark.read.parquet(base)
    materialize_signatures(spark, corpus, base, kinds=("winnowing",))
    stats = compact(spark, base, target_file_mb=128)
    assert stats["files_after"] < stats["files_before"]
    fps, params = read_signatures(
        spark, base, "winnowing",
        verify_against=spark.read.parquet(base),  # marker still exact
    )
    assert fps.count() == 60 and params["content_rows"] == 60

    # ANN index: codebook sidecars survive, search still works
    idx = str(tmp_path / "ivfpq_idx")
    vecs = spark.createDataFrame(
        [(i, [float((i % 3) + 1), float(i % 5), 1.0, 0.5])
         for i in range(120)],
        ["vec_id", "embedding"],
    )
    cents = kmeans_centroids(vecs, n_centroids=3, seed=1)
    anchors, books = train_residual_pq(vecs, cents, m=2, n_codes=4, seed=1)
    save_ivfpq_index(spark, vecs, idx, cents, books, anchors=anchors)
    before = sorted(map(tuple, search_ivfpq_index(
        spark, idx, vecs.where("vec_id < 2"), k=3).collect()))
    compact(spark, idx, target_file_mb=128)
    after = sorted(map(tuple, search_ivfpq_index(
        spark, idx, vecs.where("vec_id < 2"), k=3).collect()))
    assert before == after and before
