import subprocess
import sys

import pytest

from pydala_spark.cli import _load_toml_config, main


@pytest.fixture()
def dataset(spark, tmp_path):
    path = str(tmp_path / "ds")
    spark.range(60).selectExpr(
        "id", "id % 3 AS g", "cast(id * 1.5 as double) AS v"
    ).write.parquet(path)
    return path


def test_cli_timefly_lifecycle(spark, dataset, capsys):
    # init -> add -> list -> delete, through the argparse surface (the
    # session is reused via getOrCreate, so this exercises the real
    # wiring without a JVM per call)
    assert main(["timefly", "init", "--path", dataset]) == 0
    assert main(["timefly", "add", "--path", dataset]) == 0
    capsys.readouterr()
    assert main(["timefly", "list", "--path", dataset]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    ts = out[0]
    assert main(["timefly", "delete", "--path", dataset, "--ts", ts]) == 0
    capsys.readouterr()
    assert main(["timefly", "list", "--path", dataset]) == 0
    assert capsys.readouterr().out.strip() == ""


def test_cli_timefly_missing_args(dataset):
    assert main(["timefly", "add"]) == 2  # no path
    assert main(["timefly", "delete", "--path", dataset]) == 2  # no ts


def test_cli_repartition_toml_config(spark, dataset, tmp_path):
    # the reference scripts' calling convention: a TOML config file,
    # "None" strings meaning null (NestedDictReplacer parity)
    cfg = tmp_path / "job.toml"
    cfg.write_text(
        "[repartition]\n"
        f'source = "{dataset}"\n'
        'partition_by = "g"\n'
        'sort_by = "id"\n'
        'dest = "None"\n'
        'mode = "overwrite"\n'
    )
    opts = _load_toml_config(str(cfg), "repartition")
    assert opts["dest"] is None  # "None" sentinel parity
    assert main(["repartition", str(cfg), "--no-snapshot"]) == 0
    import os

    parts = {d for d in os.listdir(dataset) if d.startswith("g=")}
    assert parts == {"g=0", "g=1", "g=2"}
    back = spark.read.parquet(dataset)
    assert back.count() == 60


def test_cli_repartition_requires_source():
    assert main(["repartition"]) == 2


def test_cli_module_entrypoint_runs():
    # `python -m pydala_spark.cli --help` must work from a shell (cron
    # parity); --help exits 0 without building a session
    res = subprocess.run(
        [sys.executable, "-m", "pydala_spark.cli", "--help"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert res.returncode == 0
    assert "repartition" in res.stdout and "timefly" in res.stdout


def test_cli_rejects_unknown_config_keys(tmp_path):
    cfg = tmp_path / "bad.toml"
    cfg.write_text('[repartition]\nsource = "/x"\ntime_range = "1d"\n')
    assert main(["repartition", str(cfg)]) == 2
    cfg2 = tmp_path / "bad2.toml"
    cfg2.write_text('[timefly]\npath = "/x"\nsnapshots = 3\n')
    assert main(["timefly", "add", str(cfg2)]) == 2


def test_cli_timefly_snapshot_restore(spark, dataset, capsys):
    # full snapshot lifecycle through the CLI including the LOAD path:
    # snapshot, mutate, restore, verify the pre-mutation state came back
    assert main(["timefly", "init", "--path", dataset]) == 0
    assert main(["timefly", "add", "--path", dataset]) == 0
    capsys.readouterr()
    assert main(["timefly", "list", "--path", dataset]) == 0
    ts = capsys.readouterr().out.strip()
    n0 = spark.read.parquet(f"{dataset}/current").count()
    spark.range(1000, 1005).selectExpr(
        "id", "id % 3 AS g", "cast(id * 1.5 as double) AS v"
    ).write.mode("append").parquet(f"{dataset}/current")
    assert spark.read.parquet(f"{dataset}/current").count() == n0 + 5
    assert main(["timefly", "load", "--path", dataset, "--ts", ts]) == 0
    assert spark.read.parquet(f"{dataset}/current").count() == n0
