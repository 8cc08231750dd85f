import os
import shutil
import tempfile

import pytest

from pydala_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # per-PROCESS warehouse dir (round 13, tools/partest.py): concurrent
    # shards each saveAsTable into their own scratch instead of
    # colliding on ./spark-warehouse; removed at session teardown so
    # repeated runs don't accumulate saveAsTable data in /tmp
    warehouse = tempfile.mkdtemp(prefix="pydala_spark_wh_")
    spark = get_session(
        app_name="pydala_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    yield spark
    shutil.rmtree(warehouse, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
