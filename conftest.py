from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession

# host-shared decoded-table cache (quickb_spark/query/serve_direct._shm_dir)
# gets a per-test-session dir: the /dev/shm default would otherwise leak
# entries across pytest sessions and into concurrent bench runs. Must be in
# os.environ BEFORE the JVM gateway starts (local[] workers inherit it).
_SHM_TEST_DIR = tempfile.mkdtemp(prefix="qkb_test_serve_shm_")
os.environ.setdefault("QKB_SERVE_SHM_DIR", _SHM_TEST_DIR)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("quickb_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .getOrCreate()
    )
    yield s
    s.stop()
    shutil.rmtree(_SHM_TEST_DIR, ignore_errors=True)
