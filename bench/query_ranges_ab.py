"""A/B the range fan-out of the serving batch at one parallelism level.

    python bench/query_ranges_ab.py <cpus> <index_dir> [ranges ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(cpus: int, index_dir: str, range_counts: list[int]) -> None:
    from pyspark.sql import SparkSession

    exec_cores = int(os.environ.get("QKB_EXEC_CORES", "2"))
    workers = max(1, cpus // exec_cores)
    spark = (
        SparkSession.builder
        .master(f"local-cluster[{workers},{exec_cores},14336]")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", "12g")
        .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
        .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "60s")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/qkb_spark_local")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from quickb_spark.corpus import fixture_queries
    from quickb_spark.query.searcher import Searcher

    qs = fixture_queries()
    s = Searcher(spark, index_dir)
    s.topk(qs[:4], k=10).count()  # warm JVM + workers + df cache

    out = {}
    for r in range_counts:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = s.topk(qs, k=10, ranges=r).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[str(r)] = {"batch_sec": round(best, 2), "n": n}
    print(json.dumps({"cpus": cpus, "by_ranges": out}))
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]),
        sys.argv[2],
        [int(x) for x in (sys.argv[3:] or ["8", "16", "32", "64", "128"])],
    )
