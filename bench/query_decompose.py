"""Decompose the cold 50-query batch into its phases at one parallelism
level — where does the non-scaling fixed cost of the serving batch live?

    python bench/query_decompose.py <cpus> <index_dir>

Prints one JSON line: searcher init, cold df-lookup, scoring job, warm
repeat batch, and the auto range count.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(cpus: int, index_dir: str) -> None:
    from pyspark.sql import SparkSession

    from quickb_spark.session import tune_builder

    exec_cores = int(os.environ.get("QKB_EXEC_CORES", "2"))
    workers = max(1, cpus // exec_cores)
    spark = (
        tune_builder(SparkSession.builder)
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
    from quickb_spark.functions.tokenize import tokenize_py
    from quickb_spark.query.searcher import Searcher
    from quickb_spark.query.wand import _auto_ranges

    qs = fixture_queries()

    # warm the JVM + python workers with a small batch first (protocol
    # parity: the scaling worker warms on the mini index; here we warm on
    # the real one but only time the SECOND cold-cache batch)
    warm = Searcher(spark, index_dir)
    warm.topk(qs[:4], k=10).count()

    t0 = time.perf_counter()
    s = Searcher(spark, index_dir)
    t_init = time.perf_counter() - t0

    terms = sorted({t for _, text in qs for t in tokenize_py(text)})
    t0 = time.perf_counter()
    dfs = s._lookup_dfs(terms)
    t_lookup = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = s.topk(qs, k=10).count()
    t_score = time.perf_counter() - t0

    t0 = time.perf_counter()
    s.topk(qs, k=10).count()
    t_warm = time.perf_counter() - t0

    # A/B: the same warm batch through the Arrow-channel path (the
    # round-3 serving engine) — the direct-vs-channel gap at each level
    # is the measured motivation for query/serve_direct.py
    os.environ["QKB_SERVE_CHANNEL"] = "1"
    try:
        s.topk(qs[:4], k=10).count()  # warm the channel plan path
        t0 = time.perf_counter()
        s.topk(qs, k=10).count()
        t_channel = time.perf_counter() - t0
    finally:
        del os.environ["QKB_SERVE_CHANNEL"]

    t0 = time.perf_counter()
    n_phrase = s.topk(qs[:25], k=10, phrase=True).count()
    t_phrase = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cpus": cpus,
                "init_sec": round(t_init, 2),
                "df_lookup_sec": round(t_lookup, 2),
                "score_job_sec": round(t_score, 2),
                "warm_batch_sec": round(t_warm, 2),
                "channel_warm_batch_sec": round(t_channel, 2),
                "phrase_batch_sec": round(t_phrase, 2),
                "n_results": n,
                "n_phrase_results": n_phrase,
                "n_terms": len(terms),
                "auto_ranges": _auto_ranges(
                    sum(v for v in dfs.values() if v > 0),
                    spark.sparkContext.defaultParallelism,
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
