"""Instrumented serving probe: WHERE does the 4N cold-batch gap live?

The scaling pool records, at local-cluster[4,2] on the 4M index, a cold
50-query batch ~12s slower than its warm repeat EVEN AFTER preload(),
while at local-cluster[1,2] cold == warm. This probe reruns the serving
sequence (preload -> cold batch -> warm batch) with per-task telemetry:
which Python worker PID ran each task, how many candidate files were
already in that worker's decoded-table cache, and how long the table
loads took. No engine changes — tasks wrap serve_direct's internals and
inspect its module-level cache.

    python bench/serve_probe.py <cpus> <index_dir> [--build <corpus>]

Prints JSON lines; exits nonzero on result mismatch cold vs warm.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _session(cpus: int):
    from pyspark.sql import SparkSession

    exec_cores = int(os.environ.get("QKB_EXEC_CORES", "2"))
    workers = max(1, cpus // exec_cores)
    # worker memory tuning (quickb_spark/session.py): disable a knob for
    # A/B by setting its QKB_* override to the empty string
    from quickb_spark.session import tune_builder

    builder = tune_builder(SparkSession.builder)
    spark = (
        builder
        .master(f"local-cluster[{workers},{exec_cores},14336]")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", "12g")
        .config("spark.executor.extraJavaOptions", "-Xms12g -XX:+AlwaysPreTouch")
        .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
        .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "60s")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/qkb_spark_local")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _build(spark, corpus: str, index_dir: str) -> None:
    from quickb_spark.config import EngineConfig, IndexConfig
    from quickb_spark.index.segments import build_index

    cfg = EngineConfig(index=IndexConfig(
        hot_term_doc_fraction=0.05, hot_term_min_df=500, salt_buckets=16,
        term_buckets=64, p1_task_bytes=8 << 20,
    ))
    docs = spark.read.parquet(corpus)
    t0 = time.perf_counter()
    build_index(spark, index_dir=index_dir, cfg=cfg, wave_size=64,
                documents=docs, corpus_uri=corpus)
    print(json.dumps({"build_sec": round(time.perf_counter() - t0, 2)}),
          flush=True)


def _probe_preload(sc, files: list[str], par: int, rounds: int = 2):
    """preload_files with telemetry: one row per task."""
    def _load(i):
        import os as _os
        import time as _t

        from quickb_spark.query import serve_direct as sd

        pre = sum(1 for f in files if (f, False) in sd._TBL_CACHE)
        t0 = _t.perf_counter()
        total = 0
        for f in files:
            total += sd._cached_table(f, False).nbytes
        return {
            "task": i, "pid": _os.getpid(), "cached_before": pre,
            "n_files": len(files), "load_sec": round(_t.perf_counter() - t0, 3),
            "bytes": total,
        }

    out = []
    for r in range(rounds):
        t0 = time.perf_counter()
        rows = sc.parallelize(range(par), par).map(_load).collect()
        out.append({"round": r, "wall_sec": round(time.perf_counter() - t0, 2),
                    "tasks": rows})
    return out


def _plan(searcher, qs):
    """Replicate Searcher.topk's driver-side planning -> payloads."""
    from quickb_spark.functions.hashing import bucket_of, xxhash64
    from quickb_spark.functions.tokenize import tokenize_py
    from quickb_spark.query.wand import _auto_ranges, _range_bounds

    toks_by_q = {qid: tokenize_py(text or "") for qid, text in qs}
    qt_pairs = sorted({(q, t) for q, toks in toks_by_q.items() for t in toks})
    terms = sorted({t for _, t in qt_pairs})
    dfs = searcher._lookup_dfs(terms)
    live = [t for t in terms if dfs[t] > 0]
    th = {t: xxhash64(t) for t in live}
    buckets = sorted({bucket_of(t, searcher.n_buckets) for t in live})
    files = searcher._files_for(buckets)
    r_count = _auto_ranges(
        sum(dfs[t] for t in live),
        searcher.spark.sparkContext.defaultParallelism,
    )
    qt_pairs_h = [(q, th[t]) for q, t in qt_pairs if t in th]
    dfs_h = {th[t]: dfs[t] for t in live}
    tbq: dict[str, list[int]] = {}
    for qid, t in qt_pairs_h:
        tbq.setdefault(qid, []).append(t)
    stats = searcher.stats
    block_size = int(stats.get("block_size", 128))
    payloads = [
        (r, lo, hi, files, sorted(dfs_h), dfs_h, stats["n_docs"],
         stats["avgdl"], block_size, tbq, 10, "auto", searcher.k1,
         searcher.b, None, None, 0)
        for r, lo, hi in _range_bounds(r_count)
    ]
    return payloads, files


def _probe_batch(sc, payloads, files):
    """serve_topk_direct's task fan-out with per-task telemetry."""
    def _run(payload):
        import os as _os
        import time as _t

        from quickb_spark.query import serve_direct as sd

        pre = sum(1 for f in files if (f, False) in sd._TBL_CACHE)
        t0 = _t.perf_counter()
        chunk = sd._serve_range_task(payload)
        return {
            "range": payload[0], "pid": _os.getpid(), "cached_before": pre,
            "n_files": len(files),
            "task_sec": round(_t.perf_counter() - t0, 3),
            "n_rows": len(chunk),
        }, chunk

    t0 = time.perf_counter()
    res = sc.parallelize(payloads, len(payloads)).map(_run).collect()
    wall = round(time.perf_counter() - t0, 2)
    stats = [r[0] for r in res]
    merged = sorted(
        (qid, doc, round(score, 6))
        for r in res for qid, doc, score in r[1]
    )
    return {"wall_sec": wall, "tasks": stats}, merged


def main() -> None:
    cpus = int(sys.argv[1])
    index_dir = sys.argv[2]
    corpus = sys.argv[4] if len(sys.argv) > 4 and sys.argv[3] == "--build" else None

    spark = _session(cpus)
    sc = spark.sparkContext
    if corpus:
        _build(spark, corpus, index_dir)

    from quickb_spark.corpus import fixture_queries
    from quickb_spark.query.searcher import Searcher

    qs = fixture_queries()
    s = Searcher(spark, index_dir)
    payloads, files = _plan(s, qs)
    print(json.dumps({"n_ranges": len(payloads), "n_files": len(files),
                      "parallelism": sc.defaultParallelism}), flush=True)

    pre = _probe_preload(sc, files, sc.defaultParallelism)
    print(json.dumps({"preload": pre}), flush=True)

    cold, cold_rows = _probe_batch(sc, payloads, files)
    print(json.dumps({"cold": cold}), flush=True)
    warm, warm_rows = _probe_batch(sc, payloads, files)
    print(json.dumps({"warm": warm}), flush=True)
    warm2, warm2_rows = _probe_batch(sc, payloads, files)
    print(json.dumps({"warm2": warm2}), flush=True)

    if not (cold_rows == warm_rows == warm2_rows):
        sys.exit("MISMATCH: cold/warm batches returned different results")
    spark.stop()


if __name__ == "__main__":
    main()
