"""Subprocess worker for the scaling bench: one parallelism level per process.

Builds the full compressed index (chunk → tokenize → salted shuffle →
varbyte segments) over a corpus parquet and runs the BM25/WAND query batch.
Prints one JSON line. Invoked by bench/scaling.py as

    python bench/_scale_worker.py <cpus> <corpus_parquet> <work_dir>

The timed window covers the index-build job and the query batch only —
session startup, corpus generation, and JVM warm-up are excluded
(SURVEY.md §7 hard part d).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(cpus: int, corpus_path: str, work_dir: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"quickb-scale-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.local.dir", "/dev/shm/qkb_spark_local")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # the checkpoint/segment dirs hold many few-MB files in this sandbox;
        # default 128MB maxPartitionBytes + 4MB openCost would coalesce them
        # into a handful of scan partitions and serialize downstream stages
        # (at production scale files are row-group sized and this is moot)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        # shuffle dirs live on tmpfs here: compressing shuffle blocks burns
        # CPU (which contends with the Python workers) to save RAM-disk
        # bytes nobody is short of — on a real cluster with remote/disk
        # shuffle these stay on
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from quickb_spark.chunking import chunk_documents
    from quickb_spark.config import EngineConfig, IndexConfig
    from quickb_spark.corpus import fixture_queries
    from quickb_spark.index.segments import build_index
    from quickb_spark.query.searcher import Searcher
    from quickb_spark.query.wand import bm25_topk_segments

    cfg = EngineConfig(
        index=IndexConfig(
            hot_term_doc_fraction=0.05,
            hot_term_min_df=500,
            salt_buckets=16,
            term_buckets=64,
        )
    )

    # Spread the corpus across all cores before the Python UDF stages: tiny
    # parquet files coalesce to a handful of scan partitions (maxPartitionBytes
    # + openCost), which would cap chunk/tokenize parallelism regardless of
    # executor count. At real scale the input files are large enough that the
    # scan parallelizes by itself.
    docs = spark.read.parquet(corpus_path).repartition(cpus * 4)
    n_files = docs.count()  # also warms the JVM + scan

    # Warm-up (excluded from the timed window per the BASELINE.md protocol):
    # run a COMPLETE miniature build + query over ~2% of the corpus. This
    # warms the Python worker pool across all task slots (one-time fork +
    # numpy/pandas import per worker) AND JIT/codegen-compiles every hot
    # JVM loop of the real job (UDF pipeline, explode, shuffle write/read,
    # sort, parquet write, scorer exchange). Measured cold-JIT cost is
    # ~15-20s per process — identical at every parallelism level, so
    # leaving it in would understate scaling efficiency rather than
    # measure the engine.
    warm_idx = os.path.join(work_dir, f"index_warm_{cpus}")
    shutil.rmtree(warm_idx, ignore_errors=True)
    build_index(
        spark,
        index_dir=warm_idx,
        cfg=cfg,
        wave_size=64,
        documents=docs.limit(20_000).repartition(cpus * 2),
    )
    qwarm = spark.createDataFrame(fixture_queries()[:4], ["query_id", "query_text"])
    bm25_topk_segments(spark, warm_idx, qwarm, k=10).count()
    Searcher(spark, warm_idx).topk(fixture_queries()[:4], k=10).count()
    shutil.rmtree(warm_idx, ignore_errors=True)

    idx = os.path.join(work_dir, f"index_{cpus}")
    shutil.rmtree(idx, ignore_errors=True)

    t0 = time.perf_counter()
    build_index(spark, index_dir=idx, cfg=cfg, wave_size=64, documents=docs)
    build_sec = time.perf_counter() - t0

    # Serving: a Searcher bound to the index, as a server process would run
    # it. The timed 50-query batch starts with a COLD df cache (it includes
    # the one bucket-pruned lexicon lookup); p50 is per-query latency on
    # the warm searcher.
    searcher = Searcher(spark, idx)
    t0 = time.perf_counter()
    n_results = searcher.topk(fixture_queries(), k=10).count()
    query_batch_sec = time.perf_counter() - t0

    lat = []
    for qid, qtext in fixture_queries()[:12]:
        t0 = time.perf_counter()
        searcher.topk([(qid, qtext)], k=10).collect()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = lat[len(lat) // 2]

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_files": n_files,
                "build_sec": round(build_sec, 2),
                "files_per_sec": round(n_files / build_sec, 1),
                "query_batch_sec": round(query_batch_sec, 2),
                "n_results": n_results,
                "query_p50_sec": round(p50, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], sys.argv[3])
