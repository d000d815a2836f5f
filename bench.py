"""Benchmark harness — prints ONE JSON line with headline query timings.

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)

Headline queries:
  q_index_build   corpus -> chunk -> flat postings + stats, written to parquet
                  (the north-star indexing-throughput metric; files/sec derived)
  q_bm25_batch    50-query BM25 top-k batch over the built index
  q_bm25_chunked  full path incl. chunking at gate scale
  q_dedup_lsh     minhash signatures + banded LSH candidate pairs
  q_jaccard       exact 3-gram Jaccard pairs
  q_knn           brute-force cosine top-k over embeddings

Run `python bench/scaling.py` for the two-parallelism (N vs 4N cores)
scaling-efficiency report written to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("quickb_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "5000")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import functions as F

    from quickb_spark import gate
    from quickb_spark.corpus import fixture_queries
    from quickb_spark.index.build import (
        build_doc_stats,
        build_flat_postings,
        build_term_stats,
        corpus_stats,
    )
    from quickb_spark.query.bm25 import bm25_topk_flat

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="qkb_bench_")
    timings: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)

        return _T()

    # Warm the JVM + Python workers so timings measure the jobs, not startup.
    docs_src = gate.load(spark, sf_dir, "documents")
    n_files = docs_src.count()

    corpus = gate._as_corpus(spark, sf_dir)

    with timed("q_index_build"):
        from quickb_spark.chunking import chunk_documents

        chunks = chunk_documents(corpus)
        flat = build_flat_postings(chunks)
        flat.write.mode("overwrite").parquet(f"{tmp}/postings")
        flat_r = spark.read.parquet(f"{tmp}/postings")
        build_doc_stats(flat_r).write.mode("overwrite").parquet(f"{tmp}/doc_stats")
        build_term_stats(flat_r).write.mode("overwrite").parquet(f"{tmp}/term_stats")

    flat_r = spark.read.parquet(f"{tmp}/postings")
    doc_stats = spark.read.parquet(f"{tmp}/doc_stats").cache()
    term_stats = spark.read.parquet(f"{tmp}/term_stats").cache()
    n, avgdl = corpus_stats(doc_stats)

    qdf = spark.createDataFrame(fixture_queries(), ["query_id", "query_text"])
    with timed("q_bm25_batch"):
        bm25_topk_flat(flat_r, term_stats, doc_stats, qdf, n, avgdl, k=10).collect()

    with timed("q_bm25_chunked"):
        gate.q_bm25_chunked(spark, sf_dir).collect()

    with timed("q_dedup_lsh"):
        gate.q_lsh_pairs(spark, sf_dir).count()

    with timed("q_jaccard"):
        gate.q_ngram_jaccard(spark, sf_dir).count()

    with timed("q_knn"):
        gate.q_knn_cosine(spark, sf_dir).collect()

    total = round(sum(timings.values()), 3)
    files_per_sec = round(n_files / timings["q_index_build"], 1)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "n_files": n_files,
                "index_files_per_sec": files_per_sec,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
