"""Micro A/B: phase-1 checkpoint shuffle with term STRINGS vs xxhash64 int64.

The phase-1 reduce side (shuffle fetch -> sortWithinPartitions -> parquet
write) is the largest single pool of time in the index build and the part
whose 4N-executor efficiency decides the north-rule number. Term strings
are only needed for the lexicon; the postings themselves can carry
xxhash64(term) (8 bytes, radix-sortable) instead. This probe measures the
end-to-end phase-1 time of both variants in ONE session, interleaved, at a
given master, so host noise hits both arms equally.

    python bench/p1_hash_ab.py <corpus> [--cpus 4] [--cluster] [--trials 2]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus")
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--cluster", action="store_true")
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    if args.cluster:
        w = max(1, args.cpus // 4)
        master = f"local-cluster[{w},4,14336]"
        builder = (
            SparkSession.builder.master(master)
            .config("spark.driver.memory", "8g")
            .config("spark.executor.memory", "12g")
            .config("spark.executor.extraJavaOptions", "-Xms12g -XX:+AlwaysPreTouch")
            .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
            .config("spark.executorEnv.PYTHONPATH", REPO)
        )
    else:
        master = f"local[{args.cpus}]"
        builder = SparkSession.builder.master(master).config(
            "spark.driver.memory", "24g"
        )
    spark = (
        builder.appName("p1-hash-ab")
        .config("spark.driver.extraJavaOptions", "-Xms6g -XX:+AlwaysPreTouch")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/qkb_spark_local")
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from quickb_spark.config import EngineConfig
    from quickb_spark.index.flatten import flat_postings_from_documents

    cfg = EngineConfig()
    docs = spark.read.parquet(args.corpus)
    nb, g = 64, 8
    work = "/dev/shm/qkb_p1ab"

    def run(variant: str) -> float:
        out = f"{work}/{variant}"
        shutil.rmtree(out, ignore_errors=True)
        flat = flat_postings_from_documents(docs, cfg).withColumn(
            "salt", F.lit(0).cast("int")
        )
        if variant == "hash":
            flat = flat.withColumn("term_h", F.xxhash64("term")).drop("term")
            key, srt = "term_h", ["bucket", "term_h", "salt", "doc_id"]
            bucket = F.pmod(F.col("term_h"), F.lit(nb)).cast("int")
            sub = F.pmod(F.xxhash64("term_h", "salt"), F.lit(g))
        else:
            key, srt = "term", ["bucket", "term", "salt", "doc_id"]
            bucket = F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int")
            sub = F.pmod(F.xxhash64("term", "salt"), F.lit(g))
        t0 = time.perf_counter()
        (
            flat.withColumn("bucket", bucket)
            .repartition(nb * g, F.col("bucket"), sub)
            .sortWithinPartitions(*srt)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out)
        )
        dt = time.perf_counter() - t0
        sz = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(out)
            for f in fs
        )
        print(
            f"[{master}] {variant:7s} phase1: {dt:7.1f}s  checkpoint "
            f"{sz / 1e6:.0f} MB",
            flush=True,
        )
        return dt

    # warm-up (JIT + python workers) on 2% of input
    small = docs.sample(False, 0.02, seed=1).cache()
    small.count()
    fp = flat_postings_from_documents(small, cfg)
    fp.withColumn("salt", F.lit(0)).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int")
    ).repartition(8).write.mode("overwrite").parquet(f"{work}/warm")
    small.unpersist()

    results: dict[str, list[float]] = {"string": [], "hash": []}
    for _ in range(args.trials):
        for v in ("string", "hash"):
            results[v].append(run(v))
    for v, ts in results.items():
        print(f"{v}: min {min(ts):.1f}s  all {['%.1f' % t for t in ts]}")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
