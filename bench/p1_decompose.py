"""Phase-1 scaling decomposition probe (round 3).

Pair 20260817-131022#0 showed phase 1 (fused chunk+tokenize kernel ->
salted bucketed shuffle -> sorted checkpoint write) speeding up only 1.85x
from 4 to 16 cores while the pure-Python multiprocessing control for the
same kernel scales 0.89-1.01. This probe decomposes phase 1 at both levels
to locate the non-scaling component:

  scan    JVM-only parquet scan + count of the corpus (no Python)
  kernel  fused kernel -> JVM posexplode -> count() (kernel + Arrow
          channel + explode, NO shuffle, NO write)
  full    complete phase 1 (kernel + repartition/sort + checkpoint write)

full - kernel isolates the shuffle+sort+write; kernel - scan isolates the
Python kernel + channel. Same matched-pair discipline as bench/scaling.py:
each invocation runs 4 then 16 back-to-back in separate JVMs.

    python bench/p1_decompose.py --corpus <parquet> [--levels 4,16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

_WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F

cpus = {cpus}
workers = max(1, cpus // 4)
spark = (
    SparkSession.builder.master(f"local-cluster[{{workers}},4,14336]")
    .config("spark.driver.memory", "8g")
    .config("spark.executor.memory", "12g")
    .config("spark.executor.extraJavaOptions", "-Xms12g -XX:+AlwaysPreTouch")
    .config("spark.driver.extraJavaOptions", "-Xms6g -XX:+AlwaysPreTouch")
    .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
    .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "60s")
    .config("spark.executorEnv.PYTHONPATH", {repo!r})
    .config("spark.sql.shuffle.partitions", str(cpus * 4))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", "/dev/shm/qkb_p1probe_local")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    .config("spark.sql.files.openCostInBytes", str(512 * 1024))
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from quickb_spark.config import EngineConfig, IndexConfig
from quickb_spark.index.flatten import flat_postings_from_documents
from quickb_spark.index.segments import _subgroups_per_bucket

cfg = EngineConfig(index=IndexConfig(
    hot_term_doc_fraction=0.05, hot_term_min_df=500,
    salt_buckets=16, term_buckets=64,
))
docs = spark.read.parquet({corpus!r})

# warm-up: full mini phase-1 (kernel + shuffle + write) over ~2%
warm = docs.limit(20000)
wdir = "/dev/shm/qkb_p1probe_warm"
shutil.rmtree(wdir, ignore_errors=True)
(flat_postings_from_documents(warm, cfg)
 .withColumn("term_h", F.xxhash64("term")).drop("term")
 .repartition(cpus * 4, "term_h")
 .sortWithinPartitions("term_h", "doc_id")
 .write.mode("overwrite").parquet(wdir))
shutil.rmtree(wdir, ignore_errors=True)

res = {{"cpus": cpus}}

t0 = time.perf_counter()
n = docs.count()
res["scan_sec"] = round(time.perf_counter() - t0, 2)

t0 = time.perf_counter()
flat = flat_postings_from_documents(docs, cfg)
k = flat.count()
res["kernel_sec"] = round(time.perf_counter() - t0, 2)
res["n_postings"] = k

nb = cfg.index.term_buckets
g = _subgroups_per_bucket(cpus, nb, k, cfg)
out = "/dev/shm/qkb_p1probe_out"
shutil.rmtree(out, ignore_errors=True)
t0 = time.perf_counter()
(flat_postings_from_documents(docs, cfg)
 .withColumn("salt", F.lit(0).cast("int"))
 .withColumn("term_h", F.xxhash64("term")).drop("term")
 .withColumn("bucket", F.pmod(F.col("term_h"), F.lit(nb)).cast("int"))
 .repartition(nb * g, F.col("bucket"), F.pmod(F.xxhash64("term_h", "salt"), F.lit(g)))
 .sortWithinPartitions("bucket", "term_h", "salt", "doc_id")
 .write.mode("overwrite").partitionBy("bucket").parquet(out))
res["full_sec"] = round(time.perf_counter() - t0, 2)
shutil.rmtree(out, ignore_errors=True)

print(json.dumps(res))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--pairs", type=int, default=1)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    for p in range(args.pairs):
        for cpus in levels:
            code = _WORKER.format(repo=REPO, cpus=cpus, corpus=args.corpus)
            t0 = time.time()
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                cwd=REPO, timeout=3600,
            )
            if out.returncode != 0:
                sys.stderr.write(out.stderr[-4000:])
                raise RuntimeError(f"probe cpus={cpus} failed")
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            r["pair"] = p
            r["wall"] = round(time.time() - t0, 1)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
