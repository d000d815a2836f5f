"""Round-5 A/B: doc_len carried in phase-1 runs (legacy v4 layout) vs the
round-4 shed-and-re-attach layout (runs without doc_len; phase 2 re-attaches
it from the doc-stats runs via a per-posting searchsorted).

Round-4's rework predicted less merge traffic; the driver bench instead
measured q_index_build 1.76s -> 3.64s and the 4M pairs showed phase 2
absolutely slower at BOTH levels (VERDICT r4 "What's wrong" #1). Hypothesis:
the re-attach is ~20+ cache-missing DRAM probes per posting on the already
DRAM-bound merge, which costs more than the 8 sequential bytes/posting it
saves. This probe settles it: alternating interleaved reps (A B A B ...) of
the full build at one parallelism, per-phase timings printed each rep.

Usage: python bench/p2_dl_ab.py [sf_dir] [cpus] [reps]
"""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str((1 << 31) - 1))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

from pyspark.sql import SparkSession

from quickb_spark import gate
from quickb_spark.config import EngineConfig, IndexConfig
from quickb_spark.index.segments import build_index
from quickb_spark.session import tune_builder

spark = (
    tune_builder(SparkSession.builder).master(f"local[{cpus}]")
    .appName("p2-dl-ab")
    .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
    .config("spark.driver.memory", "16g")
    .config("spark.driver.extraJavaOptions", "-Xms12g -XX:+AlwaysPreTouch")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

tmp = tempfile.mkdtemp(prefix="qkb_dlab_", dir="/dev/shm")
corpus_dir = f"{tmp}/corpus"
gate._as_corpus(spark, sf_dir).repartition(cpus * 2).write.parquet(corpus_dir)


def mkcfg(dl_in_runs: bool) -> EngineConfig:
    return EngineConfig(
        index=IndexConfig(
            hot_term_doc_fraction=0.05,
            hot_term_min_df=500,
            salt_buckets=16,
            term_buckets=64,
            p1_dl_in_runs=dl_in_runs,
        )
    )


# warm-up (JIT/codegen + worker pool), untimed
warm = f"{tmp}/warm"
build_index(spark, index_dir=warm, cfg=mkcfg(True),
            documents=spark.read.parquet(corpus_dir).limit(500))
shutil.rmtree(warm, ignore_errors=True)

results: dict[str, list] = {"dl_in_runs": [], "ds_reattach": []}
for rep in range(reps):
    for label, flag in (("dl_in_runs", True), ("ds_reattach", False)):
        idx = f"{tmp}/idx_{label}_{rep}"
        timings: dict = {}
        t0 = time.perf_counter()
        build_index(spark, index_dir=idx, cfg=mkcfg(flag), corpus_uri=corpus_dir,
                    timings=timings)
        wall = round(time.perf_counter() - t0, 2)
        results[label].append((wall, timings))
        print(f"rep {rep} {label}: wall={wall}s {timings}", flush=True)
        shutil.rmtree(idx, ignore_errors=True)

print("\n=== summary (min over reps) ===")
for label, rows in results.items():
    best = min(rows, key=lambda r: r[0])
    print(f"{label}: min wall={best[0]}s  phases={best[1]}")
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
