"""Round-5 A/B at the 4M-doc scale: dl-in-runs vs ds-re-attach layouts.

The sf0.1 probe (bench/p2_dl_ab.py) showed the two near-equal there — the
doc-stats lookup fits cache at 42k docs. At 4M docs the lookup is a 64 MB
table and every posting pays ~22 cache-missing probes, which is the
hypothesis for the round-4 phase-2 absolute regression (VERDICT r4 #1).

Usage: python bench/p2_dl_ab_4m.py <corpus_dir> [cpus] [reps]
"""
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str((1 << 31) - 1))

corpus = sys.argv[1]
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.driver.memory", "48g")
    .config("spark.driver.extraJavaOptions", "-Xms24g -XX:+AlwaysPreTouch")
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.local.dir", "/dev/shm/qkb_spark_local")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from quickb_spark.config import EngineConfig, IndexConfig
from quickb_spark.index.segments import build_index


def mkcfg(dl_in_runs: bool) -> EngineConfig:
    return EngineConfig(index=IndexConfig(
        hot_term_doc_fraction=0.05, hot_term_min_df=500,
        salt_buckets=16, term_buckets=64, p1_task_bytes=8 << 20,
        p1_dl_in_runs=dl_in_runs))


work = "/dev/shm/qkb_dlab4m"
os.makedirs(work, exist_ok=True)

# warm-up: mini direct build over a slice of the corpus
warm_corpus = f"{work}/warm_corpus"
if not os.path.exists(warm_corpus):
    spark.read.parquet(corpus).limit(20000).repartition(32).write.mode(
        "overwrite").parquet(warm_corpus)
build_index(spark, index_dir=f"{work}/warm_idx", cfg=mkcfg(True),
            corpus_uri=warm_corpus)
shutil.rmtree(f"{work}/warm_idx", ignore_errors=True)

for rep in range(reps):
    for label, flag in (("dl_in_runs", True), ("ds_reattach", False)):
        idx = f"{work}/idx"
        shutil.rmtree(idx, ignore_errors=True)
        timings: dict = {}
        t0 = time.perf_counter()
        build_index(spark, index_dir=idx, cfg=mkcfg(flag),
                    corpus_uri=corpus, timings=timings)
        wall = round(time.perf_counter() - t0, 1)
        print(f"rep {rep} {label}: wall={wall}s {timings}", flush=True)
        shutil.rmtree(idx, ignore_errors=True)

shutil.rmtree(work, ignore_errors=True)
spark.stop()
