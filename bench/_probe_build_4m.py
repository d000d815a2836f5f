"""Round-4 probe helper: build a v5 index over the reusable 4M corpus."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str((1 << 31) - 1))
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.driver.memory", "48g")
         .config("spark.driver.extraJavaOptions", "-Xms24g -XX:+AlwaysPreTouch")
         .config("spark.sql.shuffle.partitions", "128")
         .config("spark.ui.enabled", "false")
         .config("spark.local.dir", "/dev/shm/qkb_spark_local")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from quickb_spark.config import EngineConfig, IndexConfig
from quickb_spark.index.segments import build_index
cfg = EngineConfig(index=IndexConfig(
    hot_term_doc_fraction=0.05, hot_term_min_df=500,
    salt_buckets=16, term_buckets=64, p1_task_bytes=8 << 20))
t0 = time.perf_counter()
timings = {}
build_index(spark, index_dir=sys.argv[2], cfg=cfg, corpus_uri=sys.argv[1],
            timings=timings)
print("BUILD_SEC", round(time.perf_counter() - t0, 1), timings, flush=True)
spark.stop()
