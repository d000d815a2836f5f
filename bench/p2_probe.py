"""Phase-2 direct-encode scaling probe (round 3).

Pair logs show phase-2 encode speeding up only ~1.3x from 4 to 16 cores
even though it is file-granular pyarrow tasks. This probe times, on ONE
fixed checkpoint (reuse an index dir from a scaling trial):

  mp      pure multiprocessing.Pool calling _encode_one_file directly
          (hardware + kernel control, no Spark)
  spark   encode_wave_direct through a local-cluster session

at each level, back-to-back in one invocation (matched-pair discipline).

    python bench/p2_probe.py --index /dev/shm/.../index_16 [--levels 4,16]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _mp_one(args):
    from quickb_spark.index.p2_direct import _encode_one_file, pyarrow_fs_for

    flat_dir, seg_dir, bucket, path, block_size = args
    fsys, _ = pyarrow_fs_for(flat_dir)
    ofs, seg_root = pyarrow_fs_for(seg_dir)
    return _encode_one_file(fsys, ofs, path, bucket, seg_root, block_size, True)


def run_mp(index_dir: str, nproc: int, block_size: int) -> float:
    from quickb_spark.index.p2_direct import list_bucket_files

    flat_dir = os.path.join(index_dir, "flat")
    out = "/dev/shm/qkb_p2probe_mp"
    shutil.rmtree(out, ignore_errors=True)
    files = list_bucket_files(flat_dir, list(range(64)))
    files.sort(key=lambda t: -t[2])
    work = [(flat_dir, out, b, p, block_size) for b, p, _ in files]
    t0 = time.perf_counter()
    with mp.Pool(nproc) as pool:
        n = sum(1 for _ in pool.imap_unordered(_mp_one, work, chunksize=4))
    dt = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    assert n == len(work)
    return dt


_SPARK_WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

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
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", "/dev/shm/qkb_p2probe_local")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from quickb_spark.index.p2_direct import encode_wave_direct

flat_dir = os.path.join({index!r}, "flat")
out = "/dev/shm/qkb_p2probe_spark"

# warm-up: one small wave
shutil.rmtree(out, ignore_errors=True)
encode_wave_direct(spark, flat_dir, out, [0], {block_size}, True)

shutil.rmtree(out, ignore_errors=True)
t0 = time.perf_counter()
rows = encode_wave_direct(spark, flat_dir, out, list(range(64)), {block_size}, True)
dt = time.perf_counter() - t0
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({{"cpus": cpus, "spark_sec": round(dt, 2), "n_files": len(rows)}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--block-size", type=int, default=128)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    for cpus in levels:
        mp_sec = run_mp(args.index, cpus, args.block_size)
        code = _SPARK_WORKER.format(
            repo=REPO, cpus=cpus, index=args.index, block_size=args.block_size
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd=REPO, timeout=1800,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise RuntimeError(f"spark probe cpus={cpus} failed")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        r["mp_sec"] = round(mp_sec, 2)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
