"""Controlled A/B for the q_jaccard optimizations (VERDICT r2 item 4).

Round 2 changed ngram_jaccard_pairs to (a) xxhash64 shingle strings to
int64 before any shuffle and (b) persist the distinct (id, shingle) set —
and q_jaccard's single-run driver bench number REGRESSED 13.3 -> 15.6s,
inside the box's documented +-30-50% noise band. This script settles it:
same session, interleaved trials of both variants (A = both
optimizations, B = neither, i.e. the r1 form), best-of-N each, so
time-varying host noise hits both arms equally.

    python bench/jaccard_ab.py [--sf-dir /root/testdata/sf0.1] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from quickb_spark import gate
    from quickb_spark.ops.dedup import ngram_jaccard_pairs

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = gate.load(spark, args.sf_dir, "documents")

    def run(hash_to_int64: bool, persist: bool) -> float:
        t0 = time.perf_counter()
        n = ngram_jaccard_pairs(
            docs,
            threshold=0.5,
            max_shingle_df=1000,
            hash_to_int64=hash_to_int64,
            persist=persist,
        ).count()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt, n

    run(True, True)  # warm-up (JIT + scan cache), untimed
    results = {"A_hash_persist": [], "B_r1_form": [], "C_hash_only": []}
    for _ in range(args.trials):  # interleaved: noise hits all arms alike
        results["A_hash_persist"].append(run(True, True))
        results["B_r1_form"].append(run(False, False))
        results["C_hash_only"].append(run(True, False))
    counts = {k: {t[1] for t in v} for k, v in results.items()}
    assert len(set.union(*counts.values())) == 1, f"variant outputs differ: {counts}"
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "cpus": args.cpus,
                "trials": {k: sorted(round(t[0], 2) for t in v) for k, v in results.items()},
                "best": {k: round(min(t[0] for t in v), 2) for k, v in results.items()},
                "n_pairs": next(iter(counts["A_hash_persist"])),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
