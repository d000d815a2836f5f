"""Driver-style correctness sweep: every queries() entry at sf0.01 vs its
DuckDB oracle (rows + values, columns sorted by name), mirroring the
harness's CORRECTNESS gate so mismatches surface before the round runs.

    python bench/gate_sweep.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, osql = entry.queries(), entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, args.sf_dir)
            srows = sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            fails.append(name)
            print(f"{name}: SPARK ERROR {str(ex)[:200]}", flush=True)
            continue
        if name not in osql:
            print(f"{name}: rows-only ({len(srows)} rows) [{time.time() - t0:.1f}s]",
                  flush=True)
            continue
        try:
            cols = sorted(con.sql(osql[name]).columns)
            sel = ", ".join('"' + c + '"' for c in cols)
            drows = sorted(
                tuple(r)
                for r in con.sql(
                    f"SELECT {sel} FROM ({osql[name]})"
                ).fetchall()
            )
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print(f"{name}: ORACLE ERROR {str(ex)[:200]}", flush=True)
            continue
        ok = len(srows) == len(drows) and all(
            len(sr) == len(dr)
            and all(
                a == b
                or (
                    isinstance(a, float)
                    and isinstance(b, (float, int))
                    and math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
                )
                for a, b in zip(sr, dr)
            )
            for sr, dr in zip(srows, drows)
        )
        if not ok:
            fails.append(name)
        print(
            f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows) "
            f"[{time.time() - t0:.1f}s]",
            flush=True,
        )
    print(f"SWEEP {'CLEAN' if not fails else 'FAILS: ' + ', '.join(fails)}",
          flush=True)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
