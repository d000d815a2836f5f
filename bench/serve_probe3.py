"""Per-task rusage deltas for the serving batch: is the first-task
slowdown CPU (fault zeroing shows as utime/stime) or a stall?

    python bench/serve_probe3.py <cpus> <index_dir>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from serve_probe import _plan, _session  # noqa: E402


def _probe_batch(sc, payloads, files):
    def _run(payload):
        import os as _os
        import resource as _r
        import time as _t

        from quickb_spark.query import serve_direct as sd

        r0 = _r.getrusage(_r.RUSAGE_SELF)
        t0 = _t.perf_counter()
        chunk = sd._serve_range_task(payload)
        wall = _t.perf_counter() - t0
        r1 = _r.getrusage(_r.RUSAGE_SELF)
        return {
            "range": payload[0], "pid": _os.getpid(),
            "wall": round(wall, 3),
            "utime": round(r1.ru_utime - r0.ru_utime, 3),
            "stime": round(r1.ru_stime - r0.ru_stime, 3),
            "minflt": r1.ru_minflt - r0.ru_minflt,
            "majflt": r1.ru_majflt - r0.ru_majflt,
            "maxrss_mb": r1.ru_maxrss // 1024,
            "n_rows": len(chunk),
        }

    t0 = time.perf_counter()
    res = sc.parallelize(payloads, len(payloads)).map(_run).collect()
    return {"wall_sec": round(time.perf_counter() - t0, 2), "tasks": res}


def main() -> None:
    cpus = int(sys.argv[1])
    index_dir = sys.argv[2]
    spark = _session(cpus)
    sc = spark.sparkContext

    from quickb_spark.corpus import fixture_queries
    from quickb_spark.query.searcher import Searcher

    s = Searcher(spark, index_dir)
    payloads, files = _plan(s, fixture_queries())
    s.preload()
    for name in ("cold", "warm"):
        out = _probe_batch(sc, payloads, files)
        print(json.dumps({name: out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
