"""Fine-grained serving-task decomposition: where do the FIRST batch's
extra seconds go inside _serve_range_task, given a fully-warm cache?

Wraps wand's kernels with timing accumulators inside each worker, runs
cold + 2 warm batches, prints per-task (slice_sec, struct_sec, score_sec,
other_sec) so the first-execution overhead is attributable.

    python bench/serve_probe2.py <cpus> <index_dir>
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
        import time as _t

        from quickb_spark.query import serve_direct as sd
        from quickb_spark.query import wand

        acc = {"struct": 0.0, "score": 0.0, "cache": 0.0}
        real_bs, real_sq = wand._build_struct, wand._score_query_set
        real_ct = sd._cached_table

        def bs(*a, **k):
            t0 = _t.perf_counter()
            r = real_bs(*a, **k)
            acc["struct"] += _t.perf_counter() - t0
            return r

        def sq(*a, **k):
            t0 = _t.perf_counter()
            r = real_sq(*a, **k)
            acc["score"] += _t.perf_counter() - t0
            return r

        def ct(*a, **k):
            t0 = _t.perf_counter()
            r = real_ct(*a, **k)
            acc["cache"] += _t.perf_counter() - t0
            return r

        wand._build_struct, wand._score_query_set = bs, sq
        sd._cached_table = ct
        try:
            t0 = _t.perf_counter()
            chunk = sd._serve_range_task(payload)
            total = _t.perf_counter() - t0
        finally:
            wand._build_struct, wand._score_query_set = real_bs, real_sq
            sd._cached_table = real_ct
        return {
            "range": payload[0], "pid": _os.getpid(),
            "total": round(total, 3),
            "cache": round(acc["cache"], 3),
            "struct": round(acc["struct"], 3),
            "score": round(acc["score"], 3),
            "slice_other": round(
                total - acc["cache"] - acc["struct"] - acc["score"], 3
            ),
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
    print(json.dumps({"n_ranges": len(payloads), "n_files": len(files)}),
          flush=True)
    s.preload()
    for name in ("cold", "warm", "warm2"):
        out = _probe_batch(sc, payloads, files)
        print(json.dumps({name: out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
