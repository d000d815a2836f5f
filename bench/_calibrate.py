"""Host-regime calibration: a fixed, deterministic, single-core kernel.

The in-VM external-load meter (bench/_hostload.py) sees co-tenant CPU use
INSIDE this VM, but host-side steal is invisible to it: both r3e pairs
recorded ext_cores ~0.0 while every phase of both levels ran 8-60% slower
than the 2026-08-17 pairs. Timing a fixed kernel measures the regime
directly: the same instruction stream taking 1.3x longer means the box is
1.3x slower right now, whatever the cause.

The kernel mixes the two things the build actually does: cache-local
Python/object work (dict interning, like the chunker/tokenizer hot loop)
and memory-bandwidth-bound numpy (sort + gather, like the merge phase).
Single-threaded, fixed seed, no allocation growth across reps.

Usage: `python bench/_calibrate.py [reps]` prints one JSON line
{"cal_sec": <min over reps>, "reps": [...]}. Library: `calibrate()`.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _kernel() -> None:
    # numpy leg: sort + argsort-gather of 4M int64 (DRAM + cache mix,
    # the merge phase's dominant primitives)
    rng = np.random.RandomState(42)
    a = rng.randint(0, 1 << 62, size=4_000_000).astype(np.int64)
    order = np.argsort(a, kind="stable")
    b = a[order]
    # python-object leg: interning loop like the tokenizer vocab
    vocab: dict = {}
    x = 1469598103934665603
    for i in range(400_000):
        x = (x * 1099511628211 + i) & ((1 << 64) - 1)
        vocab.setdefault(x >> 40, i)
    if int(b[0]) > int(b[-1]):  # keep both legs live
        raise AssertionError


def calibrate(reps: int = 3) -> tuple[float, list[float]]:
    """-> (min seconds over reps, all rep timings). Min, not mean: the min
    is the least-interrupted pass and tracks the regime's best case, which
    is what within-pair drift comparisons need."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _kernel()
        times.append(round(time.perf_counter() - t0, 4))
    return min(times), times


def _mp_worker(reps: int) -> None:
    for _ in range(reps):
        _kernel()


def concurrent_throughput(nprocs: int, reps: int = 2) -> float:
    """Aggregate kernels/sec with `nprocs` concurrent single-core
    processes — the box's ACHIEVABLE parallel speed in this window.

    The single-process cal_sec can't see multi-core host steal: an
    oversubscribed host can give 2 vCPUs nearly full speed while 8 vCPUs
    fight for physical cores, which depresses the 4N build level and no
    single-core meter notices. Running the same deterministic kernel on
    nprocs processes measures exactly the ceiling the build faces at that
    core count. (fork start method: workers inherit the loaded numpy, no
    import cost inside the timed window.)"""
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    procs = [
        ctx.Process(target=_mp_worker, args=(reps,)) for _ in range(nprocs)
    ]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    return nprocs * reps / wall


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cal, reps = calibrate(n)
    out = {"cal_sec": cal, "reps": reps}
    if len(sys.argv) > 2:  # optional: concurrent ceiling at K procs
        k = int(sys.argv[2])
        out["thr_1"] = round(concurrent_throughput(1), 3)
        out[f"thr_{k}"] = round(concurrent_throughput(k), 3)
    print(json.dumps(out))
