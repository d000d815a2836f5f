"""A/B the phase-2 merge kernel's sort+gather on a REAL runs checkpoint.

Candidates (both produce the same (term_h, salt, doc_id)-ordered columns
the encode core consumes; keys are unique per posting, so any correct
sort yields the identical permutation):

  numpy   the shipping kernel: np.lexsort (3 stable argsort passes) +
          per-column fancy-index gathers + Arrow take for pos_vb
  arrow   pyarrow C++ sort_indices over the 3 sort keys + ONE table-wide
          take (all columns gathered in C++), numpy views on the result

Why bother: sort+gather is the DRAM-heavy half of the merge phase (the
multiprocessing control scales it 0.52-0.62 on this one-socket box);
less memory traffic here lifts both absolute throughput and N->4N
scaling. pa.set_cpu_count(1) keeps the comparison honest (one core slot
per task, as in the engine).

    python bench/p2_sort_ab.py --index /dev/shm/qkb_idx_4m [--buckets 3]

Prints one JSON line per (bucket, variant, rep) and a summary of min
times, after asserting the two variants' outputs are byte-identical.

RECORDED RESULT (2026-08-18, real 4M-doc checkpoint, biggest buckets,
BENCH/logs/p2_sort_ab_20260818.log): arrow THROUGHPUT = 0.83-0.90x of
numpy's, i.e. arrow is SLOWER — the C++ sort+take loses to the shipping
lexsort+gather. A third variant
(dense-rank terms via searchsorted, then doc-pass timsort + two uint16
LSD radix argsort passes on the group key) measured 0.64x: each radix
pass adds two full-width permutation gathers, and gathers, not
comparisons, are what DRAM bounds here. The shipping kernel stands:
np.lexsort's 3 passes over 15.5M postings run ~4s while a SINGLE
int64 stable argsort runs ~1.7s, i.e. lexsort is already within ~20%
of the one-pass floor on this box.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

COLS = ["term_h", "salt", "doc_id", "tf", "doc_len", "pos_vb"]


def load_bucket(flat_dir: str, bucket: int):
    import pyarrow as pa
    import pyarrow.parquet as pq

    bdir = os.path.join(flat_dir, f"bucket={bucket}")
    names = [
        f for f in sorted(os.listdir(bdir)) if f.endswith(".parquet")
    ] if os.path.isdir(bdir) else []
    if not names:
        raise SystemExit(f"no parquet run files in {bdir} — is --index a "
                         "direct-build flat checkpoint?")
    # round-4 runs dropped the per-posting doc_len column; probe whatever
    # schema this checkpoint actually has
    have = set(pq.ParquetFile(os.path.join(bdir, names[0])).schema_arrow.names)
    cols = [c for c in COLS if c in have]
    tbls = [
        pq.read_table(os.path.join(bdir, f), columns=cols) for f in names
    ]
    return pa.concat_tables(tbls) if len(tbls) > 1 else tbls[0]


def run_numpy(tbl):
    """The shipping kernel's sort+gather (mirrors _merge_one_bucket)."""
    import pyarrow as pa

    idx = tbl.column("term_h").to_numpy(zero_copy_only=False)
    salt = tbl.column("salt").to_numpy(zero_copy_only=False)
    doc_id = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    tf = tbl.column("tf").to_numpy(zero_copy_only=False)
    has_dl = "doc_len" in tbl.schema.names
    order = np.lexsort((doc_id, salt, idx))
    out = (idx[order], salt[order], doc_id[order], tf[order]) + (
        (tbl.column("doc_len").to_numpy(zero_copy_only=False)[order],)
        if has_dl else ()
    )
    taken = (
        tbl.column("pos_vb").combine_chunks().take(pa.array(order))
        .cast(pa.large_binary())
    )
    pos_off = np.frombuffer(taken.buffers()[1], dtype=np.int64)[
        : len(order) + 1
    ]
    pos_vals = bytes(memoryview(taken.buffers()[2])[: pos_off[-1]])
    return out, pos_off, pos_vals


def run_arrow(tbl):
    """Arrow C++ sort_indices + one table-wide take."""
    import pyarrow as pa
    import pyarrow.compute as pc

    order = pc.sort_indices(
        tbl,
        sort_keys=[
            ("term_h", "ascending"),
            ("salt", "ascending"),
            ("doc_id", "ascending"),
        ],
    )
    taken = tbl.take(order)
    out = tuple(
        taken.column(c).to_numpy(zero_copy_only=False)
        for c in ("term_h", "salt", "doc_id", "tf", "doc_len")
        if c in taken.schema.names
    )
    pos = taken.column("pos_vb").combine_chunks().cast(pa.large_binary())
    n = taken.num_rows
    pos_off = np.frombuffer(pos.buffers()[1], dtype=np.int64)[: n + 1]
    pos_vals = bytes(memoryview(pos.buffers()[2])[: pos_off[-1]])
    return out, pos_off, pos_vals


def main() -> None:
    import pyarrow as pa

    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--buckets", type=int, default=3)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    pa.set_cpu_count(1)
    flat_dir = os.path.join(args.index, "flat")
    sizes = []
    for d in os.listdir(flat_dir):
        if d.startswith("bucket="):
            b = int(d.split("=")[1])
            sz = sum(
                os.path.getsize(os.path.join(flat_dir, d, f))
                for f in os.listdir(os.path.join(flat_dir, d))
                if f.endswith(".parquet")
            )
            sizes.append((sz, b))
    sizes.sort(reverse=True)
    if not sizes:
        raise SystemExit(f"no bucket= dirs under {flat_dir}")
    picks = [b for _, b in sizes[: args.buckets]]
    print(f"biggest buckets: {picks} ({[s for s, _ in sizes[:args.buckets]]} bytes)")

    summary = {}
    for b in picks:
        tbl = load_bucket(flat_dir, b)
        n = tbl.num_rows
        # correctness: byte-identical outputs (keys unique -> unique order)
        o1, off1, v1 = run_numpy(tbl)
        o2, off2, v2 = run_arrow(tbl)
        for a, c in zip(o1, o2):
            assert np.array_equal(a, c)
        assert np.array_equal(off1, off2) and v1 == v2
        del o1, o2, off1, off2, v1, v2

        for name, fn in (("numpy", run_numpy), ("arrow", run_arrow)):
            ts = []
            for rep in range(args.reps):
                t0 = time.perf_counter()
                fn(tbl)
                dt = time.perf_counter() - t0
                ts.append(dt)
                print(
                    json.dumps(
                        {"bucket": b, "n": n, "variant": name,
                         "rep": rep, "sec": round(dt, 3)}
                    ),
                    flush=True,
                )
            summary.setdefault(name, []).append(min(ts))
    print(
        "MIN per bucket:",
        {k: [round(x, 3) for x in v] for k, v in summary.items()},
    )
    tot = {k: sum(v) for k, v in summary.items()}
    if not tot.get("numpy") or not tot.get("arrow"):
        raise SystemExit(f"incomplete summary {tot} — no timed buckets")
    # direction spelled out: ratio < 1 means arrow took LESS time (faster)
    r = tot["arrow"] / tot["numpy"]
    print(
        f"TOTAL min: numpy={tot['numpy']:.3f}s arrow={tot['arrow']:.3f}s "
        f"arrow_time/numpy_time={r:.2f}x "
        f"({'arrow faster' if r < 1 else 'arrow slower'})"
    )


if __name__ == "__main__":
    main()
