"""Phase-2 segment encode as file-granular Python tasks (direct pyarrow IO).

Why this exists: the v3 checkpoint is already salted, grouped and sorted, so
phase 2 is embarrassingly parallel per checkpoint FILE. Routing those ~56M
per-posting rows through Spark's Python-UDF Arrow channel (scan -> JVM
ArrowWriter -> socket -> worker) was measured to cost ~20-30s per million
documents in THIS sandbox *regardless of core count* — the channel, not the
encode kernel, was the scaling ceiling of the whole build (bench notes in
BENCH/BASELINE.md). A pure-JVM scan of the same files takes ~2s and the
pure-Python encode scales like the multiprocessing hardware control, so the
fix is to keep both sides and drop the hop in between:

  driver lists checkpoint files -> one Spark TASK per file (biggest first)
  -> each task opens ITS file with pyarrow (native columnar decode; term
  identity is the v4 int64 `term_h`, so no per-posting strings exist at
  all), slices posting-list groups as zero-copy NumPy views, runs the varbyte
  encoder, and writes the segment parquet for that file directly — only a
  one-row summary ever crosses the Python<->JVM boundary.

Two consumption modes over two checkpoint layouts:

- `encode_wave_direct` (complete-group layout, written by the channel
  phase 1's repartition+sort): one task per checkpoint file; every
  (term_h, salt) group lives entirely inside one file, so tasks are
  independent by construction.
- `merge_encode_buckets` (sorted-runs layout, written by the direct
  phase 1 — index/p1_direct.py): one task per BUCKET; the task k-way
  merges its bucket's per-task sorted runs (each run is already sorted by
  (term_h, salt, doc_id), so the merge is one stable lexsort over the
  concatenated columns plus a vectorized byte-slice gather), feeds the
  same encode core, and writes BOTH the bucket's segment file and its
  (term_h, df) lexicon rows — no postings shuffle and no per-wave Spark
  lexicon job exist in this mode at all. This is the north star's layout:
  per-partition sorted posting lists, k-way merged and compressed.

Scale notes (the 100 TB story):
- work units are whole checkpoint files / buckets (64-128MB on a real
  cluster, a few MB here), so tasks stay uniform and biggest-first ordering
  kills end-of-wave stragglers;
- a merge task holds one bucket's postings in memory (columnar numpy, ~30
  bytes/posting); `IndexConfig.term_buckets` is the knob that keeps a
  bucket at ~1-4 GB on a real corpus — the same dial as Spark's shuffle
  partition count. A larger-than-memory bucket would stream row-group
  k-way merges instead; not needed at this corpus scale;
- storage goes through `pyarrow.fs.FileSystem.from_uri`, so file:// and
  s3:// checkpoints work the same way (object stores are the realistic home
  of a 10^12-file index; there is no data-locality to lose). Schemes
  pyarrow cannot open locally (e.g. hdfs:// without libhdfs) raise at
  listing time and `build_index` falls back to the in-channel encoder;
- idempotency: output file names are a pure function of input file names
  (merge mode: of the bucket id), and `build_index` deletes the segment +
  lexicon dirs of UNCOMMITTED buckets before each wave, so task retries and
  crash-resume both converge to the same layout (the commit ledger stays
  the commit marker).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "encode_wave_direct",
    "merge_encode_buckets",
    "list_bucket_files",
    "pyarrow_fs_for",
    "gather_slices",
    "binary_array",
    "SUMMARY_SCHEMA",
]

#: One row per encoded checkpoint file — the only data that crosses the
#: Python->JVM boundary in the direct phase-2 path.
SUMMARY_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("src_file", StringType()),
        StructField("n_groups", LongType()),
        StructField("n_postings", LongType()),
        StructField("max_salt", IntegerType()),
        StructField("out_bytes", LongType()),
    ]
)

_CHECKPOINT_COLS = ["term_h", "salt", "doc_id", "tf", "doc_len", "pos_vb"]

#: Shed sorted-runs layout (p1_dl_in_runs=False): doc_len is NOT carried
#: per posting — the merge re-attaches it from the doc-stats runs (see
#: _doc_len_lookup). NOT the default: the re-attach is a per-posting
#: binary search over the corpus doc-stats table, and at 4M docs (lookup
#: > LLC) it measured phase 2 at 148-150s vs 79-94s with dl in the runs
#: (32 cores, bench/p2_dl_ab_4m.py) — random DRAM probes on the
#: DRAM-bound phase cost far more than 8 sequential bytes/posting.
_RUN_COLS = ["term_h", "salt", "doc_id", "tf", "pos_vb"]

#: Conservative decoded-working-set multiplier over a bucket's on-disk run
#: bytes (snappy parquet -> numpy columns + sort/gather scratch). Used by
#: the merge memory guard to size term-granular splits.
_RUN_MEM_EXPANSION = 3

#: Per-worker-process cache of the corpus doc-length lookup (sorted ids +
#: aligned lengths). One entry per doc-stats dir, validated against the
#: dir's file listing so a rebuild into the same path invalidates it.
_DS_CACHE: dict[str, tuple] = {}


def _doc_len_lookup(ds_dir: str):
    """-> (doc_ids int64 sorted asc, doc_len int64 aligned) for the corpus.

    Loaded once per worker process and shared by every merge task it runs
    (Spark reuses Python workers). Memory is 16 bytes/doc — ~64 MB at 4M
    docs. This trade only wins while the doc-stats table fits comfortably
    in task memory; merge_encode_buckets enforces that bound driver-side
    and prescribes dl-carrying runs past it (see its docstring)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    if not ds_dir:
        raise ValueError(
            "runs checkpoint carries no doc_len column and no doc-stats "
            "dir was provided — pass ds_dir= to merge_encode_buckets"
        )
    fsys, root = pyarrow_fs_for(ds_dir)
    files = tuple(
        sorted(
            (i.path, int(i.size or 0), i.mtime_ns or 0)
            for i in fsys.get_file_info(pafs.FileSelector(root, recursive=True))
            if i.type == pafs.FileType.File and i.base_name.endswith(".parquet")
        )
    )
    hit = _DS_CACHE.get(ds_dir)
    if hit is not None and hit[0] == files:
        return hit[1], hit[2]
    tbls = []
    for p, _, _ in files:
        with fsys.open_input_file(p) as f:
            tbls.append(pq.read_table(f, columns=["doc_id", "doc_len"]))
    tbl = pa.concat_tables(tbls) if len(tbls) != 1 else tbls[0]
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    dls = tbl.column("doc_len").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids = np.ascontiguousarray(ids[order])
    dls = np.ascontiguousarray(dls[order])
    _DS_CACHE[ds_dir] = (files, ids, dls)
    return ids, dls


def pyarrow_fs_for(uri: str):
    """-> (pyarrow FileSystem, path-without-scheme) for a path or URI.

    Accepts plain paths, file:/p, file:///p, s3://..., hdfs://... — the
    Hadoop-FS side (quickb_spark.fs.IndexFS) and this must agree on what a
    path means; both treat scheme-less as the local filesystem."""
    from pyarrow import fs as pafs

    if "://" not in uri and not uri.startswith("file:"):
        return pafs.LocalFileSystem(), uri
    if uri.startswith("file:"):
        # normalize file:/p and file:///p to a local path
        path = uri[len("file:") :]
        while path.startswith("//"):
            path = path[1:]
        return pafs.LocalFileSystem(), path
    fsys, path = pafs.FileSystem.from_uri(uri)
    return fsys, path


def list_bucket_files(flat_dir: str, buckets: list[int]) -> list[tuple[int, str, int]]:
    """[(bucket, file-path, bytes)] for the given buckets' checkpoint dirs,
    listed with pyarrow (same FS the encode tasks will read through)."""
    from pyarrow import fs as pafs

    fsys, root = pyarrow_fs_for(flat_dir)
    out: list[tuple[int, str, int]] = []
    for b in buckets:
        sel = pafs.FileSelector(
            f"{root.rstrip('/')}/bucket={b}", recursive=True, allow_not_found=True
        )
        for info in fsys.get_file_info(sel):
            if info.type == pafs.FileType.File and info.base_name.endswith(
                ".parquet"
            ):
                out.append((b, info.path, int(info.size or 0)))
    return out


def gather_slices(src, off: np.ndarray, order: np.ndarray):
    """Reorder variable-length byte slices: -> (values bytes, offsets
    int64[n+1]) in `order`. Fully vectorized (one fancy-index gather)."""
    lens = (off[1:] - off[:-1])[order]
    out_off = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    if total == 0:
        return b"", out_off
    src_arr = np.frombuffer(src, dtype=np.uint8)
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_off[:-1], lens)
        + np.repeat(off[:-1][order], lens)
    )
    return src_arr[idx].tobytes(), out_off


def binary_array(values, off: np.ndarray):
    """Zero-copy pyarrow binary array over a shared (values, offsets) pair;
    falls back to large_binary when the byte total exceeds int32."""
    import pyarrow as pa

    n = len(off) - 1
    if off[-1] <= np.iinfo(np.int32).max:
        return pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(off.astype(np.int32).tobytes()),
             pa.py_buffer(values)],
        )
    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(off.astype(np.int64).tobytes()),
         pa.py_buffer(values)],
    )


def _pos_arrays(tbl, n: int):
    """Extract (pos_off int64[n+1] zero-based, pos bytes) from a checkpoint
    table's pos_vb column, zero-copy via the Arrow offsets buffer."""
    import pyarrow as pa

    pos_col = tbl.column("pos_vb").combine_chunks().cast(pa.large_binary())
    if pos_col.offset != 0:  # defensive: realign a sliced array
        pos_col = pa.concat_arrays([pos_col])
    pos_off = np.frombuffer(pos_col.buffers()[1], dtype=np.int64)[: n + 1]
    pos_buf = pos_col.buffers()[2]
    pos_bytes = memoryview(pos_buf)[: pos_off[-1]] if n else memoryview(b"")
    return pos_off, pos_bytes


def encode_sorted_groups(
    idx: np.ndarray,
    salt: np.ndarray,
    doc_id: np.ndarray,
    tf: np.ndarray,
    doc_len: np.ndarray,
    pos_off,
    pos_bytes,
    block_size: int,
    store_positions: bool,
    src_label: str,
):
    """The vectorized whole-input encode core: postings sorted by
    (term_h, salt, doc_id) -> (segment pyarrow Table, n_groups, max_salt).

    The input holds ~1e3-1e5 posting-list groups of ~1e2 postings each;
    calling the per-group encoder (index/encode.py) costs ~0.7ms of NumPy
    fixed overhead PER GROUP — more than the actual byte work. Instead,
    every stream is encoded in ONE pass over the whole input (absolute-gap
    resets at block starts make groups independent by construction) and
    per-group slices are materialized as zero-copy Arrow binary arrays
    over the shared buffer. Byte-identical to encode_posting_list
    (asserted in tests/test_p2_direct.py).

    `pos_off` must be zero-based int64[n+1]; `pos_bytes` the matching
    contiguous byte region (ignored unless store_positions)."""
    import pyarrow as pa

    from quickb_spark.index.encode import to_u64, varbyte_encode, varbyte_lengths

    n = len(idx)
    if n:
        change = np.flatnonzero((idx[1:] != idx[:-1]) | (salt[1:] != salt[:-1])) + 1
        starts = np.concatenate(([0], change)).astype(np.int64)
        ends = np.concatenate((change, [n])).astype(np.int64)
    else:
        starts = ends = np.empty(0, dtype=np.int64)
    n_groups = len(starts)
    sizes = ends - starts
    pos_in_group = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    # sortedness check by COMPARISON in order-preserving u64 space —
    # np.diff on raw int64 doc_ids overflows when an adjacent gap exceeds
    # 2^63 (near-certain for df<=3 posting lists, whose two docs land
    # anywhere in the int64 range) and would flag a perfectly sorted input
    u_check = to_u64(doc_id)
    if n and not (
        (u_check[1:] > u_check[:-1]) | (pos_in_group[1:] == 0)
    ).all():
        raise ValueError(
            f"checkpoint group not strictly doc_id-sorted in {src_label} — "
            "input predates the v3 invariant or was rewritten outside "
            "build_index; rebuild the flat checkpoint"
        )

    # global block starts: every block_size-th row WITHIN its group
    bmask = (pos_in_group % block_size) == 0
    bstarts = np.flatnonzero(bmask)
    bends = np.concatenate((bstarts[1:], [n])) if n else bstarts
    nblocks = (sizes + block_size - 1) // block_size
    gb_off = np.concatenate(([0], np.cumsum(nblocks)))

    u = to_u64(doc_id)
    gaps = np.empty_like(u)
    if n:
        gaps[0] = u[0]
        np.subtract(u[1:], u[:-1], out=gaps[1:])
        gaps[bmask] = u[bmask]  # absolute reset at every block start
    tf_u = tf.astype(np.uint64)
    dl_u = doc_len.astype(np.uint64)

    def _stream(vals_u):
        """(data bytes, group offsets[n_groups+1], per-block byte offsets
        relative to each group's stream start)."""
        lens = varbyte_lengths(vals_u)
        data = varbyte_encode(vals_u, lens)
        cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=cum[1:])
        goff = cum[np.append(starts, n)]
        boff = cum[bstarts] - np.repeat(goff[:-1], nblocks)
        return data, goff, boff

    doc_data, doc_goff, doc_boff = _stream(gaps)
    tf_data, tf_goff, tf_boff = _stream(tf_u)
    dl_data, dl_goff, dl_boff = _stream(dl_u)

    def _bin(data, goff):
        arr = binary_array(data, goff)
        return arr.cast(pa.binary()) if arr.type == pa.large_binary() else arr

    def _list_array(values):
        return pa.ListArray.from_arrays(
            pa.array(gb_off, type=pa.int32()),
            pa.array(values, type=pa.int64()),
        )

    if store_positions and n:
        pos_off_a = np.asarray(pos_off, dtype=np.int64)
        pos_goff = pos_off_a[np.append(starts, n)]
        pos_arr = _bin(bytes(pos_bytes), pos_goff)
        # per-block byte offsets into pos_stream, relative to each group's
        # stream start (format v5 — block-aligned pos slices decode alone)
        pos_boff = pos_off_a[bstarts] - np.repeat(pos_goff[:-1], nblocks)
    else:
        pos_arr = _bin(b"", np.zeros(n_groups + 1, dtype=np.int64))
        pos_boff = np.zeros(int(nblocks.sum()) if n else 0, dtype=np.int64)

    out_tbl = pa.table(
        {
            "term_h": pa.array(idx[starts], type=pa.int64()),
            "salt": pa.array(salt[starts].astype(np.int32), type=pa.int32()),
            "df_part": pa.array(sizes, type=pa.int64()),
            "cf_part": pa.array(
                np.add.reduceat(tf.astype(np.int64), starts) if n
                else np.empty(0, dtype=np.int64),
                type=pa.int64(),
            ),
            "doc_stream": _bin(doc_data, doc_goff),
            "tf_stream": _bin(tf_data, tf_goff),
            "dl_stream": _bin(dl_data, dl_goff),
            "pos_stream": pos_arr,
            "block_last_doc": _list_array(
                doc_id[bends - 1] if n else np.empty(0, dtype=np.int64)
            ),
            "block_max_tf": _list_array(
                np.maximum.reduceat(tf.astype(np.int64), bstarts) if n
                else np.empty(0, dtype=np.int64)
            ),
            "block_min_dl": _list_array(
                np.minimum.reduceat(doc_len.astype(np.int64), bstarts) if n
                else np.empty(0, dtype=np.int64)
            ),
            "block_doc_off": _list_array(doc_boff),
            "block_tf_off": _list_array(tf_boff),
            "block_dl_off": _list_array(dl_boff),
            "block_pos_off": _list_array(pos_boff),
        }
    )
    max_salt = int(salt.max()) if n else 0
    return out_tbl, n_groups, max_salt


def _encode_one_file(
    fsys, ofs, src_path: str, bucket: int, seg_root: str, block_size: int,
    store_positions: bool,
) -> dict:
    """Read one sorted checkpoint file, encode every (term_h, salt) group,
    write the segment parquet next to its siblings. Pure pyarrow/NumPy."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pa.set_cpu_count(1)  # one core slot per task (see p1_direct._p1_task)

    cols = _CHECKPOINT_COLS if store_positions else _CHECKPOINT_COLS[:-1]
    with fsys.open_input_file(src_path) as f:
        tbl = pq.read_table(f, columns=cols)

    n = tbl.num_rows
    # v4 checkpoint: term identity is already an int64 hash — group-change
    # detection runs straight on the numpy view, no dictionary decode
    idx = tbl.column("term_h").to_numpy(zero_copy_only=False)
    salt = tbl.column("salt").to_numpy(zero_copy_only=False)
    doc_id = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    tf = tbl.column("tf").to_numpy(zero_copy_only=False)
    doc_len = tbl.column("doc_len").to_numpy(zero_copy_only=False)
    if store_positions:
        # zero-copy slicing of the flat values buffer via the offsets buffer:
        # rows are doc_id-sorted within each group (v3 checkpoint invariant),
        # so a group's pos stream is ONE contiguous slice.
        pos_off, pos_bytes = _pos_arrays(tbl, n)
    else:
        pos_off, pos_bytes = np.zeros(n + 1, dtype=np.int64), b""

    out_tbl, n_groups, max_salt = encode_sorted_groups(
        idx, salt, doc_id, tf, doc_len, pos_off, pos_bytes,
        block_size, store_positions, src_path,
    )
    base = os.path.basename(src_path)
    dest_dir = f"{seg_root.rstrip('/')}/bucket={bucket}"
    ofs.create_dir(dest_dir, recursive=True)
    dest = f"{dest_dir}/{base}"
    with ofs.open_output_stream(dest) as out:
        pq.write_table(out_tbl, out, compression="snappy")
    sz = ofs.get_file_info(dest).size or 0
    return {
        "bucket": bucket,
        "src_file": base,
        "n_groups": int(n_groups),
        "n_postings": int(n),
        "max_salt": max_salt,
        "out_bytes": int(sz),
    }


def _encode_files_udf(flat_dir: str, seg_dir: str, block_size: int,
                      store_positions: bool):
    def run(batches):
        fsys = ofs = seg_root = None
        for pdf in batches:
            for bucket, path in zip(pdf["bucket"], pdf["path"]):
                if fsys is None:
                    fsys, _ = pyarrow_fs_for(flat_dir)
                    ofs, seg_root = pyarrow_fs_for(seg_dir)
                yield pd.DataFrame(
                    [
                        _encode_one_file(
                            fsys, ofs, path, int(bucket), seg_root,
                            block_size, store_positions,
                        )
                    ]
                )

    return run


def encode_wave_direct(
    spark: SparkSession,
    flat_dir: str,
    seg_dir: str,
    buckets: list[int],
    block_size: int,
    store_positions: bool,
) -> list:
    """Encode the given buckets' checkpoint files, one Spark task per file,
    biggest files first (no end-of-wave straggler). Returns the collected
    per-file summary rows. Raises if the checkpoint FS scheme is unusable
    from Python (caller falls back to the in-channel encoder)."""
    files = list_bucket_files(flat_dir, buckets)
    if not files:
        return []
    files.sort(key=lambda t: -t[2])
    rows = [(b, p) for b, p, _ in files]
    rdd = spark.sparkContext.parallelize(rows, numSlices=len(rows))
    df: DataFrame = spark.createDataFrame(rdd, "bucket int, path string")
    out = df.mapInPandas(
        _encode_files_udf(flat_dir, seg_dir, block_size, store_positions),
        SUMMARY_SCHEMA,
    )
    return out.collect()


def _merge_one_bucket(
    bucket: int,
    run_paths: list[str],
    flat_dir: str,
    seg_dir: str,
    lex_dir: str,
    block_size: int,
    store_positions: bool,
    nsplits: int = 1,
    split_id: int = 0,
    ds_dir: str | None = None,
) -> dict:
    """k-way merge one bucket's sorted runs -> one segment file + its
    lexicon rows. Each run is sorted by (term_h, salt, doc_id) and the keys
    are disjoint-by-doc across runs, so the global order is one stable
    lexsort of the concatenated columns; position slices follow with one
    vectorized byte gather.

    When nsplits > 1, this task handles only the TERMS with
    pmod(xxhash64(term_h), nsplits) == split_id: term-hash bucketing is
    Zipf-skewed (one popular term's postings all share a bucket), so big
    buckets would otherwise become the wave's straggler. The split filter
    is applied to each run AS IT IS READ, so a split task's resident
    working set is ~1/nsplits of the bucket (plus one run's transient) —
    this is what makes nsplits a real MEMORY bound, not just a
    work-balance knob (merge_encode_buckets sizes it from both). Every
    (term, salt) group stays whole, each term's lexicon row is written
    exactly once, and the extra cost is only re-reading the bucket's runs
    per split. At a larger scale the next step down is (term, salt)-
    granular splitting with a df-summing lexicon read; not needed at this
    corpus size.

    doc_len: runs carry it per posting by default (p1_dl_in_runs; the
    round-5 A/B showed the shed layout's per-posting doc-stats searchsorted
    nearly doubling this phase at 4M docs — bench/p2_dl_ab_4m.py). Shed
    runs (no doc_len column) are still consumed: the merge re-attaches
    from the per-worker-cached doc-stats lookup."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quickb_spark.index.xxh import hash_long_array

    pa.set_cpu_count(1)  # one core slot per task (see p1_direct._p1_task)
    fsys, _ = pyarrow_fs_for(flat_dir)
    ofs, seg_root = pyarrow_fs_for(seg_dir)
    _, lex_root = pyarrow_fs_for(lex_dir)

    with fsys.open_input_file(run_paths[0]) as f:
        run_fields = set(pq.ParquetFile(f).schema_arrow.names)
    dl_in_runs = "doc_len" in run_fields
    cols = list(_CHECKPOINT_COLS if dl_in_runs else _RUN_COLS)
    if not store_positions:
        cols.remove("pos_vb")
    tbls = []
    for p in run_paths:
        with fsys.open_input_file(p) as f:
            t = pq.read_table(f, columns=cols)
        if nsplits > 1 and t.num_rows:
            th_run = t.column("term_h").to_numpy(zero_copy_only=False)
            mask = hash_long_array(th_run) % np.int64(nsplits) == split_id
            if not mask.all():
                t = t.filter(pa.array(mask))
        tbls.append(t)
    tbl = pa.concat_tables(tbls) if len(tbls) > 1 else tbls[0]
    del tbls
    n = tbl.num_rows
    idx = tbl.column("term_h").to_numpy(zero_copy_only=False)
    salt = tbl.column("salt").to_numpy(zero_copy_only=False)
    doc_id = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    tf = tbl.column("tf").to_numpy(zero_copy_only=False)

    # merge: signed-int64 lexsort matches both the runs' in-task sort and
    # the JVM channel path's sortWithinPartitions order
    order = np.lexsort((doc_id, salt, idx))
    idx_s = idx[order]
    salt_s = salt[order]
    doc_s = doc_id[order]
    tf_s = tf[order]
    if dl_in_runs:
        dl_s = tbl.column("doc_len").to_numpy(zero_copy_only=False)[order]
    elif n:
        ds_ids, ds_dls = _doc_len_lookup(ds_dir)
        pos = np.minimum(
            np.searchsorted(ds_ids, doc_s), max(len(ds_ids) - 1, 0)
        )
        if not len(ds_ids) or not (ds_ids[pos] == doc_s).all():
            raise ValueError(
                f"bucket={bucket}: posting doc_ids missing from doc-stats "
                f"runs at {ds_dir} — checkpoint and doc_stats are out of "
                "sync; rebuild the flat checkpoint"
            )
        dl_s = ds_dls[pos]
    else:
        dl_s = np.empty(0, dtype=np.int64)
    if store_positions:
        # byte-slice reorder via Arrow's C++ take — ~4x less memory traffic
        # than a per-byte numpy index gather (A/B'd; byte-identical)
        taken = (
            tbl.column("pos_vb")
            .combine_chunks()
            .take(pa.array(order))
            .cast(pa.large_binary())
        )
        pos_off_s = np.frombuffer(taken.buffers()[1], dtype=np.int64)[
            : len(order) + 1
        ]
        pos_vals = (
            memoryview(taken.buffers()[2])[: pos_off_s[-1]]
            if len(order)
            else b""
        )
    else:
        pos_vals, pos_off_s = b"", np.zeros(len(order) + 1, dtype=np.int64)
    del tbl

    out_tbl, n_groups, max_salt = encode_sorted_groups(
        idx_s, salt_s, doc_s, tf_s, dl_s, pos_off_s, pos_vals,
        block_size, store_positions, f"bucket={bucket} runs",
    )

    dest_dir = f"{seg_root.rstrip('/')}/bucket={bucket}"
    ofs.create_dir(dest_dir, recursive=True)
    dest = f"{dest_dir}/part-m{split_id:04d}.parquet"
    with ofs.open_output_stream(dest) as out:
        pq.write_table(out_tbl, out, compression="snappy")
    sz = ofs.get_file_info(dest).size or 0

    # in-task lexicon: groups are term-sorted, so per-term df is one reduceat
    g_term = out_tbl.column("term_h").to_numpy(zero_copy_only=False)
    g_df = out_tbl.column("df_part").to_numpy(zero_copy_only=False)
    if n_groups:
        tchange = np.flatnonzero(g_term[1:] != g_term[:-1]) + 1
        tstarts = np.concatenate(([0], tchange)).astype(np.int64)
        lex_term = g_term[tstarts]
        lex_df = np.add.reduceat(g_df, tstarts)
    else:
        lex_term = lex_df = np.empty(0, dtype=np.int64)
    lex_dest_dir = f"{lex_root.rstrip('/')}/bucket={bucket}"
    ofs.create_dir(lex_dest_dir, recursive=True)
    with ofs.open_output_stream(
        f"{lex_dest_dir}/part-m{split_id:04d}.parquet"
    ) as out:
        pq.write_table(
            pa.table(
                {
                    "term_h": pa.array(lex_term, type=pa.int64()),
                    "df": pa.array(lex_df, type=pa.int64()),
                }
            ),
            out,
            compression="snappy",
        )

    return {
        "bucket": bucket,
        "src_file": f"{len(run_paths)} runs (split {split_id}/{nsplits})",
        "n_groups": int(n_groups),
        "n_terms": int(len(lex_term)),
        "n_postings": int(len(order)),
        "max_salt": max_salt,
        "out_bytes": int(sz),
    }


#: Hard ceiling on term-granular splits per bucket: beyond this, re-reading
#: the bucket's runs per split dominates — the right fix is more
#: term_buckets, and the memory guard below says so explicitly.
_MAX_BUCKET_SPLITS = 256


def merge_encode_buckets(
    spark: SparkSession,
    flat_dir: str,
    seg_dir: str,
    lex_dir: str,
    buckets: list[int],
    block_size: int,
    store_positions: bool,
    target_bytes: int | None = None,
    ds_dir: str | None = None,
    task_mem_bytes: int | None = None,
) -> list[dict]:
    """Merge-encode the given buckets' sorted-runs checkpoint, biggest work
    first. A bucket is split into term-granular sub-tasks when its runs
    exceed ~1/256 of the wave's bytes (Zipf skew makes the hottest
    bucket several times the median — unsplit it IS the wave's makespan)
    OR when its estimated decoded working set (run bytes x
    {_RUN_MEM_EXPANSION}) exceeds `task_mem_bytes` — the MEMORY GUARD: a
    mis-set term_buckets at a bigger corpus must degrade into more, smaller
    splits (each split filters its terms per run at read time, bounding
    residency to ~bucket/nsplits), not OOM a wave. Past
    {_MAX_BUCKET_SPLITS} splits it fails fast with the term_buckets
    prescription instead of thrashing re-reads. Writes segments AND the
    per-bucket lexicon in-task; returns per-BUCKET summary dicts (sub-task
    summaries pre-aggregated here) — the caller commits them without
    running any further Spark job.

    `ds_dir` (the doc-stats runs) is required for checkpoints whose runs
    do not carry doc_len (the current layout). The driver also verifies
    the doc-stats lookup itself fits the task budget: its residency is
    16 bytes/doc, the knob past that scale is carrying dl in the runs."""
    files = list_bucket_files(flat_dir, buckets)
    by_bucket: dict[int, list[tuple[str, int]]] = {}
    for b, p, sz in files:
        by_bucket.setdefault(b, []).append((p, sz))
    if not by_bucket:
        return []
    total = sum(sz for _, p in by_bucket.items() for _, sz in p)
    # Work-balance split target is CLUSTER-SIZE-INDEPENDENT (same principle
    # as IndexConfig.p1_task_bytes): ~one unit per median bucket, so only
    # Zipf-hot buckets (several x the median) split, in proportion to their
    # size — exactly the straggler bound splitting exists for. The part
    # that matters for comparability: the SEGMENT FILE LAYOUT is now
    # identical at every cluster size (the previous total/(4*cores) target
    # tied the split count, the split re-read amplification, and the
    # serving-side file count to the builder's core count). More units
    # than buckets only helps while splits are cheaper than their re-read
    # cost — at real scale the unit count is driven by term_buckets, which
    # grows into the thousands long before executor counts do.
    target = target_bytes or max(32 << 20, total // max(64, len(by_bucket)))
    mem_budget = task_mem_bytes or (4 << 30)
    # the doc-stats residency bound only applies when the runs were written
    # without a doc_len column (the shed layout) — sniff one run's schema
    # (a metadata-only read) rather than guessing from config
    dl_in_runs = False
    if files:
        import pyarrow.parquet as pq

        fsys0, _ = pyarrow_fs_for(flat_dir)
        with fsys0.open_input_file(files[0][1]) as f:
            dl_in_runs = "doc_len" in pq.ParquetFile(f).schema_arrow.names
    if ds_dir is not None and not dl_in_runs:
        from pyarrow import fs as pafs

        fsys, root = pyarrow_fs_for(ds_dir)
        ds_bytes = sum(
            int(i.size or 0)
            for i in fsys.get_file_info(
                pafs.FileSelector(root, recursive=True, allow_not_found=True)
            )
            if i.type == pafs.FileType.File
        )
        if ds_bytes * 3 > mem_budget:
            raise ValueError(
                f"doc-stats lookup (~{ds_bytes * 3 >> 20} MB decoded) "
                f"exceeds the p2 task memory budget ({mem_budget >> 20} MB)"
                " — at this doc count carry doc_len in the runs instead "
                "(legacy layout) or raise IndexConfig.p2_task_mem_bytes"
            )
    work: list[tuple[int, list[str], int, int, float]] = []
    for b, paths in by_bucket.items():
        bsize = sum(s for _, s in paths)
        mem_splits = -(-(bsize * _RUN_MEM_EXPANSION) // mem_budget)
        if mem_splits > _MAX_BUCKET_SPLITS:
            raise ValueError(
                f"bucket={b}: {bsize >> 20} MB of runs needs {mem_splits} "
                f"term-splits to fit {mem_budget >> 20} MB tasks (cap "
                f"{_MAX_BUCKET_SPLITS}) — raise IndexConfig.term_buckets "
                "so buckets shrink, or raise p2_task_mem_bytes"
            )
        nsplits = int(
            max(1, min(_MAX_BUCKET_SPLITS,
                       max(round(bsize / target), mem_splits)))
        )
        for k in range(nsplits):
            work.append(
                (b, [p for p, _ in paths], nsplits, k, bsize / nsplits)
            )
    work.sort(key=lambda t: -t[4])

    def _run(item):
        b, paths, nsplits, k, _est = item
        return _merge_one_bucket(
            b, paths, flat_dir, seg_dir, lex_dir,
            block_size, store_positions, nsplits, k, ds_dir,
        )

    sc = spark.sparkContext
    parts = sc.parallelize(work, numSlices=len(work)).map(_run).collect()
    agg: dict[int, dict] = {}
    for s in parts:
        a = agg.get(s["bucket"])
        if a is None:
            agg[s["bucket"]] = dict(s)
        else:
            a["n_groups"] += s["n_groups"]
            a["n_terms"] += s["n_terms"]
            a["n_postings"] += s["n_postings"]
            a["max_salt"] = max(a["max_salt"], s["max_salt"])
            a["out_bytes"] += s["out_bytes"]
    return list(agg.values())
