"""Direct-pyarrow BM25 serving: range tasks read segment files themselves.

Why this exists: the channel serving path (query/wand.py) ships every
candidate stream slice through the JVM->Python Arrow channel once per range
(pruned scan -> JVM slicing -> shuffle -> applyInPandas). The round-3
scaling pools measured query batches scaling at only ~half the build's rate
(median q-eff 0.493 vs build 0.802, BENCH/BASELINE.md), and the Arrow
channel is the one component of that path measured NOT to parallelize with
cores in this environment — the same ceiling that drove the build's direct
engine (index/p1_direct.py docstring). This module removes the channel from
serving the same way the build did:

  driver plans R docID ranges (ranges partition the doc space, so per-range
  top-k lists merge exactly) -> one Spark task per range reads the
  CANDIDATE segment rows itself with pyarrow (bucket-pruned file list from
  the Searcher's cached listing + parquet row-group predicate pushdown on
  term_h), slices each row's streams to its range via the per-block byte
  offsets (the per-block absolute delta reset makes any block-aligned slice
  independently decodable), and scores the whole query batch with the SAME
  kernels as the channel scorer (query/wand._build_struct /
  _score_query_set — bit-identity asserted in tests/test_searcher.py).
  Only per-range top-k rows (<= R*Q*k) ever cross the Python<->JVM
  boundary; the driver merges them exactly and builds the result DataFrame
  locally — no shuffle, no window job, no stream bytes on the channel.

Scale notes (the 100 TB story):
- each range task re-reads the candidate rows (R-fold read amplification of
  candidate bytes). Reads are bucket-pruned, term-filtered, page-cached
  parquet, so the amplified cost is snappy decode — CPU that scales with
  cores, unlike the channel transfer it replaces. At object-store scale the
  knob is the range count (query/wand.RANGE_TARGET_POSTINGS): fewer,
  bigger ranges trade task memory for read amplification.
- phrase verification decodes positions per candidate BLOCK only (format v5
  block_pos_off), so a hot term's position stream is never decoded whole.
- the channel path remains the automatic fallback (FS schemes pyarrow can't
  reach) and the A/B control (QKB_SERVE_CHANNEL=1).

Reference parity: this serves the same capability as the reference's
ChromaDB top-k query (examples/chromadb_integration.ipynb cell 8); phrase
mode is the exact-match retrieval companion the reference demonstrates
beside ANN in the same notebook.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from quickb_spark.index.encode import decode_posting_list, varbyte_decode

__all__ = ["serve_topk_direct", "list_segment_files"]

#: Segment-row columns every serving read needs; position columns join in
#: phrase mode only.
_BASE_COLS = [
    "term_h", "df_part", "doc_stream", "tf_stream", "dl_stream",
    "block_last_doc", "block_doc_off", "block_tf_off", "block_dl_off",
]
_POS_COLS = ["pos_stream", "block_pos_off"]


def list_segment_files(index_dir: str, buckets: list[int]) -> list[str]:
    """Candidate segment file paths for the given buckets (pyarrow FS)."""
    from quickb_spark.index.p2_direct import list_bucket_files

    return [p for _, p, _ in list_bucket_files(f"{index_dir}/segments", buckets)]


def _slice_row(row, lo, hi, block_size, want_pos):
    """One segment-row dict -> range-trimmed part, or None when the row has
    no postings in [lo, hi].

    Mirrors the JVM slicing expressions in wand._slice_to_ranges exactly:
    b_lo = #blocks entirely below lo, b_hi = min(nb, #blocks starting <= hi
    + 1); the decoded slice is then trimmed to [lo, hi] so every doc is
    scored in exactly one range. Returns (docs, tfs, dls, pos_part) with
    pos_part None unless want_pos."""
    bld = np.asarray(row["block_last_doc"], dtype=np.int64)
    nb = len(bld)
    b_lo = int(np.searchsorted(bld, lo, "left"))
    b_hi = min(nb, int(np.searchsorted(bld, hi, "right")) + 1)
    if b_lo >= b_hi:
        return None
    df_part = int(row["df_part"])

    def _sub(stream: bytes, off_key: str) -> bytes:
        off = row[off_key]
        start = int(off[b_lo])
        end = int(off[b_hi]) if b_hi < nb else len(stream)
        return stream[start:end]

    n_sub = min(df_part, b_hi * block_size) - b_lo * block_size
    d, t, dl = decode_posting_list(
        _sub(row["doc_stream"], "block_doc_off"),
        _sub(row["tf_stream"], "block_tf_off"),
        n_sub,
        _sub(row["dl_stream"], "block_dl_off"),
        block_size=block_size,
    )
    a = int(np.searchsorted(d, lo, "left"))
    z = int(np.searchsorted(d, hi, "right"))
    pos_part = None
    if want_pos:
        pboff = np.asarray(row["block_pos_off"], dtype=np.int64)
        pos_part = {
            "tfs_slice": t,  # pre-trim slice tfs (position counts per posting)
            "trim_a": a,
            "n_sub": n_sub,
            "pos_bytes": _sub(row["pos_stream"], "block_pos_off"),
            "pboff": pboff[b_lo:b_hi] - int(pboff[b_lo]) if nb else pboff,
        }
    if a or z < len(d):
        d, t, dl = d[a:z], t[a:z], dl[a:z]
    if not len(d):
        return None
    return d, t, dl, pos_part


def _positions_of(struct, merged_idx, block_size):
    """Token positions of one merged-struct posting, decoding only its
    containing BLOCK of the position stream (format v5 block_pos_off).
    Positions are absolute, strictly increasing (per-posting delta decode)."""
    flat = int(struct["perm"][merged_idx])
    part_starts = struct["part_starts"]
    part_i = int(np.searchsorted(part_starts, flat, "right")) - 1
    local = flat - int(part_starts[part_i])
    p = struct["pos_parts"][part_i]
    sidx = p["trim_a"] + local
    blk = sidx // block_size
    cache = struct.setdefault("pos_cache", {})
    key = (part_i, blk)
    hit = cache.get(key)
    if hit is None:
        btfs = p["tfs_slice"][blk * block_size: min((blk + 1) * block_size,
                                                    p["n_sub"])]
        csum = np.zeros(len(btfs) + 1, dtype=np.int64)
        np.cumsum(btfs, out=csum[1:])
        start = int(p["pboff"][blk])
        end = (
            int(p["pboff"][blk + 1])
            if blk + 1 < len(p["pboff"])
            else len(p["pos_bytes"])
        )
        vals = varbyte_decode(
            p["pos_bytes"][start:end], int(csum[-1])
        ).view(np.int64)
        hit = cache[key] = (vals, csum)
    vals, csum = hit
    r = sidx - blk * block_size
    seg = vals[int(csum[r]): int(csum[r + 1])]
    return np.cumsum(seg)


def _phrase_topk(structs, seq, k, block_size):
    """Exact-phrase top-k within one range: docs containing the query's
    terms CONSECUTIVELY (token positions p, p+1, ... across the sequence),
    scored with the same BM25 sum as non-phrase queries, ranked
    (score desc, doc asc). Candidate docs come from posting-list
    intersection; only candidates' blocks get position-decoded."""
    uniq = list(dict.fromkeys(seq))
    if not uniq or any(t not in structs for t in uniq):
        return [], []
    base = min(uniq, key=lambda t: len(structs[t]["docs"]))
    cand = structs[base]["docs"]
    for t in uniq:
        d = structs[t]["docs"]
        if not len(d):
            return [], []
        pos = np.minimum(np.searchsorted(d, cand), len(d) - 1)
        cand = cand[d[pos] == cand]
        if not len(cand):
            return [], []
    idx_of = {t: np.searchsorted(structs[t]["docs"], cand) for t in uniq}
    verified = []
    for i in range(len(cand)):
        p = _positions_of(structs[seq[0]], int(idx_of[seq[0]][i]), block_size)
        ok = True
        for t in seq[1:]:
            nxt = _positions_of(structs[t], int(idx_of[t][i]), block_size)
            p = np.intersect1d(p + 1, nxt, assume_unique=True)
            if not len(p):
                ok = False
                break
        if ok:
            verified.append(i)
    if not verified:
        return [], []
    vi = np.asarray(verified, dtype=np.int64)
    docs_v = cand[vi]
    score = np.zeros(len(vi))
    for t in uniq:  # insertion order == channel concat order (fp-identical)
        score += structs[t]["scores"][idx_of[t][vi]]
    order = np.lexsort((docs_v, -score))[:k]
    return docs_v[order].tolist(), score[order].tolist()


def _serve_range_task(payload):
    """One range's serving work: read candidate rows, slice, build structs
    with the SHARED kernels, score the batch (or phrase-verify), return
    top-k tuples. Pure pyarrow/NumPy — nothing but these rows crosses the
    Python<->JVM boundary."""
    import pyarrow.parquet as pq

    (range_id, lo, hi, files, th_list, dfs, n_docs, avgdl, block_size,
     terms_by_query, k, strategy, k1, b, phrase_seqs) = payload
    import pyarrow as pa

    from quickb_spark.query.wand import (
        _build_struct,
        _idf_of,
        _score_query_set,
    )

    pa.set_cpu_count(1)  # one core slot per task (see p1_direct._p1_task)
    want_pos = phrase_seqs is not None
    cols = _BASE_COLS + (_POS_COLS if want_pos else [])
    th_set = list(map(int, th_list))
    parts: dict[int, list] = defaultdict(list)
    pos_parts: dict[int, list] = defaultdict(list)
    for path in files:
        tbl = pq.read_table(
            path, columns=cols, filters=[("term_h", "in", th_set)]
        )
        for row in tbl.to_pylist():
            sl = _slice_row(row, lo, hi, block_size, want_pos)
            if sl is None:
                continue
            d, t, dl, pp = sl
            parts[int(row["term_h"])].append((d, t, dl))
            if want_pos:
                pos_parts[int(row["term_h"])].append(pp)
    structs = {}
    for term in sorted(parts):
        s = _build_struct(
            parts[term], _idf_of(term, dfs, n_docs), k1, b, avgdl
        )
        if want_pos:
            lens = np.array([len(p[0]) for p in parts[term]], dtype=np.int64)
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            s["part_starts"] = starts
            s["pos_parts"] = pos_parts[term]
        structs[term] = s
    if want_pos:
        out = []
        for qid in sorted(phrase_seqs):
            doc_ids, scores = _phrase_topk(
                structs, phrase_seqs[qid], k, block_size
            )
            out.extend(
                (qid, int(d), float(s)) for d, s in zip(doc_ids, scores)
            )
        return out
    out_q, out_d, out_s, _ = _score_query_set(
        structs, terms_by_query, k, strategy, k1, b, avgdl, emit_rank=False
    )
    return list(zip(out_q, (int(d) for d in out_d), map(float, out_s)))


def serve_topk_direct(
    spark,
    files: list[str],
    qt_pairs_h: list[tuple[str, int]],
    dfs_h: dict[int, int],
    stats: dict,
    k: int,
    k1: float,
    b: float,
    strategy: str,
    r_count: int,
    phrase_seqs: dict[str, list[int]] | None = None,
):
    """(query_id, rank, doc_id, score) DataFrame via direct range tasks.

    `files`: candidate segment files (bucket-pruned, from the Searcher's
    cached listing). `phrase_seqs`: qid -> ordered term_h sequence turns
    the batch into exact-phrase retrieval (same BM25 scores, result set
    restricted to docs containing the phrase)."""
    from quickb_spark.query.wand import _range_bounds

    terms_by_query: dict[str, list[int]] = {}
    for qid, t in qt_pairs_h:
        terms_by_query.setdefault(qid, []).append(t)
    block_size = int(stats.get("block_size", 128))
    payloads = [
        (r, lo, hi, files, sorted(dfs_h), dfs_h, stats["n_docs"],
         stats["avgdl"], block_size, terms_by_query, k, strategy, k1, b,
         phrase_seqs)
        for r, lo, hi in _range_bounds(r_count)
    ]
    sc = spark.sparkContext
    chunks = sc.parallelize(payloads, len(payloads)).map(
        _serve_range_task
    ).collect()
    # exact driver-side merge: ranges partition the doc space, so each doc
    # appears in exactly one range's partial top-k; per query keep the k
    # best by (score desc, doc asc) and rank them
    per_q: dict[str, list[tuple[float, int]]] = defaultdict(list)
    for chunk in chunks:
        for qid, doc, score in chunk:
            per_q[qid].append((score, doc))
    rows = []
    for qid in sorted(per_q):
        cands = sorted(per_q[qid], key=lambda t: (-t[0], t[1]))[:k]
        rows.extend(
            (qid, rank, doc, score)
            for rank, (score, doc) in enumerate(cands, start=1)
        )
    return spark.createDataFrame(
        rows, "query_id string, rank int, doc_id long, score double"
    )
