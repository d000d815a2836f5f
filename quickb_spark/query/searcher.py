"""Serving-path BM25: a Searcher bound to one index, fixed costs cached.

`bm25_topk_segments` is self-contained and re-pays per call: a directory
listing for the segment scan, a Spark job to tokenize+collect query terms,
a job to sum candidate df for the auto range split, and a postings-metadata
groupBy for the global per-term df. Those fixed costs don't shrink with
more executors, which is exactly why round 2's query batches scaled
NEGATIVELY from N to 4N workers.

The Searcher removes all of them from the per-batch path:

- segment + lexicon DataFrames are created once (Spark caches the file
  listing inside the DataFrame's InMemoryFileIndex);
- queries are tokenized DRIVER-side (the engine tokenizer is a plain regex
  — quickb_spark.functions.tokenize.tokenize_py — and a query is a short
  string; no Spark job to discover the term set);
- term -> bucket pruning literals use the pure-Python xxhash64 mirror
  (functions/hashing.py, bit-identical to F.xxhash64 — tested);
- global per-term df comes from the build-time lexicon (segments.py phase
  3), read bucket-pruned only for terms not yet in the Searcher's
  process-lifetime df cache — a serving workload's repeated terms never
  touch storage twice;
- the auto range split is computed from those cached dfs.

Per batch the remaining Spark work is ONE job: pruned segment scan ⋈
broadcast local (query, term) relation → JVM range slicing → scorer →
top-k. Results are identical to bm25_topk_segments (asserted in
tests/test_searcher.py).

Staleness: the Searcher snapshots one index state. After a rebuild or a
delta fold, call `refresh()` (or construct a new Searcher) — cached file
listings and dfs would otherwise serve the old segment files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quickb_spark.config import BM25_B, BM25_K1
from quickb_spark.functions.hashing import bucket_of, xxhash64
from quickb_spark.functions.tokenize import tokenize_py
from quickb_spark.index.segments import load_stats
from quickb_spark.query.wand import _auto_ranges, _score_segments

__all__ = ["Searcher"]


class Searcher:
    """BM25 top-k serving against one built index directory."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> None:
        self.spark = spark
        self.index_dir = index_dir
        self.k1 = k1
        self.b = b
        self.refresh()

    def refresh(self) -> None:
        """Re-snapshot the index (after a rebuild/fold): stats, segment and
        lexicon file listings, and the df cache are all dropped."""
        self.stats = load_stats(self.index_dir)
        self.n_buckets = int(self.stats["term_buckets"])
        self.seg = self.spark.read.parquet(f"{self.index_dir}/segments")
        self.lex = self.spark.read.parquet(f"{self.index_dir}/lexicon")
        #: term -> global df; 0 for terms proven absent (negative caching —
        #: absent terms are the common case for open-vocabulary queries and
        #: must not re-probe storage per batch)
        self._df_cache: dict[str, int] = {}

    def _lookup_dfs(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            # v4 lexicon is keyed by term_h; hash with the bit-identical
            # driver-side mirror, then map back to the query's strings
            mh = {xxhash64(t): t for t in missing}
            buckets = sorted({bucket_of(t, self.n_buckets) for t in missing})
            rows = (
                self.lex.filter(F.col("bucket").isin(buckets))
                .filter(F.col("term_h").isin(list(mh)))
                .select("term_h", "df")
                .collect()
            )
            found = {mh[int(r["term_h"])]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return {t: self._df_cache[t] for t in terms}

    def topk(
        self,
        queries: list[tuple[str, str]] | DataFrame,
        k: int = 10,
        strategy: str = "auto",
        ranges: int | str = "auto",
    ) -> DataFrame:
        """(query_id, rank, doc_id, score); queries as (query_id, text)
        pairs (preferred for serving — driver-side tokenize, zero extra
        jobs) or a (query_id, query_text) DataFrame (collected: a query
        batch is small by definition)."""
        if isinstance(queries, DataFrame):
            queries = [
                (r["query_id"], r["query_text"]) for r in queries.collect()
            ]
        qt_pairs = sorted(
            {(qid, t) for qid, text in queries for t in tokenize_py(text or "")}
        )
        terms = sorted({t for _, t in qt_pairs})
        dfs = self._lookup_dfs(terms)
        live = [t for t in terms if dfs[t] > 0]
        if not live:
            return self.spark.createDataFrame(
                [], "query_id string, rank int, doc_id long, score double"
            )
        th = {t: xxhash64(t) for t in live}
        buckets = sorted({bucket_of(t, self.n_buckets) for t in live})
        seg = self.seg.filter(F.col("bucket").isin(buckets)).filter(
            F.col("term_h").isin(list(th.values()))
        )
        if ranges == "auto":
            r_count = _auto_ranges(
                sum(dfs[t] for t in live),
                self.spark.sparkContext.defaultParallelism,
            )
        else:
            r_count = int(ranges)
        return _score_segments(
            self.spark, seg,
            [(q, th[t]) for q, t in qt_pairs if t in th],
            {th[t]: dfs[t] for t in live}, self.stats, k, self.k1, self.b,
            strategy, r_count,
        )
