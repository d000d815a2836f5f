"""Spark surface of the chunker: one vectorized pandas UDF + explode.

The reference chunks documents in a driver-side for-loop over files
(reference src/main.py:229-247). Here the whole recursive-split call tree runs
inside a single Arrow-batched pandas UDF applied to the `content` column —
the only JVM→Python crossing on the build path — and `posexplode` turns the
per-document chunk array into chunk rows. Chunking is a pure function of
(content, lang, config), so Spark task retries and different partitionings
always reproduce identical chunks → identical docIDs → identical ranks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from quickb_spark.config import ChunkerConfig, EngineConfig
from quickb_spark.chunking.splitter import split_document

__all__ = ["chunk_array_udf", "chunk_documents"]


def chunk_array_udf(cfg: ChunkerConfig):
    """pandas UDF (content, lang) -> array<string> of chunk texts.

    The chunker config is captured in the closure and shipped once per task,
    not per row. Work inside the batch is per-element Python over Arrow
    batches — the same execution profile as pandas' own str kernels, and the
    idiomatic Spark shape for a recursive string algorithm no built-in can
    express (SURVEY.md §2.7 C1-C4).
    """

    @F.pandas_udf(ArrayType(StringType()))
    def _chunk(content: pd.Series, lang: pd.Series) -> pd.Series:
        return pd.Series(
            [
                split_document(c, l, cfg) if c is not None else []
                for c, l in zip(content, lang)
            ]
        )

    return _chunk


def chunk_id_col(chunk_idx: Column | str = "chunk_idx") -> Column:
    """Deterministic chunk-level doc_id (SURVEY.md §1.4).

    Full 64-bit xxhash of the stable chunk identity (file key + chunk index)
    — stable across retries, partitionings, and cluster sizes; never
    F.uuid() / monotonically_increasing_id() (both nondeterministic).
    Birthday bound: collision odds stay negligible below ~10^9 chunks; at
    true 10^12-file scale widen to two longs (sha2-based hi/lo) — the rest
    of the engine only ever treats doc_id as an opaque sortable key.
    """
    idx = F.col(chunk_idx) if isinstance(chunk_idx, str) else chunk_idx
    return F.xxhash64("repo", "path", "commit", idx).alias("doc_id")


def chunk_documents(docs: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """documents(repo, path, commit, lang, content) -> chunks DataFrame.

    Output schema (SURVEY.md §1.3 `chunks`):
      doc_id:long, repo, path, commit, lang, chunk_idx:int, text:string,
      chunk_sha256:string, length:int
    """
    cfg = cfg or EngineConfig()
    udf = chunk_array_udf(cfg.chunker)
    exploded = docs.select(
        "repo",
        "path",
        "commit",
        "lang",
        F.posexplode(udf(F.col("content"), F.col("lang"))).alias("chunk_idx", "text"),
    )
    return exploded.select(
        chunk_id_col(),
        "repo",
        "path",
        "commit",
        "lang",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "text",
        F.sha2(F.col("text"), 256).alias("chunk_sha256"),
        F.length("text").alias("length"),
    )
