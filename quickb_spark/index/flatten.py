"""Fused chunk+tokenize kernel: documents -> flat postings in ONE crossing.

`chunk_documents` + `term_frequencies_udf` is the modular two-step path, but
it crosses JVM<->Python twice and ships every chunk's text back to the JVM
just to send it to Python again. On the build path nothing downstream needs
the chunk text — only (chunk_idx, term, tf, positions, doc_len) — so this
fused pandas UDF runs the reference-exact splitter and the tokenizer in one
Arrow pass and never returns the text. The doc_id stays JVM-side
(xxhash64(repo, path, commit, chunk_idx)), identical to chunking/udf.py, so
both paths mint the same ids (asserted in tests/test_segments_wand.py).
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from quickb_spark.config import TOKEN_PATTERN, ChunkerConfig, EngineConfig
from quickb_spark.chunking.splitter import split_document

__all__ = ["flat_postings_from_documents"]

_TOKEN_RE = re.compile(TOKEN_PATTERN)

_FLAT_SCHEMA = ArrayType(
    StructType(
        [
            StructField("chunk_idx", IntegerType()),
            StructField("doc_len", IntegerType()),
            StructField("term", StringType()),
            StructField("tf", IntegerType()),
            StructField("positions", ArrayType(IntegerType())),
            # marks each chunk-document's first posting row, so doc-level
            # stats are a filter over the checkpoint instead of a
            # distinct-shuffle over all postings
            StructField("first", IntegerType()),
        ]
    )
)


def _fused_udf(cfg: ChunkerConfig):
    @F.pandas_udf(_FLAT_SCHEMA)
    def _flat(content: pd.Series, lang: pd.Series) -> pd.Series:
        out = []
        for c, l in zip(content, lang):
            rows: list[tuple] = []
            if c:
                for ci, text in enumerate(split_document(c, l, cfg)):
                    pos: dict[str, list[int]] = defaultdict(list)
                    toks = _TOKEN_RE.findall(text.lower())
                    for i, t in enumerate(toks):
                        pos[t].append(i)
                    dl = len(toks)
                    for j, (t, p) in enumerate(pos.items()):
                        rows.append((ci, dl, t, len(p), p, 1 if j == 0 else 0))
            out.append(rows)
        return pd.Series(out)

    return _flat


def flat_postings_from_documents(
    docs: DataFrame, cfg: EngineConfig | None = None
) -> DataFrame:
    """documents(repo, path, commit, lang, content) ->
    (term, doc_id, tf, positions, doc_len) — one Python crossing total."""
    cfg = cfg or EngineConfig()
    udf = _fused_udf(cfg.chunker)
    return docs.select(
        "repo",
        "path",
        "commit",
        F.explode(udf(F.col("content"), F.col("lang"))).alias("p"),
    ).select(
        F.col("p.term").alias("term"),
        F.xxhash64("repo", "path", "commit", F.col("p.chunk_idx")).alias("doc_id"),
        F.col("p.tf").alias("tf"),
        F.col("p.positions").alias("positions"),
        F.col("p.doc_len").cast("long").alias("doc_len"),
        F.col("p.first").alias("first"),
    )
