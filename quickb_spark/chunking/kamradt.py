"""KamradtModifiedChunker (SURVEY.md §2 M3): binary-searched semantic splits.

Reference algorithm (/root/reference/src/chunking/kamradt_modified_chunker.py:
49-105, itself adapted from Greg Kamradt's levels-of-text-splitting notebook
via chunking_evaluation, MIT):

1. first-stage split into small pieces (RecursiveTokenChunker at
   min_chunk_size, overlap 0, default separators) — our reference-exact
   splitter (chunking/splitter.py) in character mode;
2. combine each piece with a +-3-piece context window (space-joined);
3. embed every combined window, L2-normalize, take the cosine DISTANCE
   between consecutive windows (1 - sim[i, i+1]);
4. binary-search a distance threshold in [0, 1] down to 1e-6 so that the
   number of breakpoints above it does not exceed
   total_len // avg_chunk_size (M3's binary-search-threshold pattern);
5. split at the surviving breakpoints; chunks are space-joined pieces.

Deterministic given embeddings; only the embedder is a network call in the
reference (litellm text-embedding-3-large). As with ClusterSemanticChunker
(chunking/cluster_semantic.py) the embedder is an injectable seam here,
defaulting to the same deterministic `hash_embedder`; the conformance test
executes the reference chunker with that embedder injected through its
litellm seam and asserts byte-identical chunks (tests/test_kamradt.py).

Scale shape: one document's work is O(pieces * dim) plus one (pieces x
pieces) dot product, bounded per document and embarrassingly parallel
across documents — a single Arrow-batched pandas UDF, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from quickb_spark.chunking.cluster_semantic import hash_embedder
from quickb_spark.chunking.splitter import split_text

__all__ = [
    "combine_pieces",
    "breakpoint_threshold",
    "kamradt_split",
    "kamradt_chunk_documents",
]

#: Reference RecursiveTokenChunker default separator hierarchy
#: (recursive_token_chunker.py:49) — Kamradt's first stage uses the default.
_FIRST_STAGE_SEPARATORS = ("\n\n", "\n", ".", "?", "!", " ", "")


def combine_pieces(pieces: list[str], buffer_size: int = 3) -> list[str]:
    """+-buffer_size context windows, space-joined (reference
    combine_sentences, kamradt_modified_chunker.py:49-55; split_text calls
    it with buffer_size=3)."""
    n = len(pieces)
    return [
        " ".join(pieces[max(0, i - buffer_size) : min(n, i + buffer_size + 1)])
        for i in range(n)
    ]


def breakpoint_threshold(distances: np.ndarray, target_splits: int) -> float:
    """Binary search the split threshold (reference split_text:88-95):
    smallest high (to 1e-6) such that at most target_splits consecutive
    distances exceed it."""
    low, high = 0.0, 1.0
    while high - low > 1e-6:
        mid = (low + high) / 2
        if (distances > mid).sum() > target_splits:
            low = mid
        else:
            high = mid
    return high


def kamradt_split(
    text: str,
    embedder=None,
    avg_chunk_size: int = 400,
    min_chunk_size: int = 50,
) -> list[str]:
    """One document -> threshold-split chunks (reference split_text
    pipeline, kamradt_modified_chunker.py:75-105), character length mode."""
    pieces = split_text(
        text,
        chunk_size=min_chunk_size,
        chunk_overlap=0,
        separators=_FIRST_STAGE_SEPARATORS,
        keep_separator=True,
    )
    if not pieces:
        return []
    combined = combine_pieces(pieces, 3)
    embedder = embedder or hash_embedder()
    emb = np.asarray(embedder(combined), dtype=np.float64)
    # reference normalizes in place then takes the full dot-product matrix;
    # kept operation-identical so float rounding (and thus every `>`
    # comparison against the threshold) matches bit-for-bit
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    emb /= norms
    sim = np.dot(emb, emb.T)
    distances = np.array([1 - sim[i, i + 1] for i in range(len(pieces) - 1)])

    total_len = sum(len(p) for p in pieces)
    target_splits = total_len // avg_chunk_size if avg_chunk_size else 1
    high = breakpoint_threshold(distances, target_splits)

    split_indices = [i for i, d in enumerate(distances) if d > high]
    chunks: list[str] = []
    start = 0
    for idx in split_indices:
        chunks.append(" ".join(pieces[start : idx + 1]))
        start = idx + 1
    if start < len(pieces):
        chunks.append(" ".join(pieces[start:]))
    return chunks


def kamradt_chunk_array_udf(
    avg_chunk_size: int = 400, min_chunk_size: int = 50, dim: int = 64
):
    """content -> array<string> of chunks, Arrow-batched; the embedder runs
    inside the task so there is no extra JVM<->Python crossing and no
    shuffle at any scale."""

    @F.pandas_udf(ArrayType(StringType()))
    def _chunks(content: pd.Series) -> pd.Series:
        embed = hash_embedder(dim)
        return pd.Series(
            [
                kamradt_split(c or "", embed, avg_chunk_size, min_chunk_size)
                for c in content
            ]
        )

    return _chunks


def kamradt_chunk_documents(
    docs: DataFrame, avg_chunk_size: int = 400, min_chunk_size: int = 50
) -> DataFrame:
    """documents(repo, path, commit, lang, content) -> chunk rows with the
    engine's standard provenance columns and deterministic doc_id minting
    (same id convention as chunking/udf.py)."""
    udf = kamradt_chunk_array_udf(avg_chunk_size, min_chunk_size)
    c = docs.select(
        "repo",
        "path",
        "commit",
        "lang",
        F.posexplode(udf(F.col("content"))).alias("chunk_idx", "text"),
    )
    return c.select(
        F.xxhash64("repo", "path", "commit", F.col("chunk_idx")).alias("doc_id"),
        "repo",
        "path",
        "commit",
        "lang",
        "chunk_idx",
        "text",
        F.length("text").alias("doc_len"),
    )
