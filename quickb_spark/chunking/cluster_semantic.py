"""ClusterSemanticChunker (SURVEY.md §2 M2): DP-optimal semantic grouping.

Reference algorithm (/root/reference/src/chunking/cluster_semantic_chunker.py:
88-123, itself adapted from ChromaDB's chunking_evaluation, MIT):

1. first-stage split into small pieces (RecursiveTokenChunker at
   min_chunk_size, overlap 0, default separators) — our reference-exact
   splitter (chunking/splitter.py) in character mode;
2. embed every piece, build the piece x piece dot-product matrix;
3. subtract the mean of the off-diagonal entries, zero the diagonal;
4. dynamic program: choose contiguous clusters of at most
   max_chunk_size // min_chunk_size pieces maximizing the summed
   within-cluster (centered) similarity;
5. join each cluster's pieces with ' '.

The DP is deterministic given embeddings; only the embedder is a network
call in the reference (litellm text-embedding-3-large). Embedding is
therefore an injectable seam here, defaulting to `hash_embedder` — a
DETERMINISTIC FAKE (md5-hashed token buckets, L2-normalized) clearly not a
semantic model, but exercising the full pipeline shape. The conformance
test executes the reference chunker with the same fake injected through
its litellm seam and asserts byte-identical chunks
(tests/test_cluster_semantic.py).

Scale shape: one document's DP is O(pieces * max_cluster) after the
similarity matrix (pieces x pieces); pieces = doc_len / min_chunk_size, so
the work is bounded per document and embarrassingly parallel across
documents — a single Arrow-batched pandas UDF, no shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from quickb_spark.chunking.splitter import split_text

__all__ = [
    "hash_embedder",
    "optimal_segmentation",
    "cluster_semantic_split",
    "cluster_semantic_chunk_documents",
]

#: Default separator hierarchy the reference hard-codes for the first-stage
#: splitter (cluster_semantic_chunker.py:39).
_FIRST_STAGE_SEPARATORS = ("\n\n", "\n", ".", "?", "!", " ", "")


def hash_embedder(dim: int = 64):
    """Deterministic embedding SEAM (no model in this environment): each
    whitespace token adds a +-1 spike at an md5-derived coordinate; vectors
    are L2-normalized. Swap for a real encoder in production — everything
    downstream only needs a (texts) -> (n, dim) float array callable."""

    def embed(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            for tok in t.split():
                d = hashlib.md5(tok.encode()).digest()
                out[i, d[0] % dim] += 1.0 if d[1] % 2 else -1.0
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out

    return embed


def optimal_segmentation(matrix: np.ndarray, max_cluster: int) -> list[tuple[int, int]]:
    """Reference-identical DP (cluster_semantic_chunker.py:88-123): returns
    [(start, end)] inclusive cluster bounds covering 0..n-1.

    Kept numerically IDENTICAL to the reference — same centering, same
    contiguous-submatrix np-sum per candidate window (a prefix-sum scheme
    would change float accumulation order, and the `>` tie-breaks are
    observable in the output), same strictly-greater update rule with
    dp initialized to 0 (an all-nonpositive row keeps segmentation[i]=0)."""
    n = matrix.shape[0]
    if n < 1:
        return []
    if n > 1:
        off_diag = matrix.sum() - np.trace(matrix)
        mean_value = off_diag / (n * (n - 1))
    else:
        mean_value = 0.0
    m = matrix - mean_value
    np.fill_diagonal(m, 0)

    dp = np.zeros(n)
    segmentation = np.zeros(n, dtype=int)
    for i in range(n):
        for size in range(1, min(max_cluster + 1, i + 2)):
            start = i - size + 1
            reward = m[start : i + 1, start : i + 1].sum()
            if start > 0:
                reward += dp[start - 1]
            if reward > dp[i]:
                dp[i] = reward
                segmentation[i] = start
    clusters = []
    i = n - 1
    while i >= 0:
        start = int(segmentation[i])
        clusters.append((start, i))
        i = start - 1
    return list(reversed(clusters))


def cluster_semantic_split(
    text: str,
    embedder=None,
    max_chunk_size: int = 400,
    min_chunk_size: int = 50,
) -> list[str]:
    """One document -> semantically clustered chunks (reference
    split_text pipeline, cluster_semantic_chunker.py:125-139)."""
    if not text or not text.strip():
        return []
    pieces = split_text(
        text,
        chunk_size=min_chunk_size,
        chunk_overlap=0,
        separators=_FIRST_STAGE_SEPARATORS,
        keep_separator=True,
    )
    if len(pieces) < 2:
        return [text]
    embedder = embedder or hash_embedder()
    emb = np.asarray(embedder(pieces), dtype=np.float64)
    sim = emb @ emb.T
    clusters = optimal_segmentation(sim, max_chunk_size // min_chunk_size)
    return [" ".join(pieces[s : e + 1]) for s, e in clusters]


def cluster_semantic_chunk_array_udf(
    max_chunk_size: int = 400, min_chunk_size: int = 50, dim: int = 64
):
    """content -> array<string> of semantic chunks, Arrow-batched. The
    embedder runs inside the task (per-piece, no extra crossing); docs are
    independent so the op is a pure map — no shuffle at any scale."""

    @F.pandas_udf(ArrayType(StringType()))
    def _chunks(content: pd.Series) -> pd.Series:
        embed = hash_embedder(dim)
        return pd.Series(
            [
                cluster_semantic_split(c, embed, max_chunk_size, min_chunk_size)
                for c in content
            ]
        )

    return _chunks


def cluster_semantic_chunk_documents(
    docs: DataFrame, max_chunk_size: int = 400, min_chunk_size: int = 50
) -> DataFrame:
    """documents(repo, path, commit, lang, content) -> chunk rows with the
    engine's standard provenance columns and deterministic doc_id minting
    (same id convention as chunking/udf.py)."""
    udf = cluster_semantic_chunk_array_udf(max_chunk_size, min_chunk_size)
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
