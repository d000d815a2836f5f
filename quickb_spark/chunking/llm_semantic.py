"""LLMSemanticChunker (SURVEY.md §2 G8): LLM-guided split-point selection.

Reference algorithm (/root/reference/src/chunking/llm_semantic_chunker.py:
98-124, itself adapted from ChromaDB's chunking_evaluation, MIT):

1. first-stage split into small pieces (RecursiveTokenChunker at size 50,
   overlap 0, default separators) — our reference-exact splitter in
   character mode;
2. walk a sliding context window (<= 800 length units of pieces, each
   tagged ``<|start_chunk_i|>...<|end_chunk_i|>``, 1-based);
3. ask a completer for ascending split points after the current position
   (reference protocol: a ``split_after: 3, 5`` response line);
4. merge pieces between split points (space-joined, stripped).

The ONLY nondeterministic/network part is the LLM completion; everything
around it (window assembly, response parsing, merge) is deterministic. The
completer is therefore an injectable seam ``(context_str) -> response_str``
defaulting to `fake_llm_responder` — a DETERMINISTIC stand-in that parses
the tagged window and proposes splits at the lowest consecutive
hash-embedder cosine similarity (clearly not a real LLM, but exercising
the full orchestration, protocol parsing, and merge paths). The
conformance test executes the reference chunker with the same responder
injected through its litellm seam and asserts byte-identical chunks
(tests/test_llm_semantic.py).

Scale shape: per-document sequential window walk (the reference's own
control flow), embarrassingly parallel across documents — one
Arrow-batched pandas UDF, no shuffle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from quickb_spark.chunking.cluster_semantic import hash_embedder
from quickb_spark.chunking.splitter import split_text

__all__ = [
    "fake_llm_responder",
    "parse_split_response",
    "merge_pieces",
    "llm_semantic_split",
    "llm_semantic_chunk_documents",
]

#: Reference first-stage splitter settings (llm_semantic_chunker.py:28-32).
_FIRST_STAGE_SEPARATORS = ("\n\n", "\n", ".", "?", "!", " ", "")
_PIECE_SIZE = 50
_WINDOW_BUDGET = 800

_TAG_RE = re.compile(r"<\|start_chunk_(\d+)\|>(.*?)<\|end_chunk_\1\|>", re.S)


def fake_llm_responder(context: str, max_splits: int = 2, dim: int = 64) -> str:
    """Deterministic completer SEAM (no model in this environment): parse
    the tagged window, embed each piece with the hash embedder, and
    propose splits after the (up to max_splits) pieces with the LOWEST
    cosine similarity to their successor — answered in the reference's
    ``split_after: i, j`` protocol. Swap for a real LLM call in
    production; the orchestration only needs (context) -> response."""
    parts = _TAG_RE.findall(context)
    if not parts:
        return "split_after:"
    ids = [int(i) for i, _ in parts]
    texts = [t for _, t in parts]
    if len(ids) < 2:
        return f"split_after: {ids[-1]}"
    emb = hash_embedder(dim)(texts)  # rows already L2-normalized
    sims = np.einsum("ij,ij->i", emb[:-1], emb[1:])
    order = np.argsort(sims, kind="stable")[:max_splits]
    chosen = sorted(ids[int(b)] for b in order)
    return "split_after: " + ", ".join(str(c) for c in chosen)


def parse_split_response(response: str, current_chunk: int) -> list[int]:
    """Reference _parse_response (llm_semantic_chunker.py:79-83): integers
    after the ``split_after:`` marker, ascending, strictly beyond the
    current position."""
    numbers: list[int] = []
    if "split_after:" in response:
        numbers = list(map(int, re.findall(r"\d+", response.split("split_after:")[1])))
    return sorted(n for n in numbers if n > current_chunk)


def merge_pieces(pieces: list[str], indices: list[int]) -> list[str]:
    """Reference _merge_chunks (llm_semantic_chunker.py:85-99): indices are
    1-based split-AFTER points; groups are space-joined and stripped."""
    merged: list[str] = []
    current: list[str] = []
    split_points = sorted(i - 1 for i in indices if i > 0)
    for i, chunk in enumerate(pieces):
        current.append(chunk)
        if i in split_points:
            merged.append(" ".join(current).strip())
            current = []
    if current:
        merged.append(" ".join(current).strip())
    return merged


def llm_semantic_split(text: str, completer=None) -> list[str]:
    """One document -> completer-guided chunks (reference split_text
    pipeline, llm_semantic_chunker.py:101-124), character length mode."""
    pieces = split_text(
        text,
        chunk_size=_PIECE_SIZE,
        chunk_overlap=0,
        separators=_FIRST_STAGE_SEPARATORS,
        keep_separator=True,
    )
    completer = completer or fake_llm_responder
    split_indices: list[int] = []
    current_chunk = 0
    while current_chunk < len(pieces) - 4:
        window: list[str] = []
        length_count = 0
        for i in range(current_chunk, len(pieces)):
            length_count += len(pieces[i])
            if length_count > _WINDOW_BUDGET:
                break
            window.append(f"<|start_chunk_{i + 1}|>{pieces[i]}<|end_chunk_{i + 1}|>")
        response = completer("\n".join(window))
        numbers = parse_split_response(response, current_chunk)
        if numbers:
            split_indices.extend(numbers)
            current_chunk = numbers[-1]
        else:
            break
    return merge_pieces(pieces, split_indices)


def llm_semantic_chunk_array_udf(dim: int = 64):
    """content -> array<string> of chunks, Arrow-batched; the deterministic
    responder runs inside the task — no extra crossing, no shuffle."""

    @F.pandas_udf(ArrayType(StringType()))
    def _chunks(content: pd.Series) -> pd.Series:
        completer = lambda ctx: fake_llm_responder(ctx, dim=dim)  # noqa: E731
        return pd.Series([llm_semantic_split(c or "", completer) for c in content])

    return _chunks


def llm_semantic_chunk_documents(docs: DataFrame) -> DataFrame:
    """documents(repo, path, commit, lang, content) -> chunk rows with the
    engine's standard provenance columns and deterministic doc_id minting
    (same id convention as chunking/udf.py)."""
    udf = llm_semantic_chunk_array_udf()
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
