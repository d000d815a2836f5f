"""Recursive-character document splitter — pure functions, no Spark.

Reproduces, byte-for-byte, the observable behavior of the reference's
RecursiveTokenChunker in character-length mode (the reference's golden config,
config.yaml:18-24). Behavior studied from:

- reference src/chunking/recursive_token_chunker.py:13-26
  (keep-separator regex split: each separator is glued onto the piece that
  FOLLOWS it; empty pieces dropped; "" separator explodes to characters)
- reference src/chunking/recursive_token_chunker.py:52-90
  (separator hierarchy selection via re.search; greedy small-piece buffering;
  recursion into oversized pieces with the remaining separators)
- reference src/chunking/fixed_token_chunker.py:73-113
  (_merge_splits/_join_docs: sliding accumulation with overlap carry-back
  pop-front loop; join + strip; drop empty)

This is a fresh implementation of those semantics (different structure and
names), NOT a copy. Chunk boundaries define docIDs and therefore rank
identity, so every edge case here is load-bearing; see
tests/test_chunker_conformance.py which asserts byte-identity against the
reference implementation executed directly.

Everything here is deterministic and a pure function of
(text, chunk_size, chunk_overlap, separators, keep_separator) — a hard
requirement for Spark task retries and cluster-size invariance.
"""

from __future__ import annotations

import re
from functools import lru_cache

from quickb_spark.config import ChunkerConfig, separators_for_lang

__all__ = ["split_document", "split_text"]


@lru_cache(maxsize=512)
def _sep_regex(separator: str) -> re.Pattern[str]:
    # Capturing group keeps the separators in re.split's output.
    return re.compile(f"({re.escape(separator)})")


def _split_keeping_separator(text: str, separator: str) -> list[str]:
    """Split on a literal separator, gluing each separator onto the piece
    after it. With a capturing group, re.split yields an odd-length list
    [piece0, sep, piece1, sep, ..., pieceN]; pair each sep with its successor.
    Empty-string separator means per-character explosion.
    (Semantics of reference recursive_token_chunker.py:13-26.)
    """
    if not separator:
        return list(text)  # "" never appears, so no empty-filter needed
    parts = _sep_regex(separator).split(text)
    pieces = [parts[0]]
    for i in range(1, len(parts) - 1, 2):
        pieces.append(parts[i] + parts[i + 1])
    return [p for p in pieces if p != ""]


def _split_plain(text: str, separator: str) -> list[str]:
    if not separator:
        return [c for c in text]
    return [p for p in re.split(re.escape(separator), text) if p != ""]


def _pack_pieces(
    pieces: list[str], joiner: str, chunk_size: int, chunk_overlap: int
) -> list[str]:
    """Greedily accumulate small pieces into chunks of at most chunk_size
    characters (counting the joiner between pieces), carrying back up to
    chunk_overlap characters of trailing pieces into the next chunk.
    Joined chunks are stripped; empty results dropped.
    (Semantics of reference fixed_token_chunker.py:79-113 + 73-77.)
    """
    jlen = len(joiner)
    chunks: list[str] = []
    window: list[str] = []
    total = 0
    for piece in pieces:
        plen = len(piece)
        if total + plen + (jlen if window else 0) > chunk_size:
            if window:
                joined = joiner.join(window).strip()
                if joined:
                    chunks.append(joined)
                # Carry-back: shrink the window from the front until what
                # remains fits under the overlap budget AND leaves room for
                # the incoming piece.
                while total > chunk_overlap or (
                    total + plen + (jlen if window else 0) > chunk_size
                    and total > 0
                ):
                    total -= len(window[0]) + (jlen if len(window) > 1 else 0)
                    window = window[1:]
        window.append(piece)
        total += plen + (jlen if len(window) > 1 else 0)
    joined = joiner.join(window).strip()
    if joined:
        chunks.append(joined)
    return chunks


def _recursive_split(
    text: str,
    separators: tuple[str, ...],
    chunk_size: int,
    chunk_overlap: int,
    keep_separator: bool,
) -> list[str]:
    """(Semantics of reference recursive_token_chunker.py:52-90.)"""
    # Pick the first separator of the hierarchy present in the text; ""
    # matches unconditionally. Separators after the chosen one remain
    # available for recursion into oversized pieces.
    chosen = separators[-1]
    remaining: tuple[str, ...] = ()
    for i, cand in enumerate(separators):
        if cand == "":
            chosen = cand
            break
        if cand in text:  # literal separators: `in` ≡ re.search(escaped)
            chosen = cand
            remaining = separators[i + 1 :]
            break

    pieces = (
        _split_keeping_separator(text, chosen)
        if keep_separator
        else _split_plain(text, chosen)
    )
    joiner = "" if keep_separator else chosen

    out: list[str] = []
    buffer: list[str] = []
    for piece in pieces:
        if len(piece) < chunk_size:
            buffer.append(piece)
            continue
        if buffer:
            out.extend(_pack_pieces(buffer, joiner, chunk_size, chunk_overlap))
            buffer = []
        if remaining:
            out.extend(
                _recursive_split(
                    piece, remaining, chunk_size, chunk_overlap, keep_separator
                )
            )
        else:
            # Oversized and unsplittable: emit as-is (reference :82).
            out.append(piece)
    if buffer:
        out.extend(_pack_pieces(buffer, joiner, chunk_size, chunk_overlap))
    return out


def split_text(
    text: str,
    chunk_size: int = 400,
    chunk_overlap: int = 0,
    separators: tuple[str, ...] | list[str] = ("\n\n", "\n", ".", "?", "!", " ", ""),
    keep_separator: bool = True,
) -> list[str]:
    """Split raw text into chunks with explicit parameters."""
    return _recursive_split(
        text, tuple(separators), chunk_size, chunk_overlap, keep_separator
    )


def split_document(text: str, lang: str | None, cfg: ChunkerConfig) -> list[str]:
    """Split one document with language-aware separator selection."""
    if text is None:
        return []
    return _recursive_split(
        text,
        separators_for_lang(lang, cfg),
        cfg.chunk_size,
        cfg.chunk_overlap,
        cfg.keep_separator,
    )
