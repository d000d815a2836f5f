"""FixedTokenChunker (SURVEY.md §2 C5) + length functions (C6).

The reference's second offline chunker splits text into fixed-size TOKEN
windows with overlap: encode the whole text once, take windows of
`chunk_size` tokens with stride `chunk_size - chunk_overlap`, decode each
window back to text (reference src/chunking/fixed_token_chunker.py:175-189,
`split_text_on_tokens`; window wiring :148-163). The window walk here is
that exact algorithm; what varies is the CODEC:

- `tiktoken_codec()`: the reference's cl100k_base BPE — the real seam.
  tiktoken isn't installed in this container, so constructing it raises a
  clear ImportError telling the operator what to install (mirrors the
  reference's own guard, fixed_token_chunker.py:131-138).
- `whitespace_codec()`: the default proxy — LOSSLESS run segmentation
  (alternating \\S+/\\s+ runs, concatenation reproduces the text exactly,
  like BPE decode does), so every window-boundary property of the
  reference algorithm is preserved; only the token vocabulary differs.
  tests/test_fixed_token.py executes the REFERENCE implementation with
  this codec injected and asserts byte-identical chunks.

Length functions mirror reference src/chunking/utils.py:31-97
(`get_length_function`): 'character' -> len, 'token' -> len(encode(text)).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = [
    "whitespace_codec",
    "tiktoken_codec",
    "split_text_on_token_windows",
    "get_length_function",
    "fixed_token_chunk_documents",
]

_RUN_RE = re.compile(r"\s+|\S+")


class whitespace_codec:
    """Lossless run-segmentation codec: tokens are alternating whitespace /
    non-whitespace runs, decode is concatenation (round-trips any text)."""

    name = "whitespace-runs"

    def encode(self, text: str) -> list[str]:
        return _RUN_RE.findall(text)

    def decode(self, tokens: list[str]) -> str:
        return "".join(tokens)


def tiktoken_codec(encoding_name: str = "cl100k_base"):
    """The reference's real tokenizer — requires tiktoken (not shipped in
    this environment; the error mirrors the reference's guard)."""
    try:
        import tiktoken
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "Could not import tiktoken python package. This is needed for "
            "FixedTokenChunker's token mode. Install it with "
            "`pip install tiktoken`, or use whitespace_codec()."
        ) from exc

    class _TikTok:
        name = f"tiktoken:{encoding_name}"

        def __init__(self) -> None:
            self._enc = tiktoken.get_encoding(encoding_name)

        def encode(self, text: str):
            return self._enc.encode(text, disallowed_special=())

        def decode(self, tokens):
            return self._enc.decode(tokens)

    return _TikTok()


def split_text_on_token_windows(
    text: str,
    chunk_size: int,
    chunk_overlap: int,
    codec=None,
) -> list[str]:
    """Reference `split_text_on_tokens` algorithm, codec-parameterized
    (fixed_token_chunker.py:175-189): windows of chunk_size tokens, stride
    chunk_size - chunk_overlap, each decoded back to text. Kept
    iteration-exact (empty input -> no chunks) so the conformance test can
    assert byte identity against the reference executed directly."""
    if chunk_overlap >= chunk_size:
        # DELIBERATE deviation from the reference guard (which only rejects
        # overlap > size): overlap == size means stride 0 — the window walk
        # can never terminate, and inside a pandas UDF that hangs an
        # executor task with no diagnostic instead of raising here.
        raise ValueError(
            f"Got a chunk overlap ({chunk_overlap}) >= chunk size "
            f"({chunk_size}); a zero or negative stride can never terminate."
        )
    codec = codec or whitespace_codec()
    splits: list[str] = []
    input_ids = codec.encode(text)
    start_idx = 0
    cur_idx = min(start_idx + chunk_size, len(input_ids))
    chunk_ids = input_ids[start_idx:cur_idx]
    while start_idx < len(input_ids):
        splits.append(codec.decode(chunk_ids))
        if cur_idx == len(input_ids):
            break
        start_idx += chunk_size - chunk_overlap
        cur_idx = min(start_idx + chunk_size, len(input_ids))
        chunk_ids = input_ids[start_idx:cur_idx]
    return splits


def get_length_function(
    length_type: str = "character", codec=None
) -> Callable[[str], int]:
    """reference src/chunking/utils.py:77-97 parity: 'character' -> len;
    'token' -> len(encode(text)) with the codec (default whitespace proxy;
    pass tiktoken_codec() where tiktoken is installed)."""
    if length_type == "character":
        return len
    if length_type == "token":
        c = codec or whitespace_codec()
        return lambda text: len(c.encode(text))
    raise ValueError(
        f"Unknown length type: {length_type}. Choose 'token' or 'character'"
    )


def fixed_token_chunk_array_udf(chunk_size: int, chunk_overlap: int):
    """pandas UDF: content -> array<string> of fixed-token-window chunks.
    The codec is constructed per task (closure-shipped config only)."""

    @F.pandas_udf(ArrayType(StringType()))
    def _chunk(content: pd.Series) -> pd.Series:
        codec = whitespace_codec()
        return pd.Series(
            [
                split_text_on_token_windows(c, chunk_size, chunk_overlap, codec)
                if c
                else []
                for c in content
            ]
        )

    return _chunk


def fixed_token_chunk_documents(
    docs: DataFrame, chunk_size: int = 400, chunk_overlap: int = 0
) -> DataFrame:
    """documents(repo, path, commit, lang, content) -> chunks DataFrame with
    the same schema chunking.udf.chunk_documents emits (doc_id minting
    included), so the two chunkers are drop-in interchangeable upstream of
    the index build."""
    from quickb_spark.chunking.udf import chunk_id_col

    udf = fixed_token_chunk_array_udf(chunk_size, chunk_overlap)
    exploded = docs.select(
        "repo",
        "path",
        "commit",
        "lang",
        F.posexplode(udf(F.col("content"))).alias("chunk_idx", "text"),
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
