"""Byte-identity of our splitter vs the reference RecursiveTokenChunker.

The reference implementation at /root/reference is executed directly (pure
functions, character mode) as the oracle. tiktoken isn't installed in this
container; character-length mode never calls it, so a stub module satisfies
the import (reference src/chunking/utils.py imports it at module scope).
"""

from __future__ import annotations

import sys
import types

import pytest

from quickb_spark.config import (
    DEFAULT_SEPARATORS,
    PYTHON_SEPARATORS,
    ChunkerConfig,
    separators_for_lang,
)
from quickb_spark.chunking.splitter import split_document, split_text
from tests.corpus_cases import EDGE_DOCS, random_docs


_STUBS: dict[str, dict] = {
    "tiktoken": {},
    "litellm": {"embedding": None, "completion": None},
    "backoff": {"on_exception": lambda *a, **k: (lambda f: f), "expo": None},
    "tqdm": {"tqdm": lambda x, *a, **k: x},
    "openai": {},
    "anthropic": {"Anthropic": object},
    "attr": {"dataclass": lambda cls=None, **kw: cls if cls else (lambda c: c)},
}


def _load_reference_chunker():
    # The reference package imports network/tokenizer deps at module scope
    # that aren't installed here; character-mode chunking never calls them,
    # so empty stub modules satisfy the imports.
    for mod, attrs in _STUBS.items():
        try:
            __import__(mod)
        except ImportError:
            stub = types.ModuleType(mod)
            for k, v in attrs.items():
                setattr(stub, k, v)
            sys.modules[mod] = stub
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    try:
        from chunking.recursive_token_chunker import RecursiveTokenChunker
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference chunker unavailable: {exc}")
    return RecursiveTokenChunker


@pytest.fixture(scope="module")
def ref_chunker_cls():
    return _load_reference_chunker()


def _ref_split(cls, text, seps, size=400, overlap=0):
    return cls(
        chunk_size=size,
        chunk_overlap=overlap,
        separators=list(seps),
        keep_separator=True,
        length_type="character",
    ).split_text(text)


@pytest.mark.parametrize("lang,text", EDGE_DOCS)
def test_edge_docs_match_reference(ref_chunker_cls, lang, text):
    cfg = ChunkerConfig()
    seps = separators_for_lang(lang, cfg)
    expected = _ref_split(ref_chunker_cls, text, seps)
    assert split_document(text, lang, cfg) == expected


@pytest.mark.parametrize("size,overlap", [(400, 0), (400, 50), (100, 20), (50, 0), (1000, 200), (7, 3)])
def test_random_docs_match_reference(ref_chunker_cls, size, overlap):
    for lang, text in random_docs(60, seed=size * 1000 + overlap):
        for seps in (DEFAULT_SEPARATORS, PYTHON_SEPARATORS):
            expected = _ref_split(ref_chunker_cls, text, seps, size, overlap)
            got = split_text(text, size, overlap, seps)
            assert got == expected, (lang, size, overlap, seps, text[:80])


def test_empty_and_whitespace():
    assert split_text("") == []
    assert split_text("   \n\n  ") == []


def test_oversized_unsplittable_emitted_as_is():
    chunks = split_text("A" * 2000)
    # "" separator explodes to chars, all < 400, merged back into <=400 windows
    assert all(len(c) <= 400 for c in chunks)
    assert "".join(chunks) == "A" * 2000


def test_overlap_guard_rejected():
    with pytest.raises(ValueError):
        ChunkerConfig(chunk_size=10, chunk_overlap=20)


def test_chunks_cover_bounded_size():
    # Property from SURVEY.md §5: merged chunks never exceed chunk_size
    # (only unsplittable single pieces may, and "" fallback splits those too).
    for lang, text in random_docs(40, seed=7):
        for c in split_document(text, lang, ChunkerConfig()):
            assert len(c) <= 400
            assert c == c.strip()
            assert c != ""
