"""End-to-end spine: corpus → chunk UDF → flat index → BM25 vs oracle.

Covers SURVEY.md §5 items 2 (index-build vs brute-force dict oracle) and
3 (BM25 top-k rank identity, scores within 1e-6), plus the sha256 per-row
invariant from BASELINE.json input_hint.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from quickb_spark.chunking import chunk_documents
from quickb_spark.chunking.splitter import split_document
from quickb_spark.config import ChunkerConfig, EngineConfig
from quickb_spark.corpus import fixture_queries, generate_documents_df
from quickb_spark.index.build import (
    build_doc_stats,
    build_flat_postings,
    build_term_stats,
    corpus_stats,
)
from quickb_spark.query.bm25 import bm25_topk_flat
from tests.oracle_bm25 import OracleIndex

N_DOCS = 300


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents_df(spark, N_DOCS, seed=42, partitions=4).cache()


@pytest.fixture(scope="module")
def chunks(spark, docs):
    return chunk_documents(docs, EngineConfig()).cache()


@pytest.fixture(scope="module")
def flat(spark, chunks):
    return build_flat_postings(chunks).cache()


@pytest.fixture(scope="module")
def oracle(chunks):
    rows = chunks.select("doc_id", "text").collect()
    return OracleIndex([(r["doc_id"], r["text"]) for r in rows])


def test_chunk_udf_matches_pure_function(docs, chunks):
    cfg = ChunkerConfig()
    expected = []
    for r in docs.collect():
        for i, t in enumerate(split_document(r["content"], r["lang"], cfg)):
            expected.append((r["repo"], r["path"], i, t))
    got = [
        (r["repo"], r["path"], r["chunk_idx"], r["text"])
        for r in chunks.select("repo", "path", "chunk_idx", "text").collect()
    ]
    assert sorted(got) == sorted(expected)
    assert len(got) > N_DOCS  # real corpus actually splits


def test_doc_ids_unique_and_deterministic(spark, docs, chunks):
    n = chunks.count()
    assert chunks.select("doc_id").distinct().count() == n
    # Re-running the whole plan with a different partitioning yields
    # identical ids (determinism across partitionings / retries).
    again = chunk_documents(docs.repartition(11), EngineConfig())
    assert (
        again.select("doc_id", "chunk_sha256")
        .exceptAll(chunks.select("doc_id", "chunk_sha256"))
        .count()
        == 0
    )


def test_sha256_invariant(docs):
    # Per-row invariant (BASELINE.json input_hint): engine-computed
    # F.sha2(content) equals a python-side sha256 of the same source row.
    rows = docs.select(
        "repo", "path", "content", F.sha2("content", 256).alias("h")
    ).collect()
    for r in rows:
        assert r["h"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_flat_postings_match_oracle(flat, oracle):
    got = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in flat.collect()
    }
    expected = {
        (term, doc_id): (len(pos), pos)
        for term, plist in oracle.postings.items()
        for doc_id, pos in plist.items()
    }
    assert got == expected


def test_term_doc_stats_match_oracle(flat, oracle):
    ts = {r["term"]: (r["df"], r["cf"]) for r in build_term_stats(flat).collect()}
    assert ts == {
        t: (oracle.df(t), oracle.cf(t)) for t in oracle.postings
    }
    ds = {r["doc_id"]: r["doc_len"] for r in build_doc_stats(flat).collect()}
    assert ds == oracle.doc_len
    n, avgdl = corpus_stats(build_doc_stats(flat))
    assert n == oracle.n_docs
    assert abs(avgdl - oracle.avgdl) < 1e-9


def test_bm25_topk_rank_identity(spark, flat, oracle):
    queries = fixture_queries()
    qdf = spark.createDataFrame(queries, ["query_id", "query_text"])
    doc_stats = build_doc_stats(flat)
    term_stats = build_term_stats(flat)
    n, avgdl = corpus_stats(doc_stats)
    got = bm25_topk_flat(
        flat, term_stats, doc_stats, qdf, n, avgdl, k=10
    ).collect()
    by_query: dict[str, list] = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    hit_queries = 0
    for qid, qtext in queries:
        expected = oracle.topk(qtext, k=10)
        actual = sorted(by_query.get(qid, []))
        assert [(r, d) for r, d, _ in actual] == [
            (r, d) for r, d, _ in expected
        ], f"rank mismatch for {qid!r}: {qtext!r}"
        for (_, _, sa), (_, _, se) in zip(actual, expected):
            assert abs(sa - se) < 1e-6
        if expected:
            hit_queries += 1
    assert hit_queries >= 40  # the query set genuinely exercises the corpus
    assert not by_query.get("q0011")  # absent term -> no rows
