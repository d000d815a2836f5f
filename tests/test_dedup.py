"""Python-oracle tests for dedup operators without a SQL oracle.

simhash_col has no ANSI-SQL equivalent (bit-level md5 + sign packing), so
the oracle is simhash_py — the same spec written as straight-line Python —
compared bit-for-bit over a corpus covering empty/None/whitespace/unicode
and heavy-duplication cases.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickb_spark.ops.dedup import simhash_col, simhash_py


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (2, "the quick brown fox leaps over the lazy dog"),  # near dup
        (3, ""),
        (4, None),
        (5, "   \n\t  "),
        (6, "def f(x): return x * 2  # compute"),
        (7, "SELECT a, b FROM t WHERE a < b GROUP BY a"),
        (8, "aaa aaa aaa aaa aaa bbb"),  # tf-weighting matters
        (9, "bbb aaa"),
        (10, "único café naïve résumé 日本語テスト"),
        (11, "x" * 5000),
        (12, " ".join(f"tok{i}" for i in range(300))),
        (13, " ".join(f"tok{i % 7}" for i in range(300))),
        (14, "!!! ??? ;;; --- 123abc starts numeric"),  # mixed-token edge
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_matches_python_oracle(spark, docs):
    got = {
        r["doc_id"]: r["simhash"]
        for r in docs.select("doc_id", simhash_col("text").alias("simhash")).collect()
    }
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in rows.items():
        assert got[doc_id] == simhash_py(text), f"doc {doc_id}"


def test_simhash_near_dup_hamming(spark, docs):
    """Near-duplicates land within a few bits; unrelated texts don't collide."""
    h = {
        r["doc_id"]: np.uint64(r["simhash"] & 0xFFFFFFFFFFFFFFFF)
        for r in docs.select("doc_id", simhash_col("text").alias("simhash")).collect()
    }

    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")

    assert ham(h[0], h[1]) == 0  # identical text -> identical hash
    assert ham(h[0], h[2]) <= 12  # one-word edit stays close
    assert ham(h[0], h[12]) > 12  # unrelated text is far


def test_simhash_empty_inputs(spark, docs):
    got = {
        r["doc_id"]: r["simhash"]
        for r in docs.select("doc_id", simhash_col("text").alias("simhash")).collect()
    }
    assert got[3] == 0 and got[4] == 0 and got[5] == 0


def test_xxhash64_minhash_variant_matches_md5_lsh_behavior(spark, docs):
    """Production int64 minhash: exact duplicates must collide on every
    band in BOTH variants, and the banded-LSH candidate sets restricted to
    true duplicates agree (the hash FAMILIES differ, so borderline
    near-dup candidates may differ — the exact-Jaccard verify stage is
    what makes the pipeline's final output hash-family-independent)."""
    from quickb_spark.ops.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        minhash_signatures_xxhash64,
    )

    md5_sig = minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    xx_sig = minhash_signatures_xxhash64(docs, "doc_id", "text", num_hashes=8)
    # identical text -> identical signature vector, per variant
    for sig in (md5_sig, xx_sig):
        rows = {r["doc_id"]: tuple(r)[1:] for r in sig.collect()}
        assert rows[0] == rows[1]
    md5_pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(md5_sig, "doc_id", 8).collect()
    }
    xx_pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(xx_sig, "doc_id", 8).collect()
    }
    assert (0, 1) in md5_pairs and (0, 1) in xx_pairs  # exact dup found by both
