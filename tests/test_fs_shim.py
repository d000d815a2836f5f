"""Storage-agnostic side-file I/O: the index must build, resume, and serve
with a SCHEME-QUALIFIED index root (file://...). Plain os.path/open calls
would treat "file:///x" as a relative path and break — this test proves
every side-file operation (markers, stats, meta commits, fold markers) goes
through the Hadoop FileSystem API instead."""

from __future__ import annotations

import os

import pytest

from quickb_spark.config import EngineConfig, IndexConfig
from quickb_spark.corpus import fixture_queries, generate_documents_df
from quickb_spark.fs import IndexFS, join_path
from quickb_spark.index.segments import (
    build_index,
    invalidate_buckets,
    load_commits,
    load_stats,
    segments_meta,
)
from quickb_spark.query.wand import bm25_topk_segments

CFG = EngineConfig(
    index=IndexConfig(
        hot_term_doc_fraction=0.2,
        hot_term_min_df=50,
        salt_buckets=4,
        block_size=32,
        term_buckets=8,
    )
)


def test_fs_ops_roundtrip(spark, tmp_path):
    fs = IndexFS(f"file://{tmp_path}", spark)
    p = f"file://{tmp_path}/sub/x.json"
    fs.mkdirs(f"file://{tmp_path}/sub")
    fs.write_text_atomic(p, '{"a": 1}')
    assert fs.exists(p)
    assert fs.read_text(p) == '{"a": 1}'
    assert "x.json" in fs.listdir(f"file://{tmp_path}/sub")
    fs.rename(p, f"file://{tmp_path}/sub/y.json")
    assert not fs.exists(p) and fs.exists(f"file://{tmp_path}/sub/y.json")
    fs.delete(f"file://{tmp_path}/sub")
    assert not fs.exists(f"file://{tmp_path}/sub")


def test_build_resume_query_with_scheme_uri(spark, tmp_path):
    docs = generate_documents_df(spark, 120, seed=7, partitions=4)
    idx = f"file://{tmp_path}/idx"
    build_index(spark, index_dir=idx, cfg=CFG, documents=docs)

    # side files landed under the local mirror of the URI
    local = str(tmp_path / "idx")
    assert os.path.exists(os.path.join(local, "meta", "stats.json"))
    stats = load_stats(idx)
    assert stats["n_docs"] > 0

    # resume: drop one bucket from the commit ledger, rebuild — only that
    # bucket recommits
    fs = IndexFS(idx, spark)
    before = load_commits(fs, idx)
    invalidate_buckets(fs, idx, [3])
    build_index(spark, index_dir=idx, cfg=CFG, documents=docs)
    after = load_commits(fs, idx)
    assert set(after) == set(before)
    for b in before:
        if b != 3:
            assert after[b] == before[b], b

    meta = segments_meta(spark, idx)
    assert meta.count() == CFG.index.term_buckets

    qdf = spark.createDataFrame(fixture_queries()[:5], ["query_id", "query_text"])
    res = bm25_topk_segments(spark, idx, qdf, k=5).collect()
    assert len(res) > 0
