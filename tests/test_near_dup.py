"""Embedding near-dup dedup: components, reference-greedy walk, LSH pair
recall, and multi-probe ANN."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickb_spark.ops.dedup import (
    connected_components,
    embedding_near_dup_keep,
    embedding_near_dup_pairs,
    greedy_keep_first,
)
from quickb_spark.ops.similarity import lsh_bucketed_topk


def brute_greedy(ids: list[int], pairs: set[tuple[int, int]]) -> dict[int, bool]:
    """The reference walk (deduplicator.py:19-36): drop iff similar to an
    already-kept earlier item."""
    kept: list[int] = []
    out = {}
    for i in sorted(ids):
        if any(((j, i) if j < i else (i, j)) in pairs for j in kept):
            out[i] = False
        else:
            kept.append(i)
            out[i] = True
    return out


def test_components_and_greedy_vs_bruteforce(spark):
    rng = np.random.RandomState(3)
    # random sparse graph over 60 ids in 3 disjoint ranges (forced components)
    pairs = set()
    for base in (0, 100, 200):
        ids = list(range(base, base + 20))
        for _ in range(25):
            a, b = (int(x) for x in rng.choice(ids, 2, replace=False))
            pairs.add((min(a, b), max(a, b)))
    pdf = spark.createDataFrame(sorted(pairs), "id_a long, id_b long")

    comp = {r["id"]: r["comp"] for r in connected_components(pdf).collect()}
    # two ids in different base ranges can never share a component
    for i, ci in comp.items():
        assert ci // 100 == i // 100

    got = {r["id"]: r["keep"] for r in greedy_keep_first(pdf).collect()}
    ids = sorted({i for p in pairs for i in p})
    want = brute_greedy(ids, pairs)
    assert got == want
    # chain case that distinguishes greedy from component-dedup:
    # 1-2, 2-3 (not 1-3): keep 1, drop 2, KEEP 3 (2 was dropped)
    chain = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    cg = {r["id"]: r["keep"] for r in greedy_keep_first(chain).collect()}
    assert cg == {1: True, 2: False, 3: True}


def _clustered_embeddings(n_clusters=8, per=5, dim=16, seed=11):
    rng = np.random.RandomState(seed)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        for j in range(per):
            v = center + rng.standard_normal(dim) * 0.01  # very tight cluster
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return rows


def test_embedding_near_dup_pairs_and_keep(spark):
    rows = _clustered_embeddings()
    df = spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<float>")
    pairs = embedding_near_dup_pairs(
        df, "vec_id", "embedding", dim=16, threshold=0.99, n_planes=8, n_probes=8
    ).collect()
    by_cluster = {r[0]: r[1] for r in [(vid, c) for vid, c, _ in rows]}
    # every found pair is truly intra-cluster (cosine-verified)
    for r in pairs:
        assert by_cluster[r["id_a"]] == by_cluster[r["id_b"]]
    # multi-probe recall: all 10 intra-cluster pairs per cluster found
    assert len(pairs) == 8 * (5 * 4 // 2)

    keep = {r["id"]: r["keep"] for r in embedding_near_dup_keep(
        df, "vec_id", "embedding", dim=16, threshold=0.99, n_planes=8, n_probes=8
    ).collect()}
    assert len(keep) == len(rows)
    # exactly the min id of each cluster survives
    for vid, c, _ in rows:
        assert keep[vid] == (vid % 5 == 0)


def test_multiprobe_ann_recall_improves(spark):
    rows = _clustered_embeddings(n_clusters=12, per=4, dim=16, seed=23)
    df = spark.createDataFrame(rows, "vec_id long, cluster int, embedding array<float>")
    corpus = df.filter(F.col("vec_id") % 4 != 0).select("vec_id", "embedding")
    queries = df.filter(F.col("vec_id") % 4 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def hits(n_probes):
        res = lsh_bucketed_topk(
            corpus, queries, dim=16, k=1, n_planes=8, n_probes=n_probes
        ).collect()
        # the true nearest neighbor is in the same cluster (tight clusters)
        return sum(1 for r in res if r["vec_id"] // 4 == r["query_id"] // 4)

    h1, h4 = hits(1), hits(4)
    assert h4 >= h1
    assert h4 >= 10  # multi-probe finds nearly every cluster neighbor
