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


def test_components_converge_on_long_chain(spark):
    """Pointer doubling: a 120-hop chain must converge well inside the
    iteration cap (min-label alone would need 120 rounds; the old max_iter
    of 25 silently returned unconverged labels for exactly this shape)."""
    n = 121
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["comp"] for r in connected_components(chain).collect()}
    assert comp == {i: 0 for i in range(n)}
    # greedy over the chain: keep evens, drop odds (each odd touches a kept
    # even predecessor; each even's predecessor was dropped)
    cg = {r["id"]: r["keep"] for r in greedy_keep_first(chain).collect()}
    assert cg == {i: (i % 2 == 0) for i in range(n)}


def test_greedy_giant_component_fallback(spark):
    """Components above the edge cap bypass the sequential walk and use
    deterministic keep-min-id; small components in the same call still get
    the exact greedy semantics."""
    # giant: a star 0-(1..40) => 40 edges; cap at 30 forces the fallback.
    # For a star the greedy answer equals keep-min-id, so semantics agree.
    giant = [(0, i) for i in range(1, 41)]
    # small chain 100-101-102: greedy keeps 100 and 102 (NOT keep-min-id,
    # which would keep only 100) — proves the walk path still ran
    small = [(100, 101), (101, 102)]
    pdf = spark.createDataFrame(sorted(giant + small), "id_a long, id_b long")
    got = {r["id"]: r["keep"] for r in greedy_keep_first(pdf, max_component_edges=30).collect()}
    want = {0: True, **{i: False for i in range(1, 41)}, 100: True, 101: False, 102: True}
    assert got == want
    # sanity: without the cap the exact walk gives the same answer here
    got_exact = {r["id"]: r["keep"] for r in greedy_keep_first(pdf).collect()}
    assert got_exact == want


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


def test_margin_probes_beat_fixed_plane_probes(spark):
    """True multi-probe (flip the least-|margin| planes first) must recall
    at least as much as the round-2 scheme (flip arbitrary fixed planes
    0..n_probes-2) at EQUAL probe count, and strictly more on a fixture
    where the straddled plane is usually not plane 0."""
    from quickb_spark.ops.similarity import hyperplane_bucket_udf

    rows = _clustered_embeddings(n_clusters=40, per=2, dim=16, seed=101)
    df = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<float>"
    )
    corpus = df.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    queries = df.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_probes = 2

    def count_hits(res):
        return sum(1 for r in res if r["vec_id"] // 2 == r["query_id"] // 2)

    margin_hits = count_hits(
        lsh_bucketed_topk(
            corpus, queries, dim=16, k=1, n_planes=8, n_probes=n_probes
        ).collect()
    )
    # round-2 behavior, reconstructed: probe own bucket + bucket^(1<<i)
    bucket = hyperplane_bucket_udf(16, 8)
    c = corpus.withColumn("_bucket", bucket(F.col("embedding")))
    probes = F.array_distinct(
        F.array(
            F.col("_qb"),
            *[F.col("_qb").bitwiseXOR(F.lit(1 << i)) for i in range(n_probes - 1)],
        )
    )
    q = queries.select(
        "query_id",
        F.col("embedding").alias("_qv"),
        bucket(F.col("embedding")).alias("_qb"),
    ).select("query_id", "_qv", F.explode(probes).alias("_bucket"))
    from quickb_spark.ops.similarity import cosine_col
    from pyspark.sql.window import Window

    pairs = c.join(F.broadcast(q), "_bucket").select(
        "query_id", "vec_id", cosine_col(F.col("_qv"), F.col("embedding")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    naive_hits = count_hits(
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 1)
        .collect()
    )
    assert margin_hits > naive_hits


def test_prebucketed_param_mismatch_raises(spark):
    from quickb_spark.ops.similarity import bucketize_corpus

    rows = _clustered_embeddings(n_clusters=2, per=2, dim=16, seed=5)
    df = spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<float>"
    )
    pre = bucketize_corpus(df.select("vec_id", "embedding"), dim=16, n_planes=8, seed=7)
    q = df.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="recall would silently collapse"):
        lsh_bucketed_topk(pre, q, dim=16, n_planes=8, seed=42).collect()
    # matching params pass, and the stamp survives a parquet round-trip
    lsh_bucketed_topk(pre, q, dim=16, n_planes=8, seed=7).collect()
