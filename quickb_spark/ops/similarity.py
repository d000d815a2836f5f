"""Similarity search over embedding columns (array<float>).

The reference's nearest-neighbor search is ChromaDB's HNSW over sentence
embeddings (examples/chromadb_integration.ipynb cells 7-8). Distributed
re-expression:

- `cosine_topk`: brute-force cosine top-k — the exact baseline. The query
  side is broadcast (queries ≪ corpus), the corpus side is never shuffled;
  per-pair cosine is a pure column expression (zip_with + aggregate, JVM-side).
- `lsh_bucketed_topk`: the scale path — random-hyperplane signs bucket the
  corpus; a query only scans its own bucket (and optionally neighboring
  probes). Recall<1 by construction; exactness verified against brute force
  on the shared buckets in tests.

Hyperplanes are seeded-deterministic so results are stable across runs and
cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType
from pyspark.sql.window import Window

from quickb_spark.functions.rounding import grid

__all__ = [
    "cosine_col",
    "cosine_topk",
    "hyperplane_bucket_udf",
    "bucketize_corpus",
    "lsh_bucketed_topk",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, JVM-side."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, rank, vec_id, cos).

    queries: (query_id, embedding). Query side is broadcast; the corpus scan
    is embarrassingly parallel, followed by a per-query top-k window over
    only the candidate rows.
    """
    q = queries.select(
        F.col("query_id"), F.col(vec_col).alias("_qvec")
    )
    cos = cosine_col(F.col("_qvec"), F.col(vec_col))
    if round_to is not None:
        # grid rounding (floor(x*10^d + 0.5)/10^d), NOT F.round: Spark round
        # goes through BigDecimal's shortest-decimal repr (HALF_UP) and
        # disagrees with DuckDB on decimal halves; rounding happens BEFORE
        # ranking, so a half-point disagreement would also flip tie-breaks.
        cos = grid(cos, round_to)
    pairs = corpus.join(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        cos.alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cos")
    )


def hyperplane_bucket_udf(dim: int, n_planes: int = 8, seed: int = 42):
    """pandas UDF: embedding -> LSH bucket id (sign pattern of n_planes
    random hyperplanes). Vectorized: one matmul per Arrow batch."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf(IntegerType())
    def _bucket(vec: pd.Series) -> pd.Series:
        mat = np.asarray(list(vec), dtype=np.float64)  # (batch, dim)
        signs = (mat @ planes) > 0  # (batch, n_planes)
        return pd.Series(np.packbits(signs, axis=1, bitorder="little")[:, 0].astype(np.int32))

    return _bucket


def bucketize_corpus(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Attach the hyperplane-LSH `_bucket` column. Persist the result
    `df.write.partitionBy("_bucket")` so every later query batch gets
    bucket-partition pruning instead of a full-corpus hash recompute."""
    bucket = hyperplane_bucket_udf(dim, n_planes, seed)
    return corpus.withColumn("_bucket", bucket(F.col(vec_col)))


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's
    hyperplane bucket(s), then exact cosine + window rank. At scale the
    corpus is written bucket-partitioned so a query probes n_probes
    partitions.

    Multi-probe (n_probes > 1): each query ALSO probes the buckets one
    sign-bit away — near neighbors that straddle a hyperplane land exactly
    there, so recall climbs steeply with a few extra probes while scan cost
    stays n_probes/2^n_planes of the corpus (the classic multi-probe LSH
    trade; single-probe recall falls off a cliff for vectors near any
    plane).

    At scale, pre-bucket ONCE with `bucketize_corpus` and persist
    `partitionBy("_bucket")`; a corpus that already carries `_bucket` is
    used as-is here (bucket partition pruning at the scan), instead of
    recomputing the hash per query batch."""
    bucket = hyperplane_bucket_udf(dim, n_planes)
    c = (
        corpus
        if "_bucket" in corpus.columns
        else corpus.withColumn("_bucket", bucket(F.col(vec_col)))
    )
    probes = F.array_distinct(
        F.array(
            F.col("_qbucket"),
            *[
                F.col("_qbucket").bitwiseXOR(F.lit(1 << i))
                for i in range(max(0, min(n_probes - 1, n_planes)))
            ],
        )
    )
    q = (
        queries.select(
            "query_id",
            F.col(vec_col).alias("_qvec"),
            bucket(F.col(vec_col)).alias("_qbucket"),
        )
        .select("query_id", "_qvec", F.explode(probes).alias("_bucket"))
    )
    pairs = c.join(F.broadcast(q), "_bucket").select(
        "query_id",
        F.col(id_col),
        cosine_col(F.col("_qvec"), F.col(vec_col)).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cos")
    )
