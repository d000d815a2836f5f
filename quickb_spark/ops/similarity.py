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
from pyspark.sql.types import ArrayType, IntegerType
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


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    if n_planes > 30:
        raise ValueError("n_planes must be <= 30 (bucket is a signed int32)")
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes))


def _pack_signs(signs: np.ndarray) -> np.ndarray:
    """(batch, n_planes) bool -> int32 bucket. Little-endian bit i = plane
    i's sign; supports up to 30 planes (np.packbits[:, 0] silently ignored
    planes past 8 — the round-2 latent cap)."""
    b = np.packbits(signs, axis=1, bitorder="little")  # (batch, ceil(p/8))
    out = np.zeros(len(b), dtype=np.int64)
    for byte in range(b.shape[1]):
        out |= b[:, byte].astype(np.int64) << (8 * byte)
    return out.astype(np.int32)


def hyperplane_bucket_udf(dim: int, n_planes: int = 8, seed: int = 42):
    """pandas UDF: embedding -> LSH bucket id (sign pattern of n_planes
    random hyperplanes). Vectorized: one matmul per Arrow batch."""
    planes = _planes(dim, n_planes, seed)

    @F.pandas_udf(IntegerType())
    def _bucket(vec: pd.Series) -> pd.Series:
        mat = np.asarray(list(vec), dtype=np.float64)  # (batch, dim)
        return pd.Series(_pack_signs(mat @ planes > 0))

    return _bucket


def hyperplane_probes_udf(
    dim: int, n_planes: int = 8, n_probes: int = 1, seed: int = 42
):
    """pandas UDF: embedding -> ordered array of n_probes bucket ids:
    the vector's own bucket, then the buckets one sign-flip away in
    ascending |margin| order (true multi-probe LSH, Lv et al. VLDB'07: a
    near neighbor that lands in another bucket most likely differs on the
    hyperplane this vector is CLOSEST to, so probing least-margin planes
    first buys the most recall per probe — measurably better than flipping
    arbitrary fixed planes, see tests/test_near_dup.py)."""
    planes = _planes(dim, n_planes, seed)
    n_flips = max(0, min(n_probes - 1, n_planes))

    @F.pandas_udf(ArrayType(IntegerType()))
    def _probes(vec: pd.Series) -> pd.Series:
        mat = np.asarray(list(vec), dtype=np.float64)  # (batch, dim)
        proj = mat @ planes
        base = _pack_signs(proj > 0)
        # |proj| ∝ distance to each hyperplane; flip closest planes first
        order = np.argsort(np.abs(proj), axis=1, kind="stable")[:, :n_flips]
        flips = base[:, None] ^ (1 << order.astype(np.int32))
        return pd.Series(
            [np.concatenate(([b], f)).astype(np.int32) for b, f in zip(base, flips)]
        )

    return _probes


#: schema-metadata keys stamped on the `_bucket` column by bucketize_corpus
#: (survive parquet round-trips) so a pre-bucketed corpus can be validated
#: against the query-side hash parameters instead of silently collapsing
#: recall on a mismatch.
_BUCKET_META = ("qkb_lsh_dim", "qkb_lsh_n_planes", "qkb_lsh_seed")


def bucketize_corpus(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Attach the hyperplane-LSH `_bucket` column, stamped with its
    (dim, n_planes, seed) as column metadata. Persist the result
    `df.write.partitionBy("_bucket")` so every later query batch gets
    bucket-partition pruning instead of a full-corpus hash recompute."""
    bucket = hyperplane_bucket_udf(dim, n_planes, seed)
    meta = dict(zip(_BUCKET_META, (dim, n_planes, seed)))
    return corpus.withColumn(
        "_bucket", bucket(F.col(vec_col)).alias("_bucket", metadata=meta)
    )


def _validate_bucket_params(
    corpus: DataFrame, dim: int, n_planes: int, seed: int
) -> None:
    meta = corpus.schema["_bucket"].metadata or {}
    if not any(k in meta for k in _BUCKET_META):
        return  # externally bucketed: caller owns parameter consistency
    got = tuple(int(meta.get(k, -1)) for k in _BUCKET_META)
    want = (dim, n_planes, seed)
    if got != want:
        raise ValueError(
            f"pre-bucketed corpus was hashed with (dim, n_planes, seed)="
            f"{got} but the query side uses {want} — recall would silently "
            "collapse; re-bucketize or pass matching parameters"
        )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's
    hyperplane bucket(s), then exact cosine + window rank. At scale the
    corpus is written bucket-partitioned so a query probes n_probes
    partitions.

    Multi-probe (n_probes > 1): each query ALSO probes the buckets one
    sign-flip away, in ascending hyperplane-|margin| order — a neighbor
    that straddles a plane most likely straddles the one this query is
    closest to, so least-margin probes buy the most recall per probe while
    scan cost stays n_probes/2^n_planes of the corpus.

    At scale, pre-bucket ONCE with `bucketize_corpus` and persist
    `partitionBy("_bucket")`; a corpus that already carries `_bucket` is
    used as-is here (bucket partition pruning at the scan) after its
    stamped (dim, n_planes, seed) metadata is validated against this
    call's parameters — a silent mismatch would collapse recall to ~0."""
    c = (
        corpus
        if "_bucket" in corpus.columns
        else bucketize_corpus(corpus, dim, n_planes, vec_col, seed)
    )
    if "_bucket" in corpus.columns:
        _validate_bucket_params(corpus, dim, n_planes, seed)
    probes = hyperplane_probes_udf(dim, n_planes, n_probes, seed)
    q = queries.select(
        "query_id",
        F.col(vec_col).alias("_qvec"),
        F.explode(probes(F.col(vec_col))).alias("_bucket"),
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
