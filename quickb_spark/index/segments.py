"""Compressed, salted, bucketed index segments — the real index layout.

Build pipeline (SURVEY.md §7 step 3, north-star core):

  chunks ──► flat postings (+doc_len, map-side)               [no shuffle]
         ──► phase 1: shuffle once on (bucket, term) and persist as the
             CHECKPOINT: parquet partitioned by `bucket`       [1 shuffle]
         ──► phase 2: per bucket-wave groupBy(term, salt) + applyInPandas
             encode (delta-gap + varbyte + block-max) → segments parquet
             partitioned by `bucket`; one meta JSON per bucket committed
             AFTER its segment data (write-ahead order = idempotent resume)

Skew (the Zipfian `def`/`import` problem): term df is computed first; terms
with df above the hot threshold get `salt = pmod(xxhash64(doc_id), S)` so no
single groupBy key exceeds df_hot/S postings. Salted sub-lists are re-merged
at query time (quickb_spark.query.wand). AQE cannot fix groupBy skew — this
is deliberate app-level salting, recorded per segment row.

Resumability: phase 1 is one atomic parquet write (its _SUCCESS marker is
the checkpoint). Phase 2 is per-bucket idempotent: a bucket's segment
directory is rewritten wholly, then its meta JSON (with metrics + timings)
is written last; on restart, buckets with committed meta are skipped and
their data is untouched (lineage preserved). `segments_meta()` exposes the
whole build history as a DataFrame (FIXTURES.md §6 shape).

Layout on disk (Iceberg-ready: swap parquet dirs for an Iceberg table with
identity partitioning on `bucket` without touching the logic):

  <index_dir>/flat/bucket=<b>/...          phase-1 checkpoint
  <index_dir>/segments/bucket=<b>/...      encoded posting lists
  <index_dir>/meta/bucket_<b>.json         per-partition lineage + metrics
  <index_dir>/meta/stats.json              corpus scalars (N, avgdl), config
  <index_dir>/doc_stats/...                (doc_id, doc_len) parquet
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from quickb_spark.config import EngineConfig
from quickb_spark.functions.tokenize import term_frequencies_udf
from quickb_spark.index.encode import encode_posting_list

__all__ = ["build_index", "segments_meta", "load_stats", "SEGMENT_SCHEMA"]

SEGMENT_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("salt", IntegerType()),
        StructField("df_part", LongType()),
        StructField("cf_part", LongType()),
        StructField("doc_stream", BinaryType()),
        StructField("tf_stream", BinaryType()),
        StructField("dl_stream", BinaryType()),
        StructField("pos_stream", BinaryType()),
        StructField("block_last_doc", ArrayType(LongType())),
        StructField("block_max_tf", ArrayType(LongType())),
        StructField("block_min_dl", ArrayType(LongType())),
    ]
)


def flat_postings_with_dl(chunks: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf, positions, doc_len) — doc_len computed inside the
    same Arrow batch as tokenization, so no doc_stats join is ever needed
    on the build path."""
    per_doc = chunks.select(
        "doc_id", term_frequencies_udf(F.col(text_col)).alias("tfs")
    ).select(
        "doc_id",
        F.aggregate("tfs", F.lit(0), lambda acc, s: acc + s["tf"]).alias("doc_len"),
        F.explode("tfs").alias("p"),
    )
    return per_doc.select(
        F.col("p.term").alias("term"),
        "doc_id",
        F.col("p.tf").alias("tf"),
        F.col("p.positions").alias("positions"),
        "doc_len",
    )


def _bucket_col(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def _hot_terms(flat: DataFrame, n_docs: int, cfg: EngineConfig) -> DataFrame:
    thresh = max(cfg.index.hot_term_min_df, int(n_docs * cfg.index.hot_term_doc_fraction))
    return (
        flat.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > thresh)
        .select("term")
    )


def _encoder(cfg: EngineConfig):
    block_size = cfg.index.block_size
    store_pos = cfg.index.store_positions

    def encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term, salt = key
        enc = encode_posting_list(
            pdf["doc_id"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["doc_len"].to_numpy(),
            positions=list(pdf["positions"]) if store_pos else None,
            block_size=block_size,
        )
        return pd.DataFrame(
            [
                {
                    "term": term,
                    "salt": int(salt),
                    "df_part": enc["n_docs"],
                    "cf_part": int(pdf["tf"].sum()),
                    "doc_stream": enc["doc_stream"],
                    "tf_stream": enc["tf_stream"],
                    "dl_stream": enc["dl_stream"],
                    "pos_stream": enc["pos_stream"],
                    "block_last_doc": enc["block_last_doc"],
                    "block_max_tf": enc["block_max_tf"],
                    "block_min_dl": enc["block_min_dl"],
                }
            ]
        )

    return encode_group


def _meta_path(index_dir: str, bucket: int) -> str:
    return os.path.join(index_dir, "meta", f"bucket_{bucket:05d}.json")


def build_index(
    spark: SparkSession,
    chunks: DataFrame,
    index_dir: str,
    cfg: EngineConfig | None = None,
    wave_size: int = 64,
) -> None:
    """Build (or resume) the compressed index for a chunks DataFrame."""
    cfg = cfg or EngineConfig()
    nb = cfg.index.term_buckets
    os.makedirs(os.path.join(index_dir, "meta"), exist_ok=True)
    flat_dir = os.path.join(index_dir, "flat")
    stats_path = os.path.join(index_dir, "meta", "stats.json")

    # ---- phase 0+1: one tokenize pass, persisted; THE shuffle ------------
    if not os.path.exists(os.path.join(flat_dir, "_SUCCESS")):
        from pyspark import StorageLevel

        flat = flat_postings_with_dl(chunks).persist(StorageLevel.MEMORY_AND_DISK)
        doc_stats = flat.select("doc_id", "doc_len").distinct()
        doc_stats.write.mode("overwrite").parquet(os.path.join(index_dir, "doc_stats"))
        row = (
            spark.read.parquet(os.path.join(index_dir, "doc_stats"))
            .agg(F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl"))
            .collect()[0]
        )
        n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
        # At 100 TB, df stats would come from a sampled or incremental stats
        # table instead of a second aggregate over the persisted postings.
        hot = _hot_terms(flat, n_docs, cfg)
        salted = (
            flat.join(F.broadcast(hot.withColumn("_hot", F.lit(True))), "term", "left")
            .withColumn(
                "salt",
                F.when(
                    F.col("_hot").isNotNull(),
                    F.pmod(F.xxhash64("doc_id"), F.lit(cfg.index.salt_buckets)).cast(
                        "int"
                    ),
                ).otherwise(F.lit(0)),
            )
            .drop("_hot")
        )
        (
            salted.withColumn("bucket", _bucket_col(F.col("term"), nb))
            .repartition(nb, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(flat_dir)
        )
        flat.unpersist()
        with open(stats_path, "w") as f:
            json.dump(
                {
                    "n_docs": n_docs,
                    "avgdl": avgdl,
                    "term_buckets": nb,
                    "salt_buckets": cfg.index.salt_buckets,
                    "block_size": cfg.index.block_size,
                },
                f,
            )

    # ---- phase 2: per-bucket-wave encode, idempotent, resumable ----------
    pending = [b for b in range(nb) if not os.path.exists(_meta_path(index_dir, b))]
    flat_all = spark.read.parquet(flat_dir)
    encoder = _encoder(cfg)
    segments_dir = os.path.join(index_dir, "segments")
    for wave_start in range(0, len(pending), wave_size):
        wave = pending[wave_start : wave_start + wave_size]
        t0 = time.perf_counter()
        seg = (
            flat_all.filter(F.col("bucket").isin(wave))
            .groupBy("term", "salt")
            .applyInPandas(encoder, SEGMENT_SCHEMA)
            .withColumn("bucket", _bucket_col(F.col("term"), nb))
        )
        # dynamic partition overwrite: only this wave's bucket dirs are
        # replaced, finished buckets are untouched -> idempotent re-runs
        (
            seg.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(segments_dir)
        )
        build_ms = int((time.perf_counter() - t0) * 1000 / max(len(wave), 1))
        for b in wave:
            bdir = os.path.join(segments_dir, f"bucket={b}")
            if os.path.isdir(bdir):
                seg_b = spark.read.parquet(bdir)
                stats = seg_b.agg(
                    F.countDistinct("term").alias("terms"),
                    F.coalesce(F.sum("df_part"), F.lit(0)).alias("postings"),
                    F.coalesce(F.max("salt"), F.lit(0)).alias("max_salt"),
                ).collect()[0]
            else:  # bucket hashed no terms at all
                stats = {"terms": 0, "postings": 0, "max_salt": 0}
            meta = {
                "segment_id": f"seg-{b:05d}",
                "partition_id": b,
                "salt": int(stats["max_salt"]),
                "term_count": int(stats["terms"]),
                "posting_count": int(stats["postings"]),
                "input_rows": int(stats["postings"]),
                "build_time_ms": build_ms,
                "checkpoint_path": f"segments/bucket={b}",
                "status": "done",
                "committed_at": time.time(),
            }
            tmp = _meta_path(index_dir, b) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, _meta_path(index_dir, b))  # atomic commit


def segments_meta(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-partition lineage + metrics as a DataFrame (FIXTURES.md §6)."""
    rows = []
    meta_dir = os.path.join(index_dir, "meta")
    for name in sorted(os.listdir(meta_dir)):
        if name.startswith("bucket_") and name.endswith(".json"):
            with open(os.path.join(meta_dir, name)) as f:
                rows.append(json.load(f))
    schema = (
        "segment_id string, partition_id int, salt int, term_count long, "
        "posting_count long, input_rows long, build_time_ms long, "
        "checkpoint_path string, status string, committed_at double"
    )
    return spark.createDataFrame(rows, schema=schema)


def load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta", "stats.json")) as f:
        return json.load(f)
