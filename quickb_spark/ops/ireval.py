"""Retrieval-evaluation metrics over (golden, predicted) rankings.

The reference's quality gate is sentence-transformers'
InformationRetrievalEvaluator (reference src/training/train.py:70-76 wires
accuracy/precision/recall@{1,3,5,10}, mrr@10, ndcg@10, map@100; :256-269
logs them). Re-expressed here as pure DataFrame column math — joins,
windows, and aggregates; no Python loops — so it has an exact ANSI-SQL
oracle and runs at any scale.

Metric definitions (binary relevance, matching the evaluator):
- accuracy@k: share of queries with >=1 relevant doc in the top k
- precision@k: mean over queries of (#relevant in top k) / k
- recall@k: mean of (#relevant in top k) / (#relevant total)
- mrr@k: mean of 1/rank of the FIRST relevant hit within k (0 if none)
- ndcg@k: sum of 1/log2(rank+1) over hits in top k, normalized by the
  ideal DCG over min(#relevant, k) positions
- map@k: mean of [sum over hit positions p<=k of (#hits<=p)/p] divided by
  min(#relevant, k)

Queries with no relevant documents are excluded from every mean (the
evaluator only scores queries that have positives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quickb_spark.functions.rounding import grid4

__all__ = ["ir_eval_metrics"]


def _log2(col):
    # F.log2, not log(x)/log(2): matches DuckDB's log2 and math.log2 to the
    # last ULP, which keeps the grid-rounded oracle comparison stable
    return F.log2(col.cast("double"))


def ir_eval_metrics(
    predictions: DataFrame,
    golden: DataFrame,
    ks: tuple[int, ...] = (1, 3, 5, 10),
    mrr_k: int = 10,
    ndcg_k: int = 10,
    map_k: int = 100,
) -> DataFrame:
    """predictions: (query_id, rank, doc_id) with rank starting at 1;
    golden: (query_id, doc_id) relevant pairs. Returns ONE wide row:
    accuracy_k/precision_k/recall_k per k, plus mrr_<k>, ndcg_<k>, map_<k>.

    Scale shape: one broadcast-sized join key space per query, one window
    over each query's k' <= max_k prediction rows, one final global agg —
    no per-query Python, no collect.
    """
    n_rel = golden.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = (
        predictions.join(
            golden.withColumn("rel", F.lit(1)), ["query_id", "doc_id"], "left"
        )
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .join(n_rel, "query_id")  # inner: drops queries without positives
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    hits = hits.withColumn("cum_hits", F.sum("rel").over(w))

    aggs = []
    for k in ks:
        in_k = F.col("rank") <= k
        hits_k = F.sum(F.when(in_k, F.col("rel")).otherwise(F.lit(0)))
        aggs += [
            (hits_k > 0).cast("double").alias(f"_acc_{k}"),
            (hits_k.cast("double") / k).alias(f"_prec_{k}"),
            (hits_k.cast("double") / F.first("n_rel")).alias(f"_rec_{k}"),
        ]
    first_rel = F.min(
        F.when((F.col("rel") == 1) & (F.col("rank") <= mrr_k), F.col("rank"))
    )
    aggs.append(
        F.coalesce(1.0 / first_rel, F.lit(0.0)).alias("_mrr")
    )
    dcg = F.sum(
        F.when(
            (F.col("rel") == 1) & (F.col("rank") <= ndcg_k),
            1.0 / _log2(F.col("rank") + 1),
        ).otherwise(F.lit(0.0))
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.first("n_rel"), F.lit(ndcg_k))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / _log2(i + 1),
    )
    aggs.append((dcg / idcg).alias("_ndcg"))
    ap = F.sum(
        F.when(
            (F.col("rel") == 1) & (F.col("rank") <= map_k),
            F.col("cum_hits").cast("double") / F.col("rank"),
        ).otherwise(F.lit(0.0))
    ) / F.least(F.first("n_rel"), F.lit(map_k)).cast("double")
    aggs.append(ap.alias("_ap"))

    per_q = hits.groupBy("query_id").agg(*aggs)

    final = []
    for k in ks:
        final += [
            grid4(F.avg(f"_acc_{k}")).alias(f"accuracy_{k}"),
            grid4(F.avg(f"_prec_{k}")).alias(f"precision_{k}"),
            grid4(F.avg(f"_rec_{k}")).alias(f"recall_{k}"),
        ]
    final += [
        grid4(F.avg("_mrr")).alias(f"mrr_{mrr_k}"),
        grid4(F.avg("_ndcg")).alias(f"ndcg_{ndcg_k}"),
        grid4(F.avg("_ap")).alias(f"map_{map_k}"),
        F.count(F.lit(1)).alias("n_queries"),
    ]
    return per_q.agg(*final)
