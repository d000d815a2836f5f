"""ir_eval_metrics vs a hand-computed oracle on a tiny fixed case.

Case: 3 queries with positives (q4 has none and must be excluded).
  q1: golden {10, 20};  predictions ranked [10, 99, 20, 98, 97]
  q2: golden {30};      predictions ranked [99, 98, 97, 30, 96]
  q3: golden {40};      predictions ranked [99, 98, 97, 96, 95] (miss)
Hand math (k respects the evaluator definitions, see ops/ireval.py):
  accuracy@1  = (1+0+0)/3
  precision@3 = (2/3 + 0 + 0)/3   (q1 hits at ranks 1 and 3)
  recall@5    = (2/2 + 1/1 + 0)/3
  mrr@10      = (1/1 + 1/4 + 0)/3
  ndcg@10     = ((1/log2(2)+1/log2(4))/(1/log2(2)+1/log2(3))
                 + (1/log2(5))/1 + 0)/3
  map@100     = ((1/1 + 2/3)/2 + (1/4)/1 + 0)/3
"""

from __future__ import annotations

import math

import pytest

from quickb_spark.functions.rounding import grid4  # noqa: F401  (parity helper)
from quickb_spark.ops.ireval import ir_eval_metrics


def g4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000


@pytest.fixture(scope="module")
def result(spark):
    preds = []
    for q, ranked in (
        ("q1", [10, 99, 20, 98, 97]),
        ("q2", [99, 98, 97, 30, 96]),
        ("q3", [99, 98, 97, 96, 95]),
        ("q4", [1, 2, 3]),
    ):
        preds += [(q, r + 1, d) for r, d in enumerate(ranked)]
    golden = [("q1", 10), ("q1", 20), ("q2", 30), ("q3", 40)]
    p = spark.createDataFrame(preds, "query_id string, rank int, doc_id long")
    g = spark.createDataFrame(golden, "query_id string, doc_id long")
    return ir_eval_metrics(p, g).collect()[0].asDict()


def test_counts_and_exclusion(result):
    assert result["n_queries"] == 3  # q4 (no positives) excluded


def test_accuracy_precision_recall(result):
    assert result["accuracy_1"] == g4(1 / 3)
    assert result["accuracy_5"] == g4(2 / 3)
    assert result["precision_3"] == g4((2 / 3) / 3)  # q1 hits at ranks 1 AND 3
    assert result["precision_5"] == g4((2 / 5 + 1 / 5 + 0) / 3)
    assert result["recall_5"] == g4((1 + 1 + 0) / 3)
    assert result["recall_1"] == g4((1 / 2) / 3)


def test_rank_metrics(result):
    assert result["mrr_10"] == g4((1 + 1 / 4) / 3)
    ndcg_q1 = (1 / math.log2(2) + 1 / math.log2(4)) / (
        1 / math.log2(2) + 1 / math.log2(3)
    )
    ndcg_q2 = (1 / math.log2(5)) / (1 / math.log2(2))
    assert result["ndcg_10"] == g4((ndcg_q1 + ndcg_q2) / 3)
    ap_q1 = (1 / 1 + 2 / 3) / 2
    ap_q2 = (1 / 4) / 1
    assert result["map_100"] == g4((ap_q1 + ap_q2) / 3)
