"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship end-to-end path (chunk → inverted index →
BM25 top-k) on sf0.001. `queries()` exposes one entry per implemented
operator from SURVEY.md §2; `oracle_sql()` gives each a DuckDB-equivalent
ANSI-SQL string. Rows-only entries (no SQL oracle by nature — recursive /
fixed-token / semantic (cluster-DP, Kamradt-threshold) chunking, simhash,
LSH-ANN, compressed-segment WAND serving, segment-engine exact-phrase
and conjunctive serving (t5_phrase_segments / t6_conjunctive_segments —
their hash-matched declarative twins are t5_phrase_topk /
t6_bm25_conjunctive), resumability lineage, multimodal kernels, greedy
near-dup, seeded split) are covered by the Python/reference-execution
oracles in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quickb_spark import gate, gate_ext


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full engine path (chunk → index → BM25 top-k) at sf0.001."""
    return gate.q_bm25_chunked(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**gate.SPARK_QUERIES, **gate_ext.SPARK_QUERIES_EXT}


def oracle_sql() -> dict[str, str]:
    return {**gate.ORACLE_SQL, **gate_ext.ORACLE_SQL_EXT}
