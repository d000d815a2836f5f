"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (training-data-pipeline suite).

All pure column expressions (whole-stage codegen, no Python workers), each
with a bit-identical ANSI-SQL oracle in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quickb_spark.config import TOKEN_PATTERN
from quickb_spark.functions.rounding import grid4
from quickb_spark.functions.tokenize import tokens_col
from quickb_spark.ops.dedup import shingles_col

__all__ = [
    "EN_STOPWORDS",
    "lang_id_cols",
    "quality_cols",
    "token_count_cols",
    "fingerprint_bottomk",
]

#: Tiny English marker list for the n-gram/stopword language heuristic.
EN_STOPWORDS = ("the", "of", "and", "to", "in", "is", "over", "for", "with", "a")


def _stopword_hits(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))


def lang_id_cols(text_col: str = "text") -> list[Column]:
    """en_ratio (stopword fraction, 4dp) + lang_guess ∈ {en, unk, empty}."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    ratio = grid4(
        F.when(n > 0, _stopword_hits(toks).cast("double") / n).otherwise(F.lit(0.0))
    )
    guess = (
        F.when(n == 0, F.lit("empty"))
        .when(ratio >= 0.08, F.lit("en"))
        .otherwise(F.lit("unk"))
    )
    return [ratio.alias("en_ratio"), guess.alias("lang_guess")]


def quality_cols(text_col: str = "text") -> list[Column]:
    """Length / punctuation / stopword signals + a composite quality score."""
    txt = F.col(text_col)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(txt)
    punct = F.size(F.regexp_extract_all(txt, F.lit(r"[.!?]"), 0))
    punct_ratio = grid4(
        F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    )
    stop_ratio = grid4(
        F.when(n_tokens > 0, _stopword_hits(toks).cast("double") / n_tokens).otherwise(
            F.lit(0.0)
        )
    )
    mean_tok_len = grid4(
        F.when(
            n_tokens > 0,
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
            )
            / n_tokens,
        ).otherwise(F.lit(0.0))
    )
    quality = grid4(
        F.least(F.lit(1.0), n_tokens.cast("double") / 100.0) * 0.5
        + stop_ratio * 0.3
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 10.0), F.lit(0.2)).otherwise(
            F.lit(0.0)
        )
    )
    return [
        n_chars.alias("n_chars_txt"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        quality.alias("quality"),
    ]


def token_count_cols(text_col: str = "text") -> list[Column]:
    """Whitespace-token and engine-token counts (SURVEY §2 C6/C11 analog)."""
    txt = F.col(text_col)
    ws = F.size(F.regexp_extract_all(txt, F.lit(r"\S+"), 0))
    engine = F.size(F.regexp_extract_all(F.lower(txt), F.lit(TOKEN_PATTERN), 0))
    return [ws.alias("ws_tokens"), engine.alias("engine_tokens")]


def fingerprint_bottomk(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 4
) -> DataFrame:
    """Bottom-k sketch fingerprint: the k lexicographically smallest md5
    digests of a document's distinct 3-gram shingles, concatenated.

    A winnowing-style content fingerprint that is stable under shingle
    reordering and SQL-expressible (rolling-hash winnowing would not be).
    -> (id, fingerprint) for docs with ≥1 shingle.
    """
    sh = df.select(
        F.col(id_col), F.explode(shingles_col(text_col)).alias("shingle")
    ).distinct()
    hashed = sh.select(id_col, F.md5("shingle").alias("h"))
    w = Window.partitionBy(id_col).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(id_col)
        .agg(F.array_join(F.array_sort(F.collect_list("h")), "").alias("fingerprint"))
    )
