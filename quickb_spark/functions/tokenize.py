"""Code-aware tokenization — THE term definition (SURVEY.md §2.7 C7).

One spec, three engines: `TOKEN_PATTERN` from quickb_spark.config is applied
to lowercased text identically by

- Spark (JVM-side `regexp_extract_all`, whole-stage codegen — the fast path),
- DuckDB oracles (`regexp_extract_all` in __spark_entry__.oracle_sql), and
- the Python test oracles (`re.findall`).

The reference has no term tokenizer (ChromaDB embeds whole chunks instead,
examples/chromadb_integration.ipynb cell 3); this is the engine-required
replacement mandated by the north star.

Two Spark surfaces:

- `tokens_col`: pure JVM expression, array<string> of tokens in order. Use
  whenever positions aren't needed — stays inside whole-stage codegen.
- `term_frequencies_udf`: Arrow-batched pandas UDF emitting per-document
  (term, tf, positions) structs — MAP-SIDE PRE-AGGREGATION. Emitting one row
  per (doc, term) instead of one per token shrinks the build shuffle by the
  average tf (~3-10× on code) before it ever hits the wire, which is the
  difference between a feasible and an infeasible shuffle at 100 TB.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from quickb_spark.config import TOKEN_PATTERN

__all__ = ["tokens_col", "term_frequencies_udf", "tokenize_py", "TERM_FREQ_SCHEMA"]

_TOKEN_RE = re.compile(TOKEN_PATTERN)

TERM_FREQ_SCHEMA = ArrayType(
    StructType(
        [
            StructField("term", StringType()),
            StructField("tf", IntegerType()),
            StructField("positions", ArrayType(IntegerType())),
        ]
    )
)


def tokens_col(text: Column | str) -> Column:
    """array<string> of tokens, JVM-side (no Python worker involved)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)


def tokenize_py(text: str) -> list[str]:
    """Python-side tokenizer, identical spec (for oracles and kernels)."""
    return _TOKEN_RE.findall(text.lower())


@F.pandas_udf(TERM_FREQ_SCHEMA)
def term_frequencies_udf(text: pd.Series) -> pd.Series:
    """text -> array<struct<term, tf, positions>> with token positions.

    Positions are 0-based token offsets within the document (north-star
    posting tuple is (docID, tf, positions)). Runs per Arrow batch; the
    regex scan is the same C-backed path pandas' str kernels use.
    """
    out = []
    for t in text:
        if not t:
            out.append([])
            continue
        pos: dict[str, list[int]] = defaultdict(list)
        for i, tok in enumerate(_TOKEN_RE.findall(t.lower())):
            pos[tok].append(i)
        out.append([(term, len(p), p) for term, p in pos.items()])
    return pd.Series(out)
