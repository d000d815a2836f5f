"""JSON-array source/sink (SURVEY.md §2 S3/S4).

The reference's interchange format is a single JSON file holding a
top-level ARRAY of records: `load_dataset_from_local` rejects anything
that isn't a list (reference src/main.py:168-181), and the chunker stage
saves its results the same way, `json.dump(results, indent=2)`
(src/main.py:253-257). Re-expressed Spark-first:

- `read_json_array`: spark.read.json with multiLine=True parses a
  top-level array into one row per element, fully distributed across
  files; the reference's shape check becomes validate-early column checks
  (corrupt records fail the read instead of silently becoming nulls).
- `write_jsonl`: THE scale sink — one JSON object per line, written by
  every task in parallel. This is what a 100 TB pipeline writes.
- `write_json_array`: byte-compatible with the reference's debug sink
  (one pretty-printed array). A single top-level array is inherently a
  single file, so this collects to the driver and is guarded by a row
  cap — it exists for interchange with reference tooling, not for scale.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_json_array", "write_json_array", "write_jsonl"]


def read_json_array(
    spark: SparkSession,
    path: str,
    required_cols: tuple[str, ...] = (),
    schema: str | None = None,
) -> DataFrame:
    """Load a JSON file whose top level is an ARRAY of records.

    multiLine=True makes Spark treat each FILE as one JSON document (an
    array => one row per element); a directory of such files parallelizes
    across files. FAILFAST surfaces malformed JSON immediately — the
    validate-early analog of the reference's isinstance(list) check.
    """
    reader = spark.read.option("multiLine", "true").option("mode", "FAILFAST")
    if schema:
        reader = reader.schema(schema)
    df = reader.json(path)
    if df.columns == ["_corrupt_record"]:
        raise ValueError(f"expected a JSON array of records in {path}")
    missing = [c for c in required_cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"JSON dataset at {path} is missing required fields {missing}; "
            f"found {df.columns}"
        )
    return df


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Scale sink: JSON Lines, one object per row, written in parallel."""
    df.write.mode(mode).json(path)


def write_json_array(
    df: DataFrame, path: str, indent: int = 2, max_rows: int = 1_000_000
) -> int:
    """Debug/interchange sink matching the reference's json.dump output:
    ONE file, top-level array, pretty-printed, ensure_ascii=False.

    A single top-level array cannot be written task-parallel, so this
    collects to the driver — refuse anything bigger than max_rows rather
    than OOM-ing silently. Returns the number of rows written.
    """
    rows = [r.asDict(recursive=True) for r in df.limit(max_rows + 1).collect()]
    if len(rows) > max_rows:
        raise ValueError(
            f"write_json_array is a debug sink (<= {max_rows} rows); "
            "use write_jsonl for large outputs"
        )
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=indent, ensure_ascii=False)
    return len(rows)
