from quickb_spark.sources.jsonarray import (
    read_json_array,
    write_json_array,
    write_jsonl,
)

__all__ = ["read_json_array", "write_json_array", "write_jsonl"]
