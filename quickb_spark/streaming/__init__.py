from quickb_spark.streaming.incremental import (  # noqa: F401
    fold_deltas_into_index,
    query_with_deltas,
    start_incremental_ingest,
)
