from quickb_spark.query.bm25 import bm25_topk_flat, query_terms, topk_window  # noqa: F401
