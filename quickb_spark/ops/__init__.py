from quickb_spark.ops import dedup, ireval, multimodal, similarity, textstats  # noqa: F401
