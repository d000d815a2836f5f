from quickb_spark.ops import dedup, similarity, textstats  # noqa: F401
