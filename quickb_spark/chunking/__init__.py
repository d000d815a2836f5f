from quickb_spark.chunking.splitter import split_document  # noqa: F401
from quickb_spark.chunking.udf import chunk_documents  # noqa: F401
