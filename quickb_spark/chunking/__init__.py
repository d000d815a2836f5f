from quickb_spark.chunking.splitter import split_document  # noqa: F401
from quickb_spark.chunking.udf import chunk_documents  # noqa: F401
from quickb_spark.chunking.fixed_token import (  # noqa: F401
    fixed_token_chunk_documents,
    split_text_on_token_windows,
)
from quickb_spark.chunking.registry import (  # noqa: F401
    ChunkerRegistry,
    chunk_documents_with,
)
