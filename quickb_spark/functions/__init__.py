from quickb_spark.functions.tokenize import (  # noqa: F401
    term_frequencies_udf,
    tokens_col,
    tokenize_py,
)
