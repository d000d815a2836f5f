from quickb_spark.index.build import (  # noqa: F401
    build_doc_stats,
    build_flat_postings,
    build_term_stats,
)
