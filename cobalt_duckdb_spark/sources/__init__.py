from cobalt_duckdb_spark.sources.corpus import (
    CORPUS_SCHEMA,
    read_corpus_csv,
    write_corpus_csv,
    cache_aside,
    paginated_fetch,
)

__all__ = [
    "CORPUS_SCHEMA",
    "read_corpus_csv",
    "write_corpus_csv",
    "cache_aside",
    "paginated_fetch",
]
