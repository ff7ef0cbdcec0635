from cobalt_duckdb_spark.functions.vector import (
    dot_product,
    l2_norm,
    cosine_similarity,
    cosine_distance,
    l2_normalize,
)

__all__ = [
    "dot_product",
    "l2_norm",
    "cosine_similarity",
    "cosine_distance",
    "l2_normalize",
]
