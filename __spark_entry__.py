"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``cobalt_duckdb_spark.queries`` — the named-query registry is
the real surface; see SURVEY.md §2 for the operator inventory each entry
covers.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cobalt_duckdb_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's canonical cosine top-k, SURVEY.md §2.11)
    on /root/testdata/sf0.001."""
    return _registry.QUERIES["flagship_knn_cosine_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
