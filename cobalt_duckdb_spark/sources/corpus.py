"""Ingest sources/sinks (SURVEY.md §2.1 S1-S7).

The reference's ingest pipeline is: paginated Notion REST scan (100
rows/request cursor loop, ``/root/reference/model/data/notion_db.py:28-55``)
→ markdown cleanup → pandas frame → CSV cache-aside
(``notion_db.py:175-211``: fetch only when the cache file is missing or
``refetch`` is set).

Spark-first translation:
- CSV with EXPLICIT schema + multiLine + escaping (corpus content embeds
  newlines; schema inference is nondeterministic at scale — SURVEY.md §1.3);
- cache-aside materializes to Parquet, not CSV (columnar, splittable,
  predicate-pushdown-able — BASELINE.json "spark_approach");
- the remote scan is a driver-side cursor loop feeding createDataFrame in
  page batches: remote APIs are inherently serial-paginated, so the
  parallelism boundary is AFTER landing (Spark 4's DataSource API could
  split on cursor ranges when the service supports it).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# explicit (not fromDDL: that needs a live SparkContext at import time)
CORPUS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("title", StringType()),
        StructField("content", StringType()),
    ]
)


def read_corpus_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: CSV scan with pinned schema (never inferred), multiline content."""
    return (
        spark.read.schema(CORPUS_SCHEMA)
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )


def write_corpus_csv(df: DataFrame, path: str) -> None:
    """S2: CSV sink (header, quoted). The reference writes a single pandas
    CSV (``notion_db.py:205``); Spark writes a directory of part files —
    readers glob it transparently."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .option("quoteAll", True)
        .csv(path)
    )


def cache_aside(
    spark: SparkSession,
    cache_path: str,
    fetch: Callable[[SparkSession], DataFrame],
    refetch: bool = False,
) -> DataFrame:
    """S6: idempotent materialization — fetch + write Parquet only when the
    cache is missing (or ``refetch``), else read the cache. Mirrors
    ``fetch_sakurap_corpus`` (``notion_db.py:175-211``, guard at ``:193``)."""
    exists = os.path.exists(os.path.join(cache_path, "_SUCCESS"))
    if refetch or not exists:
        fetch(spark).write.mode("overwrite").parquet(cache_path)
    return spark.read.parquet(cache_path)


def paginated_fetch(
    spark: SparkSession,
    fetch_page: Callable[[str | None], tuple[list[dict], str | None]],
    schema: StructType,
    page_size_hint: int = 100,
) -> DataFrame:
    """S3: cursor-paginated remote scan → DataFrame.

    ``fetch_page(cursor) -> (rows, next_cursor_or_None)`` abstracts the
    reference's ``has_more``/``next_cursor`` loop (``notion_db.py:39-53``).
    Pages accumulate in batches and land via createDataFrame (Arrow path);
    the result should immediately be cache_aside'd to Parquet — remote scans
    are the one place this engine is driver-serial by nature."""

    def pages() -> Iterator[list[dict]]:
        cursor: str | None = None
        while True:
            rows, cursor = fetch_page(cursor)
            if rows:
                yield rows
            if cursor is None:
                return

    all_rows: list[dict] = []
    for batch in pages():
        all_rows.extend(batch)
    return spark.createDataFrame(all_rows, schema=schema)


def markdown_cleaned_corpus(raw: DataFrame, text_col: str = "content") -> DataFrame:
    """S5: the reference's per-page markdown cleanup applied relationally
    (``notion_db.py:159-161``) — a column expression, not a Python loop."""
    from cobalt_duckdb_spark.functions.text import markdown_cleanup

    return raw.withColumn(text_col, markdown_cleanup(text_col))
