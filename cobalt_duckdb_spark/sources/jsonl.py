"""JSONL (JSON Lines) source/sink — the lingua franca of LLM training
corpora (one JSON document per line; the web-scale pipeline interchange
format alongside Parquet).

Beyond-reference surface (the reference ingests Notion→CSV only): a
training-data pipeline built on this engine needs to land and emit JSONL.

Spark-first design:

- EXPLICIT schema always (same rule as the CSV source, SURVEY.md §1.3:
  schema inference reads the whole input once just to guess types, and
  guesses differently per sample — nondeterministic at scale).
- ``multiLine`` stays False: line-delimited JSON is SPLITTABLE — each
  executor seeks to a newline and parses its byte range independently, so a
  100 TB corpus fans out across every core. A multiline JSON array must be
  parsed by a single task; never ship corpora that way.
- Corrupt lines are quarantined, not dropped: ``PERMISSIVE`` mode +
  ``columnNameOfCorruptRecord`` keeps bad rows with the raw line in a
  ``_corrupt`` column, so the audit query (`dq_integrity_audit` pattern)
  can count and sample them — silent data loss is the cardinal pipeline
  sin.
- Compression: gzip by default for the sink (zstd needs a native Hadoop
  codec this container lacks). Compressed TEXT files are not
  byte-range-splittable — parallelism comes from file granularity instead
  (the writer emits one part file per task), so keep tasks sized so a
  single part file is a sane read unit (~100-500 MB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# documents-table JSONL shape (+ quarantine column)
DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField("_corrupt", StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType = DOCUMENTS_JSONL_SCHEMA
) -> DataFrame:
    """Line-delimited JSON scan with pinned schema and corrupt-row
    quarantine. The returned frame includes the ``_corrupt`` column: NULL
    for clean rows, the raw line for unparseable ones."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def clean_and_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a read_jsonl frame into (clean rows without the quarantine
    column, corrupt raw lines). Callers land the clean side and audit the
    corrupt side — both from ONE materialized scan.

    The parse is persisted first: Spark refuses queries that reference only
    the corrupt-record column of a raw JSON scan
    ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN] — the pushed-down
    pruned scan would skip the very parse that fills it), and persisting is
    what you want anyway — two consumers of one expensive text parse."""
    from pyspark import StorageLevel

    parsed = df.persist(StorageLevel.MEMORY_AND_DISK)
    clean = parsed.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    corrupt = parsed.filter(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return clean, corrupt


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip") -> None:
    """JSONL sink: one JSON object per line, many part files (one per task —
    the parallel-write shape; downstream readers glob the directory)."""
    df.write.mode("overwrite").option("compression", compression).json(path)
