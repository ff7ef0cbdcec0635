"""Columnar interchange formats beyond Parquet: ORC (and the option surface
that matters for them at scale).

The reference reads/writes its corpus through pandas CSV/in-memory frames
(/root/reference/model/*); a lake-scale engine additionally meets ORC on
ingest (Hive-era lakes, Trino/Presto exports) and must write it back with
the same predicate-pushdown/column-pruning guarantees Parquet gets. Spark's
ORC support is built-in (native vectorized reader) — this module pins the
repo's conventions:

- **Zlib compression** (ORC's widely-compatible default; snappy also fine).
- **Sinks never coalesce(1)**: one file per task is the scalable layout;
  the single-file convenience path exists only for tiny exports.
- Pushdown parity with Parquet is asserted in tests/test_sources.py: the
  physical scan shows PushedFilters + pruned ReadSchema for ORC too
  (spark.sql.orc.filterPushdown is on by default in Spark 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — native vectorized reader; filters/pruning push into the
    scan exactly as with Parquet (asserted in tests)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "zlib") -> None:
    """ORC sink, one file per task (no repartition(1) — the write
    parallelism IS the task parallelism; small-file compaction is a separate
    explicit op, operators/scale.py)."""
    df.write.mode("overwrite").option("compression", compression).orc(path)
