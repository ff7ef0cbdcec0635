"""Data-quality constraint checks (lake-operations surface).

Each check returns a violations count/frame rather than throwing — at 100 TB
you quarantine bad rows and keep the pipeline moving; raising on first
violation is the unit-test mode. All checks are joins/aggregates (one
shuffle each, anti joins for referential integrity) so they run at the same
scale as the data they audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_key_count(df: DataFrame, *key_cols: str) -> int:
    """0 iff key_cols is a unique key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )


def null_counts(df: DataFrame, *cols: str) -> dict[str, int]:
    row = df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
            for c in (cols or df.columns)
        ]
    ).head()
    return {c: int(row[c] or 0) for c in (cols or df.columns)}


def orphans(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """Child rows whose foreign key has no parent (anti join — at scale the
    parent key set broadcasts when dimension-sized)."""
    return child.join(parent.select(pk), child[fk] == parent[pk], "left_anti")


def value_range_violations(
    df: DataFrame, col: str, lo: float | None = None, hi: float | None = None
) -> DataFrame:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return df.filter(cond | F.col(col).isNull())
