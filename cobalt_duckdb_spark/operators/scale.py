"""Scale techniques as first-class operators: bucketed co-located joins,
salted skew joins, partitioned layouts with pruning (SURVEY.md §4 /
BASELINE north star "design every operator for 100 TB").

These aren't used by the oracle queries (they're physical-layout tools, not
query semantics); tests/test_scale.py proves each claim at the PLAN level —
bucketing removes the shuffle Exchange, salting splits a hot key, partition
pruning drops files — so the techniques are demonstrably wired, not
aspirational.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table. Two tables
    bucketed identically on their join key co-locate: the sort-merge join
    needs NO shuffle Exchange — at 100 TB this converts every fact⋈fact join
    on the bucket key from a full network shuffle into local merges."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a previously-failed write can leave the managed location behind, which
    # blocks re-creation; clear it explicitly
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    import shutil
    from urllib.parse import urlparse

    loc = os.path.join(urlparse(warehouse).path or warehouse, table_name.lower())
    shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables on the bucket key (shuffle-free)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the skewed LEFT side gets a random salt in
    [0, salt), the (smaller) RIGHT side is replicated across all salt values,
    and the join key becomes (key, salt) — a single hot key now spreads over
    ``salt`` reducers instead of stalling one. AQE's skew-join handles
    moderate skew automatically; explicit salting is for the pathological
    long-tail (one key = 30% of rows) where even a split partition is one
    key's worth of work.

    Correctness: every left row keeps exactly one salt; every right row
    exists under every salt → join multiplicity is unchanged.
    """
    left_s = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    right_s = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = left_s.join(right_s, [on, "_salt"], how)
    return out.drop("_salt")


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Hive-style partitioned Parquet layout: directory per partition value.
    Queries filtering on partition columns read only matching directories
    (partition pruning — visible as PartitionFilters in the scan)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def events_by_day(events: DataFrame) -> DataFrame:
    """Derive the natural partition column for the events stream (daily
    partitions: the standard time-series layout for retention + pruning)."""
    return events.withColumn("event_date", F.to_date("ts"))


def compact_parquet(
    spark: SparkSession, path: str, out_path: str, target_files: int = 8
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (repartition → write). THE recurring maintenance
    job of any streaming-ingested lake — thousands of micro-batch files kill
    scan parallelism bookkeeping and NameNode/metadata servers long before
    they hurt raw IO. Returns the file count written."""
    import glob
    import os

    df = spark.read.parquet(path)
    df.repartition(target_files).write.mode("overwrite").parquet(out_path)
    return len(glob.glob(os.path.join(out_path, "*.parquet")))


def zorder_value(x: "F.Column", y: "F.Column", bits: int = 16) -> "F.Column":
    """Morton/Z-order interleave of two pre-bucketed non-negative ints
    (each < 2**bits) into one locality-preserving sort key — pure Catalyst
    bit math (shiftleft/bitwiseOR), no UDF.

    Why it matters at 100 TB: sorting by (a, b) clusters files tightly on
    ``a`` but leaves every file's ``b`` range global, so predicates on ``b``
    prune nothing. Z-ordering interleaves the bits so EVERY file covers a
    small rectangle of (a, b) space — min/max footer stats then prune scans
    on either column (or both). This is the layout trick behind
    Delta/Iceberg OPTIMIZE ZORDER, expressed as a plain sort key."""
    xb = x.cast("bigint")
    yb = y.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    x_bucket: float,
    y_bucket: float,
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Cluster a table on the Z-curve of two columns and write ``num_files``
    parquet files, each covering a small (x, y) rectangle. Buckets are
    ``value / *_bucket`` (floor), so callers pick resolution; range
    partitioning on the z key balances file sizes even when the space is
    skewed (quantile-based splits), then rows are sorted within each file so
    row-group stats are tight too."""
    zx = F.floor(F.col(x_col) / x_bucket)
    zy = F.floor(F.col(y_col) / y_bucket)
    (
        df.withColumn("_z", zorder_value(zx, zy, bits))
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_balanced_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    size_col: "F.Column | str",
) -> None:
    """Write ``num_shards`` files with BALANCED BYTES, not balanced rows.

    ``repartition(n)`` round-robins rows, so a corpus mixing 100-byte and
    1 MB documents produces shards that differ by whatever the length skew
    is — and downstream training jobs stall on the fattest shard. (Plain
    size-descending round-robin is no better: the k·n-th largest items keep
    landing on the same shard ALONG WITH a full 1/n share of small ones —
    measured 37% over mean on a heavy-tailed fixture.) This assigns shards
    by CUMULATIVE-BYTE RANGE instead: sort by size descending, running byte
    sum, shard = prefix_bytes // (total/n) — every shard holds a contiguous
    ~total/n byte slice, so imbalance is bounded by one max-item, not by
    the tail shape.

    Layout: ``shard=K/`` partition directories, ONE file each (the write
    repartitions on the shard id so each shard's rows sit in one task —
    hash collisions between shard ids only co-locate two shards in a task,
    and partitionBy still splits them into their own directories/files).
    Reading the root recovers ``shard`` as a partition column for free.

    Scale shape: ONE global sort on the size column + ONE running-sum
    window over the same order + a broadcast single-row total; the write
    shuffles on the shard id. For 100 TB, run it per partition-dir (e.g.
    per day) so the sort never spans the whole lake."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    order = Window.orderBy(F.desc(size), F.monotonically_increasing_id())
    prefix = (
        F.sum(size).over(order.rowsBetween(Window.unboundedPreceding, 0)) - size
    )
    tot = df.agg(F.sum(size).cast("double").alias("_total_bytes"))
    shard = F.least(
        F.floor(prefix * num_shards / F.col("_total_bytes")),
        F.lit(num_shards - 1),
    ).cast("int")
    (
        df.crossJoin(F.broadcast(tot))
        .withColumn("shard", shard)
        .drop("_total_bytes")
        .repartition(num_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
