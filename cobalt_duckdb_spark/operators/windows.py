"""Skew-safe windowed aggregation (SURVEY.md §2.5 W2 at scale).

A per-entity window (``partitionBy(user)``) serializes each entity's whole
history through ONE task — the structural casualty the hot-key skew probe
measures (`tools/probe_skew.py`): a key holding 40% of a 100 TB table puts
40% of the work on one core no matter how many executors exist. AQE cannot
split a window partition the way it splits a skewed join.

For BOUNDED RANGE frames the fix is exact: salt the partition with a
bucket of the ordering value and replicate each row into every bucket
whose emitters could need it. Frame width ≤ bucket width ⇒ each row lands
in at most 2 buckets, so the blowup is ≤ 2× rows while a hot key spreads
across as many tasks as it spans buckets.

ROWS frames (e.g. "19 preceding") are deliberately NOT offered here: a
sparse bucket would need to reach arbitrarily far back for its k-row
context, so exact bucketing degenerates to a cascade. Queries with
row-count frames keep the plain window and document their bounded-input
contract instead.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def range_frame_window_bucketed(
    df: DataFrame,
    keys: list[str],
    order: Column,
    lo: int,
    hi: int,
    aggs: Mapping[str, Callable[[WindowSpec], Column]],
    bucket_width: int,
) -> DataFrame:
    """Exact bounded-RANGE-frame window over (keys, order) without a
    per-key serialization point.

    Equivalent to ``agg.over(Window.partitionBy(*keys).orderBy(order)
    .rangeBetween(lo, hi))`` for every entry of ``aggs`` (each a callable
    WindowSpec → Column, e.g. ``lambda w: F.count(F.lit(1)).over(w)``),
    but partitioned on (keys, bucket) where ``bucket = order div
    bucket_width``:

    1. every row EXPLODES into buckets ``bucket(o-hi) … bucket(o-lo)`` —
       exactly the buckets whose emitters' frames ``[o'+lo, o'+hi]`` can
       contain it; with ``bucket_width ≥ hi - lo`` that is ≤ 2 copies, and
       the row's own bucket is always in the range (``lo ≤ 0 ≤ hi``);
    2. the same RANGE frame runs per (keys, bucket) — each original row
       has exactly ONE copy per bucket, so frames see the true global
       content, and rows outside the frame are excluded by the range
       bound as usual;
    3. only each row's own-bucket copy is emitted.

    Requires ``lo ≤ 0 ≤ hi``, ``bucket_width ≥ hi - lo``, and an integral
    (bigint-safe) ``order`` — integer bucket arithmetic avoids the double
    rounding that epoch-microsecond magnitudes would hit.

    Equivalence to the plain window is property-tested on a corpus whose
    hottest key owns half the rows (``tests/test_operators.py``) and by
    the DuckDB oracles of the rewired registry windows."""
    if not (lo <= 0 <= hi):
        raise ValueError(f"frame must straddle the current row, got [{lo}, {hi}]")
    if bucket_width < hi - lo:
        raise ValueError(
            f"bucket_width {bucket_width} < frame width {hi - lo}: frames "
            "would span >2 buckets and context replication would be wrong"
        )
    o = order.cast("bigint")

    def bucket(c: Column) -> Column:
        # floor division, exact on bigints (pmod is non-negative)
        return ((c - F.pmod(c, F.lit(bucket_width))) / bucket_width).cast(
            "bigint"
        )

    tagged = df.withColumn("_o", o).withColumn(
        "_b",
        F.explode(
            F.sequence(bucket(F.col("_o") - hi), bucket(F.col("_o") - lo))
        ),
    )
    w = (
        Window.partitionBy(*keys, "_b")
        .orderBy("_o")
        .rangeBetween(lo, hi)
    )
    out = tagged.select(
        "*", *[fn(w).alias(name) for name, fn in aggs.items()]
    )
    return out.filter(F.col("_b") == bucket(F.col("_o"))).drop("_b", "_o")
