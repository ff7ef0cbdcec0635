"""Tied-order-key discipline (round-6 ties-world fuzz class).

A 100-TB event stream carries tied order keys everywhere: bursts logged at
second/minute granularity, values on coarse price points. Any operator that
picks A ROW by an order key (min_by/max_by, row_number→filter, as-of match)
must make the winner a scalar function of the data — i.e. the effective
ordering key must be unique — or Spark and the SQL oracle each pick their
own arbitrary winner.

The production fix (events_ohlc_bars): ordering key is the unique
``struct(ts, event_id)`` on the Spark side and an ordered aggregate
``first/last(value ORDER BY ts, event_id)`` on the DuckDB side. These tests
pin that equivalence on hand-built frames where EVERY timestamp is tied —
the worst case the ties fuzz world manufactures — including the composed
NULL-value mask from the NULL-world class.
"""

import duckdb
import pandas as pd

from pyspark.sql import functions as F


def _duck(df: pd.DataFrame, sql: str):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(sql).df()


def _ohlc_spark(spark, pdf: pd.DataFrame) -> pd.DataFrame:
    sdf = spark.createDataFrame(pdf)
    key = F.when(F.col("value").isNotNull(), F.struct("ts", "event_id"))
    return (
        sdf.groupBy("grp")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max_by("value", key).alias("close"),
        )
        .orderBy("grp")
        .toPandas()
    )


def _ohlc_duck(pdf: pd.DataFrame) -> pd.DataFrame:
    return _duck(
        pdf,
        """
        SELECT grp,
               first(value ORDER BY ts, event_id)
                 FILTER (WHERE value IS NOT NULL) AS open,
               last(value ORDER BY ts, event_id)
                 FILTER (WHERE value IS NOT NULL) AS close
        FROM t GROUP BY grp ORDER BY grp
        """,
    )


def test_open_close_all_timestamps_tied(spark):
    # one bar, every ts identical, values all distinct: the winner must be
    # decided by event_id on BOTH engines (min id opens, max id closes)
    pdf = pd.DataFrame(
        {
            "grp": ["a"] * 5,
            "ts": [100] * 5,
            "event_id": [3, 1, 4, 5, 2],
            "value": [30.0, 10.0, 40.0, 50.0, 20.0],
        }
    )
    s, d = _ohlc_spark(spark, pdf), _ohlc_duck(pdf)
    assert s.loc[0, "open"] == d.loc[0, "open"] == 10.0  # event_id 1
    assert s.loc[0, "close"] == d.loc[0, "close"] == 50.0  # event_id 5


def test_open_close_partial_ties_and_nulls(spark):
    # tied ts at both frame edges + a NULL value sitting AT the earliest
    # (ts, event_id): the NULL mask must skip it on both engines and the
    # tie among the remaining earliest rows must break by event_id
    pdf = pd.DataFrame(
        {
            "grp": ["a"] * 6,
            "ts": [100, 100, 100, 200, 300, 300],
            "event_id": [1, 2, 3, 4, 5, 6],
            "value": [None, 22.0, 11.0, 5.0, 8.0, 9.0],
        }
    )
    s, d = _ohlc_spark(spark, pdf), _ohlc_duck(pdf)
    assert s.loc[0, "open"] == d.loc[0, "open"] == 22.0  # id1 masked, id2 wins
    assert s.loc[0, "close"] == d.loc[0, "close"] == 9.0  # id6 wins the tie


def test_struct_key_merge_safety_across_partitions(spark):
    # min_by with a struct key must merge associatively: the same answer
    # regardless of how rows are split across partitions (the property that
    # makes it safe under shuffle at 1000 executors)
    pdf = pd.DataFrame(
        {
            "grp": ["a"] * 8,
            "ts": [100, 100, 100, 100, 100, 100, 100, 100],
            "event_id": [8, 7, 6, 5, 4, 3, 2, 1],
            "value": [80.0, 70.0, 60.0, 50.0, 40.0, 30.0, 20.0, 10.0],
        }
    )
    for parts in (1, 3, 8):
        sdf = spark.createDataFrame(pdf).repartition(parts)
        row = (
            sdf.groupBy("grp")
            .agg(
                F.min_by("value", F.struct("ts", "event_id")).alias("open"),
                F.max_by("value", F.struct("ts", "event_id")).alias("close"),
            )
            .collect()[0]
        )
        assert (row["open"], row["close"]) == (10.0, 80.0)
