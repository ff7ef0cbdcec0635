"""NULL / overflow / domain-edge discipline of the discrete-order-statistic
rewrites (round-6 ADVICE lows).

Three divergence classes, each tested as the raw expression pattern shared
by the production queries (events_winsorized_stats,
events_latency_percentile_rollup, profile_corpus_datacard,
stats_key_skew_profiler, dq_value_drift_psi):

1. Rank windows ordering a NULLable value: Spark defaults to NULLS FIRST
   ascending, DuckDB to NULLS LAST, and COUNT(*) counts NULL rows — so a
   naive ``row_number() OVER (ORDER BY v)`` + ``COUNT(*) OVER ()`` rank
   formula silently shifts every order statistic by the null count on one
   engine only. The fixed pattern (NULLS LAST + COUNT(v)) must match
   DuckDB bit-for-bit and match the percentile-aggregate semantics the
   windows replaced (NULLs skipped).
2. The Gini rank-sum inner product keys_before*m: int64 wraps silently in
   non-ANSI Spark near ~3e9 keys while DuckDB throws. The widened
   DECIMAL(38,0) expression must equal exact Python integer math in the
   overflow regime.
3. PSI log terms over 4dp-rounded shares: ln(0 share) must yield NULL (and
   be skipped by the window SUM) on both engines, never ±Infinity.
"""

import math

import duckdb
import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F


def _duck_df(df: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(sql).df()


# ---------------------------------------------------------------------------
# 1. NULL-safe rank-window order statistics
# ---------------------------------------------------------------------------

# 40 lattice values (2dp cents) + NULLs interleaved. Lattice + non-dyadic
# fractions is exactly the winsorized-stats redraw-fuzz shape.
_VALUES = [round(0.05 * i, 2) for i in range(1, 41)]
_WITH_NULLS = []
for i, v in enumerate(_VALUES):
    _WITH_NULLS.append(v)
    if i % 5 == 0:
        _WITH_NULLS.append(None)


def _spark_rank_stats(spark, values, conds):
    df = spark.createDataFrame(
        [(v,) for v in values], "v double"
    ).repartition(4)
    ranked = df.select(
        "v",
        F.row_number().over(Window.orderBy(F.asc_nulls_last("v"))).alias("rn"),
        F.count("v").over(Window.partitionBy()).alias("nn"),
    )
    aggs = [
        F.min(F.when(F.expr(cond), F.col("v"))).alias(f"s{i}")
        for i, cond in enumerate(conds)
    ]
    row = ranked.agg(*aggs).collect()[0]
    return [row[f"s{i}"] for i in range(len(conds))]


def _duck_rank_stats(values, conds):
    pdf = pd.DataFrame({"v": pd.Series(values, dtype="float64")})
    aggs = ", ".join(
        f"MIN(CASE WHEN {cond.replace('nn', 'n')} THEN v END) AS s{i}"
        for i, cond in enumerate(conds)
    )
    sql = f"""
    WITH ranked AS (
        SELECT v, row_number() OVER (ORDER BY v NULLS LAST) AS rn,
               COUNT(v) OVER () AS n
        FROM t
    )
    SELECT {aggs} FROM ranked
    """.replace("div", "//")
    out = _duck_df(pdf, sql)
    return [out[f"s{i}"][0] for i in range(len(conds))]


_CONDS = [
    "rn = (nn + 99) div 100",        # p01 (winsorized)
    "rn = (nn + 1) div 2",           # p50 (datacard / skew profiler)
    "rn = (9 * nn + 9) div 10",      # p90 (datacard)
    "rn = (19 * nn + 19) div 20",    # p95 (latency rollup)
    "rn = (99 * nn + 99) div 100",   # p99 (everywhere)
]


def test_rank_window_order_statistics_null_safe_cross_engine(spark):
    s = _spark_rank_stats(spark, _WITH_NULLS, _CONDS)
    d = _duck_rank_stats(_WITH_NULLS, _CONDS)
    assert s == d, (s, d)
    # and NULLs must not have shifted anything vs the null-free data
    assert s == _spark_rank_stats(spark, _VALUES, _CONDS)


def test_rank_window_matches_percentile_null_skipping_semantics(spark):
    """The order statistic must be the value at rank ceil(q*n) of the
    NON-NULL values — i.e. what percentile aggregates (which skip NULLs)
    rank over — not of all rows."""
    nonnull = sorted(v for v in _WITH_NULLS if v is not None)
    n = len(nonnull)
    expected = [
        nonnull[math.ceil(0.01 * n) - 1],
        nonnull[math.ceil(0.50 * n) - 1],
        nonnull[math.ceil(0.90 * n) - 1],
        nonnull[math.ceil(0.95 * n) - 1],
        nonnull[math.ceil(0.99 * n) - 1],
    ]
    assert _spark_rank_stats(spark, _WITH_NULLS, _CONDS) == expected


def test_rank_window_all_null_group_yields_null(spark):
    s = _spark_rank_stats(spark, [None, None, None], _CONDS)
    assert s == [None] * len(_CONDS)


# ---------------------------------------------------------------------------
# 2. Gini rank-sum widening past int64
# ---------------------------------------------------------------------------


def test_gini_inner_product_exact_past_int64(spark):
    """keys_before*m at ~3e9 keys exceeds 2^63 per term; the widened
    expression (every factor DECIMAL(38,0) before its multiply, triangular
    term split on parity) must equal exact Python int math where the old
    int64 form wraps."""
    cases = [
        # (cnt, keys_before, m): keys_before*m = 9e18 close to 2^63 wrap,
        # m*(m+1)/2 ~ 4.5e18 — the sum of both crosses 2^63.
        (7, 3_000_000_000, 3_000_000_000),
        # triangular term alone past 2^63: m*(m+1)//2 > 9.22e18
        (1, 0, 4_300_000_000),
        # odd m exercises the ELSE parity branch
        (3, 1_234_567_890, 4_300_000_001),
    ]
    df = spark.createDataFrame(
        cases, "cnt long, keys_before long, m long"
    )
    got = df.agg(
        F.sum(
            F.col("cnt").cast("decimal(38,0)")
            * (
                F.col("keys_before").cast("decimal(38,0)") * F.col("m")
                + F.expr(
                    "CASE WHEN m % 2 = 0"
                    " THEN cast(m div 2 as decimal(38,0)) * (m + 1)"
                    " ELSE cast((m + 1) div 2 as decimal(38,0)) * m END"
                )
            )
        ).alias("s")
    ).collect()[0]["s"]
    expected = sum(
        cnt * (kb * m + m * (m + 1) // 2) for cnt, kb, m in cases
    )
    assert expected > 2**63  # the regime the old int64 inner term wrapped in
    assert int(got) == expected
    # DuckDB HUGEINT twin (the oracle form) agrees
    pdf = pd.DataFrame(cases, columns=["cnt", "keys_before", "m"])
    # fetch as VARCHAR: pandas would round-trip HUGEINT through float64
    d = _duck_df(
        pdf,
        """
        SELECT CAST(SUM(CAST(cnt AS HUGEINT)
                        * (CAST(keys_before AS HUGEINT) * m
                           + CAST(m AS HUGEINT) * (m + 1) // 2))
                    AS VARCHAR) AS s
        FROM t
        """,
    )["s"][0]
    assert int(d) == expected


# ---------------------------------------------------------------------------
# 3. PSI zero-share log guard
# ---------------------------------------------------------------------------


def test_psi_term_zero_rounded_share_is_null_not_infinite(spark):
    """A nonzero share below 5e-5 rounds to 0.0 at 4dp; the guarded term
    must be NULL (and excluded from the total) on both engines instead of
    ±Infinity."""
    rows = [(1, 0.0, 0.3), (2, 0.3, 0.0), (3, 0.7, 0.7)]
    df = spark.createDataFrame(rows, "bin int, p_ref double, p_cur double")
    term = F.when(
        (F.col("p_cur") > 0) & (F.col("p_ref") > 0),
        (F.col("p_cur") - F.col("p_ref"))
        * F.log(F.col("p_cur") / F.col("p_ref")),
    )
    out = (
        df.select(
            "bin",
            F.round(term, 6).alias("psi_term"),
            F.round(F.sum(term).over(Window.partitionBy()), 6).alias(
                "psi_total"
            ),
        )
        .orderBy("bin")
        .collect()
    )
    assert out[0]["psi_term"] is None and out[1]["psi_term"] is None
    assert out[2]["psi_term"] == 0.0
    assert all(r["psi_total"] == 0.0 for r in out)  # NULLs skipped by SUM
    pdf = pd.DataFrame(rows, columns=["bin", "p_ref", "p_cur"])
    d = _duck_df(
        pdf,
        """
        SELECT bin,
               ROUND(CASE WHEN p_cur > 0 AND p_ref > 0
                     THEN (p_cur - p_ref) * ln(p_cur / p_ref) END, 6)
                   AS psi_term,
               ROUND(SUM(CASE WHEN p_cur > 0 AND p_ref > 0
                     THEN (p_cur - p_ref) * ln(p_cur / p_ref) END)
                     OVER (), 6) AS psi_total
        FROM t ORDER BY bin
        """,
    )
    assert pd.isna(d["psi_term"][0]) and pd.isna(d["psi_term"][1])
    assert d["psi_term"][2] == 0.0
    assert (d["psi_total"] == 0.0).all()
