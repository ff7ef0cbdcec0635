"""Cross-engine determinism of functions.exact (the round-5 boundary class).

Every case is adversarial: true values sitting EXACTLY on rounding half-way
points, where ``ROUND(double)`` is engine-dependent (Spark rounds the
shortest decimal repr, DuckDB the binary value). The Spark helper and its
DuckDB SQL twin must agree bit-for-bit, under any partitioning.
"""

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from cobalt_duckdb_spark.functions.exact import (
    exact_round_avg,
    exact_round_avg_sql,
    exact_round_sum,
    exact_round_sum_sql,
)

# The round-5 production case: 8 two-dp values summing to 307.03 (odd cent
# sum, n = 8 = 2^3) -> mean exactly 38.37875, a 4-dp half-way point.
ROLLUP_CASE = [14.64, 66.51, 63.10, 39.17, 0.03, 8.76, 15.48, 99.34]


def _duck(values, sql_frag):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": pd.Series(values, dtype="float64")}))
    return con.execute(f"SELECT {sql_frag} AS r FROM t").fetchone()[0]


def _spark(spark, values, col_expr):
    df = spark.createDataFrame(
        [(float(v),) if v is not None else (None,) for v in values], "v double"
    ).repartition(4)
    return df.agg(col_expr.alias("r")).collect()[0]["r"]


@pytest.mark.parametrize(
    "values,dp",
    [
        (ROLLUP_CASE, 4),
        # n=2, odd cent sum: mean x.xx5 at 2 dp and x.xxxx5-free at 4 dp
        ([10.01, 10.02], 2),
        # negative mean at an exact half-way point: -307.03/8 = -38.37875;
        # half-AWAY-from-zero must give -38.3788 on both engines
        ([-v for v in ROLLUP_CASE], 4),
        # n=5 (5^1): 0.03/5 = 0.006 exact; and a tiny half case 0.25/5=0.05
        ([0.01, 0.01, 0.01, 0.01, 0.21], 2),
    ],
)
def test_exact_round_avg_matches_duckdb_at_half_points(spark, values, dp):
    s = _spark(spark, values, exact_round_avg(F.col("v"), dp))
    d = _duck(values, exact_round_avg_sql("v", dp))
    assert s == pytest.approx(d, abs=0), (s, d)


def test_exact_round_avg_half_away_from_zero(spark):
    # 38.37875 -> 38.3788 (up), -38.37875 -> -38.3788 (away from zero)
    up = _spark(spark, ROLLUP_CASE, exact_round_avg(F.col("v"), 4))
    dn = _spark(spark, [-v for v in ROLLUP_CASE], exact_round_avg(F.col("v"), 4))
    assert up == 38.3788
    assert dn == -38.3788


def test_exact_round_avg_ignores_nulls_like_avg(spark):
    vals = ROLLUP_CASE + [None, None]
    s = _spark(spark, vals, exact_round_avg(F.col("v"), 4))
    assert s == 38.3788
    d = _duck(vals, exact_round_avg_sql("v", 4))
    assert s == d


def test_exact_round_avg_all_null_group_is_null(spark):
    s = _spark(spark, [None, None], exact_round_avg(F.col("v"), 4))
    assert s is None
    d = _duck([None, None], exact_round_avg_sql("v", 4))
    assert d is None


@pytest.mark.parametrize(
    "values,dp",
    [
        # exact 2-dp half-way total on the 1e-4 lattice: 0.0050
        ([0.0025, 0.0025], 2),
        ([-0.0025, -0.0025], 2),
        (ROLLUP_CASE, 2),
    ],
)
def test_exact_round_sum_matches_duckdb(spark, values, dp):
    s = _spark(spark, values, exact_round_sum(F.col("v"), dp))
    d = _duck(values, exact_round_sum_sql("v", dp))
    assert s == d, (s, d)


def test_exact_round_sum_partitioning_invariant(spark):
    # 1000 near-cancelling off-grid terms: a double SUM's result depends on
    # partition layout; the decimal sum must not.
    vals = [((-1) ** i) * (i * 0.001 + 0.0001 * (i % 7)) for i in range(1000)]
    df1 = spark.createDataFrame([(v,) for v in vals], "v double").repartition(1)
    df32 = spark.createDataFrame([(v,) for v in vals], "v double").repartition(32)
    r1 = df1.agg(exact_round_sum(F.col("v"), 4).alias("r")).collect()[0]["r"]
    r32 = df32.agg(exact_round_sum(F.col("v"), 4).alias("r")).collect()[0]["r"]
    assert r1 == r32
    assert r1 == _duck(vals, exact_round_sum_sql("v", 4))


def test_grouped_usage_shape(spark):
    # helper composes inside groupBy().agg() beside ordinary aggregates
    df = spark.createDataFrame(
        [("a", v) for v in ROLLUP_CASE] + [("b", 1.0)], "k string, v double"
    )
    out = (
        df.groupBy("k")
        .agg(
            exact_round_avg(F.col("v"), 4).alias("m"),
            F.count("*").alias("n"),
        )
        .orderBy("k")
        .collect()
    )
    assert [r["m"] for r in out] == [38.3788, 1.0]


# --- property-based differential layer (hypothesis) ------------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_HSETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_half_away(num: int, den: int, dp: int) -> float:
    """Independent reference: round-half-away-from-zero of num/den at dp,
    computed with exact integer arithmetic (no floats until the end)."""
    q = 10**dp
    n_scaled, d = num * q, den
    m = (2 * abs(n_scaled) + d) // (2 * d)
    return (-m if n_scaled < 0 else m) / q


@settings(**_HSETTINGS)
@given(
    cents=st.lists(st.integers(-10_000_00, 10_000_00), min_size=1, max_size=24),
    dp=st.sampled_from([2, 3, 4]),
)
def test_exact_round_avg_property(spark, cents, dp):
    """Random 2-dp lattice values (incl. adversarial 2^a·5^b group sizes by
    chance), random dp: Spark helper == DuckDB twin == exact integer
    reference. The reference mean of cents c_i over n is (Σc_i)/(100·n)."""
    values = [c / 100.0 for c in cents]
    expected = _py_half_away(sum(cents) * 10**4, 100 * len(cents) * 10**4, dp)
    s = _spark(spark, values, exact_round_avg(F.col("v"), dp))
    d = _duck(values, exact_round_avg_sql("v", dp))
    assert s == d
    assert s == pytest.approx(expected, abs=0), (s, expected, cents, dp)


@settings(**_HSETTINGS)
@given(
    cents=st.lists(st.integers(-10_000_00, 10_000_00), min_size=1, max_size=24),
    dp=st.sampled_from([2, 3, 4]),
)
def test_exact_round_sum_property(spark, cents, dp):
    values = [c / 100.0 for c in cents]
    # exact integer reference: Σ(c/100) rounded at dp (cents are within the
    # 1e-6 snap lattice, so the snap is the identity)
    expected = _py_half_away(sum(cents) * 10**dp, 100 * 10**dp, dp)
    s = _spark(spark, values, exact_round_sum(F.col("v"), dp))
    d = _duck(values, exact_round_sum_sql("v", dp))
    assert s == d
    assert s == pytest.approx(expected, abs=0), (s, expected, cents, dp)
