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


@settings(**_HSETTINGS)
@given(
    cents=st.lists(st.integers(-10_000_00, 10_000_00), min_size=1, max_size=24),
    dp=st.sampled_from([2, 3, 4]),
)
def test_exact_round_avg_int_property(spark, cents, dp):
    """The BIGINT cent-lattice mean must agree with the decimal-path mean,
    the DuckDB twin, and the exact integer reference on the same draws the
    decimal property test uses."""
    from cobalt_duckdb_spark.functions.exact import (
        exact_round_avg_int,
        exact_round_avg_int_sql,
    )

    values = [c / 100.0 for c in cents]
    expected = _py_half_away(sum(cents), 100 * len(cents), dp)
    s = _spark(spark, values, exact_round_avg_int(F.col("v"), dp, 2))
    d = _duck(values, exact_round_avg_int_sql("v", dp, 2))
    s_dec = _spark(spark, values, exact_round_avg(F.col("v"), dp))
    assert s == d == s_dec
    assert s == pytest.approx(expected, abs=0), (s, expected, cents, dp)


def test_exact_round_avg_int_integer_values(spark):
    # unit_scale=0: integer-valued column (TPC-H l_quantity). 3 values with
    # mean 7/3 = 2.3333…, and a half-way case 3/2 = 1.5 at dp=0-equivalent
    # grids; NULLs excluded like AVG.
    from cobalt_duckdb_spark.functions.exact import (
        exact_round_avg_int,
        exact_round_avg_int_sql,
    )

    vals = [1.0, 2.0, 4.0, None]
    s = _spark(spark, vals, exact_round_avg_int(F.col("v"), 4, 0))
    d = _duck(vals, exact_round_avg_int_sql("v", 4, 0))
    assert s == d == 2.3333
    vals2 = [1.0, 2.0]  # mean 1.5: 4-dp repr exact, no half-way at dp=4
    assert _spark(spark, vals2, exact_round_avg_int(F.col("v"), 4, 0)) == 1.5


def test_exact_round_avg_wide_operands_beyond_2_53(spark):
    # The half-away division runs on DECIMAL(38,0) operands (Spark `div`,
    # DuckDB HUGEINT `//`), so sums whose micro-unit integer exceeds 2^53
    # must still round EXACTLY. n=2 values summing to 10,000,000,000.01:
    # micro-units N = 1.0000000000001e16 > 2^53, mean 5,000,000,000.005 is
    # an exact 2-dp half-way point -> 5000000000.01 half-away on both
    # engines. A double-based division here could be off by one ulp and
    # flip the digit; the integer reference pins it.
    vals = [10_000_000_000.00, 0.01]
    expected = _py_half_away(1_000_000_000_001, 200, 2)
    assert expected == 5_000_000_000.01
    s = _spark(spark, vals, exact_round_avg(F.col("v"), 2))
    d = _duck(vals, exact_round_avg_sql("v", 2))
    assert s == d == expected, (s, d, expected)


def test_exact_round_ratio_wide_operands_beyond_2_63(spark):
    # num·10^dp beyond even int64: 2^60 over 2^59 at dp=4 scales the
    # numerator to ~1.15e22 — representable only on the DECIMAL/HUGEINT
    # path. Exact quotient 2.0.
    from cobalt_duckdb_spark.functions.exact import (
        exact_round_ratio,
        exact_round_ratio_sql,
    )

    num, den = 2**60, 2**59
    df = spark.createDataFrame([(num, den)], "num long, den long")
    s = df.select(
        exact_round_ratio(F.col("num"), F.col("den"), 4).alias("r")
    ).collect()[0]["r"]
    d = duckdb.sql(
        "SELECT "
        + exact_round_ratio_sql("num", "den", 4)
        + f" AS r FROM (VALUES (CAST({num} AS BIGINT), CAST({den} AS BIGINT))) t(num, den)"
    ).fetchone()[0]
    assert s == d == 2.0, (s, d)


def test_exact_round_ratio_wide_denominator_beyond_2_63(spark):
    # Count-PRODUCT denominators (diff-in-diff cell deltas: 100·n_p·n_q at
    # 100 TB row counts) exceed int64, so den is widened to
    # DECIMAL(38,0)/HUGEINT like num. Exact half-way case at dp=4:
    # num/den = 1.00005 with den = 2e19 > 2^63 — half-away must yield
    # 1.0001 on both engines; a long-typed den would overflow before the
    # division.
    import duckdb

    from cobalt_duckdb_spark.functions.exact import (
        exact_round_ratio,
        exact_round_ratio_sql,
    )

    num, den = 20_001_000_000_000_000_000, 20_000_000_000_000_000_000
    assert den > 2**63
    df = spark.sql(
        f"SELECT CAST('{num}' AS DECIMAL(38,0)) AS num,"
        f" CAST('{den}' AS DECIMAL(38,0)) AS den"
    )
    s = df.select(
        exact_round_ratio(F.col("num"), F.col("den"), 4).alias("r")
    ).collect()[0]["r"]
    d = duckdb.sql(
        "SELECT "
        + exact_round_ratio_sql("num", "den", 4)
        + f" AS r FROM (VALUES (CAST('{num}' AS HUGEINT),"
        f" CAST('{den}' AS HUGEINT))) t(num, den)"
    ).fetchone()[0]
    assert s == d == 1.0001, (s, d)


def test_exact_round_ratio_zero_den_yields_null(spark):
    # den=0 must yield NULL on BOTH engines without an ANSI pmod/div-by-zero
    # error — even when the call sits inside a discarded F.when branch
    # (Spark still evaluates it). Degenerate kappa case: n^2 == E.
    import duckdb

    from cobalt_duckdb_spark.functions.exact import (
        exact_round_ratio,
        exact_round_ratio_sql,
    )

    df = spark.createDataFrame([(7, 0), (7, 4)], "num long, den long")
    out = (
        df.select(
            F.col("den"),
            exact_round_ratio(F.col("num"), F.col("den"), 4).alias("r"),
        )
        .orderBy("den")
        .collect()
    )
    assert out[0]["r"] is None
    assert out[1]["r"] == 1.75
    d = duckdb.sql(
        "SELECT "
        + exact_round_ratio_sql("num", "den", 4)
        + " AS r FROM (VALUES (7, 0), (7, 4)) t(num, den) ORDER BY den"
    ).fetchall()
    assert d[0][0] is None and d[1][0] == 1.75


def test_spark_round_sql_matches_spark_round(spark):
    # Spark rounds the shortest decimal repr (BigDecimal.valueOf, HALF_UP);
    # DuckDB ROUND(double) rounds the binary value. spark_round_sql must
    # replicate Spark exactly — including the adversarial doubles whose
    # shortest repr terminates at dp+1 digits ending in 5 (where plain
    # DuckDB ROUND provably diverges), negatives, tiny scientific-notation
    # magnitudes, the -0.0 normalization, and NULL.
    import duckdb

    from cobalt_duckdb_spark.functions.exact import spark_round_sql

    vals = [
        64.0251005,   # the redraw-fuzz catch (events_ewma_user_value)
        -64.0251005,
        0.0000005,
        -1e-09,       # rounds to -0.0 in raw DuckDB; Spark emits +0.0
        2.6755,
        -2.6755,
        123456.789012345,
        0.1 + 0.2,    # classic non-terminating repr
        38.37875,
        1.0,
        0.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got_spark = [
        r["r"] for r in df.select(F.round("v", 6).alias("r")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT " + spark_round_sql("?::DOUBLE", 6), [v]
        ).fetchone()[0]
        for v in vals
    ]
    assert got_spark == got_duck, list(zip(vals, got_spark, got_duck))
    # sign of zero must agree too (the hash stringifies -0.0 as "-0")
    import math

    for g in got_duck:
        if g == 0.0:
            assert math.copysign(1.0, g) == 1.0
    assert (
        con.execute("SELECT " + spark_round_sql("NULL::DOUBLE", 6)).fetchone()[0]
        is None
    )
