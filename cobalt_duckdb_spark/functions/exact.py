"""Cross-engine-deterministic rounded aggregates (exact-decimal discipline).

Why this module exists — the round-5 boundary-bug class
-------------------------------------------------------

A ``ROUND(SUM(double_col), 2)`` or ``ROUND(AVG(double_col), 4)`` is the
repo's standard float-stabilization idiom, but it has TWO engine-dependent
failure modes that a fresh data draw can expose at any scale factor:

1. **Accumulation order.** A double SUM is non-associative; Spark's
   partial-aggregate tree and DuckDB's sequential scan add in different
   orders, so the totals differ by ulps. When the true total sits within
   that noise of a rounding boundary, the rounded outputs diverge
   (round-4 example: Q9's profit sum, 686823.585, rounded 686823.59 vs
   686823.58).

2. **Half-way rounding procedure.** Even with BIT-IDENTICAL doubles on both
   engines, ``ROUND(double, d)`` disagrees at exact half-way points: Spark
   rounds the double's shortest decimal representation (``38.37875`` →
   38.3788, HALF_UP) while DuckDB rounds the binary value
   (38.3787499999999996… → 38.3787). Exact half-way points are NOT
   measure-zero: the mean of 2-dp values over a group of size 2^a·5^b is an
   exact 4-dp half-way point whenever the cent-sum is odd — for n=8 that is
   HALF of all groups (round-5 example: 307.03/8 = 38.37875 in
   ``events_incremental_rollup_merge``).

The portable recipe, verified identical on Spark 4 and DuckDB:

* double → DECIMAL casts round-to-nearest the SAME double on both engines
  (ties cannot occur at scale ≥ 1: a decimal half-way point ····5·10^-s is
  not a dyadic rational, so no double sits exactly on one);
* DECIMAL addition/SUM is exact and order-independent;
* ``ROUND(DECIMAL, d)`` is half-AWAY-FROM-ZERO on both engines;
* integer division truncates toward zero on both engines (Spark ``div``,
  DuckDB ``//``), so a sign-decomposed ``(2|N| + d) div (2d)`` implements
  half-away-from-zero for rationals N/d without ANY engine rounding of
  doubles.

Each helper ships as a (Spark Column, oracle-SQL fragment) pair so a query
and its DuckDB twin stay mechanically in lockstep.

Magnitude contract: inputs cast to DECIMAL(28, ``scale``); the integer mean
path requires ``|sum| · 10^scale`` and ``2·count·10^(scale-dp)`` to fit an
int64 and stay under 2^53 (exact double division of exact multiples) —
holds through |sum| ≤ 4·10^8 at the default scale=6, far above any test SF;
at the 100 TB end the same recipe widens to DECIMAL(38, s) unchanged, only
the int64 mean path would move to a wider integer type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default lattice scale: one cast to 1e-6 grid. Chosen so every 2-dp-grid
# input and every product of two 2-dp-grid inputs (1e-4 grid) is represented
# EXACTLY, and finer (truly continuous) inputs are snapped deterministically.
_SCALE = 6
_SUMPREC = 28


def _dec(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_SUMPREC},{scale})")


def exact_round_sum(col: Column | str, dp: int, scale: int = _SCALE) -> Column:
    """``ROUND(SUM(col), dp)`` as an order-independent exact aggregate.

    Per-row doubles are snapped to the 10^-scale lattice (identical on both
    engines), summed exactly in DECIMAL, rounded half-away-from-zero in
    DECIMAL (both engines agree), and emitted as the double of that exact
    decimal. Pure Catalyst expressions — stays in whole-stage codegen; the
    partial/final decimal sum is map-side combinable exactly like a double
    sum, so the 100 TB shuffle shape is unchanged.
    """
    assert 0 <= dp <= scale
    return F.round(F.sum(_dec(col, scale)), dp).cast("double")


def exact_round_sum_sql(expr: str, dp: int, scale: int = _SCALE) -> str:
    """DuckDB twin of :func:`exact_round_sum` (same lattice, same rounding)."""
    assert 0 <= dp <= scale
    return (
        f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL({_SUMPREC},{scale}))), {dp})"
        f" AS DOUBLE)"
    )


def _trunc_div(a: Column, b: Column) -> Column:
    """Exact truncating integer division for NON-NEGATIVE int64 a, positive b.

    ``(a - pmod(a,b)) / b``: the numerator is an exact multiple of b, and
    both operands stay below 2^53, so the double division is exact. Avoids
    SQL-text ``div`` so the helper composes with arbitrary Column inputs.
    """
    return ((a - F.pmod(a, b)) / b).cast("long")


def exact_round_avg(
    col: Column | str, dp: int = 4, scale: int = _SCALE
) -> Column:
    """``ROUND(AVG(col), dp)`` with engine-independent half-away-from-zero.

    The mean of lattice values is a rational s/n that can sit EXACTLY on a
    10^-dp half-way point (see module docstring), where double rounding is
    engine-dependent — so the rounded mean is computed without ever rounding
    a double: N = s·10^scale (exact int64), d = n·10^(scale-dp), and
    sign(N) · (2|N| + d) div (2d)  ==  half-away-from-zero(N/d)
    in pure integer arithmetic. NULLs are excluded by both SUM and COUNT
    (matching AVG); an all-NULL group yields NULL.
    """
    assert 0 < dp <= scale
    s = F.sum(_dec(col, scale))
    n = F.count(F.col(col) if isinstance(col, str) else col)
    # Narrow before the power-of-ten multiply so Spark's decimal * stays
    # inside precision 38 and cannot enter precision-loss rounding.
    big_n = (s.cast(f"decimal(20,{scale})") * F.lit(10**scale)).cast("long")
    # greatest(n,1): ANSI mode throws on mod-by-zero and the all-NULL-group
    # (n=0) branch is still *evaluated* under F.when — the outer n>0 guard
    # discards the dummy result.
    d = F.greatest(n, F.lit(1)) * F.lit(10 ** (scale - dp))
    m = _trunc_div(2 * F.abs(big_n) + d, 2 * d)
    signed = F.when(big_n < 0, -m).otherwise(m)
    return F.when(n > 0, signed.cast("double") / F.lit(float(10**dp)))


def exact_round_ratio(num: Column, den: Column, dp: int = 4) -> Column:
    """``ROUND(num/den, dp)`` half-away-from-zero for INTEGER-VALUED Columns.

    For post-aggregation rationals (an exact int64 sum over an exact count,
    a hit count over a total, …) where the true quotient can sit exactly on
    a 10^-dp half-way point. Pure integer arithmetic; |num|·10^dp must stay
    under 2^53. den ≤ 0 yields NULL (NULL den propagates) — and the den=0
    branch is guarded with GREATEST because a caller's enclosing F.when
    does NOT stop Spark evaluating this expression on discarded rows, and
    ANSI mode would throw on the pmod-by-zero (same hazard exact_round_avg
    documents).
    """
    n_scaled = (num.cast("long") * F.lit(10**dp)).cast("long")
    d = den.cast("long")
    d_safe = F.greatest(d, F.lit(1))
    m = _trunc_div(2 * F.abs(n_scaled) + d_safe, 2 * d_safe)
    signed = F.when(n_scaled < 0, -m).otherwise(m)
    return F.when(d > 0, signed.cast("double") / F.lit(float(10**dp)))


def exact_round_ratio_sql(
    num: str, den: str, dp: int = 4, dialect: str = "duckdb"
) -> str:
    """SQL twin of :func:`exact_round_ratio` (integer-valued num/den).

    den ≤ 0 yields NULL via the CASE guard (GREATEST keeps the dead branch
    from dividing by zero — mirrors the Column twin)."""
    intdiv = {"duckdb": "//", "spark": " div "}[dialect]
    n_scaled = f"(CAST({num} AS BIGINT) * {10**dp})"
    d = f"CAST({den} AS BIGINT)"
    d_safe = f"GREATEST({d}, 1)"
    m = f"((2 * ABS({n_scaled}) + {d_safe}) {intdiv} (2 * {d_safe}))"
    return (
        f"(CASE WHEN {d} > 0 THEN"
        f" (CASE WHEN {n_scaled} < 0 THEN -{m} ELSE {m} END"
        f" / CAST({10 ** dp} AS DOUBLE)) ELSE NULL END)"
    )


def spark_round_sql(expr: str, dp: int) -> str:
    """DuckDB twin of Spark's ``ROUND(double, dp)`` for CONTINUOUS doubles.

    Complementary to the exact aggregates above: those make the two
    engines' doubles IDENTICAL (order-independent lattice aggregation);
    this makes the two engines' ROUNDING of an already-identical double
    identical. Spark rounds the double's SHORTEST DECIMAL REPRESENTATION
    (``BigDecimal.valueOf`` → HALF_UP) while DuckDB rounds the binary
    value — they disagree whenever the shortest repr terminates exactly at
    dp+1 digits ending in 5 (measured ~1e-4 per value on smoothing-fold
    outputs; redraw-fuzz caught ``events_ewma_user_value`` twice in six
    seeds). DuckDB's ``CAST(double AS VARCHAR)`` produces the same
    shortest round-trip repr, so parsing it back into a wide DECIMAL and
    rounding half-away-from-zero replicates Spark bit-for-bit — including
    the IEEE -0.0 → +0.0 normalization (decimals have no signed zero).

    Contract: finite inputs with |x| < 1e18 (DECIMAL(38,20)); NULL
    propagates. A shortest repr longer than 20 decimals (|x| < ~1e-4 with
    17 significant digits) is truncated at the cast — a carry from digit
    21 into digit dp+1 would need 20-dp consecutive nines, which is not a
    realizable double pattern at these magnitudes.

    Use for deterministic-by-construction doubles (sequential folds, pure
    IEEE expression chains). For aggregates over lattices use
    exact_round_sum/avg/ratio — rounding procedure parity cannot repair
    accumulation-order divergence.
    """
    assert 0 <= dp <= 18
    return (
        f"CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,20)),"
        f" {dp}) AS DOUBLE)"
    )


def exact_round_avg_sql(
    expr: str, dp: int = 4, scale: int = _SCALE, dialect: str = "duckdb"
) -> str:
    """SQL twin of :func:`exact_round_avg`.

    ``dialect='duckdb'`` (oracle) spells integer division ``//``;
    ``dialect='spark'`` (for spark.sql-text queries) spells it ``div``.
    Both truncate toward zero; the sign decomposition makes both behave as
    half-away-from-zero. GREATEST guards the all-NULL group (COUNT=0): the
    branch is dead under the CASE but still evaluated, and Spark's ANSI
    mode throws on division by zero.
    """
    assert 0 < dp <= scale
    intdiv = {"duckdb": "//", "spark": " div "}[dialect]
    # narrow the decimal sum before the power-of-ten multiply so Spark's
    # decimal * cannot enter its precision-loss path (20+7+1 = 28 <= 38)
    big_n = (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL({_SUMPREC},{scale})))"
        f" AS DECIMAL(20,{scale})) * {10 ** scale} AS BIGINT)"
    )
    d = f"(GREATEST(COUNT({expr}), 1) * {10 ** (scale - dp)})"
    m = f"((2 * ABS({big_n}) + {d}) {intdiv} (2 * {d}))"
    # divisor spelled CAST(... AS DOUBLE): Spark SQL parses a bare `10000.0`
    # literal as DECIMAL(5,1), which would turn the quotient into a decimal
    return (
        f"(CASE WHEN {big_n} < 0 THEN -{m} ELSE {m} END"
        f" / CAST({10 ** dp} AS DOUBLE))"
    )
