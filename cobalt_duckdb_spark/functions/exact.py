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

Magnitude contract: per-row casts use DECIMAL(18, ``scale``) — the compact
long-backed representation (values up to 10^12 at the default scale=6, far
above any per-row magnitude here) — and Spark's SUM widens the accumulator
to DECIMAL(28, ``scale``) itself (headroom 10^22). The half-away integer
divisions run on DECIMAL(38,0) operands through the exact integral-divide
operator (Spark ``div`` / DuckDB ``//`` on HUGEINT), so they carry NO 2^53
ceiling: only the final QUOTIENT (a rounded mean scaled by 10^dp — small by
construction) must fit an int64. The recipe is magnitude-safe through
DECIMAL(38) sums, i.e. the 100 TB end, without switching types.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default lattice scale: one cast to 1e-6 grid. Chosen so every 2-dp-grid
# input and every product of two 2-dp-grid inputs (1e-4 grid) is represented
# EXACTLY, and finer (truly continuous) inputs are snapped deterministically.
_SCALE = 6
# Oracle-side cast precision (DuckDB SUM widens to DECIMAL(38,s) regardless).
_SUMPREC = 28
# Spark-side PER-ROW cast precision: 18 keeps the compact long-backed Decimal
# representation in the scan/partial-agg hot path (values < 10^12 at scale 6;
# SUM itself widens its accumulator to precision+10 = 28, headroom 10^22).
# Cross-engine safety needs only the same SCALE on both sides — both casts
# round-to-nearest onto the same 10^-scale lattice and ties are impossible
# (a decimal half-way point is not a dyadic rational) — so the Spark and
# oracle precisions may differ.
_ROWPREC = 18


def _dec(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_ROWPREC},{scale})")


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
    """Exact truncating integer division, non-negative a, positive b.

    Runs Spark's integral-divide operator on DECIMAL(38,0) operands —
    exact at ANY operand magnitude (BigDecimal divideToIntegralValue), no
    doubles anywhere. Only the QUOTIENT must fit an int64 (``div`` returns
    LongType); every caller divides a scaled sum by a scaled count, so the
    quotient is a rounded mean/ratio × 10^dp — small by construction.
    ``F.call_function`` keeps the helper composable with arbitrary Column
    inputs (``F.expr`` is text-only)."""
    return F.call_function(
        "div", a.cast("decimal(38,0)"), b.cast("decimal(38,0)")
    )


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
    # s is DECIMAL(28,scale); × 10^scale (precision 7,0) → DECIMAL(36,scale),
    # exact (≤ 38), holding an integer value — cast to (38,0) is lossless.
    # No int64 anywhere on the numerator path, so no 2^53/2^63 ceiling.
    big_n = (s * F.lit(10**scale)).cast("decimal(38,0)")
    # greatest(n,1): the all-NULL-group (n=0) branch is still *evaluated*
    # under F.when — the outer n>0 guard discards the dummy result.
    d = F.greatest(n, F.lit(1)) * F.lit(10 ** (scale - dp))
    m = _trunc_div(2 * F.abs(big_n) + d, 2 * d)
    signed = F.when(big_n < F.lit(0), -m).otherwise(m)
    return F.when(n > 0, signed.cast("double") / F.lit(float(10**dp)))


def exact_round_avg_int(
    col: Column | str, dp: int = 4, unit_scale: int = 0
) -> Column:
    """``ROUND(AVG(col), dp)`` for columns EXACT on a coarse 10^-unit_scale
    lattice (integer-valued counts/quantities at unit_scale=0, cent-valued
    rates/prices at unit_scale=2).

    Same engine-independent half-away-from-zero arithmetic as
    :func:`exact_round_avg`, but the per-row representation is a plain
    BIGINT (``round(col·10^unit_scale)`` — the true value sits within
    ~1e-10 of the lattice point, so nearest-int is identical on both
    engines and ties are impossible) and the accumulator is a compact
    int64 SUM instead of a DECIMAL — measured ~3× cheaper per aggregate on
    scan-shaped queries (q1 A/B, SCALE.md §Round 5). The final division
    runs on DECIMAL(38,0) like the decimal path, so the only magnitude
    contract is the int64 SUM itself: |Σ col|·10^unit_scale < 9.2·10^18
    (e.g. quantities ≤ 50 over 6·10^11 rows at 100 TB: 3·10^13 — fine;
    NOT suitable for dollar-scale columns at extreme row counts — use
    :func:`exact_round_avg` there).
    """
    assert 0 <= unit_scale and 0 < dp
    c = F.col(col) if isinstance(col, str) else col
    iv = F.round(c * F.lit(10**unit_scale), 0).cast("long")
    s = F.sum(iv)
    n = F.count(c)
    num = s.cast("decimal(38,0)") * F.lit(10**dp)
    d = F.greatest(n, F.lit(1)) * F.lit(10**unit_scale)
    m = _trunc_div(2 * F.abs(num) + d, 2 * d)
    signed = F.when(num < F.lit(0), -m).otherwise(m)
    return F.when(n > 0, signed.cast("double") / F.lit(float(10**dp)))


def exact_round_avg_int_sql(
    expr: str, dp: int = 4, unit_scale: int = 0, dialect: str = "duckdb"
) -> str:
    """SQL twin of :func:`exact_round_avg_int` (same lattice, same rounding)."""
    assert 0 <= unit_scale and 0 < dp
    intdiv = {"duckdb": "//", "spark": " div "}[dialect]
    wide = {"duckdb": "HUGEINT", "spark": "DECIMAL(38,0)"}[dialect]
    s = f"SUM(CAST(ROUND(({expr}) * {10 ** unit_scale}, 0) AS BIGINT))"
    num = f"(CAST({s} AS {wide}) * {10 ** dp})"
    d = f"(GREATEST(COUNT({expr}), 1) * {10 ** unit_scale})"
    m = f"((2 * ABS({num}) + {d}) {intdiv} (2 * {d}))"
    return (
        f"(CASE WHEN COUNT({expr}) > 0 THEN"
        f" (CASE WHEN {num} < 0 THEN -{m} ELSE {m} END"
        f" / CAST({10 ** dp} AS DOUBLE)) ELSE NULL END)"
    )


def exact_round_ratio(num: Column, den: Column, dp: int = 4) -> Column:
    """``ROUND(num/den, dp)`` half-away-from-zero for INTEGER-VALUED Columns.

    For post-aggregation rationals (an exact integer sum over an exact
    count, a hit count over a total, …) where the true quotient can sit
    exactly on a 10^-dp half-way point. Pure integer/decimal arithmetic on
    DECIMAL(38,0) operands for BOTH numerator and denominator — no
    magnitude ceiling below 10^33 on either (a product of two 100-TB row
    counts, ~10^24, fits; callers passing such products should build them
    in DECIMAL, e.g. ``a.cast("decimal(38,0)") * b``, so the multiply
    itself cannot overflow int64 upstream). den ≤ 0 yields NULL (NULL den
    propagates) — and the den=0 branch is guarded with GREATEST because a
    caller's enclosing F.when does NOT stop Spark evaluating this
    expression on discarded rows, and ANSI mode would throw on a division
    by zero (same hazard exact_round_avg documents).
    """
    n_scaled = num.cast("decimal(38,0)") * F.lit(10**dp)
    d = den.cast("decimal(38,0)")
    d_safe = F.greatest(d, F.lit(1).cast("decimal(38,0)"))
    m = _trunc_div(2 * F.abs(n_scaled) + d_safe, 2 * d_safe)
    signed = F.when(n_scaled < F.lit(0), -m).otherwise(m)
    return F.when(d > 0, signed.cast("double") / F.lit(float(10**dp)))


def exact_round_ratio_sql(
    num: str, den: str, dp: int = 4, dialect: str = "duckdb"
) -> str:
    """SQL twin of :func:`exact_round_ratio` (integer-valued num/den).

    den ≤ 0 yields NULL via the CASE guard (GREATEST keeps the dead branch
    from dividing by zero — mirrors the Column twin). DuckDB runs the
    half-away division on HUGEINT (int128), Spark-dialect on DECIMAL(38,0)
    through ``div`` — exact at any magnitude on both, like the Column twin;
    the denominator is widened the same way, so count-product denominators
    (up to ~10^33) carry no int64 ceiling."""
    intdiv = {"duckdb": "//", "spark": " div "}[dialect]
    wide = {"duckdb": "HUGEINT", "spark": "DECIMAL(38,0)"}[dialect]
    n_scaled = f"(CAST({num} AS {wide}) * {10**dp})"
    d = f"CAST({den} AS {wide})"
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
    if dialect == "duckdb":
        # DuckDB widens SUM(DECIMAL) to precision 38; narrow to 31 so the
        # ×10^scale multiply fits DuckDB's strict p1+p2 ≤ 38 rule (31+7),
        # then land the integer value in HUGEINT (int128) — the half-away
        # division below is exact at any realistic magnitude.
        big_n = (
            f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL({_SUMPREC},{scale})))"
            f" AS DECIMAL(31,{scale})) * {10 ** scale} AS HUGEINT)"
        )
    else:
        # Spark: per-row DECIMAL(18,s) keeps the compact representation;
        # SUM widens to (28,s); ×10^scale → (36,s), exact; the integer
        # value casts losslessly to DECIMAL(38,0) and `div` is exact.
        big_n = (
            f"CAST(SUM(CAST(({expr}) AS DECIMAL({_ROWPREC},{scale})))"
            f" * {10 ** scale} AS DECIMAL(38,0))"
        )
    d = f"(GREATEST(COUNT({expr}), 1) * {10 ** (scale - dp)})"
    m = f"((2 * ABS({big_n}) + {d}) {intdiv} (2 * {d}))"
    # divisor spelled CAST(... AS DOUBLE): Spark SQL parses a bare `10000.0`
    # literal as DECIMAL(5,1), which would turn the quotient into a decimal
    return (
        f"(CASE WHEN {big_n} < 0 THEN -{m} ELSE {m} END"
        f" / CAST({10 ** dp} AS DOUBLE))"
    )
