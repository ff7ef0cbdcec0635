"""Extended TPC-H-shaped coverage (Q2/Q4/Q12/Q14/Q16/Q19/Q22 adapted to the
testdata's columns — the star schema here has no partsupp/shipmode/commitdate,
so each query keeps the original's OPERATOR shape on the columns that exist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobalt_duckdb_spark.functions.exact import (
    exact_round_avg,
    exact_round_avg_int,
    exact_round_avg_int_sql,
    exact_round_avg_sql,
    exact_round_ratio,
    exact_round_ratio_sql,
    exact_round_sum,
    exact_round_sum_sql,
)
from cobalt_duckdb_spark.io import load_table
from cobalt_duckdb_spark.queries import register


@register(
    "q2_top_supplier_per_nation",
    oracle="""
    SELECT n.n_name AS n_name, s.s_suppkey AS s_suppkey,
           ROUND(s.s_acctbal, 2) AS acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal = (
        SELECT MAX(s2.s_acctbal) FROM supplier s2
        WHERE s2.s_nationkey = s.s_nationkey
    )
    ORDER BY n_name, s_suppkey
    """,
)
def q2_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated-MAX shape: the best supplier per nation (ties kept,
    exactly like the correlated subquery keeps them)."""
    for t in ("supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name AS n_name, s.s_suppkey AS s_suppkey,
               ROUND(s.s_acctbal, 2) AS acctbal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_acctbal = (
            SELECT MAX(s2.s_acctbal) FROM supplier s2
            WHERE s2.s_nationkey = s.s_nationkey
        )
        ORDER BY n_name, s_suppkey
        """
    )


@register(
    "q4_late_order_priority",
    oracle="""
    SELECT o.o_orderpriority AS o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders in a quarter having ≥1 lineitem shipped >30 days
    after order date (EXISTS with a correlated non-equi condition → left-semi
    join with residual predicate)."""
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT o.o_orderpriority AS o_orderpriority,
               COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o.o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q12_case_aggregation",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_quantity >= 25
    GROUP BY 1 ORDER BY ship_year
    """,
)
def q12_case_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's conditional-aggregation shape (SUM over CASE) by ship year."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 25)
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           ROUND(100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                                   THEN l.l_extendedprice * (1 - l.l_discount)
                                   ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1 ORDER BY ship_year
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share per year (ratio of conditional sums;
    broadcast the part dimension)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"))
        .orderBy("ship_year")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    HAVING COUNT(DISTINCT l.l_suppkey) >= 4
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per (brand, type, size) with <> /
    NOT IN literals and a NOT IN subquery (anti join)."""
    for t in ("lineitem", "part", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type NOT IN ('PROMO', 'ECONOMY')
          AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
        HAVING COUNT(DISTINCT l.l_suppkey) >= 4
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


@register(
    "q19_or_of_ands_predicates",
    oracle="""
    SELECT {rev} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 5 AND l.l_quantity <= 25)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 35)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 45)
    """.replace(
        "{rev}",
        exact_round_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 2),
    ),
)
def q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: disjunction of conjunctive band predicates across the join —
    Catalyst pushes the common join key and keeps the OR as a join filter."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    def clause(brand: str, s0: int, s1: int, q0: int, q1: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s0, s1)
            & (F.col("l_quantity") >= q0)
            & (F.col("l_quantity") <= q1)
        )

    cond = (
        clause("Brand#2", 1, 15, 5, 25)
        | clause("Brand#3", 10, 30, 10, 35)
        | clause("Brand#4", 20, 50, 20, 45)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            exact_round_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q22_inactive_wealthy_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT substr(c.c_name, 17, 2) AS cust_prefix,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY 1
    ORDER BY cust_prefix
    """,
)
def q22_inactive_wealthy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average balances (scalar subquery), recently inactive
    (NOT EXISTS → anti join), grouped by a name-derived code."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT substr(c.c_name, 17, 2) AS cust_prefix,
               COUNT(*) AS numcust,
               ROUND(SUM(c.c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
        )
          AND NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1999-01-01'
          )
        GROUP BY 1
        ORDER BY cust_prefix
        """
    )


@register(
    "q10_returned_revenue_by_customer",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, n.n_name AS n_name,
           {rev} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """.replace(
        "{rev}",
        exact_round_sum_sql("l.l_extendedprice * (1 - l.l_discount)", 2),
    ),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top customers by returned-item revenue (4-way join + agg +
    top-k; nation broadcasts, orders date-filter prunes before the join).
    Revenue is a 1e-4-lattice product sum rounded at 2 dp AND the ranking
    key of the LIMIT 20 — the exact decimal path keeps both engines'
    rounded values (hence the top-20 cut itself) identical; a redraw-fuzz
    seed caught the double path flipping …5 boundaries here (SCALE.md
    §Round 5 fuzz)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            exact_round_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c.c_name AS c_name, o.o_orderkey AS o_orderkey,
           o.o_orderdate AS o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice_r,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 120
    )
    GROUP BY 1, 2, 3, 4
    ORDER BY o_totalprice_r DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds a threshold (IN over an
    aggregated subquery → semi join on the fact table's own aggregation)."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_name AS c_name, o.o_orderkey AS o_orderkey,
               o.o_orderdate AS o_orderdate,
               ROUND(o.o_totalprice, 2) AS o_totalprice_r,
               ROUND(SUM(l.l_quantity), 2) AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 120
        )
        GROUP BY 1, 2, 3, 4
        ORDER BY o_totalprice_r DESC, o_orderkey
        LIMIT 20
        """
    )


@register(
    "q7_cross_nation_trade",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           {rev} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    )
    GROUP BY 1, 2, 3
    ORDER BY supp_nation, cust_nation, l_year
    """.replace("{rev}", exact_round_sum_sql("volume", 2)),
)
def q7_cross_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two nations per ship year —
    the two-role dimension pattern (nation joined twice under different
    aliases) with a symmetric pair predicate."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            exact_round_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q15_top_revenue_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {rev} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           r.total_revenue AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """.replace(
        "{rev}", exact_round_sum_sql("l_extendedprice * (1 - l_discount)", 2)
    ),
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the top-revenue supplier of a quarter — CTE reused twice (the
    revenue view + its max), ties kept like the scalar-subquery comparison."""
    for t in ("supplier", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {rev} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
               r.total_revenue AS total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
        """.replace(
            "{rev}",
            exact_round_sum_sql("l_extendedprice * (1 - l_discount)", 2),
        )
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    SELECT s.s_name AS s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late shipper on finished
    multi-supplier orders — correlated EXISTS + NOT EXISTS against the same
    fact table (the decorrelation stress test; 'late' adapted to
    shipdate > orderdate + 60d since the testdata has no receipt/commit
    dates)."""
    for t in ("supplier", "lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT s.s_name AS s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s_name
        """
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT l_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
    )
    GROUP BY l_year
    ORDER BY l_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of a region's purchase volume per year —
    ratio of conditional sums over a 7-way join (two nation roles)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), "n_regionkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("l_year"))
        .agg(F.round(F.sum(target) / F.sum(vol), 6).alias("mkt_share"))
        .orderBy("l_year")
    )


@register(
    "q20_nested_in_supplier_parts",
    oracle="""
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_type = 'PROMO'
        )
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100
    )
    AND s.s_acctbal > 0
    ORDER BY s_suppkey
    """,
)
def q20_nested_in_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN subqueries (suppliers who moved >100 units of
    promo parts) — two levels of semi-join rewriting."""
    for t in ("supplier", "lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name
        FROM supplier s
        WHERE s.s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_type = 'PROMO'
            )
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 100
        )
        AND s.s_acctbal > 0
        ORDER BY s_suppkey
        """
    )


@register(
    "q9_product_profit_by_nation_year",
    oracle="""
    SELECT nation, o_year,
           CAST(ROUND(SUM(CAST(amount AS DECIMAL(28, 10))), 2) AS DOUBLE)
               AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                   - 0.6 * p.p_retailprice * l.l_quantity AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%bolt%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per nation per year for a product family — 5-way
    join with a LIKE filter on the part dimension and a computed margin
    (supplycost adapted to 0.6×retailprice: the testdata has no partsupp).

    Rounding order matters (sf0.1 redraw seed 1010): the per-row amount is
    an identical IEEE double on both engines, its DECIMAL(28,10) snap and
    SUM are exact and identical — but the TRUE amount lives on the 1e-3
    lattice (0.6·retail·qty), so a group sum can end …775, an exact 2-dp
    half-way point. ROUND must therefore run IN DECIMAL (half-away on both
    engines) with the double cast outside; round-after-cast re-enters the
    engine-divergent double-rounding procedure the exact.py recipe exists
    to avoid."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum(F.col("amount").cast("decimal(28,10)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q11_important_part_values",
    oracle="""
    WITH rev AS (
        SELECT l.l_partkey AS l_partkey,
               SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(28, 6))) AS value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(ROUND(value, 2) AS DOUBLE) AS value
    FROM rev
    WHERE CAST(value AS DOUBLE)
          > CAST((SELECT SUM(value) FROM rev) AS DOUBLE) * 0.001
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose revenue within one nation exceeds a fraction
    of that nation's total (HAVING against a scalar subquery over the same
    aggregate — no partsupp in the testdata, so value = lineitem revenue).

    Scale shape: the per-part aggregate is computed ONCE and persisted
    implicitly by reuse under AQE; the global total is a single-row
    aggregate broadcast back (crossJoin(broadcast)) — no second scan-side
    shuffle and no driver round-trip. The fraction threshold is
    scale-invariant (relative, not absolute), so the query's selectivity
    holds at any SF."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    rev = (
        l.join(
            F.broadcast(
                s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
                    "s_suppkey"
                )
            ),
            l.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(
            # exact 1e-4-lattice sums: both the 2-dp rounded output AND the
            # relative-threshold comparison below must not wobble with
            # accumulation order (functions/exact.py discipline)
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            ).alias("value")
        )
    )
    total = rev.agg(
        (F.sum("value").cast("double") * 0.001).alias("cutoff")
    )
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("value").cast("double") > F.col("cutoff"))
        .select(
            "l_partkey", F.round("value", 2).cast("double").alias("value")
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts, with the filter
    INSIDE the outer join's ON clause (customers with zero qualifying orders
    must survive with c_count = 0 — a WHERE would silently drop them).

    Two aggregations, each a single hash shuffle; the second input is one
    row per customer, so the heavy shuffle happens exactly once."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_outer",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12' AND p.p_type = 'PROMO'
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from small-quantity orders of one part family —
    correlated AVG subquery decorrelated into a per-part aggregate joined
    back.

    Scale shape: the per-part average aggregates the FULL lineitem (the
    correlation is against all lineitems of the part, matching the original
    Q17), but only partkeys of the filtered family are needed, so the avg
    input is semi-joined on the broadcast part dimension first — the big
    scan feeds one partial-agg shuffle of filtered keys, never a full-table
    shuffle."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#12") & (F.col("p_type") == "PROMO")
    )
    l = load_table(spark, sf_dir, "lineitem")
    keys = F.broadcast(p.select("p_partkey"))
    part_avg = (
        l.join(keys, l.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.2).alias("qty_cutoff"))
        .withColumnRenamed("l_partkey", "avg_partkey")
    )
    return (
        l.join(keys, l.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(part_avg), l.l_partkey == F.col("avg_partkey")
        )
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Fulfillment lead-time SLA
# ---------------------------------------------------------------------------


@register(
    "orders_fulfillment_leadtime_sla",
    oracle="""
    WITH lt AS (
        SELECT o.o_orderpriority AS priority,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {mean_days} AS mean_days,
           ROUND(quantile_cont(days, 0.9), 4) AS p90_days,
           {sla_rate} AS sla_violation_rate
    FROM lt GROUP BY priority ORDER BY priority
    """.replace("{mean_days}", exact_round_avg_int_sql("days", 4, 0)).replace(
        "{sla_rate}",
        exact_round_ratio_sql(
            "SUM(CASE WHEN days > 90 THEN 1 ELSE 0 END)", "COUNT(*)", 4
        ),
    ),
)
def orders_fulfillment_leadtime_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time per priority class: mean, exact p90, and
    the rate of lines breaching a 90-day SLA — the fulfillment
    scorecard shape (order-date to ship-date is the TPC-H stand-in for
    any request-to-completion latency pair). Priority classes NOT
    differing materially in the synthetic data is itself the audit
    finding: a priority queue that doesn't change delivery distribution
    isn't one.

    Plan: one orderkey-equi join (lineitem⋈orders, both big — shuffle
    join on the key, AQE-sized), one grouped moment+percentile rollup on
    |priorities| groups. Exact p90 swaps to approx_percentile at 1e12
    lines; the SLA-rate columns are plain conditional sums either way."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lt = l.join(o, l.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days"),
    )
    return (
        lt.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            exact_round_avg_int(F.col("days"), 4, 0).alias("mean_days"),
            F.round(F.expr("percentile(days, 0.9)"), 4).alias("p90_days"),
            exact_round_ratio(
                F.sum(F.when(F.col("days") > 90, 1).otherwise(0)),
                F.count(F.lit(1)),
                4,
            ).alias("sla_violation_rate"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Customer value-tier migration matrix
# ---------------------------------------------------------------------------


@register(
    "orders_tier_migration_matrix",
    oracle="""
    WITH halves AS (
        SELECT o_custkey,
               CASE WHEN epoch_us(o_orderdate) <
                        (SELECT quantile_cont(epoch_us(o_orderdate), 0.5)
                         FROM orders)
                    THEN 1 ELSE 2 END AS half,
               SUM(o_totalprice) AS spend
        FROM orders GROUP BY 1, 2
    ),
    tiers AS (
        SELECT o_custkey, half,
               ntile(3) OVER (PARTITION BY half ORDER BY spend, o_custkey)
                   AS tier
        FROM halves
    ),
    wide AS (
        SELECT a.o_custkey, a.tier AS tier_h1, b.tier AS tier_h2
        FROM tiers a JOIN tiers b
          ON a.o_custkey = b.o_custkey AND a.half = 1 AND b.half = 2
    )
    SELECT CAST(tier_h1 AS BIGINT) AS tier_h1,
           CAST(tier_h2 AS BIGINT) AS tier_h2,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(COUNT(*) * 1.0
                 / SUM(COUNT(*)) OVER (PARTITION BY tier_h1), 4) AS row_share
    FROM wide GROUP BY tier_h1, tier_h2 ORDER BY tier_h1, tier_h2
    """,
)
def orders_tier_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-tier MIGRATION matrix: spend terciles computed
    independently in each calendar half (split at the median order date),
    then the 3x3 matrix of how customers move between tiers — the CRM
    churn-vs-upgrade view a static segmentation (`features_customer_rfm`)
    cannot show. Row shares near 1/3 everywhere = tiers are not sticky
    (synthetic spend has no persistence — the A/A reading); a real base
    shows a heavy diagonal. Tercile boundaries use ntile with a
    deterministic (spend, custkey) order so both engines cut identically.

    Plan: per-(customer, half) spend rollup, two ntile windows keyed on
    the half, a self-join on custkey (both sides the compact customer
    frame), one 9-cell matrix aggregate with a row-normalizing window."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "o_orderdate)"
    )
    med = o.agg(F.expr(
        "percentile(timestampdiff(MICROSECOND, "
        "TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate), 0.5)"
    ).alias("m"))
    halves = (
        o.crossJoin(F.broadcast(med))
        .select(
            "o_custkey",
            F.when(us < F.col("m"), 1).otherwise(2).alias("half"),
            "o_totalprice",
        )
        .groupBy("o_custkey", "half")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    tiers = halves.select(
        "o_custkey",
        "half",
        F.ntile(3)
        .over(Window.partitionBy("half").orderBy("spend", "o_custkey"))
        .alias("tier"),
    )
    a = tiers.filter(F.col("half") == 1).select(
        "o_custkey", F.col("tier").alias("tier_h1")
    )
    b = tiers.filter(F.col("half") == 2).select(
        "o_custkey", F.col("tier").alias("tier_h2")
    )
    wide = a.join(b, "o_custkey")
    row = Window.partitionBy("tier_h1")
    return (
        wide.groupBy("tier_h1", "tier_h2")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("tier_h1").cast("bigint").alias("tier_h1"),
            F.col("tier_h2").cast("bigint").alias("tier_h2"),
            F.col("n").cast("bigint").alias("n_customers"),
            F.round(F.col("n") / F.sum("n").over(row), 4).alias("row_share"),
        )
        .orderBy("tier_h1", "tier_h2")
    )


# ---------------------------------------------------------------------------
# Open-order aging report
# ---------------------------------------------------------------------------


@register(
    "orders_open_aging_buckets",
    oracle="""
    WITH as_of AS (SELECT MAX(o_orderdate) AS now_ts FROM orders),
    aged AS (
        SELECT o_orderkey, o_totalprice,
               date_diff('day', o_orderdate, (SELECT now_ts FROM as_of))
                   AS age_days
        FROM orders WHERE o_orderstatus = 'O'
    ),
    bucketed AS (
        SELECT CASE WHEN age_days <= 30 THEN '0-30'
                    WHEN age_days <= 90 THEN '31-90'
                    WHEN age_days <= 365 THEN '91-365'
                    ELSE '365+' END AS age_bucket,
               o_totalprice
        FROM aged
    )
    SELECT age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS open_value,
           ROUND(SUM(o_totalprice) * 100.0
                 / SUM(SUM(o_totalprice)) OVER (), 2) AS pct_value
    FROM bucketed GROUP BY age_bucket ORDER BY age_bucket
    """,
)
def orders_open_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging: orders still in status 'O' bucketed by age at the
    as-of date (max order date stands in for 'now' so the query is frozen
    and differential-testable — the same as-of discipline as
    `dq_freshness_audit`), with order counts and value concentration per
    bucket. The receivables/work-in-progress report every operations
    dashboard carries; the 365+ bucket holding most open value is the
    classic stuck-backlog signal.

    Plan: status filter pushed to the scan, broadcast as-of scalar,
    map-side bucketing, one 4-group rollup with a grand-total window on
    the tiny frame."""
    o = load_table(spark, sf_dir, "orders")
    asof = o.agg(F.max("o_orderdate").alias("now_ts"))
    aged = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(asof))
        .select(
            "o_totalprice",
            F.datediff(
                F.col("now_ts").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("age_days"),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    return (
        aged.select(bucket.alias("age_bucket"), "o_totalprice")
        .groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("open_value"),
        )
        .select(
            "age_bucket",
            "n_orders",
            "open_value",
            F.round(
                F.col("open_value") * 100.0 / F.sum("open_value").over(wall),
                2,
            ).alias("pct_value"),
        )
        .orderBy("age_bucket")
    )


# ---------------------------------------------------------------------------
# Revenue waterfall decomposition
# ---------------------------------------------------------------------------


@register(
    "lineitem_revenue_waterfall",
    oracle="""
    WITH comp AS (
        /* exact decimal sums: every component is a 1e-4/1e-6-lattice
           product rounded at 2 dp downstream — the exact.py class */
        SELECT SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS gross,
               -SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
                   AS discount_effect,
               SUM(CAST(l_extendedprice * (1 - l_discount) * l_tax
                        AS DECIMAL(28,6))) AS tax_effect,
               SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                        AS DECIMAL(28,6))) AS net
        FROM lineitem
    ),
    rows_ AS (
        SELECT 1 AS step, 'gross_revenue' AS component, gross AS amount
        FROM comp
        UNION ALL
        SELECT 2, 'discount', discount_effect FROM comp
        UNION ALL
        SELECT 3, 'tax', tax_effect FROM comp
    )
    SELECT CAST(step AS BIGINT) AS step, component,
           CAST(ROUND(amount, 2) AS DOUBLE) AS amount,
           CAST(ROUND(SUM(amount) OVER (ORDER BY step), 2) AS DOUBLE)
               AS running_total,
           CAST(ROUND((SELECT net FROM comp), 2) AS DOUBLE) AS final_net
    FROM rows_ ORDER BY step
    """,
)
def lineitem_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall: gross -> −discount -> +tax -> net, as the
    step/running-total table a waterfall chart renders — with the
    reconciliation column proving the running total LANDS on the
    independently-computed net (the decomposition identity gross·(1−d) +
    gross·(1−d)·t = net, checked in-query; a mismatch means a component
    was double-counted — the classic waterfall bug). The same one-pass
    conditional-aggregate discipline as `q1_pricing_summary`, presented
    as the reporting shape finance consumes.

    Plan: ONE scan computing all components as parallel aggregates, then
    a 3-row union with a running-sum window. Adding a waterfall step
    adds an aggregate expression, never a scan."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(28,6)")
    comp = l.agg(
        F.sum(dec(F.col("l_extendedprice"))).alias("gross"),
        (-F.sum(dec(F.col("l_extendedprice") * F.col("l_discount")))).alias(
            "discount_effect"
        ),
        F.sum(
            dec(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * F.col("l_tax")
            )
        ).alias("tax_effect"),
        F.sum(
            dec(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            )
        ).alias("net"),
    )
    rows = None
    for step, name, col in (
        (1, "gross_revenue", "gross"),
        (2, "discount", "discount_effect"),
        (3, "tax", "tax_effect"),
    ):
        r = comp.select(
            F.lit(step).alias("step"),
            F.lit(name).alias("component"),
            F.col(col).alias("amount"),
            F.col("net"),
        )
        rows = r if rows is None else rows.unionByName(r)
    run = Window.orderBy("step")
    return rows.select(
        F.col("step").cast("bigint").alias("step"),
        "component",
        F.round("amount", 2).cast("double").alias("amount"),
        F.round(F.sum("amount").over(run), 2).cast("double").alias(
            "running_total"
        ),
        F.round("net", 2).cast("double").alias("final_net"),
    ).orderBy("step")


# ---------------------------------------------------------------------------
# Repeat-purchase interval percentiles
# ---------------------------------------------------------------------------


@register(
    "orders_repurchase_interval",
    oracle="""
    WITH iv AS (
        SELECT o_custkey,
               date_diff('day', lag(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
        FROM orders
    )
    SELECT CAST(COUNT(gap) AS BIGINT) AS n_intervals,
           ROUND(quantile_cont(gap, 0.5), 2) AS p50_days,
           ROUND(quantile_cont(gap, 0.9), 2) AS p90_days,
           {mean_days} AS mean_days
    FROM iv WHERE gap IS NOT NULL
    """.replace("{mean_days}", exact_round_avg_int_sql("gap", 2, 0)),
)
def orders_repurchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cycle: the distribution of day gaps between a
    customer's consecutive orders (p50 = the natural reorder cadence that
    sets replenishment-campaign timing; p90 = the churn-alarm threshold —
    a customer beyond their own p90 cycle is the win-back trigger). The
    inter-PURCHASE sibling of `events_interarrival_burstiness`'s
    inter-event view, on the orders table where money changes hands.

    Plan: one customer-keyed lag window over orders, one exact-percentile
    aggregate; approx swap documented at the usual scale point."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    gap = F.datediff(
        F.col("o_orderdate").cast("date"),
        F.lag(F.col("o_orderdate").cast("date")).over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ),
    )
    iv = o.select(gap.alias("gap")).filter(F.col("gap").isNotNull())
    return iv.agg(
        F.count("gap").cast("bigint").alias("n_intervals"),
        F.round(F.expr("percentile(gap, 0.5)"), 2).alias("p50_days"),
        F.round(F.expr("percentile(gap, 0.9)"), 2).alias("p90_days"),
        exact_round_avg_int(F.col("gap"), 2, 0).alias("mean_days"),
    )
