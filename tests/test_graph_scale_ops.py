"""Hour-scoped (closed-form) assortativity vs the exact simple-graph
operator (r7 verdict stretch 7).

The closed form never materializes an edge — every Pearson moment over the
hour-scoped multigraph reduces to per-hour aggregates of (a_h, Σdeg,
Σdeg²). These tests pin (1) exact agreement with the edge-materializing
operator on worlds where the two graph semantics coincide (every user
active in at most one hour), (2) hand-computed values on a tiny graph,
(3) the NULL contract on zero-variance graphs, and (4) that the plan
really is join-free below the broadcast hour-size attach.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cobalt_duckdb_spark.operators.graph import hour_scoped_assortativity


def _user_hours(spark, rows):
    return spark.createDataFrame(
        [(u, datetime.datetime(2024, 1, 1, h)) for u, h in rows],
        "user_id bigint, h timestamp",
    )


def test_matches_exact_operator_when_users_single_hour(spark):
    """Every user active in exactly one hour: multigraph == simple graph,
    hour-scoped degree == distinct-partner degree, so the closed form must
    reproduce the exact operator's statistic to the published 4 dp."""
    # hour 0: 4 users, hour 1: 2 users, hour 2: 3 users, hour 3: isolated
    rows = (
        [(i, 0) for i in range(4)]
        + [(10 + i, 1) for i in range(2)]
        + [(20 + i, 2) for i in range(3)]
        + [(99, 3)]
    )
    ua = _user_hours(spark, rows)
    got = hour_scoped_assortativity(ua).collect()[0]

    # exact simple-graph statistic, computed the registered query's way
    a, b = ua.alias("a"), ua.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("u"), F.col("d").alias("dx"))
    db = deg.select(F.col("node").alias("v"), F.col("d").alias("dy"))
    ed = edges.join(da, "u").join(db, "v").select("dx", "dy")
    sym = ed.unionAll(ed.select(F.col("dy").alias("dx"), F.col("dx").alias("dy")))
    m = sym.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
    ).collect()[0]
    n, sx, sxy, sxx = float(m.n), float(m.sx), float(m.sxy), float(m.sxx)
    vx = n * sxx - sx * sx
    expected = round((n * sxy - sx * sx) / vx, 4) if vx > 0 else None

    assert got.degree_assortativity == pytest.approx(expected, abs=1e-4)
    # symmetrized multi-edge count == 2 * simple-edge count on this world
    assert got.n_multi_edges == 2 * edges.count()


def test_hand_computed_two_hour_multigraph(spark):
    """User 1 spans both hours (multigraph semantics visible): hours
    {1,2,3} and {1,4}. deg: 1->3, 2->2, 3->2, 4->1. By hand over the 8
    ordered endpoint pairs: n=8, sx=2*7+1*4=18, sxx=2*17+1*10=44,
    sxy=(49-17)+(16-10)=38; r=(8*38-324)/(8*44-324)=-20/28=-0.714285...
    """
    ua = _user_hours(spark, [(1, 0), (2, 0), (3, 0), (1, 1), (4, 1)])
    got = hour_scoped_assortativity(ua).collect()[0]
    assert got.n_multi_edges == 8  # 3*2 + 2*1 ordered pairs
    assert got.n_hours == 2
    assert got.degree_assortativity == pytest.approx(-0.7143, abs=1e-4)


def test_null_on_zero_variance(spark):
    """A single hour: every endpoint degree equals a_h - 1 (regular
    multigraph), variance 0 -> NULL, mirroring the exact operator's
    contract instead of an ANSI divide-by-zero raise."""
    ua = _user_hours(spark, [(1, 0), (2, 0), (3, 0)])
    got = hour_scoped_assortativity(ua).collect()[0]
    assert got.degree_assortativity is None
    assert got.n_multi_edges == 6

    # empty input: NULL statistic, zero edges — not an error
    empty = _user_hours(spark, []).filter(F.lit(False))
    got = hour_scoped_assortativity(empty).collect()[0]
    assert got.degree_assortativity is None


def test_plan_has_no_pair_join(spark):
    """The scale contract: no self-join on the hour key (the Θ(Σ a_h²)
    edge enumeration the closed form exists to avoid). The only joins are
    the broadcast hour-size attach and the degree attach — both keyed on
    a SINGLE side's rows, never pair-expanding. Assert no CartesianProduct
    and no SortMergeJoin on equal-sized inputs producing pair blowup by
    checking the physical plan contains at most 2 join nodes and at least
    one is a Broadcast join."""
    ua = _user_hours(spark, [(i, i % 3) for i in range(30)])
    plan = hour_scoped_assortativity(ua)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    joins = plan.count("Join")
    assert plan.count("BroadcastHashJoin") >= 1
    # hour-size attach + degree attach only
    assert joins <= 4, plan
