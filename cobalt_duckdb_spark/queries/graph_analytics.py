"""Graph-analytics pack: PageRank centrality over the event-transition
graph. Together with connected components (``operators/graph.py``) this is
the iterative-graph family — the Pregel-shaped driver loops a pipeline runs
for dedup-group resolution, influence ranking, and session-flow analysis.

Semantics pinned as fixed-iteration computations (see
:func:`cobalt_duckdb_spark.operators.graph.pagerank`) so the DuckDB oracle
replays the identical recurrence — differential testing of an iterative
algorithm, which a run-to-convergence formulation would not allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobalt_duckdb_spark.io import load_table
from cobalt_duckdb_spark.operators.graph import pagerank, pagerank_oracle_cte
from cobalt_duckdb_spark.queries import register

_PR_ITERS = 10
_PR_DAMPING = 0.85

_EDGES_CTE = """
edges AS (
    SELECT event_type AS src, next_type AS dst,
           COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS p
    FROM (
        SELECT event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    )
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
)"""


@register(
    "graph_pagerank_event_flow",
    oracle=f"""
    WITH pr AS (
        {pagerank_oracle_cte(_EDGES_CTE.strip(), _PR_ITERS, _PR_DAMPING)}
    )
    SELECT node AS event_type,
           ROUND(rank, 6) AS pagerank,
           CAST(row_number() OVER (ORDER BY rank DESC, node) AS BIGINT)
               AS centrality_rank
    FROM pr
    ORDER BY centrality_rank
    """,
)
def graph_pagerank_event_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the session-flow graph: nodes = event types,
    edge u→v weighted by P(next=v | current=u) from per-user sequences (the
    same first stage as ``events_transition_matrix``). The stationary-ish
    score says which state is most central to user journeys.

    Scale shape: edge extraction is ONE shuffle on user_id (sequence window)
    + a |types|² aggregate; each power step is a join + dst-aggregate with
    both sides hash-partitioned on the key, nothing collected. On a
    billion-node graph the identical loop runs with ``checkpoint_every`` set
    (lineage truncation) — pinned by the connected-components test; here the
    10-step recurrence stays one chained Catalyst plan → a single job."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    nxt = F.lead("event_type").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    edges = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("next_type", nxt)
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    pr = pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMPING, weight="w")
    return pr.select(
        F.col("node").alias("event_type"),
        F.round("rank", 6).alias("pagerank"),
        F.row_number()
        .over(Window.orderBy(F.col("rank").desc(), F.col("node")))
        .cast("bigint")
        .alias("centrality_rank"),
    ).orderBy("centrality_rank")
