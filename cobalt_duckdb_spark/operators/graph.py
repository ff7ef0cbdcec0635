"""Connected components over near-duplicate pair graphs (dedup-group
resolution — the step that turns pairwise similarity output into the
keep/drop decision a training pipeline actually executes).

Algorithm: iterative min-label propagation. Every vertex starts labeled with
its own id; each round every vertex takes the min of its label and its
neighbors' labels; fixpoint = each vertex labeled with its component's
minimum id (the canonical representative). Rounds needed = graph diameter —
for near-dup graphs that's tiny (pairs/triples), and each round is one
join + one aggregate, both shuffling on vertex id. The driver-side loop is
the standard Pregel-without-Pregel shape (GraphFrames does the same under
the hood); convergence is checked with a count, not by materializing
labels on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iterations: int = 20,
) -> DataFrame:
    """(vertex, component) — component = min vertex id reachable. Only
    vertices appearing in ``edges`` are returned (isolated docs are their own
    trivial groups and need no resolution)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    # Iterative loops MUST truncate lineage: without it each round nests the
    # previous round's plan, and by ~10 iterations plan compilation alone
    # OOMs the JVM (observed on a 12-vertex path graph). localCheckpoint
    # materializes the round's labels and restarts the plan from there —
    # the standard Pregel-in-DataFrames survival move.
    labels = labels.localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.v == labels.vertex)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.vertex == neighbor_min.u, "left")
            .select(
                "vertex",
                F.least(
                    "component", F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            )
        ).localCheckpoint(eager=True)
        n_changed = updated.filter("_changed").count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        # a silent non-fixpoint would return WRONG components — refuse
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations (graph diameter exceeds the bound); raise max_iterations"
        )
    return labels


def dedup_groups(pairs: DataFrame, src: str = "a_id", dst: str = "b_id") -> DataFrame:
    """Resolve near-dup pairs into groups: (doc_id, keeper_id, group_size),
    keeper = component minimum. Everything except keepers is the drop list."""
    comp = connected_components(pairs, src, dst)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("keeper_id"),
            "group_size",
        )
        .orderBy("doc_id")
    )
