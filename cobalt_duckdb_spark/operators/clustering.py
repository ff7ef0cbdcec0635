"""K-means (Lloyd) as pure DataFrame algebra — the iterative-algorithm
pattern on Spark.

The reference ships vector search over ruri embeddings
(/root/reference/model/search/vector.py); clustering is the companion
operation every embedding pipeline runs at scale (corpus topic maps, IVF
codebook training — ``operators/similarity.py`` consumes exactly such a
codebook). This module trains the codebook itself, Spark-first:

- **No driver round-trips.** Centroids live in a k-row DataFrame; each Lloyd
  iteration is ``broadcast(centroids) × vectors → argmin → re-average``.
  The loop builds ONE lazy plan; nothing is collected. (MLlib's KMeans
  collects centroids to the driver each iteration — fine, but this shape
  also works inside a single SQL-optimizable pipeline and is
  oracle-replayable.)
- **Argmin without a window.** Assignment uses
  ``groupBy(vec).agg(min(struct(dist, cid)))`` — lexicographic struct-min =
  distance-argmin with deterministic cid tiebreak. Partial aggregation
  (map-side combine) applies; a per-vector window would sort instead.
- **Cross-engine determinism.** Distances and re-averaged centroids are
  ROUNDed (6 dp) every iteration, so both engines iterate from identical
  fixed-point inputs and ties break identically (see ROUND discipline in
  the repo's oracle notes).

At 100 TB: k centroids broadcast (k·dims doubles — tiny); assignment is
map-only; the re-average shuffles (cid, dim) pairs — k·dims groups, uniform.
The only vector-keyed shuffle is the final per-vector argmin combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _sq_l2(a: str, b: str) -> Column:
    """Euclidean distance between two array<double> columns, computed in
    array order (matches DuckDB's list_distance fold order)."""
    diff2 = F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x))


def assign_clusters(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, v) × (cid, c) → (vec_id, v, cid, dist): nearest centroid per
    vector, distance rounded 6 dp, ties → smallest cid.

    Plan: broadcast nested-loop of the k-row centroid table (deliberate —
    the small side is k rows by construction), then struct-min argmin with
    map-side partial aggregation. No window sort."""
    j = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", F.round(_sq_l2("v", "c"), 6)
    )
    best = (
        j.groupBy("vec_id", "v")
        .agg(F.min(F.struct("dist", "cid")).alias("m"))
        .select(
            "vec_id", "v", F.col("m.cid").alias("cid"), F.col("m.dist").alias("dist")
        )
    )
    return best


def update_centroids(assigned: DataFrame) -> DataFrame:
    """Re-average members per cluster, dimension-wise, rounding each mean to
    6 dp (the cross-engine fixed point). Empty clusters drop out (k may
    shrink), identically on both engines."""
    per_dim = (
        assigned.select("cid", F.posexplode("v").alias("dim", "x"))
        .groupBy("cid", "dim")
        .agg(F.round(F.avg("x"), 6).alias("m"))
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("c")
    )


def kmeans_lloyd(
    vectors: DataFrame, k: int = 8, iterations: int = 2
) -> DataFrame:
    """Fixed-iteration Lloyd over (vec_id, v: array<double>). Deterministic
    init: the k vectors with vec_id < k seed the centroids (reproducible
    across engines/runs — no RNG). Returns the final assignment
    (vec_id, v, cid, dist)."""
    cent = vectors.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    for _ in range(iterations - 1):
        cent = update_centroids(assign_clusters(vectors, cent))
    return assign_clusters(vectors, cent)


def kmeans_oracle_sql(k: int = 8, iterations: int = 2, dims: int = 64) -> str:
    """DuckDB twin: identical init, rounding, and tiebreaks, so the final
    per-cluster profile hash-matches."""
    assert iterations == 2, "oracle is written for the registered 2-iteration run"
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c1 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {k}),
    a1 AS (
        SELECT e.vec_id, e.v, c1.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY ROUND(list_distance(e.v, c1.c), 6), c1.cid
               ) AS rn
        FROM e CROSS JOIN c1
    ),
    p1 AS (SELECT vec_id, v, cid FROM a1 WHERE rn = 1),
    m2 AS (
        SELECT cid, i, ROUND(AVG(v[CAST(i AS INT)]), 6) AS m
        FROM p1 CROSS JOIN range(1, {dims + 1}) t(i)
        GROUP BY cid, i
    ),
    c2 AS (SELECT cid, list(m ORDER BY i) AS c FROM m2 GROUP BY cid),
    a2 AS (
        SELECT e.vec_id, c2.cid,
               ROUND(list_distance(e.v, c2.c), 6) AS dist,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY ROUND(list_distance(e.v, c2.c), 6), c2.cid
               ) AS rn
        FROM e CROSS JOIN c2
    )
    SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(AVG(dist), 4) AS avg_dist
    FROM a2 WHERE rn = 1
    GROUP BY cid ORDER BY cid
    """
