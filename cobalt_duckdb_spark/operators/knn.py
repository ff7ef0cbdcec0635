"""Top-k vector search (KNN) — the reference's flagship capability.

Reference semantics (``/root/reference/model/search/vector.py:173-188``):
score every stored embedding against a query vector with cosine distance,
``ORDER BY distance LIMIT k`` (DuckDB fuses this into a top-k heap), then
join the winners back to the document corpus and attach a rank.

Spark-first translation:
- scoring is a Catalyst expression over the embeddings scan (column-pruned:
  only ``vec_id`` + ``embedding`` are read);
- ``orderBy().limit(k)`` compiles to ``TakeOrderedAndProject`` — per-partition
  top-k heaps + a k-row driver merge, no global sort, no shuffle of the data.
  This is the plan that survives 100 TB: each of N partitions returns ≤ k rows.
- the k-row result is **broadcast** for the join back to documents (the
  reference's positional ``iloc`` gather, ``vector.py:183``, replaced by an
  explicit key join — Spark has no stable row position);
- rank is ``row_number`` ordered by (distance, id): ties are pinned by key,
  unlike the reference's engine-accidental tie order (SURVEY.md §5.2.4).

Batch queries: the reference loops one SQL statement per query
(``vector.py:171``); ``knn_topk_batch`` is the set-oriented rewrite — one job
for all queries via broadcast of the (small) query set and a per-query
window top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cobalt_duckdb_spark.functions.vector import cosine_distance


def knn_topk(
    embeddings: DataFrame,
    documents: DataFrame,
    query_vec: Column,
    k: int = 10,
    id_col: str = "vec_id",
    doc_id_col: str = "doc_id",
    round_to: int | None = 6,
) -> DataFrame:
    """Flagship query: cosine top-k over ``embeddings`` joined to ``documents``.

    ``query_vec`` is a Column (usually a literal array or a scalar-subquery
    style 1-row broadcast). Returns (rank, doc_id, text, distance) ordered by
    rank; distance rounded for cross-engine comparability.
    """
    scored = embeddings.select(
        F.col(id_col),
        cosine_distance(F.col("embedding"), query_vec).alias("_dist"),
    )
    # TakeOrderedAndProject: per-partition heaps, k-row merge on the driver.
    topk = scored.orderBy(F.asc("_dist"), F.asc(id_col)).limit(k)

    w = Window.orderBy(F.asc("_dist"), F.asc(id_col))
    dist = F.round("_dist", round_to) if round_to is not None else F.col("_dist")
    return (
        F.broadcast(topk)
        .join(documents, topk[id_col] == documents[doc_id_col], "inner")
        .select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            F.col(doc_id_col),
            F.col("text"),
            dist.alias("distance"),
        )
        .orderBy("rank")
    )


def knn_topk_broadcast_query(
    embeddings: DataFrame,
    documents: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    doc_id_col: str = "doc_id",
    query_vec_col: str = "query_vec",
    round_to: int | None = 6,
) -> DataFrame:
    """``knn_topk`` with the query vector supplied as a 1-row DataFrame and
    broadcast into the scoring scan — one job end-to-end, no driver
    round-trip (the reference inlines the vector as a SQL literal,
    ``vector.py:176``; a broadcast join is the Spark-native equivalent and
    composes when query vectors live in a table)."""
    q = F.broadcast(query.select(F.col(query_vec_col)))
    scored = embeddings.crossJoin(q).select(
        F.col(id_col),
        cosine_distance(F.col("embedding"), F.col(query_vec_col)).alias("_dist"),
    )
    topk = scored.orderBy(F.asc("_dist"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.asc("_dist"), F.asc(id_col))
    dist = F.round("_dist", round_to) if round_to is not None else F.col("_dist")
    return (
        F.broadcast(topk)
        .join(documents, topk[id_col] == documents[doc_id_col], "inner")
        .select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            F.col(doc_id_col),
            F.col("text"),
            dist.alias("distance"),
        )
        .orderBy("rank")
    )


def build_vector_store(
    embeddings: DataFrame,
    view_name: str = "vector_store",
    normalize: bool = True,
) -> DataFrame:
    """The reference's index build (``from_dataframe`` → register,
    ``vector.py:97-135``) Spark-style: optionally L2-normalize at ingest
    (turning cosine distance into ``1 − dot`` — one fold per query instead of
    three), persist in memory-and-disk, and register as a temp view for the
    SQL surface. Returns the persisted frame; caller owns ``unpersist()``."""
    from pyspark import StorageLevel

    from cobalt_duckdb_spark.functions.vector import l2_normalize

    store = embeddings
    if normalize:
        store = embeddings.select(
            "vec_id", l2_normalize(F.col("embedding")).alias("embedding")
        ).filter(F.col("embedding").isNotNull())
    store = store.persist(StorageLevel.MEMORY_AND_DISK)
    store.createOrReplaceTempView(view_name)
    return store


def query_vector_of(embeddings: DataFrame, vec_id: int) -> list[float]:
    """Fetch one stored embedding to serve as the query vector (deterministic
    stand-in for the reference's model inference, which needs GPU weights not
    present here; cf. SURVEY.md §5.2.2 'freeze inputs')."""
    row = embeddings.filter(F.col("vec_id") == vec_id).select("embedding").head()
    if row is None:
        raise KeyError(f"vec_id {vec_id} not found")
    return [float(x) for x in row[0]]


def knn_topk_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_to: int | None = 6,
) -> DataFrame:
    """Set-oriented batch KNN: all queries in ONE job.

    Broadcast the query set (queries are user-issued — small) against the
    embeddings scan, score each (query, doc) pair, then per-query top-k with a
    rank window. At scale this is a map-only stage over the big table plus a
    shuffle of only ``n_queries × N_partition_survivors`` rows — the loop the
    reference runs (``vector.py:171``) would be n_queries full scans.
    """
    scored = embeddings.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_distance(F.col("embedding"), F.col(query_vec_col)).alias("_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("_dist"), F.asc(id_col))
    dist = F.round("_dist", round_to) if round_to is not None else F.col("_dist")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, dist.alias("distance"))
        .orderBy(query_id_col, "rank")
    )
