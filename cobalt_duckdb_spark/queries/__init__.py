"""Named query registry — the contract surface for the driver harness.

Every implemented operator from SURVEY.md §2 registers here as
  name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
and ``__spark_entry__.py`` re-exports the registry. Oracle SQL is ANSI-ish
DuckDB SQL over the same parquet tables; output column names/types are
aliased identically on both sides (the driver hashes values after sorting
columns by name). Float outputs are rounded (typically 6 dp) on BOTH sides so
cross-engine double arithmetic (±1 ulp) can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobalt_duckdb_spark.io import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: cosine top-k KNN (reference's canonical query, SURVEY.md §2.11)
# ---------------------------------------------------------------------------

FLAGSHIP_K = 10
FLAGSHIP_QUERY_VEC_ID = 0


@register(
    "flagship_knn_cosine_topk",
    oracle=f"""
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qvec
        FROM embeddings WHERE vec_id = {FLAGSHIP_QUERY_VEC_ID}
    ),
    scored AS (
        SELECT vec_id,
               1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qvec FROM q)) AS _dist
        FROM embeddings
    ),
    topk AS (
        SELECT vec_id, _dist FROM scored
        ORDER BY _dist ASC, vec_id ASC LIMIT {FLAGSHIP_K}
    )
    SELECT CAST(row_number() OVER (ORDER BY t._dist ASC, t.vec_id ASC) AS BIGINT) AS rank,
           d.doc_id AS doc_id,
           d.text AS text,
           ROUND(t._dist, 6) AS distance
    FROM topk t JOIN documents d ON t.vec_id = d.doc_id
    ORDER BY rank
    """,
)
def flagship_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference query verbatim in Spark terms
    (``/root/reference/model/search/vector.py:173-188`` + ``app.py:12-14``):
    cosine distance of every embedding to a query vector, top-10, joined back
    to documents, ranked. Query vector = stored embedding of vec_id 0 (frozen
    input — no model in the loop, SURVEY.md §5.2.2). The query row is
    broadcast-joined rather than collected to the driver: one Spark job, no
    driver round-trip, and the plan works unchanged when the query vector
    comes from another table."""
    from cobalt_duckdb_spark.operators.knn import knn_topk_broadcast_query

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    query = emb.filter(F.col("vec_id") == FLAGSHIP_QUERY_VEC_ID).select(
        F.col("embedding").alias("query_vec")
    )
    return knn_topk_broadcast_query(emb, docs, query, k=FLAGSHIP_K)


def _load_all_modules() -> None:
    """Import every query module so its @register calls run."""
    from cobalt_duckdb_spark.queries import (  # noqa: F401
        relational,
        windows,
        joins,
        events,
        text,
        dedup,
        similarity,
        subqueries,
        multimodal,
        inference,
        advanced,
        tpch_extra,
        timeseries,
        pipeline,
        graph_analytics,
    )


_load_all_modules()


# Names the driver's truncated 50-entry gate already verified in round 1
# (keys of CORRECTNESS_r01.json). The driver checks the FIRST 50 registry
# entries per round, so the registry is rotated: flagship stays in slot 0
# (it is the smoke-checked contract query), then every not-yet-driver-
# verified query (including anything newly registered), then the round-1-
# verified set. This cycles driver verification through the whole surface
# instead of re-checking the same prefix forever.
_DRIVER_VERIFIED = frozenset(
    {
        # r01-green names only. Deliberately absent (must re-verify in r02):
        # agg_collect_sorted_list + events_user_journey_prefix (r01 harness
        # fail, output contract changed), dedup_simhash_pairs (r01 no_oracle,
        # oracle added), dedup_embedding_cosine_pairs (implementation changed
        # to blocked matmul).
        "agg_corr_quantity_price",
        "agg_count_distinct", "agg_cube_lineitem", "agg_rollup_revenue",
        "agg_stats_orders", "dedup_connected_groups",
        "dedup_exact_fingerprint",
        "dedup_minhash_lsh_pairs", "dedup_ngram_jaccard_pairs",
        "distinct_mktsegments",
        "flagship_knn_cosine_topk",
        "join_anti_no_urgent_orders", "join_asof_last_click_before_error",
        "join_band_acctbal", "join_interval_error_click",
        "join_left_outer_yoy_revenue", "join_semi_urgent_buyers",
        "json_props_as_map", "json_props_extract", "predicate_pack_part",
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_local_supplier_volume", "scalar_string_date_math",
        "setop_bag_semantics", "setop_union_intersect_except",
        "simsearch_batch_knn", "stream_dedup_first_event",
        "stream_session_windows", "stream_sliding_window_avg",
        "stream_static_enrichment", "stream_tumbling_window_counts",
        "text_bpe_ish_token_count", "text_fingerprints",
        "text_langid_confusion", "text_levenshtein_near_titles",
        "text_quality_scores", "text_token_stats", "text_top_bigrams",
        "topk_orders_by_price", "unpivot_event_totals_long",
        "window_lag_lead_orders", "window_moving_avg_rows_frame",
        "window_range_frame_value", "window_rank_family",
        "window_trailing_hour_count",
    }
)


def _rotate_registry() -> None:
    flagship = "flagship_knn_cosine_topk"
    fresh = [
        n for n in QUERIES if n != flagship and n not in _DRIVER_VERIFIED
    ]
    stale = [n for n in QUERIES if n != flagship and n in _DRIVER_VERIFIED]
    ordered = {n: QUERIES[n] for n in [flagship, *fresh, *stale]}
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate_registry()


def queries() -> dict[str, SparkQuery]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
