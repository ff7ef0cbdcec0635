"""Similarity-search pack: exact batch KNN (brute force baseline) and the
IVF-bucketed approximate variant (scale path). Flagship single-query KNN is
registered in queries/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobalt_duckdb_spark.functions.exact import spark_round_sql
from cobalt_duckdb_spark.io import load_table
from cobalt_duckdb_spark.operators.knn import knn_topk_batch
from cobalt_duckdb_spark.operators.similarity import ivf_topk
from cobalt_duckdb_spark.queries import register

_QUERY_IDS = [0, 1, 2]
_K = 5


def _query_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id").isin(_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@register(
    "simsearch_batch_knn",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id IN (0, 1, 2)
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS d
        FROM embeddings e CROSS JOIN q
    ),
    ranked AS (
        SELECT query_id, vec_id, d,
               row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rn
        FROM scored
    )
    SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id,
           ROUND(d, 6) AS distance
    FROM ranked WHERE rn <= {_K}
    ORDER BY query_id, rank
    """,
)
def simsearch_batch_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force batch KNN — one job for all queries (the set-oriented
    rewrite of the reference's per-query loop, SURVEY.md §2.10 U4)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_topk_batch(emb, _query_set(spark, sf_dir), k=_K)


@register(
    "simsearch_ivf_topk",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv),
                                c.centroid_id) AS rn
            FROM embeddings e CROSS JOIN centroids c
        ) WHERE rn = 1
    ),
    q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id IN (0, 1, 2)
    ),
    probes AS (
        SELECT query_id, qv, cell FROM (
            SELECT q.query_id, q.qv, c.centroid_id AS cell,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY 1.0 - list_cosine_similarity(q.qv, c.cv),
                                c.centroid_id) AS rn
            FROM q CROSS JOIN centroids c
        ) WHERE rn <= 4
    ),
    scored AS (
        SELECT p.query_id, a.vec_id,
               1.0 - list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), p.qv) AS d
        FROM assigned a JOIN probes p ON a.cell = p.cell
    ),
    ranked AS (
        SELECT query_id, vec_id, d,
               row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rn
        FROM scored
    )
    SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id, ROUND(d, 6) AS distance
    FROM ranked WHERE rn <= {_K}
    ORDER BY query_id, rank
    """,
)
def simsearch_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (16 cells, 4 probes) — identical algorithm
    replayed by the oracle, so approximation ≠ untested."""
    from cobalt_duckdb_spark.operators.dedup import fan_out

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return ivf_topk(emb, _query_set(spark, sf_dir), k=_K, num_centroids=16, nprobe=4)


@register(
    "embedding_int8_quantization_audit",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               CAST(embedding AS DOUBLE[]) AS emb,
               list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(GREATEST(-127, LEAST(127, round(x * 127.0 / 0.5, 0))) AS BIGINT)
               ) AS q8
        FROM embeddings WHERE vec_id < 100
    ),
    err AS (
        SELECT vec_id,
               list_inner_product(
                   list_transform(list_zip(emb, q8),
                       p -> (p[1] - p[2] * 0.5 / 127.0)),
                   list_transform(list_zip(emb, q8),
                       p -> (p[1] - p[2] * 0.5 / 127.0))
               ) AS sq_err,
               list_inner_product(emb, emb) AS sq_norm
        FROM q
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(sqrt(sq_err)), 6) AS avg_l2_error,
           ROUND(MAX(sqrt(sq_err)), 6) AS max_l2_error,
           ROUND(AVG(sqrt(sq_err) / sqrt(sq_norm)), 6) AS avg_rel_error
    FROM err
    """,
)
def embedding_int8_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding compression audit: symmetric int8 quantization (scale 0.5 →
    ~4 valid bits per unit) and its reconstruction error — the storage-cost
    lever for a 100 TB embedding lake (float32→int8 is 4× smaller; this
    query quantifies what that costs in L2 error before committing to it)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    emb = F.col("embedding").cast("array<double>")
    scale = 0.5
    q8 = F.transform(
        emb,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.round(x * 127.0 / scale, 0))
        ).cast("bigint"),
    )
    deq_err = F.zip_with(emb, q8, lambda x, qv: x - qv * scale / 127.0)
    sq = lambda arr: F.aggregate(  # noqa: E731
        F.zip_with(arr, arr, lambda a, b: a * b), F.lit(0.0), lambda s, v: s + v
    )
    per_vec = e.select(
        "vec_id",
        F.sqrt(sq(deq_err)).alias("l2_err"),
        F.sqrt(sq(emb)).alias("l2_norm"),
    )
    return per_vec.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("l2_err"), 6).alias("avg_l2_error"),
        F.round(F.max("l2_err"), 6).alias("max_l2_error"),
        F.round(F.avg(F.col("l2_err") / F.col("l2_norm")), 6).alias("avg_rel_error"),
    )


_RRF_K = 60  # standard reciprocal-rank-fusion damping constant
_HYBRID_TERMS = ["spark", "join", "vector", "window"]
_HYBRID_LEG_K = 20


def _hybrid_oracle() -> str:
    from cobalt_duckdb_spark.operators.bm25 import bm25_oracle_sql

    bm25 = bm25_oracle_sql(_HYBRID_TERMS, k=_HYBRID_LEG_K)
    return f"""
    WITH lex AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
        FROM ({bm25})
    ),
    q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
        SELECT e.vec_id AS doc_id,
               ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
                   AS sim
        FROM embeddings e CROSS JOIN q
    ),
    vec AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS r
        FROM scored ORDER BY sim DESC, doc_id LIMIT {_HYBRID_LEG_K}
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / ({_RRF_K} + l.r), 0)
                     + COALESCE(1.0 / ({_RRF_K} + v.r), 0), 6) AS rrf
        FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    )
    SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """


@register("hybrid_rrf_topk", oracle=_hybrid_oracle())
def hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical leg + cosine vector leg fused by
    reciprocal-rank fusion (RRF, k=60) — the retriever the reference's
    dependency surface sketches (rank_bm25 + voyager ANN,
    /root/reference/requirements.txt:31-32) re-expressed set-oriented.

    Both legs are top-20; a doc missing from a leg contributes 0 (the
    COALESCE form of RRF). Ranks are computed over ROUNDED scores with id
    tiebreaks so leg order — and therefore the fusion — is deterministic
    cross-engine.

    Scale shape: each leg is the already-audited plan (BM25:
    filter-before-shuffle aggregates; vector: broadcast single-row query ×
    map-only scan → TakeOrderedAndProject); fusion is a full outer join of
    two 20-row frames — driver-free end to end."""
    from pyspark.sql import Window

    from cobalt_duckdb_spark.functions.vector import cosine_similarity
    from cobalt_duckdb_spark.operators.bm25 import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex = bm25_topk(d, _HYBRID_TERMS, k=_HYBRID_LEG_K).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("lex_r"),
    )

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    vec = (
        emb.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_similarity("embedding", "qv"), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(_HYBRID_LEG_K)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("sim"), F.asc("doc_id")))
            .alias("vec_r"),
        )
    )

    rrf = F.round(
        F.coalesce(1.0 / (_RRF_K + F.col("lex_r")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_K + F.col("vec_r")), F.lit(0.0)),
        6,
    )
    return (
        lex.join(vec, "doc_id", "full_outer")
        .select("doc_id", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(10)
    )


def _kmeans_oracle() -> str:
    from cobalt_duckdb_spark.operators.clustering import kmeans_oracle_sql

    return kmeans_oracle_sql(k=8, iterations=2, dims=64)


@register("cluster_kmeans_lloyd", oracle=_kmeans_oracle())
def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means codebook training (2 Lloyd iterations, k=8) over the corpus
    embeddings, reported as per-cluster profiles (size + mean distance).
    The iterative-algorithm pattern: the whole loop is ONE lazy DataFrame
    plan — broadcast centroids × vectors → struct-min argmin → dimension-wise
    re-average — with no driver round-trip and deterministic cross-engine
    rounding at every step (see operators/clustering.py).

    This is the trainer for the IVF index family (simsearch_ivf_topk
    consumes a codebook of exactly this shape)."""
    from cobalt_duckdb_spark.operators.clustering import kmeans_lloyd

    # spread=True: one-row-group scan; heavy per-row vector work below
    # would otherwise run on one core (no-op at production sizes)
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    final = kmeans_lloyd(vecs, k=8, iterations=2)
    return (
        final.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.avg("dist"), 4).alias("avg_dist"),
        )
        .orderBy("cid")
    )


@register(
    "embedding_dim_variance_topk",
    oracle="""
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    per_dim AS (
        SELECT i AS dim,
               {mean} AS mean,
               ROUND(VAR_POP(v[CAST(i AS INT)]), 6) AS variance
        FROM e CROSS JOIN range(1, 65) t(i)
        GROUP BY i
    )
    SELECT CAST(dim AS INT) AS dim, mean, variance
    FROM per_dim
    ORDER BY variance DESC, dim LIMIT 10
    """.replace(
        # dim means are centered near zero — sign-capable (signed-zero class)
        "{mean}", spark_round_sql("AVG(v[CAST(i AS INT)])", 6)
    ),
)
def embedding_dim_variance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance audit over the embedding matrix: the 10
    highest-variance dimensions (with means). The screening step of
    dimensionality reduction / dead-dimension detection — a near-zero-variance
    dimension carries no signal and an anisotropic spread (few dims dominate)
    degrades cosine retrieval; this is the audit that catches both.

    Scale shape: posexplode to (dim, value) then ONE aggregate keyed by dim —
    64 groups, perfectly uniform, map-side partial var (Spark's var_pop is a
    single-pass merge-able moment aggregate). Top-10 is TakeOrdered over 64
    rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>")).alias("d0", "x"))
        .select((F.col("d0") + 1).cast("int").alias("dim"), "x")
        .groupBy("dim")
        .agg(
            F.round(F.avg("x"), 6).alias("mean"),
            F.round(F.var_pop("x"), 6).alias("variance"),
        )
    )
    return per_dim.orderBy(F.desc("variance"), F.asc("dim")).limit(10)


from cobalt_duckdb_spark.operators.pq import (  # noqa: E402
    ivfpq_adc_oracle_sql,
    pq_adc_oracle_sql,
)


@register(
    "simsearch_pq_adc_topk",
    oracle=pq_adc_oracle_sql(k=_K, query_ids=(0, 1, 2)),
)
def simsearch_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (8 subspaces × 16 centroids → 8-byte
    codes, 32× compression): train → encode → lookup-table search, the
    Jegou-style billion-vector index path (``operators/pq.py``). The oracle
    replays the IDENTICAL deterministic pipeline in SQL — the compressed
    index is differentially tested end-to-end, not smoke-checked. Distances
    here are L2² over codes (ADC); the recall-vs-exact tradeoff is pinned by
    ``tests/test_operators.py::test_pq_recall_vs_exact``."""
    from cobalt_duckdb_spark.operators.dedup import fan_out
    from cobalt_duckdb_spark.operators.pq import pq_adc_topk

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return pq_adc_topk(emb, _query_set(spark, sf_dir), k=_K)


@register(
    "simsearch_ivfpq_adc_topk",
    oracle=ivfpq_adc_oracle_sql(k=_K, query_ids=(0, 1, 2)),
)
def simsearch_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed index (FAISS ``IVF16,PQ8`` shape): coarse cells prune
    the candidate set ~4×, PQ codes compress each comparison 32× — the two
    scale levers multiplied, which is how billion-vector serving actually
    ships. Deterministic codebooks keep the entire train → assign → encode →
    ADC pipeline oracle-replayable (``operators/pq.py::ivfpq_adc_topk``)."""
    from cobalt_duckdb_spark.operators.dedup import fan_out
    from cobalt_duckdb_spark.operators.pq import ivfpq_adc_topk

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return ivfpq_adc_topk(emb, _query_set(spark, sf_dir), k=_K)


_NEG_LO, _NEG_HI = 6, 15  # rank band mined as hard negatives (top-5 = positives)


@register(
    "simsearch_hard_negatives",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id IN (0, 1, 2)
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS d
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, d,
               row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rn
        FROM scored
    )
    SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id AS negative_id,
           ROUND(d, 6) AS distance
    FROM ranked WHERE rn BETWEEN {_NEG_LO} AND {_NEG_HI}
    ORDER BY query_id, rank
    """,
)
def simsearch_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    rank-6..15 band of nearest neighbors (self excluded) — close enough to
    be informative negatives, far enough past the top-5 "positive" band to
    be probably-not-relevant. This is the standard in-batch-negatives
    upgrade (DPR/SimCSE recipe) expressed as a rank-band filter on the same
    scored-and-windowed plan as batch KNN — the filter changes, the plan
    does not: still broadcast queries × map-only scan + per-query top-k
    window, no extra shuffle over exact KNN."""
    from cobalt_duckdb_spark.operators.dedup import fan_out
    from cobalt_duckdb_spark.functions.vector import cosine_distance
    from pyspark.sql import Window

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    qs = _query_set(spark, sf_dir)
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_distance(F.col("embedding"), F.col("query_vec")).alias("_d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank").between(_NEG_LO, _NEG_HI))
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("negative_id"),
            F.round("_d", 6).alias("distance"),
        )
        .orderBy("query_id", "rank")
    )


_MRL_K = 10
_MRL_PREFIX = 16  # Matryoshka prefix dims audited against the full 64
_MRL_NQ = 5


@register(
    "matryoshka_recall_audit",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < {_MRL_NQ}
    ),
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    full_topk AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, b.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY 1.0 - list_cosine_similarity(b.v, q.qv) ASC,
                                b.vec_id ASC) AS rn
            FROM base b CROSS JOIN q)
        WHERE rn <= {_MRL_K}
    ),
    pref_topk AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, b.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY 1.0 - list_cosine_similarity(
                                    b.v[1:{_MRL_PREFIX}], q.qv[1:{_MRL_PREFIX}]) ASC,
                                b.vec_id ASC) AS rn
            FROM base b CROSS JOIN q)
        WHERE rn <= {_MRL_K}
    )
    SELECT f.query_id,
           CAST({_MRL_K} AS BIGINT) AS k,
           CAST(count(p.vec_id) AS BIGINT) AS n_overlap,
           ROUND(count(p.vec_id) / {_MRL_K}.0, 6) AS recall_at_k
    FROM full_topk f
    LEFT JOIN pref_topk p ON f.query_id = p.query_id AND f.vec_id = p.vec_id
    GROUP BY f.query_id
    ORDER BY f.query_id
    """,
)
def matryoshka_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation audit (Kusupati et al., MRL): how much top-k
    recall survives keeping only the first 16 of 64 embedding dims? The
    production question behind serving truncated vectors: a prefix index is
    4x smaller and 4x faster per comparison, and this measures the quality
    bill. recall@k = |topk_full ∩ topk_prefix| / k per query.

    Scale shape: two batch-KNN passes (broadcast queries x map-only scan +
    per-query top-k window — same plan as ``simsearch_batch_knn``) over full
    and sliced vectors, then a join of two k-row-per-query sets. The slice
    is a Catalyst expression at scan time, so the prefix pass reads the same
    column without a second materialized table."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < _MRL_NQ)
    full_top = knn_topk_batch(
        emb,
        q.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        ),
        k=_MRL_K,
    )
    pref_emb = emb.select(
        "vec_id", F.slice("embedding", 1, _MRL_PREFIX).alias("embedding")
    )
    pref_top = knn_topk_batch(
        pref_emb,
        q.select(
            F.col("vec_id").alias("query_id"),
            F.slice("embedding", 1, _MRL_PREFIX).alias("query_vec"),
        ),
        k=_MRL_K,
    )
    hits = pref_top.select("query_id", "vec_id", F.lit(1).alias("_hit"))
    return (
        full_top.select("query_id", "vec_id")
        .join(hits, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).cast("bigint").alias("n_overlap"))
        .select(
            "query_id",
            F.lit(_MRL_K).cast("bigint").alias("k"),
            "n_overlap",
            F.round(F.col("n_overlap") / _MRL_K, 6).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


_RERANK_CANDIDATES = 50


def _pq_rerank_oracle() -> str:
    """Coarse-retrieve (PQ-ADC top-N) → exact-rerank oracle: wraps the full
    PQ pipeline twin as a derived table, then re-scores its candidate set
    with exact cosine and cuts to the final k."""
    base = pq_adc_oracle_sql(k=_RERANK_CANDIDATES, query_ids=(0, 1, 2))
    return f"""
    WITH cand AS (
        SELECT query_id, vec_id FROM ({base})
    ),
    exact AS (
        SELECT c.query_id, c.vec_id,
               1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])) AS d
        FROM cand c
        JOIN embeddings e ON e.vec_id = c.vec_id
        JOIN embeddings q ON q.vec_id = c.query_id
    )
    SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id, ROUND(d, 6) AS distance
    FROM (
        SELECT query_id, vec_id, d,
               row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rn
        FROM exact
    ) WHERE rn <= {_K}
    ORDER BY query_id, rank
    """


@register("simsearch_pq_rerank_exact", oracle=_pq_rerank_oracle())
def simsearch_pq_rerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval — the shape every production vector search runs:
    a COMPRESSED first stage (PQ-ADC over 8-byte codes) retrieves a
    candidate pool (50 per query), then an exact cosine pass re-scores only
    that pool and emits the final top-k. Quality ≈ exact search wherever the
    candidate pool covers the true top-k; cost ≈ compressed scan +
    k·pool-size full-width distance evaluations — at 100 TB the exact stage
    touches 50 vectors per query instead of N.

    Plan shape: stage 1 is the oracle-checked ADC pipeline; stage 2
    broadcasts the tiny (query, candidate) pool against the embeddings scan
    — no second full-table shuffle."""
    from cobalt_duckdb_spark.functions.vector import cosine_distance
    from cobalt_duckdb_spark.operators.dedup import fan_out
    from cobalt_duckdb_spark.operators.pq import pq_adc_topk
    from pyspark.sql import Window

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    qs = _query_set(spark, sf_dir)
    cand = pq_adc_topk(emb, qs, k=_RERANK_CANDIDATES).select("query_id", "vec_id")
    exact = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .join(F.broadcast(cand), "vec_id")
        .join(
            F.broadcast(
                qs.select(
                    "query_id", F.col("query_vec").cast("array<double>").alias("qv")
                )
            ),
            "query_id",
        )
        .select(
            "query_id", "vec_id", cosine_distance(F.col("v"), F.col("qv")).alias("d")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _K)
        .select("query_id", "rank", "vec_id", F.round("d", 6).alias("distance"))
        .orderBy("query_id", "rank")
    )


_FILTER_LABEL = 3


@register(
    "simsearch_filtered_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id IN (0, 1, 2)
    ),
    scored AS (
        SELECT q.query_id, e.vec_id, e.label,
               1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS d
        FROM embeddings e CROSS JOIN q
        WHERE e.label = {_FILTER_LABEL}
    )
    SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id,
           CAST(label AS BIGINT) AS label, ROUND(d, 6) AS distance
    FROM (
        SELECT query_id, vec_id, label, d,
               row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rn
        FROM scored
    ) WHERE rn <= {{k}}
    ORDER BY query_id, rank
    """.format(k=10),
)
def simsearch_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search (the "filtered ANN" every vector DB
    advertises): top-k restricted to rows satisfying a predicate
    (label = 3). In Spark the filter is just a WHERE on the scan — pushed
    to parquet, composed BEFORE any distance work, and at 100 TB it
    combines with partition/file pruning on the filter column. (Contrast
    with post-filtering a fixed top-k, which silently returns fewer than k
    when the predicate is selective.)"""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label") == _FILTER_LABEL
    )
    out = knn_topk_batch(emb, _query_set(spark, sf_dir), k=10)
    lab = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("bigint").alias("label")
    )
    return out.join(F.broadcast(lab), "vec_id").select(
        "query_id", "rank", "vec_id", "label", "distance"
    ).orderBy("query_id", "rank")


@register(
    "simsearch_index_staleness",
    oracle="""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id % 5 <> 0
    ),
    batch AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id % 5 = 0
    ),
    centroids AS (
        SELECT vec_id AS cid, v AS cv FROM corpus ORDER BY vec_id LIMIT 16
    ),
    ac AS (
        SELECT cell, d FROM (
            SELECT c.cid AS cell,
                   1.0 - list_cosine_similarity(e.v, c.cv) AS d,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY 1.0 - list_cosine_similarity(e.v, c.cv), c.cid
                   ) AS rn
            FROM corpus e CROSS JOIN centroids c
        ) WHERE rn = 1
    ),
    ab AS (
        SELECT cell, d FROM (
            SELECT c.cid AS cell,
                   1.0 - list_cosine_similarity(e.v, c.cv) AS d,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY 1.0 - list_cosine_similarity(e.v, c.cv), c.cid
                   ) AS rn
            FROM batch e CROSS JOIN centroids c
        ) WHERE rn = 1
    ),
    gc AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_corpus,
                  AVG(d) AS dc FROM ac GROUP BY cell),
    gb AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_batch,
                  AVG(d) AS db FROM ab GROUP BY cell)
    SELECT COALESCE(gc.cell, gb.cell) AS cell,
           COALESCE(gc.n_corpus, 0) AS n_corpus,
           COALESCE(gb.n_batch, 0) AS n_batch,
           ROUND(gc.dc, 6) AS avg_dist_corpus,
           ROUND(gb.db, 6) AS avg_dist_batch,
           {drift} AS drift
    FROM gc FULL OUTER JOIN gb ON gc.cell = gb.cell
    ORDER BY cell
    """.replace(
        # a distance DIFFERENCE is sign-capable near zero (signed-zero class)
        "{drift}", spark_round_sql("gb.db - gc.dc", 6)
    ),
)
def simsearch_index_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-staleness audit: the corpus (vec_id % 5 ≠ 0) trains the
    16-cell codebook; the arriving batch (vec_id % 5 = 0) is assigned with
    the SAME frozen codebook. Per cell: member counts and average
    assignment distance for both populations, plus the drift — rising batch
    distances or a lopsided batch load factor are the retrain-the-codebook
    signals an embedding lake monitors as new data lands.

    Shape: both assignments are the packed-broadcast ``array_min`` argmin
    (map-only over each population — no window through an exchange); the
    audit is two 16-group aggregates full-outer-joined. At 100 TB this
    runs per ingest batch at the cost of scanning the batch, never the
    corpus (the corpus profile is incremental-aggregated once)."""
    from cobalt_duckdb_spark.functions.vector import cosine_distance
    from cobalt_duckdb_spark.operators.similarity import make_centroids

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % 5 != 0)
    batch = e.filter(F.col("vec_id") % 5 == 0)
    cents = make_centroids(corpus, 16)
    packed = F.broadcast(
        cents.groupBy().agg(
            F.collect_list(
                F.struct(
                    F.col("centroid_id").alias("cid"),
                    F.col("centroid_vec").alias("cvec"),
                )
            ).alias("cents")
        )
    )
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                cosine_distance(F.col("embedding"), c["cvec"]).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
    )

    def profile(pop: DataFrame, n_alias: str, d_alias: str) -> DataFrame:
        assigned = pop.crossJoin(packed).select(
            best["cid"].alias("cell"), best["d"].alias("d")
        )
        return assigned.groupBy("cell").agg(
            F.count("*").cast("bigint").alias(n_alias),
            F.avg("d").alias(d_alias),
        )

    gc = profile(corpus, "n_corpus", "dc")
    gb = profile(batch, "n_batch", "db")
    return (
        gc.join(gb, "cell", "full_outer")
        .select(
            "cell",
            F.coalesce("n_corpus", F.lit(0)).alias("n_corpus"),
            F.coalesce("n_batch", F.lit(0)).alias("n_batch"),
            F.round("dc", 6).alias("avg_dist_corpus"),
            F.round("db", 6).alias("avg_dist_batch"),
            F.round(F.col("db") - F.col("dc"), 6).alias("drift"),
        )
        .orderBy("cell")
    )


@register(
    "embedding_centroid_drift",
    oracle="""
    WITH e AS (
        SELECT label, vec_id % 2 AS half, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    u AS (
        SELECT label, half, generate_subscripts(v, 1) AS i, unnest(v) AS x
        FROM e
    ),
    cent AS (
        SELECT label, half, i, AVG(x) AS c FROM u GROUP BY label, half, i
    ),
    paired AS (
        SELECT a.label, a.i, a.c AS ca, b.c AS cb
        FROM cent a JOIN cent b
          ON a.label = b.label AND a.i = b.i AND a.half = 0 AND b.half = 1
    ),
    sums AS (
        SELECT label,
               SUM(ca * cb) AS dot,
               sqrt(SUM(ca * ca)) AS na,
               sqrt(SUM(cb * cb)) AS nb
        FROM paired GROUP BY label
    ),
    cnt AS (
        SELECT label,
               SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_a,
               SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_b
        FROM e GROUP BY label
    )
    SELECT s.label,
           CAST(c.n_a AS BIGINT) AS n_even,
           CAST(c.n_b AS BIGINT) AS n_odd,
           {cos} AS centroid_cosine,
           {shift} AS norm_shift
    FROM sums s JOIN cnt c ON c.label = s.label
    ORDER BY s.label
    """.replace(
        # cosines and norm differences are sign-capable near zero
        # (signed-zero class, sf0.1 redraw seed 2317)
        "{cos}", spark_round_sql("s.dot / (s.na * s.nb)", 6)
    ).replace("{shift}", spark_round_sql("s.nb - s.na", 6)),
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label SEMANTIC drift: split each label's vectors into two halves
    (vec_id parity — stand-in for before/after an embedder upgrade or two
    crawl epochs), compare the half-centroids by cosine and norm shift. A
    centroid cosine well below 1 says the label's meaning moved — re-embed
    or re-cluster before mixing epochs (the embedding-space companion of
    ``text_corpus_drift_kl`` and the retrain trigger behind
    ``simsearch_index_staleness``).

    Shape: one (label, half, dim) mergeable average after a posexplode —
    map-side combine does the heavy lifting; everything downstream runs on
    |labels|×dims rows."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    u = e.select("label", "half", F.posexplode("v").alias("i", "x"))
    cent = u.groupBy("label", "half", "i").agg(F.avg("x").alias("c"))
    a = cent.filter(F.col("half") == 0).select(
        "label", "i", F.col("c").alias("ca")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "i", F.col("c").alias("cb")
    )
    sums = (
        a.join(b, ["label", "i"])
        .groupBy("label")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("dot"),
            F.sqrt(F.sum(F.col("ca") * F.col("ca"))).alias("na"),
            F.sqrt(F.sum(F.col("cb") * F.col("cb"))).alias("nb"),
        )
    )
    cnt = e.groupBy("label").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_even"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_odd"),
    )
    return (
        sums.join(cnt, "label")
        .select(
            "label",
            "n_even",
            "n_odd",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "centroid_cosine"
            ),
            F.round(F.col("nb") - F.col("na"), 6).alias("norm_shift"),
        )
        .orderBy("label")
    )


def _silhouette_oracle() -> str:
    # Same 2-iteration Lloyd twin as cluster_kmeans_lloyd, then simplified
    # (centroid-based) silhouette from the rn=1 / rn=2 distances.
    k, dims = 8, 64
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
    ),
    sil AS (
        SELECT a.vec_id, a.cid, a.dist AS a_dist, b.dist AS b_dist,
               (b.dist - a.dist) / GREATEST(a.dist, b.dist) AS s
        FROM a2 a JOIN a2 b ON a.vec_id = b.vec_id AND b.rn = 2
        WHERE a.rn = 1
    )
    SELECT cid,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           {spark_round_sql("AVG(s)", 4)} AS avg_silhouette,
           {spark_round_sql("MIN(s)", 4)} AS min_silhouette,
           CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_misassigned
    FROM sil
    GROUP BY cid ORDER BY cid
    """


@register("cluster_silhouette_audit", oracle=_silhouette_oracle())
def cluster_silhouette_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based (simplified) silhouette per k-means cluster: for each
    vector, a = distance to its own centroid, b = distance to the nearest
    OTHER centroid, s = (b−a)/max(a,b) ∈ [−1, 1]. The clustering-quality
    bill that decides whether k was right before the codebook ships to the
    IVF index — avg_s near 0 means overlapping clusters, negative s flags
    points the next Lloyd round would move (`n_misassigned`).

    Same deterministic 2-iteration Lloyd as ``cluster_kmeans_lloyd``
    (seeded by vec_id < k, 6-dp fixed point), so the two queries audit the
    SAME model. Scale: the all-centroid distance table is the broadcast
    cross join k-means already builds; the rank window runs over k=8 rows
    per vector — bounded by k, never by corpus size."""
    from pyspark.sql import Window

    from cobalt_duckdb_spark.operators.clustering import (
        _sq_l2,
        assign_clusters,
        update_centroids,
    )
    # spread=True: one-row-group scan; heavy per-row vector work below
    # would otherwise run on one core (no-op at production sizes)
    emb = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    # k-row centroid table feeds one broadcast — checkpoint so the Lloyd
    # update isn't re-derived by every consumer of the cross join
    cent = update_centroids(assign_clusters(emb, cent)).localCheckpoint(
        eager=False
    )
    j = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", F.round(_sq_l2("v", "c"), 6).alias("dist")
    )
    # a (own centroid) and b (nearest other) extracted in ONE grouped pass
    # over the k distances — two struct-mins, no rank window, no self-join
    best = j.groupBy("vec_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("dist", "cid"))), 1, 2
        ).alias("top2")
    )
    sil = best.select(
        "vec_id",
        F.col("top2")[0]["cid"].alias("cid"),
        F.col("top2")[0]["dist"].alias("a_dist"),
        F.col("top2")[1]["dist"].alias("b_dist"),
    ).withColumn(
        "s",
        (F.col("b_dist") - F.col("a_dist"))
        / F.greatest("a_dist", "b_dist"),
    )
    return (
        sil.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.avg("s"), 4).alias("avg_silhouette"),
            F.round(F.min("s"), 4).alias("min_silhouette"),
            F.sum(F.when(F.col("s") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_misassigned"),
        )
        .orderBy("cid")
    )


_MMR_POOL = 20
_MMR_K = 5
_MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in DuckDB: same pool, same λ, same 6-dp rounding
    and min-vec_id tiebreaks as the Spark plan."""
    steps = []
    sel_union = "SELECT vec_id, 1 AS pick FROM sel1"
    for t in range(2, _MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM sel{i}" for i in range(1, t)
        )
        steps.append(f"""
        sel{t} AS (
            SELECT p.vec_id FROM pool p
            JOIN sims s ON s.ai = p.vec_id
             AND s.bi IN ({prev})
            WHERE p.vec_id NOT IN ({prev})
            GROUP BY p.vec_id, p.rel
            ORDER BY ROUND({_MMR_LAMBDA} * p.rel
                           - {1 - _MMR_LAMBDA:.1f} * MAX(s.s), 6) DESC,
                     p.vec_id ASC
            LIMIT 1
        )""")
        sel_union += f" UNION ALL SELECT vec_id, {t} FROM sel{t}"
    return f"""
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings
        WHERE vec_id = 0
    ),
    poolv AS (
        /* EXISTS guard: a missing anchor id must yield an EMPTY pool (and
           so an empty result) exactly like the Spark side's inner
           broadcast join with the empty query frame — otherwise this
           would greedily rank NULL relevances. Redraw-fuzz contract. */
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qvec FROM q)), 6) AS rel
        FROM embeddings
        WHERE EXISTS (SELECT 1 FROM q)
        ORDER BY rel DESC, vec_id ASC LIMIT {_MMR_POOL}
    ),
    pool AS (SELECT vec_id, rel FROM poolv),
    sims AS (
        SELECT a.vec_id AS ai, b.vec_id AS bi,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS s
        FROM poolv a JOIN poolv b ON a.vec_id <> b.vec_id
    ),
    sel1 AS (
        SELECT vec_id FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1
    ),
    {','.join(steps)},
    selected AS ({sel_union})
    SELECT CAST(s.pick AS BIGINT) AS pick,
           s.vec_id AS vec_id,
           p.rel AS relevance
    FROM selected s JOIN pool p ON p.vec_id = s.vec_id
    ORDER BY pick
    """


@register("simsearch_mmr_diversified", oracle=_mmr_oracle())
def simsearch_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    from the exact-cosine top-20 pool for the flagship query vector, greedily
    pick 5 results maximizing λ·relevance − (1−λ)·max-similarity-to-already-
    picked (λ=0.7) — the diversified-retrieval step a RAG stack runs so five
    near-identical chunks don't fill the context window.

    The greedy loop is 5 UNROLLED DataFrame steps over the persisted 20-row
    pool + its 20×20 pairwise-sim table — no driver round-trip, one lazy
    plan, exactly the k-means/PageRank fixed-iteration pattern. All sims
    rounded 6 dp and ties broken by min vec_id, so the DuckDB twin replays
    the identical greedy trajectory. At scale only the pool construction
    (batch exact KNN / ANN) touches the corpus; MMR itself is O(pool²) on
    broadcast-sized data regardless of corpus size."""
    from cobalt_duckdb_spark.functions.vector import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qvec"))
    poolv = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "v",
            F.round(cosine_similarity("v", "qvec"), 6).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(_MMR_POOL)
        .localCheckpoint(eager=False)
    )
    pool = poolv.select("vec_id", "rel")
    a, b = poolv.alias("a"), poolv.alias("b")
    sims = a.join(
        b, F.col("a.vec_id") != F.col("b.vec_id")
    ).select(
        F.col("a.vec_id").alias("ai"),
        F.col("b.vec_id").alias("bi"),
        F.round(cosine_similarity("a.v", "b.v"), 6).alias("s"),
    )
    selected = (
        pool.orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(1)
        .select("vec_id", F.lit(1).alias("pick"))
    )
    for t in range(2, _MMR_K + 1):
        cand = pool.join(selected.select("vec_id"), "vec_id", "left_anti")
        maxsim = (
            sims.join(
                selected.select(F.col("vec_id").alias("bi")), "bi"
            )
            .groupBy("ai")
            .agg(F.max("s").alias("ms"))
        )
        scored = cand.join(
            maxsim, cand["vec_id"] == maxsim["ai"]
        ).select(
            "vec_id",
            F.round(
                F.lit(_MMR_LAMBDA) * F.col("rel")
                - F.lit(round(1 - _MMR_LAMBDA, 1)) * F.col("ms"),
                6,
            ).alias("score"),
        )
        pick_t = (
            scored.orderBy(F.col("score").desc(), F.col("vec_id").asc())
            .limit(1)
            .select("vec_id", F.lit(t).alias("pick"))
        )
        # selected is referenced twice next step (anti-join + max-sim) and
        # chains 5 deep — truncate lineage each step or the global-sort
        # pool/limit stages re-derive exponentially (measured 20 s → <2 s)
        selected = selected.unionAll(pick_t).localCheckpoint(eager=False)
    return (
        selected.join(pool, "vec_id")
        .select(
            F.col("pick").cast("bigint").alias("pick"),
            "vec_id",
            F.col("rel").alias("relevance"),
        )
        .orderBy("pick")
    )


_PCA_DIMS = 64
_PCA_SQUARINGS = 6  # C^(2^6) = 64 effective power iterations


def _pca_oracle() -> str:
    """DuckDB twin of the repeated-squaring power method: same long-format
    covariance, same per-squaring max-abs normalization + 9-dp rounding,
    same final 6-dp direction rounding."""
    parts = [
        f"""long AS MATERIALIZED (
            SELECT vec_id, i, CAST(embedding AS DOUBLE[])[CAST(i AS INT)] AS x
            FROM embeddings CROSS JOIN range(1, {_PCA_DIMS + 1}) t(i)
        )""",
        """mu AS MATERIALIZED (SELECT i, AVG(x) AS m FROM long GROUP BY i)""",
        """centered AS MATERIALIZED (
            SELECT l.vec_id, l.i, l.x - mu.m AS c
            FROM long l JOIN mu ON mu.i = l.i
        )""",
        """cov AS MATERIALIZED (
            SELECT a.i AS i, b.i AS j, AVG(a.c * b.c) AS val
            FROM centered a JOIN centered b ON a.vec_id = b.vec_id
            GROUP BY a.i, b.i
        )""",
        f"""m0 AS MATERIALIZED (
            SELECT i, j,
                   {spark_round_sql("val / (SELECT MAX(ABS(val)) FROM cov)", 9)}
                       AS val
            FROM cov
        )""",
    ]
    for t in range(1, _PCA_SQUARINGS + 1):
        rnd = spark_round_sql(f"val / (SELECT MAX(ABS(val)) FROM sq{t})", 9)
        parts.append(f"""sq{t} AS MATERIALIZED (
            SELECT x.i AS i, y.j AS j, SUM(x.val * y.val) AS val
            FROM m{t - 1} x JOIN m{t - 1} y ON x.j = y.i
            GROUP BY x.i, y.j
        ),
        m{t} AS MATERIALIZED (
            SELECT i, j,
                   {rnd} AS val
            FROM sq{t}
        )""")
    last = _PCA_SQUARINGS
    return f"""
    WITH {','.join(parts)},
    vraw AS MATERIALIZED (SELECT i, SUM(val) AS y FROM m{last} GROUP BY i),
    vnrm AS MATERIALIZED (SELECT SQRT(SUM(y * y)) AS nrm FROM vraw),
    v AS MATERIALIZED (
        SELECT i, {spark_round_sql("y / (SELECT nrm FROM vnrm)", 6)} AS val
        FROM vraw
    ),
    rayleigh AS MATERIALIZED (
        SELECT SUM(va.val * c.val * vb.val) AS lam
        FROM cov c
        JOIN v va ON va.i = c.i
        JOIN v vb ON vb.i = c.j
    )
    SELECT CAST(v.i - 1 AS BIGINT) AS dim,
           v.val AS loading,
           {spark_round_sql("(SELECT lam FROM rayleigh)", 4)} AS eigenvalue
    FROM v
    ORDER BY dim
    """


@register("embedding_pca_power_iteration", oracle=_pca_oracle())
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the mean-centered embedding cloud — the
    anisotropy audit behind "all-but-the-top" correction (Mu & Viswanath
    2018): embedding models concentrate variance in a few directions and
    serving pipelines subtract the dominant one before cosine.
    `eigenvalue` = the Rayleigh quotient vᵀCv (variance captured).

    Two-phase scale design:
    1. ONE pass over the data builds the 64×64 covariance in long format —
       d² mergeable partial sums keyed by (i, j); this is the only stage
       that touches the corpus, and it runs identically over 1e9 vectors.
    2. The power method then runs AGAINST C, not the data — and instead of
       k sequential mat-vecs it uses REPEATED SQUARING: 6 matrix-squarings
       give C^64 (64 effective iterations, enough for this near-flat
       spectrum), each squaring an O(d³) join-aggregate over the tiny
       broadcast-scale matrix. Per-squaring max-abs normalization keeps the
       entries in [−1, 1] (C^64 alone would underflow at ~λ⁶⁴) and 9-dp
       rounding is the cross-engine fixed point (k-means discipline), with
       the final direction rounded at 6 dp."""

    # spread=True: one-row-group scan; heavy per-row vector work below
    # would otherwise run on one core (no-op at production sizes)
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    long = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "d0", "x"
        ),
    ).select("vec_id", (F.col("d0") + 1).alias("i"), "x")
    mu = long.groupBy("i").agg(F.avg("x").alias("m"))
    centered = long.join(mu, "i").select(
        "vec_id", "i", (F.col("x") - F.col("m")).alias("c")
    )
    a, b = centered.alias("a"), centered.alias("b")
    cov = (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.avg(F.col("a.c") * F.col("b.c")).alias("val"))
        .localCheckpoint(eager=False)
    )

    from pyspark.sql import Window

    def _normalized(mat: DataFrame) -> DataFrame:
        # max-abs normalizer as a GLOBAL WINDOW over the (single-partition,
        # d²-row) matrix, not an agg + crossJoin(broadcast(...)): the
        # broadcast variant costs a separate driver job to build the 1-row
        # relation EVERY squaring, and these d²-row iterations are
        # driver-job-latency-bound, not compute-bound (r9 probe: 2.2 s per
        # squaring → ~1 s; identical value — max is order-insensitive).
        mx = F.max(F.abs(F.col("val"))).over(Window.partitionBy())
        return mat.coalesce(1).select(
            "i", "j", F.round(F.col("val") / mx, 9).alias("val")
        )

    # Each squaring references m THREE times (both join sides + its max-abs
    # normalizer); without lineage truncation the unrolled plan re-derives
    # the base exponentially (3^6 ×). The matrix is d²=4096 rows, so an
    # eager localCheckpoint per squaring is microscopic and keeps both the
    # plan and the analysis time linear in the squaring count; coalesce(1)
    # around each checkpoint keeps the squarings narrow single-partition
    # joins (the events_markov_* discipline) instead of 32-way shuffles of
    # 4096 rows.
    m = _normalized(cov).localCheckpoint(eager=True).coalesce(1)
    for _ in range(_PCA_SQUARINGS):
        x, y = m.alias("x"), m.alias("y")
        sq = (
            x.join(y, F.col("x.j") == F.col("y.i"))
            .groupBy(F.col("x.i").alias("i"), F.col("y.j").alias("j"))
            .agg(F.sum(F.col("x.val") * F.col("y.val")).alias("val"))
        )
        m = _normalized(sq).localCheckpoint(eager=True).coalesce(1)
    vraw = m.groupBy("i").agg(F.sum("val").alias("y"))
    vnrm = vraw.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
    v = vraw.crossJoin(F.broadcast(vnrm)).select(
        "i", F.round(F.col("y") / F.col("nrm"), 6).alias("val")
    )
    va = v.select(F.col("i").alias("ri"), F.col("val").alias("va"))
    vb = v.select(F.col("i").alias("rj"), F.col("val").alias("vb"))
    rayleigh = (
        cov.join(F.broadcast(va), F.col("i") == F.col("ri"))
        .join(F.broadcast(vb), F.col("j") == F.col("rj"))
        .agg(F.sum(F.col("va") * F.col("val") * F.col("vb")).alias("lam"))
    )
    return (
        v.crossJoin(F.broadcast(rayleigh))
        .select(
            (F.col("i") - 1).cast("bigint").alias("dim"),
            F.col("val").alias("loading"),
            F.round("lam", 4).alias("eigenvalue"),
        )
        .orderBy("dim")
    )


_RC_K = 5
_RC_NPROBES = (1, 2, 4)
_RC_CELLS = 16


def _recall_curve_oracle() -> str:
    np_values = ", ".join(f"({n})" for n in _RC_NPROBES)
    return f"""
    WITH centroids AS (
        SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings ORDER BY vec_id LIMIT {_RC_CELLS}
    ),
    assigned AS MATERIALIZED (
        SELECT vec_id, embedding, cell FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv),
                                c.centroid_id) AS rn
            FROM embeddings e CROSS JOIN centroids c
        ) WHERE rn = 1
    ),
    q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id IN (0, 1, 2)
    ),
    probes AS (
        SELECT query_id, qv, cell, pr FROM (
            SELECT q.query_id, q.qv, c.centroid_id AS cell,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY 1.0 - list_cosine_similarity(q.qv, c.cv),
                                c.centroid_id) AS pr
            FROM q CROSS JOIN centroids c
        ) WHERE pr <= {max(_RC_NPROBES)}
    ),
    nps(np) AS (VALUES {np_values}),
    cand AS MATERIALIZED (
        SELECT n.np, p.query_id, a.vec_id,
               ROUND(1.0 - list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]), p.qv), 6) AS d
        FROM nps n
        JOIN probes p ON p.pr <= n.np
        JOIN assigned a ON a.cell = p.cell
    ),
    ivf_top AS (
        SELECT np, query_id, vec_id FROM (
            SELECT np, query_id, vec_id,
                   row_number() OVER (
                       PARTITION BY np, query_id ORDER BY d, vec_id) AS rn
            FROM cand
        ) WHERE rn <= {_RC_K}
    ),
    exact_top AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY ROUND(1.0 - list_cosine_similarity(
                                    CAST(e.embedding AS DOUBLE[]), q.qv), 6),
                                e.vec_id) AS rn
            FROM embeddings e CROSS JOIN q
        ) WHERE rn <= {_RC_K}
    ),
    hits AS (
        SELECT i.np, i.query_id, COUNT(x.vec_id) AS n_hit
        FROM ivf_top i
        LEFT JOIN exact_top x
          ON x.query_id = i.query_id AND x.vec_id = i.vec_id
        GROUP BY i.np, i.query_id
    ),
    scanned AS (
        SELECT np, query_id, COUNT(*) AS n_scanned
        FROM cand GROUP BY np, query_id
    ),
    n_total AS (SELECT COUNT(*) AS n FROM embeddings)
    SELECT h.np AS nprobe,
           ROUND(AVG(h.n_hit * 1.0 / {_RC_K}), 4) AS avg_recall_at_{_RC_K},
           ROUND(AVG(s.n_scanned * 1.0 / (SELECT n FROM n_total)), 4)
               AS avg_scanned_share
    FROM hits h JOIN scanned s
      ON s.np = h.np AND s.query_id = h.query_id
    GROUP BY h.np
    ORDER BY nprobe
    """


@register("simsearch_recall_nprobe_curve", oracle=_recall_curve_oracle())
def simsearch_recall_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tuning curve: recall@5 vs fraction-of-corpus-scanned for
    nprobe ∈ {1, 2, 4} against ground-truth exact KNN — the
    accuracy/cost frontier read before freezing an index parameter (recall
    rises with nprobe exactly as scanned share does; the knee is the
    setting you ship). Same 16-cell IVF geometry as ``simsearch_ivf_topk``.

    ONE plan serves every nprobe: candidates materialize once per (nprobe,
    query) via a 3-row nprobe table joined to the ≤4 probe cells — no
    per-setting re-run, and the only corpus-wide stages (assignment, exact
    ground truth) are computed once and shared."""
    from pyspark.sql import Window
    from cobalt_duckdb_spark.functions.vector import cosine_distance

    # spread=True: one-row-group scan; assignment + exact ground-truth
    # cross joins below are per-row HOF folds (no-op at production sizes)
    emb = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # multi-consumer frames materialized once (guide §1.2, r10): cent is
    # read by assignment AND probe ranking (each re-ran the TakeOrdered
    # pass), q by probes AND the exact ground truth, cand by the IVF top-k
    # AND the scanned-count rollup (re-running the whole candidate cosine
    # scoring).
    cent = (
        emb.orderBy("vec_id")
        .limit(_RC_CELLS)
        .select(F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv"))
        .coalesce(1)
        .localCheckpoint(eager=False)
    )
    e, c = emb.alias("e"), cent.alias("c")
    arn = F.row_number().over(
        Window.partitionBy("vec_id").orderBy("cd", "centroid_id")
    )
    assigned = (
        e.crossJoin(F.broadcast(c))
        .select(
            "vec_id",
            "v",
            "centroid_id",
            cosine_distance("v", "cv").alias("cd"),
        )
        .withColumn("rn", arn)
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("centroid_id").alias("cell"))
    )
    q = (
        emb.filter(F.col("vec_id").isin(0, 1, 2))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
        .coalesce(1)
        .localCheckpoint(eager=False)
    )
    prn = F.row_number().over(
        Window.partitionBy("query_id").orderBy("cd", "centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qv",
            "centroid_id",
            cosine_distance("qv", "cv").alias("cd"),
        )
        .withColumn("pr", prn)
        .filter(F.col("pr") <= max(_RC_NPROBES))
        .select("query_id", "qv", F.col("centroid_id").alias("cell"), "pr")
    )
    nps = spark.createDataFrame([(n,) for n in _RC_NPROBES], "np int")
    cand = (
        F.broadcast(nps)
        .join(probes, F.col("pr") <= F.col("np"))
        .join(assigned, "cell")
        .select(
            "np",
            "query_id",
            "vec_id",
            F.round(cosine_distance("v", "qv"), 6).alias("d"),
        )
        .localCheckpoint(eager=False)
    )
    ivf_top = (
        cand.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("np", "query_id").orderBy("d", "vec_id")
            ),
        )
        .filter(F.col("rn") <= _RC_K)
        .select("np", "query_id", "vec_id")
    )
    exact_top = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_distance("v", "qv"), 6).alias("d"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d", "vec_id")
            ),
        )
        .filter(F.col("rn") <= _RC_K)
        .select("query_id", F.col("vec_id").alias("x_vec_id"))
    )
    hits = (
        ivf_top.join(
            exact_top,
            (ivf_top["query_id"] == exact_top["query_id"])
            & (ivf_top["vec_id"] == exact_top["x_vec_id"]),
            "left",
        )
        .groupBy(ivf_top["np"].alias("np"), ivf_top["query_id"].alias("qid"))
        .agg(F.count("x_vec_id").alias("n_hit"))
    )
    scanned = cand.groupBy(
        F.col("np").alias("s_np"), F.col("query_id").alias("s_qid")
    ).agg(F.count(F.lit(1)).alias("n_scanned"))
    n_total = emb.agg(F.count(F.lit(1)).alias("n"))
    return (
        hits.join(
            scanned,
            (F.col("np") == F.col("s_np")) & (F.col("qid") == F.col("s_qid")),
        )
        .crossJoin(F.broadcast(n_total))
        .groupBy(F.col("np").alias("nprobe"))
        .agg(
            F.round(F.avg(F.col("n_hit") / _RC_K), 4).alias(
                f"avg_recall_at_{_RC_K}"
            ),
            F.round(F.avg(F.col("n_scanned") / F.col("n")), 4).alias(
                "avg_scanned_share"
            ),
        )
        .orderBy("nprobe")
    )


@register(
    "embedding_norm_outlier_screen",
    oracle="""
    WITH norms AS (
        SELECT vec_id, label,
               SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    ),
    stats AS (
        SELECT percentile_cont(0.01) WITHIN GROUP (ORDER BY nrm) AS p01,
               percentile_cont(0.5)  WITHIN GROUP (ORDER BY nrm) AS p50,
               percentile_cont(0.99) WITHIN GROUP (ORDER BY nrm) AS p99,
               AVG(nrm) AS mean_norm
        FROM norms
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND((SELECT mean_norm FROM stats), 6) AS mean_norm,
           ROUND((SELECT p50 FROM stats), 6) AS p50_norm,
           ROUND((SELECT p99 FROM stats) / (SELECT p01 FROM stats), 4)
               AS p99_over_p01,
           CAST(SUM(CASE WHEN nrm < (SELECT p50 FROM stats) * 0.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate_low,
           CAST(SUM(CASE WHEN nrm > (SELECT p50 FROM stats) * 2.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate_high
    FROM norms
    """,
)
def embedding_norm_outlier_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding norm health screen: the L2-norm distribution (mean, median,
    p99/p01 spread) plus counts of degenerate vectors (norm < 0.5× or
    > 2× the median) — collapsed-embedding and overflow detection run
    BEFORE vectors enter a cosine index (a near-zero norm makes cosine
    meaningless; `functions/vector.py` maps it to NULL, this query counts
    how often that fires). Complements `embedding_dim_variance_topk`
    (per-dimension) with the per-vector view.

    One map-side norm projection → one exact-percentile aggregate (5-row
    broadcast) → one conditional rollup; approx_percentile swap documented
    at 1e9+ vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda a, b: a * b),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    norms = emb.select(nrm.alias("nrm"))
    stats = norms.agg(
        F.expr("percentile(nrm, 0.01)").alias("p01"),
        F.expr("percentile(nrm, 0.5)").alias("p50"),
        F.expr("percentile(nrm, 0.99)").alias("p99"),
        F.avg("nrm").alias("mean_norm"),
    )
    return norms.crossJoin(F.broadcast(stats)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.first("mean_norm"), 6).alias("mean_norm"),
        F.round(F.first("p50"), 6).alias("p50_norm"),
        F.round(F.first("p99") / F.first("p01"), 4).alias("p99_over_p01"),
        F.sum(
            F.when(F.col("nrm") < F.col("p50") * 0.5, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_degenerate_low"),
        F.sum(
            F.when(F.col("nrm") > F.col("p50") * 2.0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_degenerate_high"),
    )


# ---------------------------------------------------------------------------
# Binary (sign) hashing: 1-bit quantization + Hamming-distance retrieval
# ---------------------------------------------------------------------------

_BH_NQ = 3  # query set: vec_id < 3
_BH_K = 10


@register(
    "simsearch_binary_hamming_topk",
    oracle=f"""
    WITH enc AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(range(0, 32), i ->
                   CASE WHEN embedding[i + 1] > 0
                        THEN (CAST(1 AS BIGINT) << i) ELSE 0 END))
                    AS BIGINT) AS w0,
               CAST(list_sum(list_transform(range(32, 64), i ->
                   CASE WHEN embedding[i + 1] > 0
                        THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END))
                    AS BIGINT) AS w1
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, d.vec_id AS vec_id,
               CAST(bit_count(xor(q.w0, d.w0))
                    + bit_count(xor(q.w1, d.w1)) AS BIGINT) AS hamming
        FROM enc q JOIN enc d ON q.vec_id < {_BH_NQ}
    ),
    ranked AS (
        SELECT query_id, vec_id, hamming,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY hamming, vec_id) AS BIGINT) AS rank
        FROM scored
    )
    SELECT query_id, rank, vec_id, hamming
    FROM ranked WHERE rank <= {_BH_K}
    ORDER BY query_id, rank
    """,
)
def simsearch_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit (sign) vector quantization + Hamming-distance top-k — the
    cheapest ANN tier below PQ: each 64-dim float vector collapses to two
    packed 32-bit words (32x smaller than float32, 64x smaller than the
    reference's float64 store, `/root/reference/model/search/vector.py:134`),
    and distance is two XOR+popcount ops per comparison instead of 64
    multiply-adds. Sign-of-coordinate is the classic SRP hash with the
    identity rotation; `dedup_embedding_srp_lsh` uses random projections for
    recall, this is the brute-force-scan variant used as a *first-stage
    filter* in binary-vector serving stacks.

    Plan: one map-only encode pass (no shuffle — packing is an `aggregate`
    over `sequence`, all codegen), the 3-row query side broadcast, distance
    computed in a BroadcastNestedLoopJoin over bigint XOR (bandwidth-bound
    scan at ~8 bytes/vector), then per-query top-k via window. At 100 TB the
    scan reads 8 bytes x N instead of 256: the binary tier fits ~32x more
    vectors per executor-second; survivors are reranked by exact cosine
    (`simsearch_pq_rerank_exact` shows that stage)."""
    emb = load_table(spark, sf_dir, "embeddings")

    def word(lo: int) -> F.Column:
        return F.expr(
            f"""aggregate(transform(sequence(0, 31), i ->
                    IF(element_at(embedding, i + {lo} + 1) > 0,
                       shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
                CAST(0 AS BIGINT), (a, x) -> a + x)"""
        )

    enc = emb.select(
        "vec_id", word(0).alias("w0"), word(32).alias("w1")
    )
    q = enc.filter(F.col("vec_id") < _BH_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    hamming = (
        F.bit_count(F.col("q.qw0").bitwiseXOR(F.col("d.w0")))
        + F.bit_count(F.col("q.qw1").bitwiseXOR(F.col("d.w1")))
    ).cast("bigint")
    scored = (
        enc.alias("d")
        .crossJoin(F.broadcast(q.alias("q")))
        .select("query_id", F.col("d.vec_id").alias("vec_id"), hamming.alias("hamming"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("rank") <= _BH_K)
        .select("query_id", "rank", "vec_id", "hamming")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# k-NN graph hubness audit
# ---------------------------------------------------------------------------

_HUB_K = 5
_HUB_NQ = 200  # query sample: vec_id < 200 (constant audit cost at any SF)
_HUB_TOP = 10


@register(
    "embedding_knn_hubness_audit",
    oracle=f"""
    WITH nrm AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                   x -> x / sqrt(list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[])))) AS e
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS qid, d.vec_id AS did,
               list_inner_product(q.e, d.e) AS sim
        FROM nrm q JOIN nrm d ON q.vec_id <> d.vec_id
        WHERE q.vec_id < {_HUB_NQ}
    ),
    knn AS (
        SELECT qid, did FROM (
            SELECT qid, did,
                   row_number() OVER (
                       PARTITION BY qid ORDER BY sim DESC, did) AS rn
            FROM scored
        ) WHERE rn <= {_HUB_K}
    ),
    indeg AS (
        SELECT did AS vec_id, COUNT(*) * 1.0 AS d FROM knn GROUP BY did
    ),
    mom AS (
        SELECT AVG(d) AS mu,
               SUM(POW(d - (SELECT AVG(d) FROM indeg), 2)) / COUNT(*) AS m2,
               SUM(POW(d - (SELECT AVG(d) FROM indeg), 3)) / COUNT(*) AS m3,
               COUNT(*) AS n_reached
        FROM indeg
    )
    SELECT CAST(row_number() OVER (ORDER BY i.d DESC, i.vec_id) AS BIGINT)
               AS hub_rank,
           i.vec_id,
           CAST(i.d AS BIGINT) AS in_degree,
           CAST(m.n_reached AS BIGINT) AS n_reached,
           {spark_round_sql("m.m3 / POW(m.m2, 1.5)", 4)} AS in_degree_skew
    FROM indeg i, mom m
    ORDER BY hub_rank LIMIT {_HUB_TOP}
    """,
)
def embedding_knn_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the embedding space: build the k-NN graph (k=5,
    cosine) from a fixed query sample and rank vectors by IN-degree — in
    high dimensions a few points become 'hubs' that appear in everyone's
    neighbor lists (Radovanovic et al. 2010), which silently degrades
    ANN recall, k-NN classification, and dedup clustering. The audit
    reports the top hubs plus the population skewness of the in-degree
    distribution (the standard hubness statistic: skew >> 0 = hubby
    space; ~0 = healthy). Run this BEFORE trusting any `simsearch_*`
    index — it is the embedding-geometry counterpart of
    `embedding_norm_outlier_screen` (norms) and
    `embedding_dim_variance_topk` (coordinates).

    Plan: brute-force scored pairs from a BOUNDED query sample (constant
    200 — audit cost does not scale with the corpus), per-query
    top-k via rank window, then in-degree and its central moments on the
    reached-node frame. Skewness is computed from explicit population
    moments (same discipline as `agg_higher_moments` — Spark's builtin
    and DuckDB's disagree on bias correction)."""
    from pyspark.sql import Window

    from cobalt_duckdb_spark.functions.vector import dot_product, l2_normalize

    # normalize ONCE per row so each pair costs a single 64-element fold:
    # cosine_similarity per pair = 3 interpreted HOF folds (dot + 2 norms),
    # which at 500 x N pairs measured 23.8 s at sf0.1; normalize-then-dot at
    # the 200-query sample is 3.4 s (and the oracle mirrors the same
    # normalize-then-inner-product formula for fold-order parity)
    # spread=True: one-row-group scan; heavy per-row vector work below
    # would otherwise run on one core (no-op at production sizes)
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    nrm = emb.select("vec_id", l2_normalize("embedding").alias("e"))
    q = nrm.filter(F.col("vec_id") < _HUB_NQ).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    d = nrm.select(F.col("vec_id").alias("did"), F.col("e").alias("de"))
    scored = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("did"))
        .select("qid", "did", dot_product("qe", "de").alias("sim"))
    )
    rn = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("sim"), "did")
    )
    knn = scored.withColumn("rn", rn).filter(F.col("rn") <= _HUB_K)
    indeg = knn.groupBy(F.col("did").alias("vec_id")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    mu = indeg.agg(
        F.avg("d").alias("mu"), F.count(F.lit(1)).alias("n_reached")
    )
    dev = F.col("d") - F.col("mu")
    mom = (
        indeg.crossJoin(F.broadcast(mu))
        .agg(
            F.first("mu").alias("mu"),
            (F.sum(dev * dev) / F.count(F.lit(1))).alias("m2"),
            (F.sum(dev * dev * dev) / F.count(F.lit(1))).alias("m3"),
            F.first("n_reached").alias("n_reached"),
        )
    )
    hub_rank = F.row_number().over(Window.orderBy(F.desc("d"), "vec_id"))
    return (
        indeg.crossJoin(F.broadcast(mom))
        .select(
            hub_rank.cast("bigint").alias("hub_rank"),
            "vec_id",
            F.col("d").cast("bigint").alias("in_degree"),
            F.col("n_reached").cast("bigint").alias("n_reached"),
            F.round(F.col("m3") / F.pow("m2", 1.5), 4).alias("in_degree_skew"),
        )
        .orderBy("hub_rank")
        .limit(_HUB_TOP)
    )


# ---------------------------------------------------------------------------
# Embedding isotropy audit (one-pass average pairwise cosine)
# ---------------------------------------------------------------------------


@register(
    "embedding_isotropy_audit",
    oracle="""
    WITH nrm AS (
        SELECT list_transform(CAST(embedding AS DOUBLE[]),
                   x -> x / sqrt(list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[])))) AS e
        FROM embeddings
    ),
    comp AS (
        SELECT i.i AS dim, SUM(e[i.i + 1]) AS s
        FROM nrm CROSS JOIN (SELECT unnest(range(0, 64)) AS i) i
        GROUP BY i.i
    ),
    agg AS (
        SELECT (SELECT SUM(s * s) FROM comp) AS sum_sq,
               (SELECT COUNT(*) FROM nrm) AS n
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           {apc} AS avg_pairwise_cosine,
           ROUND(sqrt(sum_sq) / n, 6) AS mean_vector_norm
    FROM agg
    """.replace(
        # the average pairwise cosine is ~0 by construction for isotropic
        # embeddings — the canonical signed-zero trap shape
        "{apc}", spark_round_sql("(sum_sq - n) / (n * (n - 1.0))", 6)
    ),
)
def embedding_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotropy audit WITHOUT the pairwise join: the average pairwise
    cosine of n normalized vectors equals (||Σv||² − n) / (n(n−1)) — the
    resultant-vector identity — so the O(n²) statistic costs ONE pass and
    a d-component reduction. Anisotropy (avg cosine ≫ 0, the 'narrow
    cone' pathology of transformer embeddings, Ethayarajh 2019) inflates
    all cosine similarities and poisons threshold-based dedup; this is
    the 3-line screen that catches it, complementing
    `embedding_knn_hubness_audit` (neighborhood geometry) and
    `embedding_norm_outlier_screen` (magnitudes). ~0 here = healthy
    isotropic space; the mean resultant norm is the companion
    concentration measure.

    Plan: normalize map-side, per-dimension component sums (d=64 groups,
    mergeable), then scalar arithmetic — corpus touched once, no pair
    enumeration at ANY scale."""
    # spread=True: one-row-group scan; heavy per-row vector work below
    # would otherwise run on one core (no-op at production sizes)
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    from cobalt_duckdb_spark.functions.vector import l2_normalize

    nrm = emb.select(l2_normalize("embedding").alias("e"))
    comp = (
        nrm.select(
            F.posexplode(F.col("e")).alias("dim", "v")
        )
        .groupBy("dim")
        .agg(F.sum("v").alias("s"))
    )
    n_df = nrm.agg(F.count(F.lit(1)).cast("double").alias("n"))
    agg = comp.agg(F.sum(F.col("s") * F.col("s")).alias("sum_sq")).crossJoin(
        F.broadcast(n_df)
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_vectors"),
        F.round(
            (F.col("sum_sq") - F.col("n")) / (F.col("n") * (F.col("n") - 1.0)),
            6,
        ).alias("avg_pairwise_cosine"),
        F.round(F.sqrt("sum_sq") / F.col("n"), 6).alias("mean_vector_norm"),
    )


# ---------------------------------------------------------------------------
# Range (radius) similarity search
# ---------------------------------------------------------------------------

_RANGE_RADIUS = 0.75
_RANGE_QUERY_ID = 0


@register(
    "simsearch_range_radius",
    oracle=f"""
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qvec
        FROM embeddings WHERE vec_id = {_RANGE_QUERY_ID}
    )
    SELECT vec_id,
           ROUND(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                              (SELECT qvec FROM q)), 6)
               AS distance
    FROM embeddings
    WHERE 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                       (SELECT qvec FROM q))
          <= {_RANGE_RADIUS}
    ORDER BY distance, vec_id
    """,
)
def simsearch_range_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) search: EVERY vector within cosine distance
    0.75 of the query — the other retrieval primitive next to
    top-k (dedup thresholds, geofence-style matching, and recall-oriented
    candidate generation are range queries, not k queries: the caller
    bounds QUALITY, not COUNT). Same broadcast-query scan as the
    flagship, but the predicate replaces the rank window — no sort, no
    window, result size data-dependent by design.

    Plan: map-only filtered scan with the distance predicate inlined
    (whole-stage codegen), broadcast 1-row query; a TakeOrdered final
    presentation sort over only the survivors. IVF cell pruning composes
    in front unchanged (`simsearch_ivf_topk`) when the corpus is
    indexed."""
    from cobalt_duckdb_spark.functions.vector import cosine_distance

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == _RANGE_QUERY_ID).select(
        F.col("embedding").alias("qv")
    )
    dist = cosine_distance("embedding", "qv")
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(dist <= _RANGE_RADIUS)
        .select("vec_id", F.round(dist, 6).alias("distance"))
        .orderBy("distance", "vec_id")
    )


# ---------------------------------------------------------------------------
# External cluster validation: purity + NMI against ground-truth labels
# ---------------------------------------------------------------------------

_CV_K = 10


def _cluster_validation_oracle() -> str:
    from cobalt_duckdb_spark.operators.clustering import kmeans_oracle_sql

    base = kmeans_oracle_sql(k=_CV_K, iterations=2)
    prefix = base.split("SELECT cid, CAST(COUNT(*)")[0].rstrip()
    assert prefix.endswith(")")
    return (
        prefix
        + """,
    assigned AS (
        SELECT a.vec_id, a.cid, emb.label
        FROM a2 a JOIN embeddings emb ON a.vec_id = emb.vec_id
        WHERE a.rn = 1
    ),
    joint AS (
        SELECT cid, label, COUNT(*) * 1.0 AS nij FROM assigned GROUP BY 1, 2
    ),
    n_tot AS (SELECT SUM(nij) AS n FROM joint),
    hl AS (
        SELECT -SUM(p * ln(p)) AS h FROM (
            SELECT SUM(nij) / (SELECT n FROM n_tot) AS p
            FROM joint GROUP BY label)
    ),
    hc AS (
        SELECT -SUM(p * ln(p)) AS h FROM (
            SELECT SUM(nij) / (SELECT n FROM n_tot) AS p
            FROM joint GROUP BY cid)
    ),
    hj AS (
        SELECT -SUM(nij / (SELECT n FROM n_tot)
                    * ln(nij / (SELECT n FROM n_tot))) AS h
        FROM joint
    ),
    pur AS (
        SELECT SUM(mx) / (SELECT n FROM n_tot) AS purity FROM (
            SELECT cid, MAX(nij) AS mx FROM joint GROUP BY cid)
    )
    SELECT CAST((SELECT n FROM n_tot) AS BIGINT) AS n_points,
           ROUND((SELECT purity FROM pur), 4) AS purity,
           ROUND(((SELECT h FROM hl) + (SELECT h FROM hc)
                  - (SELECT h FROM hj))
                 / (((SELECT h FROM hl) + (SELECT h FROM hc)) / 2), 4)
               AS nmi
    """
    )


@register("cluster_purity_nmi_vs_labels", oracle=_cluster_validation_oracle())
def cluster_purity_nmi_vs_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTERNAL cluster validation: k-means (k=10, same deterministic
    2-iteration trainer as `cluster_kmeans_lloyd`) scored against the
    embeddings' ground-truth `label` column with purity (majority-label
    mass per cluster) and normalized mutual information (NMI, arithmetic
    normalization) — the supervised half of clustering evaluation next to
    `cluster_silhouette_audit`'s internal geometry. Purity alone inflates
    with k (k = n gives purity 1); NMI's entropy normalization is what
    makes cluster counts comparable — reporting BOTH is the discipline.
    Low scores against these synthetic labels are themselves the honest
    reading: the label field does not organize this embedding space.

    Plan: the trainer's broadcast-centroid assignment feeds a
    |k x labels| contingency aggregate; every entropy term is arithmetic
    over that tiny frame. One corpus-scale stage (assignment), as in the
    trainer itself."""
    from cobalt_duckdb_spark.operators.clustering import kmeans_lloyd
    from pyspark.sql import Window

    # spread=True: the embeddings file is one parquet row group (one scan
    # task), and everything until the first shuffle — the k×n HOF distance
    # folds of BOTH Lloyd assignments — would run on a single core (guide
    # §2.5 unsplittable input; no-op at production input sizes)
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = (
        kmeans_lloyd(vecs, k=_CV_K, iterations=2)
        .select("vec_id", "cid")
        .join(emb.select("vec_id", "label"), "vec_id")
    )
    joint = (
        assigned.groupBy("cid", "label")
        .agg(F.count(F.lit(1)).cast("double").alias("nij"))
        # consumed FIVE times below (n_tot, hl, hc, hj, purity): without a
        # checkpoint each consumer re-plans — and re-runs — the entire
        # k-means assignment subtree (the r9 before-plan carried 114
        # Exchange and 52 BroadcastNestedLoopJoin nodes for one k×labels
        # contingency table). Materialize the ≤ k·|labels|-row frame once;
        # everything downstream is arithmetic on ≤100 rows (guide §1.2
        # "don't compute things you throw away" / §5 localCheckpoint).
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    n_tot = joint.agg(F.sum("nij").alias("n"))
    jt = joint.crossJoin(F.broadcast(n_tot))
    hl = (
        jt.groupBy("label")
        .agg((F.sum("nij") / F.first("n")).alias("p"))
        .agg((-F.sum(F.col("p") * F.log("p"))).alias("hl"))
    )
    hc = (
        jt.groupBy("cid")
        .agg((F.sum("nij") / F.first("n")).alias("p"))
        .agg((-F.sum(F.col("p") * F.log("p"))).alias("hc"))
    )
    hj = jt.agg(
        (
            -F.sum(
                (F.col("nij") / F.col("n")) * F.log(F.col("nij") / F.col("n"))
            )
        ).alias("hj")
    )
    pur = (
        jt.groupBy("cid")
        .agg(F.max("nij").alias("mx"), F.first("n").alias("n"))
        .agg((F.sum("mx") / F.first("n")).alias("purity"))
    )
    return (
        n_tot.crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hj))
        .crossJoin(F.broadcast(pur))
        .select(
            F.col("n").cast("bigint").alias("n_points"),
            F.round("purity", 4).alias("purity"),
            F.round(
                (F.col("hl") + F.col("hc") - F.col("hj"))
                / ((F.col("hl") + F.col("hc")) / 2),
                4,
            ).alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# Triplet margin audit (contrastive training-pair mining)
# ---------------------------------------------------------------------------

_TRIP_NQ = 100
_TRIP_MARGIN = 0.05


@register(
    "train_triplet_margin_audit",
    oracle=f"""
    WITH nrm AS (
        SELECT vec_id, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                   x -> x / sqrt(list_inner_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[])))) AS e
        FROM embeddings
    ),
    anchors AS (SELECT * FROM nrm WHERE vec_id < {_TRIP_NQ}),
    scored AS (
        SELECT a.vec_id AS aid, a.label AS albl, d.label AS dlbl,
               list_inner_product(a.e, d.e) AS sim
        FROM anchors a JOIN nrm d ON a.vec_id <> d.vec_id
    ),
    pos AS (
        SELECT aid, albl, MAX(sim) AS pos_sim
        FROM scored WHERE albl = dlbl GROUP BY aid, albl
    ),
    neg AS (
        SELECT aid, MAX(sim) AS neg_sim
        FROM scored WHERE albl <> dlbl GROUP BY aid
    )
    SELECT p.albl AS label,
           CAST(COUNT(*) AS BIGINT) AS n_anchors,
           ROUND(AVG(p.pos_sim - n.neg_sim), 6) AS mean_margin,
           ROUND(MIN(p.pos_sim - n.neg_sim), 6) AS min_margin,
           CAST(SUM(CASE WHEN p.pos_sim - n.neg_sim < {_TRIP_MARGIN}
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_margin_violations
    FROM pos p JOIN neg n USING (aid)
    GROUP BY p.albl ORDER BY p.albl
    """,
)
def train_triplet_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training triplet audit: for each anchor in a bounded
    sample, the hardest POSITIVE (best same-label neighbor) against the
    hardest NEGATIVE (best other-label neighbor), reported as per-label
    margin statistics and the count of margin violations (pos − neg <
    0.05) — i.e., how often the hardest negative beats the positive, the
    exact quantity a triplet/InfoNCE loss optimizes and the health check
    run on mined pairs BEFORE burning GPU time on them
    (`simsearch_hard_negatives` mines the negatives; this scores whether
    the resulting triplets carry signal). High violation rates against
    these synthetic labels = the labels don't structure the space — the
    same honest reading as `cluster_purity_nmi_vs_labels`, measured at
    the pair level.

    Plan: normalize once, bounded anchor sample broadcast against the
    corpus scan (single dot fold per pair — the hubness-audit discipline),
    two conditional MAX aggregates per anchor, label-sized rollup."""
    from cobalt_duckdb_spark.functions.vector import dot_product, l2_normalize

    # spread=True: one-row-group scan; heavy per-row vector work below
    # would otherwise run on one core (no-op at production sizes)
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    nrm = emb.select("vec_id", "label", l2_normalize("embedding").alias("e"))
    anchors = nrm.filter(F.col("vec_id") < _TRIP_NQ).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("albl"),
        F.col("e").alias("ae"),
    )
    d = nrm.select(
        F.col("vec_id").alias("did"),
        F.col("label").alias("dlbl"),
        F.col("e").alias("de"),
    )
    scored = (
        d.crossJoin(F.broadcast(anchors))
        .filter(F.col("aid") != F.col("did"))
        .select(
            "aid", "albl", "dlbl", dot_product("ae", "de").alias("sim")
        )
    )
    pos = (
        scored.filter(F.col("albl") == F.col("dlbl"))
        .groupBy("aid", "albl")
        .agg(F.max("sim").alias("pos_sim"))
    )
    neg = (
        scored.filter(F.col("albl") != F.col("dlbl"))
        .groupBy("aid")
        .agg(F.max("sim").alias("neg_sim"))
    )
    margin = F.col("pos_sim") - F.col("neg_sim")
    return (
        pos.join(neg, "aid")
        .groupBy(F.col("albl").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
            F.round(F.avg(margin), 6).alias("mean_margin"),
            F.round(F.min(margin), 6).alias("min_margin"),
            F.sum(F.when(margin < _TRIP_MARGIN, 1).otherwise(0))
            .cast("bigint")
            .alias("n_margin_violations"),
        )
        .orderBy("label")
    )
