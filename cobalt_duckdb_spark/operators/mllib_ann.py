"""MLlib-backed approximate similarity (SURVEY.md §2.3 J5 scale path).

Wraps Spark MLlib's LSH estimators over the engine's array-column data
model: ``BucketedRandomProjectionLSH`` (Euclidean) for embedding near-dup /
ANN joins and ``MinHashLSH`` over token sets as an alternative to the
hand-rolled MinHash in operators/dedup.py. Fixed seeds → deterministic
across runs (but not SQL-replayable, so queries using these are rows-only
checked; pytest pins recall against brute force).

Arrays convert to ml Vectors via ``pyspark.ml.functions.array_to_vector`` —
JVM-side, no Python round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def brp_near_dup_pairs(
    embeddings: DataFrame,
    max_l2_distance: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-duplicate pairs under Euclidean distance via
    BucketedRandomProjectionLSH.approxSimilarityJoin. On L2-normalized
    vectors, L2 and cosine orderings agree (||a−b||² = 2−2cos), so this is
    the MLlib route to cosine near-dup at scale."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, max_l2_distance, distCol="l2_dist")
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("a_id"),
            F.col(f"datasetB.{id_col}").alias("b_id"),
            F.round("l2_dist", 6).alias("l2_dist"),
        )
        .orderBy("a_id", "b_id")
    )


def minhash_lsh_token_pairs(
    docs: DataFrame,
    max_jaccard_distance: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hash_tables: int = 5,
    vocab_size: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """MLlib MinHashLSH over hashed token sets (sparse binary vectors).
    Alternative to the hand-rolled MinHash+banding in operators/dedup.py —
    same candidate-generation idea, library implementation.

    The token-set → sparse-vector step is ``HashingTF(binary=True)`` — a JVM
    transformer (MurmurHash3 on the token string, deterministic across runs,
    processes, and cluster layouts), so NO Python appears anywhere in the
    plan. Round-3 advice: the previous row-at-a-time ``@udf(VectorUDT())``
    sparse-vector builder was exactly the BatchEvalPython pattern
    tools/plan_audit.py bans, surviving only because this operator is
    pytest-reachable rather than registry-reachable; test_plans now audits
    it too."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from cobalt_duckdb_spark.functions.text import tokens

    tokenized = docs.select(
        F.col(id_col),
        F.array_distinct(tokens(text_col)).alias("toks"),
    ).filter(F.size("toks") > 0)

    hasher = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=vocab_size, binary=True
    )
    vecs = hasher.transform(tokenized).select(F.col(id_col), "features")
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(
        vecs, vecs, max_jaccard_distance, distCol="jaccard_dist"
    )
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("a_id"),
            F.col(f"datasetB.{id_col}").alias("b_id"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .orderBy("a_id", "b_id")
    )
