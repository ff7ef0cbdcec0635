"""Flagship KNN (SURVEY.md §2.11) — correctness + pinned edge semantics."""

import math

from pyspark.sql import functions as F

from cobalt_duckdb_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)
from cobalt_duckdb_spark.io import load_table, EXPECTED_DDL, TABLE_NAMES
from cobalt_duckdb_spark.operators.knn import knn_topk, knn_topk_batch, query_vector_of
from cobalt_duckdb_spark.queries import QUERIES


def test_testdata_schemas_pinned(spark, sf_dir):
    from pyspark.sql.types import StructType

    for name in TABLE_NAMES:
        expected = StructType.fromDDL(EXPECTED_DDL[name])
        actual = load_table(spark, sf_dir, name).schema
        assert [f.name for f in actual] == [f.name for f in expected], name


def test_flagship_shape_and_order(spark, sf_dir):
    out = QUERIES["flagship_knn_cosine_topk"](spark, sf_dir).collect()
    assert len(out) == 10
    assert [r["rank"] for r in out] == list(range(1, 11))
    # query vector IS embedding 0 → self-match first at distance 0
    assert out[0]["doc_id"] == 0
    assert abs(out[0]["distance"]) < 1e-9
    dists = [r["distance"] for r in out]
    assert dists == sorted(dists)


def test_vector_functions_handchecked(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [0.0, 1.0]),   # orthogonal → sim 0, dist 1
            (2, [1.0, 2.0], [2.0, 4.0]),   # parallel → sim 1, dist 0
            (3, [0.0, 0.0], [1.0, 1.0]),   # zero vector → NULL
            (4, [1.0, 0.0], [-1.0, 0.0]),  # opposite → dist 2
        ],
        "id INT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            dot_product("a", "b").alias("dot"),
            l2_norm("a").alias("na"),
            cosine_similarity("a", "b").alias("sim"),
            cosine_distance("a", "b").alias("dist"),
        ).collect()
    }
    assert rows[1]["dot"] == 0.0 and rows[1]["dist"] == 1.0
    assert abs(rows[2]["sim"] - 1.0) < 1e-12
    assert rows[3]["sim"] is None and rows[3]["dist"] is None
    assert abs(rows[4]["dist"] - 2.0) < 1e-12
    assert math.isclose(rows[2]["na"], math.sqrt(5.0))


def test_l2_normalize(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id INT, v ARRAY<DOUBLE>"
    )
    rows = {r["id"]: r["n"] for r in df.select("id", l2_normalize("v").alias("n")).collect()}
    assert [round(x, 12) for x in rows[1]] == [0.6, 0.8]
    assert rows[2] is None


def test_knn_ties_break_by_id_and_k_exceeds_n(spark):
    emb = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [1.0, 0.0]), (12, [0.0, 1.0])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    docs = spark.createDataFrame(
        [(10, "a"), (11, "b"), (12, "c")], "doc_id BIGINT, text STRING"
    )
    out = knn_topk(emb, docs, F.array(F.lit(1.0), F.lit(0.0)), k=99).collect()
    assert len(out) == 3  # k > N → all rows
    assert [r["doc_id"] for r in out] == [10, 11, 12]  # tie 10/11 broken by id


def test_knn_batch_one_job_matches_loop(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_topk_batch(emb, qs, k=5)
    rows = out.collect()
    assert len(rows) == 15
    for qid in (0, 1, 2):
        per = [r for r in rows if r["query_id"] == qid]
        assert [r["rank"] for r in per] == [1, 2, 3, 4, 5]
        assert per[0]["vec_id"] == qid  # self-match at rank 1
        assert abs(per[0]["distance"]) < 1e-6


def test_query_vector_of_missing_raises(spark, sf_dir):
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(KeyError):
        query_vector_of(emb, 10**12)


def test_spark_search_client_reference_contract(spark, sf_dir):
    """Drop-in client parity with RuriDuckDBSearchClient: from_dataframe +
    search_top_n returns, per query, the dataset's own columns + score +
    0-based rank; a str query and a [str] query give identical results; a
    2-query list runs set-oriented and returns 2 frames."""
    from cobalt_duckdb_spark.client import SparkSearchClient
    from cobalt_duckdb_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    client = SparkSearchClient.from_dataframe(docs, "text", dim=16)

    [res] = client.search_top_n("key agg row scan", n=5)
    rows = res.collect()
    assert len(rows) == 5
    assert {"doc_id", "text", "lang", "score", "rank"} <= set(res.columns)
    assert [r["rank"] for r in rows] == [0, 1, 2, 3, 4]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores)

    [res2] = client.search_top_n(["key agg row scan"], n=5)
    assert [r["doc_id"] for r in res2.collect()] == [r["doc_id"] for r in rows]

    both = client.search_top_n(["key agg row scan", "stream window join"], n=3)
    assert len(both) == 2
    assert all(len(b.collect()) == 3 for b in both)
