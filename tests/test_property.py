"""Property-based differential tests (hypothesis): each custom operator vs
an independent reference implementation on randomized inputs — the layer the
fixed testdata can't provide (ties, empty keys, adversarial orderings)."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from cobalt_duckdb_spark.functions.vector import (
    cosine_distance,
    make_cosine_distance_pandas_udf,
)
from cobalt_duckdb_spark.operators.dedup import ngram_jaccard_pairs
from cobalt_duckdb_spark.operators.joins import asof_join

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def asof_case(draw):
    keys = draw(st.lists(st.integers(0, 3), min_size=1, max_size=8))
    left = [(k, draw(st.integers(0, 50))) for k in keys]
    right_keys = draw(st.lists(st.integers(0, 3), min_size=0, max_size=8))
    right = [
        (k, draw(st.integers(0, 50)), draw(st.integers(0, 1000)))
        for k in right_keys
    ]
    return left, right


@given(asof_case(), st.sampled_from(["backward", "forward"]))
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, case, direction):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k BIGINT, t BIGINT, lid BIGINT"
    )
    # dedupe right to latest-(k,t) max-v like the operator pins
    rmap = {}
    for k, t, v in right_rows:
        rmap[(k, t)] = max(v, rmap.get((k, t), -1))
    rrows = [(k, t, v) for (k, t), v in rmap.items()]
    right = spark.createDataFrame(rrows or [], "k BIGINT, t BIGINT, v BIGINT")

    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t",
            right_values=["v"], direction=direction
        ).collect()
    }

    if rrows:
        lpdf = pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left_rows)],
            columns=["k", "t", "lid"],
        ).sort_values("t", kind="stable")
        rpdf = pd.DataFrame(rrows, columns=["k", "t", "v"]).sort_values(
            "t", kind="stable"
        )
        merged = pd.merge_asof(
            lpdf, rpdf, on="t", by="k", direction=direction
        )
        want = {
            int(r.lid): (None if pd.isna(r.v) else int(r.v))
            for r in merged.itertuples()
        }
    else:
        want = {i: None for i in range(len(left_rows))}
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.lists(st.floats(-10, 10, allow_nan=False), min_size=4, max_size=4),
            st.lists(st.floats(-10, 10, allow_nan=False), min_size=4, max_size=4),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_cosine_distance_matches_numpy(spark, pairs):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "id BIGINT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    got = {
        r["id"]: r["d"]
        for r in df.select("id", cosine_distance("a", "b").alias("d")).collect()
    }
    for i, (a, b) in enumerate(pairs):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0.0 or nb == 0.0:
            assert got[i] is None
        else:
            want = 1.0 - float(np.dot(a, b) / (na * nb))
            assert math.isclose(got[i], want, rel_tol=1e-9, abs_tol=1e-9)


def test_cosine_pandas_udf_fast_path_matches_expression(spark, sf_dir):
    from cobalt_duckdb_spark.io import load_table
    from cobalt_duckdb_spark.operators.knn import query_vector_of

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = query_vector_of(emb, 0)
    udf_col = make_cosine_distance_pandas_udf(qvec)
    expr_col = cosine_distance(
        F.col("embedding"), F.array(*[F.lit(float(x)) for x in qvec])
    )
    rows = emb.select(
        "vec_id", udf_col(F.col("embedding")).alias("du"), expr_col.alias("de")
    ).collect()
    assert rows
    for r in rows:
        assert math.isclose(r["du"], r["de"], rel_tol=1e-9, abs_tol=1e-9)


@given(
    st.lists(
        st.lists(st.sampled_from(list("abcdef")), min_size=1, max_size=12),
        min_size=2,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_inverted_jaccard_matches_naive(spark, token_docs):
    docs = spark.createDataFrame(
        [(i, " ".join(toks), len(" ".join(toks))) for i, toks in enumerate(token_docs)],
        "doc_id BIGINT, text STRING, n_chars BIGINT",
    )
    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0, n=2).collect()
    }

    def bigrams(toks):
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    for i, ta in enumerate(token_docs):
        for j, tb in enumerate(token_docs):
            if i >= j:
                continue
            sa, sb = bigrams(ta), bigrams(tb)
            if not sa or not sb:
                assert (i, j) not in got
                continue
            inter = len(sa & sb)
            if inter == 0:
                # inverted index only yields pairs sharing >=1 shingle
                assert (i, j) not in got
                continue
            want = inter / len(sa | sb)
            assert math.isclose(got[(i, j)], want, rel_tol=1e-6, abs_tol=1e-6), (
                i,
                j,
                ta,
                tb,
            )


@given(asof_case(), st.integers(1, 25), st.sampled_from(["backward", "forward"]))
@settings(**SETTINGS)
def test_asof_join_bucketed_matches_pandas(spark, case, width, direction):
    """The time-bucketed skew-safe variant must agree with pandas merge_asof
    for EVERY monotone bucket width — including width 1 (every row its own
    bucket ⇒ all matches come from the carry spine) and widths larger than
    the time domain (single bucket ⇒ pure local path)."""
    from cobalt_duckdb_spark.operators.joins import asof_join_bucketed

    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        "k BIGINT, t BIGINT, lid BIGINT",
    )
    rmap = {}
    for k, t, v in right_rows:
        rmap[(k, t)] = max(v, rmap.get((k, t), -1))
    rrows = [(k, t, v) for (k, t), v in rmap.items()]
    right = spark.createDataFrame(rrows or [], "k BIGINT, t BIGINT, v BIGINT")

    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join_bucketed(
            left, right, on="k", left_time="t", right_time="t",
            right_values=["v"], bucket_fn=lambda t: F.floor(t / width),
            direction=direction,
        ).collect()
    }

    if rrows:
        lpdf = pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left_rows)],
            columns=["k", "t", "lid"],
        ).sort_values("t", kind="stable")
        rpdf = pd.DataFrame(rrows, columns=["k", "t", "v"]).sort_values(
            "t", kind="stable"
        )
        merged = pd.merge_asof(lpdf, rpdf, on="t", by="k", direction=direction)
        want = {
            int(r.lid): (None if pd.isna(r.v) else int(r.v))
            for r in merged.itertuples()
        }
    else:
        want = {i: None for i in range(len(left_rows))}
    assert got == want


@st.composite
def interval_case(draw):
    n = draw(st.integers(1, 12))
    return [
        (draw(st.integers(0, 2)), draw(st.integers(0, 100)))
        for _ in range(n)
    ]


@given(interval_case())
@settings(**SETTINGS)
def test_interval_islands_match_bruteforce(spark, case):
    """Gaps-and-islands union-of-intervals coverage vs a brute-force
    point-set union, on random (user, start) pairs with width-10
    intervals — covers nested, touching, and duplicate intervals."""
    from pyspark.sql import Window

    width = 10
    df = spark.createDataFrame(
        case, "user_id BIGINT, s BIGINT"
    ).withColumn("e", F.col("s") + width)
    order = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max = F.max("e").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.select(
        "user_id", "s", "e",
        F.when(F.col("s") > F.coalesce(prev_max, F.lit(-1)), 1)
        .otherwise(0).alias("ni"),
    )
    islands = flagged.select(
        "user_id", "s", "e",
        F.sum("ni").over(order.rowsBetween(Window.unboundedPreceding, 0))
        .alias("gid"),
    )
    got = {
        r["user_id"]: r["cov"]
        for r in islands.groupBy("user_id", "gid")
        .agg((F.max("e") - F.min("s")).alias("d"))
        .groupBy("user_id")
        .agg(F.sum("d").alias("cov"))
        .collect()
    }
    want = {}
    for u in {k for k, _ in case}:
        pts = set()
        for k, s in case:
            if k == u:
                pts.update(range(s, s + width))
        want[u] = len(pts)
    assert got == want


@st.composite
def cdc_doc(draw):
    words = draw(st.lists(st.sampled_from(
        ["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=4, max_size=60))
    return " ".join(words)


@given(cdc_doc())
@settings(**SETTINGS)
def test_cdc_chunks_conserve_and_determinism(spark, doc):
    """CDC chunking conserves every token (counts sum to doc length),
    chunk ids are contiguous from 0, and re-chunking the same text yields
    the identical fingerprint multiset."""
    from cobalt_duckdb_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame([(1, doc), (2, doc)], "doc_id long, text string")
    rows = cdc_chunks(df).collect()
    for did in (1, 2):
        mine = sorted(
            (r["chunk_id"], r["n_tokens"], r["fingerprint"])
            for r in rows if r["doc_id"] == did
        )
        assert sum(n for _, n, _ in mine) == len(doc.split(" "))
        assert [c for c, _, _ in mine] == list(range(len(mine)))
    fps = lambda d: sorted(r["fingerprint"] for r in rows if r["doc_id"] == d)  # noqa: E731
    assert fps(1) == fps(2)
