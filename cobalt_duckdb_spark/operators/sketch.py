"""Count-Min Sketch frequency estimation (north star: "a novel sketch" as a
first-class distributed operator).

A CMS is a d×w counter grid; item x increments one counter per row j at
column ((a_j·hash(x)+b_j) mod p) mod w, and its frequency estimate is the
MIN over rows — always ≥ the true count, with overestimate bounded by
(e/w)·N at probability 1−(1/e)^d. Building it is ONE hash aggregate over
(row, bucket) — d·w bounded state regardless of input size, mergeable
across partitions/streams, which is exactly why sketches beat exact
counting at 100 TB.

Hash family is hardcoded (seed 7), built on the cross-engine md5 token hash
(operators/dedup.py), so the DuckDB oracle replays the identical sketch —
the estimate column is deterministic, not just statistically characterized.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cobalt_duckdb_spark.operators.dedup import MINHASH_PRIME, fan_out, token_hash

CMS_DEPTH = 4
CMS_WIDTH = 1024

_rng = random.Random(7)
CMS_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, 2**30), _rng.randrange(0, 2**30)) for _ in range(CMS_DEPTH)
]


def _bucket(x: Column, j: int) -> Column:
    a, b = CMS_COEFFS[j]
    return ((F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_PRIME)) % F.lit(CMS_WIDTH)


def cms_build(items: DataFrame, item_col: str = "item") -> DataFrame:
    """(row, bucket, cnt) counter table — ≤ d·w rows total."""
    x = token_hash(F.col(item_col))
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("row"), _bucket(x, j).alias("bucket"))
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("rb")
    )
    return rows.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))


def cms_estimate(sketch: DataFrame, candidates: DataFrame, item_col: str = "item") -> DataFrame:
    """min-over-rows estimate for each candidate item (broadcast the sketch —
    it's ≤ d·w rows by construction)."""
    x = token_hash(F.col(item_col))
    probes = candidates.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("row"), _bucket(x, j).alias("bucket"))
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("rb"),
    ).select(item_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(item_col)
        .agg(F.min("cnt").cast("bigint").alias("cms_estimate"))
    )


def cms_oracle_sql(top_k: int = 20) -> str:
    """DuckDB SQL replaying the identical sketch for the heavy-hitters query
    (token stream = whitespace tokens of documents.text)."""
    tok_hash = "('0x' || substr(md5(tok), 1, 8))::BIGINT"
    bucket_structs = ", ".join(
        "{'row': %d, 'bucket': ((%d * x + %d) %% %d) %% %d}"
        % (j, a, b, MINHASH_PRIME, CMS_WIDTH)
        for j, (a, b) in enumerate(CMS_COEFFS)
    )
    return f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    hashed AS (SELECT tok, {tok_hash} AS x FROM toks),
    entries AS (
        SELECT rb.row AS row, rb.bucket AS bucket
        FROM (SELECT unnest([{bucket_structs}]) AS rb FROM hashed)
    ),
    sketch AS (
        SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM entries GROUP BY 1, 2
    ),
    exact AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM toks GROUP BY tok
        ORDER BY exact_count DESC, tok LIMIT {top_k}
    ),
    probes AS (
        SELECT e.tok, e.exact_count, rb.row AS row, rb.bucket AS bucket
        FROM (SELECT tok, exact_count, {tok_hash} AS x FROM exact) e,
             LATERAL (SELECT unnest([{bucket_structs}]) AS rb)
    )
    SELECT p.tok AS token, p.exact_count AS exact_count,
           CAST(MIN(s.cnt) AS BIGINT) AS cms_estimate
    FROM probes p JOIN sketch s ON p.row = s.row AND p.bucket = s.bucket
    GROUP BY 1, 2
    ORDER BY exact_count DESC, token
    """


def heavy_hitters_with_cms(
    docs: DataFrame, top_k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-k tokens by exact count, annotated with their CMS estimate — the
    side-by-side a pipeline uses to validate sketch accuracy before dropping
    the exact (shuffle-heavy) path at scale."""
    toks = fan_out(docs).select(
        F.explode(F.split(F.col(text_col), " ")).alias("item")
    )
    # ONE tokenize+shuffle pass: per-token exact counts. The sketch is then
    # built from the WEIGHTED counts — increment-by-count ≡ increment-per-
    # occurrence because a token's (row, bucket) cells are fixed — so the
    # d·w grid aggregates vocab-sized input instead of re-hashing the full
    # token stream, and the md5 runs once per distinct token, not per
    # occurrence. counts is vocab-sized; persisting it serves the sketch,
    # the top-k, and the estimate probe from one materialization (the
    # build_vector_store pattern).
    counts = (
        toks.groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .localCheckpoint(eager=False)
    )
    x = token_hash(F.col("item"))
    cells = counts.select(
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("row"), _bucket(x, j).alias("bucket"))
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("rb"),
    )
    sketch = cells.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.sum("exact_count").cast("bigint").alias("cnt"))
    exact = counts.orderBy(F.desc("exact_count"), F.asc("item")).limit(top_k)
    est = cms_estimate(sketch, exact.select("item"))
    return (
        exact.join(est, "item")
        .select(
            F.col("item").alias("token"),
            "exact_count",
            "cms_estimate",
        )
        .orderBy(F.desc("exact_count"), F.asc("token"))
    )
