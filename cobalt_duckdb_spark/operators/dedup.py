"""Deduplication operators (north star: training-data pipeline dedup).

Four families, all deterministic and (except SimHash pair-search) expressible
in the DuckDB oracle for differential testing:

- exact: md5 fingerprint group-by (one shuffle on the hash — at 100 TB this
  is THE cheap first pass; hash keys distribute uniformly so no skew).
- n-gram Jaccard: all-pairs exact similarity restricted by a length-bucket
  blocking key (near-dups have near-equal length; each doc joins only its
  own + adjacent bucket → candidate count drops ~quadratically vs naive).
- MinHash + LSH: shingle → 32 permutation-min signature → 8 bands × 4 rows →
  bucket join → exact-Jaccard verification of candidates. Hash family is
  (a·x + b) mod p over a 32-bit token hash with hardcoded (a, b) so results
  are reproducible anywhere (no Spark-internal murmur dependence).
- SimHash: 32-bit sign-aggregated fingerprint + Hamming-distance pairs.

Scale notes: every family is join/agg-only (no UDFs, no driver loops). LSH
candidate generation shuffles on the band key — bounded by bands × docs rows.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cobalt_duckdb_spark.functions.text import fingerprint, shingles

# --- shared deterministic 32-bit token hash ---------------------------------
# First 8 hex chars of md5, parsed as unsigned int. Identical in DuckDB via
#   ('0x' || substr(md5(s), 1, 8))::BIGINT
# so every dedup operator is cross-engine reproducible.

TOKEN_HASH_SQL_DUCKDB = "('0x' || substr(md5({col}), 1, 8))::BIGINT"


def token_hash(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


# --- MinHash hash family (hardcoded, seed=42) -------------------------------

MINHASH_PRIME = 4294967311  # smallest prime > 2^32
NUM_HASHES = 32
LSH_BANDS = 8
LSH_ROWS = 4  # NUM_HASHES = LSH_BANDS * LSH_ROWS

_rng = random.Random(42)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, 2**30), _rng.randrange(0, 2**30)) for _ in range(NUM_HASHES)
]
# a < 2^30 and x < p ≈ 2^32 keep a·x + b < 2^62 — no BIGINT overflow in
# either engine.


def fan_out(
    df: DataFrame, partitions: int | None = None, by: str | None = None
) -> DataFrame:
    """Repartition before heavy per-row expression work. The testdata tables
    arrive as a single small Parquet file → one input split → ONE core doing
    all the shingling/hashing. One cheap shuffle of the id+text rows buys
    full-core parallelism. At 100 TB inputs arrive in thousands of splits
    and this is a no-op choice — keep it keyed to the session's parallelism,
    not a constant.

    ``by`` hash-partitions on a column instead of round-robin: a downstream
    window/groupBy on that column then REUSES this user-pinned partitioning —
    no second shuffle, and (critically) no AQE coalescing: AQE respects
    explicit repartition counts but shrinks its own small shuffles, which
    would collapse a CPU-bound window over few MB of data onto 4 cores."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(by)) if by else df.repartition(n)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup via normalized-text fingerprint: every row mapped to its
    group keeper (min id) + group size. One hash-partitioned shuffle."""
    fp = df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    groups = fp.groupBy("fp").agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).cast("bigint").alias("group_size"),
    )
    return fp.join(groups, "fp").select(id_col, "keeper_id", "group_size")


def length_bucket(col: Column | str, width: int = 64) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (c / width).cast("bigint")


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT all-pairs n-gram-shingle Jaccard ≥ threshold via an
    inverted-index set-similarity join — no blocking, no recall loss.

    Shape: explode each doc's distinct shingles, self-join on the shingle
    hash (only docs sharing ≥1 shingle ever meet), count shared shingles per
    pair in one hash aggregate, then j = common / (|A|+|B|−common). Cost is
    Σ_shingle freq² join rows — data-dependent but never the |docs|² of a
    naive cross product, and every per-pair step is O(1) (no array
    intersection in the pair loop).

    ``max_df`` is the hot-shingle guard for corpus scale: shingles appearing
    in more than ``max_df`` documents (boilerplate, stop-phrases) are dropped
    from the INDEX side before the self-join, capping its fan-out at
    max_df² per shingle instead of freq². Per-doc shingle totals keep the
    original counts, so surviving pairs still score true Jaccard with
    ``common`` undercounted by at most the dropped shingles — a lower
    bound; pairs whose overlap is mostly boilerplate (the ones a near-dup
    pass SHOULD ignore) fall below threshold, everything else is unchanged
    (tested). Default None = exact (the oracle-checked configuration).

    The (id, ns, hash) shingle table is consumed twice by the self-join:
    materialized via ``localCheckpoint`` (blocks are ContextCleaner-freed
    when the plan is GC'd, unlike SQL-cache entries, which would accumulate
    across a long multi-query session).
    """
    ex = shingle_hashes(docs, id_col, text_col, n).localCheckpoint(eager=False)
    idx = ex
    if max_df is not None:
        keep = (
            ex.groupBy("h")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("h")
        )
        idx = ex.join(keep, "h")

    pairs = (
        idx.select(F.col(id_col).alias("a_id"), F.col("ns").alias("a_ns"), "h")
        .join(
            idx.select(F.col(id_col).alias("b_id"), F.col("ns").alias("b_ns"), "h"),
            "h",
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("common"),
            F.first("a_ns").alias("a_ns"),
            F.first("b_ns").alias("b_ns"),
        )
    )
    return (
        pairs.select(
            "a_id",
            "b_id",
            (F.col("common") / (F.col("a_ns") + F.col("b_ns") - F.col("common"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", round_to).alias("jaccard"))
        .orderBy("a_id", "b_id")
    )


def shingle_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    with_counts: bool = True,
) -> DataFrame:
    """(id, ns, shingle): one row per DISTINCT (doc, n-token shingle), with
    the doc's distinct-shingle count riding along. The shared first stage of
    every shingle-based dedup operator.

    Built from posexplode + window ``lead`` — plain codegen'd JVM operators.
    The equivalent array expression (``transform``+``slice``+``concat_ws``
    inside ``aggregate``) is interpreted per element and measured ~6s for
    260k shingles on 32 cores; this form does the same work in under a
    second. Identical output strings, so oracle SQL is unaffected."""
    from pyspark.sql import Window

    toks = fan_out(docs, by=id_col).select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    sh = (
        toks.select(F.col(id_col), *[l.alias(f"t{i}") for i, l in enumerate(leads)])
        .filter(F.col(f"t{n-1}").isNotNull())  # drop ragged tail windows
        .select(
            F.col(id_col),
            F.concat_ws(" ", *[f"t{i}" for i in range(n)]).alias("shingle"),
        )
    )
    # the window left rows hash-partitioned by id → this groupBy needs NO
    # further shuffle; collect_set dedupes per doc and yields the count free
    per_doc = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("s"))
    if not with_counts:
        return per_doc.select(F.col(id_col), F.explode("s").alias("shingle"))
    return per_doc.select(
        F.col(id_col),
        F.size("s").cast("double").alias("ns"),
        F.explode("s").alias("shingle"),
    )


def shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """shingle_rows with the 32-bit token hash in place of the string."""
    return shingle_rows(docs, id_col, text_col, n).select(
        F.col(id_col), "ns", token_hash("shingle").alias("h")
    )


def minhash_signature(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature: explode shingles, one 32-bit token hash per
    shingle, then 32 per-permutation MINs in a single hash aggregate."""
    exploded = shingle_hashes(docs, id_col, text_col, n).withColumnRenamed("h", "x")
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
            f"sig{i}"
        )
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """LSH candidate pairs (same hash in ≥1 of 8 bands of 4 rows) verified
    with exact shingle Jaccard ≥ threshold. Deterministic: candidates are a
    pure function of the hardcoded hash family, so the DuckDB oracle can
    reproduce the identical pair set.

    One MATERIALIZED shingle pass feeds both stages: signatures aggregate
    over the (id, hash) rows, and verification counts common hashes per
    candidate pair from the same rows (no array intersections). The shingle
    table is persisted because it has two consumers in one job tree —
    without it Spark recomputes the interpreted shingling per consumer,
    which dominates runtime. (At 100 TB this table would be written once to
    Parquet; MEMORY_AND_DISK is the single-job equivalent.)"""

    ex = shingle_hashes(docs, id_col, text_col, n).localCheckpoint(eager=False)
    exploded = ex.withColumnRenamed("h", "x")
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
            f"sig{i}"
        )
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.md5(
                    F.concat_ws(
                        "_",
                        *[
                            F.col(f"sig{band * LSH_ROWS + r}")
                            for r in range(LSH_ROWS)
                        ],
                    )
                ).alias("bkey"),
            )
            for band in range(LSH_BANDS)
        ]
    )
    # buckets feeds BOTH sides of the banding self-join: checkpoint so the
    # 32-permutation min-aggregate + band hashing run once, not twice
    # (guide §1.2; the ~8·|docs|-row band table is what a persisted LSH
    # index materializes anyway)
    buckets = (
        sig.select(F.col(id_col), F.explode(band_structs).alias("b"))
        .select(id_col, F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))
        .localCheckpoint(eager=False)
    )

    cand = (
        buckets.alias("a")
        .join(
            buckets.select(
                F.col(id_col).alias("b_id"), "band", "bkey"
            ).alias("b"),
            on=["band", "bkey"],
        )
        .filter(F.col(id_col) < F.col("b_id"))
        .select(F.col(id_col).alias("a_id"), "b_id")
        .distinct()
    )

    # verification: common-hash counts for candidate pairs only, from the
    # same (id, ns, h) rows the signatures came from
    a_side = ex.select(
        F.col(id_col).alias("a_id"), F.col("ns").alias("a_ns"), "h"
    ).join(cand, "a_id")
    pairs = (
        a_side.join(
            ex.select(F.col(id_col).alias("b_id"), F.col("ns").alias("b_ns"), "h"),
            ["b_id", "h"],
        )
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("common"),
            F.first("a_ns").alias("a_ns"),
            F.first("b_ns").alias("b_ns"),
        )
    )
    return (
        pairs.select(
            "a_id",
            "b_id",
            (
                F.col("common") / (F.col("a_ns") + F.col("b_ns") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", round_to).alias("jaccard"))
        .orderBy("a_id", "b_id")
    )


def minhash_lsh_oracle_sql(threshold: float = 0.5, n: int = 3) -> str:
    """DuckDB SQL replicating minhash_lsh_pairs exactly (same hash family,
    same banding, same verification)."""
    tok = TOKEN_HASH_SQL_DUCKDB.format(col="sh")
    sig_exprs = ", ".join(
        f"MIN(({a} * x + {b}) % {MINHASH_PRIME}) AS sig{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_structs = ", ".join(
        "{'band': %d, 'bkey': md5(concat_ws('_', %s))}"
        % (band, ", ".join(f"sig{band * LSH_ROWS + r}" for r in range(LSH_ROWS)))
        for band in range(LSH_BANDS)
    )
    shingle_expr = (
        f"list_distinct(list_transform(range(1, len(string_split(text,' ')) - {n - 2}), "
        + "i -> "
        + " || ' ' || ".join(f"string_split(text,' ')[i+{j}]" for j in range(n))
        + "))"
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {shingle_expr} AS s FROM documents
    ),
    shf AS (SELECT * FROM sh WHERE len(s) > 0),
    ex AS (
        SELECT doc_id, {tok} AS x
        FROM (SELECT doc_id, unnest(s) AS sh FROM shf)
    ),
    sig AS (SELECT doc_id, {sig_exprs} FROM ex GROUP BY doc_id),
    buckets AS (
        SELECT doc_id, b.band AS band, b.bkey AS bkey
        FROM (SELECT doc_id, unnest([{band_structs}]) AS b FROM sig)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, len(s) * 1.0 AS ns FROM shf),
    verified AS (
        SELECT c.a_id, c.b_id, COUNT(*) * 1.0 AS common
        FROM cand c
        JOIN ex ea ON ea.doc_id = c.a_id
        JOIN ex eb ON eb.doc_id = c.b_id AND eb.x = ea.x
        GROUP BY 1, 2
    )
    SELECT v.a_id AS a_id, v.b_id AS b_id,
           ROUND(v.common / (sa.ns + sb.ns - v.common), 6) AS jaccard
    FROM verified v
    JOIN sizes sa ON sa.doc_id = v.a_id
    JOIN sizes sb ON sb.doc_id = v.b_id
    WHERE v.common / (sa.ns + sb.ns - v.common) >= {threshold}
    ORDER BY a_id, b_id
    """


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over 3-gram shingle hashes, as two 32-bit halves (``hi``
    from md5 hex chars 1-8, ``lo`` from 9-16 — two BIGINT columns instead of
    one unsigned 64-bit value, which BIGINT can't hold).

    Bit j of each half is the sign of sum(±1 over shingles, + when the
    shingle-hash bit j is set). Near-identical docs differ in few bits →
    Hamming-distance dedup. Shingles (not unigrams) carry word order, so
    unrelated docs over a shared vocabulary don't collide — with unigram
    hashing on this corpus 32 bits left ~250 random pairs under distance 3."""
    exploded = (
        shingle_rows(docs, id_col, text_col, 3, with_counts=False)
        .withColumn("_md5", F.md5("shingle"))  # one digest, two 32-bit slices
        .withColumn("xhi", F.conv(F.substring("_md5", 1, 8), 16, 10).cast("bigint"))
        .withColumn("xlo", F.conv(F.substring("_md5", 9, 8), 16, 10).cast("bigint"))
    )
    # Per-bit balance over shingles is sum(±1) = 2·sum(bit) − n, so the
    # aggregate only needs the plain bit sums plus one shared count — bit j
    # is set iff 2·s_j > n. The 64 per-bit counters are PACKED four to a
    # BIGINT as 16-bit fields (bit j of half h rides in packed_{h}_{j%8} at
    # field j//8): 17 aggregate buffers instead of 65, which cuts both the
    # hash-agg update work and — the dominant cold cost — the size of the
    # whole-stage-codegen method Janino has to compile (measured 23.7 s →
    # single-digit cold, ~1.6× warm, identical signatures). Field width
    # bounds distinct shingles per doc at 65535; a doc would need >65k
    # distinct 3-token shingles (≈400 KB of unique text) to overflow —
    # callers chunking documents (standard at 100 TB) never approach it.
    packed_aggs = [
        F.sum(
            sum(
                (
                    F.shiftleft(
                        F.shiftright(F.col(half), q + 8 * i).bitwiseAND(F.lit(1)),
                        16 * i,
                    )
                    for i in range(1, 4)
                ),
                start=F.shiftright(F.col(half), q).bitwiseAND(F.lit(1)),
            )
        ).alias(f"p_{half}_{q}")
        for half in ("xhi", "xlo")
        for q in range(8)
    ]
    balances = exploded.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("cnt"), *packed_aggs
    )
    out_cols = {}
    for half, name in (("xhi", "sim_hi"), ("xlo", "sim_lo")):
        fp = None
        for j in range(32):
            s_j = F.shiftright(F.col(f"p_{half}_{j % 8}"), 16 * (j // 8)).bitwiseAND(
                F.lit(0xFFFF)
            )
            bit = F.when(s_j * 2 > F.col("cnt"), F.lit(2**j)).otherwise(F.lit(0))
            fp = bit if fp is None else (fp + bit)
        out_cols[name] = fp.cast("bigint")
    return balances.select(
        F.col(id_col),
        out_cols["sim_hi"].alias("sim_hi"),
        out_cols["sim_lo"].alias("sim_lo"),
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str = "n_chars",
    bucket_width: int = 64,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, length-bucket blocked the
    same way as ngram_jaccard_pairs.

    The signature table is persisted: the blocked self-join consumes it on
    both sides, and without a persist Spark recomputes the full shingle →
    md5 → 64-bit-sum lineage per side (measured ~2× the query time). One row
    per doc, so it always fits."""

    sh = (
        simhash(docs, id_col, text_col)
        .join(
            docs.select(
                id_col, length_bucket(len_col, bucket_width).alias("bkt")
            ),
            id_col,
        )
        .localCheckpoint(eager=False)
    )
    right = sh.select(
        F.col(id_col).alias("b_id"),
        F.col("sim_hi").alias("b_hi"),
        F.col("sim_lo").alias("b_lo"),
        F.explode(
            F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
        ).alias("bkt"),
    )
    hamming = (
        F.bit_count(F.col("sim_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("sim_lo").bitwiseXOR(F.col("b_lo")))
    ).cast("bigint")
    # No .distinct(): b's three exploded buckets are distinct values and a
    # carries exactly one bucket, so a qualifying pair meets on exactly one
    # bucket row — dedup here would be a redundant full shuffle.
    return (
        sh.join(right, "bkt")
        .filter(F.col(id_col) < F.col("b_id"))
        .select(F.col(id_col).alias("a_id"), "b_id", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("a_id", "b_id")
    )


# Row-block size for grouped cosine near-dup: peak per-task memory is
# O(EMB_BLOCK_ROWS × group_size) floats instead of O(group_size²).
EMB_BLOCK_ROWS = 1024


def cosine_block_pairs(ids, nm, threshold: float, block: int = EMB_BLOCK_ROWS):
    """Yield upper-triangle cosine pairs (a_idx, b_idx, sim) from a
    row-normalized matrix, one row-block at a time.

    Never materializes the n×n similarity matrix: each step allocates a
    (block, n) slab, keeps entries with sim ≥ threshold and col > row, and
    releases the slab before the next block — the bounded-memory shape a hot
    blocking key needs at 100 TB (group size n can be millions of rows; n²
    doubles would OOM the Python worker, block·n streams through it).

    ``ids`` must be sorted ascending so the col > row triangle condition
    equals the a_id < b_id pair contract.
    """
    import numpy as np

    n = len(ids)
    for i0 in range(0, n, block):
        sims = nm[i0 : min(i0 + block, n)] @ nm.T  # (≤block, n) slab
        rows, cols = np.nonzero(sims >= threshold)
        keep = cols > rows + i0
        rows, cols = rows[keep], cols[keep]
        yield ids[rows + i0], ids[cols], sims[rows, cols]


def simhash_oracle_sql(max_hamming: int = 3, bucket_width: int = 64) -> str:
    """DuckDB SQL replaying simhash_pairs bit-for-bit: same md5-slice halves,
    same 2·Σbit > n sign rule (a lateral range(0,32) join replaces Spark's 64
    generated aggregates), same length-bucket blocking, same Hamming filter
    via bit_count(xor(...)). Every intermediate is deterministic integer
    math, so the pair set is cross-engine identical."""
    ham = (
        "bit_count(xor(a.sim_hi, b.sim_hi)) + bit_count(xor(a.sim_lo, b.sim_lo))"
    )
    return f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
                   i -> string_split(text,' ')[i] || ' ' ||
                        string_split(text,' ')[i+1] || ' ' ||
                        string_split(text,' ')[i+2])) AS s
        FROM documents
    ),
    shf AS (SELECT * FROM sh WHERE len(s) > 0),
    ex AS (
        SELECT doc_id,
               ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS xhi,
               ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS xlo
        FROM (SELECT doc_id, unnest(s) AS shingle FROM shf)
    ),
    bits AS (
        SELECT doc_id, j,
               2 * SUM((xhi >> j) & 1) - COUNT(*) AS bal_hi,
               2 * SUM((xlo >> j) & 1) - COUNT(*) AS bal_lo
        FROM ex, range(0, 32) t(j)
        GROUP BY doc_id, j
    ),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN bal_hi > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS sim_hi,
               CAST(SUM(CASE WHEN bal_lo > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS sim_lo
        FROM bits GROUP BY doc_id
    ),
    keyed AS (
        SELECT g.doc_id, g.sim_hi, g.sim_lo, d.n_chars // {bucket_width} AS bkt
        FROM sig g JOIN documents d USING (doc_id)
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST({ham} AS BIGINT) AS hamming
    FROM keyed a JOIN keyed b
      ON b.bkt BETWEEN a.bkt - 1 AND a.bkt + 1 AND a.doc_id < b.doc_id
    WHERE {ham} <= {max_hamming}
    ORDER BY a_id, b_id
    """


def semdedup_dropped(
    emb: DataFrame,
    k: int = 8,
    eps: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings,
    then prune semantic duplicates WITHIN each cluster — the clustering bounds
    the quadratic comparison work that makes naive embedding dedup infeasible.

    Semantics (deterministic variant):
      1. Assign every vector to its nearest of k seed centroids (the vectors
         with id < k — same reproducible init as ``operators/clustering``;
         L2 distance rounded 6 dp, ties → smallest cid).
      2. Within a cluster, order members by (distance-to-centroid, id): the
         earlier member of any ε-similar pair is canonical.
      3. A doc is DROPPED if some canonically-earlier cluster-mate has
         cosine similarity ≥ eps with it. Output = the dropped rows with
         their chosen keeper (the qualifying keeper closest to the
         centroid, tie → smallest id) and the cosine to that keeper.

    The paper keeps the member FARTHEST from the centroid; this variant keeps
    the CLOSEST (the canonical prototype) because it makes the keeper rule a
    strict total order — one deterministic pass, no connected-components
    closure — and is exactly replayable in the SQL oracle.

    Scale shape: the k-row seed table broadcasts; assignment is a map-only
    cross product + struct-min combine (no window); ONE shuffle on cid; the
    per-cluster pairwise step is an Arrow batch whose peak memory is bounded
    at O(block × cluster_size) by ``cosine_block_pairs``. At 100 TB you grow
    k with n (k ≈ n/target_cluster_size) so per-cluster cost stays constant —
    the same knob the paper turns (50k clusters for LAION).
    """
    from cobalt_duckdb_spark.operators.clustering import assign_clusters

    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    seeds = vecs.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    assigned = assign_clusters(vecs, seeds)  # vec_id, v, cid, dist

    def prune_fn(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"doc_id": [], "cid": [], "keeper_id": [], "cos_sim": []}
        ).astype(
            {
                "doc_id": "int64",
                "cid": "int64",
                "keeper_id": "int64",
                "cos_sim": "float64",
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        dist = pdf["dist"].to_numpy()
        cid = int(pdf["cid"].iloc[0])
        mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        pos = {int(i): p for p, i in enumerate(ids)}
        rows = []
        # threshold slightly below eps, then re-filter on the ROUNDED value —
        # the oracle compares ROUND(cos, 6) >= eps, so boundary sims can't
        # flip between engines.
        for a_ids, b_ids, sims in cosine_block_pairs(
            ids, nm, threshold=eps - 1e-9
        ):
            sims = np.round(sims, 6)
            m = sims >= eps
            for a, b, s in zip(a_ids[m], b_ids[m], sims[m]):
                da, db = dist[pos[int(a)]], dist[pos[int(b)]]
                # canonical order: (dist, id) — a < b already by id
                if (da, int(a)) < (db, int(b)):
                    keeper, dropped, kd = int(a), int(b), da
                else:
                    keeper, dropped, kd = int(b), int(a), db
                rows.append((dropped, cid, keeper, kd, float(s)))
        if not rows:
            return empty
        out = pd.DataFrame(
            rows, columns=["doc_id", "cid", "keeper_id", "k_dist", "cos_sim"]
        )
        out = (
            out.sort_values(["doc_id", "k_dist", "keeper_id"])
            .groupby("doc_id", as_index=False)
            .first()
        )
        return out[["doc_id", "cid", "keeper_id", "cos_sim"]]

    return (
        assigned.groupBy("cid")
        .applyInPandas(
            prune_fn, "doc_id BIGINT, cid BIGINT, keeper_id BIGINT, cos_sim DOUBLE"
        )
        .orderBy("doc_id")
    )


def _srp_hyperplanes(n_bits: int = 64, dims: int = 64):
    """Deterministic 'random' hyperplane family: W[j][i] = first-8-hex of
    md5(f"{j}:{i}") as unsigned 32-bit, centered at 0 (− 2³¹). Replayable in
    DuckDB as ('0x' || substr(md5(j || ':' || i), 1, 8))::BIGINT −
    2147483648, so the SRP signature is cross-engine identical."""
    import hashlib

    import numpy as np

    w = np.empty((n_bits, dims), dtype=np.float64)
    for j in range(n_bits):
        for i in range(dims):
            h = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16)
            w[j, i] = h - 2147483648
    return w


def srp_bands(e: DataFrame, dims: int = 64) -> DataFrame:
    """(vec_id, band_id, bkey): the 8×8-bit banded SRP signature of a
    (vec_id, v: array<double>) frame — the shared candidate-generation
    front end of ``srp_lsh_pairs`` and the multi-probe recall query.

    Band key: byte b of the 64-bit sign signature (hi holds bits 0-31).
    IDS ONLY through downstream collision joins: chance collisions scale
    n²/2^band_bits, and carrying the 64-double vectors through that join
    multiplied shuffled bytes ~30× (measured 127 s → 11 s at 50k vectors
    on the 10× probe). Vectors join back AFTER candidate dedup."""
    import pandas as pd

    wt = _srp_hyperplanes(64, dims).T  # (dims, 64)

    def _srp_sig(v):
        import numpy as np

        mat = np.vstack(v.to_numpy()).astype(np.float64)  # (n, dims)
        bits = (mat @ wt) > 0  # (n, 64)
        pow32 = 1 << np.arange(32, dtype=np.int64)
        hi = (bits[:, :32].astype(np.int64) * pow32).sum(axis=1)
        lo = (bits[:, 32:].astype(np.int64) * pow32).sum(axis=1)
        return pd.DataFrame({"hi": hi, "lo": lo})

    _srp_sig.__annotations__ = {"v": pd.Series, "return": pd.DataFrame}
    srp_sig = F.pandas_udf(_srp_sig, "hi bigint, lo bigint")

    sig = e.select("vec_id", srp_sig("v").alias("s")).select(
        "vec_id", F.col("s.hi").alias("hi"), F.col("s.lo").alias("lo")
    )
    band = F.explode(F.array(*[F.lit(b) for b in range(8)]))
    return sig.select("vec_id", "hi", "lo", band.alias("band_id")).select(
        "vec_id",
        "band_id",
        # hi/lo are unsigned-32 in a bigint, so plain >> never sign-extends
        F.expr(
            "CASE WHEN band_id < 4 THEN shiftright(hi, band_id * 8) "
            "ELSE shiftright(lo, (band_id - 4) * 8) END & 255"
        ).alias("bkey"),
    )


def srp_lsh_pairs(
    emb: DataFrame,
    eps: float = 0.4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup via signed-random-projection LSH (Charikar 2002):
    64 sign bits (bit j = dot(v, hyperplane_j) > 0), banded 8 × 8 bits;
    vectors sharing any band bucket become candidates; candidates are
    verified with exact cosine ≥ eps.

    This is the TRUE-scale path for embedding dedup — no label and no
    learned clustering needed, candidate generation is a bucket equi-join:
    P(band hit) = (1 − θ/π)⁸ concentrates collisions on near-parallel pairs.
    Scale shape: signature is a map-only Arrow batch (one (n,64) matmul per
    batch against a broadcast 64×64 constant); explode ×8 bands; ONE shuffle
    on (band, key); verification touches only candidates. Knob at 100 TB:
    widen bands (e.g. 4 × 16 bits) so chance collisions — which grow with
    n²/2^band_bits — stay bounded; 8-bit bands fit the test corpus.

    Sign-bit determinism: a bit can differ across engines only if
    |dot| / Σ|terms| ≲ 1e-13 (sum-order ulps); weights are ~1e9 so this
    needs |dot| < ~1e-4 against typical |dot| ~1e8 — vanishing, and the
    differential gate would surface it.
    """
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # bands is consumed on BOTH sides of the candidate self-join: without a
    # checkpoint the pandas_udf signature matmul runs twice (the plan held
    # 4 ArrowEvalPython nodes); with it, once (guide §4.1/§1.2).
    bands = srp_bands(e, dims).localCheckpoint(eager=False)
    cand_ids = (
        bands.alias("a")
        .join(
            bands.select(
                F.col("vec_id").alias("b_id"), "band_id", "bkey"
            ).alias("b"),
            ["band_id", "bkey"],
        )
        .filter(F.col("vec_id") < F.col("b_id"))
        .groupBy(F.col("vec_id").alias("a_id"), "b_id")
        .agg(F.count("*").cast("bigint").alias("n_bands"))
    )
    cand = (
        cand_ids.join(
            e.select(F.col("vec_id").alias("a_id"), F.col("v").alias("av")),
            "a_id",
        )
        .join(
            e.select(F.col("vec_id").alias("b_id"), F.col("v").alias("bv")),
            "b_id",
        )
    )
    dot = F.aggregate(
        F.zip_with("av", "bv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    out = cand.withColumn(
        "cos_sim", F.round(dot / (norm("av") * norm("bv")), 6)
    )
    return (
        out.filter(F.col("cos_sim") >= eps)
        .select("a_id", "b_id", "n_bands", "cos_sim")
        .orderBy("a_id", "b_id")
    )


def srp_lsh_oracle_sql(eps: float = 0.4) -> str:
    """DuckDB twin of ``srp_lsh_pairs``: same md5-derived hyperplanes, sign
    rule, byte bands, candidate join, and rounded-cosine verification."""
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    ),
    hp AS (
        SELECT j, i,
               ('0x' || substr(md5(j || ':' || i), 1, 8))::BIGINT
                   - 2147483648 AS w
        FROM range(0, 64) t(j) CROSS JOIN range(0, 64) u(i)
    ),
    dots AS (
        SELECT e.vec_id, hp.j,
               SUM(e.v[CAST(hp.i AS INT) + 1] * hp.w) AS dot
        FROM e CROSS JOIN hp
        GROUP BY e.vec_id, hp.j
    ),
    sig AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN j < 32 AND dot > 0
                             THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS hi,
               CAST(SUM(CASE WHEN j >= 32 AND dot > 0
                             THEN 1::BIGINT << (j - 32) ELSE 0 END)
                    AS BIGINT) AS lo
        FROM dots GROUP BY vec_id
    ),
    bands AS (
        SELECT vec_id, b AS band_id,
               CASE WHEN b < 4 THEN (hi >> CAST(8 * b AS INT)) & 255
                    ELSE (lo >> CAST(8 * (b - 4) AS INT)) & 255
               END AS bkey
        FROM sig CROSS JOIN range(0, 8) t(b)
    ),
    cand AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               CAST(COUNT(*) AS BIGINT) AS n_bands
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.bkey = b.bkey
                     AND a.vec_id < b.vec_id
        GROUP BY 1, 2
    )
    SELECT c.a_id, c.b_id, c.n_bands,
           ROUND(list_inner_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6)
               AS cos_sim
    FROM cand c
    JOIN e ea ON ea.vec_id = c.a_id
    JOIN e eb ON eb.vec_id = c.b_id
    WHERE ROUND(list_inner_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6)
          >= {eps}
    ORDER BY a_id, b_id
    """


def semdedup_oracle_sql(k: int = 8, eps: float = 0.4) -> str:
    """DuckDB twin of ``semdedup_dropped``: identical seed init, 6-dp
    distance rounding, struct-min tiebreaks, rounded-cosine threshold, and
    (dist, id) canonical order — the dropped set hash-matches."""
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    ),
    seeds AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {k}),
    a1 AS (
        SELECT e.vec_id, e.v, e.nrm, s.cid,
               ROUND(list_distance(e.v, s.c), 6) AS dist,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY ROUND(list_distance(e.v, s.c), 6), s.cid
               ) AS rn
        FROM e CROSS JOIN seeds s
    ),
    m AS (SELECT vec_id, v, nrm, cid, dist FROM a1 WHERE rn = 1),
    pairs AS (
        SELECT a.cid,
               CASE WHEN a.dist < b.dist
                         OR (a.dist = b.dist AND a.vec_id < b.vec_id)
                    THEN b.vec_id ELSE a.vec_id END AS doc_id,
               CASE WHEN a.dist < b.dist
                         OR (a.dist = b.dist AND a.vec_id < b.vec_id)
                    THEN a.vec_id ELSE b.vec_id END AS keeper_id,
               CASE WHEN a.dist < b.dist
                         OR (a.dist = b.dist AND a.vec_id < b.vec_id)
                    THEN a.dist ELSE b.dist END AS k_dist,
               ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6)
                   AS cos_sim
        FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6)
              >= {eps}
    ),
    ranked AS (
        SELECT doc_id, cid, keeper_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY k_dist, keeper_id) AS rn
        FROM pairs
    )
    SELECT doc_id, CAST(cid AS BIGINT) AS cid, keeper_id, cos_sim
    FROM ranked WHERE rn = 1
    ORDER BY doc_id
    """


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Asymmetric near-dup: containment C = |A∩B| / min(|A|, |B|) ≥ threshold.

    Jaccard misses the quote/boilerplate case — a short document embedded
    verbatim inside a much longer one scores j = |A|/|B| ≈ 0 but containment
    ≈ 1. This is the detector for doc-in-doc duplication (syndicated
    articles inside aggregator pages, eval questions pasted into training
    docs — the same math as ``eval_contamination`` but corpus-internal).

    Same inverted-index set-similarity join shape (and scale behavior) as
    :func:`ngram_jaccard_pairs`; jaccard is emitted alongside so consumers
    see both symmetric and asymmetric overlap per pair."""
    ex = shingle_hashes(docs, id_col, text_col, n).localCheckpoint(eager=False)
    pairs = (
        ex.select(F.col(id_col).alias("a_id"), F.col("ns").alias("a_ns"), "h")
        .join(
            ex.select(F.col(id_col).alias("b_id"), F.col("ns").alias("b_ns"), "h"),
            "h",
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("common"),
            F.first("a_ns").alias("a_ns"),
            F.first("b_ns").alias("b_ns"),
        )
    )
    containment = F.col("common") / F.least("a_ns", "b_ns")
    jaccard = F.col("common") / (F.col("a_ns") + F.col("b_ns") - F.col("common"))
    return (
        pairs.filter(containment >= threshold)
        .select(
            "a_id",
            "b_id",
            F.round(containment, round_to).alias("containment"),
            F.round(jaccard, round_to).alias("jaccard"),
        )
        .orderBy("a_id", "b_id")
    )


def minhash_lsh_incremental(
    corpus: DataFrame,
    batch: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Incremental NEAR-dup screen: arriving batch docs vs the existing
    corpus via MinHash-LSH — the continuous-ingest complement of the exact
    fingerprint screen (``dedup_incremental_new_batch``). Candidates come
    ONLY from corpus-band × batch-band bucket joins: corpus-internal pairs
    are never generated, so per-batch cost is |batch| + matched buckets, not
    a corpus re-dedup. (At 100 TB the corpus band table is a persisted lake
    table keyed by (band, bkey); each batch probes it like an index.)

    Returns one row per flagged batch doc: (doc_id, n_corpus_dups,
    best_jaccard, best_corpus_id) with Jaccard verified exactly on the
    shingle tables; ties on best resolve to the lowest corpus id."""
    from pyspark.sql import Window

    def bands_of(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
        ex = shingle_hashes(docs, id_col, text_col, n).localCheckpoint(
            eager=False
        )
        aggs = [
            F.min(
                (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)
            ).alias(f"sig{i}")
            for i, (a, b) in enumerate(MINHASH_COEFFS)
        ]
        sig = ex.groupBy(id_col).agg(*aggs)
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(band).alias("band"),
                    F.md5(
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"sig{band * LSH_ROWS + r}")
                                for r in range(LSH_ROWS)
                            ],
                        )
                    ).alias("bkey"),
                )
                for band in range(LSH_BANDS)
            ]
        )
        buckets = sig.select(F.col(id_col), F.explode(band_structs).alias("b")).select(
            id_col, F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
        )
        return ex, buckets

    c_ex, c_buckets = bands_of(corpus)
    b_ex, b_buckets = bands_of(batch)

    cand = (
        b_buckets.select(F.col(id_col).alias("doc_id"), "band", "bkey")
        .join(
            c_buckets.select(F.col(id_col).alias("corpus_id"), "band", "bkey"),
            ["band", "bkey"],
        )
        .select("doc_id", "corpus_id")
        .distinct()
    )
    b_side = b_ex.select(
        F.col(id_col).alias("doc_id"), F.col("ns").alias("b_ns"), "h"
    ).join(cand, "doc_id")
    verified = (
        b_side.join(
            c_ex.select(
                F.col(id_col).alias("corpus_id"), F.col("ns").alias("c_ns"), "h"
            ),
            ["corpus_id", "h"],
        )
        .groupBy("doc_id", "corpus_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("common"),
            F.first("b_ns").alias("b_ns"),
            F.first("c_ns").alias("c_ns"),
        )
        .select(
            "doc_id",
            "corpus_id",
            (
                F.col("common") / (F.col("b_ns") + F.col("c_ns") - F.col("common"))
            ).alias("j"),
        )
        .filter(F.col("j") >= threshold)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("j"), F.asc("corpus_id"))
    return (
        verified.withColumn("_rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_corpus_dups"),
            F.round(F.max("j"), round_to).alias("best_jaccard"),
            F.min_by("corpus_id", F.col("_rn")).alias("best_corpus_id"),
        )
        .orderBy("doc_id")
    )


def minhash_lsh_incremental_oracle_sql(
    threshold: float = 0.5, n: int = 3, corpus_source: str = "src0"
) -> str:
    """DuckDB twin of :func:`minhash_lsh_incremental` over the documents
    table split by source (corpus_source = corpus, everything else = batch)."""
    tok = TOKEN_HASH_SQL_DUCKDB.format(col="sh")
    sig_exprs = ", ".join(
        f"MIN(({a} * x + {b}) % {MINHASH_PRIME}) AS sig{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_structs = ", ".join(
        "{'band': %d, 'bkey': md5(concat_ws('_', %s))}"
        % (band, ", ".join(f"sig{band * LSH_ROWS + r}" for r in range(LSH_ROWS)))
        for band in range(LSH_BANDS)
    )
    shingle_expr = (
        f"list_distinct(list_transform(range(1, len(string_split(text,' ')) - {n - 2}), "
        + "i -> "
        + " || ' ' || ".join(f"string_split(text,' ')[i+{j}]" for j in range(n))
        + "))"
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, source, {shingle_expr} AS s FROM documents
    ),
    shf AS (SELECT * FROM sh WHERE len(s) > 0),
    ex AS (
        SELECT doc_id, source, {tok} AS x
        FROM (SELECT doc_id, source, unnest(s) AS sh FROM shf)
    ),
    sig AS (SELECT doc_id, source, {sig_exprs} FROM ex GROUP BY doc_id, source),
    buckets AS (
        SELECT doc_id, source, b.band AS band, b.bkey AS bkey
        FROM (SELECT doc_id, source, unnest([{band_structs}]) AS b FROM sig)
    ),
    cand AS (
        SELECT DISTINCT b.doc_id AS doc_id, c.doc_id AS corpus_id
        FROM buckets b JOIN buckets c
          ON b.band = c.band AND b.bkey = c.bkey
        WHERE b.source <> '{corpus_source}' AND c.source = '{corpus_source}'
    ),
    sizes AS (SELECT doc_id, len(s) * 1.0 AS ns FROM shf),
    verified AS (
        SELECT cd.doc_id, cd.corpus_id, COUNT(*) * 1.0 AS common
        FROM cand cd
        JOIN ex eb ON eb.doc_id = cd.doc_id
        JOIN ex ec ON ec.doc_id = cd.corpus_id AND ec.x = eb.x
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT v.doc_id, v.corpus_id,
               v.common / (sb.ns + sc.ns - v.common) AS j
        FROM verified v
        JOIN sizes sb ON sb.doc_id = v.doc_id
        JOIN sizes sc ON sc.doc_id = v.corpus_id
        WHERE v.common / (sb.ns + sc.ns - v.common) >= {threshold}
    ),
    ranked AS (
        SELECT doc_id, corpus_id, j,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY j DESC, corpus_id ASC) AS rn
        FROM scored
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_corpus_dups,
           ROUND(MAX(s.j), 6) AS best_jaccard,
           MAX(CASE WHEN r.rn = 1 THEN r.corpus_id END) AS best_corpus_id
    FROM scored s JOIN ranked r
      ON r.doc_id = s.doc_id AND r.corpus_id = s.corpus_id
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """


def lsh_quality_audit(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Precision/recall of the banded MinHash-LSH candidate screen against
    exact shingle-Jaccard ground truth — the parameter-tuning audit behind
    every (bands, rows) choice: recall tells you what the screen MISSES
    (near-dup pairs that never collide in any band), precision what it
    wastes (candidate pairs the verifier then rejects). One row out.

    Truth = pairs with exact Jaccard ≥ threshold, found via the
    inverted-index set-similarity join (pairs sharing ≥1 shingle — pairs
    sharing none have Jaccard 0 and can't be truth). Candidates = raw band
    collisions, UNVERIFIED (that's the point — the audit measures the
    screen itself, not screen+verify). tp/fp/fn are set-membership counts
    off ONE full-outer join, so no per-candidate Jaccard is ever computed.

    At 100 TB you run this on a sampled shard (the screen's collision
    behavior is scale-free in the pair density); corpus-wide here. The one
    shingle table is persisted and feeds signatures, truth, and sizes."""

    ex = shingle_hashes(docs, id_col, text_col, n).localCheckpoint(eager=False)
    # --- truth: exact Jaccard via inverted index over shingle hashes
    common = (
        ex.select(F.col(id_col).alias("a_id"), F.col("ns").alias("a_ns"), "h")
        .join(
            ex.select(
                F.col(id_col).alias("b_id"), F.col("ns").alias("b_ns"), "h"
            ),
            "h",
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("common"),
            F.first("a_ns").alias("a_ns"),
            F.first("b_ns").alias("b_ns"),
        )
    )
    truth = common.filter(
        F.col("common") / (F.col("a_ns") + F.col("b_ns") - F.col("common"))
        >= threshold
    ).select("a_id", "b_id")
    # --- candidates: raw band collisions (same family as minhash_lsh_pairs)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
            f"sig{i}"
        )
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    sig = ex.groupBy(id_col).agg(*aggs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.md5(
                    F.concat_ws(
                        "_",
                        *[
                            F.col(f"sig{band * LSH_ROWS + r}")
                            for r in range(LSH_ROWS)
                        ],
                    )
                ).alias("bkey"),
            )
            for band in range(LSH_BANDS)
        ]
    )
    # buckets feeds BOTH sides of the banding self-join — same checkpoint
    # discipline as minhash_lsh_pairs, which this audit's candidate arm
    # mirrors: without it the 32-permutation min-aggregate + band hashing
    # ran twice (guide §1.2; r10 — the r9 verdict's item 2)
    buckets = (
        sig.select(F.col(id_col), F.explode(band_structs).alias("b"))
        .select(id_col, F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))
        .localCheckpoint(eager=False)
    )
    cand = (
        buckets.alias("a")
        .join(
            buckets.select(F.col(id_col).alias("b_id"), "band", "bkey").alias(
                "b"
            ),
            on=["band", "bkey"],
        )
        .filter(F.col(id_col) < F.col("b_id"))
        .select(F.col(id_col).alias("a_id"), "b_id")
        .distinct()
    )
    merged = truth.withColumn("is_truth", F.lit(1)).join(
        cand.withColumn("is_cand", F.lit(1)), ["a_id", "b_id"], "full_outer"
    )
    t = F.coalesce("is_truth", F.lit(0))
    c = F.coalesce("is_cand", F.lit(0))
    return merged.agg(
        F.sum(t).cast("bigint").alias("n_truth"),
        F.sum(c).cast("bigint").alias("n_candidates"),
        F.sum(t * c).cast("bigint").alias("tp"),
        F.sum(c * (1 - t)).cast("bigint").alias("fp"),
        F.sum(t * (1 - c)).cast("bigint").alias("fn"),
        F.round(F.sum(t * c) / F.sum(c), 6).alias("precision"),
        F.round(F.sum(t * c) / F.sum(t), 6).alias("recall"),
    )


def lsh_quality_audit_oracle_sql(threshold: float = 0.5, n: int = 3) -> str:
    """DuckDB replica of lsh_quality_audit (same hash family + banding)."""
    tok = TOKEN_HASH_SQL_DUCKDB.format(col="sh")
    sig_exprs = ", ".join(
        f"MIN(({a} * x + {b}) % {MINHASH_PRIME}) AS sig{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_structs = ", ".join(
        "{'band': %d, 'bkey': md5(concat_ws('_', %s))}"
        % (band, ", ".join(f"sig{band * LSH_ROWS + r}" for r in range(LSH_ROWS)))
        for band in range(LSH_BANDS)
    )
    shingle_expr = (
        f"list_distinct(list_transform(range(1, len(string_split(text,' ')) - {n - 2}), "
        + "i -> "
        + " || ' ' || ".join(f"string_split(text,' ')[i+{j}]" for j in range(n))
        + "))"
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {shingle_expr} AS s FROM documents
    ),
    shf AS (SELECT * FROM sh WHERE len(s) > 0),
    ex AS (
        SELECT doc_id, {tok} AS x
        FROM (SELECT doc_id, unnest(s) AS sh FROM shf)
    ),
    sizes AS (SELECT doc_id, len(s) * 1.0 AS ns FROM shf),
    common AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) * 1.0 AS common
        FROM ex a JOIN ex b ON a.x = b.x AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT c.a_id, c.b_id
        FROM common c
        JOIN sizes sa ON sa.doc_id = c.a_id
        JOIN sizes sb ON sb.doc_id = c.b_id
        WHERE c.common / (sa.ns + sb.ns - c.common) >= {threshold}
    ),
    sig AS (SELECT doc_id, {sig_exprs} FROM ex GROUP BY doc_id),
    buckets AS (
        SELECT doc_id, b.band AS band, b.bkey AS bkey
        FROM (SELECT doc_id, unnest([{band_structs}]) AS b FROM sig)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    merged AS (
        SELECT COALESCE(t.is_truth, 0) AS t, COALESCE(c.is_cand, 0) AS c
        FROM (SELECT a_id, b_id, 1 AS is_truth FROM truth) t
        FULL OUTER JOIN (SELECT a_id, b_id, 1 AS is_cand FROM cand) c
          ON t.a_id = c.a_id AND t.b_id = c.b_id
    )
    SELECT CAST(SUM(t) AS BIGINT) AS n_truth,
           CAST(SUM(c) AS BIGINT) AS n_candidates,
           CAST(SUM(t * c) AS BIGINT) AS tp,
           CAST(SUM(c * (1 - t)) AS BIGINT) AS fp,
           CAST(SUM(t * (1 - c)) AS BIGINT) AS fn,
           ROUND(SUM(t * c) * 1.0 / SUM(c), 6) AS precision,
           ROUND(SUM(t * c) * 1.0 / SUM(t), 6) AS recall
    FROM merged
    """


CDC_GRAM = 4  # rolling-hash window (tokens)
CDC_MASK = 16  # breakpoint when hash % CDC_MASK == 0 → ~16-token chunks


def cdc_chunks(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content-defined chunking: split every document at positions where
    the rolling 4-token-gram hash ≡ 0 (mod 16) — boundaries are a function
    of LOCAL content, so an insertion early in a document shifts only the
    chunk it lands in, while fixed-width windows shift every later chunk
    (the Rabin/rsync/LBFS principle, applied at token granularity). The
    chunk fingerprint table is the storage-dedup primitive: shared
    boilerplate collapses to shared fingerprints regardless of position.

    Returns (id, chunk_id, n_tokens, fingerprint). One doc-keyed shuffle
    serves tokenize + rolling hash + running-sum chunk assignment (same
    window partitioning), then chunk texts aggregate on (id, chunk_id) —
    already co-partitioned, no extra exchange."""
    from pyspark.sql import Window

    toks = fan_out(docs, by=id_col).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(
        " ",
        F.col("tok"),
        *[F.lead("tok", i).over(w) for i in range(1, CDC_GRAM)],
    )
    has_full = F.lead("tok", CDC_GRAM - 1).over(w).isNotNull()
    hashed = toks.select(
        F.col(id_col),
        "pos",
        "tok",
        F.when(
            (F.col("pos") > 0)
            & has_full
            & (token_hash(gram) % CDC_MASK == 0),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    chunked = hashed.select(
        F.col(id_col),
        "pos",
        "tok",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("chunk_id"),
    )
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("fingerprint"),
        )
    )


def cdc_oracle_cte() -> str:
    """DuckDB CTEs reproducing cdc_chunks → ``chunks(doc_id, chunk_id,
    n_tokens, fingerprint)``. Grams index the token list directly — no
    correlated subquery."""
    tok = TOKEN_HASH_SQL_DUCKDB.format(col="gram")
    return f"""
    toks AS (
        SELECT doc_id, i - 1 AS pos, s[CAST(i AS INT)] AS tok,
               CASE WHEN i > 1 AND i + {CDC_GRAM - 1} <= len(s)
                    THEN s[CAST(i + 0 AS INT)] || ' ' || s[CAST(i + 1 AS INT)] || ' ' || s[CAST(i + 2 AS INT)] || ' ' || s[CAST(i + 3 AS INT)]
               END AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
        CROSS JOIN range(1, 100000) t(i)
        WHERE i <= len(s)
    ),
    flagged AS (
        SELECT doc_id, pos, tok,
               CASE WHEN gram IS NOT NULL AND {tok} % {CDC_MASK} = 0
                    THEN 1 ELSE 0 END AS brk
        FROM toks
    ),
    assigned AS (
        SELECT doc_id, pos, tok,
               SUM(brk) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS chunk_id
        FROM flagged
    ),
    chunks AS (
        SELECT doc_id, chunk_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS fingerprint
        FROM assigned
        GROUP BY doc_id, chunk_id
    )"""


def minhash_estimator_audit(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Estimator-quality audit for the 32-permutation MinHash signature:
    over the LSH candidate pairs, compare the signature estimate (matching
    components / 32) with the exact shingle Jaccard it estimates. One row:
    pair count, mean/max absolute error, and the error the binomial theory
    predicts (√(J(1−J)/32) averaged over pairs) — if observed ≫ predicted,
    the hash family is broken; if ≪, the pairs are degenerate. This is the
    MinHash sibling of `lsh_quality_audit` (that audits the BANDING, this
    audits the SKETCH)."""

    ex = shingle_hashes(docs, id_col, text_col, n).localCheckpoint(eager=False)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
            f"sig{i}"
        )
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    # sig feeds THREE consumers (banding buckets + both signature sides of
    # the estimate join) and cand TWO (exact-Jaccard join + the pair base):
    # checkpoint both so the 32-permutation min-aggregate and the banding
    # self-join run once, not 3×/2× (guide §1.2)
    sig = ex.groupBy(id_col).agg(*aggs).localCheckpoint(eager=False)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.md5(
                    F.concat_ws(
                        "_",
                        *[
                            F.col(f"sig{band * LSH_ROWS + r}")
                            for r in range(LSH_ROWS)
                        ],
                    )
                ).alias("bkey"),
            )
            for band in range(LSH_BANDS)
        ]
    )
    buckets = sig.select(
        F.col(id_col), F.explode(band_structs).alias("b")
    ).select(id_col, F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey"))
    cand = (
        buckets.alias("a")
        .join(
            buckets.select(F.col(id_col).alias("b_id"), "band", "bkey").alias(
                "b"
            ),
            on=["band", "bkey"],
        )
        .filter(F.col(id_col) < F.col("b_id"))
        .select(F.col(id_col).alias("a_id"), "b_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sig_a = sig.select(
        F.col(id_col).alias("a_id"),
        *[F.col(f"sig{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    sig_b = sig.select(
        F.col(id_col).alias("b_id"),
        *[F.col(f"sig{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    est = (
        sum(
            F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            for i in range(NUM_HASHES)
        )
        / float(NUM_HASHES)
    )
    exact = (
        ex.select(F.col(id_col).alias("a_id"), F.col("ns").alias("a_ns"), "h")
        .join(cand, "a_id")
        .join(
            ex.select(
                F.col(id_col).alias("b_id"), F.col("ns").alias("b_ns"), "h"
            ),
            ["b_id", "h"],
        )
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("common"),
            F.first("a_ns").alias("a_ns"),
            F.first("b_ns").alias("b_ns"),
        )
        .select(
            "a_id",
            "b_id",
            (
                F.col("common")
                / (F.col("a_ns") + F.col("b_ns") - F.col("common"))
            ).alias("j"),
        )
    )
    pairs = (
        cand.join(sig_a, "a_id")
        .join(sig_b, "b_id")
        .select("a_id", "b_id", est.alias("est"))
        .join(exact, ["a_id", "b_id"], "left")
        .select(
            F.coalesce("j", F.lit(0.0)).alias("j"),
            "est",
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg(F.abs(F.col("est") - F.col("j"))), 6).alias(
            "mean_abs_error"
        ),
        F.round(F.max(F.abs(F.col("est") - F.col("j"))), 6).alias(
            "max_abs_error"
        ),
        F.round(
            F.avg(
                F.sqrt(
                    F.col("j") * (1 - F.col("j")) / F.lit(float(NUM_HASHES))
                )
            ),
            6,
        ).alias("predicted_stderr"),
    )


def minhash_estimator_audit_oracle_sql(n: int = 3) -> str:
    tok = TOKEN_HASH_SQL_DUCKDB.format(col="sh")
    sig_exprs = ", ".join(
        f"MIN(({a} * x + {b}) % {MINHASH_PRIME}) AS sig{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_structs = ", ".join(
        "{'band': %d, 'bkey': md5(concat_ws('_', %s))}"
        % (band, ", ".join(f"sig{band * LSH_ROWS + r}" for r in range(LSH_ROWS)))
        for band in range(LSH_BANDS)
    )
    shingle_expr = (
        f"list_distinct(list_transform(range(1, len(string_split(text,' ')) - {n - 2}), "
        + "i -> "
        + " || ' ' || ".join(f"string_split(text,' ')[i+{j}]" for j in range(n))
        + "))"
    )
    est_expr = (
        "("
        + " + ".join(
            f"CASE WHEN sa.sig{i} = sb.sig{i} THEN 1 ELSE 0 END"
            for i in range(NUM_HASHES)
        )
        + f") * 1.0 / {NUM_HASHES}"
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, {shingle_expr} AS s FROM documents
    ),
    shf AS (SELECT * FROM sh WHERE len(s) > 0),
    ex AS MATERIALIZED (
        SELECT doc_id, {tok} AS x
        FROM (SELECT doc_id, unnest(s) AS sh FROM shf)
    ),
    sizes AS (SELECT doc_id, len(s) * 1.0 AS ns FROM shf),
    sig AS MATERIALIZED (SELECT doc_id, {sig_exprs} FROM ex GROUP BY doc_id),
    buckets AS (
        SELECT doc_id, b.band AS band, b.bkey AS bkey
        FROM (SELECT doc_id, unnest([{band_structs}]) AS b FROM sig)
    ),
    cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    exact AS (
        SELECT c.a_id, c.b_id,
               COUNT(*) * 1.0 / (sa.ns + sb.ns - COUNT(*)) AS j
        FROM cand c
        JOIN ex ea ON ea.doc_id = c.a_id
        JOIN ex eb ON eb.doc_id = c.b_id AND eb.x = ea.x
        JOIN sizes sa ON sa.doc_id = c.a_id
        JOIN sizes sb ON sb.doc_id = c.b_id
        GROUP BY c.a_id, c.b_id, sa.ns, sb.ns
    ),
    pairs AS (
        SELECT COALESCE(e.j, 0.0) AS j, {est_expr} AS est
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.a_id
        JOIN sig sb ON sb.doc_id = c.b_id
        LEFT JOIN exact e ON e.a_id = c.a_id AND e.b_id = c.b_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(ABS(est - j)), 6) AS mean_abs_error,
           ROUND(MAX(ABS(est - j)), 6) AS max_abs_error,
           ROUND(AVG(SQRT(j * (1 - j) / {NUM_HASHES})), 6)
               AS predicted_stderr
    FROM pairs
    """
