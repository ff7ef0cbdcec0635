"""Data-selection & curation-audit pack (round 4) — the operators a
training-data team runs between "corpus is deduped" and "mixture is
frozen": coreset selection, domain reweighting, token-budget allocation,
document fingerprinting for provenance, and embedding-space OOD screens.

All [EXT] — absent from the reference (its surface is one KNN query); these
extend the mandated LLM-pipeline family (BASELINE.json north star) with the
selection/mixing stages. Every query carries a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobalt_duckdb_spark.io import load_table
from cobalt_duckdb_spark.queries import register

# ---------------------------------------------------------------------------
# k-center greedy coreset over embeddings
# ---------------------------------------------------------------------------

_KC_K = 6  # selected coreset size (5 greedy rounds after the seed)


def _kcenter_oracle(k: int = _KC_K) -> str:
    """Unrolled greedy k-center CTE chain: sel_i = sel_{i-1} ∪ argmax over
    points of min-distance-to-sel (cosine distance; ties → lowest vec_id)."""
    parts = [
        "WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "sel0 AS MATERIALIZED (SELECT 0 AS sel_rank, vec_id, v, 0.0 AS d FROM e WHERE vec_id = 0)",
    ]
    prev = "sel0"
    for i in range(1, k):
        parts.append(
            f"""m{i} AS MATERIALIZED (
                SELECT a.vec_id, a.v,
                       MIN(1 - list_cosine_similarity(a.v, s.v)) AS d
                FROM e a, {prev} s GROUP BY a.vec_id, a.v
            ),
            p{i} AS MATERIALIZED (
                SELECT {i} AS sel_rank, vec_id, v, d FROM m{i}
                ORDER BY d DESC, vec_id ASC LIMIT 1
            ),
            sel{i} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL SELECT * FROM p{i})"""
        )
        prev = f"sel{i}"
    parts.append(
        f"""SELECT CAST(sel_rank AS INT) AS sel_rank, vec_id,
               ROUND(d, 6) AS dist_to_set
        FROM {prev} ORDER BY sel_rank"""
    )
    return ",\n".join(parts[:1] + [",\n".join(parts[1:-1])]) + "\n" + parts[-1]


@register("sample_coreset_kcenter_greedy", oracle=_kcenter_oracle())
def sample_coreset_kcenter_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point traversal) over the
    embedding table — the standard geometric coreset for data pruning /
    active learning: each round adds the point FARTHEST (cosine distance)
    from the current selected set, giving a 2-approximation of the k-center
    cover. Seed = vec_id 0; ties break to the lowest vec_id so both engines
    replay the identical trajectory.

    Scale shape: each of the k−1 rounds is a MAP-ONLY pass — the selected
    set (≤ k rows) broadcasts into a min-over-centers projection, and the
    argmax is a TakeOrderedAndProject (per-partition top-1, k−1 rows ever
    cross the network). No shuffle of the big side, ever; the loop
    localCheckpoints the (≤ k)-row selected set, not the corpus. At 100 TB
    this is the textbook way to draw a geometric coreset: k linear scans.
    Dist-to-set for the SEED is defined 0.0."""
    from cobalt_duckdb_spark.functions.vector import cosine_distance

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    selected = (
        e.filter(F.col("vec_id") == 0)
        .select(
            F.lit(0).cast("int").alias("sel_rank"),
            "vec_id",
            "v",
            F.lit(0.0).alias("d"),
        )
        .coalesce(1)
        .localCheckpoint(eager=False)
    )
    for i in range(1, _KC_K):
        centers = selected.select(
            F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
        )
        far = (
            e.join(F.broadcast(centers))
            .groupBy("vec_id", "v")
            .agg(F.min(cosine_distance(F.col("v"), F.col("cv"))).alias("d"))
            .orderBy(F.col("d").desc(), F.col("vec_id").asc())
            .limit(1)
            .select(F.lit(i).cast("int").alias("sel_rank"), "vec_id", "v", "d")
        )
        selected = (
            selected.unionByName(far).coalesce(1).localCheckpoint(eager=False)
        )
    return selected.select(
        "sel_rank", "vec_id", F.round("d", 6).alias("dist_to_set")
    ).orderBy("sel_rank")


# ---------------------------------------------------------------------------
# DoReMi-style proxy domain reweighting
# ---------------------------------------------------------------------------

_DOREMI_ETA = 1.0


@register(
    "mix_doremi_proxy_reweight",
    oracle=f"""
    WITH d AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS tc,
               CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS cpt
        FROM documents
    ),
    dom AS (
        SELECT source,
               SUM(tc) AS toks,
               AVG(cpt) AS proxy_loss
        FROM d GROUP BY source
    ),
    tot AS (SELECT SUM(toks) AS all_toks, AVG(proxy_loss) AS mean_loss FROM dom),
    scored AS (
        SELECT source, toks / all_toks AS base_share,
               proxy_loss,
               (toks / all_toks) * EXP({_DOREMI_ETA} * (proxy_loss - mean_loss))
                   AS unnorm
        FROM dom, tot
    )
    SELECT source,
           ROUND(base_share, 6) AS base_share,
           ROUND(proxy_loss, 6) AS proxy_loss,
           ROUND(unnorm / SUM(unnorm) OVER (), 6) AS doremi_share,
           ROUND(unnorm / SUM(unnorm) OVER () - base_share, 6) AS delta_share
    FROM scored ORDER BY source
    """,
)
def mix_doremi_proxy_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style domain-reweighting step (Xie et al. 2023, public
    arXiv 2305.10429): each domain's sampling weight moves multiplicatively
    with its EXCESS loss vs the mean, then renormalizes —
    w'ᵢ ∝ wᵢ·exp(η·(lossᵢ − mean_loss)). Here the proxy loss is a
    deterministic hardness stand-in (mean chars-per-token of the domain —
    longer tokens ≈ rarer vocabulary) so both engines replay it; in
    production the proxy-model per-domain loss column drops in unchanged.

    Scale shape: one groupBy(source) over the corpus (≤ |domains| rows out),
    a 1-row global aggregate broadcast back, and window math on the
    |domains|-row frame. The softmax-style renormalization never touches
    row-level data."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split("text", " ")).cast("double").alias("tc"),
        (F.col("n_chars").cast("double") / F.size(F.split("text", " "))).alias(
            "cpt"
        ),
    )
    dom = d.groupBy("source").agg(
        F.sum("tc").alias("toks"), F.avg("cpt").alias("proxy_loss")
    )
    tot = dom.agg(
        F.sum("toks").alias("all_toks"), F.avg("proxy_loss").alias("mean_loss")
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    scored = dom.crossJoin(F.broadcast(tot)).select(
        "source",
        (F.col("toks") / F.col("all_toks")).alias("base_share"),
        "proxy_loss",
        (
            (F.col("toks") / F.col("all_toks"))
            * F.exp(F.lit(_DOREMI_ETA) * (F.col("proxy_loss") - F.col("mean_loss")))
        ).alias("unnorm"),
    )
    tot_unnorm = F.sum("unnorm").over(wall)
    return scored.select(
        "source",
        F.round("base_share", 6).alias("base_share"),
        F.round("proxy_loss", 6).alias("proxy_loss"),
        F.round(F.col("unnorm") / tot_unnorm, 6).alias("doremi_share"),
        F.round(F.col("unnorm") / tot_unnorm - F.col("base_share"), 6).alias(
            "delta_share"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# HITS hubs & authorities on the event-transition graph
# ---------------------------------------------------------------------------

_HITS_ITERS = 5


def _hits_oracle(iters: int = _HITS_ITERS) -> str:
    parts = [
        """WITH seq AS (
            SELECT event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS next_type
            FROM events
        ),
        edges AS MATERIALIZED (
            SELECT event_type AS src, next_type AS dst,
                   CAST(COUNT(*) AS DOUBLE) AS w
            FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
        ),
        nodes AS MATERIALIZED (
            SELECT DISTINCT src AS node FROM edges
            UNION SELECT DISTINCT dst FROM edges
        ),
        hub0 AS MATERIALIZED (SELECT node, 1.0 AS h FROM nodes)""",
    ]
    prev_h = "hub0"
    for i in range(1, iters + 1):
        parts.append(
            f"""auth{i}_raw AS MATERIALIZED (
                SELECT e.dst AS node, SUM(e.w * h.h) AS a
                FROM edges e JOIN {prev_h} h ON e.src = h.node GROUP BY e.dst
            ),
            auth{i} AS MATERIALIZED (
                SELECT n.node, COALESCE(r.a, 0) /
                       (SELECT SQRT(SUM(a * a)) FROM auth{i}_raw) AS a
                FROM nodes n LEFT JOIN auth{i}_raw r ON n.node = r.node
            ),
            hub{i}_raw AS MATERIALIZED (
                SELECT e.src AS node, SUM(e.w * a.a) AS h
                FROM edges e JOIN auth{i} a ON e.dst = a.node GROUP BY e.src
            ),
            hub{i} AS MATERIALIZED (
                SELECT n.node, COALESCE(r.h, 0) /
                       (SELECT SQRT(SUM(h * h)) FROM hub{i}_raw) AS h
                FROM nodes n LEFT JOIN hub{i}_raw r ON n.node = r.node
            )"""
        )
        prev_h = f"hub{i}"
    parts.append(
        f"""SELECT h.node AS event_type,
               ROUND(h.h, 6) AS hub,
               ROUND(a.a, 6) AS authority
        FROM hub{iters} h JOIN auth{iters} a ON h.node = a.node
        ORDER BY event_type"""
    )
    return ",\n".join(parts[:-1]) + "\n" + parts[-1]


@register("graph_hits_hubs_authorities", oracle=_hits_oracle())
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hubs & authorities on the weighted event-transition
    graph (same edge extraction as ``graph_pagerank_event_flow``): fixed
    {_HITS_ITERS} mutual-reinforcement rounds, L2-normalizing each vector
    per round — auth = norm(Aᵀ·hub), hub = norm(A·auth). States that FEED
    conversions score as hubs; states journeys converge INTO score as
    authorities — complementary to PageRank's stationary centrality.

    Scale shape: edge extraction is one user_id-shuffle (lead window) + a
    |types|²-row aggregate; every HITS round is a join + keyed aggregate on
    the |types|²-row edge frame with a 1-row L2 norm broadcast back —
    identical loop discipline to ``operators/graph.pagerank`` (tiny frames
    coalesce(1) + localCheckpoint per round, nothing collected; on a
    billion-edge graph drop the coalesce and keep the same plan)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    nxt = F.lead("event_type").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    edges = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("next_type", nxt)
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .coalesce(1)
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .coalesce(1)
        .localCheckpoint(eager=False)
    )
    hub = nodes.select("node", F.lit(1.0).alias("h"))
    auth = None
    for _ in range(_HITS_ITERS):
        araw = (
            edges.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("w") * F.col("h")).alias("a"))
        )
        anorm = araw.agg(F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("nrm"))
        auth = (
            nodes.join(araw, "node", "left")
            .crossJoin(F.broadcast(anorm))
            .select(
                "node", (F.coalesce("a", F.lit(0.0)) / F.col("nrm")).alias("a")
            )
            .coalesce(1)
            .localCheckpoint(eager=False)
        )
        hraw = (
            edges.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("w") * F.col("a")).alias("h"))
        )
        hnorm = hraw.agg(F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("nrm"))
        hub = (
            nodes.join(hraw, "node", "left")
            .crossJoin(F.broadcast(hnorm))
            .select(
                "node", (F.coalesce("h", F.lit(0.0)) / F.col("nrm")).alias("h")
            )
            .coalesce(1)
            .localCheckpoint(eager=False)
        )
    return (
        hub.join(auth, "node")
        .select(
            F.col("node").alias("event_type"),
            F.round("h", 6).alias("hub"),
            F.round("a", 6).alias("authority"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (MOSS)
# ---------------------------------------------------------------------------

_WIN_N = 3  # token n-gram size
_WIN_W = 4  # winnowing window (consecutive n-gram hashes)


@register(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, i AS pos,
               ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                               1, 8))::BIGINT AS h
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - {_WIN_N} + 2)) AS i
              FROM toks WHERE len(t) >= {_WIN_N})
    ),
    winmin AS (
        SELECT doc_id,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {_WIN_W - 1} FOLLOWING) AS fp,
               pos,
               COUNT(*) OVER (PARTITION BY doc_id) AS ng
        FROM grams
    ),
    fps AS MATERIALIZED (
        SELECT DISTINCT doc_id, fp
        FROM winmin WHERE pos <= ng - {_WIN_W} + 1
    ),
    per_doc AS MATERIALIZED (
        SELECT doc_id, COUNT(*) AS n_fingerprints FROM fps GROUP BY doc_id
    ),
    shared AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT a_id, b_id, CAST(n_shared AS BIGINT) AS n_shared,
           CAST(pa.n_fingerprints AS BIGINT) AS a_fingerprints,
           CAST(pb.n_fingerprints AS BIGINT) AS b_fingerprints,
           ROUND(n_shared * 1.0 /
                 (pa.n_fingerprints + pb.n_fingerprints - n_shared), 6)
               AS fp_jaccard
    FROM shared
    JOIN per_doc pa ON pa.doc_id = a_id
    JOIN per_doc pb ON pb.doc_id = b_id
    ORDER BY n_shared DESC, a_id, b_id LIMIT 20
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003, the
    MOSS algorithm): hash every token {_WIN_N}-gram, slide a window of
    {_WIN_W} consecutive hashes, keep each window's MINIMUM — guaranteeing
    any shared run of ≥ w+n−1 tokens shares a fingerprint, with density
    ~2/(w+1) instead of every shingle. The inverted-index join on the
    SELECTED fingerprints then reports the top shared-provenance pairs with
    fingerprint-set Jaccard — near-dup / plagiarism provenance at a
    fraction of full-shingle cost.

    Scale shape: fingerprint selection is ONE doc-partitioned window pass
    (min over {_WIN_W} following rows) — no shuffle beyond the doc
    partitioning; the pair join runs on the winnowed set (~2/(w+1) the
    shingle count), and the global top-20 is TakeOrderedAndProject. The
    window-min beats per-window explodes by never materializing window
    membership."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    n = _WIN_N
    grams = (
        d.filter(F.size("t") >= n)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.slice("t", 1, F.size("t") - n + 1),
                    lambda _, i: F.concat_ws(
                        " ",
                        F.col("t")[i],
                        F.col("t")[i + 1],
                        F.col("t")[i + 2],
                    ),
                )
            ).alias("pos0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    winmin = grams.select(
        "doc_id",
        "pos",
        F.min("h").over(wdoc.rowsBetween(0, _WIN_W - 1)).alias("fp"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("ng"),
    )
    fps = (
        winmin.filter(F.col("pos") <= F.col("ng") - _WIN_W + 1)
        .select("doc_id", "fp")
        .distinct()
    )
    per_doc = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints")
    )
    a = fps.select(F.col("doc_id").alias("a_id"), "fp")
    b = fps.select(F.col("doc_id").alias("b_id"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    pa = per_doc.select(
        F.col("doc_id").alias("a_id"), F.col("n_fingerprints").alias("a_fingerprints")
    )
    pb = per_doc.select(
        F.col("doc_id").alias("b_id"), F.col("n_fingerprints").alias("b_fingerprints")
    )
    return (
        shared.join(pa, "a_id")
        .join(pb, "b_id")
        .select(
            "a_id",
            "b_id",
            "n_shared",
            "a_fingerprints",
            "b_fingerprints",
            F.round(
                F.col("n_shared")
                / (
                    F.col("a_fingerprints")
                    + F.col("b_fingerprints")
                    - F.col("n_shared")
                ),
                6,
            ).alias("fp_jaccard"),
        )
        .orderBy(F.col("n_shared").desc(), "a_id", "b_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Token-budget allocator (bucketed-threshold, not global-sort)
# ---------------------------------------------------------------------------

_BUDGET_FRAC = 0.2


@register(
    "pipeline_token_budget_allocator",
    oracle=f"""
    WITH d AS MATERIALIZED (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tc,
               ROUND(len(list_distinct(string_split(text, ' '))) * 1.0 /
                     len(string_split(text, ' ')), 4) AS score
        FROM documents
    ),
    budget AS (SELECT FLOOR(SUM(tc) * {_BUDGET_FRAC}) AS b FROM d),
    buckets AS (
        SELECT score, SUM(tc) AS btoks FROM d GROUP BY score
    ),
    cum AS MATERIALIZED (
        SELECT score, btoks,
               SUM(btoks) OVER (ORDER BY score DESC) AS cum_toks
        FROM buckets
    ),
    cutoff AS (
        SELECT MIN(score) AS cut FROM cum, budget WHERE cum_toks <= b
    ),
    above AS MATERIALIZED (
        SELECT d.* FROM d, cutoff WHERE d.score >= COALESCE(cut, 1e18)
    ),
    partial AS (
        SELECT d.doc_id, d.source, d.tc FROM d, cutoff, budget
        WHERE d.score =
              (SELECT MAX(score) FROM cum, budget WHERE cum_toks > b)
          AND (SELECT COALESCE(SUM(tc), 0) FROM above) < b
        QUALIFY SUM(d.tc) OVER (ORDER BY d.doc_id)
                <= b - (SELECT COALESCE(SUM(tc), 0) FROM above)
    ),
    admitted AS (
        SELECT doc_id, source, tc FROM above
        UNION ALL SELECT doc_id, source, tc FROM partial
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS admitted_docs,
           CAST(SUM(tc) AS BIGINT) AS admitted_tokens,
           ROUND(SUM(tc) * 1.0 / (SELECT b FROM budget), 6) AS budget_share
    FROM admitted GROUP BY source ORDER BY source
    """,
)
def pipeline_token_budget_allocator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-first token-budget allocation WITHOUT a global sort:
    admit the highest-scoring documents (score = type-token ratio, rounded
    to 1e-4 buckets; deterministic) until {_BUDGET_FRAC:.0%} of corpus
    tokens are spent. The cutoff comes from a cumulative sum over SCORE
    BUCKETS (≤ 10⁴ rows however large the corpus), fully-admitting buckets
    above the cutoff; only the single boundary bucket pays a doc-granular
    running sum (doc_id order) to fill the remainder exactly.

    Scale shape: this is the 100-TB-safe shape for "take the best X% of
    tokens" — a naive rank-then-running-sum puts the ENTIRE corpus through
    one global sort + one unpartitioned window; here the corpus sees only a
    groupBy(score) aggregate and a broadcast-threshold filter, and the
    unpartitioned window runs on the boundary bucket alone (1/10⁴ of
    rows). Output: per-source admitted docs/tokens and budget share."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("tc"),
        F.round(
            F.size(F.array_distinct(F.split("text", " ")))
            / F.size(F.split("text", " ")),
            4,
        ).alias("score"),
    )
    budget = d.agg(
        F.floor(F.sum("tc") * F.lit(_BUDGET_FRAC)).cast("double").alias("b")
    )
    buckets = d.groupBy("score").agg(F.sum("tc").alias("btoks"))
    cum = buckets.select(
        "score",
        "btoks",
        F.sum("btoks")
        .over(Window.orderBy(F.col("score").desc()))
        .alias("cum_toks"),
    )
    cutoff = (
        cum.crossJoin(F.broadcast(budget))
        .filter(F.col("cum_toks") <= F.col("b"))
        .agg(F.min("score").alias("cut"))
    )
    boundary = (
        cum.crossJoin(F.broadcast(budget))
        .filter(F.col("cum_toks") > F.col("b"))
        .agg(F.max("score").alias("boundary_score"))
    )
    above = d.crossJoin(F.broadcast(cutoff)).filter(
        F.col("score") >= F.coalesce(F.col("cut"), F.lit(1e18))
    )
    above_toks = above.agg(
        F.coalesce(F.sum("tc"), F.lit(0)).cast("double").alias("at")
    )
    remaining = (
        budget.crossJoin(above_toks)
        .select((F.col("b") - F.col("at")).alias("rem"))
    )
    partial = (
        d.crossJoin(F.broadcast(boundary))
        .filter(F.col("score") == F.col("boundary_score"))
        .crossJoin(F.broadcast(remaining))
        .withColumn(
            "run", F.sum("tc").over(Window.orderBy("doc_id"))
        )
        .filter((F.col("rem") > 0) & (F.col("run") <= F.col("rem")))
        .select("doc_id", "source", "tc")
    )
    admitted = above.select("doc_id", "source", "tc").unionByName(partial)
    return (
        admitted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("admitted_docs"),
            F.sum("tc").cast("bigint").alias("admitted_tokens"),
        )
        .crossJoin(F.broadcast(budget))
        .select(
            "source",
            "admitted_docs",
            "admitted_tokens",
            F.round(F.col("admitted_tokens") / F.col("b"), 6).alias(
                "budget_share"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: per-user daily activity streaks
# ---------------------------------------------------------------------------


@register(
    "events_activity_streak_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    grouped AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INT) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, MIN(day) AS streak_start, MAX(day) AS streak_end,
               CAST(COUNT(*) AS BIGINT) AS streak_days
        FROM grouped GROUP BY user_id, island
    )
    SELECT user_id,
           /* ISO strings, not DATE: DuckDB's pandas conversion renders
              date32 as midnight Timestamps while Spark yields date objects
              — the same value hashes differently */
           strftime(streak_start, '%Y-%m-%d') AS streak_start,
           strftime(streak_end, '%Y-%m-%d') AS streak_end,
           streak_days
    FROM streaks
    ORDER BY streak_days DESC, user_id ASC, streak_start ASC
    LIMIT 25
    """,
)
def events_activity_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic gaps-and-islands: longest consecutive-day activity streaks
    per user. day − row_number(day) is constant exactly within a run of
    consecutive days, so grouping by that difference labels each island
    without any self-join or iteration — the retention/engagement primitive
    behind "7-day streak" metrics.

    Scale shape: one distinct (user, day) aggregate, one user-partitioned
    window (both hash-partition on user_id — the window reuses the
    distinct's partitioning, AQE plans one exchange), one island aggregate,
    and a TakeOrderedAndProject top-25. Per-user day counts are bounded by
    the calendar, so no skew."""
    from pyspark.sql import Window

    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    grouped = days.select(
        "user_id", "day", F.date_sub("day", rn).alias("island")
    )
    return (
        grouped.groupBy("user_id", "island")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count(F.lit(1)).cast("bigint").alias("streak_days"),
        )
        .select(
            "user_id",
            F.date_format("streak_start", "yyyy-MM-dd").alias("streak_start"),
            F.date_format("streak_end", "yyyy-MM-dd").alias("streak_end"),
            "streak_days",
        )
        .orderBy(
            F.col("streak_days").desc(),
            F.col("user_id").asc(),
            F.col("streak_start").asc(),
        )
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Diagonal-Mahalanobis OOD screen over embeddings
# ---------------------------------------------------------------------------


@register(
    "embedding_ood_mahalanobis_diag",
    oracle="""
    WITH dims AS MATERIALIZED (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                     unnest(range(1, len(embedding) + 1)) AS i
              FROM embeddings)
    ),
    stats AS (
        SELECT i, AVG(x) AS mu,
               SQRT(AVG(x * x) - AVG(x) * AVG(x)) AS sigma
        FROM dims GROUP BY i
    ),
    scored AS (
        SELECT d.vec_id,
               AVG(POW((d.x - s.mu) / CASE WHEN s.sigma > 1e-12
                                           THEN s.sigma ELSE 1.0 END, 2))
                   AS m2
        FROM dims d JOIN stats s ON d.i = s.i
        GROUP BY d.vec_id
    )
    SELECT vec_id, ROUND(m2, 6) AS mahalanobis_sq_mean
    FROM scored
    ORDER BY m2 DESC, vec_id ASC
    LIMIT 20
    """,
)
def embedding_ood_mahalanobis_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-distribution screen: diagonal-covariance Mahalanobis distance
    of every embedding from the corpus centroid — mean over dims of
    ((x−μᵢ)/σᵢ)², the standard cheap OOD score for flagging mis-embedded /
    corrupted / off-domain vectors before they pollute retrieval or
    clustering. Population σ (not sample); σ ≤ 1e-12 dims fall back to
    unit scale (defined, not NaN).

    Scale shape: pass 1 computes the 64-row per-dimension (μ, σ) via ONE
    aggregate of per-dim sums (posexplode + groupBy(i) — uniform keys,
    |dims| groups); the tiny stats frame then BROADCASTS back and scoring
    is a map-only higher-order fold per vector (no second shuffle, no
    explode on the scoring pass). Top-20 is TakeOrderedAndProject. Two
    linear scans total at any corpus size."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = e.select(
        "vec_id", F.posexplode("v").alias("i0", "x")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    stats = dims.groupBy("i").agg(
        F.avg("x").alias("mu"),
        F.sqrt(F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias(
            "sigma"
        ),
    )
    # broadcast the 64-row stats as aligned arrays; score via one zip fold
    packed = stats.orderBy("i").agg(
        F.collect_list("mu").alias("mus"), F.collect_list("sigma").alias("sigmas")
    )
    # mean over dims: divide by F.size(v) — schema-driven rather than a
    # hard-coded dim constant
    scored = (
        e.join(F.broadcast(packed))
        .select(
            "vec_id",
            (
                F.aggregate(
                    F.zip_with(
                        F.zip_with("v", "mus", lambda x, mu: x - mu),
                        "sigmas",
                        lambda c, s: F.pow(
                            c / F.when(s > 1e-12, s).otherwise(F.lit(1.0)), 2
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, z: acc + z,
                )
                / F.size("v")
            ).alias("m2"),
        )
    )
    return (
        scored.select("vec_id", F.round("m2", 6).alias("mahalanobis_sq_mean"))
        .orderBy(F.col("m2").desc(), F.col("vec_id").asc())
        .limit(20)
    )
