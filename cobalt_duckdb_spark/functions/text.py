"""Text-analysis expressions (SURVEY.md §2.8 F4-F6 + north-star text ops).

All pure Catalyst column expressions (JVM-side, whole-stage codegen) — no
Python in the hot path. The markdown cleanup chain mirrors the reference's
``.replace`` pipeline (``/root/reference/model/data/notion_db.py:161``); the
rest are the language-ID / quality / fingerprint operators a training-data
pipeline runs over a raw text column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def markdown_cleanup(col: Column | str) -> Column:
    """The reference's exact cleanup chain
    (``notion_db.py:161``): '\\n\\n'→'\\n', '<br/>'→'\\n', '*'→''."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(
        F.replace(F.replace(c, F.lit("\n\n"), F.lit("\n")), F.lit("<br/>"), F.lit("\n")),
        F.lit("*"),
        F.lit(""),
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (split on single space — the corpus is
    single-spaced; use regex split for messy input)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles: the unit of MinHash / Jaccard dedup.
    Built with sequence+transform so it stays a JVM expression.

    Docs shorter than n tokens yield an empty array — the guard matters
    because Spark's ``sequence(0, -1)`` counts DOWN ([0, -1]) rather than
    producing an empty sequence."""
    t = tokens(col)
    gen = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        )
    )
    return F.when(F.size(t) >= n, gen).otherwise(F.array().cast("array<string>"))


def stopword_ratio(col: Column | str, stopwords: list[str]) -> Column:
    t = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return n_stop / F.size(t)


def avg_token_length(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # (chars excluding spaces) / token count — avoids a second pass over tokens
    return (F.length(F.replace(c, F.lit(" "), F.lit(""))) * 1.0) / F.size(tokens(c))


def quality_score(col: Column | str, stopwords: list[str]) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length docs, a sane
    stopword ratio and mid-length tokens — the usual cheap pre-filter before
    expensive model scoring in a training-data pipeline."""
    tc = token_count(col).cast("double")
    len_score = F.least(tc / 100.0, F.lit(1.0))
    sw = stopword_ratio(col, stopwords)
    sw_score = F.lit(1.0) - F.abs(sw - 0.10) / 0.90
    atl = avg_token_length(col)
    tok_score = F.lit(1.0) - F.least(F.abs(atl - 5.0) / 5.0, F.lit(1.0))
    return (len_score + sw_score + tok_score) / 3.0


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. Identical fingerprints = exact duplicates (dedup key)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(F.regexp_replace(c, "\\s+", " "))))


# Marker stopwords per language for the n-gram language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "und", "das"],
    "es": ["el", "la", "los", "y"],
    "fr": ["le", "la", "et", "les"],
    "zh": ["的", "是", "了", "在"],
}


def langid_votes(col: Column | str, lang: str) -> Column:
    """Count of marker-token hits for one language."""
    t = tokens(col)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(t, lambda x: F.array_contains(markers, x))).cast("bigint")


def predicted_lang(col: Column | str) -> Column:
    """Argmax over language marker votes, ties broken by language code order
    (deterministic); no votes at all → 'und' (undetermined)."""
    c = F.col(col) if isinstance(col, str) else col
    best = None
    for lang in sorted(LANG_MARKERS):
        v = langid_votes(c, lang)
        if best is None:
            best = F.struct(v.alias("v"), F.lit(lang).alias("l"))
        else:
            cand = F.struct(v.alias("v"), F.lit(lang).alias("l"))
            # keep cand only if strictly more votes (earlier lang wins ties)
            best = F.when(cand["v"] > best["v"], cand).otherwise(best)
    return F.when(best["v"] > 0, best["l"]).otherwise(F.lit("und"))
