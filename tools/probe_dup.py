"""10× duplication probe as a repeatable tool (round-3 verdict item 5).

Round 3's ad-hoc probe found three real scale-killers (SRP-LSH payload
width, component input composition, TextRank band self-join — SCALE.md §"10×
probe") by timing queries on a synthetic heavy-duplication corpus. This
commits that methodology so scale regressions in NEW queries are caught
mechanically every round instead of by builder diligence.

What it builds (once, cached in --workdir):

- ``documents``: each base doc replicated ``--factor`` times into a
  near-dup family — replica 0 verbatim, replica r>0 with the doc's first
  token replaced by a per-replica marker (same length profile, ~identical
  shingle set → worst-case for candidate-pair generation). doc_id remapped
  to ``doc_id*factor + r`` (keeps int64, keeps uniqueness).
- ``embeddings``: same replication; replica r>0 perturbs dimension 0 by
  ``r * 1e-4`` (cosine-near family for SRP/SemDeDup/ANN paths).
- every other table: copied through unchanged (dims/facts aren't the
  duplication-scaling risk; events-family growth is covered by sf choice).

Then it times each selected registry query at BASE and at the duplicated
dir (min of 2 runs, like bench.py) and reports the ratio. A query whose
runtime grows ≳ factor is linear (fine); superlinear entries — ratio >
``--flag-ratio`` (default 3× the factor) — are flagged, exit 1.

Pair-emitting dedup queries legitimately emit O(family²) OUTPUT rows under
duplication (SCALE.md lesson 1); the flag threshold is generous for that,
and the report prints rows_out so a flagged entry can be triaged as
"output grew" vs "plan degraded".

Usage:
    python tools/probe_dup.py [--sf /root/testdata/sf0.01] [--factor 10]
        [--names 'dedup_*' 'simsearch_*' ...] [--workdir /tmp/probe_dup]
        [--flag-ratio 30] [--json out.json]

Default name set = the duplication-sensitive families (dedup, simsearch,
embedding, pipeline, text fingerprint/shingle paths). sf0.01 default keeps
a full default sweep ~minutes; use sf0.1 for the per-round report.
"""

from __future__ import annotations

import argparse
import fnmatch
import gc
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Family prefixes selected WHOLESALE (r4 verdict item 6): a new
# pair-emitting registry entry in any of these families is probed by
# default — it cannot silently skip the report by not being listed here.
DEFAULT_PATTERNS = [
    "dedup_*",
    "simsearch_*",
    "embedding_*",
    "pipeline_*",
    "graph_*",
    "multimodal_*",
    "hybrid_*",
    "cluster_*",
    "text_fingerprints",
    "text_winnowing_fingerprints",
    "text_textrank_keywords",
    "sample_dsir_importance",
]

# Documented exclusions from the default family sweep — each with the
# reason it is duplication-INSENSITIVE (the probe's JSON records these so
# an excluded name is visible, not silently absent).
DEFAULT_EXCLUDE: dict[str, str] = {
    # The dup corpus replicates documents+embeddings only (events/lineitem
    # copied through unchanged — dims/facts aren't the duplication-scaling
    # risk, see module docstring). Queries whose ONLY inputs are those
    # unchanged tables measure ratio ~1.0 by construction; excluding them
    # keeps the sweep honest about what was actually stressed.
    "graph_pagerank_event_flow": "events-only input; unchanged by dup corpus",
    "graph_triangle_parts": "lineitem-only input; unchanged by dup corpus",
    "graph_personalized_pagerank_error": "events-only input; unchanged",
    "graph_link_prediction_jaccard": "lineitem-only input; unchanged",
    "graph_degree_assortativity": "events-only input; unchanged",
    "graph_kcore_peeling": "lineitem-only input; unchanged",
    "graph_scc_mutual_reachability": "events-only input; unchanged",
    "graph_lpa_communities": "lineitem-only input; unchanged",
    "graph_hits_hubs_authorities": "events-only input; unchanged",
}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_dup_dir(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    """Materialize the duplicated corpus (idempotent: skips if present)."""
    from pyspark.sql import functions as F

    marker = os.path.join(out_dir, f"_built_x{factor}")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)

    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # replica 0 keeps the text verbatim; r>0 swaps the first token for a
    # per-replica marker → near-identical shingle sets, the worst case for
    # candidate generation in every shingle/band/bucket path
    toks = F.split(F.col("text"), " ")
    variant = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.concat_ws(
            " ",
            F.concat(F.lit("dupv"), F.col("rep").cast("string")),
            F.array_join(F.slice(toks, 2, 1_000_000), " "),
        )
    )
    (
        docs.select("*", rep)
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            variant.alias("text"),
            "lang",
            "source",
            F.length(variant).alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(i == 0, x + F.col("rep").cast("float") * 1e-4).otherwise(x),
    )
    (
        emb.select("*", rep)
        .select(
            (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
            perturbed.cast("array<float>").alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )

    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)
    open(marker, "w").close()


def time_query(fn, spark, sf_dir: str, runs: int = 2) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = len(fn(spark, sf_dir).collect())
        best = min(best, time.perf_counter() - t0)
        gc.collect()
    return round(best, 3), rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--names", nargs="+", default=DEFAULT_PATTERNS)
    ap.add_argument("--workdir", default="/tmp/probe_dup")
    ap.add_argument(
        "--flag-ratio",
        type=float,
        default=None,
        help="flag queries whose dup/base time ratio exceeds this "
        "(default: 3 × factor)",
    )
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()
    flag_ratio = args.flag_ratio or 3.0 * args.factor

    from cobalt_duckdb_spark.queries import queries
    from cobalt_duckdb_spark.session import get_spark

    spark = get_spark("probe-dup")
    spark.sparkContext.setLogLevel("ERROR")

    dup_dir = os.path.join(
        args.workdir, os.path.basename(args.sf.rstrip("/")) + f"_x{args.factor}"
    )
    build_dup_dir(spark, args.sf, dup_dir, args.factor)

    explicit_names = args.names is not DEFAULT_PATTERNS
    selected = {
        n: fn
        for n, fn in queries().items()
        if any(fnmatch.fnmatch(n, p) for p in args.names)
        and (explicit_names or n not in DEFAULT_EXCLUDE)
    }
    excluded = (
        {}
        if explicit_names
        else {
            n: why
            for n, why in DEFAULT_EXCLUDE.items()
            if any(fnmatch.fnmatch(n, p) for p in args.names)
        }
    )
    report, flagged = {}, []
    for name, fn in selected.items():
        try:
            base_s, base_rows = time_query(fn, spark, args.sf)
            dup_s, dup_rows = time_query(fn, spark, dup_dir)
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e)[:200]}
            flagged.append(name)
            print(f"ERROR {name}: {e}")
            continue
        ratio = round(dup_s / base_s, 1) if base_s > 0 else None
        rec = {
            "base_sec": base_s,
            "dup_sec": dup_s,
            "ratio": ratio,
            "rows_base": base_rows,
            "rows_dup": dup_rows,
        }
        report[name] = rec
        mark = ""
        if ratio is not None and ratio > flag_ratio:
            flagged.append(name)
            mark = "  <-- SUPERLINEAR"
        print(
            f"{name:<44} {base_s:>7.2f}s -> {dup_s:>7.2f}s  x{ratio}"
            f"  rows {base_rows}->{dup_rows}{mark}"
        )

    out = {
        "sf": args.sf,
        "factor": args.factor,
        "flag_ratio": flag_ratio,
        "flagged": flagged,
        "excluded": excluded,
        "queries": report,
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps({"probed": len(report), "flagged": flagged}))
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
