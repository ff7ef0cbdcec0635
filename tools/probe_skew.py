"""Hot-key skew probe: measure, per query, what a pathological key does.

probe_dup.py stresses VOLUME growth (near-dup families); this probes the
other 100-TB failure axis: KEY skew. It derives a corpus where a large
fraction of fact rows collapse onto one hot entity —

- ``events``: ``--hot-frac`` (default 0.4) of all events are reassigned to
  ``user_id = 1`` (timestamps/types/values untouched);
- ``lineitem``: the same fraction of lines reassigned to ``l_partkey = 1``
  and, independently hashed, ``l_suppkey = 1``;
- ``orders``: the same fraction reassigned to ``o_custkey = 1`` (one
  whale customer holding 40% of all orders — the customer-keyed twin of
  the hot user/part/supplier);
- every other table copied through unchanged —

then times each selected query at BASE vs SKEW (same row counts, same
bytes; ONLY the key distribution changes). A healthy plan is flat (~1×):

- hash-aggregations absorb hot keys in map-side partial aggregation;
- broadcast joins don't care about probe-side key distribution;
- AQE skew-join splits oversized shuffle partitions for the sort-merge
  paths.

The structural casualty is the per-entity WINDOW (``partitionBy(user)``)
and per-entity ``applyInPandas``: one partition = one task, so a key
holding 40% of a 100 TB table serializes 40% of the work onto one core no
matter how many executors exist. Entries flagged here need either a
bounded-per-entity-cardinality contract (documented) or a salted two-phase
rewrite (chunk the hot entity by coarse time bucket, compute locally,
merge boundaries — see SCALE.md §Round 5 skew posture).

Flagging: time ratio normalized by output growth (``per_row_ratio`` =
time ratio / max(1, rows ratio)) > ``--flag-ratio`` (default 3.0). The
hot key passes study filters (user_id < K), so per-key output can grow
~60× legitimately; plan degradation is time growing out of proportion
with output. Raw-ratio exceeders whose per-row cost stayed flat land in
``output_growth`` instead — reported, never silently dropped.

Usage:
    python tools/probe_skew.py [--sf /root/testdata/sf0.1]
        [--hot-frac 0.4] [--names glob ...] [--workdir /tmp/probe_skew]
        [--flag-ratio 3.0] [--json out.json]
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

# Key-shuffle-sensitive families: anything that groups, windows, joins or
# sessionizes on user_id / partkey / suppkey. Wholesale patterns, same
# philosophy as probe_dup: new entries in these families are probed by
# default and cannot silently skip.
DEFAULT_PATTERNS = [
    "events_*",
    "window_*",
    "stream_*",
    "join_*",
    "q9_*",
    "q14_*",
    "q16_*",
    "q2_*",
    "q11_*",
    "q15_*",
    "q20_*",
    "q3_*",
    "q4_*",
    "q10_*",
    "q13_*",
    "q18_*",
    "q22_*",
    "agg_*",
    "stats_*",
]

# Duplication-insensitive exclusions don't apply here; skew exclusions are
# for queries whose inputs the skewed corpus leaves untouched.
DEFAULT_EXCLUDE: dict[str, str] = {
    "events_markov_removal_attribution": "5 chain solves dominated by vocab size, not key layout",
}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_BUILD_V = 2  # v2: + orders.o_custkey hot key


def build_skew_dir(spark, sf_dir: str, out_dir: str, hot_frac: float) -> None:
    from pyspark.sql import functions as F

    # bump _BUILD_V whenever the derivation changes, else a cached workdir
    # from an older builder silently serves the old corpus
    marker = os.path.join(out_dir, f"_built_f{hot_frac}_v{_BUILD_V}")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)
    pct = int(hot_frac * 100)

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    hot = F.abs(F.xxhash64("event_id", F.lit(7))) % 100 < pct
    (
        ev.withColumn(
            "user_id", F.when(hot, F.lit(1).cast("long")).otherwise(F.col("user_id"))
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    hot_p = F.abs(F.xxhash64("l_orderkey", "l_linenumber", F.lit(8))) % 100 < pct
    hot_s = F.abs(F.xxhash64("l_orderkey", "l_linenumber", F.lit(9))) % 100 < pct
    (
        li.withColumn(
            "l_partkey", F.when(hot_p, F.lit(1).cast("long")).otherwise(F.col("l_partkey"))
        )
        .withColumn(
            "l_suppkey", F.when(hot_s, F.lit(1).cast("long")).otherwise(F.col("l_suppkey"))
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "lineitem.parquet"))
    )

    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    hot_c = F.abs(F.xxhash64("o_orderkey", F.lit(10))) % 100 < pct
    (
        od.withColumn(
            "o_custkey", F.when(hot_c, F.lit(1).cast("long")).otherwise(F.col("o_custkey"))
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "orders.parquet"))
    )

    for t in TABLES:
        if t in ("events", "lineitem", "orders"):
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
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--hot-frac", type=float, default=0.4)
    ap.add_argument("--names", nargs="+", default=DEFAULT_PATTERNS)
    ap.add_argument("--workdir", default="/tmp/probe_skew")
    ap.add_argument("--flag-ratio", type=float, default=3.0)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    from cobalt_duckdb_spark.queries import queries
    from cobalt_duckdb_spark.session import get_spark

    spark = get_spark("probe-skew")
    spark.sparkContext.setLogLevel("ERROR")

    skew_dir = os.path.join(
        args.workdir,
        os.path.basename(args.sf.rstrip("/")) + f"_f{args.hot_frac}",
    )
    build_skew_dir(spark, args.sf, skew_dir, args.hot_frac)

    explicit = args.names is not DEFAULT_PATTERNS
    selected = {
        n: fn
        for n, fn in queries().items()
        if any(fnmatch.fnmatch(n, p) for p in args.names)
        and (explicit or n not in DEFAULT_EXCLUDE)
    }
    report, flagged, output_growth = {}, [], []
    for name, fn in selected.items():
        try:
            base_s, base_rows = time_query(fn, spark, args.sf)
            skew_s, skew_rows = time_query(fn, spark, skew_dir)
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e)[:200]}
            flagged.append(name)
            print(f"ERROR {name}: {e}")
            continue
        ratio = round(skew_s / base_s, 2) if base_s > 0 else None
        # The hot key frequently passes study filters (user_id < K), so
        # per-key window/join output can legitimately grow ~60x. Plan
        # degradation is time growing OUT OF PROPORTION with output:
        # normalize the time ratio by output growth (never below 1x) and
        # flag on that. Raw-ratio exceeders whose per-row cost stayed flat
        # are reported separately so they can't silently vanish.
        rows_ratio = (skew_rows / base_rows) if base_rows else None
        eff = (
            round(ratio / max(1.0, rows_ratio), 2)
            if ratio is not None and rows_ratio is not None
            else ratio
        )
        report[name] = {
            "base_sec": base_s,
            "skew_sec": skew_s,
            "ratio": ratio,
            "per_row_ratio": eff,
            "rows_base": base_rows,
            "rows_skew": skew_rows,
        }
        mark = ""
        if eff is not None and eff > args.flag_ratio:
            flagged.append(name)
            mark = "  <-- SKEW-SENSITIVE"
        elif ratio is not None and ratio > args.flag_ratio:
            output_growth.append(name)
            mark = "  (output growth)"
        print(
            f"{name:<44} {base_s:>7.2f}s -> {skew_s:>7.2f}s  x{ratio}"
            f"  rows {base_rows}->{skew_rows}{mark}"
        )

    out = {
        "sf": args.sf,
        "hot_frac": args.hot_frac,
        "flag_ratio": args.flag_ratio,
        "flagged": flagged,
        "output_growth": output_growth,
        "excluded": {} if explicit else DEFAULT_EXCLUDE,
        "queries": report,
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps({"probed": len(report), "flagged": flagged}))
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
