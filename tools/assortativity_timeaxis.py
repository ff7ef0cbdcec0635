"""Time-axis experiment for graph_degree_assortativity (r7 verdict item 6).

The sf1.0 scaling sweep soft-flagged assortativity at slope2 ~1.9 and the
adjudication was "data densification, not plan": the derived sf1.0 world
packs 10x the users into the SAME wall-clock window, so per-hour actives
grow 10x and the co-activity edge list (TH(SUM_h a_h^2)) grows ~100x. The
claim "production time axes grow with volume, which caps hourly density"
was ASSUMED. This tool measures it:

- Builds a second 10x events world, ``--out /tmp/world_sf1_tspread``, with
  the SAME key-offset replication as make_world_scale.py but each replica
  time-shifted into its own disjoint span (ts + rep * (span + 1h)) — 10x
  the volume at sf0.1's hourly density, which is what real growth over a
  longer collection window looks like.
- Times the registered query (unchanged code, via queries()) at
  sf0.1, at the densified sf1.0 world, and at the time-spread world
  (min of --trials), and reports both 0.1 -> 1.0 slopes:

      slope2 = log10(t_hi / t_sf01) / log10(10)

  Expectation under the adjudication: slope2(tspread) ~ 1 (linear — edge
  count grows 10x), slope2(densified) ~ 2 (edge count grows 100x). If
  tspread comes out ~2 as well, the plan is quadratic in volume regardless
  of density and the adjudication was wrong.

Only the events table is built: the query reads nothing else. The world is
derived (deterministic, seeded by construction) and never touches
/root/testdata.

Usage:
    python tools/assortativity_timeaxis.py [--src /root/testdata/sf0.1]
        [--densified /tmp/world_sf1] [--out /tmp/world_sf1_tspread]
        [--factor 10] [--trials 2] [--json TIMEAXIS_rN.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tspread_events(spark, src: str, out: str, factor: int) -> None:
    from pyspark.sql import functions as F

    marker = os.path.join(out, f"_built_tspread_f{factor}")
    if os.path.exists(marker):
        return
    os.makedirs(out, exist_ok=True)
    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    st_e = int(ev.agg(F.max("event_id")).first()[0]) + 1
    st_u = int(ev.agg(F.max("user_id")).first()[0]) + 1
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_us = int((hi - lo).total_seconds() * 1_000_000) + 3_600_000_000

    reps = spark.range(factor).select(F.col("id").cast("int").alias("_rep"))
    wide = ev.crossJoin(F.broadcast(reps))
    for k, stride in (("event_id", st_e), ("user_id", st_u)):
        wide = wide.withColumn(
            k, (F.col(k) + F.col("_rep").cast("long") * stride).cast("long")
        )
    # each replica lives in its own disjoint window: hourly density is
    # EXACTLY the source's, total volume is factor x. events.ts is
    # TIMESTAMP_NTZ (unix_micros rejects it); with the session pinned to
    # UTC the NTZ -> TIMESTAMP -> micros -> TIMESTAMP -> NTZ round-trip is
    # the identity, so the shift is exact.
    wide = wide.withColumn(
        "ts",
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.col("_rep").cast("long") * span_us
        ).cast("timestamp_ntz"),
    )
    dst = os.path.join(out, "events.parquet")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    wide.drop("_rep").repartition(16).write.parquet(dst)
    open(marker, "w").close()


def time_query(fn, spark, sf_dir: str, trials: int) -> float:
    best = math.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--densified", default="/tmp/world_sf1")
    ap.add_argument("--out", default="/tmp/world_sf1_tspread")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from cobalt_duckdb_spark.queries import queries
    from cobalt_duckdb_spark.session import get_spark

    spark = get_spark("assortativity-timeaxis")
    build_tspread_events(spark, args.src, args.out, args.factor)

    fn = queries()["graph_degree_assortativity"]
    t_base = time_query(fn, spark, args.src, args.trials)
    t_spread = time_query(fn, spark, args.out, args.trials)
    t_dense = (
        time_query(fn, spark, args.densified, args.trials)
        if os.path.isdir(args.densified)
        else None
    )

    lf = math.log10(args.factor)
    rec = {
        "tool": "tools/assortativity_timeaxis.py",
        "factor": args.factor,
        "trials": args.trials,
        "sec_sf01": round(t_base, 2),
        "sec_timespread": round(t_spread, 2),
        "sec_densified": round(t_dense, 2) if t_dense else None,
        "slope2_timespread": round(math.log10(t_spread / t_base) / lf, 3),
        "slope2_densified": (
            round(math.log10(t_dense / t_base) / lf, 3) if t_dense else None
        ),
        "verdict_threshold": "timespread slope2 < 1.5 supports the "
        "data-densification adjudication",
    }
    print(json.dumps(rec, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=2)
    return 0 if rec["slope2_timespread"] < 1.5 else 1


if __name__ == "__main__":
    raise SystemExit(main())
