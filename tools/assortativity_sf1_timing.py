"""Time the exact vs hour-scoped assortativity at sf1.0 (r8 verdict item 6).

The closed-form multigraph operator (`operators/graph.py::
hour_scoped_assortativity`) was built in r8 as the documented scale path
for the one soft-flagged query in the scaling sweep
(`graph_degree_assortativity`, slope2 ~2 — empirically pinned to data
densification by TIMEAXIS_r08.json, not to the plan). Its headline claim —
linear in |user-hours| at ANY hourly density, because it never
materializes an edge — had not been TIMED on the densified world where
the exact operator actually hurts. This tool produces that number.

Runs each operator twice on the same world (min reported, cold plan
excluded), same input discipline as the registry query: events →
purchase user-hours. No concurrent Spark work (timing run).

Usage: python tools/assortativity_sf1_timing.py [--sf /tmp/world_sf1]
           [--json ASSORT_TIMING_rN.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/world_sf1")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cobalt_duckdb_spark.io import load_table
    from cobalt_duckdb_spark.operators.graph import hour_scoped_assortativity
    from cobalt_duckdb_spark.queries import queries
    from cobalt_duckdb_spark.session import get_spark

    spark = get_spark("assort-sf1-timing")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the input file + JVM so neither operator is billed scan cold-start
    load_table(spark, args.sf, "events").count()

    def time2(fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn().collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    exact_fn = queries()["graph_degree_assortativity"]
    exact_sec = time2(lambda: exact_fn(spark, args.sf))

    def scoped():
        ev = load_table(spark, args.sf, "events")
        ua = (
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id", F.date_trunc("hour", "ts").alias("h"))
            .distinct()
        )
        return hour_scoped_assortativity(ua, user_col="user_id", hour_col="h")

    scoped_sec = time2(scoped)

    rec = {
        "tool": "tools/assortativity_sf1_timing.py",
        "sf": args.sf,
        "exact_sec": exact_sec,
        "hour_scoped_sec": scoped_sec,
        "speedup": round(exact_sec / scoped_sec, 1) if scoped_sec else None,
        "exact_result": [
            r.asDict() for r in exact_fn(spark, args.sf).collect()
        ],
        "hour_scoped_result": [r.asDict() for r in scoped().collect()],
    }
    print(json.dumps(rec, default=str))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rec, f, indent=1, default=str)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
