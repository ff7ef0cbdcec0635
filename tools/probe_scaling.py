"""Data-volume scaling probe: measure, per query, the time-vs-data slope.

probe_dup.py stresses duplication growth (near-dup families) and
probe_skew.py stresses key skew; this probes the third 100-TB failure
axis: raw DATA VOLUME. It times every registry query at two committed
scale factors (default sf0.01 -> sf0.1, a 10x row-count step) and flags
entries whose runtime grows OUT OF PROPORTION with both the data and
their own output:

- a linear, compute-dominated query moves ~data_ratio (10x) at most —
  in practice far less here because fixed Spark overhead dominates
  sub-second queries;
- a quadratic-in-n plan (the O(n^2) window-frame class the r5 skew
  probe caught on the key axis) moves ~data_ratio^2 (100x) once compute
  dominates — unmissable against a 3x-of-slope threshold;
- pair emitters whose OUTPUT legitimately grows faster than the data
  (near-dup audits) are excused by output normalization, mirroring the
  skew probe's ``per_row_ratio`` convention.

Flagging: ``slope = time_ratio / max(data_ratio, rows_ratio)``; flag if
``slope > --flag-ratio`` (default 3.0) AND the hi-SF time exceeds
``--min-sec`` (default 1.0 s — below that, JVM/plan overhead swamps the
measurement and a "ratio" is noise, so sub-floor entries are never
flagged regardless of slope). Entries with ``1.5 < slope <= flag`` above
the floor land in ``superlinear_soft`` — reported, never silently
dropped, same philosophy as the skew probe's ``output_growth`` list.

Both inputs are the driver-generated corpora (TESTDATA.md), so unlike
the other two probes there is no derived-corpus build step; the probe is
a pure measurement pass and any query in the registry can run it.

Usage:
    python tools/probe_scaling.py [--lo /root/testdata/sf0.01]
        [--hi /root/testdata/sf0.1] [--data-ratio 10]
        [--names glob ...] [--flag-ratio 3.0] [--min-sec 1.0]
        [--json out.json]
"""

from __future__ import annotations

import argparse
import fnmatch
import gc
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Scaling is universal: every query is probed by default. Exclusions are
# only for entries whose runtime is dominated by a data-independent
# constant so large that the slope measurement says nothing (documented
# per entry, same contract as the other probes' exclusion maps).
DEFAULT_EXCLUDE: dict[str, str] = {}


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
    ap.add_argument("--lo", default="/root/testdata/sf0.01")
    ap.add_argument("--hi", default="/root/testdata/sf0.1")
    ap.add_argument("--data-ratio", type=float, default=10.0)
    ap.add_argument(
        "--hi2",
        default=None,
        help="optional THIRD point (e.g. an sf1.0 world from "
        "make_world_scale.py) — adds a second leg hi->hi2 so the sweep "
        "measures 0.01 -> 0.1 -> 1.0 (100x the gate scale, r6 verdict 3)",
    )
    ap.add_argument("--data-ratio2", type=float, default=10.0)
    ap.add_argument("--names", nargs="+", default=["*"])
    ap.add_argument("--flag-ratio", type=float, default=3.0)
    ap.add_argument("--min-sec", type=float, default=1.0)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    from cobalt_duckdb_spark.queries import queries
    from cobalt_duckdb_spark.session import get_spark

    spark = get_spark("probe-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    explicit = args.names != ["*"]
    selected = {
        n: fn
        for n, fn in queries().items()
        if any(fnmatch.fnmatch(n, p) for p in args.names)
        and (explicit or n not in DEFAULT_EXCLUDE)
    }
    # One throwaway pass so JVM/codegen warmup lands on no query's clock
    # (min-of-2 alone leaves the first-ever query's lo time inflated).
    if selected:
        first = next(iter(selected.values()))
        try:
            first(spark, args.lo).collect()
        except Exception:  # noqa: BLE001
            pass

    report, flagged, soft = {}, [], []
    for name, fn in selected.items():
        try:
            lo_s, lo_rows = time_query(fn, spark, args.lo)
            hi_s, hi_rows = time_query(fn, spark, args.hi)
            hi2_s = hi2_rows = None
            if args.hi2:
                hi2_s, hi2_rows = time_query(fn, spark, args.hi2)
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e)[:200]}
            flagged.append(name)
            print(f"ERROR {name}: {e}")
            continue

        def leg(a_s, b_s, a_rows, b_rows, data_ratio):
            ratio = round(b_s / a_s, 2) if a_s > 0 else None
            rows_ratio = (b_rows / a_rows) if a_rows else None
            denom = max(data_ratio, rows_ratio) if rows_ratio else data_ratio
            return ratio, (round(ratio / denom, 3) if ratio is not None else None)

        ratio, slope = leg(lo_s, hi_s, lo_rows, hi_rows, args.data_ratio)
        report[name] = {
            "lo_sec": lo_s,
            "hi_sec": hi_s,
            "time_ratio": ratio,
            "slope": slope,
            "rows_lo": lo_rows,
            "rows_hi": hi_rows,
        }
        ratio2 = slope2 = None
        if args.hi2:
            ratio2, slope2 = leg(hi_s, hi2_s, hi_rows, hi2_rows, args.data_ratio2)
            report[name].update(
                {
                    "hi2_sec": hi2_s,
                    "time_ratio2": ratio2,
                    "slope2": slope2,
                    "rows_hi2": hi2_rows,
                }
            )
        mark = ""
        bad = soft_bad = False
        if slope is not None and hi_s >= args.min_sec:
            bad |= slope > args.flag_ratio
            soft_bad |= 1.5 < slope <= args.flag_ratio
        if slope2 is not None and hi2_s >= args.min_sec:
            bad |= slope2 > args.flag_ratio
            soft_bad |= 1.5 < slope2 <= args.flag_ratio
        if bad:
            flagged.append(name)
            mark = "  <-- SUPER-LINEAR"
        elif soft_bad:
            soft.append(name)
            mark = "  (soft super-linear)"
        leg2 = (
            f" -> {hi2_s:>7.2f}s x{ratio2} slope2 {slope2}" if args.hi2 else ""
        )
        print(
            f"{name:<44} {lo_s:>7.2f}s -> {hi_s:>7.2f}s  x{ratio}"
            f"  slope {slope}{leg2}  rows {lo_rows}->{hi_rows}{mark}"
        )

    out = {
        "lo": args.lo,
        "hi": args.hi,
        "hi2": args.hi2,
        "data_ratio": args.data_ratio,
        "data_ratio2": args.data_ratio2 if args.hi2 else None,
        "flag_ratio": args.flag_ratio,
        "min_sec": args.min_sec,
        "flagged": flagged,
        "superlinear_soft": soft,
        "excluded": {} if explicit else DEFAULT_EXCLUDE,
        "queries": report,
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps({"probed": len(report), "flagged": flagged, "soft": soft}))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
