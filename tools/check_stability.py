"""Partitioning-perturbation determinism harness.

SCALE.md §Round 5 claims the exact-decimal discipline makes results
"bit-stable under speculative re-execution, AQE re-planning, and
partition-count changes — a property double aggregates simply do not
have". This tool TESTS that claim instead of asserting it: every registry
query runs twice on the same data under two deliberately different
physical configurations, and the canonicalized results must be identical.

Profile A (baseline) is the repo's session defaults (AQE on, shuffle
partitions = cores, 128m scan splits). Profile B forces a different
physical plan everywhere it can without touching semantics:

- ``spark.sql.shuffle.partitions = 7`` — different hash-partition count →
  different partial-aggregate grouping and combine order for every
  groupBy/join;
- ``spark.sql.files.maxPartitionBytes = 1m`` + ``openCostInBytes = 0`` —
  many small scan splits → different map-side accumulation trees;
- ``spark.sql.adaptive.enabled = false`` — no runtime coalescing, so the
  perturbed partition counts actually survive into execution.

All four are runtime session confs (set/unset per profile on one
SparkSession — no restart). What a mismatch means, in scale terms: the
query's result depends on the physical partitioning, so on a real cluster
it would return DIFFERENT answers under AQE re-planning, executor loss, or
a data re-layout. The known causes this harness catches mechanically:

- double-sum accumulation-order sensitivity at a rounding boundary (the
  class `functions/exact.py` eliminates — a flag here means a site was
  left on the double path that shouldn't have been);
- rank/LIMIT selection with unbroken ties (order within a tie group is
  partition-dependent);
- any accidental use of partition-dependent expressions
  (monotonically_increasing_id, spark_partition_id, rand) in a result.

Comparison is the oracle gate's own canonicalize/stringify (rows sorted,
floats at 12 significant digits), so "stable" here is exactly as strict as
the driver's value hash.

Usage:
    python tools/check_stability.py [--sf /root/testdata/sf0.01]
        [--names name_or_glob ...] [--json out.json]

Exit 1 if any query's two runs disagree (or error).
"""

from __future__ import annotations

import argparse
import fnmatch
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import canonicalize, stringify  # noqa: E402

# (conf, perturbed value). Baseline values are read from the live session
# and restored after the perturbed pass, so the harness composes with any
# session the repo's factory builds.
PERTURBED = [
    ("spark.sql.shuffle.partitions", "7"),
    ("spark.sql.files.maxPartitionBytes", "1048576"),
    ("spark.sql.files.openCostInBytes", "0"),
    ("spark.sql.adaptive.enabled", "false"),
]


def _run(fn, spark, sf_dir):
    pdf = canonicalize(fn(spark, sf_dir).toPandas())
    return len(pdf), list(pdf.columns), stringify(pdf)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--names", nargs="+", default=None)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    from cobalt_duckdb_spark.queries import queries
    from cobalt_duckdb_spark.session import get_spark

    spark = get_spark("stability-check")
    spark.sparkContext.setLogLevel("ERROR")

    selected = {
        n: fn
        for n, fn in queries().items()
        if args.names is None or any(fnmatch.fnmatch(n, p) for p in args.names)
    }

    # Pass 1: baseline profile (session defaults, untouched).
    base: dict[str, tuple] = {}
    errors: dict[str, str] = {}
    for name, fn in selected.items():
        try:
            base[name] = _run(fn, spark, args.sf)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"baseline error: {str(e)[:200]}"
            print(f"ERROR {name}: baseline: {e}")

    # Pass 2: perturbed profile.
    saved = {k: spark.conf.get(k, None) for k, _ in PERTURBED}
    for k, v in PERTURBED:
        spark.conf.set(k, v)
    flagged = list(errors)
    report: dict[str, dict] = {n: {"error": e} for n, e in errors.items()}
    try:
        for name, fn in selected.items():
            if name in errors:
                continue
            try:
                pert = _run(fn, spark, args.sf)
            except Exception as e:  # noqa: BLE001
                flagged.append(name)
                report[name] = {"error": f"perturbed error: {str(e)[:200]}"}
                print(f"ERROR {name}: perturbed: {e}")
                continue
            b = base[name]
            problems = []
            if b[0] != pert[0]:
                problems.append(f"rows {b[0]} != {pert[0]}")
            if b[1] != pert[1]:
                problems.append(f"cols {b[1]} != {pert[1]}")
            if not problems and b[2] != pert[2]:
                diff = [(x, y) for x, y in zip(b[2], pert[2]) if x != y][:3]
                problems.append("value hash mismatch")
                for x, y in diff:
                    print(f"  base: {x}\n  pert: {y}")
            report[name] = {
                "rows": pert[0],
                "stable": not problems,
                **({"problems": problems} if problems else {}),
            }
            if problems:
                flagged.append(name)
                print(f"UNSTABLE {name}: {'; '.join(problems)}")
            else:
                print(f"ok   {name}: rows={pert[0]} partition-stable")
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    out = {
        "sf": args.sf,
        "perturbed_conf": dict(PERTURBED),
        "checked": len(selected),
        "flagged": sorted(flagged),
        "queries": report,
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    print(
        f"\n{len(selected) - len(flagged)}/{len(selected)} queries "
        f"partition-stable ({len(queries())} registered)"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
