"""Physical-plan smell audit over EVERY registered query.

For each registry entry, build the DataFrame at the given sf_dir and inspect
the optimized physical plan (no execution beyond what query construction
itself does) for patterns that don't survive scale:

- ``CartesianProduct``     — an unconditioned all-pairs join: O(n·m) rows.
- ``BatchEvalPython``      — row-at-a-time Python UDF in the plan (the slow
                             path; Arrow-batched ``ArrowEvalPython`` /
                             ``FlatMapGroupsInPandas`` / ``MapInPandas``
                             are the sanctioned Python escapes).
- ``BroadcastNestedLoopJoin`` with a non-broadcastable-at-scale side is NOT
  flagged: every occurrence here is a deliberate single-row/corpus-stats
  broadcast (cutoffs, corpus aggregates), which is the intended pattern.

Usage: python tools/plan_audit.py [sf_dir] [name ...]
Exit 1 if any smell is found. Run by pytest (test_plans.py) over the full
registry — a de-optimized plan is a failed test, not a surprise at 100 TB.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMELLS = ("CartesianProduct", "BatchEvalPython")


def audit(spark, sf_dir: str, only: set[str] | None = None) -> dict[str, list[str]]:
    """Return {query_name: [smells]} for every audited query (empty list =
    clean). Queries are built, not executed."""
    from cobalt_duckdb_spark.queries import queries

    out: dict[str, list[str]] = {}
    for name, fn in queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = [s for s in SMELLS if s in plan]
    return out


def main() -> int:
    from cobalt_duckdb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    results = audit(spark, sf_dir, only)
    bad = {k: v for k, v in results.items() if v}
    for name, smells in bad.items():
        print(f"SMELL {name}: {', '.join(smells)}")
    print(f"{len(results) - len(bad)}/{len(results)} plans clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
