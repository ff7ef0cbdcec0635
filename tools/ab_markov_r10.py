"""r10 re-adjudication of the two weak r9 markov claims (r9 verdict item 4).

Interleaved solo A/B of events_markov_removal_attribution and
events_markov_absorption: the CURRENT tree's shape vs the r8 shape
(reconstructed from git `2fad5fe:cobalt_duckdb_spark/queries/events.py`,
written to a scratch module). Each rep alternates old/new IN THE SAME
PROCESS (same session, same JVM state), timing a full build+collect, so
host bursts hit both sides equally. Run on a quiet window; the script
prints a calib leg before and after each rep pair.

    python tools/ab_markov_r10.py [--sf DIR] [--reps N] [--names q1 q2]
"""

from __future__ import annotations

import argparse
import gc
import importlib.util
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from cobalt_duckdb_spark.session import get_spark


def load_old_module(tmp_path: str = "/tmp/events_r8_shape.py"):
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show",
         "2fad5fe:cobalt_duckdb_spark/queries/events.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    # neutralize the @register decorator so importing the old module does
    # not clobber the live registry: route through a local no-op
    src = src.replace(
        "from cobalt_duckdb_spark.queries import register",
        "def register(name, oracle=None):\n"
        "    def deco(fn):\n        return fn\n    return deco",
    )
    with open(tmp_path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("events_r8_shape", tmp_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--names", nargs="+",
        default=["events_markov_removal_attribution", "events_markov_absorption"],
    )
    args = ap.parse_args()

    spark = get_spark("ab-markov-r10")
    spark.sparkContext.setLogLevel("ERROR")
    import bench as _bench

    old_mod = load_old_module()
    from cobalt_duckdb_spark.queries import queries

    reg = queries()
    print(f"calib_start {_bench._calibrate(spark)}", flush=True)
    # warm both variants once (JIT/codegen)
    for name in args.names:
        getattr(old_mod, name)(spark, args.sf).collect()
        reg[name](spark, args.sf).collect()
        gc.collect()

    results: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in args.names
    }
    for rep in range(args.reps):
        for name in args.names:
            for tag, fn in (("old", getattr(old_mod, name)), ("new", reg[name])):
                spark.sparkContext.setJobDescription(f"ab:{name}:{tag}:{rep}")
                t0 = time.perf_counter()
                fn(spark, args.sf).collect()
                dt = time.perf_counter() - t0
                results[name][tag].append(round(dt, 3))
                gc.collect()
        print(f"rep {rep}: " + " | ".join(
            f"{n}: old {results[n]['old']} new {results[n]['new']}"
            for n in args.names
        ), flush=True)
    print(f"calib_end {_bench._calibrate(spark)}", flush=True)
    for name in args.names:
        o, n = results[name]["old"], results[name]["new"]
        print(
            f"{name}: old min {min(o):.2f} new min {min(n):.2f} "
            f"ratio x{min(n) / min(o):.2f} (old {o} new {n})",
            flush=True,
        )


if __name__ == "__main__":
    main()
