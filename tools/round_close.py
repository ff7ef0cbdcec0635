"""Round-close orchestrator: run every per-round gate in order, on the
code that ships, and print a single summary table.

The repo's verification surface is a set of independent harnesses —
oracle differential, partition-stability, three scale probes, the
window-rotation policy, pytest — each pinned to the live registry by a
contract test. The pins catch a MISSING report but not a STALE one
(round 5 found `STABILITY_r05.json` predating the skew rewrites), so
this tool makes the close-out mechanical: run it after the last code
commit of a round and commit the refreshed artifacts it writes.

Stages (each skippable; heavy Spark stages run SERIALLY — every one
spins a local[*] session and concurrent runs contaminate timings):

1. window   — tools/next_window.py policy gate (fast, no Spark)
2. oracle   — tools/check_oracle.py at --sf (full differential)
3. stability— tools/check_stability.py --json STABILITY_r{N}.json
4. dup      — tools/probe_dup.py --json PROBE_r{N}.json
5. skew     — tools/probe_skew.py --json SKEW_r{N}.json
6. scaling  — tools/probe_scaling.py --json SCALING_r{N}.json
7. bench    — python bench.py, then copy bench_full_latest.json to
              bench_r{N}_full.json
8. pytest   — python -m pytest tests/ -q

Usage:
    python tools/round_close.py --round 6 [--sf /root/testdata/sf0.01]
        [--skip dup skew scaling] [--only oracle pytest]

Timings are wall-clock per stage; exit code is non-zero if any stage
fails. Bench totals are NOT cross-day comparable on this host (see
SCALE.md "Round-5 bench close-out") — the bench stage records, it does
not judge.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def stage_cmds(rnd: int, sf: str, sf_hi: str) -> dict[str, list[str]]:
    py = sys.executable
    return {
        "window": [py, "tools/next_window.py", "--json"],
        "oracle": [py, "tools/check_oracle.py", sf],
        "stability": [
            py, "tools/check_stability.py", "--json", f"STABILITY_r{rnd:02d}.json",
        ],
        "dup": [py, "tools/probe_dup.py", "--json", f"PROBE_r{rnd:02d}.json"],
        "skew": [py, "tools/probe_skew.py", "--json", f"SKEW_r{rnd:02d}.json"],
        "scaling": [
            py, "tools/probe_scaling.py", "--json", f"SCALING_r{rnd:02d}.json",
        ],
        "bench": [py, "bench.py"],
        "pytest": [py, "-m", "pytest", "tests/", "-q"],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--sf-hi", default="/root/testdata/sf0.1")
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    cmds = stage_cmds(args.round, args.sf, args.sf_hi)
    selected = [
        n
        for n in cmds
        if (args.only is None or n in args.only) and n not in args.skip
    ]
    unknown = (set(args.skip) | set(args.only or [])) - set(cmds)
    if unknown:
        print(f"unknown stage(s): {sorted(unknown)}; valid: {list(cmds)}")
        return 2

    results: list[tuple[str, str, float]] = []
    failed = False
    for name in selected:
        t0 = time.perf_counter()
        print(f"=== {name}: {' '.join(cmds[name])}", flush=True)
        rc = subprocess.call(cmds[name], cwd=REPO)
        dt = time.perf_counter() - t0
        if name == "bench" and rc == 0:
            src = os.path.join(REPO, "bench_full_latest.json")
            dst = os.path.join(REPO, f"bench_r{args.round}_full.json")
            if os.path.exists(src):
                shutil.copy(src, dst)
                print(f"    copied bench_full_latest.json -> {os.path.basename(dst)}")
        status = "ok" if rc == 0 else f"FAIL rc={rc}"
        failed = failed or rc != 0
        results.append((name, status, dt))
        print(f"=== {name}: {status} in {dt:.0f}s", flush=True)

    print("\nround-close summary")
    for name, status, dt in results:
        print(f"  {name:<10} {status:<10} {dt:7.0f}s")
    if failed:
        print("ONE OR MORE STAGES FAILED — do not seal the round.")
    else:
        print(
            "all stages green — commit the refreshed STABILITY/PROBE/SKEW/"
            "SCALING/bench artifacts."
        )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
