"""Diff two bench JSON lines and flag per-query regressions.

    python tools/bench_compare.py OLD.json NEW.json [threshold]

Either side may be a comma-separated list of records (e.g.
``before1.json,before2.json``): per-query times are then the MIN across
that side's records (calib likewise). Use the SAME number of records on
both sides — r9's min-of-3-vs-1 composite overstated improvement by
construction (r9 verdict item 4); min-of-k vs min-of-k is unbiased.

Prints queries whose time changed by more than ``threshold``× (default 1.5)
in either direction, plus totals — the guard that keeps a perf regression
from hiding inside a 140-query total. Single-node local timings are noisy
(±20% run-to-run is normal); treat one-off flags as re-run candidates, and
only sustained flags as regressions.
"""

from __future__ import annotations

import json
import sys


def _load_side(path_arg: str) -> dict:
    """One record, or a min-of-k composite of comma-separated records."""
    paths = [p for p in path_arg.split(",") if p]
    recs = [json.load(open(p)) for p in paths]
    if len(recs) == 1:
        return recs[0]
    qnames = set().union(*(r["queries"] for r in recs))
    queries = {
        n: min(r["queries"][n] for r in recs if n in r["queries"])
        for n in qnames
    }
    calibs = [r["calib_sec"] for r in recs if r.get("calib_sec")]
    comp = {
        "queries": queries,
        "value": round(sum(queries.values()), 4),
        "calib_sec": min(calibs) if calibs else None,
    }
    print(f"[composite: per-query min of {len(recs)} records: {path_arg}]")
    return comp


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = _load_side(old_path)
    new = _load_side(new_path)
    if ("," in old_path) != ("," in new_path) or (
        "," in old_path and old_path.count(",") != new_path.count(",")
    ):
        print(
            "WARNING: unequal record counts per side — min-of-k vs min-of-j "
            "(k != j) biases toward the side with more records"
        )
    oq, nq = old["queries"], new["queries"]

    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s")
    # Host-speed anchor (bench.py `calib_sec`, round 5+): the same fixed
    # synthetic workload timed on each host/day. When both records carry it,
    # report the host ratio and the host-normalized total ratio — the number
    # that is actually attributable to code.
    oc, nc = old.get("calib_sec"), new.get("calib_sec")
    if oc and nc:
        host = nc / oc
        raw = new["value"] / old["value"]
        print(
            f"calib: {oc:.3f}s -> {nc:.3f}s (host x{host:.2f}); "
            f"total raw x{raw:.2f}, host-normalized x{raw / host:.2f}"
        )
    # Calib triplet (r8 verdict item 4): a single anchor cannot see drift
    # that develops DURING a run. When a record carries start/mid/end legs,
    # print them and call out spread >1.2x — that record's slow stretch is
    # host noise, not code.
    for tag, rec in (("old", old), ("new", new)):
        legs = [
            rec.get("calib_start_sec"), rec.get("calib_mid_sec"),
            rec.get("calib_end_sec", rec.get("calib_sec")),
        ]
        spread = rec.get("calib_spread")
        if any(v for v in legs[:2]) and spread:
            steady = "steady" if spread <= 1.2 else "NOT STEADY"
            print(
                f"calib triplet ({tag}): start/mid/end = "
                + "/".join("-" if v is None else f"{v:.3f}" for v in legs)
                + f"s, spread x{spread:.2f} ({steady})"
            )
    # Per-query ratio distribution (r7 verdict stretch 8): the honest
    # cross-host comparison — totals track the anchor, the median of
    # per-query ratios tracks the code. Printed for every comparison so no
    # future total-vs-total reading skips it.
    ratios = sorted(
        nq[name] / oq[name]
        for name in set(oq) & set(nq)
        if oq[name] > 0 and nq[name] > 0
    )
    if ratios:
        mid = len(ratios) // 2
        median = (
            ratios[mid]
            if len(ratios) % 2
            else (ratios[mid - 1] + ratios[mid]) / 2
        )
        p90 = ratios[min(len(ratios) - 1, int(0.9 * len(ratios)))]
        big = [
            (nq[n] / oq[n], n)
            for n in set(oq) & set(nq)
            if oq[n] > 0 and nq[n] > 0 and max(oq[n], nq[n]) >= 1.0
        ]
        worst_big = max(big, default=None)
        print(
            f"per-query ratio: median x{median:.3f}, p90 x{p90:.3f}, "
            f"max x{ratios[-1]:.2f}"
            + (
                f"; worst >=1s query x{worst_big[0]:.2f} ({worst_big[1]})"
                if worst_big
                else ""
            )
        )

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    flags = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        # ignore sub-100ms blips — ratio means nothing at timer resolution
        if (ratio > threshold or ratio < 1 / threshold) and max(a, b) >= 0.1:
            flags.append((ratio, name, a, b))
    for ratio, name, a, b in sorted(flags, reverse=True):
        tag = "SLOWER" if ratio > 1 else "faster"
        print(f"{tag}  {ratio:5.2f}x  {a:7.3f}s -> {b:7.3f}s  {name}")
    if not flags:
        print(f"no per-query change beyond {threshold}x")
    return 1 if any(r > threshold for r, *_ in flags) else 0


if __name__ == "__main__":
    raise SystemExit(main())
