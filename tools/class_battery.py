"""Divergence-class regression battery runner (r6 verdict item 5).

~45 cross-engine divergence classes were found and fixed across rounds
5-6, each caught by a specific fuzz world — a concrete (sf, seed, axis
doses) triple. ``round_close.py`` re-runs only the CURRENT round's fresh
seeds, so nothing stopped a future edit from silently resurrecting a
closed class. This runner re-executes the full catching-world battery:

- ``class_battery_manifest.json`` pins every known catcher world with the
  class inventory it guards (sources: SCALE.md + committed REDRAW_r*.json).
- Any committed ``REDRAW_r*.json`` world NOT already in the manifest is
  auto-merged at runtime, so each round's fresh worlds join the battery
  without manual edits.
- Light worlds (sf0.001 / sf0.01) all run every time — differential cost
  is minutes per world and the derived corpora are cached by
  ``fuzz_redraw.build_redraw_dir``'s marker files.
- Heavy worlds (sf0.1, ~10+ min each) run on a round-robin rotation:
  ``--rotate N`` picks ``N % n_heavy`` (pass the round number), so every
  heavy catcher re-runs once per n_heavy closes at its TRUE scale —
  downscaling a seed derives a DIFFERENT world that need not contain the
  caught class instance. ``--all-heavy`` runs them all.

Usage:
    python tools/class_battery.py [--rotate ROUND] [--all-heavy]
        [--skip-light] [--json CLASSBATTERY_rN.json]

Exit 1 if any world's differential reports a failure.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXIS_KEYS = (
    "null_permille",
    "degen_permille",
    "ties_permille",
    "unicode_permille",
    "extreme_permille",
    "sparse_permille",
)


def load_manifest(current_round: int = 0) -> list[dict]:
    """Manifest worlds + auto-merged REDRAW worlds from rounds 7..current-1.

    Rounds <= 6 are NOT auto-merged: their catcher worlds are already
    hand-pinned above, and the rest of their committed artifacts are
    verification batches (fresh-seed re-runs AFTER fixes) that re-test
    nothing the pinned catchers don't — re-running ~16 of them would
    triple battery cost for zero class coverage. The CURRENT round is
    excluded because round_close's redraw/nullworld stages just ran those
    seeds this close."""
    with open(os.path.join(REPO, "tools", "class_battery_manifest.json")) as f:
        worlds = json.load(f)["worlds"]
    known = {
        (w["sf"], s, tuple(sorted(w.get("axes", {}).items())))
        for w in worlds
        for s in w["seeds"]
    }
    for path in sorted(glob.glob(os.path.join(REPO, "REDRAW_r*.json"))):
        # Round parse must be anchored to the prefix: suffixed artifacts
        # (REDRAW_r07c1.json, REDRAW_r07n.json) carry trailing alphanumerics
        # that a strip-all-digits parse would merge into the round number
        # (r07c1 -> 71), silently excluding composed catcher worlds from the
        # battery forever (ADVICE r7, medium).
        m = re.match(r"REDRAW_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        if rnd < 7 or (current_round and rnd >= current_round):
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        axes = {k: rec[k] for k in AXIS_KEYS if rec.get(k)}
        fresh = [
            s
            for s in rec.get("seeds", [])
            if (rec["sf"], s, tuple(sorted(axes.items()))) not in known
        ]
        if fresh:
            worlds.append(
                {
                    "sf": rec["sf"],
                    "seeds": fresh,
                    "axes": axes,
                    "heavy": rec["sf"].rstrip("/").endswith("sf0.1"),
                    "classes": f"auto-merged from {os.path.basename(path)}",
                }
            )
    return worlds


def run_world(world: dict) -> dict:
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "fuzz_redraw.py"),
        "--sf",
        world["sf"],
        "--seeds",
        *[str(s) for s in world["seeds"]],
    ]
    for k, v in world.get("axes", {}).items():
        cmd += [f"--{k.replace('_', '-')}", str(v)]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    lines = proc.stdout.strip().splitlines()
    return {
        "sf": world["sf"],
        "seeds": world["seeds"],
        "axes": world.get("axes", {}),
        "classes": world.get("classes", ""),
        "ok": proc.returncode == 0,
        "sec": round(time.perf_counter() - t0, 1),
        "tail": lines[-min(len(lines), 3 + 2 * len(world["seeds"])):],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rotate", type=int, default=0, help="round number; picks heavy world rotate %% n_heavy")
    ap.add_argument("--all-heavy", action="store_true")
    ap.add_argument("--skip-light", action="store_true")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--dry-run", action="store_true", help="print the world plan, run nothing")
    ap.add_argument(
        "--only-seed", type=int, default=None,
        help="run only the world(s) containing this seed — the surgical "
        "retry path when one world's subprocess died for host reasons "
        "(e.g. a SIGSTOP/CONT pause breaking Spark heartbeats, r8) and "
        "the differential itself needs re-establishing",
    )
    args = ap.parse_args()

    worlds = load_manifest(current_round=args.rotate)
    light = [w for w in worlds if not w.get("heavy")]
    heavy = [w for w in worlds if w.get("heavy")]
    plan = [] if args.skip_light else list(light)
    if heavy:
        if args.all_heavy:
            plan += heavy
        else:
            plan.append(heavy[args.rotate % len(heavy)])

    if args.only_seed is not None:
        plan = [w for w in worlds if args.only_seed in w["seeds"]]

    if args.dry_run:
        for w in plan:
            axes = ",".join(f"{k}={v}" for k, v in w.get("axes", {}).items()) or "plain"
            print(f"{'HEAVY' if w.get('heavy') else 'light'} "
                  f"{os.path.basename(w['sf'])} seeds={w['seeds']} [{axes}]")
        print(f"{len(plan)} invocations ({sum(len(w['seeds']) for w in plan)} worlds)")
        return 0

    results, ok = [], True
    for w in plan:
        r = run_world(w)
        results.append(r)
        status = "OK " if r["ok"] else "RED"
        axes = ",".join(f"{k}={v}" for k, v in r["axes"].items()) or "plain"
        print(f"{status} {os.path.basename(w['sf'])} seeds={r['seeds']} "
              f"[{axes}] {r['sec']}s", flush=True)
        if not r["ok"]:
            ok = False
            for ln in r["tail"]:
                print(f"  {ln}")
    out = {
        "worlds_run": len(plan),
        "heavy_run": sum(1 for w in plan if w.get("heavy")),
        "heavy_total": len(heavy),
        "rotate": args.rotate,
        "ok": ok,
        "results": results,
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    print(f"class battery: {sum(1 for r in results if r['ok'])}/{len(results)} worlds green")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
