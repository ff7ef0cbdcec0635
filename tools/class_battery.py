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
- Heavy worlds (sf0.1, ~10+ min each) run on an oldest-first rotation
  (r8 verdict item 5): each close runs ``--heavy-count`` (default 3) heavy
  worlds with the OLDEST last-green battery round, where the ledger is
  derived from committed ``CLASSBATTERY_r*.json`` artifacts (manifest
  ``last_run_round`` as the floor), so every heavy catcher re-certifies at
  its TRUE scale on a bounded cadence — downscaling a seed derives a
  DIFFERENT world that need not contain the caught class instance. After a
  green rotation run, ``last_run_round`` is written back into the manifest
  (auto-merged heavy worlds are appended, joining the pinned ledger).
  ``--all-heavy`` runs them all.

Usage:
    python tools/class_battery.py [--rotate ROUND] [--heavy-count K]
        [--all-heavy] [--skip-light] [--json CLASSBATTERY_rN.json]

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


def _world_key(w: dict) -> tuple:
    """Identity of a catcher world: (sf, sorted seeds, sorted axes)."""
    return (
        w["sf"],
        tuple(sorted(w["seeds"])),
        tuple(sorted((w.get("axes") or {}).items())),
    )


def heavy_last_run() -> dict[tuple, int]:
    """{world key: latest round whose committed CLASSBATTERY artifact ran
    it green} — the rotation ledger is derived from the committed battery
    artifacts themselves (immutable, judge-readable), with the manifest's
    ``last_run_round`` field as the floor for worlds predating artifact
    coverage (r9 rotation-maintenance policy, r8 verdict item 5)."""
    out: dict[tuple, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CLASSBATTERY_r*.json"))):
        m = re.match(r"CLASSBATTERY_r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        for r in rec.get("results", []):
            if r.get("ok"):
                k = _world_key(r)
                out[k] = max(out.get(k, 0), rnd)
    return out


def _persist_last_run(plan: list[dict], results: list[dict], rnd: int) -> None:
    """Write ``last_run_round`` back into the manifest for every heavy
    world that just ran GREEN under a round-numbered rotation, appending
    auto-merged heavy worlds so they join the pinned rotation ledger."""
    path = os.path.join(REPO, "tools", "class_battery_manifest.json")
    with open(path) as f:
        doc = json.load(f)
    by_key = {_world_key(w): w for w in doc["worlds"]}
    changed = False
    for w, r in zip(plan, results):
        if not (w.get("heavy") and r["ok"]):
            continue
        k = _world_key(w)
        if k in by_key:
            if by_key[k].get("last_run_round", 0) < rnd:
                by_key[k]["last_run_round"] = rnd
                changed = True
        else:
            entry = {key: w[key] for key in ("sf", "seeds", "axes", "classes") if key in w}
            entry["heavy"] = True
            entry["last_run_round"] = rnd
            doc["worlds"].append(entry)
            changed = True
    if changed:
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
            f.write("\n")


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
    ap.add_argument(
        "--heavy-count", type=int, default=3,
        help="heavy worlds per rotation close, oldest last-green first "
        "(r8 verdict item 5; default 3)",
    )
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
            # Rotation maintenance (r8 verdict item 5): the full heavy
            # sweep established every pinned class closed at catching
            # scale simultaneously (CLASSBATTERY_r08, 9/9); steady state
            # re-runs ``--heavy-count`` (default 3) heavy worlds per
            # close, OLDEST last-green-round first (ledger derived from
            # committed CLASSBATTERY artifacts + manifest floor), so every
            # heavy catcher recertifies on a bounded ~ceil(n/3)-round
            # cadence. Manifest order tie-breaks equal rounds.
            ledger = heavy_last_run()
            ranked = sorted(
                range(len(heavy)),
                key=lambda i: (
                    ledger.get(
                        _world_key(heavy[i]),
                        heavy[i].get("last_run_round", 0),
                    ),
                    i,
                ),
            )
            plan += [heavy[i] for i in ranked[: max(1, args.heavy_count)]]

    if args.only_seed is not None:
        plan = [w for w in worlds if args.only_seed in w["seeds"]]
        if not plan:
            # A mistyped/absent seed must not masquerade as a passing
            # gate: the old behavior printed '0/0 worlds green', exited 0,
            # and wrote a green JSON artifact (ok: true, worlds_run: 0)
            # (ADVICE r8). No JSON, nonzero exit.
            print(
                f"error: --only-seed {args.only_seed} matches no world in "
                "the manifest (+ auto-merged REDRAW artifacts)",
                file=sys.stderr,
            )
            return 2

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
        "heavy_count": args.heavy_count,
        "ok": ok,
        "results": results,
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    if args.rotate and args.only_seed is None and not args.dry_run:
        _persist_last_run(plan, results, args.rotate)
    print(f"class battery: {sum(1 for r in results if r['ok'])}/{len(results)} worlds green")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
