"""Fresh-data-draw fuzzer for the differential gate.

Every driver round regenerates the test parquet, and SCALE.md §Round 5
documents why that re-rolls dice this repo has now twice lost: a rounded
aggregate whose TRUE value lands on an engine-divergent half-way point
exists with constant probability per (group × rounded column), so a gate
that only ever sees one fixed draw certifies nothing about the next one.

This tool manufactures new draws deterministically and re-runs the full
Spark-vs-DuckDB differential on each. Per seed it derives a perturbed copy
of every table with the same schema and domain invariants:

- measure columns are re-drawn ON THEIR LATTICE (prices ±5 cents re-rounded
  to 2 dp, discounts/taxes resampled from their 1-cent grids, quantities
  ±2 clamped to [1,50]) — exactly the values whose sums and means produce
  half-way points;
- fact tables are subsampled to ~90% by a seeded hash of their primary key
  — group sizes change, so the 2^a·5^b group-size condition for exact
  half-way means is re-rolled everywhere;
- event timestamps shift ±30 min — window/session/watermark bucket
  boundaries land differently;
- one embedding dimension per vector is nudged — cosine rankings and SRP
  band assignments re-roll;
- keys, strings, dims (region/nation) and referential structure are
  untouched, so every filter literal still matches and every join still
  has both sides.

All perturbations are pure column expressions keyed by
``xxhash64(pk, seed)`` — the derived corpus is reproducible from the seed
alone. Both engines then read the SAME derived parquet, so the comparison
is exactly the driver's gate, just on a different world.

Usage:
    python tools/fuzz_redraw.py [--sf /root/testdata/sf0.001]
        [--seeds 11 22 33] [--workdir /tmp/fuzz_redraw] [--json out.json]
        [--null-permille 10]   # NULL-carrying worlds (r6): ‰ of
                               # events.value / documents.n_chars NULLed

Exit 1 if any seed's differential reports a failure.

Fuzz AT THE LARGEST scale factor, not only the cheap one: boundary
classes are per-(group × rounded column) trials, so an sf0.1 world runs
~10× the trials of an sf0.001 world per seed. The first sf0.1 world
(round 5, seed 606) caught four divergences — including a genuine
Spark-vs-oracle subset-contract bug — that 16 smaller worlds missed.
Budget guide on this box: ~4 min/seed at sf0.001, ~25 min/seed at sf0.1.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _h(cols, seed: int, salt: int):
    from pyspark.sql import functions as F

    return F.abs(F.xxhash64(*cols, F.lit(seed * 1000 + salt)))


def build_redraw_dir(
    spark,
    sf_dir: str,
    out_dir: str,
    seed: int,
    null_permille: int = 0,
    degen_permille: int = 0,
) -> None:
    """Materialize one derived draw (idempotent per (sf, seed, nulls)).

    ``null_permille`` > 0 additionally NULLs that fraction (‰) of the two
    nullable measure columns the round-5 ADVICE named — events.value and
    documents.n_chars — after the standard perturbation. The driver's
    generator emits no NULLs today, but the rank-window order statistics
    and every NULL-skipping aggregate must stay engine-identical the day
    a corpus carries them (Spark sorts NULLs first ascending, DuckDB
    last; COUNT(*) vs COUNT(col) diverge on NULL rows).
    """
    from pyspark.sql import functions as F

    marker = os.path.join(
        out_dir, f"_built_s{seed}_n{null_permille}_d{degen_permille}"
    )
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)

    def keep(cols, salt=0, pct=9):
        return (_h(cols, seed, salt) % 10) < pct

    def cents(col, pk, salt, spread_cents):
        """col ± spread cents, re-snapped to the 2-dp lattice."""
        delta = (
            _h(pk, seed, salt) % (2 * spread_cents + 1) - spread_cents
        ).cast("double") / 100.0
        return F.round(F.col(col) + delta, 2)

    def write(df, name):
        # Single-FILE layout to match the driver's testdata (DuckDB's
        # read_parquet('<dir>/t.parquet') in check_oracle expects a file,
        # not a Spark part-file directory): coalesce(1), then promote the
        # lone part file. Derived draws are sf0.001/sf0.01-sized, so the
        # single-writer coalesce is not a bottleneck here.
        import glob as _glob

        tmp = os.path.join(out_dir, f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        shutil.move(part, dst)
        shutil.rmtree(tmp)

    # dims: byte-identical copies
    for t in ("region", "nation"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)

    read = lambda t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))

    li = read("lineitem")
    pk = [F.col("l_orderkey"), F.col("l_linenumber")]
    write(
        li.filter(keep(pk, 1))
        .withColumn(
            "l_quantity",
            F.greatest(
                F.lit(1.0),
                F.least(
                    F.lit(50.0),
                    F.col("l_quantity") + (_h(pk, seed, 2) % 5 - 2).cast("double"),
                ),
            ),
        )
        .withColumn("l_extendedprice", cents("l_extendedprice", pk, 3, 5))
        .withColumn(
            "l_discount", ((_h(pk, seed, 4) % 11).cast("double") / 100.0)
        )
        .withColumn("l_tax", ((_h(pk, seed, 5) % 9).cast("double") / 100.0)),
        "lineitem",
    )

    od = read("orders")
    pk = [F.col("o_orderkey")]
    write(
        od.filter(keep(pk, 6)).withColumn(
            "o_totalprice", cents("o_totalprice", pk, 7, 50)
        ),
        "orders",
    )

    write(
        read("customer").withColumn(
            "c_acctbal", cents("c_acctbal", [F.col("c_custkey")], 8, 100)
        ),
        "customer",
    )
    write(
        read("supplier").withColumn(
            "s_acctbal", cents("s_acctbal", [F.col("s_suppkey")], 9, 100)
        ),
        "supplier",
    )
    write(
        read("part")
        .withColumn(
            "p_retailprice", cents("p_retailprice", [F.col("p_partkey")], 10, 50)
        )
        .withColumn(
            "p_size",
            F.greatest(
                F.lit(1),
                F.col("p_size")
                + (_h([F.col("p_partkey")], seed, 11) % 3 - 1).cast("int"),
            ),
        ),
        "part",
    )

    ev = read("events")
    pk = [F.col("event_id")]
    shift_s = (_h(pk, seed, 12) % 3601 - 1800).cast("int")
    ev_out = (
        ev.filter(keep(pk, 13))
        .withColumn(
            "ts", F.timestamp_add("SECOND", shift_s, F.col("ts"))
        )
        .withColumn("value", cents("value", pk, 14, 200))
    )
    if null_permille:
        ev_out = ev_out.withColumn(
            "value",
            F.when(
                _h(pk, seed, 77) % 1000 < null_permille, F.lit(None)
            ).otherwise(F.col("value")),
        )
    write(ev_out, "events")

    docs = read("documents").filter(keep([F.col("doc_id")], 15))
    if null_permille:
        docs = docs.withColumn(
            "n_chars",
            F.when(
                _h([F.col("doc_id")], seed, 78) % 1000 < null_permille,
                F.lit(None),
            ).otherwise(F.col("n_chars")),
        )
    if degen_permille:
        # degenerate text a real corpus always carries: empty docs,
        # single-token docs, whitespace-padded docs. Shingle/bigram/chunk
        # expressions must emit ZERO grams for these on both engines —
        # Spark's sequence(lo, hi<lo) counts DOWN and slice(_, 0, _) /
        # element_at past the end are ANSI-mode runtime errors.
        sel = _h([F.col("doc_id")], seed, 79) % 1000 < degen_permille
        form = _h([F.col("doc_id")], seed, 80) % 3
        new_text = (
            F.when(form == 0, F.lit(""))
            .when(form == 1, F.lit("x"))
            .otherwise(F.lit("  a  "))
        )
        docs = docs.withColumn(
            "n_chars",
            F.when(sel, F.length(new_text)).otherwise(F.col("n_chars")),
        ).withColumn(
            "text", F.when(sel, new_text).otherwise(F.col("text"))
        )
    write(docs, "documents")

    em = read("embeddings")
    pk = [F.col("vec_id")]
    dim = _h(pk, seed, 16) % F.size("embedding")
    nudge = (
        (_h(pk, seed, 17) % 21 - 10).cast("double") / 1000.0
    )
    write(
        em.filter(keep(pk, 18)).withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(i == dim, x + nudge).otherwise(x),
            ).cast("array<float>"),
        ),
        "embeddings",
    )

    open(marker, "w").close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--seeds", nargs="+", type=int, default=[11, 22, 33])
    ap.add_argument("--workdir", default="/tmp/fuzz_redraw")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--names", nargs="*", default=[])
    ap.add_argument(
        "--null-permille",
        type=int,
        default=0,
        help="NULL this ‰ of events.value / documents.n_chars in each world",
    )
    ap.add_argument(
        "--degen-permille",
        type=int,
        default=0,
        help="replace this ‰ of documents.text with degenerate forms"
        " (empty / single-token / whitespace-padded)",
    )
    args = ap.parse_args()

    from cobalt_duckdb_spark.session import get_spark

    spark = get_spark("fuzz-redraw")
    spark.sparkContext.setLogLevel("ERROR")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    ok = True
    for seed in args.seeds:
        suffix = f"_n{args.null_permille}" if args.null_permille else ""
        if args.degen_permille:
            suffix += f"_d{args.degen_permille}"
        draw = os.path.join(
            args.workdir,
            f"{os.path.basename(args.sf.rstrip('/'))}_s{seed}{suffix}",
        )
        build_redraw_dir(
            spark,
            args.sf,
            draw,
            seed,
            null_permille=args.null_permille,
            degen_permille=args.degen_permille,
        )
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(repo, "tools", "check_oracle.py"),
                draw,
                *args.names,
            ],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        tail = proc.stdout.strip().splitlines()
        summary = tail[-1] if tail else ""
        fails = [ln for ln in tail if ln.startswith("FAIL")]
        m = re.match(r"(\d+)/(\d+) queries match", summary)
        results[str(seed)] = {
            "summary": summary,
            "failures": fails[:20],
            "exit": proc.returncode,
        }
        status = "OK " if proc.returncode == 0 and m else "RED"
        print(f"seed {seed}: {status} {summary}")
        for ln in fails[:10]:
            print(f"  {ln}")
        ok = ok and proc.returncode == 0
    out = {"sf": args.sf, "seeds": args.seeds, "results": results}
    if args.null_permille:
        out["null_permille"] = args.null_permille
    if args.degen_permille:
        out["degen_permille"] = args.degen_permille
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
