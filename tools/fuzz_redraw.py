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
        [--null-permille 10]    # ‰ of events.value / documents.n_chars NULLed
        [--degen-permille 10]   # ‰ of documents.text empty/1-token/padded
        [--ties-permille 100]   # ‰ of events snapped to tied order keys
        [--unicode-permille 100]# ‰ of documents with CJK/emoji/RTL prefixes
        [--extreme-permille 10] # ‰ of events.value scaled ×1e5
        [--sparse-permille 50]  # keep only ‰ of events/documents (1-row
                                # groups, missing types, starved slices)

All six robustness axes compose on one world; round_close.py runs the
combined world per round. Maximal doses (1000‰) are legal and are the
harshest worlds constructible per axis — EXCEPT the sparse axis, whose
scale is inverted: --sparse-permille is the KEEP fraction, so 1000‰
keeps every row (the least sparse world) and the harshest sparse dose
is the smallest nonzero value (ADVICE r6).

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
    ties_permille: int = 0,
    unicode_permille: int = 0,
    extreme_permille: int = 0,
    sparse_permille: int = 0,
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
        out_dir,
        f"_built_s{seed}_n{null_permille}_d{degen_permille}"
        f"_t{ties_permille}_u{unicode_permille}_x{extreme_permille}"
        f"_p{sparse_permille}",
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
    # sparse worlds: keep only N‰ of events/documents instead of the
    # standard 90% — manufactures 1-row groups, missing event types, empty
    # filtered slices: the shape every per-key statistic meets at 100 TB
    # the day a filter isolates a rare cohort. Targets n-1 denominators,
    # chi² cells, correlations needing n≥2, percentile windows on one row.
    ev_keep = (
        (_h(pk, seed, 85) % 1000 < sparse_permille)
        if sparse_permille
        else keep(pk, 13)
    )
    shift_s = (_h(pk, seed, 12) % 3601 - 1800).cast("int")
    ev_out = (
        ev.filter(ev_keep)
        .withColumn(
            "ts", F.timestamp_add("SECOND", shift_s, F.col("ts"))
        )
        .withColumn("value", cents("value", pk, 14, 200))
    )
    if ties_permille:
        # tied order keys — the shape a 100-TB event stream carries
        # everywhere (bursts logged at second/minute granularity, values on
        # coarse price points). Rank/row_number windows, as-of joins and
        # min_by/max_by must resolve ties IDENTICALLY on both engines, which
        # only happens when every ordering carries a deterministic tie-break.
        sel_t = _h(pk, seed, 81) % 1000 < ties_permille
        # Day-level snap, not minute: the sf0.001 stream averages one event
        # per ~48 min, so minute-snapping produces ZERO collisions (measured,
        # seed 4111) — midnight bursts are what actually forces tied
        # (user_id, ts) and tied (event_type, ts) keys. Values snap to the
        # nearest 10 units for rank-window ties. date_trunc returns
        # TIMESTAMP (LTZ); cast back to the source type (NTZ in the driver's
        # parquet) so the derived file keeps the exact physical schema —
        # session tz is UTC, so the round-trip is identity.
        ev_out = ev_out.withColumn(
            "ts",
            F.when(
                sel_t,
                F.date_trunc("day", F.col("ts")).cast(ev.schema["ts"].dataType),
            ).otherwise(F.col("ts")),
        ).withColumn(
            "value",
            F.when(
                sel_t & F.col("value").isNotNull(),
                F.round(F.col("value") / 10, 0) * 10,
            ).otherwise(F.col("value")),
        )
    if extreme_permille:
        # extreme magnitudes (×1e5, still on the cents lattice and still
        # positive): stresses variance/corr/regression cancellation, where
        # the engines' different streaming-moment formulas disagree in the
        # last ulps and a rounded publish can straddle a boundary.
        sel_x = _h(pk, seed, 84) % 1000 < extreme_permille
        ev_out = ev_out.withColumn(
            "value",
            F.when(
                sel_x & F.col("value").isNotNull(),
                F.round(F.col("value") * 100000, 2),
            ).otherwise(F.col("value")),
        )
    if null_permille:
        ev_out = ev_out.withColumn(
            "value",
            F.when(
                _h(pk, seed, 77) % 1000 < null_permille, F.lit(None)
            ).otherwise(F.col("value")),
        )
    write(ev_out, "events")

    docs = read("documents").filter(
        (_h([F.col("doc_id")], seed, 86) % 1000 < sparse_permille)
        if sparse_permille
        else keep([F.col("doc_id")], 15)
    )
    if unicode_permille:
        # multilingual text — the reference is literally a Japanese
        # embedding-search app, so CJK/emoji/combining-mark/RTL documents
        # are its production domain, yet the generator emits ASCII only.
        # Exercises length() (codepoints vs code units), lower()/upper()
        # (ß, Σ), regex character classes, substring and shingle windows
        # across the Spark/DuckDB boundary. n_chars is recomputed from the
        # new text by Spark — if the engines' length() semantics diverge,
        # every query that recomputes length(text) goes red.
        sel_u = _h([F.col("doc_id")], seed, 82) % 1000 < unicode_permille
        form_u = _h([F.col("doc_id")], seed, 83) % 4
        canned = (
            F.when(
                form_u == 0,
                F.lit("データ 処理 高速 分散 クエリ 実行 結果 集計 分散 処理"),
            )
            .when(form_u == 1, F.lit("fast 🚀 query 💡 engine 🔥 scan 🧮 merge 😀 join"))
            .when(
                form_u == 2,
                F.lit("café naïve résumé ångström straße Straße Ωmega σigma données tête"),
            )
            .otherwise(
                F.lit("مرحبا بالعالم بيانات سريع استعلام данные быстрый запрос данные")
            )
        )
        new_text_u = F.concat(canned, F.lit(" "), F.substring(F.col("text"), 1, 60))
        docs = docs.withColumn(
            "text", F.when(sel_u, new_text_u).otherwise(F.col("text"))
        ).withColumn(
            "n_chars",
            F.when(sel_u, F.length(F.col("text")).cast("long")).otherwise(
                F.col("n_chars")
            ),
        )
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
    ap.add_argument(
        "--ties-permille",
        type=int,
        default=0,
        help="snap this ‰ of events to tied order keys (ts to the minute,"
        " value to whole units) — rank/as-of/min_by tie-break semantics",
    )
    ap.add_argument(
        "--unicode-permille",
        type=int,
        default=0,
        help="prepend CJK/emoji/combining/RTL text to this ‰ of documents"
        " (n_chars recomputed) — unicode length/case/regex semantics",
    )
    ap.add_argument(
        "--extreme-permille",
        type=int,
        default=0,
        help="scale this ‰ of events.value by 1e5 (cents lattice kept) —"
        " moment/variance cancellation at mixed magnitudes",
    )
    ap.add_argument(
        "--sparse-permille",
        type=int,
        default=0,
        help="keep only this ‰ of events/documents (instead of 90%%) —"
        " 1-row groups, missing types, empty filtered slices",
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
        if args.ties_permille:
            suffix += f"_t{args.ties_permille}"
        if args.unicode_permille:
            suffix += f"_u{args.unicode_permille}"
        if args.extreme_permille:
            suffix += f"_x{args.extreme_permille}"
        if args.sparse_permille:
            suffix += f"_p{args.sparse_permille}"
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
            ties_permille=args.ties_permille,
            unicode_permille=args.unicode_permille,
            extreme_permille=args.extreme_permille,
            sparse_permille=args.sparse_permille,
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
    for k in (
        "null_permille",
        "degen_permille",
        "ties_permille",
        "unicode_permille",
        "extreme_permille",
        "sparse_permille",
    ):
        if getattr(args, k):
            out[k] = getattr(args, k)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
