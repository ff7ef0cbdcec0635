"""Synthesize an sf1.0-shaped world by key-offset replication (r6 verdict #3).

The committed testdata tops out at sf0.1 (600k lineitem), so the scaling
probe's strongest claim was "sublinear at 10x the gate scale". This tool
manufactures a world at ~10x sf0.1 (~6M lineitem — TPC-H sf1 shape) so
``probe_scaling.py`` can measure the 0.1 -> 1.0 leg and turn that claim
into "measured at 100x the gate scale". The world is DERIVED, deterministic
(seeded hashes, no RNG), and never touches /root/testdata.

Construction: ``--factor`` key-shifted replicas of every fact table, with
referential integrity preserved (each replica's orders point at that
replica's customers, lineitems at that replica's orders/parts/suppliers;
nation/region stay fixed, as TPC-H scaling does). Replica 0 is the source
verbatim. To keep the workload SHAPE honest at the new scale:

- measures are re-drawn per replica on the same 2-dp cents lattice
  (seeded hash deltas), so group cardinalities and value ranges scale the
  way fresh data would, not as bit-identical copies;
- document TEXT is token-remapped per replica (token -> 'w<xxhash64(token,
  replica) % 100003>'): the Zipf frequency shape and doc lengths survive
  (same token multiset structure), but replicas share no shingles, so
  near-dup family sizes stay at their sf0.1 rate instead of exploding
  10x-quadratically into every pair-emitting dedup audit;
- embeddings are dimension-rotated per replica (circular shift preserves
  norms and within-replica geometry) so ANN queries face 10x genuine
  candidates, not 10 exact copies of each vector.

Big tables are written as multi-part directories (``io.load_table``
handles both layouts) so the hi-SF leg reads with real parallelism — a
single 110 MB parquet file is one Spark input split under the default
128 MB maxPartitionBytes, which would serialize the scan and corrupt the
slope measurement.

Usage:
    python tools/make_world_scale.py [--src /root/testdata/sf0.1]
        [--out /tmp/world_sf1] [--factor 10] [--seed 7007] [--parts 16]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_scale_world(
    spark, src: str, out: str, factor: int = 10, seed: int = 7007, parts: int = 16
) -> None:
    from pyspark.sql import functions as F

    marker = os.path.join(out, f"_built_f{factor}_s{seed}")
    if os.path.exists(marker):
        return
    os.makedirs(out, exist_ok=True)

    read = lambda t: spark.read.parquet(os.path.join(src, f"{t}.parquet"))

    def h(cols, salt: int):
        return F.abs(F.xxhash64(*cols, F.lit(seed * 1000 + salt)))

    def cents(col, pk, salt, spread_cents):
        """Replica-dependent +/- spread on the 2-dp lattice; replica 0
        keeps the source value exactly."""
        delta = (
            h([*pk, F.col("_rep")], salt) % (2 * spread_cents + 1) - spread_cents
        ).cast("double") / 100.0
        return F.when(F.col("_rep") == 0, F.col(col)).otherwise(
            F.round(F.col(col) + delta, 2)
        )

    def replicate(df, strides: dict[str, int]):
        """factor copies; each int key column k gets + rep * stride[k]."""
        reps = spark.range(factor).select(F.col("id").cast("int").alias("_rep"))
        wide = df.crossJoin(F.broadcast(reps))
        for k, stride in strides.items():
            dtype = dict(df.dtypes)[k]
            wide = wide.withColumn(
                k, (F.col(k) + F.col("_rep").cast("long") * stride).cast(dtype)
            )
        return wide

    def write(df, name, n_parts=None):
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        df.drop("_rep").repartition(n_parts or parts).write.parquet(dst)

    # dims: byte-identical copies (TPC-H keeps nation/region fixed at all SF)
    for t in ("region", "nation"):
        s, d = os.path.join(src, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        shutil.copytree(s, d, dirs_exist_ok=True) if os.path.isdir(s) else shutil.copy2(s, d)

    # strides = max key + 1 of the SOURCE, so replica key ranges are disjoint
    def stride_of(df, key):
        return int(df.agg(F.max(key)).first()[0]) + 1

    cu, od, li, pa, su = (read(t) for t in ("customer", "orders", "lineitem", "part", "supplier"))
    st_c, st_o, st_p, st_s = (
        stride_of(cu, "c_custkey"),
        stride_of(od, "o_orderkey"),
        stride_of(pa, "p_partkey"),
        stride_of(su, "s_suppkey"),
    )

    w = replicate(cu, {"c_custkey": st_c})
    write(w.withColumn("c_acctbal", cents("c_acctbal", [F.col("c_custkey")], 1, 100)), "customer", 4)

    w = replicate(od, {"o_orderkey": st_o, "o_custkey": st_c})
    write(w.withColumn("o_totalprice", cents("o_totalprice", [F.col("o_orderkey")], 2, 50)), "orders")

    w = replicate(li, {"l_orderkey": st_o, "l_partkey": st_p, "l_suppkey": st_s})
    pk = [F.col("l_orderkey"), F.col("l_linenumber")]
    write(
        w.withColumn("l_extendedprice", cents("l_extendedprice", pk, 3, 5))
        .withColumn(
            "l_quantity",
            F.when(F.col("_rep") == 0, F.col("l_quantity")).otherwise(
                F.greatest(
                    F.lit(1.0),
                    F.least(
                        F.lit(50.0),
                        F.col("l_quantity") + (h(pk, 4) % 5 - 2).cast("double"),
                    ),
                )
            ),
        ),
        "lineitem",
    )

    w = replicate(pa, {"p_partkey": st_p})
    write(w.withColumn("p_retailprice", cents("p_retailprice", [F.col("p_partkey")], 5, 50)), "part", 2)

    w = replicate(su, {"s_suppkey": st_s})
    write(w.withColumn("s_acctbal", cents("s_acctbal", [F.col("s_suppkey")], 6, 100)), "supplier", 1)

    ev = read("events")
    st_e, st_u = stride_of(ev, "event_id"), stride_of(ev, "user_id")
    w = replicate(ev, {"event_id": st_e, "user_id": st_u})
    write(
        w.withColumn("value", cents("value", [F.col("event_id")], 7, 200)),
        "events",
    )

    # documents: replica 0 verbatim; replicas 1+ token-remapped so each
    # replica is a fresh corpus with the SAME Zipf/duplication shape and
    # ZERO cross-replica shingle overlap (see module docstring).
    docs = read("documents")
    st_d = stride_of(docs, "doc_id")
    w = replicate(docs, {"doc_id": st_d})
    remapped = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), " "),
            lambda tok: F.concat(
                F.lit("w"),
                (F.abs(F.xxhash64(tok, F.col("_rep"), F.lit(seed))) % 100003).cast("string"),
            ),
        ),
    )
    new_text = F.when(F.col("_rep") == 0, F.col("text")).otherwise(
        F.when(F.length("text") > 0, remapped).otherwise(F.col("text"))
    )
    write(
        w.withColumn("text", new_text).withColumn(
            "n_chars",
            F.when(F.col("_rep") == 0, F.col("n_chars")).otherwise(
                F.length(F.col("text")).cast("long")
            ),
        ),
        "documents",
        4,
    )

    em = read("embeddings")
    st_v = stride_of(em, "vec_id")
    w = replicate(em, {"vec_id": st_v})
    dim = F.size("embedding")
    rotated = F.transform(
        "embedding",
        lambda x, i: F.element_at(
            "embedding", ((i + F.col("_rep")) % dim + F.lit(1)).cast("int")
        ),
    ).cast("array<float>")
    write(
        w.withColumn(
            "embedding",
            F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(rotated),
        ),
        "embeddings",
        4,
    )

    open(marker, "w").close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/world_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--seed", type=int, default=7007)
    ap.add_argument("--parts", type=int, default=16)
    args = ap.parse_args()

    from cobalt_duckdb_spark.session import get_spark

    spark = get_spark("make-world-scale")
    build_scale_world(spark, args.src, args.out, args.factor, args.seed, args.parts)
    # quick census so the artifact is self-describing
    import json

    counts = {
        t: spark.read.parquet(os.path.join(args.out, f"{t}.parquet")).count()
        for t in "region nation customer supplier part orders lineitem events documents embeddings".split()
    }
    print(json.dumps({"out": args.out, "factor": args.factor, "counts": counts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
