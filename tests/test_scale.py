"""Plan-level proof of the scale techniques: bucketing removes the shuffle,
salting preserves join semantics while splitting keys, partitioned layouts
prune."""

import os

import pytest

from pyspark.sql import functions as F

from cobalt_duckdb_spark.io import load_table
from cobalt_duckdb_spark.operators.scale import (
    bucketed_join,
    events_by_day,
    salted_join,
    write_bucketed,
    write_partitioned,
)
from cobalt_duckdb_spark.plans import formatted_plan


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # managed-table warehouse for bucketing tests
    return spark


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "t_orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        8,
        sort_col="o_orderkey",
    )
    # small tables would broadcast (which also ignores bucketing); force the
    # sort-merge path the bucketing is designed for — at 100 TB neither side
    # broadcasts anyway
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan, f"expected SMJ:\n{plan}"
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan}"
        )
        # sanity: same result as the plain join
        plain = o.join(
            l.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_matches_plain_join(spark, sf_dir):
    # heavily skewed left side: every event of user 0 duplicated 50x
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    hot = e.filter(F.col("user_id") == 0)
    skewed = e
    for _ in range(3):
        skewed = skewed.union(hot)
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = (
        skewed.join(c, "user_id")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(skewed, c, "user_id", salt=4)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r["c_mktsegment"], r["count"]) for r in salted} == {
        (r["c_mktsegment"], r["count"]) for r in plain
    }


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = events_by_day(load_table(spark, sf_dir, "events"))
    write_partitioned(ev, path, "event_date")
    # directory-per-day layout exists
    days = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert len(days) > 5
    back = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-03")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "event_date" in plan
    n_total = spark.read.parquet(path).count()
    n_day = back.count()
    assert 0 < n_day < n_total

def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from cobalt_duckdb_spark.operators.scale import compact_parquet

    frag = str(tmp_path / "fragmented")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(64).write.parquet(frag)  # simulate micro-batch litter
    import glob
    import os

    assert len(glob.glob(os.path.join(frag, "*.parquet"))) >= 32
    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, out, target_files=4)
    assert n == 4
    assert spark.read.parquet(out).count() == ev.count()


def test_schema_evolution_merge(spark, tmp_path):
    """mergeSchema read across batches with added columns — the lake's
    schema-evolution path (new columns appear as nulls for old batches)."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id BIGINT, name STRING").write.parquet(
        p + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 3.5)], "id BIGINT, name STRING, score DOUBLE"
    ).write.parquet(p + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(p)
    rows = {r["id"]: r for r in merged.collect()}
    assert set(merged.columns) >= {"id", "name", "score"}
    assert rows[1]["score"] is None
    assert rows[2]["score"] == 3.5


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime bloom-filter join pruning (Spark 3.3+): for a shuffle join
    whose build side is selectively filtered, Catalyst injects a bloom
    filter built from the build side into the probe side's scan stage —
    probe rows that can't match are dropped BEFORE the shuffle. At 100 TB
    this is the difference between shuffling all of lineitem and shuffling
    only the ~20% that joins filtered orders.

    Locally the application-side threshold (10 GB of scan by default —
    sized for real clusters) must be lowered to see it on test data; the
    assertion is that the plan contains the injected might_contain probe."""
    from pyspark.sql import functions as F

    from cobalt_duckdb_spark.io import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "bloom filter not injected"
        # and it must not change results
        [row] = j.collect()
        want = (
            li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
            .collect()
        )
        assert row["n"] == want[0]["count"]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_ivf_partitioned_layout_prunes_cells(spark, sf_dir, tmp_path):
    """The IVF scale path the module docstring promises: assign once at
    ingest, write the vector table PARTITIONED BY cell, and a query probing
    nprobe cells becomes a partition-pruned scan — the plan carries the cell
    filter as PartitionFilters (pruning at file-listing time, before any IO)
    and reads only the probed cells' files."""
    import glob
    import os

    from pyspark.sql import functions as F

    from cobalt_duckdb_spark.io import load_table
    from cobalt_duckdb_spark.operators.similarity import (
        ivf_assign,
        make_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cent = make_centroids(emb, num_centroids=8)
    layout = str(tmp_path / "ivf_layout")
    ivf_assign(emb, cent).write.partitionBy("cell").parquet(layout)

    cells = glob.glob(os.path.join(layout, "cell=*"))
    assert len(cells) >= 4  # codebook actually spreads the corpus

    probe = spark.read.parquet(layout).filter(F.col("cell").isin(0, 1))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:80]
    # partition pruning is observable: only the probed cells' rows arrive,
    # and the scan's selected partition count is the probed subset
    n_all = spark.read.parquet(layout).count()
    n_probe = probe.count()
    assert 0 < n_probe < n_all
    got_cells = {r["cell"] for r in probe.select("cell").distinct().collect()}
    assert got_cells <= {0, 1}


def test_zorder_layout_tightens_file_ranges_on_both_dims(spark, sf_dir, tmp_path):
    """Z-order clustering vs linear sort, judged by the parquet footer stats
    a scan actually prunes with: under a linear (custkey, price) sort each
    file's custkey range is tight but its PRICE range stays ~global (no
    pruning on price); under Z-order BOTH per-file ranges shrink, so
    predicates on either column skip most files. Asserts the mechanism, not
    a plan string: per-file min/max read back via pyarrow."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from cobalt_duckdb_spark.io import load_table
    from cobalt_duckdb_spark.operators.scale import write_zordered

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    span = o.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("tp"),
    ).collect()[0]

    def per_file_avg_range(path: str, col: str) -> float:
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            lo = min(
                md.row_group(i).column(idx).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(idx).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append(hi - lo)
        assert len(spans) >= 8
        return sum(spans) / len(spans)

    linear = str(tmp_path / "linear")
    (
        o.repartitionByRange(16, "o_custkey", "o_totalprice")
        .sortWithinPartitions("o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zordered = str(tmp_path / "zordered")
    write_zordered(
        o, zordered, "o_custkey", "o_totalprice",
        x_bucket=max(1.0, span["ck"] / 64.0),
        y_bucket=span["tp"] / 64.0,
        num_files=16,
    )

    # linear layout: custkey tight, price ~global
    lin_price = per_file_avg_range(linear, "o_totalprice")
    z_price = per_file_avg_range(zordered, "o_totalprice")
    z_ck = per_file_avg_range(zordered, "o_custkey")
    # z-order shrinks the price range per file by a real factor…
    assert z_price < 0.6 * lin_price
    # …while keeping custkey locality far below the global span
    assert z_ck < 0.6 * span["ck"]


def test_asof_join_bucketed_equals_plain_on_hot_key(spark):
    """One key owning 50% of all rows must not change as-of semantics when
    the window is salted by time bucket (VERDICT r2 item 7). The bucketed
    plan's heavy window partitions on (key, bucket): the hot key's rows
    split across ~n_buckets tasks instead of one task's sort."""
    import random

    from cobalt_duckdb_spark.operators.joins import asof_join, asof_join_bucketed

    rng = random.Random(7)
    rows = []
    # hot key 0: half the table, spread over 200 time units (≈20 buckets of
    # width 10); cold keys 1..49 share the other half
    for i in range(2000):
        key = 0 if i % 2 == 0 else rng.randint(1, 49)
        rows.append((i, key, rng.randint(0, 199)))
    left = spark.createDataFrame(rows, "lid BIGINT, k BIGINT, t BIGINT")
    right = spark.createDataFrame(
        [
            (rng.randint(0, 49) if j % 2 else 0, rng.randint(0, 199), j)
            for j in range(600)
        ],
        "k BIGINT, t BIGINT, tag BIGINT",
    )

    plain = asof_join(
        left, right, on="k", left_time="t", right_time="t", right_values=["tag"]
    )
    bucketed = asof_join_bucketed(
        left,
        right,
        on="k",
        left_time="t",
        right_time="t",
        right_values=["tag"],
        bucket_fn=lambda t: t / 10,  # monotone: 10-unit time buckets
    )
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in bucketed.collect())
    assert a == b
    # exactly |left| output rows (no duplication through the carry join)
    assert len(b) == 2000


def test_embedder_knn_dim1024_arrow_batch_budget(spark):
    """Reference embedding dim is 1024 (ruri-large); prior tests used dim 64.
    Pin that the full embed → store → batch-KNN path works at the real width
    AND that arrow.maxRecordsPerBatch bounds the per-batch byte volume the
    Python workers see (VERDICT r2 item 5)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from cobalt_duckdb_spark.functions.inference import make_embedder_udf
    from cobalt_duckdb_spark.operators.knn import knn_topk_batch

    DIM, N, MAX_PER_BATCH = 1024, 512, 64
    BYTE_BUDGET = 1 << 20  # 1 MiB of float32 vector payload per Arrow batch
    assert MAX_PER_BATCH * DIM * 4 <= BYTE_BUDGET

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(MAX_PER_BATCH))
    try:
        docs = spark.range(N).select(
            F.col("id").alias("vec_id"),
            F.concat(F.lit("doc-"), F.col("id")).alias("text"),
        ).coalesce(2)  # few, large input partitions → batching must split them

        # observe actual batch sizes worker-side: every row reports the
        # length of the Arrow batch it arrived in
        @pandas_udf("int")
        def batch_len(s: pd.Series) -> pd.Series:
            return pd.Series([len(s)] * len(s))

        sizes = [r["bl"] for r in docs.select(batch_len("text").alias("bl")).collect()]
        assert max(sizes) <= MAX_PER_BATCH
        assert max(sizes) * DIM * 4 <= BYTE_BUDGET

        embed = make_embedder_udf(dim=DIM)  # no ST package here → fallback
        emb = docs.select("vec_id", embed("text").alias("embedding"))
        first = emb.head()
        assert len(first["embedding"]) == DIM

        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        top = knn_topk_batch(emb, queries, k=5).collect()
        assert len(top) == 15
        for r in top:
            if r["rank"] == 1:  # each query's nearest neighbor is itself
                assert r["vec_id"] == r["query_id"]
                assert abs(r["distance"]) < 1e-6
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_ivfpq_lake_layout_partition_pruning(spark, sf_dir, tmp_path):
    """The compressed index written partitionBy(cell) turns probing into
    partition pruning — the physical scan must carry a PartitionFilters
    entry on cell, and serving from the pruned on-disk layout must return
    exactly the in-memory IVF-PQ pipeline's answer."""
    from cobalt_duckdb_spark.functions.vector import cosine_distance
    from cobalt_duckdb_spark.operators.pq import (
        adc_topk_from_index,
        ivfpq_adc_topk,
        write_ivfpq_index,
    )
    from cobalt_duckdb_spark.plans import formatted_plan

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq_index")
    centroids, books = write_ivfpq_index(emb, path)

    q = emb.filter(F.col("vec_id") == 7).select(
        F.lit(0).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # serving-side probe planning: nearest nprobe=4 coarse cells (tiny)
    probes = [
        r["centroid_id"]
        for r in q.crossJoin(F.broadcast(centroids))
        .select(
            "centroid_id",
            cosine_distance(F.col("query_vec"), F.col("centroid_vec")).alias("d"),
        )
        .orderBy("d", "centroid_id")
        .limit(4)
        .collect()
    ]

    idx = spark.read.parquet(path).filter(F.col("cell").isin([int(p) for p in probes]))
    plan = formatted_plan(idx)
    assert "PartitionFilters" in plan and "cell" in plan, plan

    got = adc_topk_from_index(spark, path, books, q, probes, k=5).collect()
    want = ivfpq_adc_topk(emb, q, k=5, num_centroids=16, nprobe=4).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 5


def test_dynamic_partition_pruning_day_partitioned_events(spark, sf_dir, tmp_path):
    """Fact table partitioned by day joined to a filtered dim must plan a
    DPP subquery: the fact scan's partition filter is fed from the dim's
    build side at runtime, so only the dim-selected days are listed/read.
    At 100 TB of day-partitioned events this is the difference between
    scanning the lake and scanning the days a dimension filter names."""
    from cobalt_duckdb_spark.io import load_table
    from cobalt_duckdb_spark.plans import formatted_plan

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)

    days = [
        r["day"]
        for r in fact.select("day").distinct().orderBy("day").limit(3).collect()
    ]
    dim = spark.createDataFrame(
        [(d, i) for i, d in enumerate(days)], "day DATE, idx INT"
    )
    j = fact.join(dim.filter(F.col("idx") < 2), "day").groupBy("day").count()
    plan = formatted_plan(j)
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruned result only covers the two selected days
    got = {r["day"] for r in j.collect()}
    assert got == set(days[:2])


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join must actually activate on a hot-key sort-merge join
    (thresholds scaled down to test size): the executed plan carries
    SortMergeJoin(skew=true) and a skewed AQEShuffleRead. This is the
    runtime half of the skew story — the salted/bucketed operators cover
    the cases AQE can't see (windows, as-of)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(300000).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        jj = left.join(right, "k").select(F.sum("v").alias("s"))
        [row] = jj.collect()  # finalize the adaptive plan
        executed = jj._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:3000]
        # sanity: the join answered correctly despite the split — evens all
        # match right k=0, odds match their own id only below 2000
        want = sum(i for i in range(0, 300000, 2)) + sum(i for i in range(1, 2000, 2))
        assert row["s"] == want
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_write_balanced_shards_bytes_not_rows(spark, sf_dir, tmp_path):
    """Size-descending round-robin sharding must balance BYTES under a
    heavy-tailed length distribution where row-count balancing doesn't."""
    import glob

    from cobalt_duckdb_spark.operators.scale import write_balanced_shards

    # heavy tail: a few huge docs, many small ones
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.rpad(
            F.lit("x"),
            F.when(F.col("id") % 97 == 0, 50000).otherwise(
                (F.col("id") % 37 + 1) * 20
            ).cast("int"),
            "x",
        ).alias("text"),
    ).withColumn("n_chars", F.length("text"))

    path = str(tmp_path / "shards")
    write_balanced_shards(docs, path, num_shards=4, size_col="n_chars")

    back = spark.read.parquet(path)
    assert back.count() == 400
    per_shard = {
        r["shard"]: r["b"]
        for r in back.groupBy("shard").agg(F.sum("n_chars").alias("b")).collect()
    }
    assert set(per_shard) == {0, 1, 2, 3}
    mean_b = sum(per_shard.values()) / 4
    # LPT greedy bound is 4/3 x OPT; with this tail it lands much closer
    assert max(per_shard.values()) <= 1.34 * mean_b, per_shard
    # exactly one data file per shard directory
    for k in range(4):
        files = glob.glob(f"{path}/shard={k}/*.parquet")
        assert len(files) == 1, files


def test_parquet_codec_size_tradeoff(spark, sf_dir, tmp_path):
    """Storage-codec lever: zstd parquet is materially smaller than snappy
    on text-heavy data (both splittable, both vectorized-readable) — the
    100 TB footprint decision measured, not asserted from folklore. Also
    pins that both round-trip identically."""
    import os

    from cobalt_duckdb_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    sizes = {}
    for codec in ("snappy", "zstd"):
        out = str(tmp_path / codec)
        docs.coalesce(1).write.option("compression", codec).parquet(out)
        sizes[codec] = sum(
            os.path.getsize(os.path.join(out, f))
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
        assert spark.read.parquet(out).count() == docs.count()
    assert sizes["zstd"] < sizes["snappy"] * 0.9, sizes


def test_probe_dup_tool_smoke(spark, sf_dir, tmp_path):
    """tools/probe_dup.py end-to-end on a tiny slice: the duplicated corpus
    materializes with factor x replication and near-dup variants, timings
    and ratios come back for the selected queries, and nothing errors. The
    per-round scale regression report (PROBE_rN.json) depends on this tool
    staying runnable."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    import probe_dup

    out_dir = str(tmp_path / "dup")
    probe_dup.build_dup_dir(spark, sf_dir, out_dir, factor=3)
    docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    assert docs.count() == 3 * base.count()
    # replica 0 doc ids are 3x the base ids; variants got fresh unique ids
    assert docs.select("doc_id").distinct().count() == docs.count()
    # idempotent: second build is a no-op (marker file)
    probe_dup.build_dup_dir(spark, sf_dir, out_dir, factor=3)

    from cobalt_duckdb_spark.queries import queries

    fn = queries()["dedup_exact_fingerprint"]
    base_s, base_rows = probe_dup.time_query(fn, spark, sf_dir, runs=1)
    dup_s, dup_rows = probe_dup.time_query(fn, spark, out_dir, runs=1)
    assert base_s > 0 and dup_s > 0
    assert dup_rows >= base_rows  # duplication can only add dup groups
