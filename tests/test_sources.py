"""Ingest sources/sinks: CSV round-trip, cache-aside semantics, paginated
cursor fetch, markdown cleanup pipeline, multimodal plumbing, inference UDFs."""

import pytest

from pyspark.sql import functions as F

from cobalt_duckdb_spark.io import load_table
from cobalt_duckdb_spark.sources import (
    CORPUS_SCHEMA,
    cache_aside,
    paginated_fetch,
    read_corpus_csv,
    write_corpus_csv,
)
from cobalt_duckdb_spark.sources.corpus import markdown_cleaned_corpus


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "t0", "line one\nline two"),
            (1, "t1", 'with "quotes" and, commas'),
            (2, "t2", "plain"),
        ],
        CORPUS_SCHEMA,
    )


def test_csv_round_trip_multiline(spark, corpus, tmp_path):
    path = str(tmp_path / "corpus_csv")
    write_corpus_csv(corpus, path)
    back = read_corpus_csv(spark, path)
    assert sorted((r.doc_id, r.title, r.content) for r in back.collect()) == sorted(
        (r.doc_id, r.title, r.content) for r in corpus.collect()
    )


def test_cache_aside_fetches_once(spark, corpus, tmp_path):
    path = str(tmp_path / "corpus_cache")
    calls = []

    def fetch(s):
        calls.append(1)
        return corpus

    a = cache_aside(spark, path, fetch)
    b = cache_aside(spark, path, fetch)
    assert a.count() == b.count() == 3
    assert len(calls) == 1  # second call served from cache
    cache_aside(spark, path, fetch, refetch=True)
    assert len(calls) == 2  # refetch forces the source


def test_paginated_fetch_cursor_loop(spark):
    pages = {None: ([{"doc_id": 0, "title": "a", "content": "x"}], "c1"),
             "c1": ([{"doc_id": 1, "title": "b", "content": "y"}], "c2"),
             "c2": ([], None)}

    df = paginated_fetch(spark, lambda cur: pages[cur], CORPUS_SCHEMA)
    assert sorted(r.doc_id for r in df.collect()) == [0, 1]


def test_markdown_cleaned_corpus(spark):
    raw = spark.createDataFrame(
        [(0, "t", "a\n\nb<br/>c*")], CORPUS_SCHEMA
    )
    out = markdown_cleaned_corpus(raw).head()
    assert out.content == "a\nb\nc"


# --- multimodal ---------------------------------------------------------------


def test_multimodal_feature_extract_plumbing(spark, sf_dir):
    from cobalt_duckdb_spark.operators.multimodal import (
        extract_features,
        frame_sample_plan,
        synth_media_from_documents,
    )

    media = synth_media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    assert all(r.feature_dim == 8 for r in rows)
    assert all(len(r.content_hash) == 32 for r in rows)

    plan = frame_sample_plan(media, every_n_bytes=100)
    one = plan.groupBy("media_id").count().head()
    assert one["count"] >= 1


def test_multimodal_decode_stub_flag(spark, sf_dir):
    from cobalt_duckdb_spark.operators.multimodal import (
        extract_features,
        synth_media_from_documents,
    )
    from py4j.protocol import Py4JJavaError

    media = synth_media_from_documents(
        load_table(spark, sf_dir, "documents")
    ).limit(1)
    with pytest.raises(Exception) as exc:
        extract_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(exc.value) or "no media codecs" in str(exc.value)


# --- inference UDFs -----------------------------------------------------------


def test_embedder_udf_deterministic_unit_vectors(spark):
    import math

    from cobalt_duckdb_spark.functions.inference import make_embedder_udf

    df = spark.createDataFrame([("hello",), ("hello",), ("world",)], "text STRING")
    embed = make_embedder_udf(dim=16)
    rows = df.select(embed("text").alias("v")).collect()
    assert rows[0].v == rows[1].v  # deterministic per text
    assert rows[0].v != rows[2].v
    assert math.isclose(sum(x * x for x in rows[0].v), 1.0, rel_tol=1e-5)


def test_tokenizer_udf_fallback(spark):
    from cobalt_duckdb_spark.functions.inference import make_tokenizer_udf

    df = spark.createDataFrame([("abc def42 日本語",)], "text STRING")
    tok = make_tokenizer_udf()
    out = df.select(tok("text").alias("t")).head().t
    assert out.split(" ") == ["abc", "def", "42", "日", "本", "語"]


def test_python_datasource_paged_corpus(spark):
    from cobalt_duckdb_spark.sources.paged_source import PagedCorpusDataSource

    spark.dataSource.register(PagedCorpusDataSource)
    df = (
        spark.read.format("paged_corpus")
        .option("total_rows", 250)
        .option("page_size", 40)
        .option("num_splits", 6)
        .load()
    )
    assert df.rdd.getNumPartitions() >= 6  # cursor ranges became real splits
    rows = df.collect()
    assert len(rows) == 250
    assert sorted(r.doc_id for r in rows) == list(range(250))
    assert rows[0].title.startswith("title-")


def test_cogroup_orders_events_alignment(spark, sf_dir):
    from pyspark.sql import functions as F

    from cobalt_duckdb_spark.operators.cogroup import orders_events_alignment

    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    out = {r["custkey"]: r for r in orders_events_alignment(orders, events).collect()}

    want_orders = {
        r["o_custkey"]: (r["n"], round(r["t"], 2))
        for r in orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("t"))
        .collect()
    }
    for ck, (n, total) in want_orders.items():
        assert out[ck]["n_orders"] == n
        assert abs(out[ck]["order_total"] - total) < 0.01
    # customers with events but no orders still appear (cogroup is full outer)
    ev_only = {r["user_id"] for r in events.select("user_id").distinct().collect()} - set(
        want_orders
    )
    for ck in ev_only:
        assert out[ck]["n_orders"] == 0 and out[ck]["n_events"] > 0


# ---------------------------------------------------------------------------
# JSONL source/sink (training-corpus interchange format)


def test_jsonl_round_trip_and_quarantine(spark, sf_dir, tmp_path):
    from cobalt_duckdb_spark.sources.jsonl import (
        clean_and_quarantine,
        read_jsonl,
        write_jsonl,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out)
    clean, corrupt = clean_and_quarantine(back)
    assert corrupt.count() == 0
    assert clean.columns == docs.columns
    want = docs.agg(
        F.count(F.lit(1)), F.sum("n_chars"), F.sum(F.length("text"))
    ).collect()[0]
    got = clean.agg(
        F.count(F.lit(1)), F.sum("n_chars"), F.sum(F.length("text"))
    ).collect()[0]
    assert tuple(got) == tuple(want)


def test_jsonl_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    from cobalt_duckdb_spark.sources.jsonl import clean_and_quarantine, read_jsonl

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
        '{"doc_id": 3, "text": "unclosed\n'
    )
    df = read_jsonl(spark, str(p))
    clean, corrupt = clean_and_quarantine(df)
    assert clean.count() == 2
    got_corrupt = sorted(r.raw_line for r in corrupt.collect())
    assert got_corrupt == ["this is not json at all", '{"doc_id": 3, "text": "unclosed']


# ORC columnar interchange (Hive-era lakes / Trino exports)


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC sink→source round trip preserves data AND the scan gets the same
    pushdown/pruning guarantees as Parquet: PushedFilters populated, pruned
    ReadSchema (only selected columns reach the reader)."""
    from pyspark.sql import functions as F

    from cobalt_duckdb_spark.io import load_table
    from cobalt_duckdb_spark.sources.columnar import read_orc, write_orc

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out)

    back = read_orc(spark, out)
    assert back.count() == docs.count()
    a = sorted(docs.select("doc_id", "lang").collect())
    b = sorted(back.select("doc_id", "lang").collect())
    assert a == b

    q = back.filter(F.col("doc_id") < 50).select("doc_id", "n_chars")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(doc_id,50)" in plan
    assert "n_chars" in plan.split("ReadSchema")[1][:200]
    assert "text" not in plan.split("ReadSchema")[1][:200]


def test_binaryfile_media_ingest_to_multimodal_ops(spark, tmp_path):
    """Files → MEDIA_SCHEMA rows → existing multimodal operators, end to
    end: the binaryFile source is the raw-lake ingest boundary, and its
    listing-time filters (glob, length) must prune before content is read."""
    from cobalt_duckdb_spark.operators.multimodal import binary_stats, extract_features
    from cobalt_duckdb_spark.sources.binary import read_media_files

    d = tmp_path / "media"
    d.mkdir()
    payloads = {
        "a.png": b"\x89PNG" + b"x" * 100,
        "b.wav": b"RIFF" + b"y" * 200,
        "c.mp4": b"\x00\x00ftyp" + b"z" * 300,
        "huge.png": b"\x89PNG" + b"h" * 5000,
        "notes.txt": b"not media",
    }
    for name, blob in payloads.items():
        (d / name).write_bytes(blob)

    media = read_media_files(
        spark, str(d), glob="*.{png,wav,mp4}", max_bytes=1000
    )
    rows = {r["format"]: r for r in media.collect()}
    assert set(rows) == {"png", "wav", "mp4"}  # txt glob-pruned, huge size-pruned
    assert rows["png"]["kind"] == "image"
    assert rows["wav"]["kind"] == "audio"
    assert rows["mp4"]["kind"] == "video"
    assert bytes(rows["wav"]["blob"]) == payloads["b.wav"]
    assert len({r["media_id"] for r in rows.values()}) == 3  # distinct stable ids

    # the ingested frame feeds the existing multimodal operators unchanged
    stats = {r["format"]: r["n_bytes"] for r in binary_stats(media).collect()}
    assert stats == {"png": 104, "wav": 204, "mp4": 306}
    feats = extract_features(media).collect()
    assert len(feats) == 3 and all(r["feature_dim"] == 8 for r in feats)


def test_wholetext_corpus_one_doc_per_file(spark, tmp_path):
    from cobalt_duckdb_spark.sources.binary import read_wholetext_corpus

    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.md").write_text("first doc\nwith two lines")
    (d / "b.md").write_text("second doc")
    got = {r["file_name"]: r for r in read_wholetext_corpus(spark, str(d)).collect()}
    assert set(got) == {"a.md", "b.md"}
    # wholetext: the newline does NOT split the document
    assert got["a.md"]["text"] == "first doc\nwith two lines"
    assert got["a.md"]["doc_id"] != got["b.md"]["doc_id"]


def test_python_datasource_paged_corpus_stream(spark, tmp_path):
    """Streaming half of the paged source: cursor offsets advance per
    micro-batch, all pages land exactly once, and the reader reports
    caught-up (same offset, no rows) at the end so processAllAvailable
    terminates."""
    from cobalt_duckdb_spark.sources.paged_source import PagedCorpusDataSource

    spark.dataSource.register(PagedCorpusDataSource)
    q = (
        spark.readStream.format("paged_corpus")
        .option("total_rows", 130)
        .option("page_size", 20)
        .option("pages_per_batch", 2)
        .load()
        .writeStream.format("memory")
        .queryName("paged_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT doc_id FROM paged_stream_sink").collect()
    finally:
        q.stop()
    assert sorted(r.doc_id for r in rows) == list(range(130))
    # 130 rows / (2 pages × 20 rows) per batch → at least 4 non-empty batches
    assert q.lastProgress is not None


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Lake-pipeline schema evolution: a later ingest batch adds a column.
    `mergeSchema=true` must unify the footers (old rows null-backfilled),
    pruning must still reach the scan, and the default (no-merge) read
    must keep the first-listed schema silently — the footgun the option
    exists for."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(0, "alpha"), (1, "beta")], "doc_id BIGINT, text STRING"
    ).write.parquet(base + "/batch=1")
    spark.createDataFrame(
        [(2, "gamma", "en"), (3, "delta", "ja")],
        "doc_id BIGINT, text STRING, lang STRING",
    ).write.parquet(base + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(
        base + "/batch=1", base + "/batch=2"
    )
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert rows[0]["lang"] is None and rows[3]["lang"] == "ja"

    # pruning survives the merged scan: a lang-only projection reads a
    # one-column ReadSchema (plus nothing else)
    plan = (
        merged.select("lang").filter(F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ReadSchema: struct<lang:string>" in plan

    # evolution is opt-in: without mergeSchema, ONE batch's footer wins
    # wholesale — the schema must equal exactly one of the per-batch
    # schemas, and the row-level consequence of that winner must hold
    # (either the new column silently disappears for ALL rows, or the old
    # batch's rows are null-backfilled under the new schema). This pins the
    # actual footgun instead of accepting any outcome.
    schema1 = spark.read.parquet(base + "/batch=1").schema
    schema2 = spark.read.parquet(base + "/batch=2").schema
    unmerged = spark.read.parquet(base + "/batch=1", base + "/batch=2")
    assert unmerged.schema in (schema1, schema2), unmerged.schema
    urows = {r["doc_id"]: r for r in unmerged.collect()}
    assert set(urows) == {0, 1, 2, 3}  # both batches' rows always read
    if unmerged.schema == schema1:
        # batch=1's footer won: lang is GONE even for batch=2's rows
        assert "lang" not in unmerged.columns
    else:
        # batch=2's footer won: batch=1's rows read with lang null
        assert urows[0]["lang"] is None and urows[1]["lang"] is None
        assert urows[3]["lang"] == "ja"


def test_load_table_events_directory_layout(spark, sf_dir, tmp_path):
    # Derived corpora (skew/fuzz probes, any real Spark-written lake) ship
    # events.parquet as a DIRECTORY of part files; the ts-unit footer sniff
    # must pick a part file instead of failing on the directory open.
    import os

    out = str(tmp_path / "derived")
    os.makedirs(out)
    src = load_table(spark, sf_dir, "events")
    src.limit(100).repartition(4).write.parquet(out + "/events.parquet")
    rows = load_table(spark, out, "events").collect()
    assert len(rows) == 100
    # unit adaptation still correct: no 1970 collapse
    assert min(r["ts"] for r in rows).year > 1990


def test_load_table_spread_same_rows_more_partitions(spark, sf_dir):
    """r9 optimization: spread=True round-robins a one-row-group scan
    across the session's cores (guide §2.5 unsplittable-input fix) without
    changing a single row, and the un-spread load stays single-task."""
    from cobalt_duckdb_spark.io import load_table
    from cobalt_duckdb_spark.session import default_parallelism

    plain = load_table(spark, sf_dir, "events")
    spread = load_table(spark, sf_dir, "events", spread=True)
    assert spread.rdd.getNumPartitions() == default_parallelism()
    assert plain.rdd.getNumPartitions() < spread.rdd.getNumPartitions()
    # identical multiset of rows (sorted collect on the small test SF)
    cols = plain.columns
    a = sorted(map(tuple, plain.select(cols).collect()))
    b = sorted(map(tuple, spread.select(cols).collect()))
    assert a == b
    # cache keys are spread-aware: the two frames are distinct objects
    assert plain is not spread
    assert load_table(spark, sf_dir, "events", spread=True) is spread


