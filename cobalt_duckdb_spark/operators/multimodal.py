"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star operators for a multimodal training-data pipeline. The container
has no image/audio codecs, so the DECODE step is stubbed (deterministic fake
behind ``decode_stub=True``, ``NotImplementedError`` otherwise) — but every
piece of Spark plumbing is real and tested: binary column schemas, Arrow
batch shape through ``mapInPandas``, partition sizing, and the metadata
extraction that runs JVM-side.

Design for 100 TB of blobs:
- blobs travel as Parquet BINARY; metadata (format, dims, duration) lives in
  sibling typed columns so filters prune WITHOUT touching bytes;
- per-row Python work goes through ``mapInPandas`` (Arrow-batched, lazy
  decoder singleton per executor) — never a row-at-a-time UDF;
- batch size is bounded by bytes not rows: wide blobs need
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned down.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("format", StringType()),      # png | wav | mp4 | ...
        StructField("blob", BinaryType()),
        StructField("meta_json", StringType()),   # typed sidecar metadata
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("feature_dim", LongType()),
        StructField("feature_note", StringType()),
    ]
)


def binary_stats(media: DataFrame) -> DataFrame:
    """JVM-side blob statistics — no Python, no decode: length, md5, per-kind
    aggregates all prune-friendly."""
    return media.select(
        "media_id",
        "kind",
        "format",
        F.length("blob").cast("bigint").alias("n_bytes"),
        F.md5("blob").alias("content_hash"),
    )


def _decode_fake(blob: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 'features' derived from
    byte statistics. Stable across runs/engines — good enough to exercise
    the full distributed plumbing."""
    if not blob:
        return [0.0] * 8
    head = blob[:256]
    return [
        float(len(blob)),
        float(sum(head) % 997),
        float(head[0]),
        float(head[-1]),
        float(min(head)),
        float(max(head)),
        float(len(set(head))),
        float(sum(1 for b in head if b > 127)),
    ]


def extract_features(
    media: DataFrame,
    decode_stub: bool = True,
    batch_note: str = "stub-decoder",
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Real deployment: replace ``_decode_fake`` with PIL/ffmpeg calls inside
    the same iterator — the lazy ``decoder`` singleton loads once per
    executor process, NOT per batch (SURVEY.md §2.10 U1 pattern, mirroring
    the reference's lazy model load ``model/search/vector.py:50-60``)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        decoder = None  # lazy per-executor init happens on first batch
        for pdf in batches:
            if decoder is None:
                if not decode_stub:
                    raise NotImplementedError(
                        "no media codecs in this environment; pass decode_stub=True"
                    )
                decoder = _decode_fake
            feats = [
                decoder(blob if blob is not None else b"", kind)
                for blob, kind in zip(pdf["blob"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["blob"]],
                    "content_hash": [
                        __import__("hashlib").md5(b or b"").hexdigest()
                        for b in pdf["blob"]
                    ],
                    "feature_dim": [len(f) for f in feats],
                    "feature_note": batch_note,
                }
            )

    # No repartition: the scan's own splits parallelize mapInPandas, and a
    # pre-shuffle would move every blob byte through the exchange — at a
    # 100 TB media lake that shuffle IS the job. If upstream collapsed the
    # partitioning (e.g. a coalesced sink), repartition at the SOURCE, not
    # here.
    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video frame-sampling SKELETON: emits (media_id, offset) rows for each
    sample point — the real decoder would seek those offsets. Pure JVM
    expression (sequence + explode), so the sampling plan itself is
    distributed and cheap; only the decode of sampled offsets costs."""
    # an EMPTY blob has no frames: emit zero rows, not a [0] offset — the
    # old greatest(len-1, 0) clamp made sequence(0, 0) yield one spurious
    # sample point for zero-length media (degenerate-text fuzz, r6)
    offsets = F.when(
        F.length("blob") > 0,
        F.sequence(
            F.lit(0).cast("bigint"),
            F.length("blob").cast("bigint") - 1,
            F.lit(every_n_bytes).cast("bigint"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(offsets).alias("byte_offset"),
    )


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents corpus
    (UTF-8 bytes as the 'blob'), used by tests and the multimodal query —
    the container ships no real media files."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "wav")
        .otherwise("mp4")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        fmt.alias("format"),
        F.encode("text", "UTF-8").alias("blob"),
        F.to_json(F.struct("lang", "source", "n_chars")).alias("meta_json"),
    )
