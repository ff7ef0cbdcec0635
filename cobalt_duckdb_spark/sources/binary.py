"""Binary-file and whole-text file sources — the raw-lake ingest boundary.

A multimodal training-data lake starts as FILES (images, audio, video, raw
documents), not rows. Spark's built-in ``binaryFile`` source turns a
directory tree into (path, modificationTime, length, content BINARY) rows
with the file listing distributed across executors, and its pathGlobFilter /
recursiveFileLookup options prune at LISTING time — before any byte is read.
``text`` with ``wholetext`` does the same for one-document-per-file corpora.

Scale shape:
- ``length`` and ``path`` come from the file system metadata, so size/type
  filters (``length < maxBytes``, glob on extension) never touch content —
  the oversized-blob guard is free;
- content lands directly in the BINARY column convention the multimodal
  operators use (``operators/multimodal.py::MEDIA_SCHEMA``), so decode /
  feature-extract / frame-sample plans run unchanged on file-ingested media;
- one row per file: fine for media blobs (MBs), wrong for billions of tiny
  files — the documented fix is the standard small-files compaction pass
  (``operators/scale.py::compact_parquet``) right after ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT_KIND = {
    "png": "image", "jpg": "image", "jpeg": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def read_media_files(
    spark: SparkSession,
    directory: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Directory of media files → the MEDIA_SCHEMA row convention:
    (media_id, kind, format, blob, meta_json). ``media_id`` is a
    deterministic hash of the relative file name (stable across runs and
    listing orders); ``kind`` is derived from the extension. ``max_bytes``
    filters on listing metadata — oversized files are skipped without
    reading a byte."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(directory)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.element_at(F.split(fname, r"\."), -1))
    kind_expr = F.lit(None).cast("string")
    for e, k in sorted(_EXT_KIND.items()):
        kind_expr = F.when(ext == e, F.lit(k)).otherwise(kind_expr)
    return df.select(
        F.xxhash64(fname).alias("media_id"),
        kind_expr.alias("kind"),
        ext.alias("format"),
        F.col("content").alias("blob"),
        F.to_json(
            F.struct(
                fname.alias("file_name"),
                F.col("length").alias("n_bytes"),
                F.col("modificationTime").cast("string").alias("modified"),
            )
        ).alias("meta_json"),
    )


def read_wholetext_corpus(spark: SparkSession, directory: str) -> DataFrame:
    """One-document-per-file text corpus → (doc_id, file_name, text).
    ``wholetext=true`` keeps each file one row (the document boundary IS the
    file boundary); doc_id is the stable file-name hash."""
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(os.path.join(directory, "*"))
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file_name"),
            F.col("value").alias("text"),
        )
    )
    return df.select(
        F.xxhash64("file_name").alias("doc_id"), "file_name", "text"
    )
