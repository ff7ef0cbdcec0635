"""Custom Python Data Source (Spark 4): a cursor-paginated REST-style source
with PARTITIONED reads (SURVEY.md §2.1 S3 scale path).

The reference ingests Notion with a serial driver-side cursor loop
(``/root/reference/model/data/notion_db.py:28-55``). Spark 4's DataSource
API lets the same logical source read in parallel when the service supports
range addressing: ``partitions()`` splits the id space into cursor ranges
and each executor pulls only its slice. The demo backend synthesizes pages
deterministically (no network in this environment); swapping ``_fetch_range``
for real HTTP calls changes nothing structurally.

Usage:
    spark.dataSource.register(PagedCorpusDataSource)
    df = spark.read.format("paged_corpus").option("total_rows", 1000).load()
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class _CursorRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _fetch_range(start: int, end: int, page_size: int):
    """Deterministic stand-in for a paged HTTP endpoint: yields rows
    page-by-page exactly as a cursor API would."""
    cur = start
    while cur < end:
        page_end = min(cur + page_size, end)
        yield [
            (i, f"title-{i}", f"synthetic content for doc {i} " + "x" * (i % 17))
            for i in range(cur, page_end)
        ]
        cur = page_end


class PagedCorpusReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.total_rows = int(options.get("total_rows", 100))
        self.page_size = int(options.get("page_size", 100))
        self.num_splits = int(options.get("num_splits", 8))

    def partitions(self):
        per = max(1, self.total_rows // self.num_splits)
        starts = list(range(0, self.total_rows, per))
        return [
            _CursorRange(s, min(s + per, self.total_rows)) for s in starts
        ]

    def read(self, partition: _CursorRange):
        for page in _fetch_range(partition.start, partition.end, self.page_size):
            yield from page


class PagedCorpusDataSource(DataSource):
    """spark.read.format("paged_corpus") — schema: doc_id, title, content."""

    @classmethod
    def name(cls) -> str:
        return "paged_corpus"

    def schema(self) -> str:
        return "doc_id BIGINT, title STRING, content STRING"

    def reader(self, schema: StructType) -> DataSourceReader:
        return PagedCorpusReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType):
        return PagedCorpusStreamReader(self.options)


class PagedCorpusStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the cursor-paginated source (Spark 4
    ``simpleStreamReader``): each micro-batch advances the cursor by
    ``pages_per_batch`` pages; the offset IS the cursor, so restart/replay
    re-fetches deterministically (``readBetweenOffsets``) and the sink sees
    effectively-once rows. This is the reference's Notion cursor loop
    (``/root/reference/model/data/notion_db.py:28-55``) as a continuous
    ingest: new pages land as they are published, checkpointed by cursor.

    When the cursor reaches ``total_rows`` the reader reports the same
    offset with no rows — "caught up", which also lets
    ``processAllAvailable``/availableNow terminate."""

    def __init__(self, options: dict):
        self.total_rows = int(options.get("total_rows", 100))
        self.page_size = int(options.get("page_size", 20))
        self.pages_per_batch = int(options.get("pages_per_batch", 2))

    def initialOffset(self) -> dict:
        return {"cursor": 0}

    def _rows(self, start: int, end: int):
        for page in _fetch_range(start, end, self.page_size):
            yield from page

    def read(self, start: dict):
        cur = int(start["cursor"])
        nxt = min(cur + self.pages_per_batch * self.page_size, self.total_rows)
        # list iterator, not a generator: Spark's prefetch wrapper
        # copy.copy()s the returned iterator and generators don't pickle
        return iter(list(self._rows(cur, nxt))), {"cursor": nxt}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(int(start["cursor"]), int(end["cursor"]))))


