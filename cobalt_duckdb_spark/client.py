"""Drop-in search client — the reference's user-facing API
(`RuriDuckDBSearchClient`, /root/reference/model/search/vector.py:81-190)
re-expressed Spark-first. A user of the reference app switches by replacing

    client = RuriDuckDBSearchClient.from_dataframe(df, "content")
    results = client.search_top_n("query text", n=10)

with the same two calls against ``SparkSearchClient`` (input is a Spark
DataFrame; each result is a Spark DataFrame — call ``.toPandas()`` at the
presentation boundary, which is where the reference's Gradio app sits).

Parity, mapped call-for-call:

- ``from_dataframe``: "文章: " document prefix → embedder (lazy per-executor
  pandas_udf singleton; same model-save/load-local cache-aside the reference
  does at vector.py:50-60) → L2-normalized persisted vector store + temp
  view (the DuckDB ``register`` equivalent, vector.py:131).
- ``search_top_n``: "クエリ: " prefix → embed → top-n by cosine distance →
  join back the ORIGINAL dataset columns + ``score`` + 0-based ``rank``
  (the reference's exact result contract; its app then does rank+1 for
  display).

Where the Spark version deliberately differs (and why it wins at scale):
a LIST of queries runs as ONE set-oriented job (broadcast query set ×
map-only scan — ``operators/knn.knn_topk_batch``), not the reference's
per-query Python loop (vector.py:171); and the store is a distributed,
spill-safe persisted frame instead of an in-process pandas register.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cobalt_duckdb_spark.functions.inference import (
    make_embedder_udf,
    with_doc_prefix,
    with_query_prefix,
)
from cobalt_duckdb_spark.functions.vector import l2_normalize
from cobalt_duckdb_spark.operators.knn import knn_topk_batch

_ID = "_cobalt_doc_id"


class SparkSearchClient:
    """See module docstring. Construct via ``from_dataframe``."""

    def __init__(
        self,
        dataset: DataFrame,
        target: str,
        store: DataFrame,
        embed_udf,
        spark: SparkSession,
    ) -> None:
        self.dataset = dataset
        self.target = target
        self.store = store
        self._embed = embed_udf
        self._spark = spark

    @classmethod
    def from_dataframe(
        cls,
        data: DataFrame,
        target: str,
        model_name: str = "cl-nagoya/ruri-large",
        dim: int = 64,
        model_dir: str | None = None,
        vector_store_name: str = "ruri_vector_index",
    ) -> "SparkSearchClient":
        """Initialize from a document DataFrame (reference vector.py:98-135).

        Ids are assigned once (``monotonically_increasing_id``) and frozen by
        persisting the id-stamped dataset BEFORE deriving the store, so the
        dataset row and its vector can never disagree."""
        from pyspark import StorageLevel

        spark = data.sparkSession
        embed = make_embedder_udf(model_name, dim, model_dir)

        dataset = data.withColumn(_ID, F.monotonically_increasing_id()).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        dataset.count()  # materialize: freeze ids before the store derives

        store = (
            dataset.select(
                F.col(_ID).alias("vec_id"),
                embed(with_doc_prefix(target)).alias("embedding"),
            )
            .select("vec_id", l2_normalize("embedding").alias("embedding"))
            .filter(F.col("embedding").isNotNull())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        store.createOrReplaceTempView(vector_store_name)
        return cls(dataset, target, store, embed, spark)

    def search_top_n(
        self, query: str | list[str], n: int = 10
    ) -> list[DataFrame]:
        """Top-n search (reference vector.py:140-190): returns one result
        DataFrame per query — the dataset's own columns plus ``score``
        (cosine distance) and 0-based ``rank``. All queries score in ONE
        Spark job; the per-query split is a filter over the cached result."""
        from pyspark import StorageLevel

        queries = [query] if isinstance(query, str) else list(query)
        qdf = self._spark.createDataFrame(
            [(i, q) for i, q in enumerate(queries)], "query_id BIGINT, qtext STRING"
        ).select(
            "query_id",
            self._embed(with_query_prefix("qtext")).alias("query_vec"),
        )
        ranked = knn_topk_batch(
            self.store, qdf, k=n, round_to=None
        ).persist(StorageLevel.MEMORY_AND_DISK)

        joined = (
            ranked.join(self.dataset, ranked.vec_id == self.dataset[_ID])
            .drop(_ID, "vec_id")
            .withColumn("rank", F.col("rank") - 1)  # reference ranks from 0
            .withColumnRenamed("distance", "score")
        )
        return [
            joined.filter(F.col("query_id") == i)
            .drop("query_id")
            .orderBy("rank")
            for i in range(len(queries))
        ]
