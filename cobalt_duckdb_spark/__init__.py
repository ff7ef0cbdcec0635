"""cobalt_duckdb_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference app ``Shakshi3104/cobalt-duckdb`` (embedding top-k vector search
over a document corpus, see ``/root/reference/model/search/vector.py``),
re-expressed as an idiomatic Spark library and extended with the relational
(TPC-H-style), deduplication, similarity-search, text-analysis, multimodal
and streaming operators a large-scale training-data pipeline needs.

Design stance (SURVEY.md §7):
- DataFrame/SQL first; Catalyst does the optimizing.
- Explicit, deterministic semantics (tie-breaks pinned by key columns).
- Python UDFs only where a model/tokenizer is intrinsic, always Arrow-batched.
"""

from cobalt_duckdb_spark.session import get_spark
from cobalt_duckdb_spark.io import load_table, TABLE_NAMES

__all__ = ["get_spark", "load_table", "TABLE_NAMES"]
__version__ = "0.1.0"
