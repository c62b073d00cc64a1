"""syncmaven_spark — a PySpark-native rebuild of the syncmaven reverse-ETL engine.

The reference (syncmaven/syncmaven) runs a parameterized SQL SELECT against a
warehouse, streams rows through validation / enrichment, and pushes them into
destination connectors with incremental-cursor state.  This package re-expresses
that capability surface Spark-first:

- models are Spark SQL / DataFrames (Catalyst handles pushdown & pruning),
- incremental cursors are predicate + persisted-state driver logic,
- sinks are in-process Python classes fed by ordered, cursor-range-chunked
  batches (``foreachBatch``-style) with idempotent upsert semantics,
- the key-value state store keeps the reference's ``::``-joined key model.

Beyond reference parity it adds LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"

from syncmaven_spark.session import get_spark  # noqa: F401
