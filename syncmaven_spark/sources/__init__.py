"""Source registry: datasource URL/config → DataFrame reader.

Reference: ``packages/core/src/datasources/index.ts:69-93`` — dispatch on a
``postgres(ql)://`` URL string or a ``{type: "bigquery"|"snowflake",
credentials}`` object. Here every datasource resolves to a Spark reader, so
Catalyst owns pushdown/pruning for all of them (SURVEY §4: the reference
delegated optimization to the warehouse; we delegate to Catalyst + the
connector's pushdown).
"""

from syncmaven_spark.sources.registry import (  # noqa: F401
    Datasource,
    create_datasource,
    register_source,
)
