"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the SURVEY §2 operator inventory as
(Spark builder, DuckDB oracle) pairs; see ``syncmaven_spark/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-shaped pricing
    summary (scan → filter → multi-agg groupBy) through the catalog path."""
    from syncmaven_spark.queries import CATALOG

    return CATALOG["rel_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from syncmaven_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from syncmaven_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
