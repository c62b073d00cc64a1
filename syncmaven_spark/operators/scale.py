"""Scale patterns: skew-salted joins and bucketed co-located joins.

These are the partitioning levers SURVEY's scale mandate calls for beyond
what AQE does automatically:

- ``salted_join``: for a join where a handful of left-side keys are hot
  enough that one task drags the stage (and AQE's skew splitting still
  leaves a single oversized build side), salt the left key with ``factor``
  variants and replicate the right side once per salt — the hot key's rows
  spread over ``factor`` tasks at the cost of a ``factor``× blow-up of the
  (small) right side.
- ``write_bucketed`` / ``bucketed_join_ready``: pre-bucket both sides of a
  recurring join on its key so later joins are exchange-free (bucket-aware
  scan replaces the shuffle). This is the batch equivalent of co-located
  storage; worth it when a fact table is joined on the same key by many
  downstream jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted across ``factor`` buckets.

    Left rows get a deterministic pseudo-random salt derived from their
    full row hash; the right side replicates each row once per salt value.
    Result equals ``left.join(right, key, how)`` for inner/left joins.
    """
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(factor))
    )
    salts = F.explode(F.array(*[F.lit(i).cast("long") for i in range(factor)]))
    salted_right = right.withColumn("_salt", salts)
    return salted_left.join(salted_right, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.

    Subsequent equi-joins between two tables bucketed on the same key with
    the same bucket count run without a shuffle exchange on either side.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join_ready(
    spark, left_table: str, right_table: str, key: str, join_hint: str | None = None
) -> DataFrame:
    """Join two pre-bucketed tables; with matching bucketing this plan has
    no shuffle Exchange (assert via .explain in tests). ``join_hint='merge'``
    forces a sort-merge join when one side is small enough that Catalyst
    would otherwise broadcast it (hiding the bucketing effect)."""
    left = spark.table(left_table)
    if join_hint:
        left = left.hint(join_hint)
    return left.join(spark.table(right_table), key)
