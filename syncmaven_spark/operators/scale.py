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


def _reject_salt_column(op: str, *dfs: DataFrame) -> None:
    """The salt rides an internal ``_salt`` column; an input that already
    carries one would be silently overwritten (and then dropped / mis-
    aggregated), so collide loudly instead."""
    for df in dfs:
        if "_salt" in df.columns:
            raise ValueError(
                f"{op}: input already has a '_salt' column, which the "
                "salting would silently overwrite — rename it first"
            )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted across ``factor`` buckets.

    Left rows get a ``rand(seed)``-derived salt — NOT a content hash: the
    classic skew case is a hot key of byte-IDENTICAL rows (event/log
    spam), which a row hash would put on ONE salt, leaving the skew
    intact.

    Determinism contract: the join RESULT never depends on which salt a
    row draws (every salt matches the replicated right copy), only the
    physical row distribution does. Salt values themselves are
    reproducible only when the left input's partition contents AND order
    are reproducible (``rand`` is seeded per (partition, row offset)); if
    the left side is itself shuffle output, a fetch-failure stage retry
    may regenerate different salts. That is safe on Spark 3+/4 because
    ``rand`` is flagged nondeterministic, so the retry invalidates and
    reruns the downstream (indeterminate-stage) stages rather than mixing
    old and new salt assignments — but it also means this plan subtree is
    excluded from exchange/plan reuse: don't route a branch through
    ``salted_join`` if the same branch must share a reused exchange
    elsewhere. The right side replicates each row once per salt value.
    Result equals
    ``left.join(right, key, how)`` for inner/left joins ONLY — in a
    right/full outer join every unmatched replicated right copy would
    surface as a spurious NULL-padded row, so those reject.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(
            f"salted_join is only correct for inner/left-family joins, "
            f"got how={how!r} (replicated right copies would emit spurious "
            "unmatched rows)"
        )
    _reject_salt_column("salted_join", left, right)
    salted_left = left.withColumn(
        "_salt", F.floor(F.rand(0x5A17) * factor).cast("long")
    )
    salts = F.explode(F.array(*[F.lit(i).cast("long") for i in range(factor)]))
    salted_right = right.withColumn("_salt", salts)
    return salted_left.join(salted_right, [key, "_salt"], how).drop("_salt")


_MERGE = {
    "count": F.sum,  # partial counts re-aggregate by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    factor: int = 16,
) -> DataFrame:
    """Two-phase aggregation for low-cardinality / hot grouping keys.

    ``aggs`` maps output column → ``(fn, input_col)`` with fn in
    count/sum/min/max (the decomposable aggregates). Phase 1 groups by
    ``(keys, salt)`` so a hot key's rows spread over ``factor`` reducers;
    phase 2 merges the ``factor`` partials per key. Results are identical
    to a direct ``groupBy(keys)`` — only the shuffle layout changes.

    Note Spark's hash aggregate already does map-side partial combining,
    which covers most skew; the explicit salt matters when phase-1 groups
    are too many to combine in map memory (e.g. high-cardinality secondary
    keys) or when a single reducer's merged partials still dominate.
    """
    unsupported = [f for f, _ in aggs.values() if f not in _MERGE]
    if unsupported:
        raise ValueError(f"non-decomposable aggregate(s): {unsupported}")
    _reject_salt_column("salted_aggregate", df)
    # rand(seed), NOT a content hash: duplicate rows (the classic skew
    # case) must land on different salts. The aggregate RESULT is salt-
    # independent (phase 2 merges all partials per key); salt values are
    # reproducible only for a reproducible input partitioning, and on a
    # stage retry Spark's indeterminate-stage machinery reruns the
    # downstream stages (rand is flagged nondeterministic) — see
    # salted_join's determinism contract.
    salt = F.floor(F.rand(0x5A17) * factor).cast("long")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[getattr(F, fn)(c).alias(out) for out, (fn, c) in aggs.items()])
    )
    return phase1.groupBy(*key_cols).agg(
        *[_MERGE[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )


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
