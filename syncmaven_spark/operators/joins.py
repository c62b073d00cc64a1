"""Join operators Spark lacks natively: as-of join and range join.

Both are implemented as compositions of built-in DataFrame ops (the
preferred path — no Python in the hot loop), with an ``applyInPandas``
merge_asof variant for the grouped case:

- ``asof_join``: for each left row, the newest right row with
  ``right.ts <= left.ts`` (optionally within a tolerance), per key. The
  composition is the classic union-and-carry trick: tag both sides, union,
  window-sort by (key, ts, side) and carry the last right value forward with
  ``last(..., ignorenulls=True)`` — ONE shuffle on the key, no row
  explosion, no cross product. This is the plan you want at 100 TB: cost is
  a sort within key partitions, identical to what a native as-of join would
  shuffle.
- ``asof_join_grouped``: per-key ``pd.merge_asof`` via ``applyInPandas`` —
  for semantics the union trick can't express (nearest/backward tolerance
  mixes, multiple value columns with different rules).
- ``range_join``: inequality-band join (left.v BETWEEN right.lo AND
  right.hi) via bucketized equi-join: both sides emit integer bucket keys of
  width ``bucket_size``; ranges explode into the buckets they span; the join
  runs as an equi-join on bucket + residual predicate — turning an O(n·m)
  broadcast-nested-loop into a keyed shuffle join (the standard trick Spark
  itself uses when ``spark.sql.optimizer.rangeJoin`` is unavailable).
"""

from __future__ import annotations

from typing import Literal

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    direction: Literal["backward"] = "backward",
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before each left row.

    ``on`` is the ordering (timestamp) column present in both sides; ``by``
    the equi-key. Returns all left columns + the matched right value columns
    (null when nothing precedes / outside tolerance).

    NULL semantics follow SQL ASOF (DuckDB ``ASOF LEFT JOIN ... ON l.k =
    r.k``): a NULL ``by`` key matches nothing (the equi-predicate is never
    true), and a NULL right ``on`` never satisfies ``r.on <= l.on`` — such
    right rows are dropped before the union; null-keyed/null-ts LEFT rows
    still pass through with NULL right columns.
    """
    if direction != "backward":
        raise ValueError(
            "asof_join supports direction='backward' only; use "
            f"asof_join_grouped for {direction!r}"
        )
    if right_value_cols is None:
        right_value_cols = [
            c for c in right.columns if c not in (on, by)
        ]

    # The matched right row is carried as ONE struct so all its columns come
    # from the same row — carrying columns independently with
    # last(ignorenulls) would backfill a matched row's NULL column with a
    # stale value from an older right row (and could mix columns of
    # different rows).
    r_struct = F.struct(
        F.col(on).alias("_ts"), *[F.col(c) for c in right_value_cols]
    )
    l_tag = left.select(
        F.col(by), F.col(on), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    # SQL NULL semantics: null-keyed or null-ts right rows can never be the
    # match of any left row (NULL = NULL and r.on <= l.on are both unknown);
    # without this filter the window's partitionBy would group NULL keys
    # together and "match" them, diverging from the ASOF oracle.
    r_tag = right.filter(
        F.col(by).isNotNull() & F.col(on).isNotNull()
    ).select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows sort before left rows at equal ts → "at-or-before" includes
    # exact-timestamp matches
    # the trailing _r orders struct-wise (field by field): when the right
    # side has several rows at the same (by, on) value, the carried match
    # is the struct-max of them — DETERMINISTIC across runs and task
    # retries, where plain (on, _side) ordering picked whichever row the
    # partition's physical order put last
    w = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), F.col("_r").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_c")
    )
    matched = carried.filter(F.col("_side") == 1)

    match_col = F.col("_c")
    if tolerance_seconds is not None:
        in_tol = (
            F.col(on).cast("double") - F.col("_c._ts").cast("double")
        ) <= F.lit(tolerance_seconds)
        match_col = F.when(in_tol, F.col("_c"))

    return matched.select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[match_col[c].alias(f"right_{c}") for c in right_value_cols],
    )


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Per-key ``pd.merge_asof`` via cogrouped ``applyInPandas``.

    Arrow-batched; each key group must fit in executor memory (the usual
    applyInPandas contract). Supports merge_asof's full direction set.

    NULL semantics match :func:`asof_join` (and SQL ASOF): null-keyed or
    null-ts right rows are dropped up front; null-ts left rows pass through
    unmatched (``pd.merge_asof`` rejects null merge keys, so they are split
    out before the merge).
    """
    import pandas as pd
    from pyspark.sql import types as T

    right = right.filter(F.col(by).isNotNull() & F.col(on).isNotNull())

    right_value_cols = [c for c in right.columns if c not in (on, by)]
    out_schema = T.StructType(
        [*left.schema.fields,
         *[T.StructField(f"right_{c}", right.schema[c].dataType, True)
           for c in right_value_cols]]
    )
    left_cols = list(left.columns)

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        # null-ts left rows can never match (r.on <= NULL is unknown) and
        # merge_asof rejects null merge keys — split them out, re-append
        # with NULL right columns at the end
        null_mask = l_pdf[on].isna()
        l_null = l_pdf[null_mask]
        l_sorted = l_pdf[~null_mask].sort_values(on)
        r_sorted = r_pdf.sort_values(on)[[on, *right_value_cols]].rename(
            columns={c: f"right_{c}" for c in right_value_cols}
        )
        if r_sorted.empty or l_sorted.empty:
            out = pd.concat([l_sorted, l_null])
            for c in right_value_cols:
                out[f"right_{c}"] = None
            return out
        kwargs = {}
        if tolerance_seconds is not None:
            # merge_asof needs the tolerance in the `on` column's own
            # domain: a Timedelta against a numeric ordering column raised
            # MergeError inside the UDF (the sibling asof_join supports
            # numeric `on`; this now matches)
            if pd.api.types.is_datetime64_any_dtype(l_sorted[on]):
                kwargs["tolerance"] = pd.Timedelta(seconds=tolerance_seconds)
            else:
                kwargs["tolerance"] = tolerance_seconds
        merged = pd.merge_asof(
            l_sorted, r_sorted, on=on, direction=direction, **kwargs
        )
        if not l_null.empty:
            tail = l_null.copy()
            for c in right_value_cols:
                tail[f"right_{c}"] = None
            merged = pd.concat([merged, tail])
        return merged[[*left_cols, *[f"right_{c}" for c in right_value_cols]]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda lp, rp: merge(lp, rp), out_schema)
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    bucket_size: float,
    extra_key: str | None = None,
) -> DataFrame:
    """Band/range join: left rows matched to right rows whose
    ``[right_lo, right_hi]`` interval contains ``left_value``.

    Both sides bucketize by ``bucket_size``; right intervals explode into
    every bucket they overlap, the join is an equi-join on (bucket[, key])
    plus the exact residual predicate. Pick ``bucket_size`` near the median
    interval width: each interval then lands in O(1) buckets and each bucket
    holds O(1) intervals.
    """
    lb = F.floor(F.col(left_value) / bucket_size).cast("long")
    left_b = left.withColumn("_bucket", lb)

    buckets = F.sequence(
        F.floor(F.col(right_lo) / bucket_size).cast("long"),
        F.floor(F.col(right_hi) / bucket_size).cast("long"),
    )
    right_b = right.withColumn("_bucket", F.explode(buckets))

    join_keys = ["_bucket"] + ([extra_key] if extra_key else [])
    residual = (F.col(left_value) >= F.col(right_lo)) & (
        F.col(left_value) <= F.col(right_hi)
    )
    return left_b.join(right_b, join_keys).filter(residual).drop("_bucket")
