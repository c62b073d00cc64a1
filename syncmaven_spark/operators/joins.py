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
from pyspark.sql import types as T


def _reject_right_collisions(
    left: DataFrame, right_value_cols: list[str]
) -> None:
    """Both as-of variants emit the right side's value columns as
    ``right_<col>``; a left column already named that would be silently
    overwritten inside the grouped UDF (or make the plain variant emit
    duplicate names) — the same reserved-name bug class as the ``_ridx``
    fix, one name over. Fail fast instead."""
    clashes = [c for c in right_value_cols if f"right_{c}" in left.columns]
    if clashes:
        raise ValueError(
            "asof join output name collision: left already has column(s) "
            f"{[f'right_{c}' for c in clashes]}; rename them or the right "
            "value column(s) before joining"
        )


def _droppable_right(df: DataFrame, by: str, on: str) -> DataFrame:
    """Right rows that can never be an as-of match are dropped up front:
    NULL key / NULL ts (SQL ASOF: both predicates unknown) and — for
    float/double ``on`` — NaN ts, which pd.merge_asof rejects outright
    ('Merge keys contain null values') and which Spark's NaN-greatest
    ordering would otherwise treat as newer than every real timestamp."""
    cond = F.col(by).isNotNull() & F.col(on).isNotNull()
    if isinstance(df.schema[on].dataType, (T.DoubleType, T.FloatType)):
        cond = cond & ~F.isnan(F.col(on))
    return df.filter(cond)


def _orderable(dt) -> bool:
    """Spark can ORDER BY any type except maps (at any nesting depth)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


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
    _reject_right_collisions(left, right_value_cols)

    # Left rows with a NULL key or NULL ts can never match — BYPASS them
    # around the shuffle entirely instead of letting the window hash every
    # null-keyed row into ONE partition (30% null user_ids would otherwise
    # pile one straggler task; round-5 max review). They rejoin the result
    # with NULL right columns below.
    bypass_cond = F.col(by).isNull() | F.col(on).isNull()
    l_pass = left.filter(bypass_cond)
    l_main = left.filter(~bypass_cond)

    # The matched right row is carried as ONE struct so all its columns come
    # from the same row — carrying columns independently with
    # last(ignorenulls) would backfill a matched row's NULL column with a
    # stale value from an older right row (and could mix columns of
    # different rows).
    r_struct = F.struct(
        F.col(on).alias("_ts"), *[F.col(c) for c in right_value_cols]
    )
    l_tag = l_main.select(
        F.col(by), F.col(on), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(r_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    # SQL NULL semantics: null-keyed / null-ts (and NaN-ts, for numeric
    # `on`) right rows can never be the match of any left row — dropped
    # before the union (see _droppable_right).
    r_tag = _droppable_right(right, by, on).select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows sort before left rows at equal ts → "at-or-before" includes
    # exact-timestamp matches
    # the trailing tie-break: when the right side has several rows at the
    # same (by, on) value, the carried match is the struct-max of them —
    # DETERMINISTIC across runs and task retries, where plain (on, _side)
    # ordering picked whichever row the partition's physical order put
    # last. Structs containing a MAP are not orderable in Spark, so those
    # fall back to an xxhash64-of-JSON tie-break — still deterministic,
    # just not "max" (previously: AnalysisException for any map value col).
    if _orderable(l_tag.schema["_r"].dataType):
        tie = F.col("_r").asc()
    else:
        tie = F.xxhash64(F.to_json(F.col("_r"))).asc()
    w = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), tie)
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

    result = matched.select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[match_col[c].alias(f"right_{c}") for c in right_value_cols],
    )
    passthrough = l_pass.select(
        *left.columns,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"right_{c}")
            for c in right_value_cols
        ],
    )
    return result.unionByName(passthrough)


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
    null-ts (and NaN-ts, for numeric ``on``) right rows are dropped up
    front; null-keyed/null-ts left rows bypass the shuffle and pass through
    unmatched.

    DOCUMENTED DIVERGENCE for a NaN LEFT ``on`` value (double columns
    only): Arrow hands Spark NULL and Spark NaN to pandas as the same NaN,
    so this variant must treat them alike (unmatched); :func:`asof_join`
    — where the two are distinguishable — follows Spark's NaN-greatest
    comparison and matches a NaN-ts left row to the newest right row.

    The match is carried by ROW INDEX, not by merging the value columns:
    ``pd.merge_asof`` fills unmatched rows with NaN, which (a) is not NULL
    (``isNull()`` false, aggregates poisoned) and (b) upcasts int64 value
    columns to float64, silently corrupting ids above 2^53 (round-5 max
    review). Indexed lookup returns the original-dtype values exactly and
    true NULLs for unmatched rows; ties on ``on`` sort by the value columns
    (stable mergesort) so the winner matches asof_join's struct-max and is
    deterministic across task retries.
    """
    import numpy as np
    import pandas as pd

    right = _droppable_right(right, by, on)

    right_value_cols = [c for c in right.columns if c not in (on, by)]
    _reject_right_collisions(left, right_value_cols)
    out_schema = T.StructType(
        [*left.schema.fields,
         *[T.StructField(f"right_{c}", right.schema[c].dataType, True)
           for c in right_value_cols]]
    )
    left_cols = list(left.columns)
    # collision-proof right-row-index name: a left column literally named
    # `_ridx` would make merge_asof suffix the overlap (_ridx_x/_ridx_y)
    # and the lookup below KeyError inside the executor for every group
    ridx = "_ridx"
    while ridx in left_cols:
        ridx = "_" + ridx

    # bypass null-keyed/null-ts left rows around the shuffle (same skew
    # rationale as asof_join); in-pandas isna split below still guards the
    # NaN-double case the Spark-side filter cannot see
    bypass_cond = F.col(by).isNull() | F.col(on).isNull()
    l_pass = left.filter(bypass_cond)
    l_main = left.filter(~bypass_cond)

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        # NaN-ts left rows (double `on`; Spark NULL is indistinguishable
        # from NaN here) can never match — split out, re-append unmatched
        null_mask = l_pdf[on].isna()
        l_null = l_pdf[null_mask]
        l_sorted = l_pdf[~null_mask].sort_values(on, kind="mergesort")
        try:
            # deterministic tie order among equal `on`: backward merge_asof
            # picks the LAST row <= key, so ascending value order makes the
            # max win — matching asof_join's struct-max tie-break
            r_sorted = r_pdf.sort_values(
                [on, *right_value_cols], kind="mergesort"
            )
        except TypeError:
            # unorderable value columns (dict/map): stable sort on `on`
            # alone — best-effort determinism
            r_sorted = r_pdf.sort_values(on, kind="mergesort")
        r_sorted = r_sorted.reset_index(drop=True)
        if r_sorted.empty or l_sorted.empty:
            out = pd.concat([l_sorted, l_null])
            for c in right_value_cols:
                out[f"right_{c}"] = None
            return out[[*left_cols, *[f"right_{c}" for c in right_value_cols]]]
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
        r_keys = r_sorted[[on]].copy()
        r_keys[ridx] = np.arange(len(r_sorted), dtype="int64")
        merged = pd.merge_asof(
            l_sorted, r_keys, on=on, direction=direction, **kwargs
        )
        ridx_vals = merged[ridx]
        for c in right_value_cols:
            vals = r_sorted[c]
            # dtype="object" is load-bearing: a plain list assignment of
            # [None, np.int64] coerces the column to float64 (None → NaN),
            # recreating both the NaN-not-NULL and the 2^53 precision bugs
            # this indexed lookup exists to fix; Arrow converts the object
            # column back to the declared type exactly, with true nulls
            merged[f"right_{c}"] = pd.Series(
                [None if pd.isna(ix) else vals.iloc[int(ix)]
                 for ix in ridx_vals],
                index=merged.index,
                dtype="object",
            )
        if not l_null.empty:
            tail = l_null.copy()
            for c in right_value_cols:
                tail[f"right_{c}"] = None
            merged = pd.concat([merged, tail])
        return merged[[*left_cols, *[f"right_{c}" for c in right_value_cols]]]

    result = (
        l_main.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda lp, rp: merge(lp, rp), out_schema)
    )
    passthrough = l_pass.select(
        *left.columns,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"right_{c}")
            for c in right_value_cols
        ],
    )
    return result.unionByName(passthrough)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    bucket_size: float,
    extra_key: str | None = None,
    max_buckets_per_interval: int = 1_000_000,
) -> DataFrame:
    """Band/range join: left rows matched to right rows whose
    ``[right_lo, right_hi]`` interval contains ``left_value``.

    Both sides bucketize by ``bucket_size``; right intervals explode into
    every bucket they overlap, the join is an equi-join on (bucket[, key])
    plus the exact residual predicate. Pick ``bucket_size`` near the median
    interval width: each interval then lands in O(1) buckets and each bucket
    holds O(1) intervals.

    ``max_buckets_per_interval`` fails FAST (clear error, evaluated inside
    the explode expression) when a single interval would explode past the
    bound — one open-ended sentinel interval (``hi = 1e12``) would
    otherwise materialize a ~1e12-element sequence and kill the job with
    an opaque array-size error (round-5 max review). Raise the bound
    deliberately if intervals that wide are genuinely intended.
    """
    lb = F.floor(F.col(left_value) / bucket_size).cast("long")
    left_b = left.withColumn("_bucket", lb)

    lo_b = F.floor(F.col(right_lo) / bucket_size).cast("long")
    hi_b = F.floor(F.col(right_hi) / bucket_size).cast("long")
    guarded_lo = F.when(
        hi_b - lo_b >= F.lit(int(max_buckets_per_interval)),
        F.raise_error(
            F.concat(
                F.lit(
                    "range_join: interval spans more than "
                    f"{max_buckets_per_interval} buckets at bucket_size="
                    f"{bucket_size} (lo="
                ),
                F.col(right_lo).cast("string"),
                F.lit(", hi="),
                F.col(right_hi).cast("string"),
                F.lit(
                    "); widen bucket_size, clean the interval, or raise "
                    "max_buckets_per_interval"
                ),
            )
        ).cast("long"),
    ).otherwise(lo_b)
    right_b = right.withColumn("_bucket", F.explode(F.sequence(guarded_lo, hi_b)))

    join_keys = ["_bucket"] + ([extra_key] if extra_key else [])
    residual = (F.col(left_value) >= F.col(right_lo)) & (
        F.col(left_value) <= F.col(right_hi)
    )
    return left_b.join(right_b, join_keys).filter(residual).drop("_bucket")
