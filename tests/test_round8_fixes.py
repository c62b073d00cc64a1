"""Round-8 ADVICE fixes: float-safe recipe comparison, stamp-derived dim
(no per-epoch batch re-scan), and schema-explicit state reads that tolerate
footerless epoch dirs left by older layouts."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_check_index_recipe_compares_floats(spark):
    """Round-7 advice: _norm coerced every numeric with int(), so two
    genuinely different float recipe values (0.8 vs 0.3) compared equal
    (int both → 0), silently disabling the fail-fast. Non-integral floats
    now compare as floats; integral widening (32 vs 32.0, the parquet
    JSON round-trip case) stays tolerated."""
    from syncmaven_spark.operators.dedup import (
        _with_recipe_meta,
        check_index_recipe,
    )

    df = spark.createDataFrame([(1, 2)], "id long, h long")
    stamped = _with_recipe_meta(df, "h", {"threshold": 0.8, "bands": 32})
    check_index_recipe(stamped, "h", {"threshold": 0.8, "bands": 32})
    check_index_recipe(stamped, "h", {"threshold": 0.8, "bands": 32.0})
    with pytest.raises(ValueError, match="recipe mismatch"):
        check_index_recipe(stamped, "h", {"threshold": 0.3, "bands": 32})


def test_cosine_incremental_new_index_skips_batch_scan(spark):
    """Round-7 advice: with new_index supplied, the probe derived dim by
    eagerly scanning new_df — one Spark job per call, re-executing the
    micro-batch source once per epoch in the streaming driver. dim now
    comes from the recipe stamps; a poisoned new_df (raising UDF) proves
    the batch is never scanned, and recipe mismatches still fail fast."""
    from syncmaven_spark.operators import (
        cosine_lsh_candidates_incremental,
        cosine_lsh_index,
    )

    rng = np.random.RandomState(7)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    old = emb.filter("vec_id < 30")
    new = emb.filter("vec_id >= 30")
    cfg = dict(n_planes=4, n_tables=8, max_bucket_size=None)
    index = cosine_lsh_index(old, **cfg)
    batch_index = cosine_lsh_index(new, **cfg)

    @F.udf("array<double>")
    def boom(v):
        raise RuntimeError("batch scanned")

    poisoned = new.withColumn("embedding", boom("embedding"))
    got = cosine_lsh_candidates_incremental(
        poisoned, index, new_index=batch_index, **cfg
    )
    assert got.count() >= 0  # evaluating candidates never touches new_df

    # the stamp-only path still fails fast on a wrong probe recipe
    with pytest.raises(ValueError, match="recipe mismatch"):
        cosine_lsh_candidates_incremental(
            poisoned, index, n_planes=8, n_tables=8,
            max_bucket_size=None, new_index=batch_index,
        )
    # and matches the clean-batch result exactly
    clean = {
        (r.id_a, r.id_b)
        for r in cosine_lsh_candidates_incremental(
            new, index, **cfg
        ).collect()
    }
    assert {(r.id_a, r.id_b) for r in got.collect()} == clean


def test_read_epoch_state_tolerates_footerless_epoch_dir(spark, tmp_path):
    """Round-7 advice (medium): an epoch dir with zero parquet footers —
    written by the older layout for an all-unusable-rows batch — made
    schema inference fail with UNABLE_TO_INFER_SCHEMA and permanently
    wedged the stream. The read now passes the known schema explicitly."""
    from syncmaven_spark.streaming.incremental import (
        _id_bucket,
        _read_epoch_state,
    )

    table = str(tmp_path / "sets")
    os.makedirs(os.path.join(table, "epoch=0", "bucket=1"))
    ddl = "doc_id long, _set array<bigint>"
    empty = _read_epoch_state(spark, table, ["doc_id", "_set"], ddl, 1)
    assert empty.count() == 0

    # a later real epoch beside the footerless one still reads fine
    spark.range(0, 20).select(
        F.col("id").alias("doc_id"), F.array(F.col("id")).alias("_set")
    ).withColumn("bucket", _id_bucket("doc_id", 8)).write.partitionBy(
        "bucket"
    ).parquet(os.path.join(table, "epoch=1"))
    got = _read_epoch_state(spark, table, ["doc_id", "_set"], ddl, 2)
    assert got.count() == 20
