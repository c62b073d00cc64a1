"""Approximate-sketch accuracy: approx results stay within tolerance of exact."""

from pyspark.sql import functions as F

from syncmaven_spark.queries import CATALOG

from tests.conftest import SF_CORRECTNESS


def test_approx_count_distinct_within_tolerance(spark):
    approx = {
        r.l_returnflag: (r.approx_orders, r.approx_parts)
        for r in CATALOG["rel_approx_distinct"].spark_fn(spark, SF_CORRECTNESS).collect()
    }
    exact = {
        r.l_returnflag: (r.o, r.p)
        for r in spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("o"),
            F.countDistinct("l_partkey").alias("p"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag in exact:
        for a, e in zip(approx[flag], exact[flag]):
            assert abs(a - e) / max(e, 1) < 0.1  # HLL++ default rsd ≈ 5%


def test_percentile_approx_close_to_exact(spark):
    from syncmaven_spark.session import load_tables

    load_tables(spark, SF_CORRECTNESS)
    row = (
        spark.table("orders")
        .agg(
            F.percentile_approx("o_totalprice", 0.5).alias("approx"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("exact"),
        )
        .first()
    )
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_grouped_approx_percentiles_close_to_exact(spark):
    """Backs rel_approx_percentiles' accuracy claim: per-group GK sketch at
    accuracy 10000 vs exact interpolated percentiles."""
    from syncmaven_spark.queries import CATALOG
    from syncmaven_spark.session import load_tables

    load_tables(spark, SF_CORRECTNESS)
    approx = {
        r["o_orderpriority"]: r["approx_pcts"]
        for r in CATALOG["rel_approx_percentiles"]
        .spark_fn(spark, SF_CORRECTNESS)
        .collect()
    }
    exact = {
        r["o_orderpriority"]: r["pcts"]
        for r in spark.table("orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("pcts")
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for grp in approx:
        for a, e in zip(approx[grp], exact[grp]):
            assert abs(a - e) / e < 0.02, (grp, a, e)
