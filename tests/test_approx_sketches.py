"""Approximate-sketch accuracy: approx results stay within tolerance of exact."""

from pyspark.sql import functions as F

from syncmaven_spark.queries import CATALOG

from tests.conftest import SF_CORRECTNESS


def test_approx_count_distinct_within_tolerance(spark):
    """The catalog entry emits the sketch contract directly: exact counts
    plus booleans asserting the HLL++ estimate lands within 5%."""
    rows = {
        r.l_returnflag: r
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
    assert set(rows) == set(exact)
    for flag, (o, p) in exact.items():
        r = rows[flag]
        assert (r.exact_orders, r.exact_parts) == (o, p)
        assert r.orders_within_5pct and r.parts_within_5pct, flag


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
    rows = {
        r["o_orderpriority"]: r
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
    assert rows.keys() == exact.keys()
    for grp, r in rows.items():
        for got, want in zip((r.exact_p50, r.exact_p90, r.exact_p99), exact[grp]):
            assert abs(got - want) <= 0.01, (grp, got, want)  # rounded to 2dp
        assert r.p50_within_5pct and r.p90_within_5pct and r.p99_within_5pct, grp
