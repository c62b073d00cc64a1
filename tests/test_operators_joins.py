"""As-of join and range join tests."""

import datetime as dt

import pytest

from syncmaven_spark.operators.joins import asof_join, asof_join_grouped, range_join

T = dt.datetime


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", T(2024, 1, 1, 10, 0, 0), 100),
            ("A", T(2024, 1, 1, 10, 5, 0), 101),
            ("A", T(2024, 1, 1, 9, 0, 0), 99),   # before any quote
            ("B", T(2024, 1, 1, 10, 3, 0), 200),
        ],
        ["sym", "ts", "qty"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", T(2024, 1, 1, 9, 59, 0), 10.0),
            ("A", T(2024, 1, 1, 10, 0, 0), 10.5),   # exact-ts match
            ("A", T(2024, 1, 1, 10, 4, 0), 11.0),
            ("B", T(2024, 1, 1, 10, 0, 0), 20.0),
        ],
        ["sym", "ts", "price"],
    )
    return trades, quotes


def test_asof_join_backward(trades_quotes):
    trades, quotes = trades_quotes
    out = {(r.sym, r.qty): r.right_price for r in asof_join(
        trades, quotes, on="ts", by="sym"
    ).collect()}
    assert out[("A", 100)] == 10.5   # exact timestamp counts as at-or-before
    assert out[("A", 101)] == 11.0   # newest preceding quote
    assert out[("A", 99)] is None    # nothing precedes
    assert out[("B", 200)] == 20.0


def test_asof_join_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = {(r.sym, r.qty): r.right_price for r in asof_join(
        trades, quotes, on="ts", by="sym", tolerance_seconds=90
    ).collect()}
    assert out[("A", 101)] == 11.0       # 60s gap within tolerance
    assert out[("B", 200)] is None       # 180s gap outside tolerance


def test_asof_join_grouped_matches_composition(trades_quotes):
    trades, quotes = trades_quotes
    a = {(r.sym, r.qty): r.right_price for r in asof_join(
        trades, quotes, on="ts", by="sym"
    ).collect()}
    b = {(r.sym, r.qty): (None if r.right_price != r.right_price else r.right_price)
         for r in asof_join_grouped(trades, quotes, on="ts", by="sym").collect()}
    # NaN (pandas) normalizes to None for comparison
    b = {k: (None if v is None else v) for k, v in b.items()}
    assert a == b


def test_asof_join_preserves_left_rowcount(spark, testdata):
    events = testdata["events"].select("event_id", "ts", "user_id").limit(200)
    # self-as-of: each event matched to the latest event at-or-before it
    out = asof_join(events, events.withColumnRenamed("event_id", "ref_id"),
                    on="ts", by="user_id")
    assert out.count() == 200


def test_range_join_intervals(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 9.99)], ["pid", "v"]
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 20.0), ("wide", 0.0, 30.0)],
        ["band", "lo", "hi"],
    )
    out = range_join(points, bands, "v", "lo", "hi", bucket_size=10.0)
    got = sorted((r.pid, r.band) for r in out.collect())
    assert got == [
        (1, "low"), (1, "wide"),
        (2, "mid"), (2, "wide"),
        (3, "wide"),
        (4, "low"), (4, "wide"),
    ]


def test_range_join_with_extra_key(spark):
    points = spark.createDataFrame([("x", 5.0), ("y", 5.0)], ["k", "v"])
    bands = spark.createDataFrame([("x", 0.0, 10.0)], ["k", "lo", "hi"])
    out = range_join(points, bands, "v", "lo", "hi", bucket_size=5.0, extra_key="k")
    assert [r.k for r in out.collect()] == ["x"]  # y has no band in its key
