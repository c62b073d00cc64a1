"""Property test: the union-and-carry as-of join agrees with pandas
merge_asof (via the cogrouped variant) on randomized inputs."""

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from syncmaven_spark.operators.joins import asof_join, asof_join_grouped

BASE = dt.datetime(2024, 1, 1)

# distinct timestamps per side (merge_asof breaks right-side ts ties by
# position, which is not defined for distributed input — the engine contract
# requires deduped right timestamps per key, see join_asof_backward's
# pre-aggregation)
ts_offsets = st.lists(
    st.integers(min_value=0, max_value=500), min_size=1, max_size=12, unique=True
)


@st.composite
def asof_case(draw):
    keys = draw(st.lists(st.integers(0, 2), min_size=1, max_size=3, unique=True))
    left, right = [], []
    for k in keys:
        for off in draw(ts_offsets):
            left.append((k, BASE + dt.timedelta(minutes=off), off))
        for off in draw(ts_offsets):
            value = draw(
                st.one_of(st.none(), st.floats(-100, 100, allow_nan=False))
            )
            right.append((k, BASE + dt.timedelta(minutes=off), value))
    return left, right


@pytest.mark.usefixtures("spark")
@given(case=asof_case())
@settings(max_examples=12, deadline=None)
def test_asof_matches_merge_asof(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(left_rows, "k long, ts timestamp, payload long")
    right = spark.createDataFrame(right_rows, "k long, ts timestamp, v double")

    composed = {
        (r.k, r.ts, r.payload): r.right_v
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    grouped = {
        (r.k, r.ts, r.payload): r.right_v
        for r in asof_join_grouped(left, right, on="ts", by="k").collect()
    }
    # pandas NaN → None normalization
    grouped = {
        k: (None if v is None or v != v else v) for k, v in grouped.items()
    }
    composed = {
        k: (None if v is None or v != v else v) for k, v in composed.items()
    }
    assert composed == grouped
