"""Validation + error-threshold tests (uniparser.ts / error-threshold.ts)."""

import datetime as dt

import pytest

from syncmaven_spark.validate import (
    ErrorThreshold,
    ErrorThresholdExceeded,
    RowValidator,
    split_valid_invalid,
)

CONTACT_SCHEMA = {
    "type": "object",
    "properties": {
        "external_id": {"type": ["string", "integer"]},
        "email": {"type": "string"},
        "name": {"type": ["string", "null"]},
    },
    "required": ["external_id", "email"],
}


def test_valid_row_with_custom_attributes():
    v = RowValidator(CONTACT_SCHEMA)
    assert v.is_valid({"external_id": 1, "email": "a@b.c", "custom_field": 42})


def test_missing_required_invalid():
    v = RowValidator(CONTACT_SCHEMA)
    assert not v.is_valid({"email": "a@b.c"})
    assert v.errors_for({"email": "a@b.c"})


def test_wrong_type_invalid():
    v = RowValidator(CONTACT_SCHEMA)
    assert not v.is_valid({"external_id": 1, "email": 123})


def test_dates_validated_as_iso_strings():
    schema = {
        "type": "object",
        "properties": {"time": {"type": "string"}},
        "required": ["time"],
    }
    v = RowValidator(schema)
    # datetime objects pass "type: string" because validation happens on the
    # JSON image (uniparser.ts:54 stringify/parse roundtrip)
    assert v.is_valid({"time": dt.datetime(2024, 5, 15, 13, 39, 5, 172000)})


def test_none_schema_accepts_anything():
    v = RowValidator(None)
    assert v.is_valid({"anything": [1, {"x": None}]})


def test_error_threshold_boundaries():
    t = ErrorThreshold()
    for _ in range(80):
        t.success()
    for _ in range(19):
        t.fail()
    t.check()  # 19/99 — under min_total
    t.fail()  # 20/100 = 0.2 → exceeded
    with pytest.raises(ErrorThresholdExceeded):
        t.check()


def test_error_threshold_low_rate_ok():
    t = ErrorThreshold()
    for _ in range(1000):
        t.success()
    for _ in range(100):
        t.fail()
    t.check()  # 100/1100 < 0.2


def test_split_valid_invalid_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "a@b.c"), (2, None), (3, "c@d.e")], ["external_id", "email"]
    )
    valid, invalid = split_valid_invalid(df, CONTACT_SCHEMA)
    assert sorted(r.external_id for r in valid.collect()) == [1, 3]
    assert [r.external_id for r in invalid.collect()] == [2]
