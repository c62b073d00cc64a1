"""Cursor semantics tests (reference: sync.ts:302-342 comparator/monotonicity)."""

import datetime as dt

import pytest

from syncmaven_spark.cursor import (
    CursorError,
    CursorTracker,
    compare_cursor,
    deserialize_cursor,
    load_cursor,
    save_cursor,
    serialize_cursor,
)
from syncmaven_spark.state import InMemoryStore


def test_null_smallest():
    assert compare_cursor(None, None) == 0
    assert compare_cursor(None, 0) == -1
    assert compare_cursor(0, None) == 1
    assert compare_cursor(-(10**9), None) == 1


def test_compare_values():
    assert compare_cursor(1, 2) == -1
    assert compare_cursor(2.5, 2.5) == 0
    assert compare_cursor("b", "a") == 1
    a = dt.datetime(2024, 5, 15)
    b = dt.datetime(2024, 5, 16)
    assert compare_cursor(a, b) == -1


def test_serialize_roundtrip_date():
    ts = dt.datetime(2024, 5, 15, 13, 39, 5, 172000)
    s = serialize_cursor(ts)
    assert s == {"type": "date", "val": "2024-05-15T13:39:05.172Z"}
    assert deserialize_cursor(s) == ts


def test_serialize_int():
    assert serialize_cursor(7) == {"type": "integer", "val": 7}
    assert deserialize_cursor({"type": "integer", "val": 7}) == 7
    assert deserialize_cursor(None) is None


def test_store_roundtrip():
    store = InMemoryStore()
    save_cursor(store, "s1", "id", 42)
    assert load_cursor(store, "s1", "id") == 42
    assert load_cursor(store, "other", "id") is None
    save_cursor(store, "s1", "id", None)  # no-op
    assert load_cursor(store, "s1", "id") == 42


def test_tracker_monotonic():
    t = CursorTracker("id")
    t.observe(None)  # null first is fine (smallest)
    t.observe(1)
    t.observe(1)
    t.observe(5)
    assert t.max_value == 5
    with pytest.raises(CursorError):
        t.observe(3)


def test_tracker_null_after_value_rejected():
    t = CursorTracker("id")
    t.observe(2)
    with pytest.raises(CursorError):
        t.observe(None)
