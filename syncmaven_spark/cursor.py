"""Incremental-cursor semantics.

Reference: ``packages/core/src/commands/sync.ts:302-342,455-538``.
- The model SQL must reference ``:cursor`` when the model declares a cursor
  column (guard at sync.ts:455-459).
- The last max cursor value is persisted under key
  ``["syncId=<id>", "$lastCursor=<col>"]`` as ``{"type": ..., "val": ...}``
  with dates ISO-serialized (sync.ts:460-468, 328-332).
- Cursor comparison treats null as the *smallest* value (sync.ts:311-326).
- Rows must arrive with non-decreasing cursor values — the engine demands
  ``ORDER BY <cursor> ASC`` (sync.ts:526-534).
- The cursor predicate is inclusive ``>=``, so the boundary row is re-emitted
  on the next run (encoded in the reference's part2 golden files).

Spark-first: the running max is ``df.agg(max(col))`` — no ordering needed for
the value itself; ordering matters only for checkpointed prefix delivery
(runner.py chunks by cursor ranges instead of sorting globally).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
from typing import Any

from syncmaven_spark.state import KeyLike, StateStore
from syncmaven_spark.types import iso_millis


class CursorError(ValueError):
    pass


def cursor_state_key(sync_id: str, cursor_column: str) -> list[str]:
    return [f"syncId={sync_id}", f"$lastCursor={cursor_column}"]


def cursor_type_of(value: Any) -> str:
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "float"
    if isinstance(value, _decimal.Decimal):
        return "decimal"
    if isinstance(value, (_dt.datetime, _dt.date)):
        return "date"
    return "string"


def serialize_cursor(value: Any) -> dict[str, Any]:
    """State-file representation: ``{"type": ..., "val": ...}`` with dates as
    ISO-millis strings (sync.ts:328-332). Decimals persist as exact decimal
    text (json can't carry Decimal, and float would lose precision); a
    non-finite float cursor fails fast — json.dumps would write the
    non-standard token ``NaN`` into the store and the next run's compile
    would ship invalid SQL."""
    if isinstance(value, float) and not math.isfinite(value):
        raise CursorError(
            f"cursor value {value!r} is not finite; filter NaN/Infinity "
            "out of the cursor column (Spark's max() treats NaN as greater "
            "than every double, so one NaN row poisons the cursor)"
        )
    if isinstance(value, _decimal.Decimal):
        if not value.is_finite():
            raise CursorError(f"cursor value {value!r} is not finite")
        return {"type": "decimal", "val": format(value, "f")}
    if isinstance(value, (_dt.datetime, _dt.date)):
        return {"type": "date", "val": iso_millis(value)}
    return {"type": cursor_type_of(value), "val": value}


def deserialize_cursor(stored: dict[str, Any] | None) -> Any | None:
    if stored is None:
        return None
    val = stored.get("val")
    if stored.get("type") == "date" and isinstance(val, str):
        return _dt.datetime.strptime(val, "%Y-%m-%dT%H:%M:%S.%fZ")
    if stored.get("type") == "decimal" and isinstance(val, str):
        return _decimal.Decimal(val)
    return val


def load_cursor(store: StateStore, sync_id: str, cursor_column: str) -> Any | None:
    return deserialize_cursor(store.get(cursor_state_key(sync_id, cursor_column)))


def save_cursor(store: StateStore, sync_id: str, cursor_column: str, value: Any) -> None:
    if value is None:
        return
    store.set(cursor_state_key(sync_id, cursor_column), serialize_cursor(value))


def clear_cursor(store: StateStore, sync_id: str, cursor_column: str) -> None:
    """Full refresh: drop the persisted cursor so the next run scans everything
    (sync.ts:462-464)."""
    store.delete(cursor_state_key(sync_id, cursor_column))


def compare_cursor(a: Any, b: Any) -> int:
    """Three-way compare with null-smallest semantics (sync.ts:311-326)."""
    if a is None and b is None:
        return 0
    if a is None:
        return -1
    if b is None:
        return 1
    ka, kb = _comparable(a), _comparable(b)
    if ka < kb:
        return -1
    if ka > kb:
        return 1
    return 0


def _comparable(v: Any) -> Any:
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    return v


class CursorTracker:
    """Running-max + monotonicity enforcement over a delivered row stream."""

    def __init__(self, cursor_column: str) -> None:
        self.cursor_column = cursor_column
        self.max_value: Any | None = None
        self._seen_any = False

    def observe(self, value: Any) -> None:
        if self._seen_any and compare_cursor(value, self.max_value) < 0:
            raise CursorError(
                f"cursor column '{self.cursor_column}' is not non-decreasing; "
                f"the model query must ORDER BY {self.cursor_column} ASC"
            )
        self._seen_any = True
        if compare_cursor(value, self.max_value) >= 0:
            self.max_value = value
