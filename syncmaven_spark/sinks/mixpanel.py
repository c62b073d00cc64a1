"""Mixpanel ad-spend import destination (stream ``AdData``).

Reference: ``packages/connectors/mixpanel/`` (Go) —
- field renames: source→$ad_platform, cost→$ad_cost, clicks→$ad_clicks,
  impressions→$ad_impressions, group_id→ad_group_id (types.go:41-47),
- deterministic ``$insert_id`` =
  ``UPPER(source[0])-date-md5("{src[0]}-{date}-{campaign}[-group][-ad]")[:23]``
  for idempotent re-import (types.go:73-95),
- per-date batches of ``batchSize`` (default 2000) — a date change flushes
  the batch (main.go:151-162, 27),
- window filters (main.go:167-181): skip rows older than ``initialSyncDays``
  (default 30) before 'today'; skip rows already inside the processed
  date-range state unless within ``lookbackWindow`` (default 2 days) of the
  last processed date,
- processed-date-ranges state under ``["syncId=<id>", "type=mixpanel.state"]``
  as merged ranges JSON ``["d1", ["d2","d3"]]`` (ranges.go:20-75,
  main.go:108), committed only after a successful import (main.go:191-218).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
from typing import Any, Protocol

from syncmaven_spark.sinks import register
from syncmaven_spark.sinks.base import (
    DestinationProvider,
    OutputStream,
    StreamSpec,
)

NAME_MAPPINGS = {
    "source": "$ad_platform",
    "cost": "$ad_cost",
    "clicks": "$ad_clicks",
    "impressions": "$ad_impressions",
    "group_id": "ad_group_id",
}

ADDATA_ROW_TYPE = {
    "type": "object",
    "properties": {
        "date": {"type": "string"},
        "source": {"type": "string"},
        "campaign_id": {"type": ["string", "integer"]},
        "campaign_name": {"type": ["string", "null"]},
        "group_id": {"type": ["string", "integer", "null"]},
        "ad_id": {"type": ["string", "integer", "null"]},
        "cost": {"type": ["number", "null"]},
        "clicks": {"type": ["number", "null"]},
        "impressions": {"type": ["number", "null"]},
        "conversions": {"type": ["number", "null"]},
    },
    "required": ["date", "source", "campaign_id"],
    "additionalProperties": True,
}


# --- date-range set codec (ranges.go:20-75) -------------------------------


class DateRanges:
    """A merged set of inclusive [from, to] date ranges."""

    def __init__(self, ranges: list[tuple[_dt.date, _dt.date]] | None = None) -> None:
        self._ranges: list[tuple[_dt.date, _dt.date]] = []
        for lo, hi in ranges or []:
            self.append(lo, hi)

    def append(self, lo: _dt.date, hi: _dt.date | None = None) -> None:
        hi = hi or lo
        merged = [(lo, hi)]
        for a, b in self._ranges:
            m_lo, m_hi = merged[0]
            # merge when overlapping or adjacent (day granularity)
            if a <= m_hi + _dt.timedelta(days=1) and m_lo <= b + _dt.timedelta(days=1):
                merged[0] = (min(a, m_lo), max(b, m_hi))
            else:
                merged.append((a, b))
        self._ranges = sorted(merged)

    def contains(self, d: _dt.date) -> bool:
        return any(lo <= d <= hi for lo, hi in self._ranges)

    def last_date(self) -> _dt.date | None:
        return max((hi for _, hi in self._ranges), default=None)

    def is_empty(self) -> bool:
        return not self._ranges

    def copy(self) -> "DateRanges":
        return DateRanges(list(self._ranges))

    def __eq__(self, other: object) -> bool:
        return isinstance(other, DateRanges) and self._ranges == other._ranges

    def to_json(self) -> list[Any]:
        """``["d1", ["d2","d3"]]`` — single-day ranges collapse to a string."""
        out: list[Any] = []
        for lo, hi in self._ranges:
            if lo == hi:
                out.append(lo.isoformat())
            else:
                out.append([lo.isoformat(), hi.isoformat()])
        return out

    @classmethod
    def from_json(cls, raw: Any) -> "DateRanges":
        dr = cls()
        if raw in (None, {}, []):
            return dr
        if not isinstance(raw, list):
            raise ValueError(f"expected array of ranges, got {type(raw).__name__}")
        for item in raw:
            if isinstance(item, str):
                d = _dt.date.fromisoformat(item)
                dr.append(d, d)
            elif isinstance(item, list) and len(item) == 2:
                dr.append(
                    _dt.date.fromisoformat(item[0]), _dt.date.fromisoformat(item[1])
                )
            else:
                raise ValueError(f"expected date or [from,to] pair, got {item!r}")
        return dr


def make_insert_id(row: dict[str, Any]) -> str:
    """types.go:73-95."""
    source = str(row.get("source") or "")
    prefix = source[:1].upper()
    date = str(row.get("date") or "")
    parts = [source[:1], date, str(row.get("campaign_id"))]
    if row.get("group_id") is not None:
        parts.append(str(row["group_id"]))
    if row.get("ad_id") is not None:
        parts.append(str(row["ad_id"]))
    digest = hashlib.md5("-".join(parts).encode("utf-8")).hexdigest()
    return f"{prefix}-{date}-{digest[:23]}"


def adapt_row(row: dict[str, Any]) -> dict[str, Any]:
    """Field renames + $insert_id injection (types.go:49-62)."""
    adapted = {NAME_MAPPINGS.get(k, k): v for k, v in row.items()}
    adapted.setdefault("$insert_id", make_insert_id(row))
    return adapted


class MixpanelClient(Protocol):
    def import_events(self, events: list[dict]) -> int:
        """Import a batch; returns the number of records imported.
        Raise on failure."""


class RestMixpanelClient:
    def __init__(self, project_token: str, residency: str | None = None) -> None:
        import requests

        self._s = requests.Session()
        base = "https://api-eu.mixpanel.com" if residency == "EU" else "https://api.mixpanel.com"
        self.url = f"{base}/import?strict=0"
        self._s.auth = (project_token, "")

    def import_events(self, events: list[dict]) -> int:
        from syncmaven_spark.sinks.base import RateLimitError, parse_retry_after

        resp = self._s.post(self.url, json=events, timeout=15)
        if resp.status_code == 429:
            # like every other REST client here: surface throttling to the
            # engine's sleep-and-retry loop instead of dropping the batch
            raise RateLimitError(
                "mixpanel rate limited",
                retry_after_ms=parse_retry_after(resp.headers.get("Retry-After")),
            )
        resp.raise_for_status()
        data = resp.json()
        if data.get("code", 200) != 200 or data.get("num_records_imported", 0) == 0:
            raise RuntimeError(f"mixpanel import failed: {data}")
        return data.get("num_records_imported", len(events))


class MixpanelAdDataStream(OutputStream):
    def __init__(
        self,
        client: MixpanelClient,
        store: Any,
        sync_id: str,
        credentials: dict[str, Any],
        now: _dt.datetime | None = None,
    ) -> None:
        super().__init__()
        self.client = client
        self.store = store
        self.state_key = [f"syncId={sync_id}", "type=mixpanel.state"]
        self.lookback_window = int(credentials.get("lookbackWindow", 2))
        self.initial_sync_days = int(credentials.get("initialSyncDays", 30))
        self.batch_size = int(credentials.get("batchSize", 2000))
        self.start_time = now or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)

        self.initial_state = DateRanges.from_json(store.get(self.state_key))
        self.processed = self.initial_state.copy()
        self.committed = self.initial_state.copy()
        self.last_date = self.initial_state.last_date() or self.start_time.date()

        self._batch: list[dict] = []
        self._batch_dates: list[_dt.date] = []
        # source-shaped twins of _batch entries, for undelivered_rows():
        # the runner's halt clamp reads the cursor column off source rows,
        # which the $ad_spend event transform no longer carries
        self._batch_rows: list[dict[str, Any]] = []
        self._last_processed_date: str | None = None

    def handle_row(self, row: dict[str, Any]) -> None:
        date_s = str(row.get("date") or "").strip()
        if self._last_processed_date is not None and date_s != self._last_processed_date:
            self._send_batch()  # per-date batches (main.go:151-156)
        self._last_processed_date = date_s
        self.stats.received += 1
        self.stats.substreams[date_s] = self.stats.substreams.get(date_s, 0) + 1

        try:
            t = _dt.date.fromisoformat(date_s)
        except ValueError:
            self.stats.failed += 1
            return

        initial_sync_start = self.start_time.date() - _dt.timedelta(
            days=self.initial_sync_days
        )
        lookback_start = self.last_date - _dt.timedelta(days=self.lookback_window)

        if t < initial_sync_start:
            self.stats.skipped += 1  # too old (main.go:174-177)
            return
        if self.initial_state.contains(t) and t < lookback_start:
            self.stats.skipped += 1  # already processed (main.go:178-181)
            return

        self._batch.append(
            {
                "event": "$ad_spend",
                "properties": {"time": date_s, **adapt_row(row)},
            }
        )
        # the date joins `processed` only when ITS batch imports: appending
        # here let a failed batch's dates ride into the state commit of the
        # NEXT successful batch — permanently marking the failed rows as
        # processed (silent loss on the following run)
        self._batch_dates.append(t)
        self._batch_rows.append(row)
        if len(self._batch) >= self.batch_size:
            self._send_batch()

    def _send_batch(self) -> None:
        """Import + commit state only on success (main.go:191-218).
        Rate-limited imports retry via the engine loop before counting as
        failed.

        The blanket except below is REFERENCE PARITY, not an oversight:
        the Go connector logs an import error, counts the batch failed,
        and KEEPS GOING (main.go:196-204). The failed batch's dates are
        deliberately NOT committed to the date-range state, so the next
        run re-processes them — recovery is bounded by lookbackWindow,
        exactly as in the reference's model."""
        from syncmaven_spark.sinks.base import with_rate_limit_retry

        if not self._batch:
            return
        batch, self._batch = self._batch, []
        dates, self._batch_dates = self._batch_dates, []
        self._batch_rows = []
        try:
            with_rate_limit_retry(self.client.import_events, batch)
        except Exception:
            self.stats.failed += len(batch)
            return
        for d in dates:
            self.processed.append(d)
        if self.processed != self.committed:
            self.store.set(self.state_key, self.processed.to_json())
            self.committed = self.processed.copy()
        self.stats.success += len(batch)

    def finish(self):
        self._send_batch()
        return self.stats

    def undelivered_rows(self) -> list[dict[str, Any]]:
        """Only the never-attempted pending batch. A batch whose import
        FAILED is deliberately excluded: the reference's recovery channel
        for failed imports is the date-range state (its dates stay
        uncommitted, so the next run re-processes them within
        lookbackWindow, main.go:196-218) — clamping the cursor for them too
        would double-deliver once the date state re-covers the range."""
        return list(self._batch_rows)


@register("mixpanel")
class MixpanelDestination(DestinationProvider):
    name = "mixpanel"
    credentials_schema = {
        "type": "object",
        "properties": {"projectToken": {"type": "string"},
                        "residency": {"type": "string", "enum": ["US", "EU"]},
                        "batchSize": {"type": "integer", "default": 2000},
                        "lookbackWindow": {"type": "integer", "default": 2},
                        "initialSyncDays": {"type": "integer", "default": 30}},
        "required": ["projectToken"],
    }

    def streams(self) -> list[StreamSpec]:
        return [StreamSpec(name="AdData", row_type=ADDATA_ROW_TYPE)]

    def create_output_stream(
        self,
        stream_name: str,
        credentials: dict[str, Any],
        sync_id: str,
        store: Any,
        full_refresh: bool = False,
        restart: bool = False,
        options: dict[str, Any] | None = None,
    ) -> OutputStream:
        self.stream_spec(stream_name)
        client = credentials.get("_client") or RestMixpanelClient(
            credentials["projectToken"], credentials.get("residency")
        )
        return MixpanelAdDataStream(
            client, store, sync_id, credentials, now=credentials.get("_now")
        )
