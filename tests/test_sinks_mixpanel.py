"""Mixpanel sink tests (reference: packages/connectors/mixpanel, Go)."""

import datetime as dt

from syncmaven_spark.sinks.mixpanel import (
    DateRanges,
    MixpanelDestination,
    adapt_row,
    make_insert_id,
)
from syncmaven_spark.state import InMemoryStore

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)


class FakeMixpanel:
    def __init__(self, fail=False):
        self.batches = []
        self.fail = fail

    def import_events(self, events):
        if self.fail:
            raise RuntimeError("import failed")
        self.batches.append(list(events))
        return len(events)


def _open(client, store, creds=None):
    return MixpanelDestination().create_output_stream(
        "AdData",
        {"_client": client, "_now": NOW, **(creds or {})},
        "s1",
        store,
    )


def _row(date, campaign=1, source="google", **kw):
    return {"date": date, "source": source, "campaign_id": campaign,
            "cost": 10, "clicks": 2, "impressions": 100, **kw}


def test_date_ranges_codec_roundtrip():
    dr = DateRanges()
    dr.append(dt.date(2024, 5, 1))
    dr.append(dt.date(2024, 5, 3))
    dr.append(dt.date(2024, 5, 4))  # adjacent → merges with 5-3
    assert dr.to_json() == ["2024-05-01", ["2024-05-03", "2024-05-04"]]
    back = DateRanges.from_json(dr.to_json())
    assert back == dr
    assert back.contains(dt.date(2024, 5, 3))
    assert not back.contains(dt.date(2024, 5, 2))
    assert back.last_date() == dt.date(2024, 5, 4)
    assert DateRanges.from_json(None).is_empty()
    assert DateRanges.from_json({}).is_empty()


def test_insert_id_shape_and_renames():
    row = _row("2024-05-20", campaign=42, group_id=7, ad_id="a1")
    iid = make_insert_id(row)
    prefix, date, digest = iid.split("-", 2)[0], iid.split("-")[1:4], iid.rsplit("-", 1)[-1]
    assert iid.startswith("G-2024-05-20-")
    assert len(digest) == 23

    adapted = adapt_row(row)
    assert adapted["$ad_platform"] == "google"
    assert adapted["$ad_cost"] == 10
    assert adapted["$ad_clicks"] == 2
    assert adapted["$ad_impressions"] == 100
    assert adapted["ad_group_id"] == 7
    assert adapted["$insert_id"] == iid
    assert "source" not in adapted and "cost" not in adapted


def test_window_filters_and_state_commit():
    client, store = FakeMixpanel(), InMemoryStore()
    out = _open(client, store)
    out.handle_row(_row("2024-04-01"))  # older than initialSyncDays(30) → skip
    out.handle_row(_row("2024-05-20"))
    out.handle_row(_row("2024-05-21"))
    stats = out.finish()
    assert stats.skipped == 1 and stats.success == 2
    assert store.get(["syncId=s1", "type=mixpanel.state"]) == [
        ["2024-05-20", "2024-05-21"]
    ]


def test_already_processed_skipped_unless_in_lookback():
    store = InMemoryStore()
    store.set(["syncId=s1", "type=mixpanel.state"], [["2024-05-10", "2024-05-21"]])
    client = FakeMixpanel()
    out = _open(client, store)
    # last_date=2024-05-21, lookback 2d → lookback_start=2024-05-19
    out.handle_row(_row("2024-05-15"))  # inside state, before lookback → skip
    out.handle_row(_row("2024-05-20"))  # inside state but within lookback → send
    out.handle_row(_row("2024-05-22"))  # new date → send
    stats = out.finish()
    assert stats.skipped == 1 and stats.success == 2
    assert store.get(["syncId=s1", "type=mixpanel.state"]) == [
        ["2024-05-10", "2024-05-22"]
    ]


def test_per_date_batching_flushes_on_date_change():
    client, store = FakeMixpanel(), InMemoryStore()
    out = _open(client, store)
    out.handle_row(_row("2024-05-20", campaign=1))
    out.handle_row(_row("2024-05-20", campaign=2))
    out.handle_row(_row("2024-05-21", campaign=3))  # date change → flush
    assert len(client.batches) == 1 and len(client.batches[0]) == 2
    out.finish()
    assert len(client.batches) == 2


def test_failed_import_does_not_commit_state():
    client, store = FakeMixpanel(fail=True), InMemoryStore()
    out = _open(client, store)
    out.handle_row(_row("2024-05-20"))
    stats = out.finish()
    assert stats.failed == 1 and stats.success == 0
    assert store.get(["syncId=s1", "type=mixpanel.state"]) is None


def test_batch_size_flush():
    client, store = FakeMixpanel(), InMemoryStore()
    out = _open(client, store, creds={"batchSize": 2})
    for c in range(5):
        out.handle_row(_row("2024-05-20", campaign=c))
    out.finish()
    assert [len(b) for b in client.batches] == [2, 2, 1]


def test_failed_batch_dates_never_committed_by_later_success():
    """Round-4 review: a failed batch's dates used to remain in
    `processed` and ride into the state commit of the NEXT successful
    batch — permanently marking the failed rows as imported, so the
    following run skipped them as 'already processed' (silent loss)."""

    class FailOnce(FakeMixpanel):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def import_events(self, events):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("transient import failure")
            return super().import_events(events)

    client, store = FailOnce(), InMemoryStore()
    out = _open(client, store)
    out.handle_row(_row("2024-05-20"))  # batch 1 — will fail
    out.handle_row(_row("2024-05-21"))  # date change flushes batch 1
    stats = out.finish()  # batch 2 (05-21) succeeds and commits state
    assert stats.failed == 1 and stats.success == 1
    committed = DateRanges.from_json(store.get(["syncId=s1", "type=mixpanel.state"]))
    assert committed.contains(dt.date(2024, 5, 21))
    assert not committed.contains(dt.date(2024, 5, 20))  # failed date NOT committed


def test_rate_limited_batch_retries():
    """429 surfaces as RateLimitError and retries through the engine loop
    instead of being counted failed."""
    from syncmaven_spark.sinks.base import RateLimitError

    class RateLimitedOnce(FakeMixpanel):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def import_events(self, events):
            self.calls += 1
            if self.calls == 1:
                raise RateLimitError("throttled", retry_after_ms=1)
            return super().import_events(events)

    client, store = RateLimitedOnce(), InMemoryStore()
    out = _open(client, store)
    out.handle_row(_row("2024-05-20"))
    stats = out.finish()
    assert stats.success == 1 and stats.failed == 0
    assert client.calls == 2


def test_undelivered_rows_is_pending_batch_in_source_shape():
    """Only the never-attempted pending batch is undelivered, and it comes
    back in SOURCE row shape (carrying the cursor column) so the runner's
    halt clamp can read it. A failed import is excluded: its dates stay
    uncommitted in the range state and re-process next run (round-5
    advice)."""
    client = FakeMixpanel()
    store = InMemoryStore()
    out = _open(client, store, {"batchSize": 2})
    rows = [_row("2024-05-20", campaign=c) for c in (1, 2, 3)]
    for r in rows:
        out.handle_row(r)
    # batch of 2 flushed, one row pending
    assert len(client.batches) == 1
    assert out.undelivered_rows() == [rows[2]]
    out.finish()
    assert out.undelivered_rows() == []

    # failed import: not pending (date-range state is the recovery channel)
    failing = _open(FakeMixpanel(fail=True), InMemoryStore(), {"batchSize": 2})
    for r in rows[:2]:
        failing.handle_row(r)
    assert failing.undelivered_rows() == []
    assert failing.stats.failed == 2
