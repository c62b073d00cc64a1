"""Halt handling (B11) + stream-stats aggregation (B12) through the runner."""

from syncmaven_spark.runner import ModelDefinition, SyncDefinition, run_sync
from syncmaven_spark.sinks.base import (
    ANY_OBJECT_SCHEMA,
    DestinationProvider,
    HaltError,
    OutputStream,
    StreamSpec,
)
from syncmaven_spark.state import InMemoryStore


class HaltingStream(OutputStream):
    def __init__(self, halt_after: int):
        super().__init__()
        self.halt_after = halt_after

    def handle_row(self, row):
        self.stats.received += 1
        if self.stats.received > self.halt_after:
            raise HaltError("destination says stop")
        self.stats.success += 1
        self.stats.substreams["default"] = self.stats.substreams.get("default", 0) + 1


class HaltingDestination(DestinationProvider):
    name = "halting"

    def __init__(self, halt_after):
        self.halt_after = halt_after
        self.opened = []

    def streams(self):
        return [StreamSpec(name="s", row_type=ANY_OBJECT_SCHEMA)]

    def create_output_stream(self, stream_name, credentials, sync_id, store,
                             full_refresh=False, restart=False, options=None):
        out = HaltingStream(self.halt_after)
        self.opened.append(out)
        return out


def test_halt_stops_feeding_and_preserves_state(spark):
    """A sink halt mid-sync stops delivery (sync.ts:551-553) but the rows
    already delivered still checkpoint their cursor."""
    spark.sql("select id from range(100)").createOrReplaceTempView("halt_src")
    dest = HaltingDestination(halt_after=10)
    store = InMemoryStore()
    sync = SyncDefinition(
        id="halt1",
        model=ModelDefinition(
            id="m",
            query="select id from halt_src where :cursor is null or id >= :cursor order by id",
            cursor="id",
        ),
        destination=dest,
        stream="s",
    )
    result = run_sync(spark, sync, store)
    assert result.stats.success == 10
    assert result.stats.substreams == {"default": 10}
    # delivered prefix was checkpointed: ids 0..9 done, halt on row 10
    assert store.get(["syncId=halt1", "$lastCursor=id"])["val"] == 10
    # only one stream was opened; no rows after the halt
    assert len(dest.opened) == 1
    assert dest.opened[0].stats.received == 11  # 10 ok + the halting row


def test_row_error_counts_failed_and_continues(spark):
    """A sink-declared per-row rejection (RowError) counts failed and the
    sync keeps going — one bad record must not abort a million-row run —
    while undeclared exceptions still abort without persisting the cursor
    (covered by test_failed_delivery_does_not_advance_cursor)."""
    from syncmaven_spark.runner import ModelDefinition, SyncDefinition, run_sync
    from syncmaven_spark.sinks.base import (
        DestinationProvider,
        OutputStream,
        RowError,
        StreamSpec,
    )
    from syncmaven_spark.state import InMemoryStore

    class PickyStream(OutputStream):
        def handle_row(self, row):
            self.stats.received += 1
            if row["id"] == 3:
                raise RowError("record rejected: id 3")
            self.stats.success += 1

    class PickyDestination(DestinationProvider):
        name = "picky"

        def streams(self):
            return [StreamSpec(name="s", row_type=None)]

        def create_output_stream(self, *a, **kw):
            return PickyStream()

    spark.sql("select id from range(10)").createOrReplaceTempView("picky_src")
    store = InMemoryStore()
    result = run_sync(
        spark,
        SyncDefinition(
            id="picky1",
            model=ModelDefinition(
                id="m",
                query="select id from picky_src where :cursor is null or id >= :cursor order by id",
                cursor="id",
            ),
            destination=PickyDestination(),
            stream="s",
        ),
        store,
    )
    assert result.stats.received == 10
    assert result.stats.success == 9
    assert result.stats.failed == 1
    # the sync completed, so the cursor advanced (reference semantics)
    assert store.get(["syncId=picky1", "$lastCursor=id"])["val"] == 9


def test_halt_clamp_survives_enrichment_retyped_cursor(spark):
    """halt_checkpoint compares pending-row cursor values against the
    tracker max; an enrichment that rewrites the cursor column to a
    different type (int -> str here) made compare_cursor raise TypeError
    and turned a graceful halt into an uncaught exception. Now it routes to
    the keep-last-checkpoint fallback (round-5 advice)."""
    from syncmaven_spark.enrich import Enrichment
    from syncmaven_spark.sinks.base import BatchingOutputStream

    class BufferThenHalt(BatchingOutputStream):
        def __init__(self):
            super().__init__(max_batch_size=4)
            self.flushes = 0

        def process_batch(self, rows):
            self.flushes += 1
            if self.flushes > 1:
                raise HaltError("destination says stop")
            self.stats.success += len(rows)

    class BufferingDestination(DestinationProvider):
        name = "buffer-halt"

        def streams(self):
            return [StreamSpec(name="s", row_type=ANY_OBJECT_SCHEMA)]

        def create_output_stream(self, *a, **kw):
            return BufferThenHalt()

    class RetypeCursor(Enrichment):
        def enrich(self, row):
            yield {**row, "id": f"id-{row['id']:04d}"}

    spark.sql("select id from range(10)").createOrReplaceTempView("halt_retype")
    store = InMemoryStore()
    sync = SyncDefinition(
        id="haltretype",
        model=ModelDefinition(
            id="m",
            query="select id from halt_retype where :cursor is null or id >= :cursor order by id",
            cursor="id",
        ),
        destination=BufferingDestination(),
        stream="s",
        enrichments=[RetypeCursor()],
    )
    result = run_sync(spark, sync, store)  # must not raise
    assert result.stats.failed >= 4  # the halted batch counted failed
    # the clamp could not compare str pending cursors with the int tracker
    # max -> keeps the last checkpointed cursor (none here: first flush
    # succeeded but no checkpoint ran before the halt)
    assert store.get(["syncId=haltretype", "$lastCursor=id"]) is None
