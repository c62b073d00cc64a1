"""Regression tests for the round-1 code-review findings."""

import datetime as dt

import pytest

from syncmaven_spark.runner import (
    ModelDefinition,
    SyncDefinition,
    run_sync,
    run_sync_distributed,
)
from syncmaven_spark.sinks.base import (
    ANY_OBJECT_SCHEMA,
    BatchingOutputStream,
    DestinationProvider,
    RateLimitError,
    RetryingClient,
    StreamSpec,
    parse_retry_after,
)
from syncmaven_spark.state import InMemoryStore


class FailingBatchDestination(DestinationProvider):
    """Batching sink whose flush fails — rows 1..N-1 buffered, row N explodes."""

    name = "failing-batch"

    def __init__(self, batch_size: int):
        self.batch_size = batch_size

    def streams(self):
        return [StreamSpec(name="s", row_type=ANY_OBJECT_SCHEMA)]

    def create_output_stream(self, *a, **kw):
        class S(BatchingOutputStream):
            def process_batch(self, rows):
                raise RuntimeError("flush failed")

        return S(self.batch_size)


def test_failed_delivery_does_not_advance_cursor(spark):
    """The critical review finding: a failed sync must NOT persist the
    cursor past undelivered rows (reference checkpoints only on success)."""
    spark.sql("select id from range(100)").createOrReplaceTempView("cur_src")
    store = InMemoryStore()
    sync = SyncDefinition(
        id="fail1",
        model=ModelDefinition(
            id="m",
            query="select id from cur_src where :cursor is null or id >= :cursor order by id",
            cursor="id",
        ),
        destination=FailingBatchDestination(batch_size=50),
        stream="s",
    )
    with pytest.raises(RuntimeError, match="flush failed"):
        run_sync(spark, sync, store)
    # nothing was delivered → no cursor may be persisted
    assert store.get(["syncId=fail1", "$lastCursor=id"]) is None


def test_sheets_buffer_survives_checkpoint_restarts(spark, tmp_path):
    from syncmaven_spark.sinks.google_sheets import GoogleSheetsDestination

    class FakeSheets:
        def __init__(self):
            self.writes = []

        def write_table(self, ss, sheet, header, rows):
            self.writes.append(list(rows))

    client = FakeSheets()
    spark.sql("select id from range(25)").createOrReplaceTempView("sheet_src")
    sync = SyncDefinition(
        id="sheets_ckpt",
        model=ModelDefinition(id="m", query="select id from sheet_src order by id"),
        destination=GoogleSheetsDestination(),
        stream="sheet",
        credentials={"_client": client, "spreadsheetId": "ss"},
        options={"checkpointEvery": 10},
    )
    result = run_sync(spark, sync, InMemoryStore())
    # clear-and-rewrite semantics: the final write holds ALL 25 rows, not
    # just the post-checkpoint tail; stats are not double-counted
    assert len(client.writes[-1]) == 25
    assert result.stats.success == 25
    assert result.stats.received == 25


def test_asof_join_null_in_matched_row_not_backfilled(spark):
    from syncmaven_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 3))], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 1), 5.0, "x"),
            (1, dt.datetime(2024, 1, 1, 0, 2), None, "y"),  # matched row, v NULL
        ],
        "k long, ts timestamp, v double, tag string",
    )
    row = asof_join(left, right, on="ts", by="k").first()
    # all values must come from the ts=0:02 row — no stale backfill from 0:01
    assert row.right_v is None
    assert row.right_tag == "y"


def test_distributed_string_cursor_single_chunk(spark, tmp_path):
    spark.sql(
        "select concat('k', lpad(cast(id as string), 3, '0')) as skey, id as v "
        "from range(40)"
    ).createOrReplaceTempView("str_cursor_src")
    sync = SyncDefinition(
        id="strcur",
        model=ModelDefinition(
            id="m",
            query="select * from str_cursor_src where :cursor is null or skey >= :cursor",
            cursor="skey",
        ),
        destination="file",
        stream="raw",
        credentials={"directory": str(tmp_path / "o")},
    )
    result = run_sync_distributed(spark, sync, InMemoryStore(), num_chunks=4)
    # string cursor → no double-cast chunking; every row delivered
    assert result.stats.success == 40
    assert result.last_cursor == "k039"


def test_distributed_zero_cursor_persisted(spark, tmp_path):
    spark.sql("select id - 5 as c, id as v from range(6)").createOrReplaceTempView(
        "zero_src"
    )  # cursor values -5..0 → max is 0 (falsy!)
    store = InMemoryStore()
    sync = SyncDefinition(
        id="zerocur",
        model=ModelDefinition(
            id="m",
            query="select * from zero_src where :cursor is null or c >= :cursor",
            cursor="c",
        ),
        destination="file",
        stream="raw",
        credentials={"directory": str(tmp_path / "z")},
    )
    result = run_sync_distributed(spark, sync, store, num_chunks=1)
    assert result.last_cursor == 0
    assert store.get(["syncId=zerocur", "$lastCursor=c"])["val"] == 0


def test_project_enrichments_compiled(tmp_path):
    from syncmaven_spark.enrich import HttpEnrichment
    from syncmaven_spark.project import read_project

    (tmp_path / "models").mkdir()
    (tmp_path / "syncs").mkdir()
    (tmp_path / "models" / "m.sql").write_text("select 1 as x")
    (tmp_path / "syncs" / "s.yaml").write_text(
        "model: m\ndestination:\n  package: file\n  credentials:\n"
        "    filename: /tmp/x.ndjson\nenrichment:\n  url: http://enrich.test/api\n"
    )
    project = read_project(str(tmp_path), env={})
    enrichments = project.syncs["s"].enrichments
    assert len(enrichments) == 1
    assert isinstance(enrichments[0], HttpEnrichment)
    assert enrichments[0].url == "http://enrich.test/api"


def test_parse_retry_after_variants():
    assert parse_retry_after("2") == 2000
    assert parse_retry_after("1.5") == 1500
    assert parse_retry_after(None) == 1000
    assert parse_retry_after("garbage") == 1000
    # HTTP-date in the past → clamped to 0 (retry immediately)
    assert parse_retry_after("Fri, 31 Dec 1999 23:59:59 GMT") == 0


def test_retrying_client_retries_rate_limit():
    class Flaky:
        def __init__(self):
            self.calls = 0

        def create(self, model, props):
            self.calls += 1
            if self.calls == 1:
                raise RateLimitError("429", retry_after_ms=1)
            return "id1"

    wrapped = RetryingClient(Flaky())
    assert wrapped.create("contacts", {}) == "id1"
    assert wrapped._client.calls == 2


def test_hubspot_429_transparent_retry():
    from syncmaven_spark.sinks.hubspot import HubspotDestination
    from tests.test_sinks_crm import FakeHubspot

    class RateLimitedHubspot(FakeHubspot):
        def __init__(self):
            super().__init__()
            self.limited_once = False

        def create(self, model, properties):
            if not self.limited_once:
                self.limited_once = True
                raise RateLimitError("429", retry_after_ms=1)
            return super().create(model, properties)

    client = RateLimitedHubspot()
    out = HubspotDestination().create_output_stream(
        "contacts", {"_client": client}, "s1", InMemoryStore(), options={}
    )
    out.handle_row({"id": 1, "email": "a@b.c"})
    assert out.stats.success == 1
    assert client.objects["contacts"]  # created after the transparent retry


def test_pivot_missing_cells_match_oracle(spark, tmp_path):
    """A user lacking one event type must yield 0 (not NULL) on both sides —
    the sf0.001/sf0.01 testdata never exercises this cell."""
    import duckdb

    from syncmaven_spark.oracle import compare
    from syncmaven_spark.queries import CATALOG

    rows = [
        (1, "click", 5.0), (1, "view", 2.0),  # user 1 has NO purchase
        (2, "click", 1.0), (2, "view", 3.0), (2, "purchase", 9.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("events")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')")
    qd = CATALOG["rel_pivot"]
    # _pivot mirrors the catalog's Spark side over the shadowing temp view
    result = compare("rel_pivot", _pivot(spark), con, qd.oracle)
    assert result.ok, result.detail
    # the previously-buggy cell: user 1 has no purchases → 0.0, not NULL
    row = {r.user_id: r.purchase for r in _pivot(spark).collect()}
    assert row[1] == 0.0


def _pivot(spark):
    from pyspark.sql import functions as F

    pivoted = (
        spark.table("events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.round(F.sum("value"), 2))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in ("click", "view", "purchase")],
    )
