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


def test_exact_dedup_null_position_is_distinct(spark):
    """Round-4 review: concat_ws skips NULLs, so ('x', NULL) and (NULL,
    'x') hashed identically and a distinct row was dropped as a duplicate;
    the JSON-struct key keeps them apart (and kills separator injection:
    ('a\\x1fb','c') vs ('a','b\\x1fc'))."""
    from syncmaven_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "x", None), (2, None, "x"), (3, "x", None),
         (4, "a\x1fb", "c"), (5, "a", "b\x1fc")],
        "id long, a string, b string",
    )
    kept = exact_dedup(df, ["a", "b"], "id").collect()
    by_id = {r.id: r.is_duplicate_group for r in kept}
    assert set(by_id) == {1, 2, 4, 5}  # only the true duplicate (3) drops
    assert by_id[1] is True and by_id[2] is False
    assert by_id[4] is False and by_id[5] is False


def test_salted_join_rejects_right_outer_and_spreads_duplicates(spark):
    """Round-4 review: right/full outer emits spurious NULL-padded rows
    under salting (reject); and byte-identical hot rows must spread over
    salts (a content-hash salt put them all on one)."""
    import pytest as _pytest

    from syncmaven_spark.operators.scale import salted_join

    left = spark.createDataFrame([("k", 1)] * 64, "key string, v int")
    right = spark.createDataFrame([("k", 9)], "key string, w int")
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "key", how="right")
    out = salted_join(left, right, "key", factor=8)
    assert out.count() == 64  # equivalent to the plain join
    salts = (
        left.withColumn("_s", __import__("pyspark").sql.functions.floor(
            __import__("pyspark").sql.functions.rand(0x5A17) * 8))
        .select("_s").distinct().count()
    )
    assert salts > 1  # identical rows land on multiple salts


def test_simhash_exact_signature_blocking(spark):
    """max_hamming=0 (single 64-bit chunk) no longer overflows the long
    literal; identical texts pair, near-identical do not."""
    from syncmaven_spark.operators.dedup import simhash_near_dups

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "an utterly different document about spark engines")],
        "doc_id long, text string",
    )
    pairs = simhash_near_dups(df, "text", "doc_id", max_hamming=0).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_asof_grouped_numeric_on_with_tolerance(spark):
    """Round-4 review: a Timedelta tolerance against a numeric ordering
    column crashed pd.merge_asof inside the UDF."""
    from syncmaven_spark.operators.joins import asof_join_grouped

    left = spark.createDataFrame(
        [("k", 10.0, "l1"), ("k", 20.0, "l2")], "k string, ts double, lv string"
    )
    right = spark.createDataFrame(
        [("k", 9.0, "r1"), ("k", 12.0, "r2")], "k string, ts double, rv string"
    )
    out = {r.lv: r.right_rv for r in asof_join_grouped(
        left, right, on="ts", by="k", tolerance_seconds=2.0
    ).collect()}
    assert out == {"l1": "r1", "l2": None}  # 20-12=8 > 2 → no match


def test_asof_join_ties_are_deterministic(spark):
    """Multiple right rows at the same (by, on): the carried match is the
    struct-max — stable across runs and partitionings."""
    from pyspark.sql import functions as F

    from syncmaven_spark.operators.joins import asof_join

    left = spark.createDataFrame([("k", 10, 1)], "k string, ts long, l int")
    right = spark.createDataFrame(
        [("k", 10, "a"), ("k", 10, "b")], "k string, ts long, val string"
    ).repartition(4)
    results = {
        asof_join(left, right, on="ts", by="k").collect()[0].right_val
        for _ in range(5)
    }
    assert results == {"b"}  # struct-max tie-break, every run


def test_empty_text_scores_zero_tokens(spark):
    """split('') returns [''] of size 1: empty/whitespace docs must count
    0 tokens and score 0 quality, not sneak through filters."""
    from syncmaven_spark.operators.text import quality_features, token_count

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real words here")], "doc_id long, text string"
    )
    toks = {r.doc_id: (r.n_tokens, r.n_bpe_tokens) for r in token_count(df).collect()}
    assert toks[1] == (0, 0) and toks[2] == (0, 0)
    assert toks[3][0] == 3
    q = {r.doc_id: (r.q_n_words, r.q_distinct_ratio, r.quality_score)
         for r in quality_features(df).collect()}
    assert q[1] == (0, 0.0, 0.0) and q[2] == (0, 0.0, 0.0)
    assert q[3][0] == 3 and q[3][2] > 0


def test_language_id_handles_punctuation_and_repeats(spark):
    """Stopwords adjacent to punctuation/newlines count, and adjacent
    repeats don't lose hits to the shared separating space."""
    from syncmaven_spark.operators.text import language_id

    df = spark.createDataFrame(
        [(1, "the\ncat sat on the mat."), (2, "the the the")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.score_en, r.lang_pred) for r in language_id(df).collect()}
    assert out[1][0] == 2 and out[1][1] == "en"
    assert out[2][0] == 3


def test_cursor_survives_non_utc_driver_host(tmp_path):
    """PySpark's non-Arrow driver conversion builds naive datetimes in the
    OS timezone, ignoring spark.sql.session.timeZone — on a UTC+X host the
    persisted timestamp cursor shifted by X hours and the next incremental
    run silently skipped rows. get_spark pins the PROCESS to UTC; this
    runs a sync in a subprocess that starts in America/New_York and
    asserts the persisted cursor equals the true UTC max."""
    import json
    import os
    import subprocess
    import sys

    import duckdb

    true_max = duckdb.sql(
        "select strftime(max(ts), '%Y-%m-%dT%H:%M:%S.%g') || 'Z' "
        "from '/root/testdata/sf0.001/events.parquet'"
    ).fetchone()[0]

    script = f"""
import sys; sys.path.insert(0, "/root/repo")
from syncmaven_spark import get_spark
from syncmaven_spark.session import load_tables
from syncmaven_spark.runner import ModelDefinition, SyncDefinition, run_sync
from syncmaven_spark.state import InMemoryStore
spark = get_spark(shuffle_partitions=2)
load_tables(spark, "/root/testdata/sf0.001")
store = InMemoryStore()
sync = SyncDefinition(
    id="tz", model=ModelDefinition(id="m",
        query="select event_id, ts from events where :cursor is null or ts >= :cursor",
        cursor="ts"),
    destination="file", stream="raw",
    credentials={{"filename": {str(tmp_path / 'o.ndjson')!r}}})
run_sync(spark, sync, store)
import json as j
print("CURSOR=" + j.dumps(store.get(["syncId=tz", "$lastCursor=ts"])))
"""
    env = dict(os.environ, TZ="America/New_York")
    out = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True,
        text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("CURSOR=")][0]
    stored = json.loads(line[len("CURSOR="):])
    assert stored["val"] == true_max, (stored, true_max)


def test_enrichment_generator_failure_drops_whole_row(spark):
    """A generator enrichment raising mid-iteration drops the SOURCE row's
    entire output (reference applyEnrichment catch) — the rows yielded
    before the error must not be delivered (they'd double up on
    restarts)."""
    from syncmaven_spark.enrich import enrich_dataframe

    class ExplodingEnrichment:
        def enrich(self, row):
            yield dict(row, part=1)
            if row["id"] == 2:
                raise RuntimeError("boom mid-expansion")
            yield dict(row, part=2)

    df = spark.createDataFrame([(1,), (2,), (3,)], "id long").withColumn(
        "part", __import__("pyspark").sql.functions.lit(0)
    )
    out = enrich_dataframe(df, lambda: ExplodingEnrichment()).collect()
    got = sorted((r.id, r.part) for r in out)
    # row 2 contributes NOTHING — not even its first yielded expansion
    assert got == [(1, 1), (1, 2), (3, 1), (3, 2)]


# ---------------------------------------------------------------------------
# Round-5 ADVICE fixes


def test_error_threshold_latched_at_fail_not_recomputed():
    """ADVICE r5: the reference evaluates the threshold ONLY inside fail().
    A sync sitting exactly at the boundary (20 errors / 80 successes) must
    keep running through further SUCCESSES — only another failure may trip
    it."""
    from syncmaven_spark.validate import ErrorThreshold

    t = ErrorThreshold()  # 0.2 / 100
    for _ in range(80):
        t.success()
    for _ in range(20):
        t.fail()
    assert not t.exceeded
    # successes past the boundary: ratio vs current totals would now be
    # 20/100 >= 0.2, but the reference never re-evaluates on success
    for _ in range(50):
        t.success()
        assert not t.exceeded, "success must never trip the threshold"
    t.fail()  # 21/150 < 0.2 — still fine
    assert not t.exceeded
    # drive errors up until a FAILURE trips it: at e errors, pre-total
    # 150 + (e - 21) + ... keep failing; eventually errors/pre >= 0.2
    while not t.exceeded:
        t.fail()
    assert t.errors / (t.total - 1) >= 0.2


def test_error_threshold_batched_fail_matches_sequential():
    from syncmaven_spark.validate import ErrorThreshold

    a, b = ErrorThreshold(), ErrorThreshold()
    a.success(80)
    b.success(80)
    a.fail(21)
    for _ in range(21):
        b.fail()
    assert a.exceeded == b.exceeded == True  # noqa: E712


def test_ndjson_distributed_scrubs_nested_nonfinite(spark, tmp_path):
    """ADVICE r5: NaN/Infinity inside struct/array/map fields must
    serialize as null (JSON.stringify semantics), not literal NaN."""
    import glob
    import json
    import math

    from pyspark.sql import functions as F

    from syncmaven_spark.sinks.file import write_ndjson_distributed

    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [
            (1, nan, {"a": nan, "b": 2.0}, [1.0, inf, 3.0], {"k": nan}, None),
            (2, 5.0, None, None, None, {"a": 1.5, "b": 1.0}),
        ],
        "id long, top double, s struct<a:double,b:double>, "
        "arr array<double>, m map<string,double>, s2 struct<a:double,b:double>",
    ).repartition(1)
    out = str(tmp_path / "nested")
    write_ndjson_distributed(df, out)
    lines = []
    for p in glob.glob(out + "/part-*"):
        with open(p) as f:
            lines += [json.loads(ln) for ln in f if ln.strip()]  # must PARSE
    rows = {r["id"]: r for r in lines}
    assert rows[1]["top"] is None
    assert rows[1]["s"] == {"a": None, "b": 2.0}
    assert rows[1]["arr"] == [1.0, None, 3.0]
    assert rows[1]["m"] == {"k": None}
    assert rows[1]["s2"] is None  # NULL struct stays NULL, not {a:null,...}
    assert rows[2]["top"] == 5.0 and rows[2]["s"] is None
    assert rows[2]["s2"] == {"a": 1.5, "b": 1.0}


def test_no_tzset_env_var_skips_process_tz_mutation(spark, monkeypatch):
    """ADVICE r5: embedders can opt out of the process-global TZ pin."""
    import os

    from syncmaven_spark.session import load_tables
    from tests.conftest import SF_SMOKE

    monkeypatch.setenv("SYNCMAVEN_SPARK_NO_TZSET", "1")
    # do NOT tzset() with this value — only the env mapping is probed
    monkeypatch.setenv("TZ", "America/New_York")
    load_tables(spark, SF_SMOKE, refresh=True)
    assert os.environ["TZ"] == "America/New_York", (
        "load_tables must not overwrite TZ when the opt-out is set"
    )
    # monkeypatch restores TZ=UTC on teardown; process tz was never re-set


def test_error_threshold_fail_zero_is_not_a_failure_event():
    """Round-5 review: fail(0) (an all-valid chunk) must not evaluate the
    gate — only a real failure may latch it."""
    from syncmaven_spark.validate import ErrorThreshold

    t = ErrorThreshold()
    t.success(49)
    t.fail(25)  # pre_total 73 < 100 — not exceeded
    assert not t.exceeded
    t.success(40)
    t.fail(0)  # all-valid chunk: errors=25, pre_total would be 113 -> 0.22
    assert not t.exceeded, "fail(0) must not latch the threshold"
    t.fail(4)  # a real failure re-evaluates: 29/117 >= 0.2 -> latches
    assert t.exceeded


def test_png_malformed_ihdr_raises_value_error_and_resize_falls_back(spark):
    """Round-5 review: a wrong-length IHDR raised struct.error, escaping
    the resizer's malformed-blob catch and killing the whole task."""
    import binascii
    import struct as _struct

    import pytest as _pytest

    from syncmaven_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_png,
        resize_images,
    )

    def chunk(ctype, data):
        body = ctype + data
        return _struct.pack(">I", len(data)) + body + _struct.pack(
            ">I", binascii.crc32(body) & 0xFFFFFFFF)

    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", b"\x00" * 10)  # 10-byte IHDR payload, not 13
           + chunk(b"IDAT", b"x")
           + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="IHDR"):
        decode_png(bad)
    # one bad blob must not abort a corpus-wide resize pass
    df = spark.createDataFrame(
        [(0, bad, {"media_type": "image", "format": "png", "width": 1,
                   "height": 1, "duration_ms": None})], MEDIA_SCHEMA)
    out = resize_images(df, width=2, height=2).collect()[0]
    assert bytes(out.content).startswith(b"RESIZED:2x2:")


def test_png_inflate_bounded_to_declared_size():
    """Round-5 review: the IDAT inflate is capped at the declared pixel
    size, so a decompression bomb cannot allocate past it (trailing
    inflated bytes beyond the declared size are ignored, as before)."""
    import binascii
    import struct as _struct
    import zlib

    import numpy as np

    from syncmaven_spark.operators.multimodal import decode_png

    def chunk(ctype, data):
        body = ctype + data
        return _struct.pack(">I", len(data)) + body + _struct.pack(
            ">I", binascii.crc32(body) & 0xFFFFFFFF)

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(2))
    # append 64 MB of zeros INSIDE the compressed stream: decode must
    # still succeed, reading only the declared 2x2 image
    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw + b"\x00" * (64 << 20)))
            + chunk(b"IEND", b""))
    assert len(blob) < 200_000  # the bomb compresses tiny
    assert (decode_png(blob) == px).all()


def test_sheets_append_rejects_nested_values_like_buffered_mode():
    from syncmaven_spark.sinks.google_sheets import GoogleSheetsDestination
    from syncmaven_spark.state import InMemoryStore

    class C:
        def write_table(self, *a): ...
        def append_rows(self, *a): ...

    out = GoogleSheetsDestination().create_output_stream(
        "sheet", {"_client": C(), "spreadsheetId": "s"}, "sx",
        InMemoryStore(),
        options={"streamingAppend": True, "appendBatchSize": 1},
    )
    with pytest.raises(ValueError, match="Invalid value"):
        out.handle_row({"a": {"nested": 1}})


def test_asof_join_null_keys_never_match(spark):
    """Round-5 operator review: NULL by-keys matched each other through the
    window partitionBy, diverging from SQL ASOF (NULL = NULL is never true).
    Null-keyed/null-ts LEFT rows must pass through unmatched; null-keyed or
    null-ts RIGHT rows must never be carried into any match."""
    from syncmaven_spark.operators.joins import asof_join, asof_join_grouped

    left = spark.createDataFrame(
        [(None, 10.0), ("u1", 10.0), ("u1", None)],
        "user_id string, ts double",
    )
    right = spark.createDataFrame(
        [(None, 5.0, 99.0), ("u1", 5.0, 7.0), ("u1", None, 42.0)],
        "user_id string, ts double, value double",
    )
    for fn in (asof_join, asof_join_grouped):
        rows = {
            (r["user_id"], r["ts"]): r["right_value"]
            for r in fn(left, right, on="ts", by="user_id").collect()
        }
        assert len(rows) == 3, fn.__name__
        # null key: no match even though a null-keyed right row exists
        assert rows[(None, 10.0)] is None, fn.__name__
        # normal match unaffected; the null-ts right row (42.0) never wins
        assert rows[("u1", 10.0)] == 7.0, fn.__name__
        # null left ts: r.ts <= NULL is unknown -> unmatched
        assert rows[("u1", None)] is None, fn.__name__


def test_asof_join_rejects_non_backward_direction(spark):
    from syncmaven_spark.operators.joins import asof_join

    df = spark.createDataFrame([("u", 1.0)], "user_id string, ts double")
    with pytest.raises(ValueError, match="backward"):
        asof_join(df, df, on="ts", by="user_id", direction="forward")


def test_audio_features_short_clip_has_no_nan():
    """Round-5 operator review: a valid 0- or 1-frame WAV produced an
    all-NaN feature vector (np.mean of an empty diff) with decode_ok=True —
    and NaN sorts above every double in Spark, so the clip became a
    'near-duplicate' of the whole corpus downstream."""
    import io
    import wave

    import numpy as np

    from syncmaven_spark.operators.multimodal import _audio_features, decode_wav

    for n_frames in (0, 1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(b"\x01\x00" * n_frames)
        samples, rate = decode_wav(buf.getvalue())
        feats = _audio_features(samples, rate, 16)
        assert np.isfinite(feats).all(), f"NaN/inf at n_frames={n_frames}"


def test_cosine_topk_disjoint_id_space_opt_out(spark):
    """Round-5 operator review: the implicit q_id != n_id self-exclusion
    silently dropped a corpus row whose id collides with a query id from a
    SEPARATE table; exclude_self=False must retrieve it."""
    from syncmaven_spark.operators import cosine_topk_bruteforce, cosine_topk_ivf

    corpus = spark.createDataFrame(
        [(5, [1.0, 0.0]), (6, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(5, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    top_default = cosine_topk_bruteforce(corpus, queries, k=1).collect()
    assert [r["n_id"] for r in top_default] == [6]  # documented default
    top = cosine_topk_bruteforce(corpus, queries, k=1, exclude_self=False).collect()
    assert [r["n_id"] for r in top] == [5]
    import numpy as np

    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    ivf = cosine_topk_ivf(
        corpus, queries, k=1, centroids=cents, n_probe=2, exclude_self=False
    ).collect()
    assert [r["n_id"] for r in ivf] == [5]


def test_train_centroids_sample_is_spread_not_prefix(spark):
    """Round-5 operator review: the order_col 'reproducible sample' took an
    ordered PREFIX — on a corpus whose ids correlate with embedding
    structure the 2-centroid fit collapsed onto the head cluster. The
    hash-ordered sample must cover both clusters."""
    import numpy as np

    from syncmaven_spark.operators.similarity import train_centroids

    rows = [(i, [10.0, 0.0]) for i in range(100)] + [
        (100 + i, [0.0, 10.0]) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_centroids(
        df, n_centroids=2, sample_size=50, order_col="vec_id"
    )
    # each cluster axis must own one centroid; a prefix sample puts both
    # centroids on the x-axis cluster
    axis = {int(np.argmax(np.abs(c))) for c in cents}
    assert axis == {0, 1}, cents


def test_cc_loop_confs_isolated_from_caller_session(spark, tmp_path):
    """Round-5 module review: the small-round conf tuning (AQE off,
    shuffle.partitions ~ edges/2M) used to mutate the CALLER's session for
    the duration of each round, so a query planned concurrently by another
    thread silently ran with 1-3 shuffle partitions and no AQE. The loop
    now runs on a private session; the caller's confs must be untouched at
    every point the loop yields control, and the result must belong to the
    caller's session."""
    from syncmaven_spark.operators.graph import (
        _loop_session,
        connected_components,
    )

    loop = _loop_session(spark)
    assert loop is not spark  # classic mode: a genuinely private session
    # the confs the rounds depend on are copied from the caller
    for k in ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions",
              "spark.sql.session.timeZone"):
        assert loop.conf.get(k) == spark.conf.get(k)

    orig = {
        k: spark.conf.get(k)
        for k in ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    }
    # chain forces several distributed rounds (local finish disabled)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    out = connected_components(
        edges, work_dir=str(tmp_path), local_finish_edges=0
    )
    rows = {r["v"]: r["component"] for r in out.collect()}
    assert rows == {i: 0 for i in range(41)}
    assert out.sparkSession is spark
    for k, v in orig.items():
        assert spark.conf.get(k) == v


def test_dedup_cluster_assignments_forwards_cc_kwargs(spark, tmp_path):
    """Round-5 module review: the pipeline entry point hardcoded
    connected_components defaults, so a multi-node caller could not point
    work_dir at shared storage (the module's own cluster requirement)."""
    from syncmaven_spark.operators.graph import dedup_cluster_assignments

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(31)], "id long")
    out = dedup_cluster_assignments(
        pairs, ids, work_dir=str(tmp_path), local_finish_edges=0
    )
    assert out.filter("is_canonical").count() == 1
    # the distributed loop actually used the supplied directory
    assert (tmp_path / "labels").exists()


def test_salted_ops_reject_preexisting_salt_column(spark):
    """Round-5 module review: an input already carrying '_salt' was
    silently overwritten (and then dropped / mis-aggregated)."""
    from syncmaven_spark.operators.scale import salted_aggregate, salted_join

    df = spark.createDataFrame([(1, 9)], "k long, _salt long")
    clean = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(df, clean, "k")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(clean, df, "k")
    with pytest.raises(ValueError, match="_salt"):
        salted_aggregate(df, ["k"], {"s": ("sum", "_salt")})


def test_tfidf_cache_lives_in_bounded_pool(spark):
    """Round-5 module review: text_tfidf_topterms kept a bespoke module
    global whose bytes counted toward the pool budget but which the pool
    could never evict, and whose eager unpersist yanked the cache from a
    still-pending prior result. It now goes through persist_scoped, which
    dedups re-invocations by plan equivalence."""
    import syncmaven_spark.queries as q
    from syncmaven_spark.operators.cache import _LIVE_CACHES

    assert not hasattr(q, "_TFIDF_CACHE")
    sf = "/root/testdata/sf0.001"
    q.text_tfidf_topterms(spark, sf).limit(1).collect()
    n_after_first = len(_LIVE_CACHES)
    q.text_tfidf_topterms(spark, sf).limit(1).collect()
    # plan-equivalent re-invocation refreshes, never appends a duplicate
    assert len(_LIVE_CACHES) == n_after_first


class _FlushFailBatchDestination(DestinationProvider):
    """Batching sink whose flush raises — for halt/RowError batch contracts."""

    name = "flush-fail"

    def __init__(self, exc_factory, batch_size=3):
        self.exc_factory = exc_factory
        self.batch_size = batch_size
        self.opened = []

    def streams(self):
        return [StreamSpec("raw", ANY_OBJECT_SCHEMA)]

    def create_output_stream(self, stream_name, credentials, sync_id, store,
                             full_refresh=False, restart=False, options=None):
        provider = self

        class S(BatchingOutputStream):
            def process_batch(self, rows):
                raise provider.exc_factory()

        out = S(max_batch_size=self.batch_size)
        self.opened.append(out)
        return out


def test_halt_during_batch_flush_clamps_cursor_to_undelivered(spark):
    """Round-5 core review: a HaltError from a batching sink's flush was
    treated as a graceful halt and checkpoint(final=True) persisted the
    tracker's observed max — the cursor of the last row in the FAILED
    batch. With the inclusive >= predicate only the boundary row would be
    re-sent; the rest of the batch was lost forever. The halt checkpoint
    must clamp to the smallest undelivered cursor."""
    from syncmaven_spark.sinks.base import HaltError

    spark.sql("select id from range(5)").createOrReplaceTempView("haltb_src")
    dest = _FlushFailBatchDestination(lambda: HaltError("stop"), batch_size=3)
    store = InMemoryStore()
    sync = SyncDefinition(
        id="haltb",
        model=ModelDefinition(
            id="m",
            query="select id from haltb_src where :cursor is null "
                  "or id >= :cursor order by id",
            cursor="id",
        ),
        destination=dest,
        stream="raw",
        credentials={},
    )
    result = run_sync(spark, sync, store)
    # rows 0,1,2 were popped into the failed flush — none delivered; the
    # persisted cursor must be 0 (min undelivered), NOT 2 (observed max)
    assert store.get(["syncId=haltb", "$lastCursor=id"])["val"] == 0
    assert result.stats.failed == 3


def test_rowerror_from_process_batch_aborts_without_cursor(spark):
    """Round-5 core review: RowError escaping process_batch cannot name
    WHICH row failed; 'continue past one row' semantics silently dropped
    the whole popped batch and advanced the cursor over it. It must abort
    as an undeclared batch failure with the cursor untouched."""
    from syncmaven_spark.sinks.base import RowError

    spark.sql("select id from range(5)").createOrReplaceTempView("rowb_src")
    dest = _FlushFailBatchDestination(lambda: RowError("bad row"), batch_size=3)
    store = InMemoryStore()
    sync = SyncDefinition(
        id="rowb",
        model=ModelDefinition(
            id="m",
            query="select id from rowb_src where :cursor is null "
                  "or id >= :cursor order by id",
            cursor="id",
        ),
        destination=dest,
        stream="raw",
        credentials={},
    )
    with pytest.raises(RuntimeError, match="per-row"):
        run_sync(spark, sync, store)
    assert store.get(["syncId=rowb", "$lastCursor=id"]) is None


def test_param_followed_by_pg_cast_is_recognized():
    """Round-5 core review: the '::'-cast guard also skipped a parameter
    FOLLOWED by a cast — ':cursor::timestamptz' discovered no parameters,
    so the idiomatic postgres cursor model failed the :cursor guard."""
    from syncmaven_spark.sql import SqlQuery

    q = SqlQuery(
        "select * from t where ts >= :cursor::timestamptz", "postgres"
    )
    assert q.named_parameters() == ["cursor"]
    assert "::timestamptz" in q.compile({"cursor": 5})
    assert ":cursor" not in q.compile({"cursor": 5})
    # the cast-colon guard itself still holds
    assert SqlQuery("select id::text from t", "postgres").named_parameters() == []


def test_at_params_excluded_on_conflicting_dialects():
    """Round-5 core review: '@name' was a parameter in EVERY dialect, so
    MySQL '@@sql_mode', Snowflake '@mystage', and Postgres '@ x' compiled
    their '@tokens' to NULL — broken SQL pushed to the warehouse."""
    from syncmaven_spark.sql import SqlQuery

    q = SqlQuery("select @@sql_mode as m from t where id >= :c", "mysql")
    assert q.named_parameters() == ["c"]
    assert "@@sql_mode" in q.compile({"c": 1})
    q2 = SqlQuery("select * from @mystage where id >= :c", "snowflake")
    assert q2.named_parameters() == ["c"]
    assert "@mystage" in q2.compile({"c": 1})
    # BigQuery and Spark keep the @-form
    assert SqlQuery(
        "select * from t where id >= @c", "bigquery"
    ).named_parameters() == ["c"]


def test_decimal_cursor_roundtrip_and_literal():
    """Round-5 core review: Decimal cursors (an explicitly chunkable type)
    crashed json.dumps at checkpoint and encode_literal on reload."""
    import decimal

    from syncmaven_spark.cursor import deserialize_cursor, serialize_cursor
    from syncmaven_spark.sql import encode_literal

    import json as _json

    v = decimal.Decimal("12345.6789")
    stored = serialize_cursor(v)
    _json.dumps(stored)  # state stores persist via json
    assert deserialize_cursor(stored) == v
    assert encode_literal(v, "postgres") == "12345.6789"
    assert encode_literal(decimal.Decimal("1E+2"), "spark") == "100"


def test_nonfinite_cursor_and_literal_fail_fast():
    """Round-5 core review: encode_literal(float('nan')) emitted the bare
    text 'nan' (an unresolved column reference in Spark), wedging every
    subsequent incremental run; json.dumps also wrote the non-standard
    'NaN' token into the state store."""
    from syncmaven_spark.cursor import CursorError, serialize_cursor
    from syncmaven_spark.sql import SqlError, encode_literal

    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(SqlError, match="non-finite"):
            encode_literal(bad, "spark")
        with pytest.raises(CursorError, match="finite"):
            serialize_cursor(bad)


def test_vectorized_validation_nan_matches_driver_path(spark):
    """Round-5 core review: to_json rendered a NaN double as the STRING
    "NaN", so with_validation_column rejected rows the driver-path
    RowValidator (NaN -> null) accepted — the two documented execution
    paths disagreed on the same sync."""
    from syncmaven_spark.validate import RowValidator, with_validation_column

    schema = {
        "type": "object",
        "properties": {"a": {"type": ["number", "null"]}},
    }
    df = spark.createDataFrame(
        [(float("nan"),), (1.0,)], "a double"
    )
    got = {
        r["a"]: r["_valid"]
        for r in with_validation_column(df, schema).collect()
    }
    assert all(got.values()), got
    # parity: the driver path agrees
    assert RowValidator(schema).is_valid({"a": float("nan")})


def test_enrich_dataframe_hands_datetime_objects_to_enrichment(spark):
    """Round-5 core review: distributed enrichments received temporal
    values as ISO STRINGS (JSON boundary) while the parity path hands
    datetime objects — an enrichment using row['ts'].year raised on every
    row and the rows were silently dropped."""
    import datetime as dt

    from syncmaven_spark.enrich import CallableEnrichment, enrich_dataframe

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1, 12, 0, 0), dt.date(2024, 3, 1))],
        "id long, ts timestamp, d date",
    )

    def fn(row):
        # the parity-path contract: temporal columns are objects
        assert isinstance(row["ts"], dt.datetime), type(row["ts"])
        assert isinstance(row["d"], dt.date), type(row["d"])
        assert row["ts"].year == 2024
        return [row]

    out = enrich_dataframe(df, lambda: CallableEnrichment(fn)).collect()
    assert len(out) == 1
    assert out[0]["ts"] == dt.datetime(2024, 3, 1, 12, 0, 0)
    assert out[0]["d"] == dt.date(2024, 3, 1)


def test_intercom_epoch_seconds_naive_string_is_utc():
    """Round-5 sink review: a tz-less ISO STRING went through naive
    .timestamp() (host-local tz) while the datetime branch forces UTC —
    the same wall-clock shifted per deployment machine."""
    import datetime as dt
    import os
    import time

    from syncmaven_spark.sinks.intercom import to_epoch_seconds

    old = os.environ.get("TZ")
    os.environ["TZ"] = "Asia/Karachi"  # UTC+05, no DST
    time.tzset()
    try:
        got = to_epoch_seconds("2024-05-01T10:00:00")
        # naive datetime branch (already UTC-forced) must agree
        assert got == to_epoch_seconds(dt.datetime(2024, 5, 1, 10, 0, 0))
        assert got == 1714557600  # 2024-05-01T10:00:00Z
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        time.tzset()


def test_intercom_company_lookup_url_encodes_id():
    """Round-5 sink review: company_id interpolated raw into the query
    string — 'acme&dept=1' matched company 'acme' plus a stray param."""
    from urllib.parse import parse_qs, urlsplit

    from syncmaven_spark.sinks.intercom import IntercomDestination
    from syncmaven_spark.state import InMemoryStore

    class FakeIntercom:
        def __init__(self):
            self.gets = []

        def get(self, path):
            self.gets.append(path)
            return {"id": "ic-1"}

        def post(self, path, body):
            return {"id": "ic-c1"}

    client = FakeIntercom()
    out = IntercomDestination().create_output_stream(
        "contacts", {"_client": client}, "s1", InMemoryStore()
    )
    out.handle_row(
        {"external_id": "u1", "email": "a@b.c", "company_ids": ["acme&dept=1"]}
    )
    lookup = [g for g in client.gets if g.startswith("/companies?")]
    assert lookup, client.gets
    q = parse_qs(urlsplit(lookup[0]).query)
    assert q == {"company_id": ["acme&dept=1"]}, lookup


def test_ads_clients_map_429_to_rate_limit_error():
    """Round-5 sink review: facebook/twitter REST clients raised a bare
    HTTPError on 429, so the flush-layer rate-limit retry never engaged
    and throttling aborted the sync."""
    from syncmaven_spark.sinks.base import RateLimitError
    from syncmaven_spark.sinks.facebook_ads import RestFacebookClient
    from syncmaven_spark.sinks.twitter_ads import RestTwitterClient

    class Resp:
        status_code = 429
        headers = {"Retry-After": "2"}

    class Sess:
        def request(self, *a, **k):
            return Resp()

    fb = RestFacebookClient.__new__(RestFacebookClient)
    fb._s = Sess()
    fb.base, fb.account_id = "https://x", "act_1"
    with pytest.raises(RateLimitError) as ei:
        fb._req("GET", "https://x/y")
    assert ei.value.retry_after_ms == 2000

    tw = RestTwitterClient.__new__(RestTwitterClient)
    tw._s = Sess()
    tw.base, tw.account_id = "https://x", "1"
    with pytest.raises(RateLimitError):
        tw._req("GET", "/y")


def test_http_json_without_row_macro_warns(caplog):
    """Round-5 sink review: format='json' with no [RESULT_*] macro sends a
    constant body for every row — success counted, data dropped. Reference
    parity keeps the behavior; the config mistake must at least be loud."""
    import logging

    from syncmaven_spark.sinks.http import _HttpBase

    with caplog.at_level(logging.WARNING, "syncmaven_spark.sinks.http"):
        _HttpBase({"url": "https://h.example", "_transport": lambda *a: None})
    assert any("no [RESULT_ROWS]" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, "syncmaven_spark.sinks.http"):
        _HttpBase(
            {
                "url": "https://h.example",
                "body": '{"events": "[RESULT_ROWS]"}',
                "_transport": lambda *a: None,
            }
        )
    assert not caplog.records


def test_strip_userinfo_raw_at_in_password():
    """Round-5 diff review: the authority was split at the FIRST '@', so a
    raw '@' inside the password corrupted both password and host. libpq /
    node-postgres split at the LAST '@' of the authority."""
    from syncmaven_spark.sources.registry import _strip_userinfo

    url, user, password = _strip_userinfo("postgres://alice:pa@ss@db:5432/app")
    assert (user, password) == ("alice", "pa@ss")
    assert url == "postgres://db:5432/app"
    # percent-encoded form still works, and no-userinfo URLs pass through
    url2, u2, p2 = _strip_userinfo("postgres://alice:p%40ss@db/app")
    assert (u2, p2) == ("alice", "p@ss") and url2 == "postgres://db/app"
    assert _strip_userinfo("postgres://db/app") == ("postgres://db/app", None, None)


def test_halt_clamp_skips_save_when_cursor_not_in_sink_rows(spark):
    """Round-5 diff review: the halt-time cursor clamp probed SINK rows for
    the cursor column; a shape-changing enrichment drops it, making the
    clamp a silent no-op that re-opened the skip-past-failed-batch hole.
    With unknown pending cursors the final save must be skipped entirely."""
    from syncmaven_spark.enrich import CallableEnrichment
    from syncmaven_spark.sinks.base import HaltError

    spark.sql("select id from range(5)").createOrReplaceTempView("haltr_src")
    dest = _FlushFailBatchDestination(lambda: HaltError("stop"), batch_size=3)
    store = InMemoryStore()
    sync = SyncDefinition(
        id="haltr",
        model=ModelDefinition(
            id="m",
            query="select id from haltr_src where :cursor is null "
                  "or id >= :cursor order by id",
            cursor="id",
        ),
        destination=dest,
        stream="raw",
        credentials={},
        enrichments=[CallableEnrichment(lambda r: [{"email": f"u{r['id']}@x"}])],
    )
    run_sync(spark, sync, store)
    # the failed batch rows carry no 'id' -> no provably-safe cursor ->
    # nothing persisted (next run re-sends everything; nothing lost)
    assert store.get(["syncId=haltr", "$lastCursor=id"]) is None


def test_sheets_append_tracks_undelivered_rows():
    """Round-5 diff review: the streamingAppend sheets stream re-implemented
    batching without the undelivered_rows() halt contract — a HaltError
    from the Sheets API let the cursor advance past rows that never reached
    the sheet."""
    from syncmaven_spark.sinks.base import HaltError
    from syncmaven_spark.sinks.google_sheets import GoogleSheetsAppendStream

    class FakeSheets:
        def __init__(self):
            self.tables = []
            self.fail_append = True

        def write_table(self, sid, sheet, header, rows):
            self.tables.append(("write", header, rows))

        def append_rows(self, sid, sheet, rows):
            if self.fail_append:
                raise HaltError("sheets says stop")
            self.tables.append(("append", rows))

    client = FakeSheets()
    out = GoogleSheetsAppendStream(client, "sid", "s1", batch_size=2)
    out.handle_row({"a": 1})
    out.handle_row({"a": 2})  # first flush: write_table, succeeds
    out.handle_row({"a": 3})
    with pytest.raises(HaltError):
        out.handle_row({"a": 4})  # second flush: append fails
    # the failed batch is known-undelivered; stats count it failed
    assert [r["a"] for r in out.undelivered_rows()] == [3, 4]
    assert out.stats.failed == 2 and out.stats.success == 2
    out.handle_row({"a": 5})
    assert [r["a"] for r in out.undelivered_rows()] == [3, 4, 5]


def test_load_tables_skips_stray_unreadable_parquet(spark, tmp_path):
    """Round-5 diff review: registering every *.parquet stem made ONE
    stray/corrupt artifact abort every query over the directory. Non-
    benchmark stems now skip with a warning; canonical tables still fail
    hard."""
    import os

    from syncmaven_spark.session import TABLE_NAMES, load_tables

    src = "/root/testdata/sf0.001"
    for name in os.listdir(src):
        if name.endswith(".parquet"):
            os.link(os.path.join(src, name), str(tmp_path / name))
    (tmp_path / "tmp_export.parquet").write_bytes(b"not a parquet file")

    tables = load_tables(spark, str(tmp_path), register_views=False)
    assert set(TABLE_NAMES) <= set(tables)
    assert "tmp_export" not in tables


def test_decimal_cursor_sync_end_to_end(spark, tmp_path):
    """Round-5 core review follow-up: a DECIMAL cursor column must work
    through the WHOLE loop — checkpoint into a persistent (json-backed)
    store, reload, literal-encode into the next run's predicate — not just
    the codec unit tests. Two runs: the second re-emits only the inclusive
    boundary row."""
    import decimal

    from syncmaven_spark.state import create_store

    spark.sql(
        "select cast(id as decimal(12,2)) as amount, id from range(5)"
    ).createOrReplaceTempView("dec_src")
    store = create_store(str(tmp_path / ".state"))
    sync = SyncDefinition(
        id="dec1",
        model=ModelDefinition(
            id="m",
            query="select amount, id from dec_src where :cursor is null "
                  "or amount >= :cursor order by amount",
            cursor="amount",
        ),
        destination="file",
        stream="raw",
        credentials={"filename": str(tmp_path / "out.ndjson")},
    )
    r1 = run_sync(spark, sync, store)
    assert r1.stats.success == 5
    assert r1.last_cursor == decimal.Decimal("4.00")
    r2 = run_sync(spark, sync, store)
    # inclusive >= boundary: exactly the max row re-emitted
    assert r2.stats.success == 1


def test_binary_column_sync_end_to_end(spark, tmp_path):
    """Round-5 follow-up to the Decimal crash: Spark hands BinaryType
    columns to Python as BYTEARRAY (not bytes), which RowJSONEncoder's
    bytes branch missed — any sync selecting a binary column crashed the
    driver-path validator on the first row."""
    import json

    spark.sql(
        "select id, cast(concat('blob-', id) as binary) as payload "
        "from range(3)"
    ).createOrReplaceTempView("bin_src")
    store = InMemoryStore()
    sync = SyncDefinition(
        id="bin1",
        model=ModelDefinition(
            id="m",
            query="select id, payload from bin_src where :cursor is null "
                  "or id >= :cursor order by id",
            cursor="id",
        ),
        destination="file",
        stream="raw",
        credentials={"filename": str(tmp_path / "out.ndjson")},
    )
    result = run_sync(spark, sync, store)
    assert result.stats.success == 3
    lines = [json.loads(ln) for ln in
             (tmp_path / "out.ndjson").read_text().splitlines()]
    assert [r["payload"] for r in lines] == ["blob-0", "blob-1", "blob-2"]


def test_halt_clamp_then_resume_delivers_everything(spark, tmp_path):
    """The recovery half of the halt contract: after a batching sink halts
    mid-flush (cursor clamped to the undelivered minimum), a re-run with a
    healthy sink must deliver every undelivered row — the only acceptable
    duplication is the inclusive >= boundary overlap."""
    from syncmaven_spark.sinks.base import (
        ANY_OBJECT_SCHEMA,
        BatchingOutputStream,
        DestinationProvider,
        HaltError,
        StreamSpec,
    )

    class FlakyBatchDestination(DestinationProvider):
        name = "flaky-batch"

        def __init__(self):
            self.fail_next_flush = True
            self.delivered: list[int] = []

        def streams(self):
            return [StreamSpec("raw", ANY_OBJECT_SCHEMA)]

        def create_output_stream(self, stream_name, credentials, sync_id,
                                 store, full_refresh=False, restart=False,
                                 options=None):
            provider = self

            class S(BatchingOutputStream):
                def process_batch(self, rows):
                    if provider.fail_next_flush:
                        provider.fail_next_flush = False
                        raise HaltError("transient outage")
                    provider.delivered.extend(r["id"] for r in rows)
                    self.stats.success += len(rows)

            return S(max_batch_size=3)

    spark.sql("select id from range(7)").createOrReplaceTempView("flaky_src")
    dest = FlakyBatchDestination()
    store = InMemoryStore()
    sync = SyncDefinition(
        id="flaky",
        model=ModelDefinition(
            id="m",
            query="select id from flaky_src where :cursor is null "
                  "or id >= :cursor order by id",
            cursor="id",
        ),
        destination=dest,
        stream="raw",
        credentials={},
    )
    r1 = run_sync(spark, sync, store)
    assert dest.delivered == []  # first flush halted; nothing delivered
    assert store.get(["syncId=flaky", "$lastCursor=id"])["val"] == 0
    r2 = run_sync(spark, sync, store)
    # re-run from the clamped cursor: ALL rows delivered, no gaps
    assert sorted(dest.delivered) == [0, 1, 2, 3, 4, 5, 6]
    assert r2.stats.success == 7


def test_non_latin_corpus_is_not_collapsed_by_dedup(spark):
    """Round-5 max review (worst finding): the ASCII-only \\w tokenizer
    deleted every CJK/Cyrillic character, so ALL such docs shingled to ['']
    and were reported as mutual jaccard-1.0 duplicates — running the
    production dedup recipe on a Chinese corpus deleted it down to one row.
    Distinct non-Latin docs must NOT pair; identical ones still must."""
    from syncmaven_spark.operators.dedup import (
        minhash_verified_pairs,
        simhash,
    )

    df = spark.createDataFrame(
        [
            (1, "今天天气很好 我们去公园 散步吧 好不好 朋友们"),
            (2, "完全不同的文本 讲的是机器学习 和分布式系统 的设计"),
            (3, "привет мир это совершенно другой текст на русском"),
            (4, "今天天气很好 我们去公园 散步吧 好不好 朋友们"),  # copy of 1
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_verified_pairs(
            df, "text", "doc_id", threshold=0.8, max_bucket_size=None
        ).collect()
    }
    assert pairs == {(1, 4)}, pairs
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(df, "text", "doc_id").collect()}
    assert sigs[1] == sigs[4]
    assert len({sigs[1], sigs[2], sigs[3]}) == 3  # distinct docs, distinct sigs


def test_null_and_empty_text_never_pair(spark):
    """Round-5 max review: NULL text became the shingle [''] for k>=2, so
    NULL-text docs (failed extractions) paired with each other and with
    empty docs at jaccard 1.0."""
    from syncmaven_spark.operators.dedup import (
        minhash_verified_pairs,
        ngram_jaccard_pairs,
        simhash_near_dups,
    )

    df = spark.createDataFrame(
        [(1, None, "en"), (2, None, "en"), (3, "", "en"), (4, "?! ...", "en"),
         (5, "real words here", "en")],
        ["doc_id", "text", "lang"],
    )
    assert minhash_verified_pairs(df, "text", "doc_id", threshold=0.8).count() == 0
    assert ngram_jaccard_pairs(
        df, "text", "doc_id", ["lang"], threshold=0.5, shingle_k=1
    ).count() == 0
    assert simhash_near_dups(df, "text", "doc_id", max_hamming=8).count() == 0


def test_exact_dedup_keeps_all_null_id_groups(spark):
    """Round-5 max review: min(id) skips NULLs and the join-back never
    matches one, so a content group whose ids were all NULL silently
    vanished — unique content lost with no error."""
    from syncmaven_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(None, "unique content"), (7, "other content"), (9, "other content"),
         (None, "more unique")],
        "id long, text string",
    )
    out = {r["text"]: (r["id"], r["is_duplicate_group"])
           for r in exact_dedup(df, ["text"], "id").collect()}
    assert out["unique content"] == (None, False)
    assert out["more unique"] == (None, False)
    assert out["other content"] == (7, True)  # lowest non-null id kept


def test_simhash_bucket_cap_bounds_degenerate_buckets(spark):
    """Round-5 max review: identical-signature clusters drove an uncapped
    O(b^2) candidate join per chunk; the default cap bounds it the same way
    minhash_lsh_candidates' cap does (None restores exact semantics)."""
    from syncmaven_spark.operators.dedup import simhash_near_dups

    n, cap = 12, 5
    df = spark.createDataFrame(
        [(i, "same boilerplate text everywhere") for i in range(n)],
        ["doc_id", "text"],
    )
    capped = simhash_near_dups(
        df, "text", "doc_id", max_hamming=3, max_bucket_size=cap
    ).collect()
    assert len(capped) == cap * (cap - 1) // 2
    full = simhash_near_dups(
        df, "text", "doc_id", max_hamming=3, max_bucket_size=None
    ).collect()
    assert len(full) == n * (n - 1) // 2


def test_nan_embeddings_never_rank_or_pair(spark):
    """Round-5 max review: a NaN element made cos_sim NaN, which Spark
    orders above every double and passes >= threshold — NaN vectors ranked
    #1 for every query (evicting true neighbors) and emitted false LSH
    pairs while the exact kernel excluded them. Non-finite vectors are now
    filtered like nulls at every entry point."""
    from syncmaven_spark.operators.similarity import (
        cosine_pairs_exact,
        cosine_pairs_lsh,
        cosine_topk_bruteforce,
    )

    nan, inf = float("nan"), float("inf")
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0]),
         (3, [nan, 1.0, 0.0]), (4, [inf, 2.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    top = cosine_topk_bruteforce(corpus, corpus.filter("vec_id = 1"), k=2).collect()
    assert [r["n_id"] for r in top] == [2], top  # only the finite neighbor
    lsh = cosine_pairs_lsh(corpus, threshold=0.9, n_planes=2, n_tables=4).collect()
    exact = cosine_pairs_exact(corpus, threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in exact} == {(1, 2)}
    assert {(r["id_a"], r["id_b"]) for r in lsh} <= {(1, 2)}  # never a NaN pair


def test_exact_pairs_null_id_does_not_crash(spark):
    """Round-5 max review: a NULL id reached the numpy kernel as an
    object-dtype array and None > int raised TypeError, killing the job."""
    from syncmaven_spark.operators.similarity import cosine_pairs_exact

    corpus = spark.createDataFrame(
        [(None, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.99, 0.05])],
        "vec_id long, embedding array<double>",
    )
    pairs = cosine_pairs_exact(corpus, threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_exact_pairs_slab_kernel_matches_unslabbed(spark):
    """The slabbed matmul (bounded transient memory) must produce the exact
    same pair set as one big matmul would — verified against brute force
    over a corpus larger than a tiny slab."""
    import numpy as np

    from syncmaven_spark.operators import similarity as S

    rng = np.random.RandomState(7)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(300)]
    # plant near-dups
    rows += [(1000 + i, rows[i][1]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_pairs_exact(df, threshold=0.999).collect()
    }
    assert got == {(i, 1000 + i) for i in range(5)}


def test_lsh_bucket_cap_bounds_degenerate_buckets(spark):
    """Round-5 max review: b identical-signature vectors (zero-filled
    failed encodes) shared every table's bucket — an uncapped O(b^2)
    candidate join whose pairs verification then discarded."""
    from syncmaven_spark.operators.similarity import cosine_pairs_lsh

    n, cap = 20, 6
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    capped = cosine_pairs_lsh(
        df, threshold=0.9, n_planes=2, n_tables=2, max_bucket_size=cap
    ).collect()
    assert len(capped) == cap * (cap - 1) // 2
    full = cosine_pairs_lsh(
        df, threshold=0.9, n_planes=2, n_tables=2, max_bucket_size=None
    ).collect()
    assert len(full) == n * (n - 1) // 2


def test_asof_variants_agree_on_nan_right_ts_and_long_precision(spark):
    """Round-5 max review (joins): a NaN right `on` crashed the grouped
    variant inside pd.merge_asof; and merge_asof's NaN-fill upcast int64
    value columns to float64, corrupting ids above 2^53 whenever the group
    had any unmatched left row. Both variants must agree and keep exact
    longs."""
    from syncmaven_spark.operators.joins import asof_join, asof_join_grouped

    big = 9007199254740993  # 2^53 + 1: not representable as float64
    left = spark.createDataFrame(
        [("u", 0.5), ("u", 2.0)], "k string, ts double"
    )
    right = spark.createDataFrame(
        [("u", float("nan"), 1), ("u", 1.0, big)],
        "k string, ts double, event_id long",
    )
    for fn in (asof_join, asof_join_grouped):
        rows = {r["ts"]: r["right_event_id"]
                for r in fn(left, right, on="ts", by="k").collect()}
        assert rows[0.5] is None, fn.__name__   # nothing precedes 0.5
        assert rows[2.0] == big, fn.__name__    # exact long, not 2^53


def test_asof_grouped_unmatched_floats_are_null_not_nan(spark):
    """Round-5 max review: unmatched rows came back as NaN (isNull false,
    aggregates poisoned) in float right columns instead of true NULL."""
    from pyspark.sql import functions as F

    from syncmaven_spark.operators.joins import asof_join_grouped

    left = spark.createDataFrame(
        [("u", 1.0), ("u", 5.0)], "k string, ts double"
    )
    right = spark.createDataFrame(
        [("u", 3.0, 7.5)], "k string, ts double, v double"
    )
    out = asof_join_grouped(left, right, on="ts", by="k")
    unmatched = out.filter(F.col("ts") == 1.0).first()
    assert unmatched["right_v"] is None
    assert out.filter(F.col("right_v").isNull()).count() == 1


def test_asof_grouped_tied_right_ts_deterministic(spark):
    """Round-5 max review: tied right timestamps resolved by shuffle order
    (unstable quicksort) — a task retry could emit a different match. Both
    variants must pick the same (max-value) winner, repeatably."""
    from syncmaven_spark.operators.joins import asof_join, asof_join_grouped

    left = spark.createDataFrame([("u", 10.0)], "k string, ts double")
    right = spark.createDataFrame(
        [("u", 10.0, "a"), ("u", 10.0, "b"), ("u", 10.0, "c")],
        "k string, ts double, tag string",
    ).repartition(8)
    expected = asof_join(left, right, on="ts", by="k").first()["right_tag"]
    for _ in range(3):
        got = asof_join_grouped(left, right, on="ts", by="k").first()["right_tag"]
        assert got == expected == "c"


def test_asof_join_supports_map_value_columns(spark):
    """Round-5 max review: the determinism tie-break ordered by the full
    right struct, so any map value column failed analysis
    (INVALID_ORDERING_TYPE); maps now fall back to a hashed tie-break."""
    from syncmaven_spark.operators.joins import asof_join

    left = spark.createDataFrame([("u", 5.0)], "k string, ts double")
    right = spark.createDataFrame(
        [("u", 1.0, {"plan": "pro"})],
        "k string, ts double, props map<string,string>",
    )
    row = asof_join(left, right, on="ts", by="k").first()
    assert row["right_props"] == {"plan": "pro"}


def test_range_join_rejects_pathological_interval(spark):
    """Round-5 max review: one open-ended interval (hi=1e12) exploded into
    a ~1e12-element sequence and killed the job with an opaque error; the
    guard now fails fast with the offending bounds in the message."""
    from syncmaven_spark.operators.joins import range_join

    left = spark.createDataFrame([(5.0,)], "v double")
    right = spark.createDataFrame(
        [(0.0, 1.0e12, "open-ended")], "lo double, hi double, band string"
    )
    ok = range_join(
        left, right, "v", "lo", "hi", bucket_size=1.0,
        max_buckets_per_interval=10_000_000_000_000,
    )
    # with a big-enough bound the guard is inert (plan-level sanity only)
    assert "band" in ok.columns
    with pytest.raises(Exception, match="range_join: interval spans"):
        range_join(
            left, right, "v", "lo", "hi", bucket_size=1.0
        ).collect()


def test_extract_features_surfaces_broken_decoder(spark):
    """Round-5 max review: a systematically broken custom decoder (wrong
    arity) was swallowed per-row into decode_ok=False — a '100% successful'
    run with zero features. Programming errors now surface; NULL blobs and
    malformed bytes stay per-row tolerant."""
    from syncmaven_spark.operators.multimodal import extract_features

    # a TRUNCATED PNG (real-codec path) — unrecognized formats fall back
    # to the deterministic fake decode and would count as decode_ok=True
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\n garbage")), (2, None)],
        "id long, content binary",
    )
    # malformed + NULL blobs: tolerated per row
    ok = extract_features(df, feature_dim=4).collect()
    assert [r["decode_ok"] for r in sorted(ok, key=lambda r: r["id"])] == [
        False, False,
    ]
    # wrong-arity decoder: surfaces instead of silently nulling everything
    with pytest.raises(Exception, match="TypeError|positional"):
        extract_features(
            df, feature_dim=4, decoder=lambda blob: [0.0]
        ).collect()


def test_sample_video_frames_rejects_nonpositive_interval(spark):
    from syncmaven_spark.operators.multimodal import sample_video_frames

    df = spark.createDataFrame([(1, b"x")], "id long, content binary")
    with pytest.raises(ValueError, match="every_ms"):
        sample_video_frames(df, every_ms=0)


def test_bucket_cap_zero_rejected_not_silently_disabled(spark):
    """Round-5 advice: ``if max_bucket_size:`` made ``0`` DISABLE the cap —
    the opposite of the plausible reading. All three capped operators must
    raise on non-positive caps; only None disables."""
    import pytest as _pytest

    from syncmaven_spark.operators.dedup import (
        minhash_lsh_candidates,
        simhash_near_dups,
    )
    from syncmaven_spark.operators.similarity import cosine_pairs_lsh

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "doc_id long, body string",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    for bad in (0, -3):
        with _pytest.raises(ValueError, match="max_bucket_size"):
            minhash_lsh_candidates(docs, "body", "doc_id", max_bucket_size=bad)
        with _pytest.raises(ValueError, match="max_bucket_size"):
            simhash_near_dups(docs, "body", "doc_id", max_bucket_size=bad)
        with _pytest.raises(ValueError, match="max_bucket_size"):
            cosine_pairs_lsh(vecs, threshold=0.9, max_bucket_size=bad)


def test_asof_grouped_left_ridx_column_survives(spark):
    """Round-5 advice: the grouped variant's indexed lookup reserved the
    name `_ridx`; a left DataFrame already carrying `_ridx` made
    pd.merge_asof suffix the overlap and KeyError in every executor group."""
    from syncmaven_spark.operators.joins import asof_join_grouped

    left = spark.createDataFrame(
        [("u", 2.0, 99)], "k string, ts double, _ridx long"
    )
    right = spark.createDataFrame(
        [("u", 1.0, "hit")], "k string, ts double, tag string"
    )
    row = asof_join_grouped(left, right, on="ts", by="k").first()
    assert row["_ridx"] == 99          # left column preserved verbatim
    assert row["right_tag"] == "hit"   # match still found
