"""applyInPandasWithState operator tests: state continuity across restarts."""

import datetime as dt

from syncmaven_spark.streaming.stateful import (
    streaming_running_totals,
    streaming_sessionize,
)

T = dt.datetime
SCHEMA = "user_id long, ts timestamp, value double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, ckpt, op, query_name, mode="update"):
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    collected = []

    def sink(batch_df, epoch_id):
        collected.extend(batch_df.collect())

    q = (
        op(stream)
        .writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def test_running_totals_survive_restart(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    _write_batch(spark, src, [
        (1, T(2024, 1, 1, 10, 0), 10.0),
        (1, T(2024, 1, 1, 10, 1), 5.0),
        (2, T(2024, 1, 1, 10, 2), 7.0),
    ])
    out1 = _run(spark, src, ckpt, streaming_running_totals, "totals1")
    got1 = {r.user_id: (r.n_events, r.total_value) for r in out1}
    assert got1 == {1: (2, 15.0), 2: (1, 7.0)}

    # new file + a fresh query run on the same checkpoint: managed state
    # continues the totals (restart semantics — the cursor-state analog)
    _write_batch(spark, src, [(1, T(2024, 1, 1, 11, 0), 1.0),
                              (3, T(2024, 1, 1, 11, 1), 2.0)])
    out2 = _run(spark, src, ckpt, streaming_running_totals, "totals2")
    got2 = {r.user_id: (r.n_events, r.total_value) for r in out2}
    assert got2 == {1: (3, 16.0), 3: (1, 2.0)}  # user 2 unchanged → not re-emitted


def test_sessionize_emits_closed_sessions_across_batches(spark, tmp_path):
    src, ckpt = str(tmp_path / "s2"), str(tmp_path / "c2")
    _write_batch(spark, src, [
        (1, T(2024, 1, 1, 10, 0), 1.0),
        (1, T(2024, 1, 1, 10, 10), 1.0),   # same session (10 min gap)
    ])
    out1 = _run(spark, src, ckpt, lambda s: streaming_sessionize(s, 1800), "sess1", mode="append")
    assert out1 == []  # session still open

    # an event 2h later closes the first session
    _write_batch(spark, src, [(1, T(2024, 1, 1, 12, 30), 1.0)])
    out2 = _run(spark, src, ckpt, lambda s: streaming_sessionize(s, 1800), "sess2", mode="append")
    assert len(out2) == 1
    sess = out2[0]
    assert sess.user_id == 1 and sess.n_events == 2
    assert sess.session_start == T(2024, 1, 1, 10, 0)
    assert sess.session_end == T(2024, 1, 1, 10, 10)


def test_sessionize_flush_idle_emits_final_session(spark, tmp_path):
    """With flush_idle on (always-on queries), an idle key's OPEN session
    is emitted by the processing-time timeout and its state row is freed —
    without it the last session per key is silently lost forever."""
    import time

    src, ckpt = str(tmp_path / "sf"), str(tmp_path / "cf")
    _write_batch(spark, src, [
        (1, T(2024, 1, 1, 10, 0, 0), 1.0),
        (1, T(2024, 1, 1, 10, 0, 1), 1.0),  # within the 2s gap: one session
    ])
    collected = []
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_sessionize(stream, gap_seconds=2, flush_idle=True)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _eid: collected.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while not collected and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(collected) == 1
    row = collected[0]
    assert row.user_id == 1 and row.n_events == 2
    assert row.session_start == T(2024, 1, 1, 10, 0, 0)
    assert row.session_end == T(2024, 1, 1, 10, 0, 1)


def test_sessionize_late_event_merges_without_rewind(spark, tmp_path):
    """A late cross-batch event older than the open session's last-seen
    timestamp extends the session backwards instead of rewinding its end:
    the follow-up event must NOT see a bogus gap and split the session."""
    src, ckpt = str(tmp_path / "sl"), str(tmp_path / "cl")
    _write_batch(spark, src, [(1, T(2024, 1, 1, 10, 0), 1.0)])
    out1 = _run(spark, src, ckpt, lambda s: streaming_sessionize(s, 1800), "l1", mode="append")
    assert out1 == []
    # late event (9:45) + a 10:05 event: all one session — under the old
    # rewind bug, last regressed to 9:45 and a later 10:20 event would
    # measure 35min > 30min and split with session_end=9:45
    _write_batch(spark, src, [(1, T(2024, 1, 1, 9, 45), 1.0),
                              (1, T(2024, 1, 1, 10, 5), 1.0)])
    out2 = _run(spark, src, ckpt, lambda s: streaming_sessionize(s, 1800), "l2", mode="append")
    assert out2 == []
    # close it with a far-future event; the emitted session spans 9:45-10:05
    _write_batch(spark, src, [(1, T(2024, 1, 1, 12, 0), 1.0)])
    out3 = _run(spark, src, ckpt, lambda s: streaming_sessionize(s, 1800), "l3", mode="append")
    assert len(out3) == 1
    assert out3[0].session_start == T(2024, 1, 1, 9, 45)
    assert out3[0].session_end == T(2024, 1, 1, 10, 5)
    assert out3[0].n_events == 3


def test_sessionize_drops_null_timestamps(spark, tmp_path):
    """Null timestamps are skipped — they used to decode to INT64_MIN and
    open a 1677-era garbage session that crashed on emission."""
    src, ckpt = str(tmp_path / "sn"), str(tmp_path / "cn")
    _write_batch(spark, src, [
        (1, None, 1.0),
        (1, T(2024, 1, 1, 10, 0), 1.0),
        (1, T(2024, 1, 1, 12, 0), 1.0),  # closes the 10:00 session
    ])
    out = _run(spark, src, ckpt, lambda s: streaming_sessionize(s, 1800), "n1", mode="append")
    assert len(out) == 1
    assert out[0].session_start == T(2024, 1, 1, 10, 0)
    assert out[0].n_events == 1


def test_stateful_operators_accept_string_keys(spark, tmp_path):
    """The output schema derives the key type from the input — a hardcoded
    `long` used to fail any stream with a non-long key."""
    src, ckpt = str(tmp_path / "sk"), str(tmp_path / "ck")
    rows = [("alice", T(2024, 1, 1, 10, 0), 2.0), ("bob", T(2024, 1, 1, 10, 1), 3.0)]
    spark.createDataFrame(rows, "user_id string, ts timestamp, value double") \
        .coalesce(1).write.mode("append").parquet(src)
    out = _run(spark, src, ckpt, streaming_running_totals, "k1")
    got = {r.user_id: (r.n_events, r.total_value) for r in out}
    assert got == {"alice": (1, 2.0), "bob": (1, 3.0)}
