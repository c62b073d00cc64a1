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
