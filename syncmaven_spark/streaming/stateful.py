"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only long-lived state is the KV store (cursors, ID maps,
synced-row caches). In always-on streaming form that state belongs in
Spark's managed state store — checkpointed, fault-tolerant, partitioned by
key across executors. These operators demonstrate the pattern the engine
uses for anything cursor-like that must survive restarts without a
driver-side store round-trip.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _key_type(df: DataFrame, key_col: str) -> str:
    """DDL type of the grouping key, taken from the INPUT schema — a
    hardcoded ``long`` used to break any stream with a string/other key."""
    return df.schema[key_col].dataType.simpleString()


def streaming_running_totals(
    stream_df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained in managed state.

    Each micro-batch folds its rows into the persisted per-key state and
    emits the updated totals (output mode ``update``). State lives in the
    query's checkpoint: a restarted query continues the totals exactly where
    the previous run stopped — the streaming analog of the cursor row in the
    reference's state store (``$lastCursor`` semantics, sync.ts:460-468).

    ``NoTimeout`` is deliberate: running totals are forever by definition,
    so state size is bounded by KEY CARDINALITY (one small row per key),
    not by time — the right bound for the user/account keys this mirrors.
    """

    output_schema = (
        f"{key_col} {_key_type(stream_df, key_col)}, "
        "n_events long, total_value double"
    )
    state_schema = "n long, total double"

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            [{key_col: key[0], "n_events": n, "total_value": round(total, 4)}]
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sessionize(
    stream_df: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    flush_idle: bool = False,
) -> DataFrame:
    """Event-time sessionization with managed per-key state.

    Keeps the open session (start, last-seen, count) in state; a row whose
    timestamp exceeds the gap closes the open session and emits it, then
    starts a new one. Open sessions survive restarts via the checkpoint.
    Emits only *closed* sessions (append semantics).

    Semantics hardened by review:

    - **Late events merge, never rewind**: an event older than the open
      session's last-seen timestamp (late across micro-batches) extends the
      session backwards (``start = min``, ``last = max``) instead of
      rewinding ``last`` — rewinding made the NEXT event measure a bogus
      gap and split the session with a wrong end time.
    - **Null timestamps are dropped** (they decoded to INT64_MIN and opened
      a 1677-era garbage session).
    - **Idle keys can flush** (``flush_idle``): a processing-time timeout
      of one gap emits the open session and FREES the state row. ALWAYS-ON
      queries should enable this — without it a key's final session is
      never emitted and its state lives in the checkpoint forever
      (unbounded state growth). It stays OFF by default because a pending
      processing-time timeout keeps an ``availableNow``/batch-style run
      alive waiting for the gap to elapse — the run never terminates.
    """

    output_schema = (
        f"{key_col} {_key_type(stream_df, key_col)}, "
        "session_start timestamp, session_end timestamp, n_events long"
    )
    state_schema = "start_us long, last_us long, n long"

    def _closed_row(key, start_us: int, last_us: int, n: int) -> dict[str, Any]:
        return {
            key_col: key[0],
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(last_us, unit="us"),
            "n_events": n,
        }

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle flush: emit the open session and free the state row
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame([_closed_row(key, start_us, last_us, n)])
            return
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        closed: list[dict[str, Any]] = []
        rows: list[int] = []
        for pdf in batches:
            ts = pd.to_datetime(pdf[ts_col]).dropna()  # NaT → no session
            rows.extend(int(v.value) // 1000 for v in ts)
        for ts_us in sorted(rows):
            if last_us is not None and ts_us - last_us > gap_seconds * 1_000_000:
                closed.append(_closed_row(key, start_us, last_us, n))
                start_us, last_us, n = ts_us, ts_us, 0
            if start_us is None:
                start_us, last_us = ts_us, ts_us
            # merge without rewinding: a late event may extend backwards
            start_us = min(start_us, ts_us)
            last_us = max(last_us, ts_us)
            n += 1
        if n > 0:
            state.update((start_us, last_us, n))
            if flush_idle:
                state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(closed)

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if flush_idle
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
