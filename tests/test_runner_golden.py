"""Golden-file sync harness — the reference's core correctness test.

Reproduces packages/core/__tests__/integration/integration.test.ts:30-202:
seed part1 (ids 1-5) → sync to file NDJSON → byte-compare → seed part2
(ids 6-7) → sync again with persisted state → byte-compare incremental
output. Both int-cursor and date-cursor variants; the inclusive ``>=``
predicate re-emits the boundary row(s).
"""

import datetime as dt

import pytest

from syncmaven_spark.runner import ModelDefinition, SyncDefinition, run_sync
from syncmaven_spark.state import InMemoryStore

T = dt.datetime

PART1 = [
    (1, T(2024, 5, 15, 13, 39, 5, 172000), "google", 123, 10, 1, 100, None, None),
    (2, T(2024, 5, 16, 13, 39, 5, 172000), "facebook", 124, 20, 2, 200, "fb", "camp2"),
    (3, T(2024, 5, 17, 13, 39, 5, 172000), "google", 125, 30, 3, 300, "gg", None),
    (4, T(2024, 5, 17, 23, 59, 59, 999000), "twitter", 126, 40, 4, 400, None, "camp4"),
    (5, T(2024, 5, 17, 23, 59, 59, 999000), "google", 127, 50, 5, 500, "gg", "camp5"),
]
PART2 = [
    (6, T(2024, 5, 18, 1, 0, 0, 0), "google", 128, 60, 6, 600, None, None),
    (7, T(2024, 5, 18, 2, 30, 0, 500000), "facebook", 129, 70, 7, 700, "fb", "c7"),
]
COLUMNS = [
    "id",
    "time",
    "source",
    "campaign_id",
    "cost",
    "clicks",
    "impressions",
    "utm_source",
    "utm_campaign",
]


def _expected_line(row):
    vals = dict(zip(COLUMNS, row))
    t = vals["time"]
    iso = t.strftime("%Y-%m-%dT%H:%M:%S.") + f"{t.microsecond // 1000:03d}Z"
    parts = []
    for k in COLUMNS:
        v = vals[k] if k != "time" else iso
        if v is None:
            parts.append(f'"{k}":null')
        elif isinstance(v, str):
            parts.append(f'"{k}":"{v}"')
        else:
            parts.append(f'"{k}":{v}')
    return "{" + ",".join(parts) + "}"


def _seed(spark, rows):
    df = spark.createDataFrame(rows, COLUMNS)
    df.createOrReplaceTempView("syncmaven_test_table")


def _sync_def(cursor_col, out_path, sync_id):
    query = (
        "select * from syncmaven_test_table "
        f"where :cursor is null or {cursor_col} >= :cursor order by id asc"
    )
    return SyncDefinition(
        id=sync_id,
        model=ModelDefinition(id="m", query=query, cursor=cursor_col),
        destination="file",
        stream="raw",
        credentials={"filename": str(out_path)},
    )


@pytest.mark.parametrize(
    "cursor_col,part2_expected_ids",
    [
        ("id", [5, 6, 7]),  # int cursor: boundary row 5 re-emitted
        ("time", [4, 5, 6, 7]),  # date cursor: ids 4+5 share the max timestamp
    ],
)
def test_two_phase_incremental_golden(spark, tmp_path, cursor_col, part2_expected_ids):
    store = InMemoryStore()
    out1 = tmp_path / "part1.ndjson"
    sync_id = f"golden_{cursor_col}"

    _seed(spark, PART1)
    result = run_sync(spark, _sync_def(cursor_col, out1, sync_id), store)
    assert result.stats.received == 5
    expected1 = "\n".join(_expected_line(r) for r in PART1) + "\n"
    assert out1.read_text() == expected1

    # part2: two more rows appear; persisted cursor makes the second sync
    # incremental, re-emitting the inclusive boundary row(s)
    _seed(spark, PART1 + PART2)
    out2 = tmp_path / "part2.ndjson"
    result2 = run_sync(spark, _sync_def(cursor_col, out2, sync_id), store)
    all_rows = {r[0]: r for r in PART1 + PART2}
    expected2 = (
        "\n".join(_expected_line(all_rows[i]) for i in part2_expected_ids) + "\n"
    )
    assert out2.read_text() == expected2
    assert result2.stats.received == len(part2_expected_ids)


def test_full_refresh_clears_cursor(spark, tmp_path):
    store = InMemoryStore()
    sync_id = "golden_fr"
    _seed(spark, PART1)
    out1 = tmp_path / "a.ndjson"
    run_sync(spark, _sync_def("id", out1, sync_id), store)

    out2 = tmp_path / "b.ndjson"
    run_sync(spark, _sync_def("id", out2, sync_id), store, full_refresh=True)
    assert len(out2.read_text().splitlines()) == 5  # full scan again


def test_checkpoint_every_persists_midway(spark, tmp_path):
    store = InMemoryStore()
    _seed(spark, PART1)
    sync = _sync_def("id", tmp_path / "c.ndjson", "golden_ckpt")
    sync.options["checkpointEvery"] = 2
    result = run_sync(spark, sync, store)
    # 5 rows / checkpointEvery 2 → checkpoints after rows 2, 4, + final
    assert result.checkpoints == 3
    assert store.get(["syncId=golden_ckpt", "$lastCursor=id"]) == {
        "type": "integer",
        "val": 5,
    }


def test_missing_cursor_reference_rejected(spark, tmp_path):
    from syncmaven_spark.sql import SqlError

    sync = SyncDefinition(
        id="bad",
        model=ModelDefinition(
            id="m", query="select * from syncmaven_test_table", cursor="id"
        ),
        destination="file",
        stream="raw",
        credentials={"filename": str(tmp_path / "x.ndjson")},
    )
    _seed(spark, PART1)
    with pytest.raises(SqlError):
        run_sync(spark, sync, InMemoryStore())
