"""HTTP sink tests (reference: packages/connectors/http/src/index.ts)."""

import json

import pytest

from syncmaven_spark.runner import ModelDefinition, SyncDefinition, run_sync
from syncmaven_spark.sinks.base import RateLimitError, with_rate_limit_retry
from syncmaven_spark.sinks.http import HttpDestination, process_template
from syncmaven_spark.state import InMemoryStore


class RecordingTransport:
    def __init__(self, fail_first_with=None):
        self.calls = []
        self._fail = fail_first_with

    def __call__(self, method, url, headers, body):
        if self._fail:
            err, self._fail = self._fail, None
            raise err
        self.calls.append({"method": method, "url": url, "headers": headers, "body": body})


def _creds(transport, **kw):
    return {"url": "http://x.test/hook", "_transport": transport, **kw}


def test_template_macros():
    t = {"data": "[RESULT_ROWS]", "meta": {"n": "[RESULT_LENGTH]"}}
    out = process_template(t, rows=[{"a": 1}, {"a": 2}])
    assert out == {"data": [{"a": 1}, {"a": 2}], "meta": {"n": 2}}

    out1 = process_template({"row": "[RESULT_ROW]", "n": "[RESULT_LENGTH]"}, row={"a": 1})
    assert out1 == {"row": {"a": 1}, "n": 1}

    with pytest.raises(ValueError):
        process_template({"r": "[RESULT_ROW]"}, rows=[{}])


def test_single_stream_json_body():
    tr = RecordingTransport()
    dest = HttpDestination()
    out = dest.create_output_stream(
        "default",
        _creds(tr, body='{"payload": "[RESULT_ROW]"}', method="PUT",
               headers=["X-Api-Key: s3cret"]),
        "s1", InMemoryStore(),
    )
    out.handle_row({"a": 1, "b": None})
    stats = out.finish()
    assert stats.success == 1
    call = tr.calls[0]
    assert call["method"] == "PUT"
    assert call["headers"]["X-Api-Key"] == "s3cret"
    assert call["headers"]["Content-Type"] == "application/json"
    assert json.loads(call["body"]) == {"payload": {"a": 1, "b": None}}


def test_batch_stream_ndjson():
    tr = RecordingTransport()
    out = HttpDestination().create_output_stream(
        "default", _creds(tr, format="ndjson", batchSize=2), "s1", InMemoryStore()
    )
    for i in range(5):
        out.handle_row({"i": i})
    out.finish()
    assert len(tr.calls) == 3  # 2+2+1
    assert tr.calls[0]["body"] == '{"i": 0}\n{"i": 1}'
    assert tr.calls[0]["headers"]["Content-Type"] == "application/x-ndjson"


def test_batch_stream_array_format():
    tr = RecordingTransport()
    out = HttpDestination().create_output_stream(
        "default", _creds(tr, format="array", batchSize=10), "s1", InMemoryStore()
    )
    out.handle_row({"i": 1})
    out.handle_row({"i": 2})
    out.finish()
    assert json.loads(tr.calls[0]["body"]) == [{"i": 1}, {"i": 2}]


def test_rate_limit_retry():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RateLimitError("slow down", retry_after_ms=1)
        return "ok"

    assert with_rate_limit_retry(flaky) == "ok"
    assert calls["n"] == 2


def test_end_to_end_sync_through_http(spark):
    tr = RecordingTransport()
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).createOrReplaceTempView(
        "http_src"
    )
    sync = SyncDefinition(
        id="http_e2e",
        model=ModelDefinition(id="m", query="select * from http_src order by id"),
        destination="http",
        stream="default",
        credentials=_creds(tr, format="array", batchSize=10),
    )
    result = run_sync(spark, sync, InMemoryStore())
    assert result.stats.received == 2
    assert json.loads(tr.calls[0]["body"]) == [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
