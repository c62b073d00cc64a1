"""HTTP destination.

Reference: ``packages/connectors/http/src/index.ts:11-228``. Stream
``default``; per-row or batched requests; payload formats:

- ``json`` — a JSON body template where the string values ``[RESULT_ROWS]``,
  ``[RESULT_ROW]``, ``[RESULT_LENGTH]`` are replaced (recursively) with the
  batch rows / single row / count (index.ts:46-83),
- ``array`` — the rows as a JSON array (single row: the row object),
- ``ndjson`` — one JSON object per line.

Custom headers are ``"Name: value"`` strings; default method POST; timeout
10 000 ms (index.ts:37). Batch mode engages when ``batchSize > 1``
(index.ts:219-224).
"""

from __future__ import annotations

import json
import logging
from typing import Any, Callable

from syncmaven_spark.sinks import register
from syncmaven_spark.sinks.base import (
    ANY_OBJECT_SCHEMA,
    BatchingOutputStream,
    DestinationProvider,
    OutputStream,
    RateLimitError,
    StreamSpec,
)
from syncmaven_spark.types import RowJSONEncoder

log = logging.getLogger("syncmaven_spark.sinks.http")

RESULT_ROWS = "[RESULT_ROWS]"
RESULT_ROW = "[RESULT_ROW]"
RESULT_LENGTH = "[RESULT_LENGTH]"


def _has_row_macro(template: Any) -> bool:
    """True when any [RESULT_*] macro appears anywhere in the template."""
    if isinstance(template, str):
        return template in (RESULT_ROWS, RESULT_ROW, RESULT_LENGTH)
    if isinstance(template, list):
        return any(_has_row_macro(v) for v in template)
    if isinstance(template, dict):
        return any(_has_row_macro(v) for v in template.values())
    return False


def process_template(
    template: Any, row: dict | None = None, rows: list[dict] | None = None
) -> Any:
    """Recursive macro substitution (index.ts:46-83). Returns a new object."""
    if isinstance(template, list):
        return [process_template(v, row, rows) for v in template]
    if isinstance(template, dict):
        return {k: process_template(v, row, rows) for k, v in template.items()}
    if template == RESULT_ROWS:
        return rows if rows is not None else [row]
    if template == RESULT_ROW:
        if rows is not None:
            raise ValueError(
                "'[RESULT_ROW]' macro may be used only with batch size = 1"
            )
        return row
    if template == RESULT_LENGTH:
        if rows is not None:
            return len(rows)
        return 1 if row is not None else 0
    return template


def _parse_headers(headers: list[str] | None) -> dict[str, str]:
    out = {}
    for h in headers or []:
        name, _, value = h.partition(":")
        out[name.strip()] = value.strip()
    return out


def _default_transport(timeout_ms: int) -> Callable[..., Any]:
    import requests

    def send(method: str, url: str, headers: dict[str, str], body: str):
        from syncmaven_spark.sinks.base import parse_retry_after

        resp = requests.request(
            method, url, headers=headers, data=body.encode("utf-8"),
            timeout=timeout_ms / 1000.0,
        )
        if resp.status_code == 429:
            raise RateLimitError(
                "rate limited",
                retry_after_ms=parse_retry_after(resp.headers.get("Retry-After")),
            )
        if resp.status_code >= 400:
            raise RuntimeError(f"HTTP Error: {resp.status_code} {resp.reason}")
        return resp

    return send


def _dumps(obj: Any) -> str:
    return json.dumps(obj, cls=RowJSONEncoder, ensure_ascii=False)


class _HttpBase:
    def __init__(self, credentials: dict[str, Any]) -> None:
        self.url = credentials["url"]
        self.method = credentials.get("method", "POST")
        self.format = credentials.get("format", "json")
        body = credentials.get("body")
        # parse the constant template ONCE — per-row json.loads of the same
        # string was 1M redundant parses on a 1M-row sync. process_template
        # never mutates its input (it rebuilds dicts/lists), so sharing is
        # safe.
        self.body_template = json.loads(body) if isinstance(body, str) else (body or {})
        if self.format == "json" and not _has_row_macro(self.body_template):
            # reference parity keeps sending the constant body, but a
            # template with no [RESULT_*] macro means EVERY row is dropped
            # while counting success — almost certainly a config mistake
            log.warning(
                "http sink: format='json' but the body template contains "
                "no [RESULT_ROWS]/[RESULT_ROW]/[RESULT_LENGTH] macro — row "
                "data will NOT be sent (constant body %r per request)",
                body,
            )
        self.headers = _parse_headers(credentials.get("headers"))
        timeout = credentials.get("timeout", 10_000)
        self.transport = credentials.get("_transport") or _default_transport(timeout)

    def content_type(self) -> str:
        return (
            "application/x-ndjson" if self.format == "ndjson" else "application/json"
        )

    def send(self, body: str) -> None:
        headers = {"Content-Type": self.content_type(), **self.headers}
        self.transport(self.method, self.url, headers, body)


class HttpSingleStream(OutputStream, _HttpBase):
    def __init__(self, credentials: dict[str, Any]) -> None:
        OutputStream.__init__(self)
        _HttpBase.__init__(self, credentials)

    def _payload(self, row: dict[str, Any]) -> str:
        if self.format == "json":
            return _dumps(process_template(self.body_template, row=row))
        if self.format == "array":
            return _dumps(row)
        if self.format == "ndjson":
            return _dumps(row) + "\n"
        raise ValueError(
            f"Unsupported format: {self.format}. Supported: 'json', 'array', 'ndjson'"
        )

    def handle_row(self, row: dict[str, Any]) -> None:
        from syncmaven_spark.sinks.base import with_rate_limit_retry

        self.stats.received += 1
        with_rate_limit_retry(self.send, self._payload(row))
        self.stats.success += 1


class HttpBatchStream(BatchingOutputStream, _HttpBase):
    def __init__(self, credentials: dict[str, Any]) -> None:
        BatchingOutputStream.__init__(self, credentials.get("batchSize", 1))
        _HttpBase.__init__(self, credentials)

    def _payload(self, rows: list[dict[str, Any]]) -> str:
        if self.format == "json":
            return _dumps(process_template(self.body_template, rows=rows))
        if self.format == "array":
            return _dumps(rows)
        if self.format == "ndjson":
            return "\n".join(_dumps(r) for r in rows)
        raise ValueError(
            f"Unsupported format: {self.format}. Supported: 'json', 'array', 'ndjson'"
        )

    def process_batch(self, rows: list[dict[str, Any]]) -> None:
        self.send(self._payload(rows))
        self.stats.success += len(rows)


@register("http")
class HttpDestination(DestinationProvider):
    name = "http"
    # each request carries only its own batch — no cross-row driver state,
    # so partitions can POST independently from executors
    stateless = True
    credentials_schema = {
        "type": "object",
        "properties": {
            "url": {"type": "string"},
            "method": {"type": "string", "enum": ["GET", "POST", "PUT", "DELETE"]},
            "format": {"type": "string", "enum": ["json", "array", "ndjson"]},
            "body": {"type": ["string", "object"], "description": "json-format body template with [RESULT_ROWS]/[RESULT_ROW]/[RESULT_LENGTH] macros"},
            "headers": {"type": "array", "items": {"type": "string"}},
            "batchSize": {"type": "integer", "default": 1},
            "timeout": {"type": "integer", "default": 10000},
        },
        "required": ["url"],
    }

    def streams(self) -> list[StreamSpec]:
        return [StreamSpec(name="default", row_type=ANY_OBJECT_SCHEMA)]

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
        if credentials.get("batchSize", 1) > 1:
            return HttpBatchStream(credentials)
        return HttpSingleStream(credentials)
