"""Resend audience destination.

Reference: ``packages/connectors/resend/src/index.ts:30-98`` —
- audience get-or-create by name (default
  ``Syncmaven: <syncId>, stream=<streamId>``),
- one contact create per row with normalized email and first/last from
  splitName, falling back to the email local-part when no name,
- ``unsubscribed`` forwarded only when truthy (undefined keeps the
  destination value),
- rate limits detected from the error text ``(\\d+) requests per second`` →
  RateLimitError(1000 ms).
"""

from __future__ import annotations

import re
from typing import Any, Protocol

from syncmaven_spark.sinks import register
from syncmaven_spark.sinks.base import (
    DestinationProvider,
    OutputStream,
    RateLimitError,
    StreamSpec,
    with_rate_limit_retry,
)
from syncmaven_spark.sinks.util import normalize_email_py, split_name_cdk_py

RPS_RE = re.compile(r"(\d+) requests per second")

AUDIENCE_ROW_TYPE = {
    "type": "object",
    "properties": {
        "email": {"type": "string"},
        "name": {"type": ["string", "null"]},
        "unsubscribed": {"type": ["boolean", "null"]},
    },
    "required": ["email"],
    "additionalProperties": True,
}


class ResendClient(Protocol):
    def list_audiences(self) -> list[dict]: ...

    def create_audience(self, name: str) -> str: ...

    def create_contact(self, payload: dict) -> None:
        """Raises RuntimeError with the API error message on failure."""


class RestResendClient:
    BASE = "https://api.resend.com"

    def __init__(self, api_key: str) -> None:
        import requests

        self._s = requests.Session()
        self._s.headers["Authorization"] = f"Bearer {api_key}"

    def _req(self, method: str, path: str, body: dict | None = None) -> dict:
        from syncmaven_spark.sinks.base import RowError

        resp = self._s.request(method, self.BASE + path, json=body, timeout=30)
        if resp.status_code >= 400:
            try:
                message = resp.json().get("message", resp.text)
            except Exception:
                message = resp.text
            if 400 <= resp.status_code < 500 and resp.status_code != 429:
                # this record was rejected (422 invalid email etc.) — a
                # RowError lets the engine count the row failed and keep
                # syncing instead of aborting the whole run (std.ts parity;
                # rps/429 handling lives in the stream's retry path)
                raise RowError(message)
            raise RuntimeError(message)
        return resp.json() if resp.content else {}

    def list_audiences(self) -> list[dict]:
        return self._req("GET", "/audiences").get("data", [])

    def create_audience(self, name: str) -> str:
        return self._req("POST", "/audiences", {"name": name})["id"]

    def create_contact(self, payload: dict) -> None:
        audience_id = payload.pop("audienceId")
        self._req("POST", f"/audiences/{audience_id}/contacts", payload)


class ResendAudienceStream(OutputStream):
    def __init__(
        self,
        client: ResendClient,
        sync_id: str,
        stream_id: str,
        options: dict[str, Any],
    ) -> None:
        super().__init__()
        self.client = client
        audience_name = (
            options.get("audienceName") or f"Syncmaven: {sync_id}, stream={stream_id}"
        )
        existing = {a["name"]: a["id"] for a in client.list_audiences()}
        self.audience_id = existing.get(audience_name) or client.create_audience(
            audience_name
        )

    def handle_row(self, row: dict[str, Any]) -> None:
        self.stats.received += 1
        email = normalize_email_py(row["email"])
        if row.get("name"):
            # node-cdk single-split variant (resend/src/index.ts:72), NOT
            # hubspot's all-but-last/last split: "Jean Claude Van Damme" →
            # ("Jean", "Claude Van Damme")
            first, last = split_name_cdk_py(row["name"])
        else:
            first, last = email.split("@")[0], ""
        payload = {
            "email": email,
            "firstName": first,
            "lastName": last or "",
            "audienceId": self.audience_id,
        }
        if row.get("unsubscribed"):
            payload["unsubscribed"] = True

        def create() -> None:
            try:
                self.client.create_contact(dict(payload))
            except RuntimeError as e:
                match = RPS_RE.search(str(e))
                if match:
                    raise RateLimitError(
                        f"Rate limit exceeded: {match.group(1)} requests per second",
                        retry_after_ms=1000,
                    ) from e
                raise

        with_rate_limit_retry(create)
        self.stats.success += 1


@register("resend")
class ResendDestination(DestinationProvider):
    name = "resend"
    credentials_schema = {
        "type": "object",
        "properties": {"apiKey": {"type": "string", "description": "Resend API key"}},
        "required": ["apiKey"],
    }

    def streams(self) -> list[StreamSpec]:
        return [StreamSpec(name="audience", row_type=AUDIENCE_ROW_TYPE)]

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
        if not credentials or (
            "_client" not in credentials and "apiKey" not in credentials
        ):
            raise ValueError("Resend credentials must be set")
        client = credentials.get("_client") or RestResendClient(credentials["apiKey"])
        return ResendAudienceStream(client, sync_id, stream_name, options or {})
