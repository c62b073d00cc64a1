"""Twitter (X) Ads custom-audience destination.

Reference: ``packages/connectors/twitter-ads/src/index.ts:24-186`` —
- audience get-or-create by name (default
  ``AudienceSync: <syncId>, stream=<streamId>``) (index.ts:46-67),
- clear-previous pattern via ``streamBatch`` over the
  ``last-synced-rows`` state prefix → ``Delete`` operations, then
  ``deleteByPrefix`` (index.ts:68-89),
- batched ``Update`` operations carrying ``effective_at`` / ``expires_at``
  (now + 30 days) timestamps with second-precision ISO (``fixISO``) and
  SHA-256-of-normalized-email users (index.ts:156-185),
- every flushed row cached to state per email (index.ts:180-185).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Protocol

from syncmaven_spark.sinks import register
from syncmaven_spark.sinks.base import (
    BatchingOutputStream,
    DestinationProvider,
    OutputStream,
    StreamSpec,
)
from syncmaven_spark.sinks.util import email_hash_py

AUDIENCE_ROW_TYPE = {
    "type": "object",
    "properties": {"email": {"type": "string"}},
    "required": ["email"],
    "additionalProperties": True,
}


def fix_iso(ts: _dt.datetime) -> str:
    """Second-precision ISO + Z — 'twitter's own idea of a valid ISO date'
    (index.ts:157-160)."""
    return ts.strftime("%Y-%m-%dT%H:%M:%S") + "Z"


class TwitterClient(Protocol):
    def list_audiences(self) -> list[dict]: ...

    def create_audience(self, name: str, description: str) -> str: ...

    def users_op(self, audience_id: str, operations: list[dict]) -> None: ...


class RestTwitterClient:
    """ads-api.twitter.com v12, OAuth1."""

    def __init__(self, credentials: dict[str, Any]) -> None:
        try:
            from requests_oauthlib import OAuth1Session  # type: ignore
        except ImportError as e:  # pragma: no cover - optional dependency
            raise RuntimeError(
                "twitter-ads live API needs requests_oauthlib; inject _client "
                "or install the dependency"
            ) from e
        self._s = OAuth1Session(
            credentials["consumerKey"],
            credentials["consumerSecret"],
            credentials["accessToken"],
            credentials["accessTokenSecret"],
        )
        self.account_id = credentials["accountId"]
        self.base = "https://ads-api.twitter.com/12"

    def _req(self, method: str, path: str, body=None) -> dict:
        from syncmaven_spark.sinks.base import RateLimitError, parse_retry_after

        resp = self._s.request(method, self.base + path, json=body, timeout=30)
        if resp.status_code == 429:
            # surface throttling as RateLimitError so the flush-layer
            # with_rate_limit_retry backs off (Retry-After honored) instead
            # of aborting the sync on a bare HTTPError
            raise RateLimitError(
                "twitter-ads rate limited",
                retry_after_ms=parse_retry_after(resp.headers.get("Retry-After")),
            )
        resp.raise_for_status()
        return resp.json()

    def list_audiences(self) -> list[dict]:
        return self._req(
            "GET", f"/accounts/{self.account_id}/custom_audiences"
        ).get("data", [])

    def create_audience(self, name: str, description: str) -> str:
        return self._req(
            "POST",
            f"/accounts/{self.account_id}/custom_audiences",
            {"name": name, "description": description},
        )["data"]["id"]

    def users_op(self, audience_id: str, operations: list[dict]) -> None:
        self._req(
            "POST",
            f"/accounts/{self.account_id}/custom_audiences/{audience_id}/users",
            operations,
        )


class TwitterAudienceStream(BatchingOutputStream):
    def __init__(
        self,
        client: TwitterClient,
        store: Any,
        sync_id: str,
        stream_id: str,
        options: dict[str, Any],
        restart: bool,
        now: _dt.datetime | None = None,
    ) -> None:
        super().__init__()
        self.client = client
        self.store = store
        self.rows_key = [f"syncId={sync_id}", f"stream={stream_id}", "last-synced-rows"]
        self._now = now or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)

        audience_name = (
            options.get("audienceName")
            or f"AudienceSync: {sync_id}, stream={stream_id}"
        )
        existing = {a["name"]: a["id"] for a in client.list_audiences()}
        self.audience_id = existing.get(audience_name)
        if not self.audience_id:
            self.audience_id = client.create_audience(
                audience_name,
                f"Audience created by AudienceSync for stream {stream_id} with "
                f"syncId {sync_id}. Don't change its name!",
            )

        if not options.get("doNotClearAudience") and not restart:
            for batch in self.store.stream_batch(self.rows_key, self.max_batch_size):
                users = [
                    email_hash_py(value["email"])
                    for _, value in batch
                    if isinstance(value, dict)
                ]
                if not users:
                    continue
                # NOTE the asymmetric payload shape is REFERENCE PARITY:
                # the Delete op sends a flat top-level `users` hash list
                # (twitter-ads/src/index.ts:76-80) while Update nests
                # {email: [hash]} objects under `params`
                # (index.ts:164-178); do not "fix" one to match the other.
                self.client.users_op(
                    self.audience_id,
                    [{"operation_type": "Delete", "users": users}],
                )
            self.store.delete_by_prefix(self.rows_key)

    def process_batch(self, rows: list[dict[str, Any]]) -> None:
        self.client.users_op(
            self.audience_id,
            [
                {
                    "operation_type": "Update",
                    "params": {
                        "effective_at": fix_iso(self._now),
                        "expires_at": fix_iso(self._now + _dt.timedelta(days=30)),
                        "users": [
                            {"email": [email_hash_py(r["email"])]} for r in rows
                        ],
                    },
                }
            ],
        )
        for r in rows:
            self.store.set([*self.rows_key, r["email"]], {"email": r["email"]})
        self.stats.success += len(rows)


@register("twitter-ads")
class TwitterAdsDestination(DestinationProvider):
    name = "twitter-ads"
    credentials_schema = {
        "type": "object",
        "properties": {"consumerKey": {"type": "string"}, "consumerSecret": {"type": "string"},
                        "accessToken": {"type": "string"}, "accessTokenSecret": {"type": "string"},
                        "accountId": {"type": "string"}},
        "required": ["consumerKey", "consumerSecret", "accessToken", "accessTokenSecret", "accountId"],
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
        client = credentials.get("_client") or RestTwitterClient(credentials)
        return TwitterAudienceStream(
            client, store, sync_id, stream_name, options or {}, restart,
            now=credentials.get("_now"),
        )
