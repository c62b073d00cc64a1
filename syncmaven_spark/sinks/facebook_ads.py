"""Facebook Ads custom-audience destination.

Reference: ``packages/connectors/facebook-ads/src/index.ts:30-175`` —
- audience get-or-create by name (default
  ``audience-sync?syncId=<id>&streamId=<stream>``) (index.ts:56-75),
- **audience clearing**: unless ``doNotClearAudience``, the previous run's
  rows are replayed from state (``last-synced-rows`` prefix) and DELETEd in
  batches of 1000, then the prefix is dropped (index.ts:77-115),
- uploads in batches of 1000 with a stable ``session_id`` and incrementing
  ``batch_seq``, schema ``EMAIL_SHA256`` (SHA-256 of lowercased email)
  (index.ts:28, 117-175),
- each flushed row is cached to state under
  ``["syncId=…", "stream=…", "last-synced-rows", <email>]`` so the next run
  can diff/clear.
"""

from __future__ import annotations

import hashlib
from typing import Any, Protocol

from syncmaven_spark.sinks import register
from syncmaven_spark.sinks.base import (
    BatchingOutputStream,
    DestinationProvider,
    OutputStream,
    StreamSpec,
)

MAX_BATCH_SIZE = 1000  # facebook-ads/src/index.ts:28

AUDIENCE_ROW_TYPE = {
    "type": "object",
    "properties": {"email": {"type": "string"}},
    "required": ["email"],
    "additionalProperties": True,
}


def _email_sha256(email: str) -> str:
    # Reference hashes the *lowercased* email (index.ts:91); no trim.
    return hashlib.sha256(email.lower().encode("utf-8")).hexdigest()


class FacebookClient(Protocol):
    def list_audiences(self) -> list[dict]: ...

    def create_audience(self, name: str, description: str) -> str: ...

    def add_users(self, audience_id: str, session: dict, payload: dict) -> None: ...

    def delete_users(self, audience_id: str, payload: dict) -> None: ...


class RestFacebookClient:
    """Graph API v18.0 client (graph.facebook.com)."""

    API_VERSION = "v18.0"

    def __init__(self, access_token: str, account_id: str) -> None:
        import requests

        self._s = requests.Session()
        self._s.headers["Authorization"] = f"Bearer {access_token}"
        self.account_id = (
            account_id if account_id.startswith("act_") else f"act_{account_id}"
        )
        self.base = f"https://graph.facebook.com/{self.API_VERSION}"

    def _req(self, method: str, url: str, body: dict | None = None) -> dict:
        from syncmaven_spark.sinks.base import RateLimitError, parse_retry_after

        resp = self._s.request(method, url, json=body, timeout=30)
        if resp.status_code == 429:
            # Graph API throttling backs off via the flush-layer retry
            # instead of aborting the sync on a bare HTTPError
            raise RateLimitError(
                "facebook-ads rate limited",
                retry_after_ms=parse_retry_after(resp.headers.get("Retry-After")),
            )
        resp.raise_for_status()
        return resp.json()

    def list_audiences(self) -> list[dict]:
        return self._req(
            "GET",
            f"{self.base}/{self.account_id}/customaudiences?fields=id,name,description",
        ).get("data", [])

    def create_audience(self, name: str, description: str) -> str:
        return self._req(
            "POST",
            f"{self.base}/{self.account_id}/customaudiences",
            {
                "name": name,
                "description": description,
                "subtype": "CUSTOM",
                "customer_file_source": "USER_PROVIDED_ONLY",
                "retention_days": 30,
            },
        )["id"]

    def add_users(self, audience_id: str, session: dict, payload: dict) -> None:
        self._req(
            "POST",
            f"{self.base}/{audience_id}/users",
            {"session": session, "payload": payload},
        )

    def delete_users(self, audience_id: str, payload: dict) -> None:
        self._req("DELETE", f"{self.base}/{audience_id}/users", {"payload": payload})


class FacebookAudienceStream(BatchingOutputStream):
    def __init__(
        self,
        client: FacebookClient,
        store: Any,
        sync_id: str,
        stream_id: str,
        options: dict[str, Any],
        restart: bool,
        session_id: int,
    ) -> None:
        super().__init__(MAX_BATCH_SIZE)
        self.client = client
        self.store = store
        self.rows_key = [f"syncId={sync_id}", f"stream={stream_id}", "last-synced-rows"]
        self.session_id = session_id
        self.batch_seq = 0

        audience_name = (
            options.get("audienceName")
            or f"audience-sync?syncId={sync_id}&streamId={stream_id}"
        )
        existing = {a["name"]: a["id"] for a in client.list_audiences()}
        self.audience_id = existing.get(audience_name)
        if not self.audience_id:
            self.audience_id = client.create_audience(
                audience_name,
                f"This audience is created by syncmaven_spark for stream {stream_id} "
                f"with syncId {sync_id}. Don't change its name!",
            )

        if not options.get("doNotClearAudience") and not restart:
            self._clear_previous()

    def _clear_previous(self) -> None:
        for batch in self.store.stream_batch(self.rows_key, MAX_BATCH_SIZE):
            emails = [value["email"] for _, value in batch if isinstance(value, dict)]
            if emails:
                # NOTE the flat `data` (vs add_users' nested [[hash]] rows)
                # is REFERENCE PARITY — facebook-ads/src/index.ts:86-87
                # deletes flat hashes while :143-144 adds nested rows; do
                # not "fix" one to match the other.
                self.client.delete_users(
                    self.audience_id,
                    {
                        "schema": ["EMAIL_SHA256"],
                        "data": [_email_sha256(e) for e in emails],
                    },
                )
        self.store.delete_by_prefix(self.rows_key)

    def process_batch(self, rows: list[dict[str, Any]]) -> None:
        self.batch_seq += 1
        payload = {
            "schema": ["EMAIL_SHA256"],
            "data": [[_email_sha256(r["email"])] for r in rows],
        }
        session = {
            "session_id": self.session_id,
            "batch_seq": self.batch_seq,
            "last_batch_flag": False,  # reference never finalizes either
        }
        self.client.add_users(self.audience_id, session, payload)
        for r in rows:
            self.store.set([*self.rows_key, r["email"]], {"email": r["email"]})
        self.stats.success += len(rows)


@register("facebook-ads")
class FacebookAdsDestination(DestinationProvider):
    name = "facebook-ads"

    def __init__(self) -> None:
        self._opens: dict[tuple[str, str], int] = {}
    credentials_schema = {
        "type": "object",
        "properties": {"accessToken": {"type": "string"}, "accountId": {"type": "string"}},
        "required": ["accessToken", "accountId"],
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
        client = credentials.get("_client") or RestFacebookClient(
            credentials["accessToken"], credentials["accountId"]
        )
        # Deterministic per-sync session id (reference uses a random one,
        # index.ts:33; determinism keeps restarts idempotent server-side).
        # session id per stream OPEN, not per (sync, stream): a checkpoint
        # continuation reopens the stream with batch_seq restarting at 1,
        # and reusing the previous open's session_id would collide on
        # (session_id, batch_seq) with DIFFERENT data — under Facebook's
        # replay dedup the continuation batches would be silently
        # discarded. A crash-restart builds a fresh provider (opens=0
        # again), so identical replayed batches still dedup server-side —
        # the property the deterministic id exists for (the reference uses
        # Math.random() and has no replay dedup at all).
        open_idx = self._opens.get((sync_id, stream_name), 0)
        self._opens[(sync_id, stream_name)] = open_idx + 1
        session_id = int(
            hashlib.md5(
                f"{sync_id}:{stream_name}:{open_idx}".encode()
            ).hexdigest()[:12],
            16,
        )
        return FacebookAudienceStream(
            client, store, sync_id, stream_name, options or {}, restart, session_id
        )
