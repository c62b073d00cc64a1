"""Intercom destination: contacts + companies upsert with conflict recovery.

Reference: ``packages/connectors/intercom/src/index.ts`` —
- same ID-map upsert pattern as HubSpot (index.ts:140-204),
- create hitting a conflict error recovers the existing ID from the error
  message (``... contact matching those details already exists with id=X``),
  un-archiving first when the match says "An archived" (index.ts:18,170-187,
  206-213),
- update hitting 404 falls back to create (index.ts:198-203),
- ``signed_up_at`` / ``last_seen_at`` / ``remote_created_at`` convert to
  epoch seconds (index.ts:226-227, 355),
- HTTP 429 surfaces as RateLimitError (index.ts:326-333),
- custom fields ride under ``custom_attributes`` (index.ts:228-230).
"""

from __future__ import annotations

import logging

import datetime as _dt
import re
from typing import Any, Protocol
from urllib.parse import quote as _quote

from syncmaven_spark.sinks import register
from syncmaven_spark.sinks.base import (
    DestinationProvider,
    OutputStream,
    RateLimitError,
    StreamSpec,
    with_rate_limit_retry,
)

ALREADY_EXISTS_RE = re.compile(
    r"(An archived)?.*contact matching those details already exists with id=(\w+)"
)

CONTACT_ROW_TYPE = {
    "type": "object",
    "properties": {
        "external_id": {"type": ["string", "integer"]},
        "email": {"type": "string"},
        "name": {"type": ["string", "null"]},
        "signed_up_at": {},
        "last_seen_at": {},
        "company_ids": {},
    },
    "required": ["external_id", "email"],
    "additionalProperties": True,
}

COMPANY_ROW_TYPE = {
    "type": "object",
    "properties": {
        "company_id": {"type": ["string", "integer"]},
        "name": {"type": "string"},
        "plan": {"type": ["string", "null"]},
        "size": {"type": ["number", "null"]},
        "remote_created_at": {},
    },
    "required": ["company_id", "name"],
    "additionalProperties": True,
}


log = logging.getLogger("syncmaven_spark.sinks.intercom")


class IntercomApiError(Exception):
    def __init__(self, status: int, errors: list[dict] | None = None, message: str = ""):
        super().__init__(message or f"intercom API error {status}")
        self.status = status
        self.errors = errors or []


class IntercomClient(Protocol):
    def post(self, path: str, body: dict) -> dict: ...

    def put(self, path: str, body: dict) -> dict: ...

    def get(self, path: str) -> dict: ...


class RestIntercomClient:
    BASE = "https://api.intercom.io"

    def __init__(self, access_token: str) -> None:
        import requests

        self._s = requests.Session()
        self._s.headers.update(
            {"Authorization": f"Bearer {access_token}", "Accept": "application/json"}
        )

    def _req(self, method: str, path: str, body: dict) -> dict:
        from syncmaven_spark.sinks.base import parse_retry_after

        resp = self._s.request(method, self.BASE + path, json=body, timeout=30)
        if resp.status_code == 429:
            raise RateLimitError(
                "Rate limit exceeded",
                retry_after_ms=parse_retry_after(resp.headers.get("Retry-After")),
            )
        if resp.status_code >= 400:
            try:
                errors = resp.json().get("errors", [])
            except Exception:
                errors = []
            raise IntercomApiError(resp.status_code, errors, resp.text[:500])
        return resp.json()

    def post(self, path: str, body: dict) -> dict:
        return self._req("POST", path, body)

    def put(self, path: str, body: dict) -> dict:
        return self._req("PUT", path, body)

    def get(self, path: str) -> dict:
        return self._req("GET", path, None)


def to_epoch_seconds(value: Any) -> int | None:
    """Coercible-date → epoch seconds (index.ts:226-227)."""
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return int(value)
    if isinstance(value, _dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
        return int(value.timestamp())
    if isinstance(value, _dt.date):
        return int(
            _dt.datetime(value.year, value.month, value.day, tzinfo=_dt.timezone.utc)
            .timestamp()
        )
    if isinstance(value, str):
        parsed = _dt.datetime.fromisoformat(value.replace("Z", "+00:00"))
        if parsed.tzinfo is None:
            # tz-less strings are UTC, same as the naive-datetime branch
            # above — .timestamp() on a naive value would interpret it in
            # the HOST's timezone, shifting epochs per deployment machine
            parsed = parsed.replace(tzinfo=_dt.timezone.utc)
        return int(parsed.timestamp())
    raise ValueError(f"cannot convert {value!r} to epoch seconds")


from syncmaven_spark.sinks.base import StoreIdMap as _IdMap  # shared impl


class IntercomContactsStream(OutputStream):
    DECLARED = {"external_id", "email", "name", "company_ids", "signed_up_at", "last_seen_at"}

    def __init__(self, client: IntercomClient, store: Any, sync_id: str) -> None:
        super().__init__()
        self.client = client
        self.contacts_map = _IdMap(store, sync_id, "contactsMap")
        self.companies_map = _IdMap(store, sync_id, "companiesMap")

    def _add(self, contact: dict) -> str:
        try:
            res = self.client.post("/contacts", contact)
        except IntercomApiError as e:
            for err in e.errors:
                if err.get("code") == "conflict":
                    match = ALREADY_EXISTS_RE.search(err.get("message", ""))
                    if match:
                        if match.group(1):
                            self.client.post(
                                f"/contacts/{match.group(2)}/unarchive", {}
                            )
                        return self._update(match.group(2), contact)
            raise
        intercom_id = str(res["id"])
        self.contacts_map.set(contact["external_id"], intercom_id)
        return intercom_id

    def _update(self, intercom_id: str, contact: dict) -> str:
        try:
            self.client.put(f"/contacts/{intercom_id}", contact)
        except IntercomApiError as e:
            if e.status == 404:
                return self._add(contact)
            raise
        self.contacts_map.set(contact["external_id"], intercom_id)
        return intercom_id

    def handle_row(self, row: dict[str, Any]) -> None:
        self.stats.received += 1
        row = {k: v for k, v in row.items() if v is not None}
        custom = {k: v for k, v in row.items() if k not in self.DECLARED}
        contact = {
            "external_id": str(row["external_id"]),
            "email": row["email"],
            **({"name": row["name"]} if row.get("name") else {}),
            **(
                {"signed_up_at": to_epoch_seconds(row["signed_up_at"])}
                if row.get("signed_up_at") is not None
                else {}
            ),
            **(
                {"last_seen_at": to_epoch_seconds(row["last_seen_at"])}
                if row.get("last_seen_at") is not None
                else {}
            ),
            **({"custom_attributes": custom} if custom else {}),
        }
        intercom_id = self.contacts_map.get(contact["external_id"])
        if intercom_id:
            intercom_id = with_rate_limit_retry(self._update, intercom_id, contact)
        else:
            intercom_id = with_rate_limit_retry(self._add, contact)
        # contact ↔ company association (index.ts:231-296): resolve each
        # company_id to its Intercom id (companiesMap cache + GET
        # fallback) and attach — previously companies_map was built but
        # never used, silently dropping every membership
        for company_intercom_id in self._resolve_companies(row.get("company_ids")):
            with_rate_limit_retry(
                self.client.post,
                f"/contacts/{intercom_id}/companies",
                {"id": company_intercom_id},
            )
        self.stats.success += 1

    def _resolve_companies(self, company_ids: Any) -> list[str]:
        if not company_ids:
            return []
        ids = (
            list(company_ids)
            if isinstance(company_ids, (list, tuple))
            else [company_ids]
        )
        resolved: list[str] = []
        for raw in ids:
            key = str(raw)
            intercom_id = self.companies_map.get(key)
            if not intercom_id:
                # URL-encode: a company_id containing '&'/'#'/'+'/' ' would
                # otherwise change the query string (wrong company matched,
                # or the id truncated at a fragment)
                res = with_rate_limit_retry(
                    self.client.get,
                    f"/companies?company_id={_quote(key, safe='')}",
                ) or {}
                # the lookup may return the company object directly or a
                # {data: {...}} wrapper depending on API version
                body = res.get("data") if isinstance(res.get("data"), dict) else res
                intercom_id = str(body.get("id")) if body.get("id") else None
                if not intercom_id:
                    log.warning("company with company_id=%s not found", key)
                    continue
                self.companies_map.set(key, intercom_id)
            resolved.append(intercom_id)
        return resolved


class IntercomCompaniesStream(OutputStream):
    DECLARED = {"company_id", "name", "plan", "size", "remote_created_at"}

    def __init__(self, client: IntercomClient, store: Any, sync_id: str) -> None:
        super().__init__()
        self.client = client
        self.companies_map = _IdMap(store, sync_id, "companiesMap")

    def handle_row(self, row: dict[str, Any]) -> None:
        self.stats.received += 1
        row = {k: v for k, v in row.items() if v is not None}
        custom = {k: v for k, v in row.items() if k not in self.DECLARED}
        company = {
            "company_id": str(row["company_id"]),
            "name": row["name"],
            **({"plan": row["plan"]} if row.get("plan") else {}),
            **({"size": row["size"]} if row.get("size") is not None else {}),
            **(
                {"remote_created_at": to_epoch_seconds(row["remote_created_at"])}
                if row.get("remote_created_at") is not None
                else {}
            ),
            **({"custom_attributes": custom} if custom else {}),
        }
        # Intercom company POST is itself an upsert by company_id.
        res = with_rate_limit_retry(self.client.post, "/companies", company)
        self.companies_map.set(company["company_id"], str(res["id"]))
        self.stats.success += 1


@register("intercom")
class IntercomDestination(DestinationProvider):
    name = "intercom"
    credentials_schema = {
        "type": "object",
        "properties": {"accessToken": {"type": "string", "description": "Intercom API access token"}},
        "required": ["accessToken"],
    }

    def streams(self) -> list[StreamSpec]:
        return [
            StreamSpec(name="contacts", row_type=CONTACT_ROW_TYPE),
            StreamSpec(name="companies", row_type=COMPANY_ROW_TYPE),
        ]

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
        client = credentials.get("_client") or RestIntercomClient(
            credentials["accessToken"]
        )
        if stream_name == "contacts":
            return IntercomContactsStream(client, store, sync_id)
        return IntercomCompaniesStream(client, store, sync_id)
