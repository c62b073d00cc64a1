"""HubSpot destination: contacts + companies upsert-by-external-id.

Reference: ``packages/connectors/hubspot/src/index.ts`` —
- ID maps in memory + state store under ``["syncId=<id>", "contactsMap"|
  "companiesMap", <external_id>]`` (index.ts:169-190),
- lookup order: map → search API by ``external_id`` → create; update hitting
  404 falls back to create (index.ts:240-304, 220-228),
- custom-attribute policy ``create-unknown`` (default) / ``skip-unknown`` /
  ``fail-on-unknown`` with on-the-fly property creation (index.ts:83-166),
- name split into firstname/lastname (index.ts:66-81),
- contact↔company association for each ``company_ids`` entry, scalar or
  array (index.ts:231-238, 243-284).

The API boundary is the ``HubspotClient`` protocol; the default impl calls
the public HubSpot v3 REST API with ``requests``. Tests inject a fake.
"""

from __future__ import annotations

from typing import Any, Protocol

from syncmaven_spark.sinks import register
from syncmaven_spark.sinks.base import (
    DestinationProvider,
    HaltError,
    OutputStream,
    StreamSpec,
)
from syncmaven_spark.sinks.util import as_id_list, split_name_py

CONTACT_ROW_TYPE = {
    "type": "object",
    "properties": {
        "id": {"type": ["string", "integer"]},
        "name": {"type": ["string", "null"]},
        "email": {"type": "string"},
        "company_ids": {
            "type": ["string", "integer", "array", "null"],
            "items": {"type": ["string", "integer"]},
        },
    },
    "required": ["id", "email"],
    "additionalProperties": True,
}

COMPANY_ROW_TYPE = {
    "type": "object",
    "properties": {
        "id": {"type": ["string", "integer"]},
        "name": {"type": "string"},
    },
    "required": ["id", "name"],
    "additionalProperties": True,
}

CUSTOM_ATTRIBUTE_POLICIES = ("skip-unknown", "create-unknown", "fail-on-unknown")


class NotFound(Exception):
    """404 from the destination API."""


class HubspotClient(Protocol):
    def get_all_properties(self, model: str) -> list[str]: ...

    def create_property(self, model: str, name: str) -> None: ...

    def search_by_field(self, model: str, field: str, value: str) -> str | None: ...

    def create(self, model: str, properties: dict[str, Any]) -> str: ...

    def update(self, model: str, object_id: str, properties: dict[str, Any]) -> str: ...

    def associate(self, company_id: str, contact_id: str) -> None: ...


class RestHubspotClient:
    """Public HubSpot CRM v3 API over requests (api.hubapi.com)."""

    BASE = "https://api.hubapi.com"
    _PATHS = {"contacts": "contacts", "company": "companies"}

    def __init__(self, access_token: str) -> None:
        import requests

        self._s = requests.Session()
        self._s.headers["Authorization"] = f"Bearer {access_token}"

    def _req(self, method: str, path: str, **kwargs) -> dict:
        from syncmaven_spark.sinks.base import RateLimitError, parse_retry_after

        resp = self._s.request(method, self.BASE + path, timeout=30, **kwargs)
        if resp.status_code == 404:
            raise NotFound(path)
        if resp.status_code == 429:
            raise RateLimitError(
                "hubspot rate limit",
                retry_after_ms=parse_retry_after(resp.headers.get("Retry-After")),
            )
        resp.raise_for_status()
        return resp.json() if resp.content else {}

    def get_all_properties(self, model: str) -> list[str]:
        data = self._req("GET", f"/crm/v3/properties/{self._PATHS[model]}")
        return [p["name"] for p in data.get("results", [])]

    def create_property(self, model: str, name: str) -> None:
        group = "contactinformation" if model == "contacts" else "companyinformation"
        self._req(
            "POST",
            f"/crm/v3/properties/{self._PATHS[model]}",
            json={
                "name": name,
                "label": name,
                "type": "string",
                "fieldType": "text",
                "groupName": group,
            },
        )

    def search_by_field(self, model: str, field: str, value: str) -> str | None:
        data = self._req(
            "POST",
            f"/crm/v3/objects/{self._PATHS[model]}/search",
            json={
                "filterGroups": [
                    {
                        "filters": [
                            {"propertyName": field, "operator": "EQ", "value": value}
                        ]
                    }
                ],
                "limit": 10,
            },
        )
        results = data.get("results") or []
        return results[0]["id"] if results else None

    def create(self, model: str, properties: dict[str, Any]) -> str:
        data = self._req(
            "POST",
            f"/crm/v3/objects/{self._PATHS[model]}",
            json={"properties": properties, "associations": []},
        )
        return data["id"]

    def update(self, model: str, object_id: str, properties: dict[str, Any]) -> str:
        self._req(
            "PATCH",
            f"/crm/v3/objects/{self._PATHS[model]}/{object_id}",
            json={"properties": properties},
        )
        return object_id

    def associate(self, company_id: str, contact_id: str) -> None:
        self._req(
            "PUT",
            f"/crm/v4/objects/companies/{company_id}/associations/contacts/{contact_id}",
            json=[{"associationCategory": "HUBSPOT_DEFINED", "associationTypeId": 2}],
        )


from syncmaven_spark.sinks.base import StoreIdMap as _IdMap  # shared impl


class _BaseHubspotStream(OutputStream):
    model: str
    declared: set[str]

    def __init__(
        self,
        client: HubspotClient,
        store: Any,
        sync_id: str,
        options: dict[str, Any],
    ) -> None:
        super().__init__()
        self.client = client
        self.store = store
        self.sync_id = sync_id
        self.policy = options.get("customAttributesPolicy", "create-unknown")
        if self.policy not in CUSTOM_ATTRIBUTE_POLICIES:
            raise HaltError(
                f"Invalid customAttributesPolicy {self.policy}. "
                f"Valid values are {', '.join(CUSTOM_ATTRIBUTE_POLICIES)}"
            )
        self.known_attributes = set(self.client.get_all_properties(self.model))
        self._ensure_attribute("external_id")

    def _ensure_attribute(self, key: str) -> None:
        if key not in self.known_attributes:
            self.client.create_property(self.model, key)
            self.known_attributes.add(key)

    def _handle_custom_attributes(self, custom: dict[str, Any]) -> dict[str, Any]:
        out = dict(custom)
        for key in list(out):
            if key in self.known_attributes:
                continue
            if self.policy == "skip-unknown":
                del out[key]
            elif self.policy == "fail-on-unknown":
                raise HaltError(
                    f"Unknown custom attribute {key}. Create it manually, or set "
                    "customAttributesPolicy to 'create-unknown'"
                )
            else:
                self._ensure_attribute(key)
        return out


class HubspotContactsStream(_BaseHubspotStream):
    model = "contacts"
    declared = {"id", "name", "email", "company_ids"}

    def __init__(self, client, store, sync_id, options) -> None:
        super().__init__(client, store, sync_id, options)
        self.contacts_map = _IdMap(store, sync_id, "contactsMap")
        self.companies_map = _IdMap(store, sync_id, "companiesMap")

    def handle_row(self, row: dict[str, Any]) -> None:
        self.stats.received += 1
        row = {k: v for k, v in row.items() if v is not None}
        external_id = str(row["id"])
        first, last = split_name_py(row.get("name"))
        known = {"email": row["email"]}
        custom = self._handle_custom_attributes(
            {k: v for k, v in row.items() if k not in self.declared}
        )
        properties = {
            "external_id": external_id,
            **({"firstname": first} if first else {}),
            **({"lastname": last} if last else {}),
            **known,
            **{k: str(v) for k, v in custom.items()},
        }

        company_hs_ids = []
        for cid in as_id_list(row.get("company_ids")):
            hs_id = self.companies_map.get(cid)
            if not hs_id:
                hs_id = self.client.search_by_field("company", "external_id", cid)
                if hs_id:
                    self.companies_map.set(cid, hs_id)
            if hs_id:
                company_hs_ids.append(hs_id)

        contact_id = self.contacts_map.get(external_id)
        if not contact_id:
            contact_id = self.client.search_by_field(
                "contacts", "external_id", external_id
            )
        if not contact_id:
            contact_id = self.client.create("contacts", properties)
        else:
            try:
                contact_id = self.client.update("contacts", contact_id, properties)
            except NotFound:
                contact_id = self.client.create("contacts", properties)
        self.contacts_map.set(external_id, contact_id)

        for company_id in company_hs_ids:
            self.client.associate(company_id, contact_id)
        self.stats.success += 1


class HubspotCompaniesStream(_BaseHubspotStream):
    model = "company"
    declared = {"id", "name"}

    def __init__(self, client, store, sync_id, options) -> None:
        super().__init__(client, store, sync_id, options)
        self.companies_map = _IdMap(store, sync_id, "companiesMap")

    def handle_row(self, row: dict[str, Any]) -> None:
        self.stats.received += 1
        row = {k: v for k, v in row.items() if v is not None}
        external_id = str(row["id"])
        custom = self._handle_custom_attributes(
            {k: v for k, v in row.items() if k not in self.declared}
        )
        properties = {
            "external_id": external_id,
            "name": row["name"],
            **{k: str(v) for k, v in custom.items()},
        }
        company_id = self.companies_map.get(external_id)
        if not company_id:
            company_id = self.client.search_by_field(
                "company", "external_id", external_id
            )
        if not company_id:
            company_id = self.client.create("company", properties)
        else:
            try:
                company_id = self.client.update("company", company_id, properties)
            except NotFound:
                company_id = self.client.create("company", properties)
        self.companies_map.set(external_id, company_id)
        self.stats.success += 1


@register("hubspot")
class HubspotDestination(DestinationProvider):
    name = "hubspot"
    credentials_schema = {
        "type": "object",
        "properties": {"accessToken": {"type": "string", "description": "HubSpot API access token"}},
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
        from syncmaven_spark.sinks.base import RetryingClient

        client = credentials.get("_client") or RestHubspotClient(
            credentials["accessToken"]
        )
        # every API call retries transparently on RateLimitError (429)
        client = RetryingClient(client)
        cls = (
            HubspotContactsStream
            if stream_name == "contacts"
            else HubspotCompaniesStream
        )
        return cls(client, store, sync_id, options or {})
