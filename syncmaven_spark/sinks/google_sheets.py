"""Google Sheets destination.

Reference: ``packages/connectors/google-sheets/src/`` —
- buffers **all** rows, writes once on finish (google-sheets.ts:50-52 —
  documented whole-result-in-RAM bound; this sink is for small syncs).
  ``streamingAppend: true`` in stream options opts into a bounded-memory
  chunked ``values.append`` mode instead (see GoogleSheetsAppendStream),
- ``to_table``: pivot row objects into a 2-D array with ragged-schema union
  (columns appear in first-seen order, missing cells filled with the empty
  value) and per-column type inference — string/number/boolean/date, ``?``
  suffix when the column has empties, mixed types → untyped
  (google-sheets.ts:39-91),
- dates are written as ``YYYY-MM-DD HH:mm:ss`` (google-sheets.ts:93-96),
- the target sheet is cleared, then header + rows written
  (google-sheets.ts:110-154).

The Sheets API client is injectable (``credentials["_client"]`` with a
``write_table(spreadsheet_id, sheet_name, header, rows)`` method). When no
client is injected, ``LiveSheetsClient`` is used: it issues the reference's
exact two requests (values.clear then values.update with valueInputOption=
RAW, google-sheets.ts:110-154) through ``googleapiclient`` when installed,
and raises with instructions otherwise.
"""

from __future__ import annotations

import datetime as _dt
import re as _re
from dataclasses import dataclass
from typing import Any, Protocol

from syncmaven_spark.sinks import register
from syncmaven_spark.sinks.base import (
    ANY_OBJECT_SCHEMA,
    DestinationProvider,
    OutputStream,
    StreamSpec,
)


@dataclass
class Table:
    header_names: list[str]
    column_types: list[str | None]
    data: list[list[Any]]


# the reference's isoDateRegex (google-sheets.ts:23): bare dates and
# T- or space-separated times both count
_ISO_DATE_RE = _re.compile(
    r"^\d{4}-\d{2}-\d{2}([T\s](\d{2}:\d{2}:\d{2}(\.\d+)?"
    r"(Z|[+-]\d{2}:\d{2})?)?)?$"
)


def _try_parse_date(val: Any) -> Any:
    """google-sheets.ts:28-37: ISO-8601 strings become datetimes (so the
    sheet write formats them as dates), everything else passes through."""
    if val is None or isinstance(val, (_dt.datetime, _dt.date)):
        return val
    text = str(val)
    if isinstance(val, str) and _ISO_DATE_RE.match(text):
        try:
            return _dt.datetime.fromisoformat(text.replace("Z", "+00:00"))
        except ValueError:
            return val
    return val


def to_table(
    rows_objects: list[dict[str, Any]],
    empty_val: Any = None,
    parse_dates: bool = False,
) -> Table:
    """Ragged-row schema union + column typing (google-sheets.ts:39-91)."""
    header_index: dict[str, int] = {}
    header_names: list[str] = []
    rows: list[list[Any]] = []
    for i, row in enumerate(rows_objects):
        if not isinstance(row, dict):
            raise TypeError(f"Rows must be objects (row #{i})")
        row_array = [empty_val] * len(header_names)
        for key, val in row.items():
            if not _is_allowed(val, empty_val):
                raise ValueError(
                    f"Invalid value in row #{i}: {type(val).__name__} - {val!r}"
                )
            idx = header_index.get(key)
            if idx is None:
                header_names.append(key)
                idx = header_index[key] = len(header_names) - 1
                row_array.append(empty_val)
                for r in rows:
                    r.append(empty_val)
            row_array[idx] = _try_parse_date(val) if parse_dates else val
        rows.append(row_array)

    column_types: list[str | None] = []
    for i in range(len(header_names)):
        values = [r[i] for r in rows]
        has_empty = any(v == empty_val or v is None for v in values)
        ctype = None
        if all(isinstance(v, str) or v == empty_val or v is None for v in values):
            ctype = "string"
        elif all(
            (isinstance(v, (int, float)) and not isinstance(v, bool))
            or v == empty_val
            or v is None
            for v in values
        ):
            ctype = "number"
        elif all(isinstance(v, bool) or v == empty_val or v is None for v in values):
            ctype = "boolean"
        elif all(
            isinstance(v, (_dt.datetime, _dt.date)) or v == empty_val or v is None
            for v in values
        ):
            ctype = "date"
        if ctype and has_empty:
            ctype += "?"
        column_types.append(ctype)
    return Table(header_names, column_types, rows)


def _is_allowed(val: Any, empty_val: Any) -> bool:
    return (
        val is None
        or val == empty_val
        or isinstance(val, (str, int, float, bool, _dt.datetime, _dt.date))
    )


def format_date_for_sheets(value: _dt.datetime | _dt.date) -> str:
    """``YYYY-MM-DD HH:mm:ss`` (google-sheets.ts:93-96)."""
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return value.strftime("%Y-%m-%d %H:%M:%S")
    return value.strftime("%Y-%m-%d 00:00:00")


class SheetsClient(Protocol):
    def write_table(
        self,
        spreadsheet_id: str,
        sheet_name: str,
        header: list[str],
        rows: list[list[Any]],
    ) -> None:
        """Clear the sheet, then write header + rows."""

    def append_rows(
        self,
        spreadsheet_id: str,
        sheet_name: str,
        rows: list[list[Any]],
    ) -> None:
        """Append rows below existing content (streamingAppend mode only;
        buffered-mode injected clients don't need to implement it)."""


class GoogleSheetsStream(OutputStream):
    def __init__(
        self, client: SheetsClient, spreadsheet_id: str, sheet_name: str
    ) -> None:
        super().__init__()
        self.client = client
        self.spreadsheet_id = spreadsheet_id
        self.sheet_name = sheet_name
        self._rows: list[dict[str, Any]] = []
        self._reported = 0

    def handle_row(self, row: dict[str, Any]) -> None:
        self.stats.received += 1
        self._rows.append(row)

    def finish(self):
        """Write the *whole* accumulated buffer (clear-and-rewrite sheet
        semantics) but report delta stats — the runner folds stats once per
        checkpointed finish, and this stream instance survives reopens."""
        from syncmaven_spark.sinks.base import StreamStats

        # parseDates: true like the reference sheet write (index.ts:126) —
        # ISO strings type as 'date' and render as dates in the sheet
        table = to_table(self._rows, parse_dates=True)
        data = [
            [
                format_date_for_sheets(v)
                if isinstance(v, (_dt.datetime, _dt.date))
                else ("" if v is None else v)
                for v in row
            ]
            for row in table.data
        ]
        self.client.write_table(
            self.spreadsheet_id, self.sheet_name, table.header_names, data
        )
        report = self.stats
        report.success = len(self._rows) - self._reported
        self._reported = len(self._rows)
        self.stats = StreamStats()
        return report

    def undelivered_rows(self) -> list[dict[str, Any]]:
        """Everything buffered since the last *successful* clear-and-rewrite
        (``_reported`` only advances after ``write_table`` returns). Without
        this override the base ``[]`` default would let ``halt_checkpoint``
        advance the cursor past every buffered row if a halt ever reached
        this fully-buffering stream (round-5 advice)."""
        return self._rows[self._reported:]


def _format_cell(v: Any) -> Any:
    if isinstance(v, (_dt.datetime, _dt.date)):
        return format_date_for_sheets(v)
    return "" if v is None else v


class GoogleSheetsAppendStream(OutputStream):
    """Opt-in bounded-memory mode (``streamingAppend: true`` stream option).

    The reference's sheet write is clear-then-rewrite-everything, which
    requires buffering the whole result driver-side (google-sheets.ts:50-52)
    — fine for the small syncs it targets, an unbounded driver buffer at
    scale. This mode holds at most ``appendBatchSize`` rows: the first
    flush clears the sheet and writes header + batch (same two requests as
    the buffered mode), every later flush is one ``values.append``. Dates
    format identically (``YYYY-MM-DD HH:mm:ss``, parseDates semantics).

    The column set is LOCKED when the header is written — either from the
    explicit ``columns`` stream option or from the first batch's first-seen
    key order (the same order ``to_table`` would assign). A later row
    introducing an unknown column raises: an appended sheet can't grow new
    columns retroactively, so the error names the remedies instead of
    silently dropping the value.
    """

    def __init__(
        self,
        client: SheetsClient,
        spreadsheet_id: str,
        sheet_name: str,
        batch_size: int = 1000,
        columns: list[str] | None = None,
    ) -> None:
        super().__init__()
        self.client = client
        self.spreadsheet_id = spreadsheet_id
        self.sheet_name = sheet_name
        self.batch_size = max(1, int(batch_size))
        self._columns: list[str] | None = list(columns) if columns else None
        self._colset: frozenset[str] = frozenset(self._columns or ())
        self._header_written = False
        self._buf: list[dict[str, Any]] = []
        self._failed: list[dict[str, Any]] = []

    def handle_row(self, row: dict[str, Any]) -> None:
        self.stats.received += 1
        self._buf.append(row)
        if len(self._buf) >= self.batch_size:
            self._flush()

    def _project(self, row: dict[str, Any]) -> list[Any]:
        assert self._columns is not None
        # same per-value contract as the buffered path's to_table: nested
        # dict/list/bytes cells raise a clean row error here instead of an
        # opaque 400 from the live values.append
        for key, val in row.items():
            if not _is_allowed(val, None):
                raise ValueError(
                    f"Invalid value for {key!r}: {type(val).__name__} - {val!r}"
                )
        unknown = [k for k in row if k not in self._colset]
        if unknown:
            raise ValueError(
                f"google-sheets streamingAppend: row has column(s) {unknown} "
                f"not in the locked header {self._columns}. Declare the full "
                "column set up front with the 'columns' stream option, or "
                "use the default buffered mode (streamingAppend: false), "
                "which unions ragged schemas before writing."
            )
        return [
            _format_cell(_try_parse_date(row.get(c))) for c in self._columns
        ]

    def _flush(self) -> None:
        """Pop-then-send, like ``BatchingOutputStream._flush``: a failed
        batch is stashed in ``_failed`` (and counted failed) so the halt
        checkpoint's ``undelivered_rows`` contract holds — without it a
        HaltError from the Sheets API would let the cursor advance past
        rows that never reached the sheet (round-5 diff review). API calls
        go through ``with_rate_limit_retry`` so a client raising
        ``RateLimitError`` (429) backs off like every other API sink."""
        from syncmaven_spark.sinks.base import with_rate_limit_retry

        if not self._buf:
            return
        batch, self._buf = self._buf, []
        try:
            if self._columns is None:
                # first-seen key order across the first batch — the order
                # to_table would assign these rows
                cols: list[str] = []
                seen: set[str] = set()
                for r in batch:
                    for k in r:
                        if k not in seen:
                            seen.add(k)
                            cols.append(k)
                self._columns = cols
                self._colset = frozenset(cols)
            data = [self._project(r) for r in batch]
            if not self._header_written:
                with_rate_limit_retry(
                    self.client.write_table,
                    self.spreadsheet_id, self.sheet_name, self._columns, data,
                )
                self._header_written = True
            else:
                with_rate_limit_retry(
                    self.client.append_rows,
                    self.spreadsheet_id, self.sheet_name, data,
                )
        except Exception:
            self.stats.failed += len(batch)
            self._failed.extend(batch)
            raise
        self.stats.success += len(data)

    def undelivered_rows(self) -> list[dict[str, Any]]:
        return self._failed + self._buf

    def finish(self):
        from syncmaven_spark.sinks.base import StreamStats

        self._flush()
        report = self.stats
        self.stats = StreamStats()
        return report


class LiveSheetsClient:
    """Default Sheets transport mirroring ``saveToGoogleSheets``
    (google-sheets.ts:110-154): clear the sheet range, then one
    ``values.update`` with ``valueInputOption=RAW`` carrying
    ``[header, *rows]``.

    ``service`` is injectable (anything shaped like googleapiclient's
    ``Resource``) so the request payloads are unit-testable without the
    googleapis library; without it, a real client is built from the
    ``serviceAccountKey`` credentials via ``googleapiclient`` +
    ``google.oauth2``, guarded by import.
    """

    SCOPES = ["https://www.googleapis.com/auth/spreadsheets"]

    def __init__(self, service_account_key: Any = None, service: Any = None):
        if service is not None:
            self._service = service
            return
        if service_account_key is None:
            raise NotImplementedError(
                "google-sheets live API needs credentials: provide "
                "serviceAccountKey (service-account JSON) or inject "
                "credentials['_client'] implementing write_table(...)"
            )
        try:
            from google.oauth2.service_account import Credentials  # type: ignore
            from googleapiclient.discovery import build  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "google-sheets live API requires googleapiclient + "
                "google-auth (pip install google-api-python-client "
                "google-auth); alternatively inject credentials['_client'] "
                "implementing write_table(spreadsheet_id, sheet_name, "
                "header, rows)"
            ) from e
        if isinstance(service_account_key, str):
            import json as _json

            service_account_key = _json.loads(service_account_key)
        creds = Credentials.from_service_account_info(
            service_account_key, scopes=self.SCOPES
        )
        self._service = build("sheets", "v4", credentials=creds)

    def write_table(
        self,
        spreadsheet_id: str,
        sheet_name: str,
        header: list[str],
        rows: list[list[Any]],
    ) -> None:
        values = self._service.spreadsheets().values()
        values.clear(spreadsheetId=spreadsheet_id, range=sheet_name).execute()
        values.update(
            spreadsheetId=spreadsheet_id,
            range=sheet_name,
            valueInputOption="RAW",
            body={"values": [header, *rows]},
        ).execute()

    def append_rows(
        self,
        spreadsheet_id: str,
        sheet_name: str,
        rows: list[list[Any]],
    ) -> None:
        # streamingAppend mode: one values.append per batch; the API finds
        # the first empty row after the existing table (INSERT_ROWS keeps
        # content below the table, if any, untouched)
        self._service.spreadsheets().values().append(
            spreadsheetId=spreadsheet_id,
            range=sheet_name,
            valueInputOption="RAW",
            insertDataOption="INSERT_ROWS",
            body={"values": rows},
        ).execute()


@register("google-sheets")
class GoogleSheetsDestination(DestinationProvider):
    name = "google-sheets"
    credentials_schema = {
        "type": "object",
        "properties": {"spreadsheetId": {"type": "string"},
                        "serviceAccountKey": {"type": ["object", "string"]}},
        "required": ["spreadsheetId"],
    }

    def __init__(self) -> None:
        self._live: dict[tuple[str, str], OutputStream] = {}

    def streams(self) -> list[StreamSpec]:
        return [StreamSpec(name="sheet", row_type=ANY_OBJECT_SCHEMA)]

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
        client = credentials.get("_client")
        if client is None:
            # import-guarded default: raises NotImplementedError with
            # instructions when googleapiclient isn't installed
            client = LiveSheetsClient(credentials.get("serviceAccountKey"))
        key = (sync_id, stream_name)
        if restart and key in self._live:
            # Checkpoint continuation: the sheet write is clear-then-rewrite-
            # everything, so the buffer must keep accumulating across stream
            # reopens — a fresh buffer would shrink the sheet to only the
            # rows since the last checkpoint (base.py restart contract).
            return self._live[key]
        # the reference takes both from STREAM OPTIONS
        # (GoogleSheetsStreamOptions: spreadsheetId + sheetName, both
        # required); credentials accepted as a fallback location, with a
        # clean error instead of a KeyError when neither has them
        opts = options or {}
        spreadsheet_id = opts.get("spreadsheetId") or credentials.get("spreadsheetId")
        if not spreadsheet_id:
            raise ValueError(
                "google-sheets needs 'spreadsheetId' in stream options (or "
                "connection credentials)"
            )
        sheet_name = (
            opts.get("sheetName")
            or credentials.get("sheetName")
            or "Sheet1"
        )
        if opts.get("streamingAppend"):
            cols = opts.get("columns")
            stream: OutputStream = GoogleSheetsAppendStream(
                client,
                spreadsheet_id,
                sheet_name,
                batch_size=int(opts.get("appendBatchSize", 1000)),
                columns=list(cols) if cols else None,
            )
        else:
            stream = GoogleSheetsStream(client, spreadsheet_id, sheet_name)
        self._live[key] = stream
        return stream
