"""File NDJSON sink — the golden-file test destination.

Reference: ``packages/connectors/file/src/index.ts:16-46`` — stream ``raw``
appends each row as one NDJSON line to a local file; dates serialize as
ISO-8601-millis-``Z`` (§1.2 of SURVEY).

Two write paths:
- parity mode (this class): driver-side ordered append, byte-identical to the
  reference's output — used by golden-file tests and small API-bound syncs.
- scale mode: ``write_ndjson_distributed`` writes the same format via
  ``df.write.json`` with the ISO-millis timestamp format, one file per
  partition — the path a 100 TB sync takes (order within partition only).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame

from syncmaven_spark.sinks import register
from syncmaven_spark.sinks.base import (
    ANY_OBJECT_SCHEMA,
    DestinationProvider,
    OutputStream,
    StreamSpec,
)
from syncmaven_spark.types import ISO_MILLIS_SPARK_FMT, row_to_json


class FileOutputStream(OutputStream):
    def __init__(self, path: str, append: bool = True) -> None:
        super().__init__()
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fh = open(path, "a" if append else "w", encoding="utf-8")

    def handle_row(self, row: dict[str, Any]) -> None:
        self.stats.received += 1
        self._fh.write(row_to_json(row) + "\n")
        self.stats.success += 1

    def finish(self):
        self._fh.close()
        return self.stats


@register("file")
class FileDestination(DestinationProvider):
    name = "file"
    credentials_schema = {
        "type": "object",
        "properties": {"filename": {"type": "string", "description": "output NDJSON file path"},
                        "directory": {"type": "string", "description": "scale mode: partition-parallel output dir"}},
    }

    def streams(self) -> list[StreamSpec]:
        return [StreamSpec(name="raw", row_type=ANY_OBJECT_SCHEMA)]

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
        path = credentials.get("filename") or credentials.get("path")
        if not path:
            raise ValueError("file destination requires credentials.filename")
        # Truncate on the run's first open so each run's file holds exactly
        # that run's rows (golden-file contract); append across checkpointed
        # stream restarts within the same run.
        return FileOutputStream(path, append=restart)


def write_ndjson_distributed(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Executor-parallel NDJSON, format-identical to the parity path's
    RowJSONEncoder: ISO-millis timestamps, dates widened to
    'yyyy-MM-ddT00:00:00.000Z', and NaN/Infinity doubles nulled at ANY
    nesting depth — top-level and inside struct/array/map — (the parity
    encoder applies JSON.stringify semantics; Spark's JSON writer would
    emit literal "NaN", which is invalid JSON).

    Known divergences from the parity encoder, both documented rather than
    papered over: BinaryType serializes as base64 here (Spark's JSON
    writer) vs utf-8-with-replacement on the parity path, and DecimalType
    keeps exact decimal text here vs JS-number formatting there. Neither
    type appears in the reference's 5-type column model; pick ONE path per
    sync if byte-identical output matters for such columns."""
    from syncmaven_spark.types import scrubbed_columns

    (
        df.select(*scrubbed_columns(df))
        .write.mode(mode)
        .option("timestampFormat", ISO_MILLIS_SPARK_FMT)
        .option("timestampNTZFormat", ISO_MILLIS_SPARK_FMT)
        .option("dateFormat", "yyyy-MM-dd'T00:00:00.000Z'")
        .option("ignoreNullFields", "false")
        .json(path)
    )
