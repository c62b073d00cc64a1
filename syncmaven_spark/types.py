"""Type system: reference 5-type generic column model ↔ Spark types,
JSON-Schema → StructType conversion, and ISO-8601-millis JSON encoding.

Reference semantics being preserved (citations into /root/reference):
- The generic column model is exactly five types — integer / string /
  boolean / date / float — and unknown native types degrade to string
  (packages/core/src/datasources/types.ts:1-8, pg.ts:52-61).
- Dates serialize as ISO-8601 with *millisecond* precision and a ``Z``
  suffix on the sink boundary (packages/core/src/commands/sync.ts:328-332,
  __tests__/test-data/postgres/expected_part1_date_cursor.ndjson).
- Sink row schemas arrive as JSON Schema with ``additionalProperties: true``
  (packages/node-cdk/src/std.ts:90-99, packages/core/src/lib/uniparser.ts:40-81).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import math
from typing import Any

from pyspark.sql import types as T

# --- generic 5-type model -------------------------------------------------

GENERIC_TYPES = ("integer", "string", "boolean", "date", "float")

_GENERIC_TO_SPARK: dict[str, T.DataType] = {
    "integer": T.LongType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "date": T.TimestampType(),
    "float": T.DoubleType(),
}


def generic_to_spark(generic: str) -> T.DataType:
    """Map a generic column type to its Spark type.

    Unknown types degrade to string, mirroring the reference's fallback rule
    (pg.ts:52-61: "everything else → string").
    """
    return _GENERIC_TO_SPARK.get(generic, T.StringType())


def spark_to_generic(dt: T.DataType) -> str:
    """Map a Spark type to the reference's 5-type generic model."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "date"
    return "string"


# --- warehouse-native → generic maps (§1.2) ------------------------------

_BIGQUERY_TO_GENERIC = {
    "STRING": "string",
    "INT64": "integer",
    "INTEGER": "integer",
    "NUMERIC": "float",
    "FLOAT64": "float",
    "FLOAT": "float",
    "BOOL": "boolean",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "DATETIME": "date",
    "TIMESTAMP": "date",
}


def native_to_generic(source: str, native_type: str, scale: int = 0) -> str:
    """Map a warehouse-native column type to the 5-type generic model.

    - postgres: name-prefix match on pg_type names; unknown → string
      (pg.ts:52-61),
    - bigquery: exact-name map; unknown → string (bigquery.ts:105-123),
    - snowflake: date/time → date, number with scale>0 → float else integer,
      boolean → boolean, default string (snowlake.ts:137-160).
    """
    t = native_type.strip().lower()
    if source == "postgres":
        if t.startswith(("text", "varchar", "char", "name", "uuid", "json")):
            return "string"
        if t.startswith(("int", "serial", "bigserial", "oid")):
            return "integer"
        if t.startswith("bool"):
            return "boolean"
        if t.startswith(("timestamp", "date")):
            return "date"
        if t.startswith(("float", "numeric", "double", "real")):
            return "float"
        return "string"
    if source == "bigquery":
        return _BIGQUERY_TO_GENERIC.get(native_type.strip().upper(), "string")
    if source == "snowflake":
        if any(k in t for k in ("date", "time")):
            return "date"
        if any(k in t for k in ("number", "numeric", "int", "decimal", "fixed")):
            return "float" if scale > 0 else "integer"
        if "boolean" in t:
            return "boolean"
        if any(k in t for k in ("float", "double", "real")):
            return "float"
        return "string"
    return "string"


# --- JSON Schema → StructType --------------------------------------------

_JSON_TYPE_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def _json_schema_field_type(prop: dict[str, Any]) -> T.DataType:
    """Best-effort Spark type for one JSON-Schema property.

    Union types (``["string","integer"]``, Zod ``z.union``) and untyped
    properties degrade to string — the widest type under the reference's
    model, where every sink ultimately JSON-serializes values anyway.
    """
    jtype = prop.get("type")
    if isinstance(jtype, list):
        non_null = [t for t in jtype if t != "null"]
        if len(non_null) == 1:
            jtype = non_null[0]
        else:
            return T.StringType()
    if jtype == "array":
        item = prop.get("items") or {}
        return T.ArrayType(_json_schema_field_type(item if isinstance(item, dict) else {}))
    if jtype == "object":
        return json_schema_to_struct(prop)
    if jtype == "string" and prop.get("format") in ("date", "date-time"):
        return T.TimestampType()
    return _JSON_TYPE_TO_SPARK.get(jtype, T.StringType())


def json_schema_to_struct(schema: dict[str, Any]) -> T.StructType:
    """Convert a destination-declared JSON Schema into a Spark StructType.

    Required fields become non-nullable StructFields; everything else is
    nullable. ``additionalProperties`` passthrough (the reference's
    ``.catchall(z.any())`` custom-attribute path) is *not* representable in a
    static struct — the engine keeps full-width DataFrames and sinks split
    known/custom columns instead (see sinks.base.split_known_columns).
    """
    required = set(schema.get("required") or [])
    fields = [
        T.StructField(name, _json_schema_field_type(prop or {}), name not in required)
        for name, prop in (schema.get("properties") or {}).items()
    ]
    return T.StructType(fields)


# --- ISO-8601 millis serialization ---------------------------------------

ISO_MILLIS_SPARK_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def iso_millis(value: _dt.datetime | _dt.date) -> str:
    """Serialize a timestamp the way the reference's JS ``Date.toISOString``
    does: millisecond precision, ``Z`` suffix (sync.ts:328-332)."""
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return value.strftime("%Y-%m-%dT%H:%M:%S.") + f"{value.microsecond // 1000:03d}Z"
    return value.strftime("%Y-%m-%dT00:00:00.000Z")


class RowJSONEncoder(json.JSONEncoder):
    """JSON encoder matching the reference's NDJSON sink output: dates as
    ISO-millis-Z strings, NaN/Inf as null (JSON.stringify semantics)."""

    def default(self, o: Any) -> Any:
        if isinstance(o, (_dt.datetime, _dt.date)):
            return iso_millis(o)
        if isinstance(o, (bytes, bytearray)):
            # bytearray too: Spark hands BinaryType columns to Python as
            # bytearray, which is NOT an instance of bytes — without this
            # any sync selecting a binary column crashed the driver-path
            # validator and the parity sink (round-5 end-to-end test)
            return bytes(o).decode("utf-8", errors="replace")
        if isinstance(o, _decimal.Decimal):
            # JS-number semantics (JSON.stringify drops decimal scale:
            # Number("0.00") → 0). DecimalType rows otherwise crash the
            # parity sink outright (round-5 end-to-end decimal sync test).
            # Values beyond double precision lose digits HERE only — the
            # distributed writer (Spark JSON) keeps exact decimal text.
            return float(o)
        return super().default(o)

    def iterencode(self, o: Any, _one_shot: bool = False):
        return super().iterencode(_sanitize_floats(o), _one_shot)


def _sanitize_floats(o: Any) -> Any:
    if isinstance(o, float) and (math.isnan(o) or math.isinf(o)):
        return None
    if isinstance(o, dict):
        return {k: _sanitize_floats(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_sanitize_floats(v) for v in o]
    return o


def row_to_json(row: dict[str, Any]) -> str:
    """One NDJSON line for one row, key order preserved (JS object order)."""
    return json.dumps(row, cls=RowJSONEncoder, ensure_ascii=False, separators=(",", ":"))


# --- parity JSON-image helpers ---------------------------------------------
# Both sink serialization (sinks/file.py) and vectorized validation
# (validate.py) must produce the SAME JSON image of a row as the driver
# path's RowJSONEncoder: JSON.stringify renders NaN/Infinity as null at any
# nesting depth, while Spark's JSON writer/to_json would emit the (invalid
# JSON, and string-typed after re-parse) token "NaN".


def contains_float(dtype: T.DataType) -> bool:
    """True when ``dtype`` holds a float/double anywhere inside it."""
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return True
    if isinstance(dtype, T.ArrayType):
        return contains_float(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return contains_float(dtype.valueType)
    if isinstance(dtype, T.StructType):
        return any(contains_float(f.dataType) for f in dtype.fields)
    return False


def scrub_nonfinite(col, dtype: T.DataType):
    """NULL every non-finite float/double anywhere in the value —
    recursing through struct/array/map — matching JSON.stringify, which
    renders NaN/Infinity as null at any nesting depth."""
    from pyspark.sql import functions as F

    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return F.when(
            F.isnan(col) | (F.abs(col) == float("inf")), None
        ).otherwise(col)
    if isinstance(dtype, T.ArrayType) and contains_float(dtype.elementType):
        return F.transform(col, lambda x: scrub_nonfinite(x, dtype.elementType))
    if isinstance(dtype, T.MapType) and contains_float(dtype.valueType):
        return F.transform_values(
            col, lambda _, v: scrub_nonfinite(v, dtype.valueType)
        )
    if isinstance(dtype, T.StructType) and contains_float(dtype):
        rebuilt = F.struct(
            *[
                scrub_nonfinite(col[f.name], f.dataType).alias(f.name)
                for f in dtype.fields
            ]
        )
        # a NULL struct must stay NULL, not become a struct of NULLs
        return F.when(col.isNull(), F.lit(None).cast(dtype)).otherwise(rebuilt)
    return col


def scrubbed_columns(df) -> list:
    """The full column list of ``df`` with non-finite floats nulled —
    drop-in projection for ``df.select(*scrubbed_columns(df))``."""
    from pyspark.sql import functions as F

    return [
        scrub_nonfinite(F.col(f.name), f.dataType).alias(f.name)
        if contains_float(f.dataType)
        else F.col(f.name)
        for f in df.schema.fields
    ]
