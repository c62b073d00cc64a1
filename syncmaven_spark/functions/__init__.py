"""Engine-owned scalar function library (SURVEY §2D 'string/date/math')."""

from syncmaven_spark.functions.identity import (  # noqa: F401
    email_hash,
    normalize_email,
    split_name,
)
