"""Identity helpers as native Spark column expressions.

Reference: ``packages/node-cdk/src/index.ts:131-145`` —
``splitName(full) → {first, last}``, ``normalizeEmail`` (lowercase + trim),
``emailHash`` (SHA-256 of the normalized email). All three stay JVM-side
(whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_name(full_name: Column | str) -> tuple[Column, Column]:
    """``first`` = text before the first space, ``last`` = the rest.

    Mirrors splitName's single-split behavior: "Ada Lovelace King" →
    ("Ada", "Lovelace King"); no space → (full, '').

    DOCUMENTED DIVERGENCE from the reference (index.ts:131-137): the raw
    ``name.split(" ")`` there makes "  Ada Lovelace" yield first="" and
    last=" Ada Lovelace" — an artifact of padded input, not a contract.
    This implementation trims first (("Ada", "Lovelace")), which is
    strictly more useful for the CRM field mapping it feeds; and a NULL
    name yields (NULL, NULL) rather than a fabricated empty last name.
    INTERIOR whitespace is reference-exact: "Mary  Jane" → ("Mary",
    " Jane") on both (the reference's rest.join(" ") re-emits the empty
    split segment as a leading space; the regexp here strips exactly one
    separator space).
    """
    col = F.col(full_name) if isinstance(full_name, str) else full_name
    trimmed = F.trim(col)
    first = F.substring_index(trimmed, " ", 1)
    rest = F.when(
        F.instr(trimmed, " ") > 0, F.regexp_replace(trimmed, "^[^ ]* ", "")
    ).otherwise(F.when(col.isNotNull(), F.lit("")))
    return first, rest


def normalize_email(email: Column | str) -> Column:
    col = F.col(email) if isinstance(email, str) else email
    return F.lower(F.trim(col))


def email_hash(email: Column | str) -> Column:
    return F.sha2(normalize_email(email), 256)
