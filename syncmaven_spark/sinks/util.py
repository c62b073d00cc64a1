"""Shared sink helpers (driver-side Python mirrors of functions/identity)."""

from __future__ import annotations

import hashlib


def split_name_py(full_name: str | None) -> tuple[str | None, str | None]:
    """splitName semantics (hubspot/src/index.ts:66-81): whitespace split;
    one part → (first, None); two → (first, last); more → (all-but-last
    joined, last)."""
    if not full_name:
        return None, None
    parts = full_name.strip().split()
    if len(parts) == 1:
        return parts[0], None
    if len(parts) == 2:
        return parts[0], parts[1]
    return " ".join(parts[:-1]), parts[-1]


def split_name_cdk_py(full_name: str | None) -> tuple[str | None, str | None]:
    """node-cdk splitName semantics (node-cdk/src/index.ts:131-137): single
    split on the FIRST space — first word → first, the rest (verbatim,
    interior spaces preserved) → last. This is the variant resend uses
    (resend/src/index.ts:72); hubspot's all-but-last/last variant is
    :func:`split_name_py`."""
    if not full_name:
        return None, None
    first, _, rest = full_name.partition(" ")
    return first, rest


def normalize_email_py(email: str) -> str:
    return email.strip().lower()


def email_hash_py(email: str) -> str:
    """SHA-256 of the normalized email (node-cdk/src/index.ts:131-145)."""
    return hashlib.sha256(normalize_email_py(email).encode("utf-8")).hexdigest()


def as_id_list(value) -> list[str]:
    """Scalar-or-array coercion for ``company_ids``
    (hubspot/src/index.ts:39-42,259-261)."""
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return [str(v) for v in value]
    return [str(value)]
