"""Parameterized single-SELECT SQL models.

Reference: ``packages/core/src/lib/sql.ts:13-85`` — parse the model query,
reject multi-statement input and anything that isn't a SELECT, discover
``:name`` named parameters (``@name`` on BigQuery), and compile by replacing
each parameter with a typed literal (``packages/core/src/datasources/
index.ts:40-67``: string→quoted, number→numeric, Date→CAST('ISO' AS
<timestamp type>), null→NULL, else throw).

Spark-first notes: Spark SQL (≥3.4) natively supports ``:name`` parameter
markers via ``spark.sql(query, args=...)``; ``SqlQuery.compile`` additionally
produces the fully-substituted SQL string so plans are reproducible,
loggable, and byte-comparable in tests, exactly like the reference. Catalyst
then performs all optimization — there is no engine-side AST rewriting beyond
parameter substitution, mirroring the reference (SURVEY §4).
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any

_PARAM_RE = re.compile(r"[:@]([A-Za-z_][A-Za-z0-9_]*)")


class SqlError(ValueError):
    """Model SQL failed validation (multi-statement / non-SELECT / bad param)."""


def _mask_strings_and_comments(sql: str) -> str:
    """Replace string literals, quoted identifiers, and comments with spaces
    so lexical scans (parameter discovery, statement splitting) can't be
    fooled by ``':notaparam'`` inside a literal. Preserves offsets."""
    out = list(sql)
    i, n = 0, len(sql)

    def blank(lo: int, hi: int) -> None:
        for j in range(lo, min(hi, n)):
            if out[j] not in "\n":
                out[j] = " "

    while i < n:
        ch = sql[i]
        if ch == "-" and sql[i : i + 2] == "--":
            end = sql.find("\n", i)
            end = n if end == -1 else end
            blank(i, end)
            i = end
        elif ch == "/" and sql[i : i + 2] == "/*":
            end = sql.find("*/", i + 2)
            end = n if end == -1 else end + 2
            blank(i, end)
            i = end
        elif ch in ("'", '"', "`"):
            quote = ch
            j = i + 1
            while j < n:
                if sql[j] == quote:
                    if sql[j : j + 2] == quote * 2:  # doubled-quote escape
                        j += 2
                        continue
                    break
                if sql[j] == "\\" and quote == "'":
                    j += 2
                    continue
                j += 1
            blank(i + 1, j)
            i = j + 1
        else:
            i += 1
    return "".join(out)


class SqlQuery:
    """A validated, parameterized single-SELECT model query.

    ``dialect`` is informational (the reference parses postgres / bigquery /
    snowflake grammars; we target Spark SQL). ``@name`` parameters are
    accepted alongside ``:name`` for BigQuery-model compatibility.
    """

    def __init__(self, query: str, dialect: str = "spark") -> None:
        self.query = query
        self.dialect = dialect
        self._masked = _mask_strings_and_comments(query)
        self._validate()

    def _validate(self) -> None:
        statements = [s for s in self._masked.split(";") if s.strip()]
        if len(statements) > 1:
            raise SqlError(
                f"query must contain exactly one statement, got {len(statements)}"
            )
        if not statements:
            raise SqlError("query is empty")
        first_word = statements[0].strip().split(None, 1)[0].upper()
        if first_word not in ("SELECT", "WITH"):
            raise SqlError(f"only SELECT queries are allowed, got {first_word}")

    def named_parameters(self) -> list[str]:
        """Distinct parameter names in first-appearance order.

        Reference: ``sql.ts:44-50`` (AST walk collecting param nodes); here a
        lexical scan over the literal/comment-masked text. ``::`` type casts
        are not parameters.
        """
        seen: list[str] = []
        for m in _PARAM_RE.finditer(self._masked):
            start = m.start()
            if self._masked[start] == ":" and (
                (start > 0 and self._masked[start - 1] == ":")
                or self._masked[m.end() : m.end() + 1] == ":"
            ):
                continue  # postgres '::type' cast, not a parameter
            if m.group(1) not in seen:
                seen.append(m.group(1))
        return seen

    def compile(self, params: dict[str, Any] | None = None) -> str:
        """Substitute typed literals for every named parameter.

        Unknown parameters raise; parameters present in the query but missing
        from ``params`` compile to NULL (the reference passes ``cursor: null``
        explicitly on first run — ``sync.ts:490-492``).
        """
        params = dict(params or {})
        names = self.named_parameters()
        for extra in set(params) - set(names):
            raise SqlError(f"parameter {extra!r} is not referenced by the query")

        out: list[str] = []
        last = 0
        for m in _PARAM_RE.finditer(self._masked):
            start = m.start()
            if self._masked[start] == ":" and (
                (start > 0 and self._masked[start - 1] == ":")
                or self._masked[m.end() : m.end() + 1] == ":"
            ):
                continue
            out.append(self.query[last : start])
            out.append(encode_literal(params.get(m.group(1)), self.dialect))
            last = m.end()
        out.append(self.query[last:])
        return "".join(out)


# Dialects where backslash inside a single-quoted literal is a LITERAL
# character (Postgres with standard_conforming_strings=on, the default since
# 9.1). Everywhere else we target — Spark (escapedStringLiterals=false),
# MySQL, BigQuery, Snowflake — backslash starts an escape sequence and must
# be doubled.
_BACKSLASH_IS_LITERAL = {"postgres", "postgresql"}

# Dialects whose double-quoted tokens are IDENTIFIERS (ANSI quoting). Not
# BigQuery: there double quotes delimit strings — which Spark's default
# (doubleQuotedIdentifiers off) happens to agree with, so BigQuery models
# pass through unchanged.
_DOUBLEQUOTE_IDENT_DIALECTS = {"postgres", "postgresql", "snowflake"}


def to_spark_sql(query: str, dialect: str = "spark") -> str:
    """Minimal dialect shim for models Spark itself executes.

    The reference's contract is "the warehouse executes the model SQL"
    (``sql.ts:40-42``) — models routed to a JDBC/BigQuery/Snowflake
    datasource are pushed down VERBATIM and never rewritten. This shim
    covers the remaining case: a model written in a warehouse dialect but
    executed by Spark over registered views. Spark ≥3.4 already accepts the
    frequent cross-dialect constructs (``expr::type`` casts, ``ILIKE``,
    ``now()``); the one lexical incompatibility worth translating is ANSI
    double-quoted identifiers → backticks. Strings, comments, and
    everything else pass through byte-identical.
    """
    if dialect not in _DOUBLEQUOTE_IDENT_DIALECTS:
        return query
    out: list[str] = []
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if ch == "-" and query[i : i + 2] == "--":
            end = query.find("\n", i)
            end = n if end == -1 else end
            out.append(query[i:end])
            i = end
        elif ch == "/" and query[i : i + 2] == "/*":
            end = query.find("*/", i + 2)
            end = n if end == -1 else end + 2
            out.append(query[i:end])
            i = end
        elif ch == "'":
            # standard-conforming string scan ('' escape; these dialects
            # treat backslash literally)
            j = i + 1
            while j < n:
                if query[j] == "'":
                    if query[j : j + 2] == "''":
                        j += 2
                        continue
                    break
                j += 1
            out.append(query[i : j + 1])
            i = j + 1
        elif ch == '"':
            j = i + 1
            ident: list[str] = []
            while j < n:
                if query[j] == '"':
                    if query[j : j + 2] == '""':  # escaped quote in ident
                        ident.append('"')
                        j += 2
                        continue
                    break
                ident.append(query[j])
                j += 1
            out.append("`" + "".join(ident).replace("`", "``") + "`")
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def encode_literal(val: Any, dialect: str = "spark") -> str:
    """Typed SQL literal encoding (``datasources/index.ts:40-67``).

    Timestamps use ``CAST('<ISO>' AS TIMESTAMP)`` — the Spark-dialect
    equivalent of the reference's per-dialect ``CAST(... AS TIMESTAMP WITH
    TIME ZONE)``.
    """
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "TRUE" if val else "FALSE"
    if isinstance(val, (int, float)):
        return repr(val)
    if isinstance(val, (_dt.datetime, _dt.date)):
        if isinstance(val, _dt.datetime) and val.tzinfo is not None:
            val = val.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return f"CAST('{val.isoformat(sep=' ') if isinstance(val, _dt.datetime) else val.isoformat()}' AS TIMESTAMP)"
    if isinstance(val, str):
        # Quote-doubling everywhere; backslash-doubling only where the
        # target dialect treats backslash as an escape (Spark's default —
        # a value ending in a lone backslash would otherwise swallow the
        # closing quote and produce an unterminated literal; found by the
        # hypothesis round-trip property). Compiled SQL pushed down whole
        # to Postgres keeps backslashes literal, per
        # standard_conforming_strings.
        s = val.replace("'", "''")
        if dialect not in _BACKSLASH_IS_LITERAL:
            s = val.replace("\\", "\\\\").replace("'", "''")
        return "'" + s + "'"
    raise SqlError(f"cannot encode literal of type {type(val).__name__}")
