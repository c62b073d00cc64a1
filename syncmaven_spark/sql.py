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
parameter substitution and the lexical dialect shim (``to_spark_sql``),
mirroring the reference (SURVEY §4).

All lexical scans here share one dialect-aware tokenizer (``_scan_spans``):
string/identifier/comment spans are lexed under the MODEL's dialect rules
(postgres/derby: literal backslashes and ANSI ``''`` doubling, plus
postgres ``E'...'`` escape-strings and ``$tag$...$tag$`` dollar quoting;
bigquery: the full GoogleSQL string surface — no ``''`` doubling,
``r''``/``b''`` prefixes, triple quotes, ``#`` comments; snowflake/mysql/
spark: backslash escapes), so validation, parameter discovery, and
transpilation cannot disagree about where a literal ends.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import re
from typing import Any

# `:name` everywhere; `@name` only where `@` has no native meaning
# (BigQuery's own parameter syntax, and Spark where `@` is not valid SQL).
# On MySQL/MariaDB (`@@session_vars`, `@user_vars`), Snowflake (`@stage`
# references), and Postgres/Derby (`@` operators), treating `@name` as a
# parameter compiled it to NULL — shipping syntactically broken SQL to the
# warehouse (round-5 core review) — so those dialects are colon-only.
_PARAM_RE_COLON = re.compile(r":([A-Za-z_][A-Za-z0-9_]*)")
_PARAM_RE_AT = re.compile(r"[:@]([A-Za-z_][A-Za-z0-9_]*)")
_AT_CONFLICT_DIALECTS = {
    "mysql", "mariadb", "snowflake", "postgres", "postgresql", "derby",
}


def _param_re(dialect: str) -> re.Pattern[str]:
    return (
        _PARAM_RE_COLON if dialect in _AT_CONFLICT_DIALECTS else _PARAM_RE_AT
    )

# Dialects where backslash inside a plain single-quoted literal is a LITERAL
# character (Postgres with standard_conforming_strings=on, the default since
# 9.1 — its escape-strings are opt-in via the E'' prefix — and ANSI-strict
# Derby). Everywhere else we target — Spark (escapedStringLiterals=false),
# MySQL, BigQuery, Snowflake — backslash starts an escape sequence.
_BACKSLASH_IS_LITERAL = {"postgres", "postgresql", "derby"}

# Dialects whose double-quoted tokens are IDENTIFIERS (ANSI quoting). Not
# BigQuery/MySQL/Spark: there double quotes delimit strings — which Spark's
# default (doubleQuotedIdentifiers off) happens to agree with.
_DOUBLEQUOTE_IDENT_DIALECTS = {"postgres", "postgresql", "snowflake", "derby"}

# GoogleSQL string openers: optional r/b prefix (raw / bytes, either order
# when combined), then a single or triple quote of either kind.
_BQ_STRING_OPEN = re.compile(r"(?i)(rb|br|r|b)?('''|\"\"\"|'|\")")

_DOLLAR_TAG = re.compile(r"\$[A-Za-z_][A-Za-z0-9_]*\$|\$\$")

_IDENT_CHARS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


class SqlError(ValueError):
    """Model SQL failed validation (multi-statement / non-SELECT / bad param)."""


def _scan_quoted(
    sql: str, start: int, quote: str, backslash: bool
) -> tuple[int, bool]:
    """From the opening quote at ``start``, return ``(end, terminated)`` —
    the index one past the closing quote (clamped to len) and whether the
    closing quote was actually found. Doubled-quote escapes always;
    backslash escapes only when ``backslash``."""
    j, n = start + 1, len(sql)
    while j < n:
        if sql[j] == quote:
            if sql[j : j + 2] == quote * 2:
                j += 2
                continue
            return j + 1, True
        if backslash and sql[j] == "\\":
            j += 2
            continue
        j += 1
    return n, False


def _scan_bq_quoted(sql: str, start: int, delim: str) -> tuple[int, bool]:
    """Scan a GoogleSQL string body from ``start`` (one past the opening
    delimiter) to its closing ``delim``. Backslash escapes the next
    character at the LEX level even in raw strings (``r'\\''`` does not
    terminate — the raw value keeps both characters); ``''`` is NOT an
    escaped quote in GoogleSQL, it closes the literal (adjacent literals
    concatenate)."""
    j, n = start, len(sql)
    dl = len(delim)
    while j < n:
        if sql[j] == "\\":
            j += 2
            continue
        if sql[j : j + dl] == delim:
            return j + dl, True
        j += 1
    return n, False


def _scan_spans(
    sql: str, dialect: str = "spark"
) -> list[tuple[str, int, int, bool]]:
    """Tokenize non-code spans of ``sql`` under ``dialect`` lexing rules.

    Returns ``(kind, lo, hi, terminated)`` with ``hi`` exclusive; kinds:
    ``comment``, ``string`` (plain single-quoted, or double-quoted where
    that means a string), ``estring`` (postgres ``E'...'``), ``dollar``
    (``$tag$...$tag$``; postgres, bare ``$$`` also snowflake), ``ident``
    (double-quoted ANSI identifier), ``ident_bt`` (backtick identifier).
    Everything between spans is code.
    """
    bs = dialect not in _BACKSLASH_IS_LITERAL
    pg = dialect in ("postgres", "postgresql")  # E'' strings, $tag$ quoting
    bq = dialect == "bigquery"
    dq_ident = dialect in _DOUBLEQUOTE_IDENT_DIALECTS
    # '#' starts a line comment in MySQL AND GoogleSQL; only MySQL also
    # requires whitespace after '--' for it to open a comment
    hash_comments = dialect in ("mysql", "mariadb", "bigquery")
    dash_needs_ws = dialect in ("mysql", "mariadb")
    spans: list[tuple[str, int, int, bool]] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        dollar_m = (
            _DOLLAR_TAG.match(sql, i)
            if ch == "$"
            # tagged form is postgres; snowflake has bare $$ only. '$' is
            # legal INSIDE postgres identifiers — only an opener when not
            # preceded by an identifier character.
            and (pg or (dialect == "snowflake" and sql[i : i + 2] == "$$"))
            and (i == 0 or sql[i - 1] not in _IDENT_CHARS)
            else None
        )
        if (
            ch == "-"
            and sql[i : i + 2] == "--"
            # MySQL's '--' starts a comment only when followed by
            # whitespace/EOL ('a--:x' is arithmetic there)
            and (
                not dash_needs_ws
                or sql[i + 2 : i + 3] in ("", " ", "\t", "\n", "\r")
            )
        ):
            end = sql.find("\n", i)
            end = n if end == -1 else end
            spans.append(("comment", i, end, True))
            i = end
        elif dialect == "snowflake" and ch == "/" and sql[i : i + 2] == "//":
            end = sql.find("\n", i)
            end = n if end == -1 else end
            spans.append(("comment", i, end, True))
            i = end
        elif hash_comments and ch == "#":
            end = sql.find("\n", i)
            end = n if end == -1 else end
            spans.append(("comment", i, end, True))
            i = end
        elif ch == "/" and sql[i : i + 2] == "/*":
            end = sql.find("*/", i + 2)
            terminated = end != -1
            end = n if end == -1 else end + 2
            spans.append(("comment", i, end, terminated))
            i = end
        elif dollar_m:
            tag = dollar_m.group(0)
            close = sql.find(tag, i + len(tag))
            terminated = close != -1
            end = n if close == -1 else close + len(tag)
            spans.append(("dollar", i, end, terminated))
            i = end
        elif bq and ch in "'\"rRbB":
            # GoogleSQL string forms: '...'/"..." with backslash escapes and
            # NO ''-doubling, triple-quoted '''...'''/\"\"\"...\"\"\", and
            # r/b (raw/bytes) prefixes — a prefix opens only at an
            # identifier boundary ("br'x'" after "foobr" is code).
            m = _BQ_STRING_OPEN.match(sql, i)
            if m and (
                not m.group(1) or i == 0 or sql[i - 1] not in _IDENT_CHARS
            ):
                prefix = (m.group(1) or "").lower()
                j, term = _scan_bq_quoted(sql, m.end(), m.group(2))
                kind = "bstring" if "b" in prefix else "string"
                spans.append((kind, i, j, term))
                i = j
            else:
                i += 1
        elif (
            pg
            and ch in "eE"
            and sql[i + 1 : i + 2] == "'"
            and (i == 0 or sql[i - 1] not in _IDENT_CHARS)
        ):
            # postgres escape-string: always backslash-escaped
            j, term = _scan_quoted(sql, i + 1, "'", True)
            spans.append(("estring", i, j, term))
            i = j
        elif ch == "'":
            # PostgreSQL's lexer carries ESCAPE MODE into continuation
            # fragments of an E'' constant separated by scan.l's
            # whitespace_with_newline (which admits '--' comments): in
            # E'a'␤'\'' the second fragment's backslash still escapes.
            # Lex such fragments with backslash escapes and a dedicated
            # kind so decoding matches. Walk back over any '--' comment
            # spans — they are whitespace to the continuation rule.
            if pg and spans:
                k = len(spans) - 1
                while k >= 0 and spans[k][0] == "comment":
                    k -= 1
                if (
                    k >= 0
                    and spans[k][0] in ("estring", "estring_frag")
                    and _PG_CONT_GAP.fullmatch(sql[spans[k][2] : i])
                ):
                    j, term = _scan_quoted(sql, i, "'", True)
                    spans.append(("estring_frag", i, j, term))
                    i = j
                    continue
            j, term = _scan_quoted(sql, i, "'", bs)
            spans.append(("string", i, j, term))
            i = j
        elif ch == '"':
            if dq_ident:
                j, term = _scan_quoted(sql, i, '"', False)
                spans.append(("ident", i, j, term))
            else:
                # a string in spark/bigquery/mysql — backslash-escaped
                j, term = _scan_quoted(sql, i, '"', True)
                spans.append(("string", i, j, term))
            i = j
        elif ch == "`":
            j, term = _scan_quoted(sql, i, "`", False)
            spans.append(("ident_bt", i, j, term))
            i = j
        else:
            i += 1
    return spans


def _mask_strings_and_comments(sql: str, dialect: str = "spark") -> str:
    """Replace string literals, quoted identifiers, and comments with spaces
    so lexical scans (parameter discovery, statement splitting) can't be
    fooled by ``':notaparam'`` inside a literal. Preserves offsets and
    newlines; lexes under the model's dialect rules."""
    out = list(sql)

    def blank(lo: int, hi: int) -> None:
        for j in range(lo, min(hi, len(sql))):
            if out[j] != "\n":
                out[j] = " "

    for kind, lo, hi, _term in _scan_spans(sql, dialect):
        if kind == "comment":
            blank(lo, hi)
        elif kind in ("string", "ident", "ident_bt"):
            blank(lo + 1, hi - 1)  # keep the delimiters
        else:  # estring / dollar: multi-char delimiters — blank everything
            blank(lo, hi)
    return "".join(out)


class SqlQuery:
    """A validated, parameterized single-SELECT model query.

    ``dialect`` selects the LEXING rules for the model's own text (the
    reference parses postgres / bigquery / snowflake grammars) and the
    escaping of substituted literals. ``@name`` parameters are accepted
    alongside ``:name`` for BigQuery-model compatibility.
    """

    def __init__(self, query: str, dialect: str = "spark") -> None:
        self.query = query
        self.dialect = dialect
        self._masked = _mask_strings_and_comments(query, dialect)
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
        are not parameters (the regex can only match the SECOND colon of
        ``::``, so checking the PREVIOUS character suffices — checking the
        next one too would falsely skip a parameter followed by a cast,
        ``:cursor::timestamptz``).
        """
        seen: list[str] = []
        for m in _param_re(self.dialect).finditer(self._masked):
            if self._is_cast_colon(m):
                continue  # postgres '::type' cast, not a parameter
            if m.group(1) not in seen:
                seen.append(m.group(1))
        return seen

    def _is_cast_colon(self, m: re.Match) -> bool:
        start = m.start()
        return (
            self._masked[start] == ":"
            and start > 0
            and self._masked[start - 1] == ":"
        )

    def compile(self, params: dict[str, Any] | None = None) -> str:
        """Substitute typed literals for every named parameter.

        Unknown parameters raise; parameters present in the query but missing
        from ``params`` compile to NULL (the reference passes ``cursor: null``
        explicitly on first run — ``sync.ts:490-492``). Literals are escaped
        for THIS query's dialect — i.e. for whichever engine will parse the
        compiled text; callers executing a warehouse-dialect model on Spark
        transpile first (``to_spark_sql``) and compile under ``spark``.
        """
        params = dict(params or {})
        names = self.named_parameters()
        for extra in set(params) - set(names):
            raise SqlError(f"parameter {extra!r} is not referenced by the query")

        out: list[str] = []
        last = 0
        for m in _param_re(self.dialect).finditer(self._masked):
            if self._is_cast_colon(m):
                continue
            out.append(self.query[last : m.start()])
            out.append(encode_literal(params.get(m.group(1)), self.dialect))
            last = m.end()
        out.append(self.query[last:])
        return "".join(out)


def _spark_string(body: str) -> str:
    """A Spark string literal holding ``body`` verbatim (raw characters)."""
    return "'" + body.replace("\\", "\\\\").replace("'", "''") + "'"


_PG_SIMPLE_ESCAPES = {"b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t"}
_HEX = set("0123456789abcdefABCDEF")


def _decode_pg_escape_body(body: str) -> str:
    """Decode the body of a postgres ``E'...'`` escape-string to its raw
    characters, matching PostgreSQL-on-UTF-8 lexer semantics: ``\\b \\f \\n
    \\r \\t``, 1-3 digit octal and ``\\x`` 1-2 hex digits (raw BYTES in the
    server encoding — composed then validated as UTF-8, so ``\\xc3\\xa9`` is
    'é', not mojibake), ``\\uXXXX``/``\\UXXXXXXXX`` codepoints with UTF-16
    surrogate pairs combined (lone surrogates are an error, as in PG), and
    ``\\<other>`` → ``<other>``; ``''`` doubling also applies. Spark's
    string lexer differs (no ``\\x``/octal/8-digit ``\\U``), so the shim
    decodes here and re-encodes with ``_spark_string`` instead of passing
    escape text through. Raises SqlError where PG itself would reject the
    literal (invalid surrogate pair / invalid UTF-8 byte sequence)."""
    out = bytearray()
    i, n = 0, len(body)

    def _read_unicode_escape(pos: int) -> tuple[int | None, int]:
        """Codepoint of a ``\\uXXXX``/``\\UXXXXXXXX`` escape whose backslash
        is at ``pos``, plus the index one past it; (None, pos) if not one."""
        if body[pos : pos + 1] != "\\":
            return None, pos
        e2 = body[pos + 1 : pos + 2]
        if e2 == "u" and set(body[pos + 2 : pos + 6]) <= _HEX and len(
            body[pos + 2 : pos + 6]
        ) == 4:
            return int(body[pos + 2 : pos + 6], 16), pos + 6
        if e2 == "U" and set(body[pos + 2 : pos + 10]) <= _HEX and len(
            body[pos + 2 : pos + 10]
        ) == 8:
            return int(body[pos + 2 : pos + 10], 16), pos + 10
        return None, pos

    while i < n:
        c = body[i]
        if c == "'" and body[i : i + 2] == "''":
            out += b"'"
            i += 2
            continue
        if c != "\\":
            out += c.encode("utf-8")
            i += 1
            continue
        cp, after = _read_unicode_escape(i)
        if cp is not None:
            if 0xD800 <= cp <= 0xDBFF:
                lo, after2 = _read_unicode_escape(after)
                if lo is None or not 0xDC00 <= lo <= 0xDFFF:
                    raise SqlError("invalid Unicode surrogate pair in E'' string")
                cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                after = after2
            elif 0xDC00 <= cp <= 0xDFFF:
                raise SqlError("invalid Unicode surrogate pair in E'' string")
            out += chr(cp).encode("utf-8")
            i = after
            continue
        i += 1
        if i >= n:
            out += b"\\"
            break
        e = body[i]
        if e in "01234567":
            j = i
            while j < min(i + 3, n) and body[j] in "01234567":
                j += 1
            out.append(int(body[i:j], 8) & 0xFF)
            i = j
        elif e == "x":  # PG recognizes lowercase \x only; \X is literal 'X'
            j = i + 1
            while j < min(i + 3, n) and body[j] in _HEX:
                j += 1
            if j > i + 1:
                out.append(int(body[i + 1 : j], 16))
                i = j
            else:
                out += b"x"
                i += 1
        else:
            out += _PG_SIMPLE_ESCAPES.get(e, e).encode("utf-8")
            i += 1
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise SqlError(
            "invalid byte sequence for encoding UTF8 in E'' string"
        ) from exc


_BQ_SIMPLE_ESCAPES = {
    "a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t",
    "v": "\v", "?": "?", "'": "'", '"': '"', "`": "`", "\\": "\\",
}


def _decode_bq_escape_body(body: str, bytes_mode: bool = False) -> bytes:
    """Decode the body of a GoogleSQL non-raw string/bytes literal to raw
    bytes, per the GoogleSQL lexical rules: ``\\a \\b \\f \\n \\r \\t \\v
    \\? \\' \\\" \\` \\\\``, exactly-3-digit octal and ``\\x``/``\\X`` with
    exactly 2 hex digits (a CODE POINT in strings, a byte in bytes
    literals), ``\\uXXXX``/``\\UXXXXXXXX`` code points (strings only;
    surrogates are invalid). Unknown escapes are an error in GoogleSQL —
    raised here too, so a model BigQuery itself would reject never reaches
    Spark mis-lexed."""
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c != "\\":
            out += c.encode("utf-8")
            i += 1
            continue
        e = body[i + 1 : i + 2]
        if e == "":
            raise SqlError("trailing backslash in BigQuery string literal")
        if e in "01234567":
            digits = body[i + 1 : i + 4]
            if len(digits) != 3 or not set(digits) <= set("01234567"):
                raise SqlError("invalid octal escape in BigQuery literal")
            val = int(digits, 8)
            if bytes_mode and val > 0xFF:
                raise SqlError(
                    f"octal escape \\{digits} exceeds one byte in BigQuery "
                    "bytes literal"
                )
            out += bytes([val]) if bytes_mode else chr(val).encode("utf-8")
            i += 4
        elif e in "xX":
            digits = body[i + 2 : i + 4]
            if len(digits) != 2 or not set(digits) <= _HEX:
                raise SqlError("invalid hex escape in BigQuery literal")
            val = int(digits, 16)
            out += bytes([val]) if bytes_mode else chr(val).encode("utf-8")
            i += 4
        elif e in "uU" and not bytes_mode:
            width = 4 if e == "u" else 8
            digits = body[i + 2 : i + 2 + width]
            if len(digits) != width or not set(digits) <= _HEX:
                raise SqlError("invalid unicode escape in BigQuery literal")
            cp = int(digits, 16)
            if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
                raise SqlError("invalid code point in BigQuery literal")
            out += chr(cp).encode("utf-8")
            i += 2 + width
        elif e in _BQ_SIMPLE_ESCAPES:
            out += _BQ_SIMPLE_ESCAPES[e].encode("utf-8")
            i += 2
        else:
            raise SqlError(f"invalid escape \\{e} in BigQuery literal")
    return bytes(out)


def _decode_bq_string(seg: str) -> str | bytes:
    """Decode one complete GoogleSQL string/bytes literal (prefix + quotes
    included) to its value — ``str`` for strings, ``bytes`` for ``b''``
    literals."""
    m = _BQ_STRING_OPEN.match(seg)
    prefix = (m.group(1) or "").lower()
    delim = m.group(2)
    body = seg[m.end() : -len(delim)]
    raw, is_bytes = "r" in prefix, "b" in prefix
    if is_bytes:
        return body.encode("utf-8") if raw else _decode_bq_escape_body(body, True)
    return body if raw else _decode_bq_escape_body(body).decode("utf-8")


def _spark_comment(seg: str) -> str:
    """Line comments Spark's lexer doesn't know: mysql/bigquery ``#`` and
    snowflake ``//`` both become ``--``; everything else passes through."""
    if seg.startswith("#"):
        return "--" + seg[1:]
    if seg.startswith("//"):
        return "--" + seg[2:]
    return seg


_MYSQL_ESCAPES = {
    "0": "\0", "b": "\b", "n": "\n", "r": "\r", "t": "\t", "Z": "\x1a",
    "\\": "\\", "'": "'", '"': '"',
    # \% and \_ keep the backslash outside LIKE context (MySQL manual 9.1.1)
    "%": "\\%", "_": "\\_",
}


def _decode_mysql_string(seg: str) -> str:
    """Decode a complete MySQL string literal (either quote kind) to its
    value: backslash escapes per the MySQL manual (unknown escapes drop
    the backslash), doubled-quote escapes for the delimiting quote."""
    quote, body = seg[0], seg[1:-1]
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n:
            out.append(_MYSQL_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        elif c == quote and body[i : i + 2] == quote * 2:
            out.append(quote)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _fold_value(dialect: str, kind: str, seg: str) -> str | bytes | None:
    """Decoded value of a literal that participates in the dialect's
    ADJACENT-LITERAL CONCATENATION, else None. GoogleSQL and MySQL
    concatenate string constants separated by whitespace/comments;
    PostgreSQL concatenates quote-delimited constants (plain and E'')
    separated by whitespace containing a newline — dollar-quoted strings
    never concatenate. Spark has no such rule (a trailing literal parses
    as an ALIAS), so unfolded adjacency would silently rename a column and
    drop content."""
    if dialect == "bigquery" and kind in ("string", "bstring"):
        return _decode_bq_string(seg)
    if dialect in ("mysql", "mariadb") and kind == "string":
        return _decode_mysql_string(seg)
    if dialect in ("postgres", "postgresql"):
        if kind == "string":  # standard-conforming: only '' is an escape
            return seg[1:-1].replace("''", "'")
        if kind == "estring":
            return _decode_pg_escape_body(seg[2:-1])
        if kind == "estring_frag":  # continuation fragment: escape-lexed
            return _decode_pg_escape_body(seg[1:-1])
    return None


# PostgreSQL scan.l whitespace_with_newline: horizontal whitespace and
# '--' line comments, then a newline ([\n\r]), then whitespace or
# comment-terminated-by-newline repetitions. Block comments do NOT
# participate (they are lexed in a separate state the regex cannot span).
_PG_CONT_GAP = re.compile(
    r"(?:[ \t\f\v]|--[^\n\r]*)*[\n\r](?:[ \t\n\r\f\v]+|--[^\n\r]*[\n\r])*\Z"
)


def _fold_gap_ok(dialect: str, gap: str) -> bool:
    """May two foldable literals concatenate across this inter-span text?
    PostgreSQL requires whitespace-with-newline per scan.l (which admits
    ``--`` comments and ``\\r`` newlines); GoogleSQL/MySQL accept any
    whitespace (including none — that's how BigQuery reads ``''``).
    The pg ``gap`` here is the RAW text since the previous literal,
    comments included (the caller accumulates it)."""
    if dialect in ("postgres", "postgresql"):
        return _PG_CONT_GAP.fullmatch(gap) is not None
    return gap.strip() == ""


def to_spark_sql(query: str, dialect: str = "spark") -> str:
    """Lexical dialect shim for models Spark itself executes.

    The reference's contract is "the warehouse executes the model SQL"
    (``sql.ts:40-42``) — models routed to a JDBC/BigQuery/Snowflake
    datasource are pushed down VERBATIM and never rewritten. This shim
    covers the remaining case: a model written in a warehouse dialect but
    executed by Spark over registered views. Spark ≥3.4 already accepts the
    frequent cross-dialect constructs (``expr::type`` casts, ``ILIKE``,
    ``now()``); translated here are the lexical incompatibilities:

    - ANSI double-quoted identifiers → backticks (postgres/snowflake);
    - postgres plain strings: literal backslashes doubled for Spark;
    - postgres ``E'...'``: prefix dropped (the body's backslash escapes
      parse identically in Spark);
    - postgres ``$tag$...$tag$``: re-quoted as a Spark string literal.

    BigQuery models need their STRING lexing rewritten: GoogleSQL has no
    ``''``-doubling (``'it''s'`` is two adjacent literals, which BigQuery
    concatenates to ``its`` — Spark would read one literal ``it's``), plus
    raw ``r'...'``, bytes ``b'...'`` (→ Spark ``X'hex'``), and
    triple-quoted strings. MySQL models get ``#`` line comments rewritten
    to ``--``.

    ADJACENT-LITERAL CONCATENATION (see ``_fold_value``) is folded into a
    single Spark literal for every dialect that has the rule — BigQuery and
    MySQL (any whitespace, comments included), PostgreSQL (whitespace with
    a newline; plain and ``E''`` constants, never dollar-quoted) — because
    Spark instead parses the trailing literal as an ALIAS, silently
    renaming the column and dropping its content.

    An UNTERMINATED string/identifier/dollar span raises ``SqlError``: the
    warehouse itself would reject the model, so synthesizing a closing
    delimiter would turn malformed SQL into a valid-but-different Spark
    query (round-3 review finding).
    """
    if dialect == "spark" or dialect not in (
        _DOUBLEQUOTE_IDENT_DIALECTS
        | _BACKSLASH_IS_LITERAL
        | {"mysql", "mariadb", "bigquery"}
    ):
        return query
    out: list[str] = []
    # Buffer the decoded value of the latest concatenation-eligible literal
    # (`pending`, str or bytes) plus the whitespace/comments after it
    # (`pending_tail`); follow-up adjacent literals of the SAME type fold
    # into it before emitting.
    pending: str | bytes | None = None
    pending_tail: list[str] = []
    # raw text (gaps + comment segments) since the pending literal — the
    # postgres continuation rule is validated against this, comments
    # included (scan.l's whitespace_with_newline admits '--' comments)
    gap_accum = ""
    is_pg = dialect in ("postgres", "postgresql")

    def flush() -> None:
        nonlocal pending, gap_accum
        if pending is not None:
            if isinstance(pending, bytes):
                out.append("X'" + pending.hex() + "'")
            else:
                out.append(_spark_string(pending))
            out.extend(pending_tail)
            pending_tail.clear()
            pending = None
        gap_accum = ""

    last = 0
    for kind, lo, hi, terminated in _scan_spans(query, dialect):
        if not terminated and kind != "comment":
            raise SqlError(
                f"unterminated {kind} span starting at offset {lo}: the "
                "source dialect would reject this statement"
            )
        gap = query[last:lo]
        seg = query[lo:hi]
        last = hi
        value = _fold_value(dialect, kind, seg)
        if value is not None:
            # pg validates the RAW accumulated text (comments included)
            # against scan.l's rule; bq/mysql treat buffered comments as
            # whitespace, so only the immediate gap needs checking there
            adjacent = pending is not None and _fold_gap_ok(
                dialect, (gap_accum + gap) if is_pg else gap
            )
            if adjacent and is_pg and kind == "estring":
                # an E'' token never CONTINUES a prior constant — postgres
                # itself rejects 'a'␤E'b' (syntax error at E'b'); emitting
                # two Spark tokens would alias-parse instead
                raise SqlError(
                    "E'...' cannot continue a preceding string constant "
                    f"(offset {lo}): PostgreSQL would reject this statement"
                )
            if adjacent and type(pending) is not type(value):
                # BigQuery rejects BYTES<>STRING literal concatenation;
                # X'..' 'x' in Spark would alias-parse instead
                raise SqlError(
                    "cannot concatenate bytes and string literals "
                    f"(offset {lo}): the source dialect would reject this "
                    "statement"
                )
            if adjacent:
                pending_tail.append(gap)
                pending += value
                gap_accum = ""
            else:
                if (
                    is_pg
                    and pending is not None
                    and gap.strip() == ""
                    and kind in ("string", "estring")
                ):
                    # adjacent constants NOT satisfying the newline rule
                    # (same line, or split by a block comment) are a
                    # PostgreSQL syntax error; Spark would alias-parse
                    raise SqlError(
                        "adjacent string constants must be separated by "
                        f"newline-containing whitespace (offset {lo}): "
                        "PostgreSQL would reject this statement"
                    )
                flush()
                out.append(gap)
                pending = value
            continue
        if pending is not None and kind == "comment":
            # comments may sit inside a concatenation gap (GoogleSQL/MySQL
            # treat them as whitespace; postgres admits '--' comments in
            # whitespace_with_newline). Buffer them — if the next span
            # doesn't fold, flush() re-emits them in order.
            if gap.strip() == "":
                pending_tail.append(gap)
                pending_tail.append(_spark_comment(seg))
                gap_accum += gap + seg
                continue
        flush()
        out.append(gap)
        if kind == "ident":
            name = seg[1:-1].replace('""', '"')
            out.append("`" + name.replace("`", "``") + "`")
        elif kind == "string" and dialect in _BACKSLASH_IS_LITERAL:
            # derby (and any future ANSI dialect without the adjacency
            # rule): backslashes are literal — double them for Spark;
            # '' doubling carries over unchanged
            body = seg[1:-1]
            out.append("'" + body.replace("\\", "\\\\") + "'")
        elif kind == "dollar":
            tag = _DOLLAR_TAG.match(seg).group(0)
            out.append(_spark_string(seg[len(tag) : -len(tag)]))
        elif kind == "comment":
            out.append(_spark_comment(seg))  # '#'/'//' comments → '--'
        else:  # spark-compatible strings, backtick idents
            out.append(seg)
    flush()
    out.append(query[last:])
    return "".join(out)


# Per-dialect timestamp cast target + whether the literal carries an
# explicit UTC offset. The reference emits tz-aware casts per dialect
# (pg.ts / snowlake.ts / bigquery.ts literal encoders): a naive literal
# cast to a tz-aware column is interpreted in the SERVER's session zone —
# on a non-UTC Postgres/Snowflake session that silently shifts incremental
# windows. Spark needs no offset: `get_spark` pins the session to UTC.
_TS_CAST = {
    "postgres": ("TIMESTAMP WITH TIME ZONE", True),
    "postgresql": ("TIMESTAMP WITH TIME ZONE", True),
    "snowflake": ("TIMESTAMP_TZ", True),
    "bigquery": ("TIMESTAMP", True),  # BQ TIMESTAMP is an absolute instant
    "mysql": ("DATETIME", False),  # no tz-aware cast target in MySQL
    "mariadb": ("DATETIME", False),
}


def encode_literal(val: Any, dialect: str = "spark") -> str:
    """Typed SQL literal encoding (``datasources/index.ts:40-67``), escaped
    for the engine that will parse the compiled text (= ``dialect``).

    Timestamps encode as UTC and cast to the dialect's tz-aware type with
    an explicit ``+00:00`` offset in the literal (see ``_TS_CAST``); string
    escaping follows the dialect's lexer (GoogleSQL has no ``''``-doubling
    — quotes escape with a backslash there).
    """
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "TRUE" if val else "FALSE"
    if isinstance(val, float) and not math.isfinite(val):
        # repr() would emit the bare text 'nan'/'inf' — which Spark parses
        # as an unresolved COLUMN reference, wedging every subsequent
        # incremental run. Fail fast with the remediation instead.
        raise SqlError(
            f"cannot encode non-finite float literal {val!r}; filter "
            "NaN/Infinity out of the cursor/parameter column"
        )
    if isinstance(val, (int, float)):
        return repr(val)
    if isinstance(val, _decimal.Decimal):
        if not val.is_finite():
            raise SqlError(f"cannot encode non-finite Decimal literal {val!r}")
        # exact decimal text is a valid numeric literal in every dialect
        return format(val, "f")
    if isinstance(val, _dt.datetime):
        if val.tzinfo is not None:
            val = val.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        iso = val.isoformat(sep=" ")
        cast_type, with_offset = _TS_CAST.get(dialect, ("TIMESTAMP", False))
        if with_offset:
            iso += "+00:00"
        return f"CAST('{iso}' AS {cast_type})"
    if isinstance(val, _dt.date):
        # a date-only value compares as DATE — tz-free in every engine;
        # widening to a UTC-midnight timestamptz would shift comparisons
        # against DATE columns on non-UTC server sessions (round-4 review)
        return f"CAST('{val.isoformat()}' AS DATE)"
    if isinstance(val, str):
        # Quote-doubling where the lexer honors it; backslash-doubling only
        # where the parsing engine treats backslash as an escape (Spark's
        # default — a value ending in a lone backslash would otherwise
        # swallow the closing quote; found by the hypothesis round-trip
        # property). Postgres/Derby (standard-conforming strings) keep
        # backslashes literal; GoogleSQL reads '' as literal-close +
        # literal-open (concatenating to drop the quote), so quotes must
        # escape as \' there.
        if dialect == "bigquery":
            return "'" + val.replace("\\", "\\\\").replace("'", "\\'") + "'"
        if dialect in _BACKSLASH_IS_LITERAL:
            return "'" + val.replace("'", "''") + "'"
        return "'" + val.replace("\\", "\\\\").replace("'", "''") + "'"
    raise SqlError(f"cannot encode literal of type {type(val).__name__}")
