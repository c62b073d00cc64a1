"""Persistent key-value state store.

Reference: ``packages/protocol/src/index.ts:11-29`` (interface) and
``packages/core/src/lib/store.ts`` (SQLite/Postgres impls). Keys are tuples of
string segments joined with ``::`` (segments must not contain ``::``), values
arbitrary JSON. Eight operations: get / set / del / list(prefix) /
stream(prefix) / stream_batch(prefix, max_batch_size) / delete_by_prefix /
size. Prefix scan matches ``key = prefix OR key LIKE 'prefix::%'`` ordered by
key ascending (store.ts:205-216).

This is driver-side metadata (cursors, sink ID maps, synced-row caches), not
big data — a SQLite file mirrors the reference's default store exactly
(store.ts:131-234, default location ``<project>/.state`` per sync.ts:278).
The in-memory variant mirrors ``packages/node-cdk/src/inmem-store.ts``.
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
from abc import ABC, abstractmethod
from collections.abc import Iterator
from typing import Any

KeyLike = str | list[str] | tuple[str, ...]

SEPARATOR = "::"


def stringify_key(key: KeyLike) -> str:
    """Join key segments with ``::``; reject segments containing ``::``
    (store.ts:6-13)."""
    if isinstance(key, str):
        key = (key,)
    parts = list(key)
    if not parts:
        raise ValueError("key must have at least one segment")
    for seg in parts:
        if SEPARATOR in seg:
            raise ValueError(f"key segment {seg!r} must not contain '{SEPARATOR}'")
    return SEPARATOR.join(parts)


def _like_prefix(prefix: str) -> str:
    """LIKE pattern matching exactly ``prefix + '::' + anything``.

    ``%``/``_``/``!`` in key segments are escaped (pair with ``ESCAPE '!'``)
    so prefix scans have plain-startswith semantics like InMemoryStore — the
    reference's raw ``LIKE 'prefix::%'`` (store.ts:75-88,205-216) treats an
    underscore in a sync id as a single-char wildcard, which we deliberately
    do not reproduce. The escape char is ``!``, NOT backslash: MySQL's
    default sql_mode lexes ``'\\'`` in the SQL text as an escaped quote, so
    the statement never parses there, while ``ESCAPE '!'`` is plain ANSI
    accepted by SQLite/Postgres/Derby/MySQL alike (round-5 review)."""
    escaped = (
        prefix.replace("!", "!!").replace("%", "!%").replace("_", "!_")
    )
    return escaped + SEPARATOR + "%"


class StateStore(ABC):
    """The reference's 8-operation KV store interface."""

    @abstractmethod
    def get(self, key: KeyLike) -> Any | None: ...

    @abstractmethod
    def set(self, key: KeyLike, value: Any) -> None: ...

    @abstractmethod
    def delete(self, key: KeyLike) -> None: ...

    @abstractmethod
    def stream(self, prefix: KeyLike) -> Iterator[tuple[str, Any]]:
        """Yield ``(key, value)`` pairs under ``prefix`` in ascending key order."""

    def list(self, prefix: KeyLike) -> list[tuple[str, Any]]:
        return list(self.stream(prefix))

    def stream_batch(
        self, prefix: KeyLike, max_batch_size: int = 1000
    ) -> Iterator[list[tuple[str, Any]]]:
        batch: list[tuple[str, Any]] = []
        for item in self.stream(prefix):
            batch.append(item)
            if len(batch) >= max_batch_size:
                yield batch
                batch = []
        if batch:
            yield batch

    @abstractmethod
    def delete_by_prefix(self, prefix: KeyLike) -> None: ...

    @abstractmethod
    def size(self) -> int: ...

    def close(self) -> None:  # pragma: no cover - trivial default
        pass


class InMemoryStore(StateStore):
    """Dict-backed store for tests (``packages/node-cdk/src/inmem-store.ts``)."""

    def __init__(self) -> None:
        self._data: dict[str, Any] = {}

    def get(self, key: KeyLike) -> Any | None:
        return self._data.get(stringify_key(key))

    def set(self, key: KeyLike, value: Any) -> None:
        self._data[stringify_key(key)] = value

    def delete(self, key: KeyLike) -> None:
        self._data.pop(stringify_key(key), None)

    def stream(self, prefix: KeyLike) -> Iterator[tuple[str, Any]]:
        p = stringify_key(prefix)
        for k in sorted(self._data):
            if k == p or k.startswith(p + SEPARATOR):
                yield k, self._data[k]

    def delete_by_prefix(self, prefix: KeyLike) -> None:
        p = stringify_key(prefix)
        for k in [k for k in self._data if k == p or k.startswith(p + SEPARATOR)]:
            del self._data[k]

    def size(self) -> int:
        return len(self._data)


class SqliteStore(StateStore):
    """SQLite store: table ``store(key TEXT PRIMARY KEY, value TEXT)``
    (store.ts:140-145), values JSON-encoded."""

    def __init__(self, path: str) -> None:
        directory = os.path.dirname(os.path.abspath(path))
        os.makedirs(directory, exist_ok=True)
        self._lock = threading.Lock()
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.execute(
            "CREATE TABLE IF NOT EXISTS store (key TEXT PRIMARY KEY, value TEXT)"
        )
        self._conn.commit()

    def get(self, key: KeyLike) -> Any | None:
        with self._lock:
            row = self._conn.execute(
                "SELECT value FROM store WHERE key = ?", (stringify_key(key),)
            ).fetchone()
        return json.loads(row[0]) if row else None

    def set(self, key: KeyLike, value: Any) -> None:
        with self._lock:
            self._conn.execute(
                "INSERT INTO store (key, value) VALUES (?, ?) "
                "ON CONFLICT(key) DO UPDATE SET value = excluded.value",
                (stringify_key(key), json.dumps(value)),
            )
            self._conn.commit()

    def delete(self, key: KeyLike) -> None:
        with self._lock:
            self._conn.execute("DELETE FROM store WHERE key = ?", (stringify_key(key),))
            self._conn.commit()

    def stream(self, prefix: KeyLike) -> Iterator[tuple[str, Any]]:
        p = stringify_key(prefix)
        with self._lock:
            rows = self._conn.execute(
                "SELECT key, value FROM store WHERE key = ? "
                "OR key LIKE ? ESCAPE '!' ORDER BY key ASC",
                (p, _like_prefix(p)),
            ).fetchall()
        for k, v in rows:
            yield k, json.loads(v)

    def delete_by_prefix(self, prefix: KeyLike) -> None:
        p = stringify_key(prefix)
        with self._lock:
            self._conn.execute(
                "DELETE FROM store WHERE key = ? OR key LIKE ? ESCAPE '!'",
                (p, _like_prefix(p)),
            )
            self._conn.commit()

    def size(self) -> int:
        with self._lock:
            return self._conn.execute("SELECT count(*) FROM store").fetchone()[0]

    def close(self) -> None:
        self._conn.close()


class PostgresStore(StateStore):
    """Postgres store mirroring ``packages/core/src/lib/store.ts:26-129``:
    table ``syncmaven_store (key TEXT PRIMARY KEY, value TEXT)`` in the
    schema named by the ``?schema=`` URL parameter (default ``syncmaven``),
    same upsert and ``key LIKE 'prefix::%' OR key = prefix`` scan SQL.

    The connection is any DB-API 2.0 connection with ``%s`` parameter style
    (psycopg / psycopg2 / pg8000 — whichever is importable — or an injected
    ``connection_factory`` for tests and custom pooling).
    """

    def __init__(self, url: str, connection_factory=None) -> None:
        from urllib.parse import parse_qs, urlparse

        parsed = urlparse(url)
        self.schema = (
            parse_qs(parsed.query).get("schema", ["syncmaven"])[0] or "syncmaven"
        )
        if not self.schema.replace("_", "").isalnum():
            raise ValueError(f"invalid schema name: {self.schema!r}")
        if connection_factory is not None:
            self._conn = connection_factory(url)
        else:
            self._conn = self._connect(url)
        self._lock = threading.Lock()
        self._init_schema()

    @staticmethod
    def _connect(url: str):
        try:
            import psycopg  # type: ignore[import-not-found]

            return psycopg.connect(url)
        except ImportError:
            pass
        try:
            import psycopg2  # type: ignore[import-not-found]

            return psycopg2.connect(url)
        except ImportError:
            pass
        raise NotImplementedError(
            "PostgresStore needs a Postgres DB-API driver (psycopg or "
            "psycopg2) or an explicit connection_factory"
        )

    def _init_schema(self) -> None:
        # store.ts:38-45: search_path, create schema, create table
        cur = self._conn.cursor()
        cur.execute(f"SET search_path TO {self.schema}")
        cur.execute(f"CREATE SCHEMA IF NOT EXISTS {self.schema}")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS syncmaven_store "
            "(key TEXT PRIMARY KEY, value TEXT)"
        )
        self._conn.commit()

    def get(self, key: KeyLike) -> Any | None:
        with self._lock:
            cur = self._conn.cursor()
            cur.execute(
                "SELECT value FROM syncmaven_store WHERE key = %s",
                (stringify_key(key),),
            )
            row = cur.fetchone()
        return json.loads(row[0]) if row else None

    def set(self, key: KeyLike, value: Any) -> None:
        with self._lock:
            cur = self._conn.cursor()
            cur.execute(
                "INSERT INTO syncmaven_store (key, value) VALUES (%s, %s) "
                "ON CONFLICT (key) DO UPDATE SET value = excluded.value",
                (stringify_key(key), json.dumps(value)),
            )
            self._conn.commit()

    def delete(self, key: KeyLike) -> None:
        with self._lock:
            cur = self._conn.cursor()
            cur.execute(
                "DELETE FROM syncmaven_store WHERE key = %s",
                (stringify_key(key),),
            )
            self._conn.commit()

    def stream(self, prefix: KeyLike) -> Iterator[tuple[str, Any]]:
        p = stringify_key(prefix)
        with self._lock:
            cur = self._conn.cursor()
            cur.execute(
                "SELECT key, value FROM syncmaven_store "
                "WHERE key LIKE %s ESCAPE '!' OR key = %s ORDER BY key ASC",
                (_like_prefix(p), p),
            )
            rows = cur.fetchall()
        for k, v in rows:
            yield k, json.loads(v)

    def delete_by_prefix(self, prefix: KeyLike) -> None:
        p = stringify_key(prefix)
        with self._lock:
            cur = self._conn.cursor()
            cur.execute(
                "DELETE FROM syncmaven_store "
                "WHERE key LIKE %s ESCAPE '!' OR key = %s",
                (_like_prefix(p), p),
            )
            self._conn.commit()

    def size(self) -> int:
        with self._lock:
            cur = self._conn.cursor()
            cur.execute("SELECT count(*) FROM syncmaven_store")
            return cur.fetchone()[0]

    def close(self) -> None:
        self._conn.close()


class JdbcStateStore(StateStore):
    """Generic ANSI-SQL state store over a ``java.sql`` connection obtained
    from the Spark JVM gateway — no Python DB driver needed: any warehouse
    whose JDBC jar is already on the Spark classpath can hold the sync
    state (reference parity: the Postgres store of ``store.ts:26-129``,
    re-expressed in portable SQL — no ON CONFLICT, no search_path, no
    IF NOT EXISTS). Live-tested against embedded Apache Derby, the
    strictest ANSI parser available in this environment
    (``tests/test_state.py``).

    Single driver-side connection under a lock, like every other store
    here (the reference store is a single-writer driver object too);
    upsert is UPDATE-then-INSERT inside that lock. Values are CLOBs; keys
    are bounded VARCHAR(512) (a primary key must be bounded in most
    engines — state keys are short ``syncId=...::$...`` tuples).
    """

    def __init__(self, url: str, spark=None, table: str = "syncmaven_store"):
        if not table.replace("_", "").isalnum() or table[0].isdigit():
            raise ValueError(f"invalid table name: {table!r}")
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise ValueError(
                    "JdbcStateStore needs an active SparkSession — its JVM "
                    "hosts the JDBC driver jar"
                )
        self._conn = spark._jvm.java.sql.DriverManager.getConnection(url)
        self._table = table
        self._lock = threading.Lock()
        try:
            st = self._conn.createStatement()
            try:
                st.executeUpdate(
                    f"CREATE TABLE {table} "
                    "(skey VARCHAR(512) PRIMARY KEY, svalue CLOB)"
                )
            except Exception as e:  # no portable IF NOT EXISTS — probe
                if (
                    "X0Y32" not in str(e)
                    and "already exists" not in str(e).lower()
                ):
                    raise
            finally:
                st.close()
        except Exception:
            # don't leak the connection on a failed init — an abandoned
            # embedded-Derby connection keeps the db directory locked for
            # the JVM's lifetime
            self._conn.close()
            raise

    def _execute(self, sql: str, params: tuple[str, ...], query: bool):
        """Run one statement; returns rows (as string tuples) for a query,
        else the update count."""
        ps = self._conn.prepareStatement(sql)
        try:
            for i, p in enumerate(params, start=1):
                ps.setString(i, p)
            if not query:
                return ps.executeUpdate()
            rs = ps.executeQuery()
            rows = []
            n = rs.getMetaData().getColumnCount()
            while rs.next():
                rows.append(tuple(rs.getString(i + 1) for i in range(n)))
            return rows
        finally:
            ps.close()

    def get(self, key: KeyLike) -> Any | None:
        with self._lock:
            rows = self._execute(
                f"SELECT svalue FROM {self._table} WHERE skey = ?",
                (stringify_key(key),),
                query=True,
            )
        return json.loads(rows[0][0]) if rows else None

    def set(self, key: KeyLike, value: Any) -> None:
        k, v = stringify_key(key), json.dumps(value)
        with self._lock:
            updated = self._execute(
                f"UPDATE {self._table} SET svalue = ? WHERE skey = ?",
                (v, k),
                query=False,
            )
            if updated == 0:
                self._execute(
                    f"INSERT INTO {self._table} (skey, svalue) VALUES (?, ?)",
                    (k, v),
                    query=False,
                )

    def delete(self, key: KeyLike) -> None:
        with self._lock:
            self._execute(
                f"DELETE FROM {self._table} WHERE skey = ?",
                (stringify_key(key),),
                query=False,
            )

    def stream(self, prefix: KeyLike) -> Iterator[tuple[str, Any]]:
        p = stringify_key(prefix)
        with self._lock:
            rows = self._execute(
                f"SELECT skey, svalue FROM {self._table} "
                "WHERE skey = ? OR skey LIKE ? ESCAPE '!' ORDER BY skey ASC",
                (p, _like_prefix(p)),
                query=True,
            )
        for k, v in rows:
            yield k, json.loads(v)

    def delete_by_prefix(self, prefix: KeyLike) -> None:
        p = stringify_key(prefix)
        with self._lock:
            self._execute(
                f"DELETE FROM {self._table} "
                "WHERE skey = ? OR skey LIKE ? ESCAPE '!'",
                (p, _like_prefix(p)),
                query=False,
            )

    def size(self) -> int:
        with self._lock:
            rows = self._execute(
                f"SELECT count(*) FROM {self._table}", (), query=True
            )
        return int(rows[0][0])

    def close(self) -> None:
        self._conn.close()


def create_store(url_or_path: str | None, **kwargs) -> StateStore:
    """Store selection mirroring ``sync.ts:112-124``: ``memory://`` →
    in-memory, ``postgres(ql)://`` → PostgresStore, ``jdbc:`` →
    JdbcStateStore over the Spark JVM, anything else → SQLite file in that
    directory (default ``.state``)."""
    if not url_or_path or url_or_path == "memory://":
        return InMemoryStore()
    if url_or_path.startswith(("postgres://", "postgresql://")):
        return PostgresStore(url_or_path, **kwargs)
    if url_or_path.startswith("jdbc:"):
        return JdbcStateStore(url_or_path, **kwargs)
    if os.path.isdir(url_or_path) or not os.path.splitext(url_or_path)[1]:
        return SqliteStore(os.path.join(url_or_path, "store.sqlite"))
    return SqliteStore(url_or_path)
