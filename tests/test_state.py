"""State store tests (reference: packages/core/src/lib/store.ts semantics)."""

import re
import sqlite3

import pytest

from syncmaven_spark.state import (
    InMemoryStore,
    PostgresStore,
    SqliteStore,
    create_store,
    stringify_key,
)


class _PgShimCursor:
    """DB-API cursor that executes PostgresStore's exact SQL against sqlite:
    ``%s`` placeholders become ``?``; the two Postgres-only schema statements
    (SET search_path / CREATE SCHEMA) are no-ops. Everything else —
    CREATE TABLE, upsert ON CONFLICT, LIKE-prefix scans, count — runs
    verbatim, so the statements themselves are what's under test.

    Before executing, the cursor ENFORCES the ``format`` paramstyle contract
    shared by every real Postgres DB-API driver (psycopg, psycopg2, pg8000):
    only ``%s`` placeholders, exactly one per parameter, and no stray ``%``
    (psycopg-family drivers %-interpolate, so a bare ``%`` must be ``%%``).
    Without this, a blind ``%s → ?`` rewrite would happily accept sqlite-only
    ``?`` / ``:name`` / ``$1`` placeholders the real drivers reject — the
    shim would mask exactly the paramstyle bug it exists to catch."""

    def __init__(self, conn: sqlite3.Connection) -> None:
        self._cur = conn.cursor()

    @staticmethod
    def _enforce_format_paramstyle(sql: str, params: tuple) -> None:
        assert "?" not in sql, f"qmark placeholder in pg SQL: {sql!r}"
        assert not re.search(r"\$\d", sql), f"numeric placeholder: {sql!r}"
        assert not re.search(r"(?<!:):[a-zA-Z]\w*", sql), (
            f"named placeholder in pg SQL: {sql!r}"
        )
        n_placeholders = sql.count("%s")
        assert n_placeholders == len(params), (
            f"{n_placeholders} %s placeholders for {len(params)} params: {sql!r}"
        )
        stray = sql.replace("%s", "").replace("%%", "")
        assert "%" not in stray, f"unescaped %% literal in pg SQL: {sql!r}"

    def execute(self, sql: str, params: tuple = ()) -> None:
        self._enforce_format_paramstyle(sql, params)
        if sql.startswith(("SET search_path", "CREATE SCHEMA")):
            return
        self._cur.execute(sql.replace("%s", "?"), params)

    def fetchone(self):
        return self._cur.fetchone()

    def fetchall(self):
        return self._cur.fetchall()


class _PgShimConnection:
    def __init__(self) -> None:
        self._conn = sqlite3.connect(":memory:", check_same_thread=False)

    def cursor(self) -> _PgShimCursor:
        return _PgShimCursor(self._conn)

    def commit(self) -> None:
        self._conn.commit()

    def close(self) -> None:
        self._conn.close()


def _pg_shim_store(url: str = "postgres://u@localhost/db") -> PostgresStore:
    return PostgresStore(url, connection_factory=lambda _url: _PgShimConnection())


@pytest.fixture(params=["memory", "sqlite", "postgres", "jdbc-derby"])
def store(request, tmp_path):
    if request.param == "memory":
        s = InMemoryStore()
    elif request.param == "postgres":
        s = _pg_shim_store()
    elif request.param == "jdbc-derby":
        # LIVE contract run against an embedded ANSI SQL engine — the only
        # store backend here that executes its SQL on a real server-grade
        # parser (Derby ships on Spark's own classpath)
        import glob
        import os

        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        if not glob.glob(os.path.join(jars, "derby-*.jar")):
            pytest.skip("Derby jar not on the Spark classpath")
        from syncmaven_spark.state import JdbcStateStore

        spark = request.getfixturevalue("spark")
        s = JdbcStateStore(f"jdbc:derby:{tmp_path}/state;create=true", spark)
    else:
        s = SqliteStore(str(tmp_path / "store.sqlite"))
    yield s
    s.close()


def test_key_join_and_validation():
    assert stringify_key(["a", "b", "c"]) == "a::b::c"
    assert stringify_key("solo") == "solo"
    with pytest.raises(ValueError):
        stringify_key(["a::b"])
    with pytest.raises(ValueError):
        stringify_key([])


def test_get_set_delete(store):
    assert store.get(["k"]) is None
    store.set(["syncId=s1", "$lastCursor=id"], {"type": "integer", "val": 5})
    assert store.get(["syncId=s1", "$lastCursor=id"]) == {"type": "integer", "val": 5}
    store.set(["syncId=s1", "$lastCursor=id"], {"type": "integer", "val": 9})
    assert store.get(["syncId=s1", "$lastCursor=id"])["val"] == 9
    store.delete(["syncId=s1", "$lastCursor=id"])
    assert store.get(["syncId=s1", "$lastCursor=id"]) is None


def test_prefix_scan_ordered(store):
    store.set(["p", "b"], 2)
    store.set(["p", "a"], 1)
    store.set(["p"], 0)
    store.set(["prefix_not_segment"], 99)  # 'p' prefix must not match this
    store.set(["q", "z"], 3)
    assert store.list(["p"]) == [("p", 0), ("p::a", 1), ("p::b", 2)]


def test_stream_batch(store):
    for i in range(7):
        store.set(["pre", f"k{i}"], i)
    batches = list(store.stream_batch(["pre"], max_batch_size=3))
    assert [len(b) for b in batches] == [3, 3, 1]
    assert batches[0][0][0] == "pre::k0"


def test_delete_by_prefix_and_size(store):
    store.set(["a", "1"], 1)
    store.set(["a", "2"], 2)
    store.set(["b"], 3)
    assert store.size() == 3
    store.delete_by_prefix(["a"])
    assert store.size() == 1
    assert store.get(["b"]) == 3


def test_sqlite_persistence(tmp_path):
    path = str(tmp_path / "s.sqlite")
    s1 = SqliteStore(path)
    s1.set(["k"], {"v": [1, 2, 3]})
    s1.close()
    s2 = SqliteStore(path)
    assert s2.get(["k"]) == {"v": [1, 2, 3]}
    s2.close()


def test_create_store_dispatch(tmp_path):
    assert isinstance(create_store(None), InMemoryStore)
    assert isinstance(create_store("memory://"), InMemoryStore)
    assert isinstance(create_store(str(tmp_path)), SqliteStore)
    pg = create_store(
        "postgres://u@h/db",
        connection_factory=lambda _url: _PgShimConnection(),
    )
    assert isinstance(pg, PostgresStore)
    pg.close()


def test_postgres_schema_from_url():
    # store.ts:34: ?schema= URL param, default "syncmaven"
    assert _pg_shim_store("postgres://u@h/db").schema == "syncmaven"
    assert _pg_shim_store("postgres://u@h/db?schema=my_app").schema == "my_app"
    with pytest.raises(ValueError):
        _pg_shim_store("postgres://u@h/db?schema=bad-name;drop")


def test_postgres_missing_driver_message():
    for mod in ("psycopg", "psycopg2"):
        try:
            __import__(mod)
            pytest.skip(f"{mod} installed — real connect would be attempted")
        except ImportError:
            pass
    with pytest.raises(NotImplementedError, match="DB-API driver"):
        PostgresStore("postgres://u@localhost/db")


def test_pg_shim_rejects_non_format_paramstyles():
    """Meta-test: the shim's enforcement actually fires. pg8000, psycopg and
    psycopg2 all speak paramstyle 'format' — a ``?``/``:name``/``$1``
    placeholder or a bare ``%`` would raise (or silently misbind) on the
    real driver, so the shim must reject them instead of executing."""
    enforce = _PgShimCursor._enforce_format_paramstyle
    enforce("SELECT value FROM syncmaven_store WHERE key = %s", ("k",))
    enforce("SELECT 1 WHERE 'a' LIKE '%%b'", ())  # doubled literal % is fine
    enforce("SELECT 'x'::text", ())  # a pg cast is not a named placeholder
    for sql, params in [
        ("SELECT * FROM t WHERE k = ?", ("x",)),
        ("SELECT * FROM t WHERE k = $1", ("x",)),
        ("SELECT * FROM t WHERE k = :key", ("x",)),
        ("SELECT 1 WHERE 'a' LIKE 'b%'", ()),  # unescaped literal %
        ("SELECT * FROM t WHERE k = %s AND v = %s", ("only-one",)),
    ]:
        with pytest.raises(AssertionError):
            enforce(sql, params)


def test_prefix_scan_is_not_a_like_wildcard(store):
    """'_' and '%' in key segments are literal characters, not LIKE
    wildcards: a prefix of 'a_c' must not match 'abc'-keyed entries (the
    reference's raw LIKE scan gets this wrong; we escape)."""
    store.set(["a_c", "x"], 1)
    store.set(["abc", "x"], 2)
    store.set(["a%c", "x"], 3)
    assert store.list(["a_c"]) == [("a_c::x", 1)]
    assert store.list(["a%c"]) == [("a%c::x", 3)]
    store.delete_by_prefix(["a_c"])
    assert store.get(["abc", "x"]) == 2
    assert store.get(["a%c", "x"]) == 3
    assert store.get(["a_c", "x"]) is None


def test_jdbc_store_large_values(tmp_path, request):
    """Sink ID maps can be large: a ~300 KB JSON value must round-trip
    through the CLOB column intact (a VARCHAR-bounded column would
    truncate silently)."""
    import glob
    import os

    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    if not glob.glob(os.path.join(jars, "derby-*.jar")):
        pytest.skip("Derby jar not on the Spark classpath")
    from syncmaven_spark.state import JdbcStateStore

    spark = request.getfixturevalue("spark")
    s = JdbcStateStore(f"jdbc:derby:{tmp_path}/big;create=true", spark)
    try:
        big = {f"ext_{i}": f"crm_{i:08d}" for i in range(10_000)}
        s.set(["syncId=x", "idmap"], big)
        assert s.get(["syncId=x", "idmap"]) == big
        assert s.list(["syncId=x"]) == [("syncId=x::idmap", big)]
    finally:
        s.close()


def test_prefix_scan_with_like_metachars_and_escape_char(tmp_path):
    """Round-5 review: the LIKE escape char is '!' (portable ANSI — MySQL's
    default sql_mode lexes a backslash ESCAPE literal as an escaped quote);
    keys containing %, _, and ! must still prefix-scan exactly."""
    from syncmaven_spark.state import SqliteStore

    store = SqliteStore(str(tmp_path / "s.db"))
    store.set(["100%_do!ne", "a"], 1)
    store.set(["100%_do!ne", "b"], 2)
    store.set(["100x_doyne", "a"], 99)  # would match if % or _ were wild
    got = dict(store.stream(["100%_do!ne"]))
    assert got == {"100%_do!ne::a": 1, "100%_do!ne::b": 2}
    store.delete_by_prefix(["100%_do!ne"])
    assert dict(store.stream(["100%_do!ne"])) == {}
    assert dict(store.stream(["100x_doyne"]))  # untouched
