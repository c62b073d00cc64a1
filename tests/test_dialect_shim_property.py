"""End-to-end property tests for the dialect shim: generated warehouse-
dialect models (quoted identifiers, E-strings, dollar quotes, GoogleSQL
string forms, ``::`` casts) transpile with ``to_spark_sql`` and must BOTH
parse under Spark's own parser AND return the exact generated values —
extending the pure-lexer span properties in ``test_properties.py`` to
executed semantics (round-3 verdict task #6).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from syncmaven_spark.sql import to_spark_sql

# printable-but-adversarial alphabet: quote chars, backslashes, dollar,
# backticks, colons (parameter lookalikes), newlines, semicolon-free (the
# validator's statement split is separately tested)
_chars = st.sampled_from(
    list("abcXYZ 019_-") + ["'", '"', "\\", "$", "`", ":", "\n", "#", "/"]
)
texts = st.text(alphabet=_chars, min_size=0, max_size=24)
# identifier names: Spark backtick-quoting covers everything except we keep
# them nonempty and newline-free
idents = st.text(
    alphabet=st.sampled_from(list("abz A9_$'\"")), min_size=1, max_size=12
)

_SETTINGS = dict(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _run_one(spark, sql: str):
    return spark.sql(sql).collect()[0]


def _dollar_quote(s: str, tags=("$$", "$q$", "$qx$", "$zz9$")) -> str | None:
    """Dollar-quote ``s`` with the first tag that round-trips: the FIRST
    closing-tag occurrence after the opener must be exactly at the end
    (a body like ``$`` makes ``$$$$$`` ambiguous in real PostgreSQL too)."""
    for tag in tags:
        full = tag + s + tag
        if full.find(tag, len(tag)) == len(tag) + len(s):
            return full
    return None


@pytest.mark.usefixtures("spark")
@given(lit=texts, ident=idents)
@settings(**_SETTINGS)
def test_postgres_forms_execute_to_generated_value(spark, lit, ident):
    """All three postgres string encodings of the same value — standard-
    conforming plain, E-string, dollar-quoted — survive transpilation and
    evaluate to the value byte-for-byte; the ANSI identifier resolves."""
    plain = "'" + lit.replace("'", "''") + "'"
    estring = "E'" + lit.replace("\\", "\\\\").replace("'", "\\'") + "'"
    cols = [f"{plain} as a", f"{estring} as b"]
    dollar = _dollar_quote(lit)
    if dollar is not None:
        cols.append(f"{dollar} as c")
    q_ident = ident.replace('"', '""')
    sql = f'select {", ".join(cols)}, "{q_ident}" from tq'
    spark_ident = "`" + ident.replace("`", "``") + "`"
    spark.sql(f"select 1 as x, 42 as {spark_ident}").createOrReplaceTempView("tq")
    row = _run_one(spark, to_spark_sql(sql, "postgres"))
    assert row.a == lit
    assert row.b == lit
    if dollar is not None:
        assert row.c == lit
    assert row[len(cols)] == 42  # the translated identifier resolved


@pytest.mark.usefixtures("spark")
@given(lit=texts, ident=idents)
@settings(**_SETTINGS)
def test_snowflake_forms_execute_to_generated_value(spark, lit, ident):
    """Snowflake: backslash-escaped strings, bare $$ bodies, ANSI idents,
    // line comments."""
    esc = "'" + lit.replace("\\", "\\\\").replace("'", "\\'") + "'"
    cols = [f"{esc} as a"]
    dollar = _dollar_quote(lit, tags=("$$",))  # snowflake: bare $$ only
    if dollar is not None:
        cols.append(f"{dollar} as b")
    q_ident = ident.replace('"', '""')
    sql = f'select {", ".join(cols)}, "{q_ident}" from tq // trailing\n'
    spark_ident = "`" + ident.replace("`", "``") + "`"
    spark.sql(f"select 7 as {spark_ident}").createOrReplaceTempView("tq")
    row = _run_one(spark, to_spark_sql(sql, "snowflake"))
    assert row.a == lit
    if dollar is not None:
        assert row.b == lit
    assert row[len(cols)] == 7


@pytest.mark.usefixtures("spark")
@given(lit=texts)
@settings(**_SETTINGS)
def test_bigquery_forms_execute_to_generated_value(spark, lit):
    """GoogleSQL: backslash-escaped single-quote strings, double-quote
    strings, triple-quoted strings, and raw strings (when representable)
    all transpile to Spark literals evaluating to the generated value."""
    esc = lit.replace("\\", "\\\\").replace("'", "\\'")
    esc_dq = lit.replace("\\", "\\\\").replace('"', '\\"')
    cols = [f"'{esc}' as a", f'"{esc_dq}" as b', f"'''{esc}''' as c"]
    if "'" not in lit and "\\" not in lit:
        cols.append(f"r'{lit}' as d")
    sql = f"select {', '.join(cols)}"
    row = _run_one(spark, to_spark_sql(sql, "bigquery"))
    assert row.a == lit
    assert row.b == lit
    assert row.c == lit
    if "'" not in lit and "\\" not in lit:
        assert row.d == lit


@pytest.mark.usefixtures("spark")
@given(n=st.integers(min_value=-10_000, max_value=10_000), lit=texts)
@settings(**_SETTINGS)
def test_pg_cast_and_adjacent_code_survive(spark, n, lit):
    """``expr::type`` casts pass through the shim untouched and execute on
    Spark; a string literal right next to the cast doesn't confuse span
    boundaries."""
    plain = "'" + lit.replace("'", "''") + "'"
    sql = f"select '{n}'::int + 1 as n, {plain} as v"
    row = _run_one(spark, to_spark_sql(sql, "postgres"))
    assert row.n == n + 1
    assert row.v == lit


@pytest.mark.usefixtures("spark")
@given(lit=texts)
@settings(**_SETTINGS)
def test_mysql_literal_roundtrips_through_spark(spark, lit):
    """encode_literal under mysql rules, transpiled, executes to the value;
    and the mysql escape decoder folds adjacent literals to the same
    result as evaluating them separately and concatenating."""
    from syncmaven_spark.sql import encode_literal, to_spark_sql

    sql = f"select {encode_literal(lit, 'mysql')} as v"
    assert spark.sql(to_spark_sql(sql, "mysql")).collect()[0].v == lit
    # adjacency: value || value under fold
    two = f"select {encode_literal(lit, 'mysql')} {encode_literal(lit, 'mysql')} as v"
    assert spark.sql(to_spark_sql(two, "mysql")).collect()[0].v == lit + lit
