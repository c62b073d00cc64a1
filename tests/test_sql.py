"""SqlQuery parity tests (reference: packages/core/__tests__/lib/sql.test.ts)."""

import datetime as dt

import pytest

from syncmaven_spark.sql import SqlError, SqlQuery, encode_literal


def test_named_parameters_discovered():
    q = SqlQuery("select * from t where :cursor is null or id >= :cursor order by id")
    assert q.named_parameters() == ["cursor"]


def test_bigquery_at_params():
    q = SqlQuery("select * from t where @cursor is null or id >= @cursor")
    assert q.named_parameters() == ["cursor"]


def test_params_inside_strings_ignored():
    q = SqlQuery("select ':fake' as a, x from t where id >= :real -- :comment")
    assert q.named_parameters() == ["real"]


def test_pg_cast_not_a_param():
    q = SqlQuery("select id::text from t where ts >= :cursor")
    assert q.named_parameters() == ["cursor"]


def test_multi_statement_rejected():
    with pytest.raises(SqlError):
        SqlQuery("select 1; select 2")


def test_semicolon_in_string_ok():
    SqlQuery("select ';' as x from t;")  # trailing semicolon, one statement


def test_non_select_rejected():
    with pytest.raises(SqlError):
        SqlQuery("delete from t")
    with pytest.raises(SqlError):
        SqlQuery("insert into t values (1)")


def test_with_cte_allowed():
    SqlQuery("with c as (select 1 as x) select * from c")


def test_compile_null_cursor():
    q = SqlQuery("select * from t where :cursor is null or id >= :cursor")
    assert q.compile({"cursor": None}) == "select * from t where NULL is null or id >= NULL"


def test_compile_int_and_string():
    q = SqlQuery("select * from t where id >= :cursor and name = :name")
    out = q.compile({"cursor": 5, "name": "o'brien"})
    assert out == "select * from t where id >= 5 and name = 'o''brien'"


def test_compile_timestamp_cast():
    q = SqlQuery("select * from t where ts >= :cursor")
    ts = dt.datetime(2024, 5, 15, 13, 39, 5, 172000)
    assert q.compile({"cursor": ts}) == (
        "select * from t where ts >= CAST('2024-05-15 13:39:05.172000' AS TIMESTAMP)"
    )


def test_unknown_param_rejected():
    q = SqlQuery("select * from t")
    with pytest.raises(SqlError):
        q.compile({"cursor": 1})


def test_missing_param_compiles_to_null():
    q = SqlQuery("select * from t where :cursor is null")
    assert q.compile({}) == "select * from t where NULL is null"


def test_encode_literal_types():
    assert encode_literal(None) == "NULL"
    assert encode_literal(True) == "TRUE"
    assert encode_literal(3) == "3"
    assert encode_literal(3.5) == "3.5"
    assert encode_literal("x") == "'x'"
    with pytest.raises(SqlError):
        encode_literal(object())


def test_encode_literal_backslash_is_dialect_aware():
    # Spark (escapedStringLiterals=false) parses backslash escapes in
    # literals — backslashes must double; Postgres
    # (standard_conforming_strings=on) keeps them literal — doubling there
    # would silently change the pushed-down value.
    assert encode_literal("C:\\data") == "'C:\\\\data'"
    assert encode_literal("C:\\data", "postgres") == "'C:\\data'"
    assert encode_literal("it's", "postgres") == "'it''s'"
    # compile routes the model's dialect through to the encoder
    q = SqlQuery("select * from t where a >= :cursor", "postgres")
    assert q.compile({"cursor": "C:\\x"}) == "select * from t where a >= 'C:\\x'"


def test_to_spark_sql_translates_ansi_identifiers(spark):
    from syncmaven_spark.sql import to_spark_sql

    # postgres/snowflake double-quoted identifiers become backticks
    assert (
        to_spark_sql('select "a b", x from "T" where y = \'"\'', "postgres")
        == "select `a b`, x from `T` where y = '\"'"
    )
    # escaped quote inside the identifier
    assert to_spark_sql('select "a""b" from t', "snowflake") == "select `a\"b` from t"
    # comments and strings pass through byte-identical
    assert (
        to_spark_sql("select 1 -- \"not an ident\"\nfrom t", "postgres")
        == "select 1 -- \"not an ident\"\nfrom t"
    )
    # bigquery double quotes are strings — decoded under GoogleSQL rules
    # and re-encoded as a Spark single-quoted literal
    assert to_spark_sql('select "s" from t', "bigquery") == "select 's' from t"
    # spark dialect is a no-op
    assert to_spark_sql('select "s"', "spark") == 'select "s"'
    # end-to-end: a postgres-dialect model column reference runs on Spark
    spark.sql("select 1 as id, 'x' as `nm v`").createOrReplaceTempView("tq")
    got = spark.sql(to_spark_sql('select "nm v" from tq', "postgres")).collect()
    assert got[0][0] == "x"


def test_to_spark_sql_postgres_string_forms(spark):
    from syncmaven_spark.sql import to_spark_sql

    # plain postgres strings keep backslashes literal — doubled for Spark
    out = to_spark_sql("select 'C:\\x' as v", "postgres")
    assert out == "select 'C:\\\\x' as v"
    assert spark.sql(out).collect()[0].v == "C:\\x"
    # a postgres string ENDING in a backslash no longer breaks the scan
    out = to_spark_sql("select '\\' as v, \"c\" from t", "postgres")
    assert out == "select '\\\\' as v, `c` from t"
    # E'...' escape-strings are DECODED then re-encoded for Spark (postgres
    # \x / octal / \UXXXXXXXX escapes have no Spark equivalent)
    out = to_spark_sql("select E'it\\'s' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "it's"
    out = to_spark_sql("select E'\\x41\\101\\u0042\\n' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "AAB\n"
    # dollar-quoted strings become ordinary Spark literals
    out = to_spark_sql('select $$he said "hi"$$ as v', "postgres")
    assert spark.sql(out).collect()[0].v == 'he said "hi"'
    out = to_spark_sql("select $q$a'b\\c$q$ as v", "postgres")
    assert spark.sql(out).collect()[0].v == "a'b\\c"
    # snowflake strings use backslash escapes — the scan must honor them
    out = to_spark_sql("select 'it\\'s' as v, \"col\" from t", "snowflake")
    assert out == "select 'it\\'s' as v, `col` from t"


def test_postgres_masking_finds_params_after_backslash_string():
    # under standard_conforming_strings, '\' is a complete literal and
    # :cursor after it IS a parameter (the spark-rules masker used to eat it)
    q = SqlQuery("select '\\' as x from t where y >= :cursor", "postgres")
    assert q.named_parameters() == ["cursor"]
    # and inside a $$ body, a :name is NOT a parameter
    q2 = SqlQuery("select $$ :fake $$ as x from t where y >= :real", "postgres")
    assert q2.named_parameters() == ["real"]


def test_scanner_dialect_edges(spark):
    from syncmaven_spark.sql import to_spark_sql

    # snowflake bare $$ strings are lexed: no ident rewriting inside, and
    # params inside the body are not parameters
    out = to_spark_sql('select $$he said "hi"$$ as v', "snowflake")
    assert spark.sql(out).collect()[0].v == 'he said "hi"'
    q = SqlQuery("select $$ :fake $$ as x from t where y >= :real", "snowflake")
    assert q.named_parameters() == ["real"]
    # '$' inside a postgres identifier does not open a dollar quote
    q2 = SqlQuery("select col$q$x from t where y >= :cursor", "postgres")
    assert q2.named_parameters() == ["cursor"]
    # mysql '#' comments: masked for discovery, rewritten to -- for Spark
    q3 = SqlQuery("select c from t where c >= :cursor # :fake\n", "mysql")
    assert q3.named_parameters() == ["cursor"]
    out = to_spark_sql("select 1 as v # trailing note", "mysql")
    assert spark.sql(out).collect()[0].v == 1
    # mysql '--' needs trailing whitespace: 'a--:x' is arithmetic, not a
    # comment, so the parameter IS discovered (other dialects: comment)
    q4 = SqlQuery("select a--:cursor\nfrom t", "mysql")
    assert q4.named_parameters() == ["cursor"]
    assert SqlQuery("select a--:hidden\nfrom t", "spark").named_parameters() == []
    # snowflake '//' line comments are lexed (an apostrophe inside can't
    # swallow the rest of the query)
    q5 = SqlQuery(
        "select 1 as n // it's a note\nfrom t where c >= :cursor", "snowflake"
    )
    assert q5.named_parameters() == ["cursor"]


def test_pg_escape_string_byte_semantics(spark):
    from syncmaven_spark.sql import _decode_pg_escape_body, to_spark_sql

    # \x/octal escapes are BYTES composed then decoded as UTF-8 (é, not Ã©)
    assert _decode_pg_escape_body("\\xc3\\xa9") == "é"
    assert _decode_pg_escape_body("\\303\\251") == "é"
    # surrogate pairs combine to one codepoint
    assert _decode_pg_escape_body("\\ud83d\\ude04") == "\U0001f604"
    out = to_spark_sql("select E'\\ud83d\\ude04' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "\U0001f604"
    # PG-invalid inputs raise instead of emitting broken text
    with pytest.raises(SqlError):
        _decode_pg_escape_body("\\ud83d x")  # lone high surrogate
    with pytest.raises(SqlError):
        _decode_pg_escape_body("\\xc3 x")  # invalid UTF-8 byte sequence
    # uppercase \X is literal (PG recognizes lowercase \x only)
    assert _decode_pg_escape_body("\\X41") == "X41"


def test_compile_model_escapes_for_the_executing_engine(spark):
    from syncmaven_spark.runner import ModelDefinition, compile_model

    # postgres-dialect model, NO datasource → Spark executes → Spark escaping
    m = ModelDefinition(
        id="m",
        query='select "v" from t where "v" >= :cursor',
        cursor="v",
        dialect="postgres",
    )
    compiled = compile_model(m, "C:\\x")
    assert compiled == "select `v` from t where `v` >= 'C:\\\\x'"
    spark.sql("select 'C:\\\\z' as v").createOrReplaceTempView("t")
    assert spark.sql(compiled).collect()[0][0] == "C:\\z"
    # same model routed to a warehouse → verbatim text, postgres escaping
    m2 = ModelDefinition(
        id="m2",
        query='select "v" from t where "v" >= :cursor',
        cursor="v",
        dialect="postgres",
        datasource="postgres://h/db",
    )
    assert (
        compile_model(m2, "C:\\x")
        == 'select "v" from t where "v" >= \'C:\\x\''
    )
    # dialect left unset on a datasource model: derived from the
    # datasource's grammar, so pushdown escaping is still postgres
    m3 = ModelDefinition(
        id="m3",
        query='select "v" from t where "v" >= :cursor',
        cursor="v",
        datasource="postgres://h/db",
    )
    assert (
        compile_model(m3, "C:\\x")
        == 'select "v" from t where "v" >= \'C:\\x\''
    )


def test_compile_runs_on_spark(spark):
    q = SqlQuery(
        "select * from range(10) where :cursor is null or id >= :cursor order by id"
    )
    assert spark.sql(q.compile({"cursor": 7})).count() == 3
    assert spark.sql(q.compile({"cursor": None})).count() == 10
    # backslash-terminated string values survive the Spark round trip
    q2 = SqlQuery("select :v as v")
    assert spark.sql(q2.compile({"v": ";\\"})).collect()[0].v == ";\\"


def test_bigquery_string_lexing(spark):
    """GoogleSQL lexing (bigquery.ts model contract): no ''-doubling
    (adjacent literals concatenate), raw r'...' strings, triple-quoted
    strings, b'...' bytes → Spark X'' binary literals."""
    from syncmaven_spark.sql import SqlError, SqlQuery, to_spark_sql

    # '' closes + reopens: BigQuery reads 'it''s' as "its"
    out = to_spark_sql("select 'it''s' as v", "bigquery")
    assert spark.sql(out).collect()[0].v == "its"
    # adjacent literals across whitespace and comments concatenate
    out = to_spark_sql("select 'a' /*x*/ 'b' as v", "bigquery")
    assert spark.sql(out).collect()[0].v == "ab"
    # raw string: backslash-quote does NOT terminate; value keeps both chars
    out = to_spark_sql(r"select r'a\'b' as v", "bigquery")
    assert spark.sql(out).collect()[0].v == r"a\'b"
    # raw string contents are never parameter sites
    assert SqlQuery(r"select r':x' as v from t where a = :p", "bigquery").named_parameters() == ["p"]
    # triple-quoted: embedded single quotes/doubles are plain characters
    out = to_spark_sql("select '''it's \"ok\"''' as v", "bigquery")
    assert spark.sql(out).collect()[0].v == "it's \"ok\""
    # escapes decode under GoogleSQL rules (\x is a code point, 3-digit octal)
    out = to_spark_sql(r"select '\x41\101\u0042\n' as v", "bigquery")
    assert spark.sql(out).collect()[0].v == "AAB\n"
    # bytes literal → binary
    out = to_spark_sql(r"select b'\x00\xff' as v", "bigquery")
    assert out == "select X'00ff' as v"
    assert bytes(spark.sql(out).collect()[0].v) == b"\x00\xff"
    # GoogleSQL rejects unknown escapes — so do we
    with pytest.raises(SqlError):
        to_spark_sql(r"select '\q' as v", "bigquery")


def test_to_spark_sql_rejects_unterminated_spans():
    from syncmaven_spark.sql import SqlError, to_spark_sql

    for sql, dialect in [
        ("select 'oops from t", "postgres"),
        ('select "oops from t', "snowflake"),
        ("select $$oops from t", "postgres"),
        ("select E'oops from t", "postgres"),
        ("select r'oops from t", "bigquery"),
        ("select '''oops from t", "bigquery"),
    ]:
        with pytest.raises(SqlError):
            to_spark_sql(sql, dialect)


def test_timestamp_literals_are_dialect_aware():
    """The reference emits tz-aware casts per dialect; a naive literal
    compared to a timestamptz cursor column on a non-UTC server session
    would shift the incremental window."""
    import datetime as dt

    t = dt.datetime(2024, 5, 15, 13, 39, 5, 172000)
    assert (
        encode_literal(t, "postgres")
        == "CAST('2024-05-15 13:39:05.172000+00:00' AS TIMESTAMP WITH TIME ZONE)"
    )
    assert (
        encode_literal(t, "snowflake")
        == "CAST('2024-05-15 13:39:05.172000+00:00' AS TIMESTAMP_TZ)"
    )
    assert (
        encode_literal(t, "bigquery")
        == "CAST('2024-05-15 13:39:05.172000+00:00' AS TIMESTAMP)"
    )
    # aware datetimes normalize to UTC first
    est = dt.timezone(dt.timedelta(hours=-5))
    assert "18:39:05.172000+00:00" in encode_literal(t.replace(tzinfo=est), "postgres")
    # date-only values compare as DATE — tz-free in every engine (a UTC
    # midnight timestamptz would shift DATE-column comparisons on non-UTC
    # server sessions)
    assert encode_literal(dt.date(2024, 5, 15), "postgres") == (
        "CAST('2024-05-15' AS DATE)"
    )
    assert encode_literal(dt.date(2024, 5, 15)) == "CAST('2024-05-15' AS DATE)"
    # engines without a tz-aware cast target stay naive (session-zone)
    assert encode_literal(t, "mysql") == "CAST('2024-05-15 13:39:05.172000' AS DATETIME)"
    assert encode_literal(t, "spark") == "CAST('2024-05-15 13:39:05.172000' AS TIMESTAMP)"
    assert encode_literal(t, "derby") == "CAST('2024-05-15 13:39:05.172000' AS TIMESTAMP)"


def test_derby_dialect_is_ansi():
    """Derby (the embedded warehouse in the live JDBC test) lexes as
    strict ANSI: '' doubling, literal backslashes, double-quoted
    identifiers — and has no E''/$$ extensions."""
    from syncmaven_spark.sql import SqlQuery, encode_literal, to_spark_sql

    assert encode_literal("it's", "derby") == "'it''s'"
    assert encode_literal("C:\\x", "derby") == "'C:\\x'"
    # "E'x'" in derby is the identifier-boundary case: E is code, 'x' a string
    q = SqlQuery('select "a b" from t where v = \'no :param\' and x >= :c', "derby")
    assert q.named_parameters() == ["c"]
    assert to_spark_sql('select "a b" from t', "derby") == "select `a b` from t"
    # $$ is not dollar-quoting in derby
    assert SqlQuery("select 1 as a from t where b = '$$'", "derby").named_parameters() == []


def test_adjacent_literal_concatenation_per_dialect(spark):
    """Engines with the SQL adjacent-literal rule get their concatenation
    folded into ONE Spark literal — Spark would otherwise parse the
    trailing literal as an alias, silently renaming the column and
    dropping its content (round-4 review finding)."""
    from syncmaven_spark.sql import to_spark_sql

    # postgres: whitespace WITH a newline concatenates (plain and E'')
    out = to_spark_sql("select 'a'\n'b' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "ab"
    out = to_spark_sql("select E'x\\n'\n'y' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "x\ny"
    # same line, no newline: postgres itself rejects this (no concat, and
    # a string constant cannot be an alias) — so does the shim, instead of
    # letting Spark alias-parse it
    with pytest.raises(SqlError):
        to_spark_sql("select 'a' 'b'", "postgres")
    # comments participate in the newline rule ('--' yes, block comments no)
    out = to_spark_sql("select 'Hello ' -- greeting\n'world' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "Hello world"
    with pytest.raises(SqlError):
        to_spark_sql("select 'a' /*c*/\n'b' as v", "postgres")
    # \r counts as the newline, per scan.l's newline class
    out = to_spark_sql("select 'a'\r'b' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "ab"
    # dollar-quoted strings never participate
    out = to_spark_sql("select $$a$$\n'b' as v", "postgres")
    assert "'a'" in out and "'b'" in out
    # mysql: ANY whitespace (and comments) concatenates; escapes decode
    out = to_spark_sql("select 'a' 'b' as v", "mysql")
    assert spark.sql(out).collect()[0].v == "ab"
    out = to_spark_sql("select 'it''s' /*c*/ '\\n!' as v", "mysql")
    assert spark.sql(out).collect()[0].v == "it's\n!"
    # bigquery bytes literals fold too (X'..' X'..' would not parse)
    out = to_spark_sql(r"select b'\x61' b'\x62' as v", "bigquery")
    assert "X'6162'" in out
    assert bytes(spark.sql(out).collect()[0].v) == b"ab"


def test_bigquery_hash_comments_and_octal_bounds():
    """GoogleSQL '#' line comments lex (a quote inside one must not open a
    string span), and a >1-byte octal escape in a bytes literal raises
    SqlError, not a bare ValueError."""
    from syncmaven_spark.sql import SqlError, SqlQuery, to_spark_sql

    out = to_spark_sql("select 1 as v # it's a note\nfrom t", "bigquery")
    assert out == "select 1 as v -- it's a note\nfrom t"
    q = SqlQuery("select x from t where a = :p # :fake\n", "bigquery")
    assert q.named_parameters() == ["p"]
    # bigquery '--' opens a comment even without trailing whitespace
    assert to_spark_sql("select 1 --x'", "bigquery") == "select 1 --x'"
    with pytest.raises(SqlError):
        to_spark_sql(r"select b'\777' as v", "bigquery")


def test_pg_escape_string_continuation_fragments(spark):
    """PostgreSQL's lexer carries ESCAPE MODE into newline-separated
    continuation fragments of an E'' constant (scan.l quote-continue):
    the continuation's backslashes still escape — including a \\' that
    keeps the fragment open — and an E'' token itself never continues a
    prior constant."""
    from syncmaven_spark.sql import to_spark_sql

    out = to_spark_sql("select E'a'\n'\\n' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "a\n"  # \n decoded, not literal
    out = to_spark_sql("select E'x'\n'\\'' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "x'"  # \' stayed inside
    # plain continuation after a PLAIN string stays standard-conforming
    out = to_spark_sql("select 'a'\n'\\n' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "a\\n"  # backslash literal
    # E'' does not continue a prior constant — postgres errors, so do we
    with pytest.raises(SqlError):
        to_spark_sql("select 'a'\nE'b' as v", "postgres")
    # an escape-mode continuation may follow a '--' comment
    out = to_spark_sql("select E'a' -- c\n'\\n' as v", "postgres")
    assert spark.sql(out).collect()[0].v == "a\n"
    # masking agrees: :params inside an escape-mode continuation are text
    q = SqlQuery("select E'a'\n'\\':x' as v from t where y >= :real", "postgres")
    assert q.named_parameters() == ["real"]
