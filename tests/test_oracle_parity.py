"""Every catalog query with an oracle must match DuckDB exactly —
this test predicts the driver's CORRECTNESS gate."""

import pytest

from syncmaven_spark.oracle import compare, duckdb_connection
from syncmaven_spark.queries import CATALOG

from tests.conftest import SF_CORRECTNESS

ORACLED = [name for name, qd in CATALOG.items() if qd.oracle]


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_CORRECTNESS)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, con, name):
    qd = CATALOG[name]
    df = qd.spark_fn(spark, SF_CORRECTNESS)
    result = compare(name, df, con, qd.oracle)
    assert result.ok, result.detail


def test_queries_md_in_sync():
    from syncmaven_spark.inventory import QUERIES_MD_PATH, render_inventory

    with open(QUERIES_MD_PATH) as f:
        on_disk = f.read()
    assert on_disk == render_inventory(), (
        "QUERIES.md is stale — regenerate with "
        "`python -m syncmaven_spark.inventory`"
    )


def test_all_queries_return_rows(spark):
    for name, qd in CATALOG.items():
        df = qd.spark_fn(spark, SF_CORRECTNESS)
        assert df.count() >= 0, name  # materializes; schema must be stable
