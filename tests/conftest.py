import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
SF_CORRECTNESS = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from syncmaven_spark.session import get_spark

    s = get_spark(app_name="syncmaven_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def testdata(spark):
    from syncmaven_spark.session import load_tables

    return load_tables(spark, SF_SMOKE)
