"""The bounded persist pool (operators/cache.py): count + byte eviction."""

import pytest
from pyspark.sql import functions as F

from syncmaven_spark.operators import cache


@pytest.fixture(autouse=True)
def _drain_pool(spark):
    yield
    # leave no persisted test tables behind for other test modules
    while cache._LIVE_CACHES:
        cache._LIVE_CACHES.pop()[1].unpersist(blocking=True)
    spark.conf.unset(cache._BUDGET_CONF)


def _table(spark, n, tag):
    # a column of distinct strings so each table has real cached bytes
    return spark.range(n).select(
        F.col("id"), F.concat(F.lit(tag), F.col("id").cast("string")).alias("s")
    )


def test_count_bound_evicts_oldest(spark):
    dfs = [_table(spark, 10, f"t{i}") for i in range(cache._MAX_LIVE_CACHES + 3)]
    for df in dfs:
        cache.persist_scoped(df)
    assert len(cache._LIVE_CACHES) == cache._MAX_LIVE_CACHES
    # the three oldest were unpersisted, the newest are live
    for df in dfs[:3]:
        assert df.storageLevel.useMemory is False
    for df in dfs[-3:]:
        assert df.storageLevel.useMemory or df.storageLevel.useDisk


def test_byte_budget_evicts_oldest_when_over(spark):
    spark.conf.set(cache._BUDGET_CONF, "1")  # 1 byte: anything cached is over
    a = cache.persist_scoped(_table(spark, 50_000, "a"))
    a.count()  # materialize so the JVM reports its bytes
    assert cache._cached_bytes(spark) > 1
    b = cache.persist_scoped(_table(spark, 10, "b"))
    # inserting b polled storage, saw the budget blown, evicted a
    assert a.storageLevel.useMemory is False
    assert [e[1] for e in cache._LIVE_CACHES] == [b]


def test_newest_entry_survives_even_over_budget(spark):
    spark.conf.set(cache._BUDGET_CONF, "1")
    a = cache.persist_scoped(_table(spark, 50_000, "solo"))
    a.count()
    b = cache.persist_scoped(_table(spark, 50_000, "solo2"))
    b.count()
    cache.persist_scoped(_table(spark, 10, "tiny"))
    # older over-budget entries go; the newest always stays usable
    assert len(cache._LIVE_CACHES) >= 1
    newest = cache._LIVE_CACHES[-1][1]
    assert newest.storageLevel.useMemory or newest.storageLevel.useDisk


def test_equivalent_plan_refreshes_entry_instead_of_duplicating(spark):
    """Re-executing the same query must not append an alias entry: both
    aliases share one CacheManager cache (keyed by canonicalized plan), so
    evicting the older alias under count pressure would unpersist the cache
    out from under the newer one — the bug that made the 3rd bench execution
    of the cluster pipeline recompute from scratch."""
    cache.persist_scoped(_table(spark, 10, "hot")).count()
    a2 = cache.persist_scoped(_table(spark, 10, "hot"))  # same plan, new object
    assert len(cache._LIVE_CACHES) == 1  # refreshed, not duplicated
    for i in range(cache._MAX_LIVE_CACHES - 1):
        cache.persist_scoped(_table(spark, 10, f"cold{i}"))
    # pool is now exactly at the bound; with a duplicate alias the first
    # eviction would have dropped the shared 'hot' cache
    assert a2.storageLevel.useMemory or a2.storageLevel.useDisk


def test_results_identical_after_eviction(spark):
    spark.conf.set(cache._BUDGET_CONF, "1")
    a = cache.persist_scoped(_table(spark, 1000, "x"))
    before = a.agg(F.sum("id")).collect()[0][0]
    a.count()
    cache.persist_scoped(_table(spark, 10, "y")).count()
    # a was evicted; plans still holding it recompute, same answer
    after = a.agg(F.sum("id")).collect()[0][0]
    assert before == after


def test_budget_conf_parses_size_strings_and_warns_on_garbage(caplog):
    """'4g'-style Spark size strings are the natural way to set the byte
    budget; a garbage value must fall back to the default WITH a warning
    (it used to silently disable byte eviction via the best-effort
    except)."""
    import logging

    from syncmaven_spark.operators.cache import _DEFAULT_MAX_BYTES, _parse_budget

    assert _parse_budget(None) == _DEFAULT_MAX_BYTES
    assert _parse_budget("1048576") == 1 << 20
    assert _parse_budget("4g") == 4 << 30
    assert _parse_budget("512M") == 512 << 20
    assert _parse_budget("2 GB") == 2 << 30
    with caplog.at_level(logging.WARNING, "syncmaven_spark.operators.cache"):
        assert _parse_budget("lots") == _DEFAULT_MAX_BYTES
    assert any("not a size" in r.message for r in caplog.records)
