"""Bounded pool for persisted intermediates (signature / scored tables).

Operators persist O(n) intermediates (MinHash signatures, hashed shingle
sets, scored candidate tables) so both sides of a self-join — or several
stages of a pipeline — share one computation: Spark's CacheManager matches
equivalent plans, so e.g. the cluster pipeline legitimately reuses the
signature table the candidates query just cached. Evicting per call would
forfeit that and re-pay the explode+agg.

But repeated catalog/bench runs would otherwise pin dead cached blocks for
the Spark-app lifetime, so the pool is bounded two ways:

- **count** (``_MAX_LIVE_CACHES``): a hard cap on live entries;
- **bytes**: after each insert, the app's total cached storage (memory +
  disk, from the JVM's ``getRDDStorageInfo``) is polled and the oldest pool
  entries are evicted until the total fits ``spark.syncmaven.cachePool.maxBytes``
  (default 4 GiB). At cluster scale 16 large signature tables could
  otherwise pin real executor memory — the byte bound makes the pool safe
  regardless of entry size. The newest entry is never evicted (a single
  over-budget table is the caller's explicit choice).

Unpersisting an old entry is always safe: plans still holding it recompute.
``DataFrame.persist()``'s default level is MEMORY_AND_DISK(_DESER), so
entries spill rather than OOM while they live.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE_CACHES: list[DataFrame] = []
_MAX_LIVE_CACHES = 16
_DEFAULT_MAX_BYTES = 4 << 30  # 4 GiB

_BUDGET_CONF = "spark.syncmaven.cachePool.maxBytes"


def _cached_bytes(spark) -> int:
    """Total cached bytes (memory + disk) across the app, from the JVM.

    Global rather than per-entry: attributing blocks to a specific
    DataFrame's InMemoryRelation is brittle across Spark versions, and for a
    budget guard the app total is the number that actually matters.
    """
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() + i.diskSize() for i in infos)


def persist_scoped(df: DataFrame) -> DataFrame:
    """Persist ``df`` into the bounded pool (count- and byte-bounded LRU)."""
    _LIVE_CACHES.append(df.persist())
    while len(_LIVE_CACHES) > _MAX_LIVE_CACHES:
        _LIVE_CACHES.pop(0).unpersist()
    try:
        spark = df.sparkSession
        budget = int(spark.conf.get(_BUDGET_CONF, None) or _DEFAULT_MAX_BYTES)
        while len(_LIVE_CACHES) > 1 and _cached_bytes(spark) > budget:
            _LIVE_CACHES.pop(0).unpersist(blocking=True)
    except Exception:
        # storage introspection is best-effort (e.g. Spark Connect has no
        # _jsc); the count bound above still applies
        pass
    return df
