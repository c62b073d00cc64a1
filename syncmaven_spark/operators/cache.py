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

import logging
import re
import threading

from pyspark.sql import DataFrame

log = logging.getLogger("syncmaven_spark.operators.cache")

# (semantic_key, df) pairs, oldest first. The key is computed ONCE at insert
# (a py4j round-trip) so the refresh scan below is a pure-Python comparison.
# All pool mutations happen under _POOL_LOCK: the alias scan does py4j
# round-trips (GIL released) between finding an index and popping it, so a
# concurrent insert from another job-submission thread could otherwise pop
# the wrong entry — leaving a live cache outside the pool, pinned forever.
_LIVE_CACHES: list[tuple[object, DataFrame]] = []
_POOL_LOCK = threading.Lock()
_MAX_LIVE_CACHES = 16
_DEFAULT_MAX_BYTES = 4 << 30  # 4 GiB

_BUDGET_CONF = "spark.syncmaven.cachePool.maxBytes"
_SIZE_RE = re.compile(r"^\s*(\d+)\s*([kmgt]?)b?\s*$", re.I)
_SIZE_MULT = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_budget(raw: str | None) -> int:
    """Byte budget from the conf — plain integers or Spark-style size
    strings ('4g', '512m'). An unparsable value logs a warning and falls
    back to the default rather than silently disabling the byte bound
    (it used to vanish into the best-effort except below)."""
    if raw is None:
        return _DEFAULT_MAX_BYTES
    m = _SIZE_RE.match(str(raw))
    if m is None:
        log.warning(
            "%s=%r is not a size; using default %d bytes",
            _BUDGET_CONF, raw, _DEFAULT_MAX_BYTES,
        )
        return _DEFAULT_MAX_BYTES
    return int(m.group(1)) * _SIZE_MULT[m.group(2).lower()]


def _cached_bytes(spark) -> int:
    """Total cached bytes (memory + disk) across the app, from the JVM.

    Global rather than per-entry: attributing blocks to a specific
    DataFrame's InMemoryRelation is brittle across Spark versions, and for a
    budget guard the app total is the number that actually matters.
    """
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() + i.diskSize() for i in infos)


def _semantic_key(df: DataFrame):
    """Semantic hash of the analyzed plan — two DataFrames with equivalent
    plans share one CacheManager entry, so the pool must treat them as ONE
    pool entry. Returns None where plan introspection is unavailable
    (Spark Connect); callers fall back to identity (append)."""
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return None


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    """Exact plan-equivalence check (``sameResult``), used to confirm a
    semanticHash match: the hash is 32-bit, and treating a collision as an
    alias would pop an unrelated entry without unpersisting it — a pinned
    cache the pool could never evict."""
    try:
        return bool(
            a._jdf.queryExecution()
            .analyzed()
            .sameResult(b._jdf.queryExecution().analyzed())
        )
    except Exception:
        return False


def persist_scoped(df: DataFrame) -> DataFrame:
    """Persist ``df`` into the bounded pool (count- and byte-bounded LRU).

    Re-persisting an equivalent plan (e.g. the same catalog query executed
    again) REFRESHES the existing entry's LRU position instead of appending
    a duplicate: Spark's CacheManager keys the cache by canonicalized plan,
    so a duplicate pool entry would alias the same cache — and evicting the
    older alias under count pressure would unpersist the cache out from
    under the newer one. (Observed: the 3rd execution of the cluster
    pipeline recomputed everything because its own run-1 aliases were
    evicted mid-run.)
    """
    df = df.persist()
    key = _semantic_key(df)
    with _POOL_LOCK:
        if key is not None:
            for i, (old_key, old_df) in enumerate(_LIVE_CACHES):
                if old_key == key and _same_plan(old_df, df):
                    _LIVE_CACHES.pop(i)
                    break
        _LIVE_CACHES.append((key, df))
        while len(_LIVE_CACHES) > _MAX_LIVE_CACHES:
            _LIVE_CACHES.pop(0)[1].unpersist()
        try:
            spark = df.sparkSession
            budget = _parse_budget(spark.conf.get(_BUDGET_CONF, None))
            # NOTE: persist() is lazy — the entry just inserted reports ~0
            # bytes until an action materializes it, so byte enforcement
            # runs one insert behind: the next persist_scoped call evicts
            # for it. The residual overshoot is bounded by the single
            # largest entry (the count bound still caps entry count).
            while len(_LIVE_CACHES) > 1 and _cached_bytes(spark) > budget:
                _LIVE_CACHES.pop(0)[1].unpersist(blocking=True)
        except Exception:
            # storage introspection is best-effort (e.g. Spark Connect has
            # no _jsc); the count bound above still applies
            pass
    return df
