"""SparkSession factory with scale-appropriate defaults.

Local tests run on ``local[N]``; production is a multi-executor cluster. The
settings below are the ones that matter at both scales: AQE for runtime
re-planning (skew joins, partition coalescing), Arrow for the Pandas-UDF slow
path, UTC session timezone for deterministic timestamp semantics against
external oracles and golden files.
"""

from __future__ import annotations

import logging
import os
import time

from pyspark.sql import SparkSession

log = logging.getLogger("syncmaven_spark.session")


def get_spark(
    app_name: str = "syncmaven_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master``/``shuffle_partitions`` default from ``SPARK_GRAFT_CPUS`` so that
    the bench driver controls parallelism without code changes.

    .. warning:: **Process-global side effect** — unless
       ``SYNCMAVEN_SPARK_NO_TZSET=1`` is set, this call pins the HOST
       PROCESS to UTC (``os.environ['TZ'] = 'UTC'`` + ``time.tzset()``),
       changing ``datetime.fromtimestamp()`` / ``time.localtime()``
       behavior for ALL code in the embedding application, not just this
       library. This is load-bearing for cursor correctness (see the
       comment below); embedders that already run their process in UTC —
       or that accept responsibility for pinning it themselves — can opt
       out with ``SYNCMAVEN_SPARK_NO_TZSET=1``. Running with the opt-out
       on a non-UTC host breaks incremental-cursor and golden-file
       semantics.
    """
    # Pin the PYTHON process to UTC, not just the Spark session: PySpark's
    # non-Arrow driver conversion (toLocalIterator/collect/Observation row
    # values) builds naive datetimes with datetime.fromtimestamp() in the
    # OS timezone, IGNORING spark.sql.session.timeZone. On a UTC+2 host a
    # 12:00Z cursor would arrive as naive 14:00, get persisted as
    # "14:00Z", and the next incremental run's >= predicate would silently
    # skip two hours of rows. The engine's semantics are UTC end-to-end
    # (golden files, DuckDB oracle, ISO-millis sinks) — documented in
    # README; tzset is a no-op guard on platforms without it (Windows).
    if os.environ.get("SYNCMAVEN_SPARK_NO_TZSET") != "1":
        os.environ["TZ"] = "UTC"
        if hasattr(time, "tzset"):
            time.tzset()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE(round-11): coalescePartitions.parallelismFirst=false (the
        # Spark docs' production suggestion) was measured here and
        # REVERTED: it cut the shuffle-heavy extras a few percent but
        # coalesced compute-heavy-yet-byte-small post-shuffle stages
        # (ngram explode, token sorts) down to one task — headline
        # entries regressed 30-100% (text_ngram_freq 1.15→1.89 s,
        # dedup_cluster_pipeline 1.55→2.52 s). Byte-based coalescing
        # cannot see per-row compute cost; the default parallelism-first
        # policy is the right trade for this catalog at every scale.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # commit task output directly to the final location (v2): the
        # default v1 double-rename per file dominated the many small
        # partitioned-state writes (store/ids epoch dirs, codebook
        # tables); v2 halves the renames. Task-commit atomicity is
        # preserved; the job-level non-atomicity v2 trades away is
        # already handled by the state layout's own tmp-dir + atomic
        # rename / overwrite-per-epoch conventions.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str):
    """``spark.read.parquet`` that tolerates TIMESTAMP(NANOS) columns.

    Spark's parquet reader rejects nanosecond timestamps outright
    (PARQUET_TYPE_ILLEGAL); with ``spark.sql.legacy.parquet.nanosAsLong`` they
    arrive as raw int64 nanos. We detect nanos columns from the parquet footer
    (cheap — metadata only) and cast them back to proper timestamps, keeping
    column order. Micros truncation matches what any engine reading the same
    file at micro precision (e.g. DuckDB) produces.
    """
    from pyspark.sql import functions as F

    try:
        import pyarrow.parquet as pq

        footer = pq.read_schema(path)
        nanos_cols = [f.name for f in footer if str(f.type).startswith("timestamp[ns")]
    except Exception:
        nanos_cols = []

    if not nanos_cols:
        return spark.read.parquet(path)

    # scope the legacy conf to THIS read: left set session-wide, a later
    # read whose footer probe failed would silently deliver raw int64
    # nanos as longs instead of raising PARQUET_TYPE_ILLEGAL loudly
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(conf_key, "false")
    spark.conf.set(conf_key, "true")
    try:
        df = spark.read.parquet(path)  # schema resolves eagerly here
        return df.select(
            *[
                F.timestamp_micros(F.expr(f"`{c}` div 1000")).alias(c)
                if c in nanos_cols
                else F.col(c)
                for c in df.columns
            ]
        )
    finally:
        spark.conf.set(conf_key, prev)


# DataFrame catalog per (session, directory): building the table DataFrames
# costs ~1 s of driver time per call (a plan-analysis round-trip per table
# plus the footer probes) and the plans are immutable once built — a real
# catalog resolves a table once, not once per query. The cache lives as an
# attribute ON the session object (not a module global): every cached
# DataFrame holds a strong reference back to its session, so a weak-keyed
# global could never evict — an attribute's lifetime is exactly the
# session's.
_TABLES_CACHE_ATTR = "_syncmaven_table_cache"


_IDENTIFIER_RE = None


def _table_names_in(sf_dir: str) -> list[str]:
    """Every ``<name>.parquet`` entry in the directory whose stem is a
    plain SQL identifier (registerable as a temp view without quoting) —
    NOT just the benchmark ``TABLE_NAMES`` tuple: user source directories
    carry arbitrary table names (round-5 review finding: a model over
    ``users.parquet`` was never registered). Sorted for deterministic
    fingerprints."""
    global _IDENTIFIER_RE
    if _IDENTIFIER_RE is None:
        import re

        _IDENTIFIER_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*$")
    try:
        entries = os.listdir(sf_dir)
    except OSError:
        return []
    names = set()
    for e in entries:
        if e.endswith(".parquet"):
            stem = e[: -len(".parquet")]
            if _IDENTIFIER_RE.match(stem):
                names.add(stem)
    return sorted(names)


def _dir_fingerprint(sf_dir: str) -> tuple:
    """Cheap staleness key for a table directory: (name, mtime_ns, size)
    per ``<table>.parquet`` entry. A handful of stat calls, vs the ~1s a
    cold ``read_parquet`` spends probing footers and analyzing plans."""
    parts = []
    for name in _table_names_in(sf_dir):
        path = os.path.join(sf_dir, f"{name}.parquet")
        try:
            st = os.stat(path)
        except OSError:
            continue
        parts.append((name, st.st_mtime_ns, st.st_size))
    return tuple(parts)


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    register_views: bool = True,
    refresh: bool = False,
):
    """Load the driver testdata parquet tables and register them as temp views.

    Returns ``{name: DataFrame}``. Scans stay lazy — Catalyst prunes columns
    and pushes filters into the parquet reader per consuming query. The
    DataFrames are cached per (session, directory), keyed by a stat
    fingerprint (per-table path, mtime, size): a grown/replaced source
    directory invalidates the entry automatically, while unchanged
    directories skip the ~1s of parquet footer probing + plan analysis a
    cold load costs. ``refresh=True`` force-drops the entry regardless.
    Views are (re-)registered on every call — cheap on repeat, and it heals
    any view another caller replaced under the same name.

    A file OVERWRITTEN in place inside a directory-shaped ``.parquet``
    (same name, same size, same mtime resolution) can evade the
    fingerprint — Spark's own writers always create new part files, so
    this only matters for exotic manual edits; those callers pass
    ``refresh=True``.
    """
    # The engine's timestamp semantics are UTC (golden files, DuckDB oracle
    # parity). The round driver may hand us a session with a different zone —
    # pin it here so LTZ values (e.g. the nanos-cast events.ts) and
    # epoch/date functions are deterministic regardless of the host session.
    # Python's process tz is pinned too (see get_spark — a PROCESS-GLOBAL
    # side effect; embedders opt out with SYNCMAVEN_SPARK_NO_TZSET=1):
    # driver-side row conversion ignores the session zone on non-UTC hosts.
    if os.environ.get("SYNCMAVEN_SPARK_NO_TZSET") != "1":
        os.environ["TZ"] = "UTC"
        if hasattr(time, "tzset"):
            time.tzset()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Testdata parquet stores timestamps as timestamp[us] with
    # isAdjustedToUTC=false; Spark 4 would infer TIMESTAMP_NTZ, which breaks
    # LTZ-only functions (unix_micros) and diverges from the UTC-instant
    # semantics the catalog + golden files assume. Under a UTC session the
    # LTZ reading is value-identical to the naive wall clock DuckDB sees.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    per_session = spark.__dict__.setdefault(_TABLES_CACHE_ATTR, {})
    cache_key = os.path.abspath(sf_dir)
    fingerprint = _dir_fingerprint(sf_dir)
    if refresh:
        # drop first so a failed re-read can't leave the stale entry behind
        per_session.pop(cache_key, None)
    cached = per_session.get(cache_key)
    tables = cached[1] if cached is not None and cached[0] == fingerprint else None
    if tables is None:
        tables = {}
        for name in _table_names_in(sf_dir):
            try:
                tables[name] = read_parquet(
                    spark, os.path.join(sf_dir, f"{name}.parquet")
                )
            except Exception:
                # a stray/corrupt NON-benchmark artifact (tmp_export.parquet,
                # a zero-byte leftover) must not abort every query over the
                # directory — skip it loudly; the canonical tables still
                # fail hard because the catalog cannot run without them
                if name in TABLE_NAMES:
                    raise
                log.warning(
                    "skipping unreadable parquet %r in %s", name, sf_dir,
                    exc_info=True,
                )
        if not tables:
            raise FileNotFoundError(
                f"no parquet tables found in {sf_dir!r}"
            )
        per_session[cache_key] = (fingerprint, tables)
    if register_views:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
    return dict(tables)
