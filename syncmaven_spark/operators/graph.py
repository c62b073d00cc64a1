"""Distributed connected components — the dedup *clustering* step.

LSH / SimHash candidate generation (operators/dedup.py) yields near-dup
PAIRS; collapsing pairs into groups ("keep one doc per duplicate cluster")
is a connected-components problem. The reference has no analogue (its dedup
story stops at per-row idempotency keys, cf. mixpanel ``$insert_id``,
``packages/connectors/mixpanel/types.go:73-95``); this is part of the
training-data-pipeline extension surface.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the edge list
itself is rewritten toward star graphs whose centers are component minima:

- large-star(v): every neighbor u > v re-attaches to min(Γ(v) ∪ {v})
- small-star(v): every neighbor u ≤ v (and v itself) attaches to that min

Each phase is one groupBy (per-node min) + one join (re-attach), i.e. two
shuffles keyed on node id; the edge multiset stays O(V + E). Convergence is
provably O(log² V) rounds (a handful in practice — a 500-node chain takes
~6). Naive min-label propagation is O(diameter) rounds on chains, and even
label pointer-doubling degenerates there, because a node's label is by
construction a *local minimum* whose own label improves only when plain
relaxation crawls into it — measured: 76 rounds on the sf0.1 document
graph vs 6 for star rewriting.

Execution is **hybrid**: star-rewriting rounds run distributed while the
edge count exceeds ``local_finish_edges`` (default 1M); at or below it the
remaining graph is collected and solved driver-side with union-find — one
scheduling-bound distributed round (~6 stages) costs more wall-clock than
collecting a ≤1M-edge list (≤16 MB) outright. This mirrors the bounded
driver steps elsewhere in the engine (IVF centroid sample): deliberate,
size-gated, and O(bound) memory. ``local_finish_edges=0`` forces the pure
distributed loop.

Scale notes:
- **Rounds are carried via a parquet round-trip, not
  ``localCheckpoint``/``checkpoint``.** Measured on pyspark 4.1.2 (local
  mode, AQE on or off), a checkpointed self-join loop still recomputes
  both join sides from the checkpoint's parent every round — cost doubles
  per iteration and dies around round 20 even on 1k rows. A parquet
  write/read is a true lineage cut, costs ~0.1s/round locally, and is what
  reliable checkpointing does on a cluster anyway (point ``work_dir`` at
  shared storage there).
- Convergence is detected with one (count, hash-sum) aggregate over the
  canonicalized edge list per round — no row-level diff.
- Skew: a giant component's center accumulates degree = component size.
  large-star spreads re-attachment across many nodes (it only moves
  larger-id neighbors), which is the paper's skew argument; AQE skew-join
  handles the residue.
"""

from __future__ import annotations

import atexit
import glob
import shutil
import tempfile

from pyspark.sql import DataFrame, Observation, functions as F
from pyspark.sql import types as T


def _roundtrip(df: DataFrame, path: str, read_with=None) -> DataFrame:
    df.write.mode("overwrite").parquet(path)
    # explicit schema: skips the footer-sampling pass on every re-read.
    # ``read_with`` rebinds the re-read to another session (the loop's
    # private tuned session, or back to the caller's for the final result).
    spark = read_with or df.sparkSession
    return spark.read.schema(df.schema).parquet(path)


def _roundtrip_with_fingerprint(
    df: DataFrame, path: str, read_with=None
) -> tuple[DataFrame, tuple[int, int]]:
    """Lineage-cutting parquet round-trip that also returns the edge-set
    fingerprint (count, xxhash64 xor) of what was written. The fingerprint
    rides the write job as an Observation — one job per round instead of a
    write plus a separate re-read aggregate. bit_xor, not sum:
    order-independent and cannot overflow under ANSI mode."""
    obs = Observation()
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
    )
    observed.write.mode("overwrite").parquet(path)
    vals = obs.get
    spark = read_with or df.sparkSession
    return (
        spark.read.schema(df.schema).parquet(path),
        (vals["n"], vals["h"]),
    )


def _star_iteration(cur: DataFrame) -> DataFrame:
    """One large-star + small-star rewrite of a canonical (a > b) edge list."""
    # --- large-star: neighbors u > v re-attach to min(Γ(v) ∪ {v}) ---
    sym = cur.select(F.col("a").alias("v"), F.col("b").alias("u")).union(
        cur.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    mins = (
        sym.groupBy("v")
        .agg(F.min("u").alias("mn"))
        .select("v", F.least("mn", "v").alias("m"))
    )
    # no distinct here: duplicate (a, b) edges are harmless to the
    # small-star min/join below and the round's final distinct removes
    # them — a mid-round dedup would cost a full extra shuffle
    ls = (
        sym.join(mins, "v")
        .filter(F.col("u") > F.col("v"))
        .select(F.col("u").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )

    # --- small-star: on (big → small) edges, small neighbors and the
    # node itself attach to the minimum ---
    smins = ls.groupBy("a").agg(F.min("b").alias("m"))
    ss_leaves = (
        ls.join(smins, "a")
        .select(F.col("b").alias("node"), F.col("m").alias("m"))
        .filter(F.col("node") != F.col("m"))
    )
    ss_self = smins.select(F.col("a").alias("node"), F.col("m").alias("m"))
    return (
        ss_leaves.union(ss_self)
        .select(
            F.greatest("node", "m").alias("a"), F.least("node", "m").alias("b")
        )
        .distinct()
    )


# Below this many edges a round is scheduling-bound, not data-bound: AQE's
# per-stage re-planning barriers and default-sized shuffles cost more than
# they save. ~10M edges ≈ 240MB shuffled — still comfortably one executor's
# work. Large graphs keep AQE (skew-join splitting matters for giant
# components) and the session's partitioning.
_SMALL_GRAPH_EDGES = 10_000_000
_EDGES_PER_PARTITION = 2_000_000


def _loop_session(spark):
    """A private session for the iteration loop — shared SparkContext (so
    executors, cached blocks, and the event log are all shared), isolated
    SQLConf — so the per-round conf tuning below can never leak into
    queries planned concurrently on the caller's session by another
    job-submission thread. The confs the rounds depend on are copied over
    (``newSession`` starts from the context defaults, not the caller's
    runtime confs). Falls back to the caller's session where ``newSession``
    is unavailable (Spark Connect), restoring the old shared-session
    behavior (tuning still restores on exit there)."""
    try:
        s = spark.newSession()
    except Exception:
        return spark
    for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.shuffle.partitions",
        "spark.sql.session.timeZone",
        "spark.sql.ansi.enabled",
    ):
        try:
            s.conf.set(k, spark.conf.get(k))
        except Exception:
            pass
    return s


class _LoopConfs:
    """Scoped override of shuffle confs for small iteration rounds; always
    restores the session's originals (a belt-and-braces no-op on the
    private loop session, load-bearing on the Spark Connect fallback where
    the loop shares the caller's session)."""

    _KEYS = ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")

    def __init__(self, spark):
        self._spark = spark
        self._orig = {k: spark.conf.get(k) for k in self._KEYS}
        self._overridden = False

    def tune_for(self, n_edges: int) -> None:
        if 0 < n_edges < _SMALL_GRAPH_EDGES:
            parts = n_edges // _EDGES_PER_PARTITION + 1
            self._spark.conf.set("spark.sql.adaptive.enabled", "false")
            self._spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            self._overridden = True
        elif self._overridden:
            self.restore()

    def restore(self) -> None:
        for k, v in self._orig.items():
            self._spark.conf.set(k, v)
        self._overridden = False


def _local_components(cur: DataFrame, session=None) -> DataFrame:
    """Driver-local union-find over a SMALL edge list → ``(v, component)``.

    Union-by-min with path compression: the root of every tree is the
    minimum id of its component by invariant (a union always keeps the
    smaller of the two roots), so labels fall out of one final find() pass.
    Pure Python handles ~1M edges in ≈1 s; callers gate on the exact edge
    count before calling. Returns a LocalRelation — no files, no lineage.
    ``session`` overrides which session owns the result (the caller's, when
    ``cur`` lives on the loop's private tuned session).
    """
    return _components_from_pdf(cur, cur.toPandas(), session=session)


def _components_from_pdf(cur: DataFrame, pdf, session=None) -> DataFrame:
    """Union-find over an already-collected canonical edge list (columns
    ``a``/``b``); ``cur`` supplies the id type, and ``session`` (default:
    ``cur``'s session) owns the result."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(pdf["a"].tolist(), pdf["b"].tolist()):
        if x not in parent:
            parent[x] = x
        if y not in parent:
            parent[y] = y
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry

    id_type = cur.schema["a"].dataType
    schema = T.StructType(
        [T.StructField("v", id_type), T.StructField("component", id_type)]
    )
    labels = [(x, find(x)) for x in parent]
    spark = session or cur.sparkSession
    return spark.createDataFrame(labels, schema)


# Collecting fewer edges than this and finishing with driver-side union-find
# is cheaper than even ONE more distributed round (a round is ~6
# scheduling-bound stages; 1M edges collect+union-find ≈ 1 s driver-side,
# 16 MB of longs). The distributed loop remains the only path above the
# bound — at 100 TB the active edge set is far past it until the final
# contraction, and if it never shrinks below the bound the loop simply runs
# to fixpoint as before.
_LOCAL_FINISH_EDGES = 1_000_000


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 30,
    work_dir: str | None = None,
    local_finish_edges: int = _LOCAL_FINISH_EDGES,
) -> DataFrame:
    """Label every node with the minimum node id of its component.

    ``edges`` is an undirected pair list; ``nodes`` (single-column, same id
    type) optionally adds isolated vertices, which label themselves.
    Returns ``(v, component)``. Graphs whose RAW edge list fits
    ``local_finish_edges`` are solved entirely driver-side and return a
    local-relation-backed result — no files are written and a
    caller-supplied ``work_dir`` is untouched. When the distributed loop
    runs, the final label table lives under ``work_dir`` — the directory
    must outlive the result's consumption.
    When ``work_dir`` is not supplied, a fresh temp dir is used and removed
    at interpreter exit (callers that need the result to outlive the
    process must pass their own directory). Raises ``RuntimeError`` if the
    edge rewriting has not reached fixpoint within ``max_iter`` rounds —
    a non-fixpoint edge list is not a union of stars, so label extraction
    would silently under-merge components.

    Hybrid execution: star-rewriting rounds run distributed while the
    exact edge count (free — it rides each round's fingerprint) exceeds
    ``local_finish_edges``; at or below it the remaining graph is solved
    driver-side with union-find (``_local_components``) — a bounded,
    deliberate driver step like the IVF centroid sample, because a
    scheduling-bound distributed round costs more than collecting the
    whole small edge list. ``local_finish_edges=0`` forces the pure
    distributed loop (used by tests and available to callers).
    """
    if local_finish_edges:
        # Small-graph fast path: probe the RAW edge list with one bounded
        # job BEFORE the canonicalizing distinct — limit over a scan is a
        # genuine short-circuit (no shuffle map side to compute), so on a
        # big graph the probe costs only ~bound scanned rows and the loop
        # path below runs exactly as it always did. If every raw edge fit,
        # the graph is solved driver-side (union-find tolerates duplicates
        # and either orientation; self-loops are dropped to match the
        # canonical form) with no distinct, no parquet round-trips, no
        # fingerprint job, and no work_dir at all (measured: 3.6 s → ~1 s
        # on the 256-edge sf0.1 document graph).
        # Nulls are filtered server-side (the distributed path drops them
        # via greatest/least + self-loop filter; and a null would coerce the
        # pandas column to float64/NaN and crash createDataFrame). Both
        # endpoints are cast to the canonical-path type — greatest(src, dst)
        # — so mixed src/dst numeric types label identically on both paths.
        common_type = (
            edges.select(F.greatest(F.col(src), F.col(dst)).alias("a"))
            .schema["a"]
            .dataType
        )
        raw = edges.filter(
            F.col(src).isNotNull() & F.col(dst).isNotNull()
        ).select(
            F.col(src).cast(common_type).alias("a"),
            F.col(dst).cast(common_type).alias("b"),
        )
        # the probe is only a genuine short-circuit when limit() doesn't
        # sit above an (uncached) shuffle — otherwise it executes the full
        # upstream map side, and a BIG graph would then recompute that
        # whole pipeline again for the canonical distinct below (2x the
        # expensive part). Cached inputs (e.g. the dedup pipeline's
        # pool-persisted verified pairs) stay probe-safe regardless.
        level = edges.storageLevel
        probe_safe = level.useMemory or level.useDisk
        if not probe_safe:
            try:
                plan = raw._jdf.queryExecution().executedPlan().toString()
                probe_safe = "Exchange" not in plan
            except Exception:
                probe_safe = True  # no introspection (Connect): old behavior
        if probe_safe:
            probe = raw.limit(local_finish_edges + 1).toPandas()
            if len(probe) <= local_finish_edges:
                out = _components_from_pdf(raw, probe[probe["a"] != probe["b"]])
                if nodes is not None:
                    out = _with_isolated(out, nodes)
                return out
            del probe

    # canonical undirected form (a > b), self-loops dropped
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix="cc_")
        atexit.register(shutil.rmtree, work_dir, ignore_errors=True)

    # The first (canonicalizing) write runs under the caller's session —
    # the big-graph shuffle where its AQE/partitioning is wanted — and the
    # re-read lands on a PRIVATE loop session, so the small-round conf
    # tuning below never leaks into queries planned concurrently on the
    # caller's session. The result is rebound to the caller's session
    # before returning.
    caller_spark = edges.sparkSession
    loop_spark = _loop_session(caller_spark)
    cur, prev_fp = _roundtrip_with_fingerprint(
        cur, f"{work_dir}/it_0", read_with=loop_spark
    )

    # Small rounds are scheduling-bound: once the edge count (known exactly
    # from the previous round's fingerprint) is small, each round runs with
    # AQE off and a count-derived shuffle-partition target — measured ~35%
    # per-round savings at bench scale, while big graphs keep the session's
    # AQE (skew-join splitting) and partitioning untouched.
    confs = _LoopConfs(loop_spark)
    final_it = 0
    converged = prev_fp[0] == 0  # no edges → already a (trivial) fixpoint
    try:
        for it in range(1, max_iter + 1):
            if converged or prev_fp[0] <= local_finish_edges:
                break
            confs.tune_for(prev_fp[0])
            nxt = _star_iteration(cur)
            cur, fp = _roundtrip_with_fingerprint(
                nxt, f"{work_dir}/it_{it}", read_with=loop_spark
            )
            final_it = it
            if it >= 2:
                shutil.rmtree(f"{work_dir}/it_{it - 2}", ignore_errors=True)
            if fp == prev_fp:
                converged = True
            prev_fp = fp

        local_finish = not converged and prev_fp[0] <= local_finish_edges
        if not converged and not local_finish:
            raise RuntimeError(
                f"connected_components did not reach fixpoint in {max_iter} "
                "rounds; labels would be wrong (under-merged). Raise max_iter."
            )

        if local_finish:
            # small remainder: solved eagerly driver-side (materialized
            # before the it_* files are removed below), result owned by the
            # caller's session
            out = _local_components(cur, session=caller_spark)
        else:
            # at fixpoint ``cur`` is a union of stars: label(a) = b, centers
            # and isolated vertices label themselves
            labels = cur.groupBy(F.col("a").alias("v")).agg(
                F.min("b").alias("component")
            )
            centers = (
                cur.select(F.col("b").alias("v"))
                .distinct()
                .join(labels, "v", "left_anti")
                .select("v", F.col("v").alias("component"))
            )
            # the labels roundtrip (executed on the tuned loop session)
            # rebinds the result to the caller's session; the isolated-node
            # anti-join below then plans entirely on caller-session inputs
            out = _roundtrip(
                labels.union(centers), f"{work_dir}/labels",
                read_with=caller_spark,
            )
        if nodes is not None:
            out = _with_isolated(out, nodes)
    finally:
        confs.restore()
        # it_* rounds are dead once `out` is materialized (labels roundtrip
        # / eager local finish above) — and on ANY exception, including the
        # fixpoint RuntimeError: a caller-supplied work_dir must not
        # accumulate leaked round files (only the tempdir default has
        # atexit cleanup)
        for leftover in glob.glob(f"{work_dir}/it_*"):
            shutil.rmtree(leftover, ignore_errors=True)
    return out


def _with_isolated(out: DataFrame, nodes: DataFrame) -> DataFrame:
    """Union in self-labeled rows for vertices that appear in ``nodes`` but
    in no edge."""
    vcol = nodes.columns[0]
    isolated = (
        nodes.select(F.col(vcol).alias("v"))
        .distinct()
        .join(out.select("v"), "v", "left_anti")
        .select("v", F.col("v").alias("component"))
    )
    return out.union(isolated)


def dedup_cluster_assignments(
    candidate_pairs: DataFrame,
    all_ids: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    **cc_kwargs,
) -> DataFrame:
    """Near-dup clusters from candidate pairs: ``(v, component, is_canonical)``.

    The canonical (kept) doc per cluster is the minimum id — matching
    ``exact_dedup``'s keep-lowest-id policy — so downstream "drop
    duplicates" is ``filter(is_canonical)``.

    ``cc_kwargs`` pass through to :func:`connected_components` — on a real
    multi-node cluster set ``work_dir`` to SHARED storage (the default temp
    dir is driver-local, which only a single-node deployment can read back),
    and tune ``local_finish_edges``/``max_iter`` as documented there.
    """
    cc = connected_components(
        candidate_pairs, id_a, id_b, nodes=all_ids, **cc_kwargs
    )
    return cc.withColumn("is_canonical", F.col("v") == F.col("component"))
