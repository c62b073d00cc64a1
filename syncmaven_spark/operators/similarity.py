"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk_bruteforce``: the exact baseline — broadcast the query set,
  JVM-side dot products (``zip_with`` + ``aggregate``), per-query top-k via
  window. Cost is |corpus| × |queries| but each row stays in codegen; right
  whenever the query set is small.
- ``cosine_topk_ivf``: the scale path — IVF (inverted file) partitioning:
  k-means centroids are trained driver-side on a bounded sample (centroids
  are tiny — they broadcast), every corpus vector is assigned to its nearest
  centroid in one vectorized pandas pass, and each query probes only the
  ``n_probe`` nearest cells. The cross product shrinks by ~n_centroids/
  n_probe while recall stays high; this is the standard ANN trade
  (FAISS-style IVF-Flat) expressed as DataFrame ops: assignment column →
  equi-join on cell id → windowed top-k.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _cosine(dot, norm_a, norm_b, round_to: int):
    """Cosine with a guarded denominator: a zero-norm vector scores 0
    against everything — matching the numpy kernels' ``norm + 1e-12``
    normalization. The bare division produced 0/0 = NaN, which Spark
    ORDERS ABOVE every double (a zero vector ranked #1 for every query)
    and treats as ``>= threshold`` in filters."""
    return F.round(dot / F.greatest(norm_a * norm_b, F.lit(1e-12)), round_to)


def _pair_schema(df: DataFrame, id_col: str) -> str:
    """Output schema of a pair table: id type follows the input's id."""
    id_type = df.schema[id_col].dataType.simpleString()
    return f"id_a {id_type}, id_b {id_type}, cos_sim double"


def _usable_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Rows with a non-null id and a non-null, all-finite embedding.

    A NaN ELEMENT (failed encode, fp overflow upstream) makes every cosine
    against the vector NaN — which Spark orders above all doubles and
    treats as >= threshold, so one NaN vector ranked #1 for EVERY query and
    emitted false LSH pairs, while the exact numpy kernel silently excluded
    the same pairs (round-5 max review, verified live). A NULL id crashes
    the numpy pair kernel (object-dtype comparisons against None) and
    breaks `id_a < id_b` pair semantics. Both are filtered like null
    vectors: no identity / no finite geometry → no similarity."""
    finite = ~F.exists(
        vec_col, lambda x: F.isnan(x.cast("double")) | (F.abs(x) == float("inf"))
    )
    return df.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull() & finite
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query: ``(q_id, n_id, cos_sim, rank)``.
    Null embeddings are excluded (a null vector has no similarity).

    ``exclude_self=True`` (the default) assumes queries are drawn from the
    corpus and drops neighbors whose id equals the query id. Pass ``False``
    when the query table is a SEPARATE id space — otherwise a corpus row
    whose id coincidentally equals a query id is silently unretrievable.
    """
    c = _usable_vectors(corpus, id_col, vec_col).select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).withColumn("n_norm", F.sqrt(_dot(F.col("n_vec"), F.col("n_vec"))))
    q = _usable_vectors(queries, id_col, vec_col).select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_norm", F.sqrt(_dot(F.col("q_vec"), F.col("q_vec"))))

    cond = F.col("q_id") != F.col("n_id") if exclude_self else F.lit(True)
    pairs = c.join(F.broadcast(q), cond).select(
        "q_id",
        "n_id",
        _cosine(
            _dot(F.col("q_vec"), F.col("n_vec")),
            F.col("q_norm"), F.col("n_norm"), round_to,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 10_000,
    iterations: int = 5,
    seed: int = 42,
    order_col: str | None = None,
    _sample_X: np.ndarray | None = None,
) -> np.ndarray:
    """Driver-side Lloyd k-means over a bounded sample.

    Centroids are the only state that leaves the cluster — n_centroids × dim
    floats — so this scales to any corpus size; the sample bound keeps driver
    memory flat. Pass ``order_col`` for a reproducible sample: rows are taken
    in ``xxhash64(order_col)`` order, which is both deterministic AND spread
    uniformly across the corpus — ordering by the raw column would take an
    ordered *prefix*, and on corpora where the id correlates with embedding
    structure (ids assigned per source/shard) a prefix covers only the head
    cluster and collapses the centroids onto it.
    """
    # `_sample_X` lets ivfpq_index collect the (identical) bounded sample
    # ONCE and feed both the IVF and PQ trainers — the two scan-and-top-K
    # jobs were byte-identical lineages (same usability filter, same
    # (xxhash64(id), id) order, same limit), so sharing changes nothing
    # about the trained centroids while halving the sample passes.
    if _sample_X is not None:
        X = _sample_X
        if len(X) == 0:
            raise ValueError(
                "cannot train centroids on an empty (or all-null-embedding) "
                "corpus"
            )
    else:
        # finite-only sample: one NaN vector would poison every centroid
        # mean it joins (id filter is irrelevant here, so reuse the column
        # itself as the id argument)
        sampled = _usable_vectors(df, vec_col, vec_col)
        if order_col is not None:
            # hash first, raw column second: ties (dup order_col values or
            # a 64-bit collision) stay deterministic
            sampled = sampled.orderBy(F.xxhash64(order_col), order_col)
        sample = sampled.select(vec_col).limit(sample_size).collect()
        if not sample:
            raise ValueError(
                "cannot train centroids on an empty (or all-null-embedding) "
                "corpus"
            )
        X = np.array([r[0] for r in sample], dtype=np.float64)
    rng = np.random.RandomState(seed)
    centroids = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    # the sample never changes — normalize once, not once per Lloyd round
    Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
    for _ in range(iterations):
        # cosine assignment: normalize centroids then argmax dot
        Cn = centroids / (np.linalg.norm(centroids, axis=1, keepdims=True) + 1e-12)
        assign = np.argmax(Xn @ Cn.T, axis=1)
        for c in range(len(centroids)):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    n_probe: int = 1,
    out_col: str = "cell",
) -> DataFrame:
    """Append the ``n_probe`` nearest centroid ids (cosine) as an array column.

    One vectorized pandas pass; the centroid matrix rides the closure as a
    broadcast-sized constant.
    """
    # capture the numpy array directly: a .tolist() round-trip inflates the
    # closure pickle ~5-10x (per-element Python floats) vs numpy's raw
    # buffer and re-pays np.array() per task
    cn = centroids / (np.linalg.norm(centroids, axis=1, keepdims=True) + 1e-12)
    n_probe = min(n_probe, len(cn))
    dim = cn.shape[1]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest_cells(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        zero = [0.0] * dim
        for series in batches:
            # null embeddings keep their row (this op appends a column):
            # a zero vector scores 0 everywhere and gets an arbitrary cell
            X = np.array(
                [v if v is not None else zero for v in series.tolist()],
                dtype=np.float64,
            )
            Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
            sims = Xn @ cn.T
            top = np.argsort(-sims, axis=1)[:, :n_probe]
            yield pd.Series(top.tolist())

    return df.withColumn(out_col, nearest_cells(F.col(vec_col)))


def cosine_pairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_broadcast_rows: int = 1_000_000,
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs: ``(id_a, id_b, cos_sim)`` with
    cosine ≥ threshold, ``id_a < id_b``.

    Execution: the (normalized) corpus matrix is broadcast to executors and
    each partition computes its rows' similarities against it with one
    vectorized matmul — Spark's higher-order array functions are interpreted
    per element, ~20× slower than Arrow+BLAS for this kernel. The broadcast
    bound keeps this the *verify/bounded-corpus* variant; unbounded corpora
    go through ``cosine_pairs_lsh`` (candidates) → this (verification on the
    candidate set).
    """
    source = _usable_vectors(df, id_col, vec_col).select(id_col, vec_col)
    # ONE bounded job: probing limit(max+1) both enforces the cap and
    # collects the matrix (round-4 review: a separate count() paid a full
    # extra pass over the lineage — and an over-limit input paid it before
    # erroring)
    rows = source.limit(max_broadcast_rows + 1).collect()
    if len(rows) > max_broadcast_rows:
        raise ValueError(
            f"exact all-pairs cosine on >{max_broadcast_rows} rows exceeds "
            f"max_broadcast_rows={max_broadcast_rows}; use cosine_pairs_lsh "
            "for candidate generation at this scale"
        )
    if not rows:
        return df.sparkSession.createDataFrame([], _pair_schema(df, id_col))
    b_ids = np.array([r[0] for r in rows])
    M = np.array([r[1] for r in rows], dtype=np.float64)
    B = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)
    # B/b_ids captured as numpy (compact buffer pickle), not .tolist()

    out_schema = _pair_schema(df, id_col)

    # Corpus-side SLAB width for the per-batch matmul. Without slabbing the
    # transient sims matrix is (arrow_batch × corpus): a 10k-row batch
    # against a 1M-row corpus is 80 GB — executors OOM'd far below
    # max_broadcast_rows' own cap (round-5 max review). 20k columns bound
    # the transient to ~1.6 GB per task at the default Arrow batch size
    # while keeping the matmul BLAS-efficient.
    slab = 20_000

    def pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
            x_ids = pdf[id_col].to_numpy()
            out_a, out_b, out_s = [], [], []
            for start in range(0, len(b_ids), slab):
                sims = np.round(Xn @ B[start : start + slab].T, round_to)
                ids_s = b_ids[start : start + slab]
                for i, xa in enumerate(x_ids):
                    mask = (sims[i] >= threshold) & (ids_s > xa)
                    out_a.extend([xa] * int(mask.sum()))
                    out_b.extend(ids_s[mask])
                    out_s.extend(sims[i][mask])
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos_sim": out_s})

    return source.mapInPandas(pairs, out_schema)


def cosine_lsh_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """The sign-LSH bucket index of an embedding corpus: ``(id, table_id,
    bucket)`` rows — the cosine analog of :func:`minhash_lsh_index`.

    Planes derive deterministically from ``(seed, n_tables, n_planes,
    dim)``, so an index built here and a later batch bucketed with the
    SAME recipe (and the same vector dimensionality) land in directly
    comparable buckets — what makes the index a persistable artifact for
    :func:`cosine_pairs_lsh_incremental`. ``max_bucket_size`` caps each
    (table, bucket) to its lowest-id members at BUILD time; ``None``
    keeps the exact uncapped index.
    """
    from syncmaven_spark.operators.dedup import (
        _with_recipe_meta,
        check_bucket_cap,
    )

    max_bucket_size = check_bucket_cap(max_bucket_size)
    nonnull = _usable_vectors(df, id_col, vec_col)
    first = nonnull.select(vec_col).first()
    id_type = df.schema[id_col].dataType.simpleString()
    if first is None:  # empty corpus → empty index
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, table_id int, bucket long"
        )
    buckets = _plane_bucket_udf(len(first[0]), n_planes, n_tables, seed)
    wb = nonnull.select(
        F.col(id_col), buckets(F.col(vec_col)).alias("_buckets")
    )
    # recipe stamp (incl. dim — planes derive from it too) survives parquet;
    # probes assert it via dedup.check_index_recipe
    return _with_recipe_meta(
        _melt_buckets(wb, id_col, max_bucket_size),
        "bucket",
        {"n_planes": n_planes, "n_tables": n_tables, "seed": seed,
         "dim": len(first[0])},
    )


def _plane_bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """The sign-LSH hashing UDF: vectors → one bucket id per table. Planes
    derive deterministically from (seed, n_tables, n_planes, dim) — shared
    by the index builder and the full pass so both bucket identically."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables * n_planes, dim))
    weights = np.array([1 << i for i in range(n_planes)], dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in batches:
            X = np.array(series.tolist(), dtype=np.float64)
            bits = (X @ planes.T) > 0  # (n, T*k)
            # one batched matmul instead of a per-row Python loop over
            # n_tables tiny dot products (round-11, guide §4.2): the
            # bool→int64 cast + integer matmul yields the exact same
            # bucket ints as int(t @ weights) did row by row
            codes = bits.reshape(len(X), n_tables, n_planes).astype(
                np.int64
            ) @ weights  # (n, T)
            yield pd.Series(codes.tolist())

    return buckets


def _melt_buckets(
    with_buckets: DataFrame, id_col: str, max_bucket_size: int | None
) -> DataFrame:
    """Explode a ``_buckets`` array column to (id, table_id, bucket) rows
    with the build-time per-bucket cap (already validated by the caller)."""
    melted = with_buckets.select(
        id_col, F.posexplode("_buckets").alias("table_id", "bucket")
    )
    if max_bucket_size is not None:
        w_bucket = W.partitionBy("table_id", "bucket").orderBy(id_col)
        melted = (
            melted.withColumn("_bn", F.row_number().over(w_bucket))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    return melted


def _verify_cosine_pairs(
    candidate_ids: DataFrame,
    vecs: DataFrame,
    id_col: str,
    threshold: float,
    round_to: int,
) -> DataFrame:
    """Exact-cosine verification shared by the full-pass and incremental
    sign-LSH operators (one place to change, mirroring
    queries._simhash_token_verify): join each side's (vec, norm) onto the
    deduped candidate id pairs, score, threshold."""
    candidates = (
        candidate_ids.join(
            vecs.select(
                F.col(id_col).alias("id_a"),
                F.col("vec").alias("vec_a"), F.col("norm").alias("norm_a"),
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col(id_col).alias("id_b"),
                F.col("vec").alias("vec_b"), F.col("norm").alias("norm_b"),
            ),
            "id_b",
        )
    )
    return (
        candidates.withColumn(
            "cos_sim",
            _cosine(
                _dot(F.col("vec_a"), F.col("vec_b")),
                F.col("norm_a"), F.col("norm_b"), round_to,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def normalized_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """``(id, vec, norm)`` with ``vec`` cast to double and ``norm`` its L2
    length — the PERSISTABLE verification artifact of the cosine recipe
    (what :func:`_verify_cosine_pairs` consumes). A continuously-ingested
    corpus stores this alongside :func:`cosine_lsh_index`, partitioned by
    an id hash, so per-batch exact-cosine verification is a pruned fetch of
    candidate-touched rows instead of a full corpus re-scan."""
    usable = _usable_vectors(df, id_col, vec_col)
    return usable.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
    ).withColumn("norm", F.sqrt(_dot(F.col("vec"), F.col("vec"))))


def verify_cosine_candidates(
    candidate_ids: DataFrame,
    vecs: DataFrame,
    id_col: str,
    threshold: float,
    round_to: int = 4,
) -> DataFrame:
    """Public exact-cosine verification of ``(id_a, id_b)`` candidates
    against a :func:`normalized_vectors` table covering every touched id —
    shared by the batch pipelines and the streaming composition."""
    return _verify_cosine_pairs(candidate_ids, vecs, id_col, threshold, round_to)


def rerank_exact_topk(
    shortlist: DataFrame,
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_broadcast_rows: int = 1_000_000,
) -> DataFrame:
    """Exact-cosine re-rank of an ANN shortlist: ``(q_id, n_id, cos_sim,
    rank)`` — stage 2 of the standard two-stage recipe (probe a compressed
    index with ``k' ≫ k`` — :func:`~syncmaven_spark.operators.pq.pq_probe`,
    :func:`ivf_probe`, or the sign-LSH candidates — then score ONLY the
    shortlisted pairs exactly and keep the true top-k). This is how a
    lossy shortlist's recall gap closes without ever brute-forcing the
    corpus: the exact scoring touches ``k' × |queries|`` vectors, not
    ``|corpus|``.

    ``shortlist`` needs only ``(q_id, n_id)``; extra columns (an
    ``approx_sim``) are ignored. The corpus-vector fetch semi-joins on the
    broadcast shortlist, so on an id-bucketed :func:`normalized_vectors`
    store only candidate-touched rows are read — the same pruned-fetch
    contract as the dedup verifiers. Ties rank by ascending ``n_id``.

    Both the shortlist pairs and the normalized QUERY vectors broadcast to
    every executor, so both are bounded by ``max_broadcast_rows`` (the
    same limit(n+1)-probe contract as ``cosine_pairs_exact`` — round-8
    advice: an uncapped caller hit a broadcast OOM with no actionable
    error). The probes are bounded jobs; the shortlist probe rides the
    pooled persist that the scoring join reuses, so the shortlist lineage
    (usually an ANN probe) still executes once. The CORPUS side is never
    broadcast and stays unbounded.
    """
    from syncmaven_spark.operators.cache import persist_scoped

    pairs = persist_scoped(shortlist.select("q_id", "n_id"))
    n_pairs = pairs.limit(max_broadcast_rows + 1).count()
    if n_pairs > max_broadcast_rows:
        raise ValueError(
            f"rerank_exact_topk broadcasts the shortlist to every "
            f"executor; got more than max_broadcast_rows="
            f"{max_broadcast_rows} (q_id, n_id) pairs. Re-rank in query "
            "chunks or raise the bound explicitly."
        )
    n_queries = queries.limit(max_broadcast_rows + 1).count()
    if n_queries > max_broadcast_rows:
        raise ValueError(
            f"rerank_exact_topk broadcasts the normalized query-vector "
            f"table to every executor; got more than max_broadcast_rows="
            f"{max_broadcast_rows} query rows. Re-rank in query chunks "
            "or raise the bound explicitly."
        )
    qv = normalized_vectors(queries, id_col, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    nv = normalized_vectors(vectors, id_col, vec_col).select(
        F.col(id_col).alias("n_id"),
        F.col("vec").alias("n_vec"),
        F.col("norm").alias("n_norm"),
    )
    scored = (
        nv.join(F.broadcast(pairs), "n_id")
        .join(F.broadcast(qv), "q_id")
        .select(
            "q_id",
            "n_id",
            _cosine(
                _dot(F.col("q_vec"), F.col("n_vec")),
                F.col("q_norm"), F.col("n_norm"), round_to,
            ).alias("cos_sim"),
        )
        .dropDuplicates(["q_id", "n_id"])
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_lsh_candidates_incremental(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
    assert_new_ids: bool = False,
    new_index: DataFrame | None = None,
) -> DataFrame:
    """Candidate ``(id_a, id_b)`` pairs introduced by a NEW embedding batch
    against an existing :func:`cosine_lsh_index` — the candidate stage of
    :func:`cosine_pairs_lsh_incremental`, exposed so callers holding a
    persisted vector table can prune the verification fetch themselves.

    A stamped index built with a different (n_planes, n_tables, seed, dim)
    recipe fails fast; ``assert_new_ids=True`` eagerly enforces the
    disjoint-ids contract (one batch-sized semi-join). ``new_index``
    optionally supplies the batch's own bucket rows (same-recipe stamp
    asserted), skipping the internal rebuild.
    """
    from syncmaven_spark.operators.cache import persist_scoped
    from syncmaven_spark.operators.dedup import (
        _check_new_ids_disjoint,
        check_index_recipe,
        stamped_recipe,
    )

    if assert_new_ids:
        _check_new_ids_disjoint(
            new_df, index, id_col, "cosine_lsh_candidates_incremental"
        )
    if new_index is None:
        # `dim` (planes derive from it) comes from scanning the batch —
        # the same scan cosine_lsh_index needs anyway to build the rows
        first = _usable_vectors(new_df, id_col, vec_col).select(vec_col).first()
        if first is not None:
            check_index_recipe(
                index, "bucket",
                {"n_planes": n_planes, "n_tables": n_tables, "seed": seed,
                 "dim": len(first[0])},
            )
        new_melt = cosine_lsh_index(
            new_df, id_col=id_col, vec_col=vec_col,
            n_planes=n_planes, n_tables=n_tables, seed=seed,
            max_bucket_size=max_bucket_size,
        )
    else:
        # the caller already built the batch's bucket rows: read `dim`
        # from the stamps instead of eagerly scanning new_df — that
        # `first()` ran one Spark job per call purely to derive dim, and
        # in the streaming driver it re-executed the micro-batch source
        # once per epoch (round-7 advice, the double-execution class)
        dim = next(
            (
                int(stamp["dim"])
                for stamp in (
                    stamped_recipe(new_index, "bucket"),
                    stamped_recipe(index, "bucket"),
                )
                if stamp is not None and "dim" in stamp
            ),
            None,
        )
        if dim is not None:
            recipe = {"n_planes": n_planes, "n_tables": n_tables,
                      "seed": seed, "dim": dim}
            check_index_recipe(index, "bucket", recipe)
            check_index_recipe(new_index, "bucket", recipe)
        # neither side stamped → hand-built indexes, contract is the
        # caller's (same acceptance as check_index_recipe's no-stamp path)
        new_melt = new_index.select(id_col, "table_id", "bucket")
    new_melt = persist_scoped(new_melt)
    key = ["table_id", "bucket"]
    cross = (
        new_melt.select(*key, F.col(id_col).alias("_id_n"))
        .join(index.select(*key, F.col(id_col).alias("_id_o")), key)
        .filter(F.col("_id_n") != F.col("_id_o"))
        .select(
            F.least("_id_n", "_id_o").alias("id_a"),
            F.greatest("_id_n", "_id_o").alias("id_b"),
        )
    )
    within = (
        new_melt.select(*key, F.col(id_col).alias("id_a"))
        .join(new_melt.select(*key, F.col(id_col).alias("id_b")), key)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return persist_scoped(
        cross.unionByName(within).dropDuplicates(["id_a", "id_b"])
    )


def cosine_pairs_lsh_incremental(
    new_df: DataFrame,
    index: DataFrame,
    corpus_df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    round_to: int = 4,
    max_bucket_size: int | None = 1000,
    assert_new_ids: bool = False,
) -> DataFrame:
    """Cosine near-dup pairs introduced by a NEW embedding batch against an
    existing :func:`cosine_lsh_index` built with the SAME recipe (seed,
    n_planes, n_tables — and the same vector dimensionality; a stamped
    index fails fast on a mismatch) — the continuous-ingestion path,
    mirroring the MinHash/SimHash incrementals.

    Only the batch is hashed; candidates come from one bucket-key probe of
    the index plus the batch self-join, and exact-cosine verification reads
    only candidate-touched vectors from ``corpus_df`` (old ∪ new; semi-join
    pruned). With disjoint ids and no caps the output equals the full-pass
    :func:`cosine_pairs_lsh` restricted to pairs touching the batch
    (property-tested). New ids must be disjoint from indexed ids
    (``assert_new_ids=True`` enforces it eagerly).
    """
    from syncmaven_spark.operators.dedup import touched_ids

    candidate_ids = cosine_lsh_candidates_incremental(
        new_df, index, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, n_tables=n_tables, seed=seed,
        max_bucket_size=max_bucket_size, assert_new_ids=assert_new_ids,
    )
    pruned = corpus_df.join(touched_ids(candidate_ids, id_col), id_col, "left_semi")
    vecs = normalized_vectors(pruned, id_col, vec_col)
    return _verify_cosine_pairs(candidate_ids, vecs, id_col, threshold, round_to)


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 42,
    round_to: int = 4,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-dups via random-hyperplane (sign) LSH.

    ``n_tables`` independent tables of ``n_planes`` sign bits each; vectors
    sharing a (table, bucket) key become candidates (equi-join keyed by
    bucket — the O(n²) cross join never materializes), then candidates are
    verified with the exact cosine. Deterministic: planes derive from the
    seed. Recall < 1 by construction — the probabilistic trade that makes
    100-TB near-dup mining feasible; tune (n_planes, n_tables) to the target
    similarity band.

    ``max_bucket_size`` caps each (table, bucket) like the MinHash/SimHash
    caps: a degenerate corpus (b zero-filled failed-encode vectors share
    every table's bucket) otherwise drives an uncapped O(b²) candidate join
    per table whose pairs verification then discards — pure wasted shuffle.
    ``None`` restores exact uncapped semantics.
    """
    from syncmaven_spark.operators.cache import persist_scoped
    from syncmaven_spark.operators.dedup import check_bucket_cap

    max_bucket_size = check_bucket_cap(max_bucket_size)
    nonnull = _usable_vectors(df, id_col, vec_col)
    first = nonnull.select(vec_col).first()
    if first is None:  # empty corpus → no pairs
        return df.sparkSession.createDataFrame([], _pair_schema(df, id_col))

    # ONE persisted scan carries buckets + vec + norm together (the hashing
    # UDF runs once; the vec/norm projection IS cheap column math computed
    # alongside): it feeds both sides of the candidate join via the melt
    # AND the two verification re-joins — one cache-pool slot, one source
    # read, exactly the pre-index-refactor layout
    buckets = _plane_bucket_udf(len(first[0]), n_planes, n_tables, seed)
    with_buckets = persist_scoped(
        nonnull.select(
            F.col(id_col), _as_double(F.col(vec_col)).alias("vec"),
            buckets(F.col(vec_col)).alias("_buckets"),
        ).withColumn("norm", F.sqrt(_dot(F.col("vec"), F.col("vec"))))
    )
    # the bucket join carries IDS ONLY: melting the vectors through
    # posexplode shuffled ~2 x n_tables copies of every embedding (96x at
    # n_tables=48) through the join and the dedup — the vectors join back
    # exactly once per side AFTER candidate dedup
    melted = _melt_buckets(with_buckets, id_col, max_bucket_size)
    a = melted.select("table_id", "bucket", F.col(id_col).alias("id_a"))
    b = melted.select("table_id", "bucket", F.col(id_col).alias("id_b"))
    candidate_ids = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = with_buckets.select(id_col, "vec", "norm")
    return _verify_cosine_pairs(candidate_ids, vecs, id_col, threshold, round_to)


def _centroid_checksum(centroids: np.ndarray) -> str:
    """Deterministic fingerprint of a centroid matrix (rounded to 6
    decimals so a parquet round-trip through array<double> cannot flip
    it). Stamped on both IVF artifacts so probing assignments with the
    WRONG centroid table — which silently searches the wrong cells —
    fails fast instead."""
    import hashlib

    arr = np.ascontiguousarray(np.round(np.asarray(centroids, float), 6))
    return hashlib.md5(
        arr.tobytes() + str(arr.shape).encode()
    ).hexdigest()[:16]


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 10_000,
    iterations: int = 5,
    seed: int = 42,
    _sample_X: np.ndarray | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The PERSISTABLE IVF-ANN artifacts — ANN's analog of the dedup
    trilogy's index/probe split (a continuous pipeline trains the index
    once offline and probes it per query batch instead of re-training
    k-means and re-assigning the whole corpus on every run).

    Returns ``(assignments, centroids_df)``:

    - ``assignments``: ``(id, cell, vec, norm)`` — one row per corpus
      vector, its nearest-centroid cell plus the normalized-lookup columns
      verification needs. Write it ``partitionBy("cell")`` so probes prune
      to the probed cells' directories (cell count is ``n_centroids``, so
      the partition fan-out is small and fixed).
    - ``centroids_df``: ``(centroid_id, centroid)`` — the tiny k-means
      codebook (``n_centroids × dim`` doubles).

    Both carry a recipe stamp (``dedup.RECIPE_META_KEY``, survives
    parquet) with the centroid checksum: :func:`ivf_probe` recomputes the
    checksum from the codebook it is given and fails fast if the
    assignments were built from different centroids — the mismatch would
    otherwise silently probe the wrong cells with ZERO errors (the same
    failure mode as the LSH recipe stamps).

    Training is the bounded driver-side k-means of :func:`train_centroids`
    (sample ≤ ``sample_size``, centroids are the only state leaving the
    cluster), sampled in ``xxhash64(id)`` order for determinism.
    """
    from syncmaven_spark.operators.dedup import _with_recipe_meta

    spark = corpus.sparkSession
    id_type = corpus.schema[id_col].dataType.simpleString()
    usable = _usable_vectors(corpus, id_col, vec_col)
    # with a caller-collected sample (ivfpq_index), emptiness is already
    # known — the first() probe job is skipped along with the sample scan
    empty = (
        len(_sample_X) == 0
        if _sample_X is not None
        else usable.select(vec_col).first() is None
    )
    if empty:  # empty corpus
        return (
            spark.createDataFrame(
                [],
                f"{id_col} {id_type}, cell int, vec array<double>, "
                "norm double",
            ),
            spark.createDataFrame([], "centroid_id int, centroid array<double>"),
        )
    centroids = train_centroids(
        usable, vec_col, n_centroids,
        sample_size=sample_size, iterations=iterations, seed=seed,
        order_col=id_col, _sample_X=_sample_X,
    )
    recipe = {
        "checksum": _centroid_checksum(centroids),
        "n_centroids": int(centroids.shape[0]),
        "dim": int(centroids.shape[1]),
    }
    # pandas + Arrow + one partition — bounded driver-side artifact
    # (n_centroids rows); see pq_train's codebook note (the list path
    # pays python-side row conversion per task, the Arrow path converts
    # vectorized and every downstream collect/write is one cheap task)
    centroids_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "centroid_id": np.arange(len(centroids), dtype="int32"),
                "centroid": [[float(x) for x in c] for c in centroids],
            }
        ),
        "centroid_id int, centroid array<double>",
    ).coalesce(1)
    return (
        _ivf_assignments(usable, centroids, id_col, vec_col, recipe),
        _with_recipe_meta(centroids_df, "centroid_id", recipe),
    )


def _ivf_assignments(
    usable: DataFrame,
    centroids: np.ndarray,
    id_col: str,
    vec_col: str,
    recipe: dict,
) -> DataFrame:
    """``(id, cell, vec, norm)`` assignment rows under a fixed codebook —
    shared by :func:`ivf_index` (initial build) and :func:`ivf_append`
    (codebook-stable ingestion), so both produce the identical schema and
    stamp.

    The stamp rides ``norm``, NOT ``cell``: ``cell`` is the documented
    partitionBy column, and parquet DROPS field metadata on partition
    columns (verified empirically — a partitionBy('cell') round-trip
    returns {} metadata, silently disabling the checksum fail-fast;
    round-7 review). ``norm`` is a plain data column on every layout.
    """
    from syncmaven_spark.operators.dedup import _with_recipe_meta

    assignments = (
        assign_cells(usable, centroids, vec_col, n_probe=1, out_col="_cells")
        .select(
            F.col(id_col),
            F.col("_cells")[0].alias("cell"),
            _as_double(F.col(vec_col)).alias("vec"),
        )
        .withColumn("norm", F.sqrt(_dot(F.col("vec"), F.col("vec"))))
    )
    return _with_recipe_meta(assignments, "norm", recipe)


def _load_codebook(centroids_df: DataFrame) -> tuple[np.ndarray, dict]:
    """Collect a (tiny) persisted codebook into the centroid matrix plus
    its recomputed recipe — shared by :func:`ivf_probe`, :func:`ivf_append`
    and :func:`ivf_drift`. A stamped codebook whose recomputed checksum no
    longer matches its own stamp (rows dropped/edited after build) fails
    fast here; the recipe is then asserted against whichever assignments
    table the caller pairs it with."""
    from syncmaven_spark.operators.dedup import check_index_recipe

    rows = centroids_df.select("centroid_id", "centroid").collect()
    if not rows:
        raise ValueError(
            "empty centroid table — build the index with "
            "ivf_index over a non-empty corpus first"
        )
    centroids = np.array(
        [r[1] for r in sorted(rows, key=lambda r: r[0])], dtype=np.float64
    )
    recipe = {
        "checksum": _centroid_checksum(centroids),
        "n_centroids": int(centroids.shape[0]),
        "dim": int(centroids.shape[1]),
    }
    check_index_recipe(centroids_df, "centroid_id", recipe)
    return centroids, recipe


def ivf_append(
    new_batch: DataFrame,
    centroids_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    assert_new_ids: bool | None = None,
    _loaded: tuple[np.ndarray, dict] | None = None,
) -> DataFrame:
    """Assignment rows for NEW corpus vectors under an EXISTING codebook —
    IVF's continuous-ingestion path (round-7 verdict #2: the dedup trilogy
    had index+probe, but adding corpus vectors to a persisted IVF index
    meant retraining k-means and re-assigning everything).

    Returns ``(id, cell, vec, norm)`` with the same schema and recipe
    stamp as :func:`ivf_index`'s assignments; append it to the persisted
    store with ``.write.partitionBy("cell").mode("append")`` and
    :func:`ivf_probe` accepts the merged table unchanged. Because a
    vector's cell depends only on (vector, codebook), assignment is
    per-row under a FIXED codebook::

        index(a).assignments ∪ append(b)  ==  assign(a ∪ b)   (same codebook)

    so probes over the appended store equal probes over a from-scratch
    assignment of the union (parquet-roundtrip-tested). New ids MUST be
    disjoint from stored ids (same contract as every incremental path):
    a re-ingested id appears TWICE in the probe's candidate set, and the
    duplicate rows consume top-k slots — recall silently drops with zero
    errors. Pass the stored ``assignments`` to enforce it eagerly (one
    batch-sized semi-join plus a batch-sized duplicate check — ids
    repeated WITHIN the batch are caught too): supplying the table turns
    the check ON (``assert_new_ids`` defaults to ``assignments is not
    None`` — a caller who handed over the table believing they enabled
    the guard IS protected; pass ``assert_new_ids=False`` explicitly to
    carry the table without checking).

    The codebook is validated against its own stamp before use, and the
    returned rows carry that stamp — a later probe pairing the appended
    store with a DIFFERENT codebook still fails fast on the checksum.
    Quality erodes as the corpus drifts from the training distribution —
    monitor :func:`ivf_drift` and retrain when the assigned-cell cosine
    drops.
    """
    if assert_new_ids is None:
        assert_new_ids = assignments is not None
    if assert_new_ids:
        from syncmaven_spark.operators.dedup import _check_new_ids_disjoint

        if assignments is None:
            raise ValueError(
                "ivf_append: assert_new_ids=True needs the stored "
                "assignments table to check the batch's ids against"
            )
        _check_new_ids_disjoint(new_batch, assignments, id_col, "ivf_append")
        # ids repeated WITHIN the batch duplicate assignment rows the
        # same way a re-ingested stored id does (round-8 review pass 2)
        dup = (
            new_batch.groupBy(id_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"ivf_append: the batch contains id {dup[0][0]!r} more "
                "than once — duplicate assignment rows consume top-k "
                "slots and silently evict true neighbors. Deduplicate "
                "the batch before appending."
            )
    # `_loaded` lets a per-batch caller (the streaming ANN driver) skip
    # re-collecting the codebook it already validated — pq_encode's
    # convention
    centroids, recipe = (
        _loaded if _loaded is not None else _load_codebook(centroids_df)
    )
    usable = _usable_vectors(new_batch, id_col, vec_col)
    return _ivf_assignments(usable, centroids, id_col, vec_col, recipe)


def _cells_centroid_df(spark, centroids: np.ndarray) -> DataFrame:
    """``(cell, c_vec, c_norm)`` broadcast side rebuilt from a VALIDATED
    centroid matrix (never a re-read of the table — a caller holding
    ``_loaded`` must score against the exact centroids the cells were
    assigned under; round-9 review pass 3). Shared by :func:`ivf_drift`
    and the streaming driver's single-pass drift record. pandas + Arrow
    + one partition, like every bounded driver-side artifact."""
    return (
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "cell": np.arange(len(centroids), dtype="int32"),
                    "c_vec": [[float(x) for x in c] for c in centroids],
                }
            ),
            "cell int, c_vec array<double>",
        )
        .coalesce(1)
        .withColumn("c_norm", F.sqrt(_dot(F.col("c_vec"), F.col("c_vec"))))
    )


def ivf_drift(
    assignments: DataFrame,
    centroids_df: DataFrame,
    _loaded: tuple[np.ndarray, dict] | None = None,
) -> DataFrame:
    """The retrain signal for a codebook-stable IVF store: one row of
    ``(n_vectors, mean_cell_cos, p10_cell_cos, min_cell_cos)`` where
    ``cell_cos`` is each vector's cosine to its ASSIGNED centroid.

    A codebook trained on the corpus keeps assigned-cell cosine high; as
    appended batches drift from the training distribution the mean (and
    especially the p10 tail) falls — vectors land in cells whose centroid
    barely represents them, which is exactly when probe recall degrades
    (a query's n_probe cells stop covering its true neighbors). Compare
    against the value recorded at build time and retrain (fresh
    :func:`ivf_index`) when it drops materially — e.g. mean down 10%+ or
    p10 below the build-time mean.

    One broadcast join (the codebook is ≤ n_centroids rows) + one
    aggregate; all JVM-side column math, no collect of the corpus.
    """
    from syncmaven_spark.operators.dedup import check_index_recipe

    centroids, recipe = (
        _loaded if _loaded is not None else _load_codebook(centroids_df)
    )
    check_index_recipe(assignments, "norm", recipe)
    # the broadcast side is REBUILT from the validated matrix, not read
    # from centroids_df's rows again: a caller holding _loaded (the
    # streaming driver, once per run) must score against the exact
    # centroids the cells were assigned under — re-reading the table
    # would silently join swapped-on-disk rows to stale cell ids
    # (round-9 review pass 3)
    cents = _cells_centroid_df(assignments.sparkSession, centroids)
    scored = assignments.join(F.broadcast(cents), "cell").select(
        _cosine(
            _dot(F.col("vec"), F.col("c_vec")),
            F.col("norm"), F.col("c_norm"), 6,
        ).alias("cell_cos")
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("cell_cos"), 4).alias("mean_cell_cos"),
        F.round(F.percentile_approx("cell_cos", 0.1), 4).alias("p10_cell_cos"),
        F.round(F.min("cell_cos"), 4).alias("min_cell_cos"),
    )


def ivf_probe(
    queries: DataFrame,
    assignments: DataFrame,
    centroids_df: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k against a persisted :func:`ivf_index`:
    ``(q_id, n_id, cos_sim, rank)``.

    The query batch is assigned its ``n_probe`` nearest cells in one
    vectorized pass; the distinct probed-cell ids (≤ ``n_centroids`` ints)
    are collected and the assignments read is FILTERED to them — on a
    ``partitionBy("cell")`` store that is directory-level pruning, so a
    small query batch reads only the cells it probes, not the whole
    corpus. Candidates then score with one broadcast join keyed by cell
    and rank through the standard top-k window.

    The centroid checksum recomputed from ``centroids_df`` must match the
    stamp on ``assignments`` (built-with-different-centroids probes are
    silently wrong otherwise — they search the wrong cells).
    """
    from syncmaven_spark.operators.dedup import check_index_recipe

    centroids, recipe = _load_codebook(centroids_df)
    check_index_recipe(assignments, "norm", recipe)
    from syncmaven_spark.operators.cache import persist_scoped

    q = _usable_vectors(queries, id_col, vec_col)
    # persisted: the assignment UDF + query scan feed BOTH the
    # distinct-cells collect and the broadcast join — without the persist
    # they execute twice, and a non-deterministic queries lineage
    # (sample/limit) could even assign different cells between the two
    # runs, silently pruning a query's candidates (round-7 review)
    q_assigned = persist_scoped(
        assign_cells(q, centroids, vec_col, n_probe=n_probe, out_col="_cells")
        .select(
            F.col(id_col).alias("q_id"),
            _as_double(F.col(vec_col)).alias("q_vec"),
            F.explode(F.col("_cells")).alias("cell"),
        )
        .withColumn("q_norm", F.sqrt(_dot(F.col("q_vec"), F.col("q_vec"))))
    )
    # ≤ n_centroids ints — the pruning key for a cell-partitioned store
    cells = [r[0] for r in q_assigned.select("cell").distinct().collect()]
    cand = assignments.filter(F.col("cell").isin(cells)).select(
        F.col("cell"),
        F.col(id_col).alias("n_id"),
        F.col("vec").alias("n_vec"),
        F.col("norm").alias("n_norm"),
    )
    pairs = cand.join(F.broadcast(q_assigned), "cell")
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("n_id"))
    scored = pairs.select(
        "q_id",
        "n_id",
        _cosine(
            _dot(F.col("q_vec"), F.col("n_vec")),
            F.col("q_norm"), F.col("n_norm"), round_to,
        ).alias("cos_sim"),
    ).dropDuplicates(["q_id", "n_id"])
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
    round_to: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-partitioned approximate top-k: ``(q_id, n_id, cos_sim, rank)``.

    Corpus vectors live in exactly one cell; queries probe ``n_probe`` cells.
    The candidate join is an equi-join on cell id — shuffle keyed by cell —
    then the same windowed top-k as brute force scores only candidates.

    ``exclude_self`` as in :func:`cosine_topk_bruteforce`: the default drops
    same-id neighbors (queries ⊆ corpus); pass ``False`` for a disjoint
    query id space.
    """
    corpus = _usable_vectors(corpus, id_col, vec_col)
    queries = _usable_vectors(queries, id_col, vec_col)
    if centroids is None:
        if corpus.select(vec_col).first() is None:  # empty corpus → no hits
            return corpus.sparkSession.createDataFrame(
                [], f"q_id {corpus.schema[id_col].dataType.simpleString()}, "
                    f"n_id {corpus.schema[id_col].dataType.simpleString()}, "
                    "cos_sim double, rank int"
            )
        centroids = train_centroids(corpus, vec_col, n_centroids)

    c_assigned = (
        assign_cells(corpus, centroids, vec_col, n_probe=1, out_col="_cells")
        .select(
            F.col(id_col).alias("n_id"),
            _as_double(F.col(vec_col)).alias("n_vec"),
            F.col("_cells")[0].alias("cell"),
        )
        .withColumn("n_norm", F.sqrt(_dot(F.col("n_vec"), F.col("n_vec"))))
    )
    q_assigned = (
        assign_cells(queries, centroids, vec_col, n_probe=n_probe, out_col="_cells")
        .select(
            F.col(id_col).alias("q_id"),
            _as_double(F.col(vec_col)).alias("q_vec"),
            F.explode(F.col("_cells")).alias("cell"),
        )
        .withColumn("q_norm", F.sqrt(_dot(F.col("q_vec"), F.col("q_vec"))))
    )

    pairs = c_assigned.join(F.broadcast(q_assigned), "cell")
    if exclude_self:
        pairs = pairs.filter(F.col("q_id") != F.col("n_id"))
    scored = pairs.select(
        "q_id",
        "n_id",
        _cosine(
            _dot(F.col("q_vec"), F.col("n_vec")),
            F.col("q_norm"), F.col("n_norm"), round_to,
        ).alias("cos_sim"),
    ).dropDuplicates(["q_id", "n_id"])
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
