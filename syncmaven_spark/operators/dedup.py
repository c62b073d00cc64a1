"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the part that matters at 100 TB):
- ``exact_dedup`` is one hash-shuffle with map-side partial aggregation.
- ``minhash_signatures`` computes the whole signature in ONE shuffle: the
  shingle explosion is map-side, and all ``num_perm`` min-hashes are
  aggregated together (``min(xxhash64(shingle, seed_i))`` per permutation) —
  no per-permutation passes, no Python in the loop.
- ``minhash_lsh_candidates`` buckets signatures into bands; only docs sharing
  a (band, band-hash) bucket are pair-joined — the classic LSH trick that
  replaces the O(n²) cross join with a shuffle on band hashes. Skewed buckets
  (boilerplate text) are capped with a per-bucket limit to bound the worst
  pair blow-up; AQE's skew-join handles residual imbalance.
- ``simhash`` folds 64 bit-counters in one aggregation over exploded tokens.
- ``ngram_jaccard_pairs`` is exact verification *within a blocking key* —
  never run it unblocked at scale; feed it LSH candidates or a natural block
  (source, length bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

DEFAULT_NUM_PERM = 64
#: ONE shared default across build (minhash_lsh_index), probe
#: (*_incremental) and the self-contained passes (minhash_lsh_candidates /
#: minhash_verified_pairs): 32 bands × 2 rows/band is the production
#: recipe (miss p ≈ 2e-10 at j=0.8). Round-7 review: aligning only the
#: build/probe pair at 16 silently de-aligned them from the full pass's
#: hardcoded 32 — default incremental runs would have measurably worse
#: candidate recall than the full pass they are documented to equal.
DEFAULT_BANDS = 32

# Persisted intermediates go through the shared count- and byte-bounded
# pool — see operators/cache.py for the policy and rationale.
from syncmaven_spark.operators.cache import persist_scoped as _persist_scoped


#: StructField-metadata key carrying an index's build recipe. Column
#: metadata survives a parquet write/read round-trip (Spark persists it in
#: the file footer's Spark schema), so a persisted index still knows the
#: recipe it was built with and probes can fail fast on a mismatch instead
#: of silently finding zero cross-batch pairs (round-6 advice: the split
#: build/probe API's defaults could drift apart with no error anywhere).
RECIPE_META_KEY = "syncmaven.lsh_recipe"


def _with_recipe_meta(df: DataFrame, col_name: str, recipe: dict) -> DataFrame:
    """Stamp ``recipe`` onto ``col_name``'s field metadata."""
    return df.withColumn(
        col_name,
        F.col(col_name).alias(col_name, metadata={RECIPE_META_KEY: recipe}),
    )


def stamped_recipe(index: DataFrame, col_name: str) -> dict | None:
    """The build recipe stamped on ``col_name``'s field metadata, or
    ``None`` for hand-built / legacy indexes without a stamp."""
    if col_name not in index.columns:
        return None
    return (index.schema[col_name].metadata or {}).get(RECIPE_META_KEY)


def check_index_recipe(index: DataFrame, col_name: str, expected: dict) -> None:
    """Assert a probe's recipe matches the one stamped on the index.

    Indexes built by this package carry their recipe as field metadata on
    the hash/bucket column (see :data:`RECIPE_META_KEY`); hand-built or
    legacy indexes without the stamp are accepted unchecked (the contract
    is then the caller's, as before). Integral numerics compare as ints so
    a JSON round-trip through parquet metadata cannot produce false
    mismatches (int 32 vs float 32.0).
    """
    stored = stamped_recipe(index, col_name)
    if stored is None:
        return

    def _norm(v):
        # integral numerics compare as ints (parquet metadata JSON
        # round-trips can widen them); NON-integral floats (a threshold, a
        # radius) must compare as floats — int() coercion collapsed 0.8 and
        # 0.3 both to 0, silently disabling the fail-fast for any future
        # float-valued recipe key (round-7 advice); strings (e.g. centroid
        # checksums) compare as-is
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return v
        f = float(v)
        return int(f) if f.is_integer() else f

    stored_n = {k: _norm(v) for k, v in stored.items()}
    expected_n = {k: _norm(v) for k, v in expected.items()}
    if stored_n != expected_n:
        raise ValueError(
            f"index recipe mismatch: the index was built with {stored_n} "
            f"but is being probed with {expected_n}. Hashes from different "
            "recipes never match — the probe would silently find no "
            "cross-batch pairs. Probe with the index's own recipe or "
            "rebuild the index."
        )


def check_bucket_cap(max_bucket_size: int | None) -> int | None:
    """Validate a per-bucket candidate cap. ``None`` means uncapped; any
    integer must be >= 1. Guarding here (shared by the MinHash, SimHash and
    sign-LSH operators) closes the truthiness hole where ``0`` silently
    DISABLED the cap — the opposite of the plausible reading (round-5
    advice)."""
    if max_bucket_size is None:
        return None
    cap = int(max_bucket_size)
    if cap < 1:
        raise ValueError(
            f"max_bucket_size must be >= 1 or None to disable the cap; "
            f"got {max_bucket_size!r}"
        )
    return cap


# Unicode word characters. Java's bare \w is ASCII-only, which DELETED every
# CJK/Cyrillic/Greek character during normalization — all such documents
# collapsed to the single shingle [''] and were reported as mutual
# jaccard-1.0 duplicates, so the keep-lowest-id clustering would drop an
# entire non-Latin corpus minus one row (round-5 max review, verified live).
# [^\p{L}\p{N}_\s] is the Unicode complement of \w; the SQL oracles use the
# same class (RE2 and java.util.regex agree on L/N category membership).
_NON_WORD_RE = r"[^\p{L}\p{N}_\s]+"


def _words(text_col):
    """Normalized word array: lower → non-word runs to spaces → split →
    drop empty tokens. NULL text ≡ empty text ≡ ZERO words (one consistent
    rule: NULL previously became the shingle [''] for k>=2 — pairing all
    NULL-text docs as jaccard-1.0 duplicates — while k=1 dropped them)."""
    normalized = F.regexp_replace(
        F.lower(F.coalesce(text_col, F.lit(""))), _NON_WORD_RE, " "
    )
    return F.filter(F.split(F.trim(normalized), r"\s+"), lambda w: w != "")


def _shingles(text_col, k: int):
    """k-word shingles as a distinct array, JVM-side: normalize → split →
    sliding window via transform over index range (k=1 short-circuits to the
    word array — no per-word slice/concat machinery). A doc with zero words
    shingles to an EMPTY array — it is excluded from signatures and pairing
    rather than matching every other empty-ish doc."""
    words = _words(text_col)
    if k == 1:
        return F.array_distinct(words)
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))),
        )
        .when(n > 0, F.array(F.concat_ws(" ", words)))
        .otherwise(words)  # n == 0: the (empty) word array itself
    )


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Repartition upstream of heavy per-doc compute.

    A small/coarse upstream layout (one parquet file → one partition) would
    serialize the expensive regex/hash work; repartitioning by id costs one
    linear shuffle of raw text and unlocks full-cluster parallelism. At real
    scale the input already has many splits and this is a cheap no-op-ish
    round-robin of similar-sized partitions.
    """
    # never COALESCE a finer layout: repartition always produces exactly N
    # partitions, and N = cores on a many-split 100-TB input would pack
    # ~125 GB per partition — take the max of cluster parallelism and the
    # input's own file count. The file count is a DRIVER-METADATA read
    # (inputFiles walks the plan's file indexes); the previous
    # `df.rdd.getNumPartitions()` probe looked free but under AQE
    # materializes every query stage in the plan — on a shuffled input
    # (e.g. the semi-join-pruned corpus in
    # minhash_verified_pairs_incremental) it EXECUTED the whole upstream
    # query and threw the result away, one full extra pass per _spread
    # call (round-12, measured 2.6-2.7 s/call at sf0.1). A keyless
    # repartition(id) was measured too and rejected: AQE's byte-based
    # sizing coalesced the compute-heavy, byte-small text stages to a few
    # tasks (the same effect as the reverted parallelismFirst=false —
    # session.py NOTE), 20-100% slower across the dedup family.
    spark = df.sparkSession
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0  # non-file-backed plans (createDataFrame, streaming)
    parallelism = max(spark.sparkContext.defaultParallelism, n_files)
    return df.repartition(parallelism, id_col)


def _prune_spread(df: DataFrame, touched: DataFrame, id_col: str) -> DataFrame:
    """Semi-join ``df`` down to candidate-touched rows, then :func:`_spread`
    it for the heavy shingle/regex projection that follows.

    The touched side is broadcast EXPLICITLY, and that hint is
    load-bearing, not a size tweak: with a statically planned shuffle
    semi-join, the join's output partitioning is hashpartitioning(id,
    spark.sql.shuffle.partitions), which exactly matches ``_spread``'s
    ``repartition(N, id)`` — so EnsureRequirements optimizes the
    REPARTITION_BY_NUM exchange OUT of the plan. At runtime AQE then
    either converts the semi-join to broadcast (dropping the corpus-side
    exchange entirely — the projection collapses to the SCAN's
    partitioning, one task per input file) or byte-coalesces the
    remaining ENSURE_REQUIREMENTS shuffle read (compute-heavy but
    byte-small text → ~1 task, the same pathology as the reverted
    parallelismFirst=false — session.py NOTE). Measured round-12 at
    sf0.1: an 8-13 s single-task shingle-hash stage inside
    dedup_minhash_incremental's cold run. A static broadcast join keeps
    the probe side at scan partitioning, so ``_spread``'s exchange
    survives planning and AQE never coalesces it (REPARTITION_BY_NUM is
    exempt), and the exchange carries only the PRUNED rows.

    Broadcasting the touched ids is safe by the same argument as
    ``containment_decontamination_pairs``' broadcast_benchmark default:
    every caller's touched set is candidate-derived — bounded by the
    batch's near-dup degree (incremental paths) or by benchmark size ×
    dup degree (decontamination) — ids only, far under the broadcast
    cap wherever the incremental design is usable at all.
    """
    return _spread(df.join(F.broadcast(touched), id_col, "left_semi"), id_col)


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content group. One shuffle.

    The content key hashes a JSON struct of the columns, not a
    concat_ws join: concat_ws SKIPS nulls, so ('x', NULL) and (NULL, 'x')
    hashed identically and one of two DISTINCT rows was dropped as a
    duplicate (and a separator character inside a value could likewise
    forge a collision). JSON field names pin each value to its column and
    escaping kills separator injection.
    """
    key = F.md5(
        F.to_json(F.struct(*[F.col(c).cast("string").alias(c) for c in cols]))
    )
    # One window (one shuffle) instead of agg + equi-join-back: min(id)
    # skips NULLs and an equi-join never matches one, so a content group
    # whose ids were ALL NULL silently vanished from the output (round-5
    # max review, verified live). asc_nulls_last keeps the lowest NON-NULL
    # id when one exists and still keeps one row for all-NULL-id groups.
    w = W.partitionBy("_content_hash")
    ranked = (
        df.withColumn("_content_hash", key)
        .withColumn(
            "_rn",
            F.row_number().over(w.orderBy(F.col(id_col).asc_nulls_last())),
        )
        .withColumn("_n_copies", F.count(F.lit(1)).over(w))
    )
    return (
        ranked.filter(F.col("_rn") == 1)
        .withColumn("is_duplicate_group", F.col("_n_copies") > 1)
        .drop("_content_hash", "_rn", "_n_copies")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: columns ``mh0..mh{num_perm-1}``.

    One explode + one groupBy; each permutation is ``min(xxhash64(shingle,
    seed))`` with a distinct constant seed column — all permutations ride the
    same shuffle.
    """
    exploded = _spread(df, id_col).select(
        F.col(id_col), F.explode(_shingles(F.col(text_col), shingle_k)).alias("shingle")
    )
    # SQL-string aggregates: one py4j round-trip per permutation instead of
    # several Column-API calls — the 64-agg plan otherwise costs ~1 s of
    # driver time per construction. xxhash64(shingle, i) hashes the
    # (shingle, constant) pair, identical to the Column form.
    aggs = [
        F.expr(f"min(xxhash64(shingle, {i})) AS mh{i}") for i in range(num_perm)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_lsh_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 3,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """The banded LSH index of a corpus: ``(id, band_id, band_hash)`` rows.

    This is the PERSISTABLE artifact of the MinHash recipe — write it to
    parquet partitioned/bucketed by ``(band_id, band_hash)`` and a
    continuously-ingested corpus never recomputes old signatures: each new
    batch indexes only itself and equi-joins against the stored table
    (``minhash_lsh_candidates_incremental``). ``max_bucket_size`` caps each
    (band, bucket) to its lowest-id members at BUILD time, so the cap
    composes deterministically across incremental batches sharing one
    index build.
    """
    assert num_perm % bands == 0, "num_perm must be divisible by bands"
    max_bucket_size = check_bucket_cap(max_bucket_size)
    rows_per_band = num_perm // bands
    # persist the O(n) signature table so the shingle explode+agg lineage is
    # computed once, not once per consumer of the melted index
    sig = _persist_scoped(
        minhash_signatures(df, text_col, id_col, num_perm, shingle_k)
    )

    band_cols = [
        F.expr(
            "xxhash64("
            + ", ".join(f"mh{b * rows_per_band + r}" for r in range(rows_per_band))
            + f") AS band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    melted = banded.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct(CAST({b} AS INT) AS band_id, band{b} AS band_hash)"
                    for b in range(bands)
                )
                + ")"
            )
        ).alias("b"),
    ).select(id_col, "b.band_id", "b.band_hash")

    # cap degenerate buckets before any pair join
    if max_bucket_size is not None:
        w_bucket = F.row_number().over(
            W.partitionBy("band_id", "band_hash").orderBy(id_col)
        )
        melted = (
            melted.withColumn("_rn", w_bucket)
            .filter(F.col("_rn") <= max_bucket_size)
            .drop("_rn")
        )
    # the stamped recipe rides parquet metadata so a later probe of the
    # persisted index can assert compatibility (check_index_recipe)
    return _with_recipe_meta(
        melted, "band_hash",
        {"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 3,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Candidate near-duplicate pairs: ``(id_a, id_b, n_shared_bands)``.

    Signature → ``bands`` band-hashes → explode → bucket self-join with
    ``id_a < id_b``. ``max_bucket_size`` caps degenerate buckets (identical
    boilerplate) so one hot bucket cannot produce O(n²) pairs; ``None``
    disables the cap (``_rn <= NULL`` would otherwise silently drop EVERY
    candidate — round-5 review).
    """
    melted = minhash_lsh_index(
        df, text_col, id_col,
        num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        max_bucket_size=max_bucket_size,
    )

    left = melted.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    right = melted.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    pairs = left.join(right, ["band_id", "band_hash"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    return pairs.groupBy("id_a", "id_b").agg(
        F.count("*").alias("n_shared_bands")
    )


def _hashed_shingle_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``(extra_cols…, id, _set)`` with ``_set`` the distinct xxhash64-hashed
    shingle set — the shared input of both exact-Jaccard verification paths
    (blocked n-gram and MinHash-candidate).

    Hashing shingles to longs keeps Jaccard invariant (injective modulo
    ~2^-64 collisions) while long arrays shuffle and intersect far cheaper
    than string arrays. Persisted through the pool: O(n) rows feeding both
    sides of whichever pair join consumes them.
    """
    hashed = F.array_distinct(
        F.transform(
            _shingles(F.col(text_col), shingle_k), lambda w: F.xxhash64(w)
        )
    )
    return _persist_scoped(
        # zero-shingle docs (NULL/empty/punctuation-only text) cannot be
        # near-duplicates of anything — excluding them here keeps them out
        # of both sides of the pair join entirely. The predicate is on the
        # RAW text, not size(_set) > 0: a filter on the derived column gets
        # pushed below every exchange with the WHOLE shingle expression
        # substituted in, so each caller's scan evaluated the full
        # tokenize+shingle+hash pipeline per input row at SCAN partitioning
        # (one task per file — an 8-13 s single-task stage at sf0.1) and
        # then the projection re-evaluated it above the exchange (guide
        # §4.4's duplicated-evaluation pathology, expression-flavored).
        # Equivalence: _words keeps only [\p{L}\p{N}_] material, so
        # "has >=1 token" ⟺ "text contains a letter/digit/underscore",
        # and _shingles yields a non-empty array iff there is >=1 token
        # (any k: n>=k windows, 1<=n<k concat-all, n==0 empty). NULL text
        # fails rlike, matching the old coalesce('')-then-empty behavior.
        df.filter(F.col(text_col).rlike(r"[\p{L}\p{N}_]"))
        .select(
            *[F.col(c) for c in extra_cols], F.col(id_col), hashed.alias("_set")
        )
    )


def _jaccard_verified(pairs: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard scoring over a pair table carrying ``_set_a``/``_set_b``
    → ``(id_a, id_b, jaccard)`` with jaccard ≥ threshold (rounded to 4)."""
    inter = F.size(F.array_intersect("_set_a", "_set_b"))
    union = F.size(F.array_union("_set_a", "_set_b"))
    return (
        pairs.withColumn("jaccard", F.round(inter.cast("double") / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def hashed_shingle_sets(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int = 3
) -> DataFrame:
    """Public builder of the ``(id, _set)`` hashed-shingle-set table — the
    PERSISTABLE verification artifact of the MinHash recipe (``_set`` is the
    distinct xxhash64-hashed shingle array; far smaller than the raw text).

    A continuously-ingested corpus stores this alongside
    :func:`minhash_lsh_index`, partitioned/bucketed by an id hash, so
    per-batch exact-Jaccard verification is a pruned fetch of
    candidate-touched rows instead of a full corpus re-scan + re-shingle
    (the round-6 streaming composition re-read the whole persisted text
    corpus every micro-batch). Built with the SAME ``shingle_k`` as the
    index it accompanies.
    """
    return _hashed_shingle_sets(_spread(df, id_col), text_col, id_col, shingle_k)


def minhash_verify_candidates(
    cands: DataFrame,
    sets: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of a candidate ``(id_a, id_b)`` table
    against a ``(id, _set)`` table from :func:`hashed_shingle_sets` that
    covers every candidate-touched id → ``(id_a, id_b, jaccard ≥ t)``.

    Shared by the batch pipelines and the streaming composition (which
    feeds it a partition-pruned read of the persisted sets table)."""
    a = sets.select(F.col(id_col).alias("id_a"), F.col("_set").alias("_set_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("_set").alias("_set_b"))
    return _jaccard_verified(cands.join(a, "id_a").join(b, "id_b"), threshold)


def touched_ids(cands: DataFrame, id_col: str) -> DataFrame:
    """Distinct ids appearing on either side of a candidate pair table —
    the semi-join pruning key every incremental verification shares."""
    return (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    shingle_k: int = 1,
) -> DataFrame:
    """Exact Jaccard over word/shingle sets for pairs sharing a blocking key.

    ``(id_a, id_b, jaccard)`` with jaccard ≥ threshold. The blocking join is
    the scale lever: pair count is bounded per block, not global.
    """
    with_sets = _hashed_shingle_sets(
        _spread(df, id_col), text_col, id_col, shingle_k,
        extra_cols=tuple(block_cols),
    )
    a = with_sets.select(
        *block_cols, F.col(id_col).alias("id_a"), F.col("_set").alias("_set_a")
    )
    b = with_sets.select(
        *block_cols, F.col(id_col).alias("id_b"), F.col("_set").alias("_set_b")
    )
    n_a, n_b = F.size("_set_a"), F.size("_set_b")
    # size-ratio prune: jaccard >= t implies min(|A|,|B|)/max(|A|,|B|) >= t,
    # so most pairs skip the expensive intersection entirely
    size_ok = F.least(n_a, n_b).cast("double") / F.greatest(n_a, n_b) >= threshold
    return _jaccard_verified(
        a.join(b, block_cols).filter((F.col("id_a") < F.col("id_b")) & size_ok),
        threshold,
    )


def minhash_verified_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 3,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """MinHash→LSH candidates verified with exact Jaccard — the production
    dedup recipe (sub-quadratic candidate generation, exact verification on
    the candidate set only). Output: ``(id_a, id_b, jaccard ≥ threshold)``.

    With (num_perm=64, bands=32, 2 rows/band) a pair at Jaccard j misses
    every band with probability (1-j²)^32 — ≈1e-4 at j=0.6, ≈2e-10 at
    j=0.8 — so at thresholds ≥ 0.6 the verified output is the complete
    ≥-threshold pair set (recall asserted against the unblocked exact pass
    in tests), which is what makes it SQL-oracle-able.

    ``max_bucket_size`` picks between two modes. The DEFAULT is the
    **production** recipe (``max_bucket_size=200``, ``shingle_k=3`` — the
    ``minhash_lsh_candidates`` defaults): a caller who doesn't read
    further gets the 100-TB-safe configuration.

    - **production** (the default): bounds any bucket's pair blow-up to
      ~2×10⁴. With discriminative shingles (``shingle_k>=3``) this loses
      nothing on natural corpora (recall 1.0 vs the exact pair set is
      asserted on testdata in ``tests/test_operators_dedup.py``). On
      boilerplate-heavy input the cap keeps the lowest-id
      ``max_bucket_size`` docs per bucket (deterministic) and drops the
      rest from that bucket, so an n-doc identical cluster yields
      C(cap,2) of its C(n,2) pairs and docs past the cap in every band go
      unpaired. That is the deliberate trade; if full boilerplate
      clustering matters, route an exact-hash dedup (``exact_dedup``)
      first — identical docs collapse there for free and never reach LSH.
    - **oracle-exact** (``max_bucket_size=100_000`` ≈ uncapped; the
      derived-oracle catalog entries pass it EXPLICITLY via
      ``queries.MINHASH_ORACLE_RECIPE``): complete recall, but a
      degenerate bucket of b docs emits O(b²) pairs — 100k boilerplate
      copies would produce ~5×10⁹. Use only when the corpus is known
      boilerplate-light or completeness is required. Word-SET shingles
      (``shingle_k=1``) are far less discriminative — template-generated
      corpora collide into huge buckets even when every text is distinct
      (the driver testdata measures recall ≈0.53 under the cap at k=1) —
      so k=1 runs belong in this mode too.
    """
    cands = minhash_lsh_candidates(
        df, text_col, id_col,
        num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        max_bucket_size=max_bucket_size,
    ).select("id_a", "id_b")
    # _spread like ngram_jaccard_pairs: the regex+shingle+hash projection is
    # the expensive per-doc work, and a coarse input layout (one parquet
    # file → one partition) would otherwise serialize it on one task
    sets = _hashed_shingle_sets(_spread(df, id_col), text_col, id_col, shingle_k)
    a = sets.select(F.col(id_col).alias("id_a"), F.col("_set").alias("_set_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("_set").alias("_set_b"))
    # the verified pair table is itself persisted through the pool: it is
    # O(near-dup pairs) — far smaller than the corpus — and downstream
    # consumers (connected-components clustering, canonical assignment)
    # issue the identical sub-plan, so CacheManager plan-matching lets a
    # pipeline reuse the pairs the candidates query already verified
    # instead of re-running the band join + verification.
    return _persist_scoped(
        _jaccard_verified(cands.join(a, "id_a").join(b, "id_b"), threshold)
    )


def _check_new_ids_disjoint(
    new_df: DataFrame, index: DataFrame, id_col: str, what: str
) -> None:
    """Eagerly verify the incremental contract that a new batch's ids are
    disjoint from the ids already in the index (opt-in via
    ``assert_new_ids``; round-6 verdict). A violation is otherwise SILENT:
    the re-ingested id's old and new hash rows pair as (x, x) and are
    dropped by the self-pair filter, so the old-vs-new near-dup pair is
    simply never emitted. Cost: one batch-sized semi-join probed with
    ``limit(1)`` — it never materializes more than one collision."""
    # left_semi already emits each probe-side row at most once, so no
    # distinct on the corpus-sized index side — a .distinct() there would
    # force a full O(corpus) exchange+aggregate before the join (round-7
    # review), defeating the 'batch-sized' cost claim
    hit = (
        new_df.select(id_col)
        .join(index.select(id_col), id_col, "left_semi")
        .limit(1)
        .collect()
    )
    if hit:
        raise ValueError(
            f"{what}: new batch re-ingests id {hit[0][0]!r} which is "
            "already in the index. The incremental probe requires disjoint "
            "ids — a re-ingested id silently loses its old-vs-new pair. "
            "Deduplicate the batch against the indexed ids (anti-join) or "
            "rebuild the index without the stale rows."
        )


def minhash_lsh_candidates_incremental(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 3,
    max_bucket_size: int | None = 200,
    assert_new_ids: bool = False,
    new_index: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs introduced by a NEW document batch against an
    existing LSH ``index`` (from ``minhash_lsh_index`` with the SAME
    num_perm/bands/shingle_k) — the continuous-ingestion recipe.

    ``new_index`` optionally supplies the batch's own band rows when the
    caller has already built them (e.g. to collect the batch's hash-bucket
    values for a partition-pruned read of the stored index); it must come
    from :func:`minhash_lsh_index` with the same recipe (the stamp is
    asserted) and skips the internal rebuild.

    Only the new batch is signed and banded; candidates are the union of
    new-vs-indexed (one equi-join on the band key — with the index stored
    bucketed by ``(band_id, band_hash)`` this is an exchange-free probe of
    the big side) and new-vs-new (self-join of the small batch). Pairs are
    emitted id-ordered (``id_a < id_b``) exactly like the full-corpus pass,
    so with disjoint ids and no caps::

        candidates(old ∪ new) == candidates(old) ∪ incremental(new, index(old))

    (asserted in tests). New ids MUST be disjoint from indexed ids —
    re-ingesting an id pairs its old and new band rows as (x, x) and is
    silently dropped by the self-pair filter, not re-verified.

    ``max_bucket_size`` caps the new batch's buckets at sign time (the
    index carries its own build-time cap). A bucket that was already full
    in the index still accepts probes from new docs — the cap bounds each
    side's contribution, not the union, so repeated small batches cannot
    starve later batches out of candidacy entirely.

    An index built by :func:`minhash_lsh_index` carries its recipe as
    column metadata (surviving parquet); a probe with different
    num_perm/bands/shingle_k fails fast here instead of silently finding
    zero cross-batch pairs. ``assert_new_ids=True`` additionally verifies
    the disjoint-ids contract eagerly (one batch-sized semi-join;
    default-off to keep the hot path job-free).
    """
    recipe = {"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k}
    check_index_recipe(index, "band_hash", recipe)
    if assert_new_ids:
        _check_new_ids_disjoint(
            new_df, index, id_col, "minhash_lsh_candidates_incremental"
        )
    if new_index is None:
        new_melted = minhash_lsh_index(
            new_df, text_col, id_col,
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            max_bucket_size=max_bucket_size,
        )
    else:
        check_index_recipe(new_index, "band_hash", recipe)
        new_melted = new_index.select(id_col, "band_id", "band_hash")
    # the batch's band rows feed two joins — persist the O(batch) table
    new_melted = _persist_scoped(new_melted)

    key = ["band_id", "band_hash"]
    new_a = new_melted.select(*key, F.col(id_col).alias("_id_n"))
    old_b = index.select(*key, F.col(id_col).alias("_id_o"))
    # new-vs-indexed: normalize to id order so the output convention
    # matches the full pass regardless of which side is smaller
    cross = (
        new_a.join(old_b, key)
        .filter(F.col("_id_n") != F.col("_id_o"))
        .select(
            F.least("_id_n", "_id_o").alias("id_a"),
            F.greatest("_id_n", "_id_o").alias("id_b"),
        )
    )
    within = (
        new_melted.select(*key, F.col(id_col).alias("id_a"))
        .join(new_melted.select(*key, F.col(id_col).alias("id_b")), key)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return (
        cross.unionByName(within)
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def minhash_verified_pairs_incremental(
    new_df: DataFrame,
    index: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 3,
    max_bucket_size: int | None = 200,
    assert_new_ids: bool = False,
) -> DataFrame:
    """Verified near-dup pairs introduced by a new batch: incremental LSH
    candidates exact-Jaccard-verified to ``(id_a, id_b, jaccard)``.

    ``corpus_df`` must cover every id a candidate can touch (old ∪ new
    texts). Verification only reads the texts of candidate ids — the
    semi-join below prunes the corpus scan to the candidate-sparse subset
    before the expensive shingle/hash projection, so the cost scales with
    the batch's near-dup degree, not the corpus size. (When the corpus's
    hashed shingle sets are already persisted — the streaming composition —
    verify from them directly with :func:`minhash_verify_candidates`
    instead of re-shingling from text.)

    Defaults mirror :func:`minhash_lsh_index` exactly (round-6 advice: the
    split build/probe API previously defaulted to DIFFERENT band counts, so
    default-built indexes probed with default probes silently never
    matched); a recipe mismatch against a stamped index now also fails fast
    in the candidate stage.
    """
    cands = _persist_scoped(
        minhash_lsh_candidates_incremental(
            new_df, index, text_col, id_col,
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            max_bucket_size=max_bucket_size, assert_new_ids=assert_new_ids,
        ).select("id_a", "id_b")
    )
    pruned = _prune_spread(corpus_df, touched_ids(cands, id_col), id_col)
    sets = _hashed_shingle_sets(pruned, text_col, id_col, shingle_k)
    return minhash_verify_candidates(cands, sets, id_col, threshold)


def fuzzy_decontamination_pairs(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate TRAIN×BENCHMARK matches — fuzzy decontamination,
    the companion of the exact n-gram overlap pass (``text_decontamination``
    in the catalog): a training document that is a near-copy of an eval
    document leaks the benchmark even when no 8-gram matches verbatim
    (whitespace/punctuation edits, shuffled sentences).

    Output: ``(train_id, bench_id, jaccard ≥ threshold)`` — strictly CROSS
    pairs (train-train and bench-bench pairs are never emitted, unlike the
    self-join dedup passes), so the two id spaces may overlap freely; drop
    ``train.join(pairs, train_id, "left_anti")`` to decontaminate.

    Scale shape — both sides band with the shared MinHash recipe and meet
    in ONE equi-join on (band_id, band_hash); exact-Jaccard verification
    reads only candidate-touched docs per side (semi-join pruned). The
    benchmark side is typically tiny (an eval suite), so at 100 TB this
    behaves like the incremental probe: index the benchmark once, stream
    train batches through. Recall follows the banding bound documented on
    :func:`minhash_verified_pairs` (≈2e-10 miss at j=0.8 with the default
    64/32 recipe), which is what makes the all-pairs SQL oracle valid.

    ``max_bucket_size`` defaults to ``None`` (uncapped) here, UNLIKE the
    self-dedup passes: decontamination's common failure shape is MANY
    train near-copies of one benchmark doc, which all share every band
    bucket — a build-time cap would silently exempt the copies past the
    cap from detection, defeating the function's purpose (round-7
    review; in self-dedup the cap only trades pairs WITHIN an
    already-detected boilerplate cluster). The quadratic risk the cap
    guards against is bounded anyway: one side is the (small) benchmark.
    Set a cap only if the benchmark itself is boilerplate-heavy AND
    partial detection is acceptable.
    """
    lm = _persist_scoped(
        minhash_lsh_index(
            train, text_col, id_col,
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            max_bucket_size=max_bucket_size,
        )
    )
    rm = _persist_scoped(
        minhash_lsh_index(
            benchmark, text_col, id_col,
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            max_bucket_size=max_bucket_size,
        )
    )
    key = ["band_id", "band_hash"]
    cands = _persist_scoped(
        lm.select(*key, F.col(id_col).alias("train_id"))
        .join(rm.select(*key, F.col(id_col).alias("bench_id")), key)
        .select("train_id", "bench_id")
        .dropDuplicates(["train_id", "bench_id"])
    )
    t_touched = cands.select(F.col("train_id").alias(id_col)).distinct()
    b_touched = cands.select(F.col("bench_id").alias(id_col)).distinct()
    t_sets = _hashed_shingle_sets(
        _prune_spread(train, t_touched, id_col),
        text_col, id_col, shingle_k,
    )
    b_sets = _hashed_shingle_sets(
        _prune_spread(benchmark, b_touched, id_col),
        text_col, id_col, shingle_k,
    )
    return _cross_jaccard_scored(cands, t_sets, b_sets, id_col, threshold)


def _cross_jaccard_scored(
    cands: DataFrame,
    t_sets: DataFrame,
    b_sets: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard scoring of a strictly-cross ``(train_id, bench_id)``
    candidate table against each side's hashed-shingle-set table — shared
    by the one-shot and incremental decontamination passes. Unlike
    :func:`_jaccard_verified`, the two sides keep their roles (no
    least/greatest id normalization — that is exactly what loses the
    train-vs-bench distinction when id spaces overlap)."""
    scored = (
        cands.join(
            t_sets.select(
                F.col(id_col).alias("train_id"), F.col("_set").alias("_set_a")
            ),
            "train_id",
        )
        .join(
            b_sets.select(
                F.col(id_col).alias("bench_id"), F.col("_set").alias("_set_b")
            ),
            "bench_id",
        )
    )
    inter = F.size(F.array_intersect("_set_a", "_set_b"))
    union = F.size(F.array_union("_set_a", "_set_b"))
    return (
        scored.withColumn("jaccard", F.round(inter.cast("double") / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("train_id", "bench_id", "jaccard")
    )


def decontamination_index(
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """The PERSISTABLE benchmark-side artifacts of fuzzy decontamination:
    ``(bench_index, bench_sets)`` — what lets a 100-TB pipeline index the
    (small, static) benchmark ONCE and stream train batches through
    :func:`fuzzy_decontamination_pairs_incremental`, instead of
    re-signing the full train side per call like the one-shot
    :func:`fuzzy_decontamination_pairs` (round-7 verdict #1: the one-shot
    docstring promised this composition but no API delivered it, and the
    dedup incrementals can't substitute — their least/greatest pair
    normalization loses the train-vs-bench side under overlapping ids).

    - ``bench_index``: the banded ``(id, band_id, band_hash)`` rows
      (:func:`minhash_lsh_index`), UNCAPPED by design — the common
      contamination shape is many train near-copies of one benchmark doc
      sharing every bucket, and a cap would exempt the copies past it
      (same rationale as the one-shot's ``max_bucket_size=None``).
    - ``bench_sets``: the hashed-shingle-set verification table
      (:func:`hashed_shingle_sets`), so per-batch exact-Jaccard
      verification never re-shingles benchmark text.

    Both carry the full recipe stamp (survives parquet); probes fail fast
    on a mismatch. Write the index bucketed/partitioned by a band-hash
    modulus and the sets by an id hash for pruned probe reads (the
    streaming driver does exactly that).
    """
    recipe = {"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k}
    idx = minhash_lsh_index(
        benchmark, text_col, id_col,
        num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        max_bucket_size=None,
    )
    sets = _with_recipe_meta(
        hashed_shingle_sets(benchmark, text_col, id_col, shingle_k),
        "_set", recipe,
    )
    return idx, sets


def fuzzy_decontamination_pairs_incremental(
    train_batch: DataFrame,
    bench_index: DataFrame,
    bench_sets: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 3,
    max_bucket_size: int | None = None,
    train_index: DataFrame | None = None,
) -> DataFrame:
    """Decontamination matches introduced by ONE train batch against a
    persisted benchmark index (:func:`decontamination_index`, SAME
    recipe): ``(train_id, bench_id, jaccard ≥ threshold)`` — strictly
    CROSS pairs, never within-batch pairs, and the id spaces may overlap
    freely (a train doc sharing a benchmark doc's id still reports the
    contamination — the dedup incrementals would silently drop it as a
    self-pair).

    Batches are INDEPENDENT: each train doc meets the benchmark exactly
    once and train docs never pair with each other, so the union over any
    batch split equals the one-shot pass with no disjoint-ids contract
    between batches (property-tested)::

        fuzzy_decontamination_pairs(b1 ∪ … ∪ bn, bench)
            == ∪ᵢ fuzzy_decontamination_pairs_incremental(bᵢ, index, sets)

    Only the batch is signed (``train_index`` optionally supplies its
    band rows when the caller already built them — stamp asserted);
    candidates come from ONE (band_id, band_hash) equi-join against the
    stored index, and verification reads batch-side sets from a semi-join
    pruned re-shingle plus benchmark-side sets from the persisted table
    (pruned the same way — benchmark text is never re-shingled).

    ``max_bucket_size`` caps only the BATCH side's buckets (default
    ``None``/uncapped, matching the one-shot: a cap exempts mass
    contamination); the persisted benchmark index carries its own
    build-time semantics (uncapped from :func:`decontamination_index`).
    """
    recipe = {"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k}
    check_index_recipe(bench_index, "band_hash", recipe)
    check_index_recipe(bench_sets, "_set", recipe)
    if train_index is None:
        train_melted = minhash_lsh_index(
            train_batch, text_col, id_col,
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            max_bucket_size=max_bucket_size,
        )
    else:
        check_index_recipe(train_index, "band_hash", recipe)
        train_melted = train_index.select(id_col, "band_id", "band_hash")
    train_melted = _persist_scoped(train_melted)

    key = ["band_id", "band_hash"]
    cands = _persist_scoped(
        train_melted.select(*key, F.col(id_col).alias("train_id"))
        .join(bench_index.select(*key, F.col(id_col).alias("bench_id")), key)
        .select("train_id", "bench_id")
        .dropDuplicates(["train_id", "bench_id"])
    )
    t_touched = cands.select(F.col("train_id").alias(id_col)).distinct()
    b_touched = cands.select(F.col("bench_id").alias(id_col)).distinct()
    t_sets = _hashed_shingle_sets(
        _prune_spread(train_batch, t_touched, id_col),
        text_col, id_col, shingle_k,
    )
    b_sets = bench_sets.join(b_touched, id_col, "left_semi")
    return _cross_jaccard_scored(cands, t_sets, b_sets, id_col, threshold)


def containment_decontamination_pairs(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_k: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Containment-based decontamination: ``(train_id, bench_id,
    containment ≥ threshold)`` where containment = |shingles(train) ∩
    shingles(bench)| / |shingles(bench)| — the classic "≥X% of the
    benchmark doc's n-grams appear in the training doc" rule.

    This catches the contamination shape symmetric Jaccard
    (:func:`fuzzy_decontamination_pairs`) structurally MISSES: a
    benchmark question embedded verbatim inside a much longer training
    document has near-1.0 containment but tiny Jaccard (the union is
    dominated by the train doc's extra text), and MinHash banding misses
    it for the same reason — the signatures barely overlap. Run both
    passes: Jaccard for near-copies, containment for embeddings.

    EXACT, no sketch — which is what makes the all-pairs SQL oracle
    valid with no recall bound. Scale shape: the benchmark's distinct
    hashed shingles explode to ``(bench_id, |B|, shingle)`` rows and
    BROADCAST (an eval suite's shingle table is MBs); the train side
    explodes its distinct shingles map-side into one broadcast hash join
    keyed by the shingle — the 100-TB train corpus is never shuffled at
    all — and the match counts partial-aggregate on (train_id,
    bench_id). Pass ``broadcast_benchmark=False`` for a genuinely huge
    benchmark side (falls back to a shuffle equi-join on the shingle
    hash).

    ``shingle_k=8`` mirrors the standard 8-gram contamination rule;
    containment uses DISTINCT shingles on both sides (set semantics,
    like the Jaccard passes). Zero-shingle docs (NULL/empty text) are
    excluded on both sides — a benchmark doc with no shingles has no
    well-defined containment. Strictly cross pairs; id spaces may
    overlap freely.
    """
    b_sets = _hashed_shingle_sets(
        _spread(benchmark, id_col), text_col, id_col, shingle_k
    )
    t_sets = _hashed_shingle_sets(
        _spread(train, id_col), text_col, id_col, shingle_k
    )
    return _containment_pairs(
        t_sets, b_sets, id_col, threshold, broadcast_benchmark
    )


def _containment_pairs(
    t_sets: DataFrame,
    b_sets: DataFrame,
    id_col: str,
    threshold: float,
    broadcast_benchmark: bool,
) -> DataFrame:
    """The containment join/score over two ``(id, _set)`` hashed-shingle
    tables — shared by the one-shot pass (fresh sets) and the incremental
    probe (persisted benchmark sets)."""
    b_shingles = b_sets.select(
        F.col(id_col).alias("bench_id"),
        F.size("_set").alias("_bn"),
        F.explode("_set").alias("_h"),
    )
    if broadcast_benchmark:
        b_shingles = F.broadcast(b_shingles)
    t_shingles = t_sets.select(
        F.col(id_col).alias("train_id"), F.explode("_set").alias("_h")
    )
    hits = (
        t_shingles.join(b_shingles, "_h")
        .groupBy("train_id", "bench_id", "_bn")
        .agg(F.count(F.lit(1)).alias("_matches"))
    )
    return (
        hits.withColumn(
            "containment",
            F.round(F.col("_matches").cast("double") / F.col("_bn"), 4),
        )
        .filter(F.col("containment") >= threshold)
        .select("train_id", "bench_id", "containment")
    )


def decontamination_sets(
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 8,
) -> DataFrame:
    """The containment-only benchmark artifact: the hashed-shingle-set
    table stamped with its ``shingle_k`` — all
    :func:`containment_decontamination_pairs_incremental` needs. Use
    :func:`decontamination_index` when the Jaccard path is also wanted
    (it returns the banded index AND a full-recipe-stamped sets table);
    building that index just to discard it pays the 64-aggregate MinHash
    plan construction and parks a never-executed signature plan in the
    bounded persist pool (round-8 review pass 3)."""
    return _with_recipe_meta(
        hashed_shingle_sets(benchmark, text_col, id_col, shingle_k),
        "_set", {"shingle_k": shingle_k},
    )


def containment_decontamination_pairs_incremental(
    train_batch: DataFrame,
    bench_sets: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_k: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Containment matches introduced by ONE train batch against the
    PERSISTED benchmark shingle-set table (the ``bench_sets`` half of
    :func:`decontamination_index`) — benchmark text is never re-shingled,
    and like the Jaccard incremental, batches are fully independent (no
    train-train interaction, no disjoint-ids contract), so the union over
    any batch split equals the one-shot
    :func:`containment_decontamination_pairs` (property-tested).

    A stamped ``bench_sets`` built with a different ``shingle_k`` fails
    fast — mismatched shingle orders silently score near-zero containment
    everywhere.
    """
    stamp = stamped_recipe(bench_sets, "_set")
    if stamp is not None and "shingle_k" in stamp and (
        int(stamp["shingle_k"]) != int(shingle_k)
    ):
        raise ValueError(
            f"index recipe mismatch: bench_sets was built with "
            f"shingle_k={stamp['shingle_k']} but is being probed with "
            f"shingle_k={shingle_k}. Mismatched shingle orders never "
            "match — containment would silently score ~0 everywhere. "
            "Probe with the stored shingle_k or rebuild the sets."
        )
    t_sets = _hashed_shingle_sets(
        _spread(train_batch, id_col), text_col, id_col, shingle_k
    )
    return _containment_pairs(
        t_sets, bench_sets, id_col, threshold, broadcast_benchmark
    )


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per document (column ``simhash``).

    Explode tokens → per-bit ±1 contributions aggregated in one pass →
    fold sign bits back into one long. All JVM-side integer math.
    """
    words = _words(F.col(text_col))
    # hash each token ONCE in the projection below the aggregate — the 64
    # per-bit aggregates then read the shared long instead of each
    # recomputing xxhash64(tok) (Catalyst does not guarantee CSE across
    # aggregate expressions; at corpus scale that is 63 redundant 64-bit
    # hashes per token)
    tokens = _spread(df, id_col).select(
        F.col(id_col), F.explode(words).alias("tok")
    ).select(F.col(id_col), F.xxhash64("tok").alias("h"))
    # expressions are built as SQL strings: a Column-API construction of 64
    # aggregates costs ~6 py4j round-trips per bit (~1.5 s of driver time
    # per plan build, dominating warm runs); one parsed expression per
    # aggregate is a single round-trip and yields the identical plan
    aggs = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {bit}) & 1) = 1 "
            f"THEN 1 ELSE -1 END) AS b{bit}"
        )
        for bit in range(64)
    ]
    counts = tokens.groupBy(id_col).agg(*aggs)
    # shiftleft(1L, 63) wraps to Long.MIN_VALUE — the sign-bit contribution
    sim = " + ".join(
        f"(CASE WHEN b{bit} > 0 THEN shiftleft(CAST(1 AS BIGINT), {bit}) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for bit in range(64)
    )
    return counts.select(F.col(id_col), F.expr(sim).alias("simhash"))


def simhash_chunk_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """The pigeonhole chunk index of a corpus: ``(id, simhash, chunk_id,
    chunk_val)`` rows — SimHash's persistable analog of
    :func:`minhash_lsh_index`. The chunk layout is a function of
    ``max_hamming`` (the recipe), so an index must be probed with the SAME
    max_hamming it was built with.

    Like the MinHash index, ``max_bucket_size`` caps each (chunk, value)
    bucket to its lowest-id members at BUILD time — the cap composes
    deterministically across incremental batches but truncates degenerate
    buckets (recall loss past the cap); pass ``None`` for the exact
    uncapped index.
    """
    if not (0 <= max_hamming <= 63):
        # 64 bits split into max_hamming+1 chunks: >63 would create
        # zero-width chunks whose value is 0 for EVERY doc — one bucket
        # holding the whole corpus, degenerating the probe to a cross join
        raise ValueError(
            f"max_hamming must be in [0, 63]; got {max_hamming!r}"
        )
    max_bucket_size = check_bucket_cap(max_bucket_size)
    n_chunks = max_hamming + 1
    base, extra = divmod(64, n_chunks)
    widths = [base + 1] * extra + [base] * (n_chunks - extra)
    offsets = [sum(widths[:c]) for c in range(n_chunks)]
    # the signature table is O(n) ids+longs — persisting it keeps the
    # expensive explode/64-agg lineage from being recomputed for both sides
    # of the self-join (safe at any corpus size; it's signatures, not text)
    sig = _persist_scoped(simhash(df, text_col, id_col))

    def chunk_val(c: int):
        if n_chunks == 1:
            # max_hamming=0 (exact-signature matching): the whole hash IS
            # the chunk — a (1 << 64) - 1 mask does not fit a long literal
            return F.col("simhash")
        return F.shiftrightunsigned(F.col("simhash"), offsets[c]).bitwiseAND(
            F.lit((1 << widths[c]) - 1)
        )

    chunks = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_id"),
                    chunk_val(c).alias("chunk_val"),
                )
                for c in range(n_chunks)
            ])
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_id", "c.chunk_val")

    if max_bucket_size is not None:
        wcap = W.partitionBy("chunk_id", "chunk_val").orderBy(id_col)
        chunks = (
            chunks.withColumn("_bn", F.row_number().over(wcap))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    # recipe stamp (survives parquet) — probes assert the chunk layout
    return _with_recipe_meta(chunks, "chunk_val", {"max_hamming": max_hamming})


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Blocking: split the 64-bit hash into ``max_hamming + 1`` chunks — any
    pair within the distance must agree on at least one chunk exactly
    (pigeonhole), so candidates come from equi-joins on chunk values, never a
    cross join. Chunk widths are CEIL-distributed (64 = 9 chunks → one 8-bit
    + eight 7-bit) so every signature bit is covered; the pigeonhole recall
    guarantee holds for any width split.

    ``max_bucket_size`` caps each (chunk, value) bucket — the same scale
    lever as ``minhash_lsh_candidates``: a degenerate corpus (one boilerplate
    signature repeated b times) otherwise drives an uncapped O(b²) candidate
    join per chunk. Capping trades recall ONLY inside over-full buckets (docs
    beyond the cap can still pair through their other ``max_hamming`` chunks);
    pass ``None`` for the exact uncapped semantics (oracle/verification use).
    """
    chunks = simhash_chunk_index(
        df, text_col, id_col,
        max_hamming=max_hamming, max_bucket_size=max_bucket_size,
    )

    a = chunks.select(
        "chunk_id", "chunk_val",
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"),
    )
    b = chunks.select(
        "chunk_id", "chunk_val",
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"),
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_dups_incremental(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = 1000,
    assert_new_ids: bool = False,
    new_index: DataFrame | None = None,
) -> DataFrame:
    """Hamming-≤ pairs introduced by a NEW batch against an existing
    :func:`simhash_chunk_index` built with the SAME ``max_hamming`` —
    SimHash's continuous-ingestion path, mirroring
    :func:`minhash_lsh_candidates_incremental`. ``new_index`` optionally
    supplies the batch's own chunk rows (same-recipe stamp asserted),
    skipping the internal rebuild.

    Only the batch is signed; candidates are new-vs-indexed (one chunk-key
    probe of the index) plus new-vs-new (batch self-join), with the true
    hamming computed from the carried signatures and pairs emitted
    id-ordered like the full pass. With disjoint ids and no caps the output
    equals the full-corpus pass restricted to pairs touching the batch
    (property-tested). New ids must be disjoint from indexed ids
    (``assert_new_ids=True`` enforces it eagerly); a stamped index built
    with a different ``max_hamming`` fails fast (the chunk layout is a
    function of it, so mismatched probes never share chunk values).
    """
    check_index_recipe(index, "chunk_val", {"max_hamming": max_hamming})
    if assert_new_ids:
        _check_new_ids_disjoint(
            new_df, index, id_col, "simhash_near_dups_incremental"
        )
    if new_index is None:
        new_chunks = simhash_chunk_index(
            new_df, text_col, id_col,
            max_hamming=max_hamming, max_bucket_size=max_bucket_size,
        )
    else:
        check_index_recipe(new_index, "chunk_val", {"max_hamming": max_hamming})
        new_chunks = new_index.select(
            id_col, "simhash", "chunk_id", "chunk_val"
        )
    new_chunks = _persist_scoped(new_chunks)
    key = ["chunk_id", "chunk_val"]
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))

    new_side = new_chunks.select(
        *key, F.col(id_col).alias("_id_n"), F.col("simhash").alias("_sim_n")
    )
    old_side = index.select(
        *key, F.col(id_col).alias("_id_o"), F.col("simhash").alias("_sim_o")
    )
    cross = (
        new_side.join(old_side, key)
        .filter(F.col("_id_n") != F.col("_id_o"))
        .select(
            F.least("_id_n", "_id_o").alias("id_a"),
            F.greatest("_id_n", "_id_o").alias("id_b"),
            # hamming is symmetric, so the id normalization can't flip it
            F.col("_sim_n").alias("sim_a"),
            F.col("_sim_o").alias("sim_b"),
        )
    )
    within = (
        new_chunks.select(
            *key, F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a")
        )
        .join(
            new_chunks.select(
                *key, F.col(id_col).alias("id_b"),
                F.col("simhash").alias("sim_b"),
            ),
            key,
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
    )
    return (
        cross.unionByName(within)
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
