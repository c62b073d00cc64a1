"""Training-batch assembly operators: sequence packing and mixture weights.

These are the last-mile steps of an LLM-data pipeline — after dedup /
quality filtering / decontamination, documents are concatenated and chunked
into fixed-length training sequences, and corpus sources are weighted for
the sampling mixture.

Scale design:
- ``pack_sequences`` is the GPT-style concat-and-chunk packing: documents
  are laid head-to-tail in a deterministic order and split at fixed token
  budgets (documents may straddle sequence boundaries — the standard
  recipe). The layout is ONE window cumulative sum **partitioned by a shard
  column**: each shard packs independently, so a 100-TB corpus packs as
  thousands of parallel per-shard windows instead of one global
  single-partition sort (the naive global ``ORDER BY`` layout). Shards are
  the natural unit downstream anyway (one shard → one stream of training
  sequences).
- ``mixture_weights`` is one aggregation plus a window over the (tiny)
  per-source table — the temperature-sampling weights used to balance
  corpus sources (p_i^T / sum p_j^T, the multinomial-smoothing recipe from
  the multilingual-pretraining literature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from syncmaven_spark.operators.dedup import _words


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
    budget: int = 128,
    token_count_col: str | None = None,
) -> DataFrame:
    """Assign each document its position in concat-and-chunk packing.

    Within each shard (``shard_col``), documents are concatenated in
    ``id_col`` order and the token stream is cut into fixed ``budget``-token
    training sequences. Emits, per document::

        n_tokens   tokens this document contributes
        start_tok  exclusive cumulative token offset within the shard
        first_seq  index of the training sequence its first token lands in
        last_seq   index of the sequence its last token lands in
        n_seqs     how many sequences it spans (boundary-straddling docs > 1)

    Tokens are Unicode word tokens (``_words``) unless ``token_count_col``
    names a precomputed count column. Zero-token documents occupy no space
    but still get a well-defined slot (``last_seq = first_seq``) via a
    ``greatest(n, 1)`` guard on the inclusive end offset.

    Determinism: the layout depends only on (shard, id) order — stable
    across runs, task retries, and engines, which is what makes packed
    training data reproducible. That guarantee requires ``id_col`` to be
    UNIQUE within each shard: tied ids leave the cumulative sum's tie
    order engine-defined, so two duplicate-id docs could legitimately swap
    offsets between runs.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1; got {budget!r}")
    if token_count_col is not None:
        n_tokens = F.col(token_count_col).cast("long")
    else:
        n_tokens = F.size(_words(F.col(text_col))).cast("long")

    w = (
        W.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    out = df.select(
        F.col(id_col),
        F.col(shard_col),
        n_tokens.alias("n_tokens"),
        F.coalesce(F.sum(n_tokens).over(w), F.lit(0)).cast("long").alias("start_tok"),
    )
    b = F.lit(int(budget)).cast("long")
    # inclusive end offset of the doc's last token; greatest(n,1) keeps
    # zero-token docs pinned to their own start sequence instead of
    # underflowing to first_seq - 1
    end_tok = F.col("start_tok") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    first_seq = F.floor(F.col("start_tok") / b).cast("long")
    last_seq = F.floor(end_tok / b).cast("long")
    return out.select(
        id_col,
        shard_col,
        "n_tokens",
        "start_tok",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + F.lit(1)).cast("long").alias("n_seqs"),
    )


def sample_token_budget(
    df: DataFrame,
    total_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    temperature: float = 0.7,
    shard_col: str | None = None,
) -> DataFrame:
    """Deterministic token-budget subsample honoring the temperature mix.

    Splits ``total_budget`` tokens across sources by the
    :func:`mixture_weights` recipe (``floor(temp_weight · budget)`` per
    source), then fills each source's budget greedily in md5(id) order — a
    reproducible shuffle — keeping documents while the running token total
    stays within budget. Emits the SELECTED docs as ``(source, doc_id,
    n_tokens, cum_tokens)``.

    **Scale shape.** One aggregation for the per-source totals, a broadcast
    of the tiny budget table back onto the corpus, and one window cumsum.
    With ``shard_col=None`` the window partitions by ``source_col`` alone,
    so parallelism equals the NUMBER OF SOURCES — a 100-TB corpus with 3
    sources would sort ~33 TB through each of 3 reducers (round-6 verdict).
    Pass ``shard_col`` to split each source's budget PROPORTIONALLY to its
    shards' token mass (``floor(src_budget · shard_tokens / src_tokens)``)
    and fill greedily per (source, shard): parallelism becomes
    sources × shards, each reducer sorts one shard. The trade is exact and
    bounded: per (source, shard) the greedy fill under-spends its shard
    budget by less than one document, and the floored proportional split
    under-allocates each source by < ``n_shards`` tokens, so the sharded
    selection's per-source token total is within one document per shard of
    the unsharded budget (property-tested). Selection is a filter, so the
    unsampled corpus is never materialized anywhere.

    Determinism requires ``id_col`` to be unique within each source (same
    contract as :func:`pack_sequences`): tied md5(id) orderings leave the
    cumsum's tie order engine-defined, so duplicate-id rows at a budget
    boundary could swap in and out of the sample between runs.
    """
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0; got {total_budget!r}")
    weights = mixture_weights(
        df, source_col=source_col, text_col=text_col, temperature=temperature
    ).select(
        source_col,
        F.floor(F.col("temp_weight") * F.lit(int(total_budget)))
        .cast("long")
        .alias("_budget"),
    )
    group_cols = [source_col] if shard_col is None else [source_col, shard_col]
    per_doc = df.select(
        *[F.col(c) for c in group_cols],
        F.col(id_col),
        F.size(_words(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    if shard_col is None:
        budgets = weights
    else:
        # floor-split each source's budget across its shards by token mass;
        # the result is still one tiny broadcastable table (sources×shards)
        shard_tot = per_doc.groupBy(source_col, shard_col).agg(
            F.sum("n_tokens").alias("_shard_tokens")
        )
        src_tot = shard_tot.groupBy(source_col).agg(
            F.sum("_shard_tokens").alias("_src_tokens")
        )
        budgets = (
            shard_tot.join(src_tot, source_col)
            .join(weights, source_col)
            .select(
                source_col,
                shard_col,
                # divide FIRST: budget * shard_tokens as long*long wraps
                # int64 at real scale (1e12-token budget × 1e13-token
                # shard ≈ 1e25 >> 2^63) — the double ratio keeps the
                # product in range and the DuckDB oracle computes the
                # identical IEEE expression (round-7 review)
                F.when(F.col("_src_tokens") == 0, F.lit(0))
                .otherwise(
                    F.floor(
                        F.col("_budget")
                        * (F.col("_shard_tokens") / F.col("_src_tokens"))
                    )
                )
                .cast("long")
                .alias("_budget"),
            )
        )
    w = (
        W.partitionBy(*group_cols)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        per_doc.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(budgets), group_cols)
        .filter(F.col("cum_tokens") <= F.col("_budget"))
        .select(*group_cols, id_col, "n_tokens", "cum_tokens")
    )


def mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    temperature: float = 0.7,
) -> DataFrame:
    """Per-source corpus statistics and temperature-sampling weights.

    ``raw_share`` is each source's token share; ``temp_weight`` is the
    temperature-adjusted sampling weight ``n_i^T / sum_j n_j^T`` (T < 1
    upweights small sources — the standard mixture-balancing recipe).
    Output is one row per source: tiny, exact, one shuffle for the
    aggregation and a trivial window over the aggregated table.
    """
    if not (0.0 < temperature <= 1.0):
        raise ValueError(f"temperature must be in (0, 1]; got {temperature!r}")
    per_source = df.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(_words(F.col(text_col)))).cast("long").alias("n_tokens"),
    )
    w = W.partitionBy()
    powed = F.pow(F.col("n_tokens").cast("double"), F.lit(float(temperature)))
    tot_tokens = F.sum("n_tokens").over(w).cast("double")
    tot_pow = F.sum(powed).over(w)
    # a degenerate all-empty corpus sums to 0 tokens; emit 0.0 weights
    # instead of the NaN that double 0/0 produces (NaN weights poison any
    # downstream sampler silently)
    return per_source.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(
            F.when(tot_tokens == 0, F.lit(0.0)).otherwise(
                F.col("n_tokens") / tot_tokens
            ),
            4,
        ).alias("raw_share"),
        F.round(
            F.when(tot_pow == 0, F.lit(0.0)).otherwise(powed / tot_pow), 4
        ).alias("temp_weight"),
    )
