"""Structured-Streaming incremental sync — the always-on variant of the
batch cursor loop.

The reference's incremental machinery (cursor state + checkpointEvery,
sync.ts:455-574) is offset tracking + micro-batch commit; Spark Structured
Streaming provides exactly that natively: file-source offsets in
``checkpointLocation`` replace the ``$lastCursor`` state row, and
``foreachBatch`` is the per-checkpoint sink commit (SURVEY §2D 'streaming
concepts' line). ``trigger(availableNow=True)`` gives the batch-incremental
behavior (process everything new, then stop) — re-running the sync picks up
only files that appeared since, the streaming analog of the second golden
part2 run.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from syncmaven_spark.sinks import get_destination
from syncmaven_spark.sinks.base import DestinationProvider, RowError
from syncmaven_spark.validate import RowValidator

#: default per-micro-batch row cap for the driver-delivery (state-backed
#: sink) path — large enough for any API-bound sink's realistic batch,
#: small enough that the driver never silently OOMs on a misrouted stream
DEFAULT_MAX_DRIVER_BATCH_ROWS = 100_000


class DriverBatchTooLarge(RuntimeError):
    """A micro-batch exceeded the driver-delivery row cap (fail-fast guard
    instead of an unbounded ``collect()``)."""


def run_streaming_sync(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    destination: str | DestinationProvider,
    stream: str,
    credentials: dict[str, Any],
    store: Any,
    sync_id: str,
    checkpoint_dir: str,
    options: dict[str, Any] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    executor_side: bool | None = None,
    enrichments: list[Any] | None = None,
    max_driver_batch_rows: int = DEFAULT_MAX_DRIVER_BATCH_ROWS,
) -> dict[str, int]:
    """Incrementally sync a growing parquet directory into a destination.

    Each micro-batch is validated and delivered through the same sink
    interface as the batch runner; Spark's checkpoint tracks which source
    files were already processed (at-least-once into idempotent sinks, the
    same delivery contract as the reference).

    Delivery is split by sink statefulness (``executor_side=None`` = auto):

    - **stateless sinks** (``provider.stateless``, e.g. http): rows are
      delivered with ``foreachPartition`` — one OutputStream per partition
      on executors, nothing materializes on the driver, so micro-batch size
      is bounded by executor memory, not driver memory;
    - **state-backed sinks** (hubspot ID maps, audience caches, the
      single-file NDJSON sink): rows are collected to the driver where the
      shared store lives — correct but driver-bounded, exactly the
      reference's own delivery model (one row at a time through one
      process, sync.ts:493-573). That collection is guarded by
      ``max_driver_batch_rows`` (default 100k): a micro-batch larger than
      the cap fails fast with :class:`DriverBatchTooLarge` instead of
      OOMing the driver — re-route to a stateless sink
      (``executor_side=True``), raise the cap explicitly, or shrink
      micro-batches (``maxFilesPerTrigger`` on the source).
    """
    from syncmaven_spark.runner import deliver_partitions
    from syncmaven_spark.validate import with_validation_column

    provider = (
        destination
        if isinstance(destination, DestinationProvider)
        else get_destination(destination, credentials)
    )
    spec = provider.stream_spec(stream)
    validator = RowValidator(spec.row_type)
    totals = {"received": 0, "success": 0, "skipped": 0, "failed": 0}
    use_executor = provider.stateless if executor_side is None else executor_side

    reader = spark.readStream.schema(schema).parquet(source_dir)
    if transform is not None:
        reader = transform(reader)

    opened = {"n": 0}

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if use_executor:
            # vectorized validation; one persisted pass feeds the counts
            # aggregate and the partition-parallel delivery (observe() does
            # not fire for RDD-backed foreachPartition — see runner.py)
            tagged = with_validation_column(batch_df, spec.row_type).persist()
            try:
                counts = tagged.agg(
                    F.count(F.lit(1)).alias("total"),
                    F.sum(F.when(F.col("_valid"), 1).otherwise(0)).alias("valid"),
                ).first()
                n_total = counts["total"] or 0
                n_valid = counts["valid"] or 0
                if n_total == 0:
                    return
                valid = tagged.filter(F.col("_valid")).drop("_valid")
                sc = spark.sparkContext
                drop_acc = sc.accumulator(0)
                if enrichments:
                    # row → 0..N enrichment stages, executor-parallel, with
                    # PER-STAGE re-validation — same chain as
                    # run_sync_distributed (a stage's invalid output never
                    # feeds the next stage); drops ride drop_acc
                    from syncmaven_spark.enrich import enrich_dataframe
                    from syncmaven_spark.runner import _filter_valid_counting

                    for enrichment in enrichments:
                        valid = enrich_dataframe(
                            valid, lambda e=enrichment: e
                        )
                        valid = _filter_valid_counting(
                            with_validation_column(valid, spec.row_type),
                            drop_acc,
                        )
                # sink-reported stats ride accumulators back from the
                # executors, so both delivery paths report the same way:
                # received = rows handed to sinks, failed = sink failures,
                # skipped = validation skips (+ sink-side skips)
                acc = {k: sc.accumulator(0)
                       for k in ("received", "success", "skipped", "failed")}
                deliver_partitions(
                    valid, provider, stream, credentials, sync_id,
                    options or {}, restart=opened["n"] > 0, stats_acc=acc,
                )
            finally:
                tagged.unpersist()
            opened["n"] += 1
            totals["received"] += acc["received"].value
            totals["success"] += acc["success"].value
            totals["failed"] += acc["failed"].value
            totals["skipped"] += (
                (n_total - n_valid) + acc["skipped"].value + drop_acc.value
            )
            return

        # Bounded driver delivery: LIMIT cap+1 (not collect-then-count) so
        # an oversized batch fails after materializing at most cap+1 rows,
        # never the whole micro-batch.
        collected = batch_df.limit(max_driver_batch_rows + 1).collect()
        if len(collected) > max_driver_batch_rows:
            raise DriverBatchTooLarge(
                f"micro-batch epoch {epoch_id} exceeds the driver-delivery "
                f"cap of {max_driver_batch_rows} rows for state-backed sink "
                f"{provider.name!r}. Remedies: deliver executor-side with a "
                "stateless sink (executor_side=True), raise "
                "max_driver_batch_rows explicitly, or bound micro-batch "
                "size at the source (e.g. maxFilesPerTrigger)."
            )
        if not collected:
            return
        out = provider.create_output_stream(
            stream,
            credentials,
            sync_id,
            store,
            restart=opened["n"] > 0,
            options=options or {},
        )
        opened["n"] += 1
        # Rows convert to dicts one at a time inside the loop: a second
        # up-front full-batch list would double peak driver memory and
        # defeat the cap's bound.
        for spark_row in collected:
            row = spark_row.asDict(recursive=True)
            if not validator.is_valid(row):
                totals["skipped"] += 1
                continue
            out_rows = [row]
            for enrichment in enrichments or []:
                next_rows: list[dict[str, Any]] = []
                for r in out_rows:
                    try:
                        enriched = list(enrichment.enrich(r))
                    except Exception:
                        enriched = []  # enrichment errors drop the row
                    for er in enriched:
                        if validator.is_valid(er):
                            next_rows.append(er)
                        else:
                            # re-validation drops count as skipped, same as
                            # pre-enrichment validation failures
                            totals["skipped"] += 1
                out_rows = next_rows
            for r in out_rows:
                try:
                    out.handle_row(r)
                except RowError:
                    # sink-declared per-row rejection: count failed and
                    # continue (std.ts:147-175); other errors abort
                    totals["failed"] += 1
        stats = out.finish()
        totals["received"] += stats.received
        totals["success"] += stats.success
        totals["failed"] += stats.failed
        # sink-reported skips (mixpanel lookback/already-processed drops)
        # fold in like every other delivery path (_fold_stats / acc)
        totals["skipped"] += stats.skipped

    query = (
        reader.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return totals


def run_streaming_near_dup_sync(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 32,
    shingle_k: int = 3,
    max_bucket_size: int | None = 200,
) -> None:
    """Continuous near-dup mining over a growing parquet directory — the
    streaming composition of the incremental MinHash operators.

    Per micro-batch (``availableNow`` trigger — process everything new,
    then stop; re-running picks up later files, like the batch sync's
    second run):

    1. probe the persisted band index with the batch
       (``minhash_lsh_candidates_incremental``), verify candidates with the
       exact Jaccard against the persisted corpus texts ∪ the batch;
    2. append the verified pairs to ``<state_dir>/pairs``;
    3. append the batch's band rows to ``<state_dir>/index`` and its
       ``(id, text)`` rows to ``<state_dir>/corpus``.

    Crash safety: every write lands under an ``epoch=<id>`` subdirectory
    with ``mode("overwrite")``, so a replayed micro-batch (at-least-once
    foreachBatch) rewrites its own epoch instead of duplicating rows, and
    state reads are filtered to ``epoch < epoch_id`` — without that filter
    a crash between ``handle_batch`` returning and Spark committing the
    offset made the REPLAY see its own prior writes in the corpus/index
    and fan every pair out 2×2 through the verification join (round-6
    review, reproduced live). State grows O(corpus) for the index/corpus
    tables and O(near-dup pairs) for the output, never O(n²).

    The LSH recipe (num_perm/bands/shingle_k) is written to
    ``<state_dir>/recipe.json`` on the first run and asserted on every
    later one: band hashes from different recipes silently never match, so
    a mismatched re-run would otherwise be a permanently recall-less
    pipeline with zero errors (reproduced live with a 16-band index probed
    at 32 bands).

    New batches MUST carry ids disjoint from everything already indexed
    (the incremental operator's contract); Spark's source checkpoint
    guarantees each FILE is processed once, so id-unique input files
    satisfy this for free.
    """
    import json
    import os

    from syncmaven_spark.operators.dedup import (
        minhash_lsh_index,
        minhash_verified_pairs_incremental,
    )

    index_dir = os.path.join(state_dir, "index")
    corpus_dir = os.path.join(state_dir, "corpus")
    pairs_dir = os.path.join(state_dir, "pairs")
    recipe_path = os.path.join(state_dir, "recipe.json")
    id_type = schema[id_col].dataType.simpleString()

    recipe = {
        "num_perm": num_perm, "bands": bands, "shingle_k": shingle_k,
        "id_col": id_col, "text_col": text_col,
    }
    if os.path.exists(recipe_path):
        with open(recipe_path, encoding="utf-8") as f:
            stored = json.load(f)
        if stored != recipe:
            raise ValueError(
                "run_streaming_near_dup_sync: LSH recipe mismatch with the "
                f"existing state at {state_dir!r}: stored {stored}, got "
                f"{recipe}. Band hashes from different recipes never match "
                "— probing would silently find no cross-batch pairs. Use "
                "the stored recipe or start a fresh state_dir."
            )
    else:
        os.makedirs(state_dir, exist_ok=True)
        with open(recipe_path, "w", encoding="utf-8") as f:
            json.dump(recipe, f)

    def _read_state(path: str, cols: list[str], ddl: str, epoch_id: int) -> DataFrame:
        # missing directory (not yet written) → empty; any OTHER read error
        # must propagate — treating corrupted/unreadable state as "first
        # epoch" would silently drop every cross-batch pair (round-6 review)
        if not os.path.isdir(path):
            return spark.createDataFrame([], ddl)
        # epoch < epoch_id: exclude a replayed epoch's own prior writes;
        # the select then drops the epoch partition column the layout adds
        return (
            spark.read.parquet(path)
            .filter(F.col("epoch") < F.lit(int(epoch_id)))
            .select(*cols)
        )

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.select(id_col, text_col)
        if batch.isEmpty():
            return
        index = _read_state(
            index_dir,
            [id_col, "band_id", "band_hash"],
            f"{id_col} {id_type}, band_id int, band_hash bigint",
            epoch_id,
        )
        corpus_old = _read_state(
            corpus_dir,
            [id_col, text_col],
            f"{id_col} {id_type}, {text_col} string",
            epoch_id,
        )
        pairs = minhash_verified_pairs_incremental(
            batch, index, corpus_old.unionByName(batch),
            text_col, id_col,
            threshold=threshold, num_perm=num_perm, bands=bands,
            shingle_k=shingle_k, max_bucket_size=max_bucket_size,
        )
        epoch = f"epoch={epoch_id}"
        pairs.write.mode("overwrite").parquet(os.path.join(pairs_dir, epoch))
        minhash_lsh_index(
            batch, text_col, id_col,
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            max_bucket_size=max_bucket_size,
        ).write.mode("overwrite").parquet(os.path.join(index_dir, epoch))
        batch.write.mode("overwrite").parquet(os.path.join(corpus_dir, epoch))

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_within_watermark(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — the incremental counterpart of
    ``operators.exact_dedup``: drop re-deliveries of the same key arriving
    within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes it, so state size is bounded by the horizon × key
    arrival rate — the property that makes exactly-once-per-key feasible on
    an unbounded stream (plain ``dropDuplicates`` on a stream grows state
    forever). Complements the at-least-once batch sync path, which gets
    idempotency from sink-side keys (hubspot external_id, mixpanel
    ``$insert_id``) instead.
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window_size: str = "5 minutes",
    group_col: str = "event_type",
    value_col: str | None = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the late-data policy the
    reference approximates with mixpanel's lookback window (SURVEY §2D).
    ``value_col=None`` emits counts only (streams without a numeric value
    column used to fail analysis on the hardcoded ``sum(value)``)."""
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size), group_col)
        .agg(*aggs)
    )
