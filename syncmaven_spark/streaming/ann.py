"""Streaming ANN ingestion — the IVF-PQ family's continuous-ingestion
driver, completing the state layout the LSH/decontamination families
already have (round-8 verdict #3: the append operators — ``ivf_append``,
``ivfpq_append``, ``pq_encode`` — existed, but nothing wired them into the
epoch-dir state with journals, replay idempotence and a drift record).

State layout under ``state_dir`` (same manifest/journal conventions as the
near-dup drivers in :mod:`syncmaven_spark.streaming.incremental`, so
``compact_state`` and the consistency guards work unchanged):

- ``centroids/``, ``codebooks/`` — the frozen coarse + PQ codebooks
  (stamped parquet, written once by :func:`prepare_ann_state`);
- ``store/epoch=<id>/cell=<c>/`` — the ``(id, cell, codes)`` rows; the
  initial corpus build lands at ``epoch=-1`` (the compaction BASE, below
  every live epoch) and each micro-batch appends its own epoch dir with
  ``mode("overwrite")``, so an at-least-once replay rewrites its epoch
  idempotently instead of duplicating rows;
- ``recipe.json`` — layout version, family, geometry AND both codebook
  checksums: a repointed/retrained codebook table fails fast here before
  any row is appended under the wrong quantizer;
- ``epochs.json`` — the max-epoch watermark plus the per-epoch
  :func:`~syncmaven_spark.operators.similarity.ivf_drift` record (mean /
  p10 / min assigned-cell cosine) — the retrain signal, checked per batch.

Probes read the WHOLE store (all epochs, base included) through
:func:`read_ann_store`; the combined stamp rides the ``codes`` data column
of every epoch's files, so a merged multi-epoch read keeps the fail-fast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from syncmaven_spark.streaming.incremental import (
    BASE_EPOCH,
    STATE_LAYOUT_VERSION,
    _atomic_write_json,
    _guard_state_consistency,
    _load_json,
    _read_epoch_state,
    _refuse_pending_compaction,
    _require_layout,
)


def prepare_ann_state(
    spark: SparkSession,
    corpus: DataFrame,
    state_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 256,
    sample_size: int = 10_000,
    seed: int = 42,
    encode_residuals: bool = False,
) -> None:
    """Build the IVF-PQ index over the initial corpus and persist it as
    streaming state — the ANN analog of ``prepare_decontamination_state``
    (train once offline; the streaming driver only ever APPENDS under the
    frozen codebooks).

    The store lands at ``epoch=-1`` — the compaction base, visible to
    every future epoch's reads and excluded from nothing — and both
    codebook checksums are recorded in ``recipe.json`` so a later run
    against swapped/retrained codebooks fails before appending rows the
    store cannot score.
    """
    from syncmaven_spark.operators.dedup import stamped_recipe
    from syncmaven_spark.operators.pq import ivfpq_index, load_pq_codebooks

    if os.path.exists(os.path.join(state_dir, "recipe.json")):
        raise ValueError(
            f"prepare_ann_state: {state_dir!r} already holds a prepared "
            "state — appending happens through run_streaming_ann_sync; "
            "to rebuild the index, use a fresh state_dir."
        )
    cells_codes, centroids_df, codebooks_df = ivfpq_index(
        corpus, id_col=id_col, vec_col=vec_col,
        n_centroids=n_centroids, m=m, n_codes=n_codes,
        sample_size=sample_size, seed=seed,
        encode_residuals=encode_residuals,
    )
    centroids_df.write.parquet(os.path.join(state_dir, "centroids"))
    codebooks_df.write.parquet(os.path.join(state_dir, "codebooks"))
    cells_codes.write.partitionBy("cell").parquet(
        os.path.join(state_dir, "store", f"epoch={BASE_EPOCH}")
    )
    _, pq_recipe = load_pq_codebooks(codebooks_df)
    ivf_recipe = stamped_recipe(centroids_df, "centroid_id") or {}
    _atomic_write_json(
        os.path.join(state_dir, "recipe.json"),
        {
            "layout": STATE_LAYOUT_VERSION,
            "family": "ivfpq",
            "id_col": id_col,
            "vec_col": vec_col,
            "n_centroids": int(n_centroids),
            "m": int(m),
            "n_codes": int(n_codes),
            "encode": "residual" if encode_residuals else "raw",
            "ivf_checksum": ivf_recipe.get("checksum"),
            "pq_checksum": pq_recipe["checksum"],
        },
    )


def _load_ann_state(
    spark: SparkSession, state_dir: str, fn_name: str
) -> tuple[dict, DataFrame, DataFrame, tuple, tuple]:
    """Shared open-and-validate for the driver and the consumer: layout /
    family / pending-compaction guards, then the codebook tables verified
    against the checksums recorded at prepare time (a swapped codebook
    otherwise silently mis-scores every probe and mis-cells every
    append). Returns the collected ``(centroids, ivf_recipe)`` /
    ``(books, pq_recipe)`` tuples too — the guard already paid those
    collects, so callers reuse them instead of re-collecting (round-9
    review pass 2)."""
    from syncmaven_spark.operators.pq import load_pq_codebooks
    from syncmaven_spark.operators.similarity import _load_codebook

    recipe = _load_json(os.path.join(state_dir, "recipe.json"))
    if recipe is None:
        raise ValueError(
            f"{fn_name}: no recipe.json under {state_dir!r} — prepare the "
            "index first (prepare_ann_state)."
        )
    _require_layout(recipe, state_dir, fn_name)
    if recipe.get("family") != "ivfpq":
        raise ValueError(
            f"{fn_name}: state at {state_dir!r} belongs to family "
            f"{recipe.get('family')!r}, not 'ivfpq' — point the matching "
            "driver at it instead."
        )
    _refuse_pending_compaction(state_dir, fn_name)
    centroids_df = spark.read.parquet(os.path.join(state_dir, "centroids"))
    codebooks_df = spark.read.parquet(os.path.join(state_dir, "codebooks"))
    ivf_loaded = _load_codebook(centroids_df)
    pq_loaded = load_pq_codebooks(codebooks_df)
    if (
        ivf_loaded[1]["checksum"] != recipe.get("ivf_checksum")
        or pq_loaded[1]["checksum"] != recipe.get("pq_checksum")
    ):
        raise ValueError(
            f"{fn_name}: the codebook tables under {state_dir!r} do not "
            "match the checksums recorded at prepare time — the state was "
            "repointed at different/retrained codebooks. Rows appended "
            "under the wrong quantizer score as plausible garbage; "
            "rebuild into a fresh state_dir instead."
        )
    return recipe, centroids_df, codebooks_df, ivf_loaded, pq_loaded


def _open_ann_store(
    spark: SparkSession, state_dir: str, fn_name: str
) -> tuple[dict, DataFrame, DataFrame, DataFrame, tuple]:
    """The ONE store-open path (validate + read + column selection) both
    consumers share — a layout change made in one and not the other would
    silently diverge them (round-9 review #4). Also hands back the
    validated codebook matrices so the probe skips the repeat collects."""
    recipe, centroids_df, codebooks_df, ivf_loaded, pq_loaded = (
        _load_ann_state(spark, state_dir, fn_name)
    )
    store = spark.read.parquet(os.path.join(state_dir, "store"))
    cells_codes = store.select(recipe["id_col"], "cell", "codes")
    return (
        recipe, cells_codes, centroids_df, codebooks_df,
        (*ivf_loaded, *pq_loaded),
    )


def read_ann_store(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The probe-side consumer: ``(cells_codes, centroids_df,
    codebooks_df)`` ready to hand to :func:`~syncmaven_spark.operators.
    pq.ivfpq_probe` (pass ``encode_residuals=recipe['encode'] ==
    'residual'`` — or use :func:`probe_ann_store`, which wires it). Reads
    every epoch including the base; refuses mid-compaction state."""
    _, cells_codes, centroids_df, codebooks_df, _ = _open_ann_store(
        spark, state_dir, "read_ann_store"
    )
    return cells_codes, centroids_df, codebooks_df


def probe_ann_store(
    spark: SparkSession,
    queries: DataFrame,
    state_dir: str,
    k: int = 5,
    n_probe: int = 4,
    **probe_kwargs,
) -> DataFrame:
    """One-call probe of a streaming ANN state: opens the store, reads the
    encode mode from the recipe (the caller cannot get it wrong), and runs
    :func:`~syncmaven_spark.operators.pq.ivfpq_probe`."""
    from syncmaven_spark.operators.pq import ivfpq_probe

    recipe, cells_codes, centroids_df, codebooks_df, loaded = (
        _open_ann_store(spark, state_dir, "probe_ann_store")
    )
    return ivfpq_probe(
        queries, cells_codes, centroids_df, codebooks_df,
        k=k, n_probe=n_probe, id_col=recipe["id_col"],
        vec_col=recipe["vec_col"],
        encode_residuals=recipe.get("encode") == "residual",
        _loaded=loaded,
        **probe_kwargs,
    )


def read_ann_drift(spark: SparkSession, state_dir: str) -> DataFrame:
    """The drift HISTORY as a DataFrame — ``(epoch, n_vectors,
    mean_cell_cos, p10_cell_cos, min_cell_cos)``, one row per processed
    non-empty epoch — the ANN analog of ``read_pairs`` reading the
    per-epoch record back so the retrain decision can look at the trend
    (a slow slide across 50 epochs and a one-batch outlier both end below
    a static gate, but only the former means the codebook is stale)."""
    recipe = _load_json(os.path.join(state_dir, "recipe.json"))
    epochs = _load_json(os.path.join(state_dir, "epochs.json"))
    if recipe is None:
        raise ValueError(
            f"read_ann_drift: no recipe.json under {state_dir!r} — not a "
            "prepared ANN state."
        )
    _require_layout(recipe, state_dir, "read_ann_drift")
    if recipe.get("family") != "ivfpq":
        raise ValueError(
            f"read_ann_drift: state at {state_dir!r} belongs to family "
            f"{recipe.get('family')!r}, not 'ivfpq'."
        )
    drift = (epochs or {}).get("drift") or {}
    rows = [
        (
            int(e),
            int(rec["n_vectors"]),
            rec.get("mean_cell_cos"),
            rec.get("p10_cell_cos"),
            rec.get("min_cell_cos"),
        )
        for e, rec in sorted(drift.items(), key=lambda kv: int(kv[0]))
    ]
    return spark.createDataFrame(
        rows,
        "epoch int, n_vectors long, mean_cell_cos double, "
        "p10_cell_cos double, min_cell_cos double",
    )


def run_streaming_ann_sync(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    state_dir: str,
    checkpoint_dir: str,
    assert_new_ids: bool = True,
    min_mean_cell_cos: float | None = None,
) -> None:
    """Continuously ingest a growing parquet directory of embeddings into
    a prepared IVF-PQ state (``availableNow`` trigger — process everything
    new, then stop; re-running picks up later files).

    The codebooks are verified against the prepare-time checksums ONCE
    at startup and the collected matrices are frozen for the run — every
    batch assigns, drifts and encodes against exactly those matrices
    (never re-reading the tables, so a mid-run on-disk swap cannot split
    assignment and drift across two codebooks). Per micro-batch: enforce
    the disjoint-ids contract against everything
    already stored (``assert_new_ids`` — one batch-sized semi-join whose
    store side reads only the id column, plus the in-batch duplicate
    check; pass ``False`` when the source guarantees unique ids and the
    per-batch store scan matters), compute the batch's
    :func:`~syncmaven_spark.operators.similarity.ivf_drift` against the
    frozen coarse codebook and record it per epoch in ``epochs.json``,
    then append the batch's ``(id, cell, codes)`` rows under
    ``store/epoch=<id>`` with ``mode("overwrite")`` — the same
    replay-idempotence contract as every other family driver (a replayed
    epoch rewrites its own dir, and the disjointness read excludes the
    current epoch so the replay does not collide with itself).

    ``min_mean_cell_cos`` turns the drift record into a hard gate: a
    batch whose mean assigned-cell cosine falls below it raises instead
    of appending — the frozen codebook no longer represents the incoming
    distribution, which is exactly when probe recall silently degrades.
    The remedy is a retrain into a fresh state (the recorded per-epoch
    drift history shows when the slide started). Leave it ``None`` to
    record-only.

    The drift rows and the appended rows are both per-row functions of
    (vector, frozen codebooks) — no k-means retrain, no re-encode, no
    unbounded state reads: per batch, the source is persisted and the
    cell-assignment UDF runs ONCE (drift and encode share the assignment
    rows — round-9 review #2: the first layout assigned twice and
    re-read the unpersisted batch per action), so per-batch cost is
    O(batch) plus the optional id-column store scan of the guard.
    """
    from syncmaven_spark.operators.cache import persist_scoped
    from syncmaven_spark.operators.pq import ivfpq_encode_assigned
    from syncmaven_spark.operators.similarity import ivf_append, ivf_drift

    _guard_state_consistency(
        state_dir, checkpoint_dir, "run_streaming_ann_sync"
    )
    # the validation collects the (tiny) codebook tables once; every
    # batch's assignment, drift and encode reuse the matrices instead of
    # re-collecting per epoch
    recipe, centroids_df, codebooks_df, ivf_loaded, pq_loaded = (
        _load_ann_state(spark, state_dir, "run_streaming_ann_sync")
    )
    loaded = (*ivf_loaded, *pq_loaded)
    id_col, vec_col = recipe["id_col"], recipe["vec_col"]
    residual = recipe.get("encode") == "residual"
    store_dir = os.path.join(state_dir, "store")
    epochs_path = os.path.join(state_dir, "epochs.json")
    id_type = schema[id_col].dataType.simpleString()
    store_ddl = f"{id_col} {id_type}, codes array<smallint>"

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        epochs = _load_json(epochs_path) or {}
        max_seen = epochs.get("max_epoch")
        if max_seen is not None and int(epoch_id) < int(max_seen):
            raise ValueError(
                f"run_streaming_ann_sync: batch arrived with epoch "
                f"{epoch_id} but state at {state_dir!r} has already "
                f"processed epoch {max_seen} — the streaming checkpoint "
                "was recreated over surviving state, so the source would "
                "be re-delivered from epoch 0 and re-append stored ids. "
                "Restore the original checkpoint, or start a fresh "
                "state_dir + checkpoint."
            )

        def _advance(extra: dict | None = None) -> None:
            payload = {**epochs, "max_epoch": int(epoch_id)}
            if extra:
                drift = dict(epochs.get("drift") or {})
                drift[str(int(epoch_id))] = extra
                payload["drift"] = drift
            _atomic_write_json(epochs_path, payload)

        # persisted: the batch feeds isEmpty, the disjointness semi-join,
        # the dup check and the assignment scan — unpersisted it would
        # re-read the source parquet per action
        batch = persist_scoped(batch_df.select(id_col, vec_col))
        if batch.isEmpty():
            _advance()
            return

        stored = None
        if assert_new_ids:
            # epochs < current only (the base at -1 qualifies): a replayed
            # epoch must not collide with its own prior write. Column
            # pruning keeps the scan to the id column of the store.
            stored = _read_epoch_state(
                spark, store_dir, [id_col], store_ddl, epoch_id,
                bucket_vals=None, bucket_col="cell",
            )

        # ONE assignment pass per batch: drift reads these rows, and the
        # encode below reuses their (vec, cell) — the UDF never runs twice
        assigned = persist_scoped(
            ivf_append(
                batch, centroids_df, id_col=id_col, vec_col=vec_col,
                _loaded=ivf_loaded,
            )
        )
        # the retrain signal, computed on the BATCH only (bounded): how
        # well does the frozen coarse codebook still represent incoming
        # vectors? Recorded per epoch; optionally a hard gate.
        drift_row = ivf_drift(assigned, centroids_df, _loaded=ivf_loaded).first()
        drift = {
            "n_vectors": int(drift_row["n_vectors"]),
            "mean_cell_cos": (
                float(drift_row["mean_cell_cos"])
                if drift_row["mean_cell_cos"] is not None else None
            ),
            "p10_cell_cos": (
                float(drift_row["p10_cell_cos"])
                if drift_row["p10_cell_cos"] is not None else None
            ),
            "min_cell_cos": (
                float(drift_row["min_cell_cos"])
                if drift_row["min_cell_cos"] is not None else None
            ),
        }
        if drift["n_vectors"] == 0:
            # all rows unusable (null/non-finite vectors) — nothing to
            # append; advance the watermark like the empty-batch path
            _advance()
            return
        if (
            min_mean_cell_cos is not None
            and drift["mean_cell_cos"] is not None
            and drift["mean_cell_cos"] < min_mean_cell_cos
        ):
            raise ValueError(
                f"run_streaming_ann_sync: epoch {epoch_id}'s mean "
                f"assigned-cell cosine {drift['mean_cell_cos']} fell "
                f"below the retrain gate {min_mean_cell_cos} — the frozen "
                "codebook no longer represents the incoming distribution "
                "and probe recall is degrading. Retrain into a fresh "
                "state (prepare_ann_state) and re-point the stream, or "
                "lower/remove the gate to record-and-continue."
            )

        if stored is not None:
            from syncmaven_spark.operators.dedup import _check_new_ids_disjoint

            _check_new_ids_disjoint(
                batch, stored, id_col, "run_streaming_ann_sync"
            )
            dup = (
                batch.groupBy(id_col).count()
                .filter(F.col("count") > 1).limit(1).collect()
            )
            if dup:
                raise ValueError(
                    f"run_streaming_ann_sync: the batch contains id "
                    f"{dup[0][0]!r} more than once — duplicate store rows "
                    "make probe scores nondeterministic. Deduplicate the "
                    "source files."
                )
        rows = ivfpq_encode_assigned(
            assigned, centroids_df, codebooks_df,
            id_col=id_col, encode_residuals=residual, _loaded=loaded,
        )
        rows.write.partitionBy("cell").mode("overwrite").parquet(
            os.path.join(store_dir, f"epoch={int(epoch_id)}")
        )
        _advance(extra=drift)

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
