"""Round-10 fixes, each pinned by the scenario that motivated it:

- verdict #1: the streaming ANN driver's disjointness guard reads an
  id-bucketed ``ids/`` sidecar pruned to the batch's touched buckets —
  never the whole store's id column — and the sidecar folds under
  ``compact_state`` like every other state table;
- verdict #2: the driver records BOTH drift halves per epoch (coarse
  cell cosine AND PQ reconstruction cosine), with a ``min_mean_recon_cos``
  gate that trips on distribution shifts the cell gate alone would bless;
- verdict #4: ``maybe_compact`` — the compaction-cadence decision as a
  callable, opt-in from the family drivers;
- verdict #6: ``reindex_ann_state`` — the tripped-gate remedy as one
  call (fresh codebooks, drift history carried, id parity verified);
- round-9 advice: crash-safe ``prepare_ann_state`` (atomic tmp-dir
  install), and the pq/ivfpq probe auto-chunk warning.
"""

import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from syncmaven_spark.streaming import (
    compact_state,
    maybe_compact,
    prepare_ann_state,
    probe_ann_store,
    read_ann_drift,
    reindex_ann_state,
    run_streaming_ann_sync,
)


def _vecs(rng, n, start=0, dim=8):
    X = rng.randn(n, dim)
    return [(start + i, [float(v) for v in X[i]]) for i in range(n)]


def _write_vecs(spark, src, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("append").parquet(src)


def _run(spark, src, state, ckpt, **kw):
    schema = spark.read.parquet(src).schema
    run_streaming_ann_sync(spark, src, schema, state, ckpt, **kw)


@pytest.fixture()
def prepared(spark, tmp_path):
    rng = np.random.RandomState(7)
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    base_rows = _vecs(rng, 40)
    base = spark.createDataFrame(
        base_rows, "vec_id long, embedding array<double>"
    )
    prepare_ann_state(
        spark, base, state, n_centroids=4, m=4, n_codes=8, state_buckets=8
    )
    return rng, src, state, ckpt, base_rows


# ---------------------------------------------------------------- verdict #1


def test_disjointness_guard_reads_only_touched_ibuckets(spark, prepared):
    """The guard's stored-ids read (the exact `_read_epoch_state` call the
    driver makes) touches ONLY the batch's id-bucket partitions of the
    ids/ sidecar — round-9 verdict #1's bounded-I/O contract, asserted
    the same way as the near-dup verification reads: partition filters in
    the plan AND `input_file_name()` at execution."""
    from syncmaven_spark.streaming.incremental import (
        _id_bucket,
        _read_epoch_state,
    )

    rng, src, state, ckpt, base_rows = prepared
    _write_vecs(spark, src, _vecs(rng, 12, start=100))
    _run(spark, src, state, ckpt)

    ids_dir = os.path.join(state, "ids")
    # pick two buckets' worth of ids as "the next batch"
    all_ids = spark.read.parquet(ids_dir)
    two_buckets = [
        r.vec_id
        for r in all_ids.filter(F.col("ibucket").isin([1, 4])).collect()
    ]
    assert two_buckets, "fixture produced no ids in buckets 1/4"
    batch = spark.createDataFrame(
        [(i,) for i in two_buckets], "vec_id long"
    )
    ib_vals = [
        r[0]
        for r in batch.select(
            _id_bucket("vec_id", 8).alias("b")
        ).distinct().collect()
    ]
    assert set(ib_vals) == {1, 4}
    pruned = _read_epoch_state(
        spark, ids_dir, ["vec_id"], "vec_id long", epoch_id=1,
        bucket_vals=ib_vals, bucket_col="ibucket",
    )
    read_files = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    all_files = {
        r[0] for r in all_ids.select(F.input_file_name()).distinct().collect()
    }
    assert 0 < len(read_files) < len(all_files)
    assert all("ibucket=1" in f or "ibucket=4" in f for f in read_files)
    # and the pruned read's rows are exactly those buckets' stored ids
    expected = {
        r.vec_id
        for r in all_ids.filter(
            F.col("ibucket").isin([1, 4]) & (F.col("epoch") < 1)
        ).collect()
    }
    assert {r.vec_id for r in pruned.collect()} == expected


def test_reingested_base_id_fails_fast_after_compaction(spark, prepared):
    """The sidecar keeps the guard sound through compaction: after the
    live ids/ epoch dirs fold into the base, a batch re-ingesting an id
    from the ORIGINAL base corpus still fails fast (the pruned read sees
    epoch=-1), and a disjoint batch still appends."""
    rng, src, state, ckpt, base_rows = prepared
    for i in range(2):
        _write_vecs(spark, src, _vecs(rng, 10, start=100 + 50 * i))
        _run(spark, src, state, ckpt)
    folded = compact_state(spark, state, up_to_epoch=1)
    assert folded["ids"] == 1 and folded["store"] == 1

    _write_vecs(spark, src, [base_rows[0]])  # id 0: in the compacted base
    with pytest.raises(Exception, match="re-ingest"):
        _run(spark, src, state, ckpt)
    # state watermark untouched by the failed epoch
    epochs = json.load(open(os.path.join(state, "epochs.json")))
    assert epochs["max_epoch"] == 1


def test_ids_sidecar_matches_store_ids_exactly(spark, prepared):
    """Every epoch's ids/ rows are exactly the store's ids for that epoch
    (usable rows only — unusable vectors appear in neither), so the guard
    and the store can never drift apart."""
    rng, src, state, ckpt, base_rows = prepared
    batch = _vecs(rng, 10, start=100)
    batch.append((999, None))  # unusable: stored nowhere, guarded nowhere
    _write_vecs(spark, src, batch)
    _run(spark, src, state, ckpt)

    store_ids = {
        r.vec_id
        for r in spark.read.parquet(os.path.join(state, "store")).collect()
    }
    sidecar_ids = {
        r.vec_id
        for r in spark.read.parquet(os.path.join(state, "ids")).collect()
    }
    assert sidecar_ids == store_ids
    assert 999 not in sidecar_ids
    assert len(sidecar_ids) == 50  # 40 base + 10 usable batch rows


def test_driver_rejects_pre_sidecar_state(spark, prepared, tmp_path):
    """A state prepared before the ids-sidecar layout (no state_buckets in
    recipe.json) gets the dedicated rebuild message, not a silent
    unbounded-guard run or a confusing missing-directory error."""
    rng, src, state, ckpt, _ = prepared
    recipe_path = os.path.join(state, "recipe.json")
    recipe = json.load(open(recipe_path))
    del recipe["state_buckets"]
    with open(recipe_path, "w") as f:
        json.dump(recipe, f)
    _write_vecs(spark, src, _vecs(rng, 5, start=100))
    with pytest.raises(ValueError, match="state_buckets"):
        _run(spark, src, state, ckpt)


# ---------------------------------------------------------------- verdict #2


def _sign_combo_rows(rng, U, n_reps, start, noise=0.01):
    """All 16 sign-combinations of four 2-dim subvectors (subspace 0
    scaled 2×), repeated n_reps times with tiny noise — a corpus whose
    subvectors the PQ codebooks capture exactly (recon_cos ≈ 1) while
    the 2 coarse centroids only explain the dominant subspace
    (cell_cos ≈ 2/√7 ≈ 0.76)."""
    rows = []
    i = start
    for _rep in range(n_reps):
        for bits in range(16):
            parts = []
            for j in range(4):
                s = 1.0 if (bits >> j) & 1 else -1.0
                mag = 2.0 if j == 0 else 1.0
                parts.append(s * mag * U[j] + noise * rng.randn(2))
            rows.append((i, [float(x) for x in np.concatenate(parts)]))
            i += 1
    return rows


def _collapsed_rows(rng, U, n, start, noise=0.01):
    """Vectors collapsed onto the coarse-centroid directions (±2·u₀, 0, 0,
    0): cell_cos RISES to ~1.0 while recon_cos FALLS to ~2/√7 — the shift
    the cell gate alone blesses but reconstruction drift catches."""
    rows = []
    for k in range(n):
        s = 1.0 if k % 2 == 0 else -1.0
        v = np.concatenate(
            [s * 2.0 * U[0] + noise * rng.randn(2)]
            + [noise * rng.randn(2) for _ in range(3)]
        )
        rows.append((start + k, [float(x) for x in v]))
    return rows


@pytest.fixture()
def structured_state(spark, tmp_path):
    rng = np.random.RandomState(3)
    U = []
    for _ in range(4):
        a = rng.randn(2)
        U.append(a / np.linalg.norm(a))
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    base = spark.createDataFrame(
        _sign_combo_rows(rng, U, n_reps=4, start=0),
        "vec_id long, embedding array<double>",
    )
    prepare_ann_state(
        spark, base, state, n_centroids=2, m=4, n_codes=4, state_buckets=8
    )
    return rng, U, src, state, ckpt


def test_recon_gate_trips_where_cell_gate_alone_would_not(
    spark, structured_state
):
    """Round-9 verdict #2's done-criterion: a shifted batch whose PQ
    reconstruction record falls while cell drift alone would NOT have
    tripped. The collapse-toward-centroids shift makes mean_cell_cos
    RISE (≈1.0, measured 0.9999) while mean_recon_cos falls ≈0.76 —
    running with only the cell gate appends; adding the recon gate
    raises."""
    rng, U, src, state, ckpt = structured_state

    # fresh same-distribution batch passes BOTH gates
    _write_vecs(spark, src, _sign_combo_rows(rng, U, n_reps=1, start=1000))
    _run(
        spark, src, state, ckpt,
        min_mean_cell_cos=0.6, min_mean_recon_cos=0.9,
    )
    rec = json.load(open(os.path.join(state, "epochs.json")))["drift"]["0"]
    assert rec["mean_recon_cos"] > 0.95
    assert 0.6 < rec["mean_cell_cos"] < 0.9

    # collapsed batch: the cell gate ALONE blesses it... (fresh copy of
    # the state + a fresh checkpoint, so the batch lands as its epoch 0,
    # overwriting the record — the gates are what's under test)
    ckpt2, src2 = ckpt + "_2", src + "_2"
    _write_vecs(spark, src2, _collapsed_rows(rng, U, 32, start=2000))
    shutil.copytree(state, state + "_cellonly")
    _run(
        spark, src2, state + "_cellonly", ckpt2, min_mean_cell_cos=0.6
    )
    rec2 = json.load(
        open(os.path.join(state + "_cellonly", "epochs.json"))
    )["drift"]["0"]
    assert rec2["mean_cell_cos"] > 0.95  # looks HEALTHIER than baseline
    assert rec2["mean_recon_cos"] < 0.85  # while codes degrade

    # ...but the recon gate catches it (foreachBatch errors surface
    # wrapped in StreamingQueryException)
    with pytest.raises(Exception, match="reconstruction cosine"):
        _run(
            spark, src2, state, ckpt + "_3",
            min_mean_cell_cos=0.6, min_mean_recon_cos=0.9,
        )


def test_drift_history_carries_both_halves(spark, prepared):
    """read_ann_drift returns the recon columns alongside the cell
    columns, one row per non-empty epoch, generation 0 for a
    never-reindexed state."""
    rng, src, state, ckpt, _ = prepared
    for i in range(2):
        _write_vecs(spark, src, _vecs(rng, 10, start=100 + 50 * i))
        _run(spark, src, state, ckpt)
    hist = read_ann_drift(spark, state).orderBy("epoch").collect()
    assert [r.epoch for r in hist] == [0, 1]
    for r in hist:
        assert r.generation == 0
        assert r.n_vectors == 10
        assert -1.0 <= r.mean_recon_cos <= 1.0
        assert r.min_recon_cos <= r.p10_recon_cos <= r.mean_recon_cos


def test_pq_drift_assigned_matches_pq_drift(spark, testdata):
    """pq_drift_assigned over ivf_append's assignment rows equals
    pq_drift over the raw batch — both modes (raw ignores the cell;
    residual commits to the same argmax assignment pq_drift recomputes),
    so the driver's wiring measures exactly what the operator defines."""
    from syncmaven_spark.operators import (
        ivf_append,
        ivf_index,
        pq_drift,
        pq_drift_assigned,
        pq_train,
    )

    emb = testdata["embeddings"].limit(200)
    _assignments, cents = ivf_index(emb, n_centroids=4)
    books = pq_train(emb, m=8, n_codes=16)
    assigned = ivf_append(emb, cents)

    raw_direct = pq_drift(emb, books).first()
    raw_assigned = pq_drift_assigned(assigned, cents, books).first()
    assert raw_direct.asDict() == raw_assigned.asDict()

    res_direct = pq_drift(emb, books, centroids_df=cents).first()
    res_assigned = pq_drift_assigned(
        assigned, cents, books, encode_residuals=True
    ).first()
    assert res_direct.asDict() == res_assigned.asDict()


# ---------------------------------------------------------------- verdict #4


def test_maybe_compact_cadence_and_deep_escalation(spark, prepared):
    """Driver-integration for the opt-in cadence: additive folds happen
    at the configured epoch cadence (store AND ids dirs bounded), the
    deep threshold escalates to a base rewrite, and probes stay green
    throughout."""
    rng, src, state, ckpt, base_rows = prepared
    queries = spark.createDataFrame(
        base_rows[:3], "vec_id long, embedding array<double>"
    )
    for i in range(4):
        _write_vecs(spark, src, _vecs(rng, 8, start=100 + 50 * i))
        _run(
            spark, src, state, ckpt,
            compact_every_n_epochs=2,
            deep_compact_max_partition_files=10_000,  # never deep here
        )
        assert probe_ann_store(
            spark, queries, state, k=3, n_probe=4
        ).count() == 9
    # cadence fired at epochs 2 (folding 0,1) — live dirs stay bounded
    epochs = json.load(open(os.path.join(state, "epochs.json")))
    assert epochs["compacted_up_to"] == 2
    store_dirs = {
        n for n in os.listdir(os.path.join(state, "store"))
        if n.startswith("epoch=")
    }
    ids_dirs = {
        n for n in os.listdir(os.path.join(state, "ids"))
        if n.startswith("epoch=")
    }
    assert store_dirs == ids_dirs == {"epoch=-1", "epoch=2", "epoch=3"}

    # below cadence → no-op, no Spark job
    assert maybe_compact(spark, state, every_n_epochs=100) is None
    # deep threshold of 1 file per partition always trips → deep report
    report = maybe_compact(
        spark, state, every_n_epochs=1, deep_when_max_partition_files=1
    )
    assert report["store"]["base_files"] > 0
    assert "base_files_max_partition" in report["ids"]
    assert probe_ann_store(
        spark, queries, state, k=3, n_probe=4
    ).count() == 9
    # the streamed rows all survived the folds
    n = spark.read.parquet(os.path.join(state, "store")).count()
    assert n == 40 + 4 * 8


def test_maybe_compact_noop_without_epochs(spark, tmp_path):
    """A state that never processed an epoch (or isn't a state at all) is
    a no-op, not an error — safe to call unconditionally per epoch."""
    assert maybe_compact(spark, str(tmp_path / "nope")) is None


# ---------------------------------------------------------------- verdict #6


def test_reindex_after_tripped_gate(spark, structured_state):
    """The full remedy loop: gate trips → reindex_ann_state into a fresh
    dir (fresh codebooks over the full corpus) → the NEW state accepts
    the batch the old gate refused, and the drift history that showed
    the slide is carried forward under a prior generation."""
    rng, U, src, state, ckpt = structured_state

    _write_vecs(spark, src, _sign_combo_rows(rng, U, n_reps=1, start=1000))
    _run(spark, src, state, ckpt, min_mean_recon_cos=0.9)

    shifted = _collapsed_rows(rng, U, 32, start=2000)
    _write_vecs(spark, src + "_2", shifted)
    with pytest.raises(Exception, match="reconstruction cosine"):
        _run(
            spark, src + "_2", state, ckpt + "_2", min_mean_recon_cos=0.9
        )

    # retrain over the FULL corpus (old base + streamed + the shifted
    # batch that now belongs to the distribution)
    base = spark.createDataFrame(
        _sign_combo_rows(np.random.RandomState(3), U, 4, 0),
        "vec_id long, embedding array<double>",
    )
    full = base.unionByName(spark.read.parquet(src)).unionByName(
        spark.read.parquet(src + "_2")
    )
    state2 = state + "_v2"
    report = reindex_ann_state(spark, full, state, state2)
    assert report["old_n_ids"] == 64 + 16
    assert report["new_n_ids"] == 64 + 16 + 32

    # history carried: generation 0 = the old state's epochs, and the
    # new state is ready for its own epoch 0
    hist = read_ann_drift(spark, state2).collect()
    assert {(r.generation, r.epoch) for r in hist} == {(0, 0)}
    _write_vecs(spark, src + "_3", _collapsed_rows(rng, U, 16, start=5000))
    _run(
        spark, src + "_3", state2, ckpt + "_3", min_mean_recon_cos=0.9
    )
    hist2 = read_ann_drift(spark, state2).collect()
    assert {(r.generation, r.epoch) for r in hist2} == {(0, 0), (1, 0)}
    # and the reindexed store probes green over old AND new ids
    queries = spark.createDataFrame(
        shifted[:3], "vec_id long, embedding array<double>"
    )
    assert probe_ann_store(
        spark, queries, state2, k=3, n_probe=2
    ).count() == 9


def test_reindex_parity_failure_removes_new_state(spark, prepared):
    """A corpus missing stored rows fails the id-parity check, and the
    half-built new state is removed — a parity-failed store must not be
    probed as if migrated."""
    rng, src, state, ckpt, base_rows = prepared
    partial = spark.createDataFrame(
        base_rows[:30], "vec_id long, embedding array<double>"
    )
    state2 = state + "_v2"
    with pytest.raises(ValueError, match="missing stored rows"):
        reindex_ann_state(spark, partial, state, state2)
    assert not os.path.exists(state2)


def test_reindex_chains_three_generations(spark, prepared):
    """A reindex of a reindexed state keeps the WHOLE trend: generation
    g's prior chain carries every earlier generation's per-epoch records,
    so read_ann_drift shows the full history across two retrains."""
    rng, src, state, ckpt, base_rows = prepared
    _write_vecs(spark, src, _vecs(rng, 10, start=100))
    _run(spark, src, state, ckpt)

    base = spark.createDataFrame(
        base_rows, "vec_id long, embedding array<double>"
    )
    full = base.unionByName(spark.read.parquet(src))
    state2, state3 = state + "_v2", state + "_v3"
    reindex_ann_state(spark, full, state, state2)
    # generation 1 processes its own epoch before the second retrain
    _write_vecs(spark, src + "_2", _vecs(rng, 10, start=300))
    _run(spark, src + "_2", state2, ckpt + "_2")
    full2 = full.unionByName(spark.read.parquet(src + "_2"))
    reindex_ann_state(spark, full2, state2, state3)

    hist = read_ann_drift(spark, state3).collect()
    assert {(r.generation, r.epoch) for r in hist} == {(0, 0), (1, 0)}
    assert all(r.n_vectors == 10 for r in hist)
    # and the third-generation state is live: it takes its own epochs
    _write_vecs(spark, src + "_3", _vecs(rng, 10, start=500))
    _run(spark, src + "_3", state3, ckpt + "_3")
    hist3 = read_ann_drift(spark, state3).collect()
    assert {(r.generation, r.epoch) for r in hist3} == {
        (0, 0), (1, 0), (2, 0)
    }


def test_reindex_upgrades_pre_sidecar_state(spark, prepared):
    """The driver's pre-sidecar refusal names reindex_ann_state as the
    remedy — so reindexing a state whose recipe predates state_buckets
    must produce a sidecar-bearing state the driver accepts."""
    rng, src, state, ckpt, base_rows = prepared
    recipe_path = os.path.join(state, "recipe.json")
    recipe = json.load(open(recipe_path))
    del recipe["state_buckets"]
    with open(recipe_path, "w") as f:
        json.dump(recipe, f)

    base = spark.createDataFrame(
        base_rows, "vec_id long, embedding array<double>"
    )
    state2 = state + "_v2"
    reindex_ann_state(spark, base, state, state2)
    new_recipe = json.load(open(os.path.join(state2, "recipe.json")))
    assert new_recipe["state_buckets"] > 0
    assert os.path.isdir(os.path.join(state2, "ids"))
    _write_vecs(spark, src, _vecs(rng, 5, start=100))
    _run(spark, src, state2, ckpt)  # the upgraded state streams fine


def test_reindex_rejects_duplicate_corpus_ids(spark, prepared):
    """A caller-assembled reindex corpus that repeats an id (e.g. a batch
    re-supplied twice) would put two differently-coded rows in the fresh
    base — probes turn nondeterministic with zero errors; the migration
    fails fast and removes the half-built state instead."""
    rng, src, state, ckpt, base_rows = prepared
    doubled = spark.createDataFrame(
        base_rows + base_rows[:5], "vec_id long, embedding array<double>"
    )
    state2 = state + "_v2"
    with pytest.raises(ValueError, match="duplicate store row"):
        reindex_ann_state(spark, doubled, state, state2)
    assert not os.path.exists(state2)


def test_reindex_rejects_unknown_override(spark, prepared):
    rng, src, state, ckpt, base_rows = prepared
    base = spark.createDataFrame(
        base_rows, "vec_id long, embedding array<double>"
    )
    with pytest.raises(TypeError, match="unknown recipe override"):
        reindex_ann_state(
            spark, base, state, state + "_v2", n_probe=7
        )


# ------------------------------------------------------------ round-9 advice


def test_prepare_crash_leaves_no_partial_state_and_retry_succeeds(
    spark, tmp_path, monkeypatch
):
    """Round-9 advice: a crash mid-prepare must not leave a partial state
    the already-holds guard can't classify. Inject a crash after the
    parquet writes but before recipe.json: state_dir never appears, and
    an unmodified retry succeeds (the stale tmp dir is disposable)."""
    import syncmaven_spark.streaming.ann as ann_mod

    rng = np.random.RandomState(7)
    state = str(tmp_path / "state")
    base = spark.createDataFrame(
        _vecs(rng, 40), "vec_id long, embedding array<double>"
    )

    real_write = ann_mod._atomic_write_json

    def boom(path, payload):
        raise RuntimeError("injected crash before recipe.json")

    monkeypatch.setattr(ann_mod, "_atomic_write_json", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        prepare_ann_state(
            spark, base, state, n_centroids=4, m=4, n_codes=8
        )
    assert not os.path.exists(state)  # nothing partial installed
    tmp_dirs = [
        n for n in os.listdir(tmp_path) if n.startswith(".prepare_tmp_")
    ]
    assert tmp_dirs  # the crash residue is the disposable tmp only

    monkeypatch.setattr(ann_mod, "_atomic_write_json", real_write)
    prepare_ann_state(spark, base, state, n_centroids=4, m=4, n_codes=8)
    assert os.path.exists(os.path.join(state, "recipe.json"))
    assert not any(
        n.startswith(".prepare_tmp_") for n in os.listdir(tmp_path)
    )
    queries = base.limit(2)
    assert probe_ann_store(
        spark, queries, state, k=3, n_probe=4
    ).count() == 6


def test_prepare_refuses_foreign_nonempty_dir(spark, tmp_path):
    """A non-empty recipe-less target gets the dedicated 'not a prepared
    state' message instead of Spark's 'path already exists' mid-build."""
    rng = np.random.RandomState(7)
    state = tmp_path / "state"
    state.mkdir()
    (state / "stray.txt").write_text("x")
    base = spark.createDataFrame(
        _vecs(rng, 10), "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not a prepared state"):
        prepare_ann_state(spark, base, str(state))


def test_assign_codes_slabbed_is_bit_identical(monkeypatch):
    """The slabbed in-place assignment kernel (round-10: pq_train's Lloyd
    loop cost fell 25.8 → 8.3 s at sf0.1) must be BIT-identical to the
    un-slabbed reference form ``argmin(c² − 2·scores)`` — the recall
    floors and every checksum stamp are pinned against those exact
    codebooks. Forces multiple slab boundaries (including a slab size
    that doesn't divide n) via a tiny byte cap."""
    import numpy as np

    import syncmaven_spark.operators.pq as pq_mod

    rng = np.random.RandomState(0)
    Xn = rng.randn(997, 64)  # prime row count: slabs never divide evenly
    Xn /= np.linalg.norm(Xn, axis=1, keepdims=True)
    books = rng.randn(32, 16, 2)

    def reference(Xn, books):
        m, n_codes, sub_dim = books.shape
        Xs = np.ascontiguousarray(Xn.reshape(len(Xn), m, sub_dim))
        c2 = (books * books).sum(axis=2)
        scores = np.einsum("njs,jcs->njc", Xs, books, optimize=False)
        return np.argmin(c2[None, :, :] - 2.0 * scores, axis=2)

    expected = reference(Xn, books)
    # one big slab (the n < slab path) ...
    assert np.array_equal(pq_mod._assign_codes(Xn, books), expected)
    # ... and many tiny slabs (37 rows per slab at this recipe)
    monkeypatch.setattr(pq_mod, "_ASSIGN_SLAB_BYTES", 37 * 32 * 16 * 8)
    assert np.array_equal(pq_mod._assign_codes(Xn, books), expected)


def test_pq_probe_warns_once_per_chunked_probe(spark, testdata, monkeypatch):
    """Round-9 advice: auto-chunking silently multiplied the codes-table
    scan count. With the LUT cap shrunk so 8 queries need multiple ADC
    passes, both probes emit a UserWarning naming the scan count — and
    the chunked results still match the unchunked ones."""
    import syncmaven_spark.operators.pq as pq_mod
    from syncmaven_spark.operators import (
        ivfpq_index,
        ivfpq_probe,
        pq_encode,
        pq_probe,
        pq_train,
    )

    emb = testdata["embeddings"].limit(100)
    queries = emb.limit(8)
    books = pq_train(emb, m=4, n_codes=16)
    codes = pq_encode(emb, books)
    baseline = set(
        map(tuple, pq_probe(queries, codes, books, k=3).collect())
    )

    monkeypatch.setattr(pq_mod, "LUT_BYTES_CAP", 4 * 16 * 8 * 3)  # 3 q/chunk
    with pytest.warns(UserWarning, match="3 scans of the codes table"):
        chunked = set(
            map(tuple, pq_probe(queries, codes, books, k=3).collect())
        )
    assert chunked == baseline

    cells_codes, cents, books2 = ivfpq_index(
        emb, n_centroids=4, m=4, n_codes=16
    )
    with pytest.warns(UserWarning, match="ivfpq_probe"):
        ivfpq_probe(
            queries, cells_codes, cents, books2, k=3, n_probe=2
        ).collect()
