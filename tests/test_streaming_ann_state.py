"""Round-9 streaming ANN ingestion (verdict #3): the IVF-PQ family wired
into the epoch-dir state layout — prepare → stream appends → probe, with
the same 3-batch ≡ one-shot property, replay idempotence, drift records,
codebook fail-fasts and compaction as the near-dup family drivers."""

import json
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from syncmaven_spark.streaming import (
    compact_state,
    prepare_ann_state,
    probe_ann_store,
    read_ann_store,
    run_streaming_ann_sync,
)


def _vecs(rng, n, start=0, dim=8):
    X = rng.randn(n, dim)
    return [(start + i, [float(v) for v in X[i]]) for i in range(n)]


def _write_vecs(spark, src, rows):
    spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(
        1
    ).write.mode("append").parquet(src)


def _drop_latest_commit(ckpt):
    commits = os.path.join(ckpt, "commits")
    latest = max((n for n in os.listdir(commits) if n.isdigit()), key=int)
    os.remove(os.path.join(commits, latest))
    crc = os.path.join(commits, f".{latest}.crc")
    if os.path.exists(crc):
        os.remove(crc)


@pytest.fixture()
def prepared(spark, tmp_path):
    """A prepared state over a 40-vector base corpus plus the src/ckpt
    dirs and the rng used to generate further batches."""
    rng = np.random.RandomState(7)
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    base_rows = _vecs(rng, 40)
    base = spark.createDataFrame(
        base_rows, "vec_id long, embedding array<double>"
    )
    prepare_ann_state(
        spark, base, state, n_centroids=4, m=4, n_codes=8
    )
    return rng, src, state, ckpt, base_rows


def _run(spark, src, state, ckpt, **kw):
    schema = spark.read.parquet(src).schema
    run_streaming_ann_sync(spark, src, schema, state, ckpt, **kw)


def test_three_batches_equal_one_shot_frozen_codebooks(spark, prepared):
    """Appends accumulated over THREE micro-batches probe identically to a
    one-shot assignment of the full corpus under the SAME frozen
    codebooks (the operator-level union property, asserted through the
    whole driver + state layout)."""
    from syncmaven_spark.operators import ivfpq_append, ivfpq_probe

    rng, src, state, ckpt, base_rows = prepared
    batches = [_vecs(rng, 10, start=100 + 50 * i) for i in range(3)]
    for b in batches:
        _write_vecs(spark, src, b)
        _run(spark, src, state, ckpt)

    queries = spark.createDataFrame(
        base_rows[:5], "vec_id long, embedding array<double>"
    )
    got = {
        (r.q_id, r.n_id, r.approx_sim, r.rank)
        for r in probe_ann_store(
            spark, queries, state, k=4, n_probe=4
        ).collect()
    }

    # one-shot reference: every row (base + all batches) assigned under
    # the stored frozen codebooks
    cells_codes, cents, books = read_ann_store(spark, state)
    all_rows = base_rows + [r for b in batches for r in b]
    full = ivfpq_append(
        spark.createDataFrame(
            all_rows, "vec_id long, embedding array<double>"
        ),
        cents, books,
    )
    ref = {
        (r.q_id, r.n_id, r.approx_sim, r.rank)
        for r in ivfpq_probe(
            queries, full, cents, books, k=4, n_probe=4
        ).collect()
    }
    assert got == ref
    # the streamed store holds every row exactly once
    assert cells_codes.count() == len(all_rows)
    assert cells_codes.select("vec_id").distinct().count() == len(all_rows)

    # drift recorded per epoch, watermark advanced
    with open(os.path.join(state, "epochs.json"), encoding="utf-8") as f:
        epochs = json.load(f)
    assert epochs["max_epoch"] == 2
    assert set(epochs["drift"]) == {"0", "1", "2"}
    for rec in epochs["drift"].values():
        assert rec["n_vectors"] == 10
        assert -1.0 <= rec["mean_cell_cos"] <= 1.0
    # ... and reads back as the trend DataFrame
    from syncmaven_spark.streaming import read_ann_drift

    hist = read_ann_drift(spark, state).orderBy("epoch").collect()
    assert [r.epoch for r in hist] == [0, 1, 2]
    assert all(r.n_vectors == 10 for r in hist)
    assert all(
        r.min_cell_cos <= r.p10_cell_cos <= r.mean_cell_cos for r in hist
    )


def test_replayed_epoch_rewrites_idempotently(spark, prepared):
    """Crash between the state write and the offset commit: the replayed
    epoch must pass the disjointness guard (its own prior write is
    excluded) and rewrite the identical rows once — no duplicates, no
    loss."""
    rng, src, state, ckpt, base_rows = prepared
    _write_vecs(spark, src, _vecs(rng, 10, start=100))
    _run(spark, src, state, ckpt)
    _write_vecs(spark, src, _vecs(rng, 10, start=200))
    _run(spark, src, state, ckpt)

    store = spark.read.parquet(os.path.join(state, "store"))
    before = sorted(
        (r.vec_id, int(r.cell), tuple(r.codes)) for r in store.collect()
    )
    _drop_latest_commit(ckpt)
    _run(spark, src, state, ckpt)
    after = sorted(
        (r.vec_id, int(r.cell), tuple(r.codes))
        for r in spark.read.parquet(os.path.join(state, "store")).collect()
    )
    assert after == before


def test_reingested_id_fails_fast(spark, prepared):
    """A source file re-delivering a stored id (outside Spark's own
    file-level exactly-once) trips the eager disjointness guard."""
    rng, src, state, ckpt, base_rows = prepared
    _write_vecs(spark, src, [base_rows[0]])  # vec_id 0 already in the base
    # foreachBatch errors surface wrapped in StreamingQueryException
    with pytest.raises(Exception, match="re-ingests id"):
        _run(spark, src, state, ckpt)
    # with the guard explicitly off the batch appends (documented opt-out)
    src2, ckpt2 = src + "2", ckpt + "2"
    _write_vecs(spark, src2, _vecs(rng, 3, start=500))
    _run(spark, src2, state, ckpt2, assert_new_ids=False)


def test_drift_gate_blocks_shifted_batch(spark, prepared):
    """min_mean_cell_cos turns the per-epoch drift record into a retrain
    gate: a batch far from the training distribution raises BEFORE
    appending, and the store is left untouched."""
    rng, src, state, ckpt, base_rows = prepared
    # vectors orthogonal-ish to the training distribution: huge offset in
    # one coordinate makes the assigned-cell cosine collapse
    rows = [
        (900 + i, [float(v) for v in (rng.randn(8) + [50, 0, 0, 0, 0, 0, 0, 0])])
        for i in range(5)
    ]
    _write_vecs(spark, src, rows)
    n_before = spark.read.parquet(os.path.join(state, "store")).count()
    with pytest.raises(Exception, match="retrain gate"):
        _run(spark, src, state, ckpt, min_mean_cell_cos=0.9)
    assert (
        spark.read.parquet(os.path.join(state, "store")).count() == n_before
    )


def test_codebook_swap_fails_fast(spark, prepared, tmp_path):
    """Repointing the state at different/retrained codebooks must refuse
    before any row is appended under the wrong quantizer."""
    rng, src, state, ckpt, base_rows = prepared
    other = spark.createDataFrame(
        _vecs(np.random.RandomState(99), 40), "vec_id long, embedding array<double>"
    )
    state2 = str(tmp_path / "state2")
    prepare_ann_state(spark, other, state2, n_centroids=4, m=4, n_codes=8)
    shutil.rmtree(os.path.join(state, "centroids"))
    shutil.copytree(
        os.path.join(state2, "centroids"), os.path.join(state, "centroids")
    )
    _write_vecs(spark, src, _vecs(rng, 5, start=300))
    with pytest.raises(ValueError, match="checksums recorded at prepare"):
        _run(spark, src, state, ckpt)
    with pytest.raises(ValueError, match="checksums recorded at prepare"):
        read_ann_store(spark, state)


def test_prepare_refuses_existing_state(spark, prepared):
    rng, src, state, ckpt, base_rows = prepared
    df = spark.createDataFrame(
        _vecs(rng, 5), "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="already holds"):
        prepare_ann_state(spark, df, state)


def test_family_mismatch_fails_fast(spark, tmp_path):
    """Pointing the ANN driver at a near-dup state (or vice versa) is a
    recipe-family error, not silent garbage."""
    from syncmaven_spark.streaming import run_streaming_near_dup_sync

    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    docs = [(1, "the quick brown fox jumps over the lazy dog tonight")]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(src)
    schema = spark.read.parquet(src).schema
    run_streaming_near_dup_sync(
        spark, src, schema, state, ckpt, threshold=0.5, max_bucket_size=None
    )
    with pytest.raises(ValueError, match="family"):
        run_streaming_ann_sync(
            spark, src, schema, state, str(ckpt) + "2"
        )


def test_compaction_folds_store_and_deep_pass_shrinks_files(spark, prepared):
    """compact_state treats the ANN store as a first-class table: the
    additive pass folds live epochs into the epoch=-1 base preserving the
    cell layout and identical probe results; the deep pass
    (rewrite_base=True) rewrites the accreted base into fewer files and
    reports per-table file counts."""
    rng, src, state, ckpt, base_rows = prepared
    for i in range(3):
        _write_vecs(spark, src, _vecs(rng, 10, start=100 + 50 * i))
        _run(spark, src, state, ckpt)

    queries = spark.createDataFrame(
        base_rows[:5], "vec_id long, embedding array<double>"
    )
    before = {
        (r.q_id, r.n_id, r.approx_sim, r.rank)
        for r in probe_ann_store(spark, queries, state, k=4, n_probe=4).collect()
    }
    folded = compact_state(spark, state, up_to_epoch=2)
    assert folded["store"] == 2
    store_dir = os.path.join(state, "store")
    assert os.path.isdir(os.path.join(store_dir, "epoch=-1"))
    assert not os.path.isdir(os.path.join(store_dir, "epoch=0"))
    assert os.path.isdir(os.path.join(store_dir, "epoch=2"))  # latest kept
    assert any(
        d.startswith("cell=")
        for d in os.listdir(os.path.join(store_dir, "epoch=-1"))
    )
    after = {
        (r.q_id, r.n_id, r.approx_sim, r.rank)
        for r in probe_ann_store(spark, queries, state, k=4, n_probe=4).collect()
    }
    assert after == before

    # accrete once more (second additive fold), then deep-compact: the
    # base's file count must SHRINK and the report must say so
    _write_vecs(spark, src, _vecs(rng, 10, start=400))
    _run(spark, src, state, ckpt)
    compact_state(spark, state, up_to_epoch=3)
    mid = {
        (r.q_id, r.n_id, r.approx_sim, r.rank)
        for r in probe_ann_store(spark, queries, state, k=4, n_probe=4).collect()
    }

    def _base_files():
        n = 0
        for root, _d, files in os.walk(os.path.join(store_dir, "epoch=-1")):
            n += sum(
                1 for f in files if f != "_SUCCESS" and not f.startswith(".")
            )
        return n

    accreted = _base_files()
    report = compact_state(spark, state, up_to_epoch=3, rewrite_base=True)
    assert report["store"]["base_files"] == _base_files()
    assert report["store"]["base_files"] < accreted
    assert report["store"]["folded_dirs"] == 1  # the base itself re-folded
    assert report["store"]["base_files_max_partition"] >= 1
    final = {
        (r.q_id, r.n_id, r.approx_sim, r.rank)
        for r in probe_ann_store(spark, queries, state, k=4, n_probe=4).collect()
    }
    assert final == mid


def test_deep_compaction_crash_recovery_preserves_rows(
    spark, tmp_path, monkeypatch
):
    """Round-9 review #1 (the silent-data-loss window): the deep pass
    deletes the old base BEFORE installing the rewrite, so a crash in
    that window leaves the folded rows' ONLY copy in the tmp dir with a
    mode=deep journal. Recovery must install tmp atomically — the
    additive recovery path (merge into a fold-listed dir after rmtree'ing
    it) would have destroyed the rows."""
    import os as _os

    import syncmaven_spark.streaming.incremental as inc

    state = str(tmp_path / "state")
    _os.makedirs(state)
    inc._atomic_write_json(
        _os.path.join(state, "recipe.json"),
        {"layout": inc.STATE_LAYOUT_VERSION, "family": "ivfpq"},
    )
    inc._atomic_write_json(
        _os.path.join(state, "epochs.json"), {"max_epoch": 1}
    )
    store = _os.path.join(state, "store")
    base_rows = [(i, i % 3, [i, i + 1]) for i in range(30)]
    live_rows = [(100 + i, i % 3, [i, i]) for i in range(10)]
    schema = "vec_id long, cell int, codes array<smallint>"
    spark.createDataFrame(base_rows, schema).write.partitionBy(
        "cell"
    ).parquet(_os.path.join(store, "epoch=-1"))
    spark.createDataFrame(live_rows, schema).write.partitionBy(
        "cell"
    ).parquet(_os.path.join(store, "epoch=0"))
    expected = {(r[0], r[1], tuple(r[2])) for r in base_rows + live_rows}

    real_replace = _os.replace

    def crash_before_install(src, dst, *a, **kw):
        if src.endswith(".compact_tmp_store"):
            raise RuntimeError("simulated crash before install")
        return real_replace(src, dst, *a, **kw)

    # incremental.py imports os inside each function, so patching the
    # os module itself reaches every call site
    monkeypatch.setattr("os.replace", crash_before_install)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_state(spark, state, up_to_epoch=1, rewrite_base=True)
    monkeypatch.setattr("os.replace", real_replace)

    # the dangerous window is real: old base and live epoch are GONE,
    # the rows' only copy lives in tmp, the deep journal is pending
    assert not _os.path.isdir(_os.path.join(store, "epoch=-1"))
    assert not _os.path.isdir(_os.path.join(store, "epoch=0"))
    assert _os.path.isdir(_os.path.join(state, ".compact_tmp_store"))
    journal = inc._load_json(
        _os.path.join(state, ".compact_journal_store.json")
    )
    assert journal and journal["mode"] == "deep"

    # consumers refuse mid-surgery state...
    with pytest.raises(ValueError, match="incomplete compaction"):
        read_ann_store(spark, state)
    # ...and a compact_state re-run completes the install with ZERO loss
    report = compact_state(spark, state, up_to_epoch=1, rewrite_base=True)
    got = {
        (r.vec_id, int(r.cell), tuple(r.codes))
        for r in spark.read.parquet(store).collect()
    }
    assert got == expected
    assert not _os.path.exists(
        _os.path.join(state, ".compact_journal_store.json")
    )
    assert report["store"]["base_files"] >= 1


def test_deep_recovery_without_mode_field(spark, tmp_path, monkeypatch):
    """Round-9 review pass 3: recovery derives deep-ness from the fold
    list containing the base path, so a deep journal LACKING the 'mode'
    field still installs by atomic rename — the additive merge path would
    re-open the data-loss window the mode tag was added to close."""
    import os as _os

    import syncmaven_spark.streaming.incremental as inc

    state = str(tmp_path / "state")
    _os.makedirs(state)
    inc._atomic_write_json(
        _os.path.join(state, "recipe.json"),
        {"layout": inc.STATE_LAYOUT_VERSION, "family": "ivfpq"},
    )
    inc._atomic_write_json(
        _os.path.join(state, "epochs.json"), {"max_epoch": 1}
    )
    store = _os.path.join(state, "store")
    rows = [(i, i % 2, [i, i]) for i in range(20)]
    schema = "vec_id long, cell int, codes array<smallint>"
    spark.createDataFrame(rows, schema).write.partitionBy("cell").parquet(
        _os.path.join(store, "epoch=-1")
    )
    expected = {(r[0], r[1], tuple(r[2])) for r in rows}

    real_replace = _os.replace

    def crash(src, dst, *a, **kw):
        if src.endswith(".compact_tmp_store"):
            raise RuntimeError("simulated crash before install")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr("os.replace", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_state(spark, state, up_to_epoch=1, rewrite_base=True)
    monkeypatch.setattr("os.replace", real_replace)

    # strip the mode tag: recovery must still derive deep-ness from the
    # base path sitting in the fold list
    jpath = _os.path.join(state, ".compact_journal_store.json")
    journal = inc._load_json(jpath)
    assert journal["mode"] == "deep"
    del journal["mode"]
    inc._atomic_write_json(jpath, journal)

    compact_state(spark, state, up_to_epoch=1, rewrite_base=True)
    got = {
        (r.vec_id, int(r.cell), tuple(r.codes))
        for r in spark.read.parquet(store).collect()
    }
    assert got == expected
