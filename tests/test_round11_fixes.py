"""Round-11 fixes, each pinned by the scenario that motivated it:

- verdict #1: the ANN drift history's per-batch rewrite is BOUNDED —
  ``epochs.json`` keeps a capped live tail and older records roll into
  append-only ``drift/live/`` segment files, while ``read_ann_drift``
  still returns every epoch (the trend product is unchanged);
- verdict #2: the retrain decision is programmatic — ``recommend_retrain``
  consumes the trend with an outlier-robust Theil–Sen fit (fires on a
  sustained slide, not on a one-batch outlier, not on a healthy stream),
  and ``retrain_on_trend`` wires it as the driver's third gate mode;
- round-10 advice: ``reindex_ann_state`` only removes the freshly built
  state on EXPLICIT parity/duplicate failures (transient verification
  errors leave it reusable — the retry re-verifies without rebuilding);
  ``prepare_ann_state`` fails fast when state_dir is a regular file;
  ``compact_state`` no longer writes a foreign ``thresholds`` key into
  ANN states, and the deep rewrite can be scoped to the tripped tables.
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
    recommend_retrain,
    reindex_ann_state,
    run_streaming_ann_sync,
)
from syncmaven_spark.streaming.ann import _recommend_from_records

from tests.test_round10_fixes import (
    _collapsed_rows,
    _run,
    _sign_combo_rows,
    _vecs,
    _write_vecs,
)


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


def _slide_rows(rng, U, alpha, n, start, noise=0.01):
    """Sign-combo rows blended ``alpha`` of the way toward their own
    collapsed form (±2·u₀, 0, 0, 0): recon_cos declines smoothly with
    alpha — the planted GRADUAL slide the trend gate must catch and the
    static per-batch gates, by construction, each individually bless."""
    rows = []
    for k in range(n):
        bits = k % 16
        parts = []
        for j in range(4):
            s = 1.0 if (bits >> j) & 1 else -1.0
            mag = 2.0 if j == 0 else 1.0
            parts.append(s * mag * U[j])
        v = np.concatenate(parts)
        s0 = 1.0 if bits & 1 else -1.0
        target = np.concatenate([s0 * 2.0 * U[0], np.zeros(6)])
        blended = (1 - alpha) * v + alpha * target + noise * rng.randn(8)
        rows.append((start + k, [float(x) for x in blended]))
    return rows


# ---------------------------------------------------------------- verdict #1


def test_drift_tail_bounded_while_trend_complete(spark, prepared):
    """Stream 9 epochs with drift_tail_epochs=4 (>2× the bound, the
    verdict's done-criterion): epochs.json's live tail plateaus at 4
    records (its byte size stops growing), older records live in
    append-only drift/live segments, and read_ann_drift still returns
    every epoch with both halves intact."""
    rng, src, state, ckpt, _ = prepared
    sizes = []
    for i in range(9):
        _write_vecs(spark, src, _vecs(rng, 6, start=100 + 50 * i))
        _run(spark, src, state, ckpt, drift_tail_epochs=4)
        sizes.append(os.path.getsize(os.path.join(state, "epochs.json")))
    epochs = json.load(open(os.path.join(state, "epochs.json")))
    assert len(epochs["drift"]) == 4
    assert sorted(int(e) for e in epochs["drift"]) == [5, 6, 7, 8]
    # size plateaus once the tail caps: every post-cap size stays within
    # a few bytes of the first capped one (record values vary slightly)
    assert max(sizes[4:]) - min(sizes[4:]) < 100
    segs = os.listdir(os.path.join(state, "drift", "live"))
    assert segs and all(s.startswith("part-") for s in segs)
    hist = read_ann_drift(spark, state).orderBy("epoch").collect()
    assert [r.epoch for r in hist] == list(range(9))
    for r in hist:
        assert r.n_vectors == 6
        assert r.mean_recon_cos is not None
        assert r.mean_cell_cos is not None


def test_reindex_carries_segmented_history(spark, prepared):
    """A reindex of a state WITH rolled segments carries the full trend:
    the new state's prior generation returns every old epoch (segments +
    live tail), the new epochs.json prior chain holds no inline drift
    records (it stays bounded across generations), and a second reindex
    keeps the whole chain."""
    rng, src, state, ckpt, base_rows = prepared
    for i in range(5):
        _write_vecs(spark, src, _vecs(rng, 6, start=100 + 50 * i))
        _run(spark, src, state, ckpt, drift_tail_epochs=2)

    base = spark.createDataFrame(
        base_rows, "vec_id long, embedding array<double>"
    )
    full = base.unionByName(spark.read.parquet(src))
    state2 = state + "_v2"
    reindex_ann_state(spark, full, state, state2)
    hist = read_ann_drift(spark, state2).collect()
    assert {(r.generation, r.epoch) for r in hist} == {
        (0, e) for e in range(5)
    }
    epochs2 = json.load(open(os.path.join(state2, "epochs.json")))
    assert all("drift" not in entry for entry in epochs2["prior"])
    assert os.path.isdir(os.path.join(state2, "drift", "prior=0"))

    # second generation streams (rolling its own tail), then reindexes
    for i in range(3):
        _write_vecs(
            spark, src + "_2", _vecs(rng, 6, start=1000 + 50 * i)
        )
        _run(spark, src + "_2", state2, ckpt + "_2", drift_tail_epochs=2)
    full2 = full.unionByName(spark.read.parquet(src + "_2"))
    state3 = state + "_v3"
    reindex_ann_state(spark, full2, state2, state3)
    hist3 = read_ann_drift(spark, state3).collect()
    assert {(r.generation, r.epoch) for r in hist3} == {
        (0, e) for e in range(5)
    } | {(1, e) for e in range(3)}
    epochs3 = json.load(open(os.path.join(state3, "epochs.json")))
    assert all("drift" not in entry for entry in epochs3["prior"])


def test_segment_roll_crash_window_dedupes(tmp_path):
    """A crash between the segment write and the epochs.json rewrite
    leaves rolled records in BOTH places; the next roll re-covers them in
    an overlapping segment. The merge must return every epoch exactly
    once with its original record."""
    from syncmaven_spark.streaming.ann import (
        _read_drift_segments,
        _roll_drift_segments,
    )

    seg_dir = str(tmp_path / "live")
    drift = {str(e): {"mean_recon_cos": 0.9 - e / 100} for e in range(6)}
    tail = _roll_drift_segments(seg_dir, drift, 3)
    assert sorted(int(e) for e in tail) == [3, 4, 5]
    # crash: epochs.json never rewritten — the un-trimmed dict advances
    drift["6"] = {"mean_recon_cos": 0.84}
    tail2 = _roll_drift_segments(seg_dir, drift, 3)
    assert sorted(int(e) for e in tail2) == [4, 5, 6]
    segs = sorted(os.listdir(seg_dir))
    assert len(segs) == 2  # overlapping ranges, distinct files
    merged = _read_drift_segments(seg_dir)
    merged.update({e: r for e, r in tail2.items()})
    assert sorted(int(e) for e in merged) == list(range(7))
    for e, rec in merged.items():
        assert rec["mean_recon_cos"] == pytest.approx(0.9 - int(e) / 100)


def test_read_drift_segments_skips_tmp_and_foreign_files(tmp_path):
    from syncmaven_spark.streaming.ann import _read_drift_segments

    seg_dir = tmp_path / "live"
    seg_dir.mkdir()
    (seg_dir / "part-0000000000-0000000001.json").write_text(
        json.dumps({"drift": {"0": {"x": 1}, "1": {"x": 2}}})
    )
    (seg_dir / "part-0000000002-0000000002.json.tmp").write_text("{bad")
    (seg_dir / ".hidden.json").write_text("{bad")
    (seg_dir / "notes.txt").write_text("not json")
    assert _read_drift_segments(str(seg_dir)) == {
        "0": {"x": 1}, "1": {"x": 2}
    }
    assert _read_drift_segments(str(tmp_path / "missing")) == {}


# ---------------------------------------------------------------- verdict #2


def _mk_records(values, start_epoch=0):
    return [
        (
            start_epoch + i,
            {"mean_cell_cos": v, "mean_recon_cos": v},
        )
        for i, v in enumerate(values)
    ]


def test_recommend_fires_on_sustained_slide():
    vals = [0.90 - 0.02 * i for i in range(10)]
    rec = _recommend_from_records(
        _mk_records(vals), window=8, min_slope=0.005
    )
    assert rec["retrain"]
    m = rec["metrics"]["mean_recon_cos"]
    assert m["fire"] and "slide" in m["reason"]
    assert m["slope"] == pytest.approx(-0.02, abs=1e-6)


def test_recommend_ignores_one_batch_outlier():
    """The exact construction the docstring argues static gates fail on:
    a healthy stream with ONE collapsed batch. The static gate would
    raise on that batch; the Theil–Sen median barely moves."""
    vals = [0.90] * 5 + [0.30] + [0.90] * 2
    rec = _recommend_from_records(
        _mk_records(vals), window=8, min_slope=0.005, min_level=0.5
    )
    assert not rec["retrain"]
    for m in rec["metrics"].values():
        assert m["reason"] == "healthy"
        assert abs(m["slope"]) < 0.005
        assert m["recent_median"] == pytest.approx(0.9)


def test_recommend_quiet_on_healthy_stream():
    rng = np.random.RandomState(0)
    vals = [0.9 + 0.002 * rng.randn() for _ in range(20)]
    rec = _recommend_from_records(
        _mk_records(vals), window=16, min_slope=0.005, min_level=0.5
    )
    assert not rec["retrain"]


def test_recommend_level_gate_catches_low_plateau():
    """A slide that finished BEFORE the window has slope ≈ 0 — only the
    level gate sees it."""
    vals = [0.40] * 10
    rec = _recommend_from_records(
        _mk_records(vals), window=8, min_slope=0.005, min_level=0.6
    )
    assert rec["retrain"]
    assert "level" in rec["metrics"]["mean_recon_cos"]["reason"]


def test_recommend_needs_full_window():
    rec = _recommend_from_records(
        _mk_records([0.9, 0.5, 0.1]), window=8, min_slope=0.005
    )
    assert not rec["retrain"]
    assert "insufficient history" in rec["metrics"]["mean_cell_cos"]["reason"]
    with pytest.raises(ValueError, match="at least 3"):
        _recommend_from_records([], window=2)


def test_recommend_retrain_is_generation_aware(spark, prepared):
    """The DataFrame wrapper only reads the LATEST generation: a prior
    generation's slide must not leak into a fresh post-retrain window
    (different codebooks — mixing fabricates a slide across the
    migration boundary)."""
    rng, src, state, ckpt, base_rows = prepared
    _write_vecs(spark, src, _vecs(rng, 6, start=100))
    _run(spark, src, state, ckpt)
    drift = read_ann_drift(spark, state)
    rec = recommend_retrain(drift, window=4)
    assert rec["generation"] == 0 and not rec["retrain"]

    # synthesize a two-generation trend: gen 0 slid hard, gen 1 healthy
    rows = [
        (0, e, 10, 0.9 - 0.1 * e, None, None, 0.9 - 0.1 * e, None, None)
        for e in range(8)
    ] + [(1, e, 10, 0.9, None, None, 0.9, None, None) for e in range(4)]
    ddl = (
        "generation int, epoch int, n_vectors long, "
        "mean_cell_cos double, p10_cell_cos double, min_cell_cos double, "
        "mean_recon_cos double, p10_recon_cos double, min_recon_cos double"
    )
    two_gen = spark.createDataFrame(rows, ddl)
    rec2 = recommend_retrain(two_gen, window=4, min_slope=0.01)
    assert rec2["generation"] == 1 and not rec2["retrain"]
    # but the same slide IS caught while generation 0 is still latest
    rec0 = recommend_retrain(
        two_gen.filter("generation = 0"), window=4, min_slope=0.01
    )
    assert rec0["retrain"]


def test_trend_gate_trips_on_gradual_slide_not_outlier(
    spark, structured_state
):
    """Driver integration, mirroring the round-10 recon-gate test's
    construction: five batches sliding smoothly toward collapse trip
    retrain_on_trend (while every individual batch passes a static
    recon gate set below the slide's endpoint), whereas a healthy
    stream with ONE collapsed batch streams through the SAME trend gate
    untripped — the distinction static gates cannot make."""
    rng, U, src, state, ckpt = structured_state
    trend = {"window": 5, "min_slope": 0.01}

    # outlier stream: healthy, one collapsed batch, healthy again
    state2, src2 = state + "_outlier", src + "_outlier"
    shutil.copytree(state, state2)
    for i, alpha in enumerate([0.0, 0.0, 0.0, None, 0.0, 0.0]):
        if alpha is None:
            rows = _collapsed_rows(rng, U, 16, start=5000)
        else:
            rows = _slide_rows(rng, U, alpha, 16, start=2000 + 100 * i)
        _write_vecs(spark, src2, rows)
        _run(
            spark, src2, state2, ckpt + "_outlier",
            retrain_on_trend=trend,
        )  # never raises
    hist = read_ann_drift(spark, state2).orderBy("epoch").collect()
    assert len(hist) == 6
    assert min(r.mean_recon_cos for r in hist) < 0.85  # outlier recorded

    # slide stream: the same gate fires once the window fills
    with pytest.raises(Exception, match="sustained drift trend"):
        for i, alpha in enumerate([0.0, 0.2, 0.4, 0.6, 0.8]):
            _write_vecs(
                spark, src,
                _slide_rows(rng, U, alpha, 16, start=2000 + 100 * i),
            )
            _run(
                spark, src, state, ckpt,
                retrain_on_trend=trend,
            )
    # nothing before the firing epoch was blocked: 4 epochs appended
    hist = read_ann_drift(spark, state).orderBy("epoch").collect()
    assert [r.epoch for r in hist] == [0, 1, 2, 3]


def test_trend_gate_validates_window_against_tail():
    import pyspark.sql.types as T

    with pytest.raises(ValueError, match="drift_tail_epochs"):
        run_streaming_ann_sync(
            None, "src", T.StructType(), "state", "ckpt",
            drift_tail_epochs=4, retrain_on_trend={"window": 8},
        )


# ------------------------------------------------------------ round-10 advice


def test_reindex_transient_failure_is_retryable(
    spark, prepared, monkeypatch
):
    """A TRANSIENT error during verification leaves the finished build in
    place, and re-running the same reindex call re-verifies WITHOUT
    re-paying the prepare (the blanket-rmtree behavior forced a full
    rebuild)."""
    import syncmaven_spark.streaming.ann as ann_mod

    rng, src, state, ckpt, base_rows = prepared
    base = spark.createDataFrame(
        base_rows, "vec_id long, embedding array<double>"
    )
    state2 = state + "_v2"

    real_load = ann_mod._load_json
    calls = {"n": 0}

    def flaky_load(path):
        # trip once, on the epochs.json read INSIDE verification (after
        # the parity join) — a stand-in for any transient Spark error
        if path.endswith("epochs.json") and calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("injected transient verification error")
        return real_load(path)

    monkeypatch.setattr(ann_mod, "_load_json", flaky_load)
    with pytest.raises(RuntimeError, match="transient"):
        reindex_ann_state(spark, base, state, state2)
    # the build survived the transient failure
    assert os.path.exists(os.path.join(state2, "recipe.json"))
    recipe_before = open(os.path.join(state2, "recipe.json")).read()

    monkeypatch.setattr(ann_mod, "_load_json", real_load)

    def no_rebuild(*a, **kw):
        raise AssertionError("retry must not re-run prepare_ann_state")

    monkeypatch.setattr(ann_mod, "prepare_ann_state", no_rebuild)
    report = reindex_ann_state(spark, base, state, state2)
    assert report == {"old_n_ids": 40, "new_n_ids": 40}
    # the reused build is byte-identical — prepare genuinely did not run
    assert open(os.path.join(state2, "recipe.json")).read() == recipe_before
    _write_vecs(spark, src, _vecs(rng, 5, start=100))
    _run(spark, src, state2, ckpt)  # the migrated state streams fine


def test_reindex_refuses_foreign_or_live_target(spark, prepared):
    rng, src, state, ckpt, base_rows = prepared
    base = spark.createDataFrame(
        base_rows, "vec_id long, embedding array<double>"
    )
    # a live/migrated state (has epochs.json) is never reused
    _write_vecs(spark, src, _vecs(rng, 5, start=100))
    _run(spark, src, state, ckpt)
    with pytest.raises(ValueError, match="migrated/live"):
        reindex_ann_state(spark, base, state, state)
    # a prepared state with a DIFFERENT recipe is not this migration's
    # interrupted build
    other = state + "_other"
    prepare_ann_state(
        spark, base, other, n_centroids=2, m=4, n_codes=8, state_buckets=8
    )
    with pytest.raises(ValueError, match="recipe differs"):
        reindex_ann_state(spark, base, state, other)


def test_prepare_refuses_regular_file_target(spark, tmp_path):
    target = tmp_path / "state"
    target.write_text("not a directory")
    rng = np.random.RandomState(0)
    base = spark.createDataFrame(
        _vecs(rng, 5), "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not a directory"):
        prepare_ann_state(spark, base, str(target))


def test_ann_state_epochs_json_has_no_thresholds_key(spark, prepared):
    """compact_state no longer writes the near-dup-specific thresholds
    keys into states that never record thresholds (round-10 advice)."""
    rng, src, state, ckpt, _ = prepared
    for i in range(3):
        _write_vecs(spark, src, _vecs(rng, 6, start=100 + 50 * i))
        _run(spark, src, state, ckpt)
    assert maybe_compact(spark, state, every_n_epochs=1) is not None
    epochs = json.load(open(os.path.join(state, "epochs.json")))
    assert "thresholds" not in epochs
    assert "base_threshold_min" not in epochs
    assert epochs["compacted_up_to"] == 2


def test_deep_rewrite_scoped_to_named_tables(spark, prepared):
    """rewrite_tables folds ONLY the listed table base-inclusive: the
    store base rewrites to one tight file set while the ids base keeps
    accreting additively — and the report shape reflects which path each
    table took."""
    from syncmaven_spark.streaming.incremental import _count_base_files

    rng, src, state, ckpt, base_rows = prepared
    for i in range(4):
        _write_vecs(spark, src, _vecs(rng, 8, start=100 + 50 * i))
        _run(spark, src, state, ckpt)
    # an additive fold first, so both bases hold accreted file sets
    compact_state(spark, state, up_to_epoch=2)
    ids_base = os.path.join(state, "ids", "epoch=-1")
    ids_files_before = _count_base_files(ids_base)["base_files"]

    report = compact_state(
        spark, state, up_to_epoch=3, rewrite_tables={"store"}
    )
    assert "base_files" in report["store"]
    assert report["store"]["folded_dirs"] == 2  # base + epoch=2
    assert set(report["ids"]) == {"folded_dirs"}  # additive: no walk
    assert report["ids"]["folded_dirs"] == 1
    # the ids base gained epoch=2's files additively (no rewrite)
    assert _count_base_files(ids_base)["base_files"] > ids_files_before
    # everything still reads: 40 base + 4×8 streamed
    assert spark.read.parquet(
        os.path.join(state, "store")
    ).count() == 40 + 32
    queries = spark.createDataFrame(
        base_rows[:2], "vec_id long, embedding array<double>"
    )
    assert probe_ann_store(
        spark, queries, state, k=3, n_probe=4
    ).count() == 6
