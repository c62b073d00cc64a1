"""Round-8 ADVICE fixes: float-safe recipe comparison, stamp-derived dim
(no per-epoch batch re-scan), and schema-explicit state reads that tolerate
footerless epoch dirs left by older layouts."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_check_index_recipe_compares_floats(spark):
    """Round-7 advice: _norm coerced every numeric with int(), so two
    genuinely different float recipe values (0.8 vs 0.3) compared equal
    (int both → 0), silently disabling the fail-fast. Non-integral floats
    now compare as floats; integral widening (32 vs 32.0, the parquet
    JSON round-trip case) stays tolerated."""
    from syncmaven_spark.operators.dedup import (
        _with_recipe_meta,
        check_index_recipe,
    )

    df = spark.createDataFrame([(1, 2)], "id long, h long")
    stamped = _with_recipe_meta(df, "h", {"threshold": 0.8, "bands": 32})
    check_index_recipe(stamped, "h", {"threshold": 0.8, "bands": 32})
    check_index_recipe(stamped, "h", {"threshold": 0.8, "bands": 32.0})
    with pytest.raises(ValueError, match="recipe mismatch"):
        check_index_recipe(stamped, "h", {"threshold": 0.3, "bands": 32})


def test_cosine_incremental_new_index_skips_batch_scan(spark):
    """Round-7 advice: with new_index supplied, the probe derived dim by
    eagerly scanning new_df — one Spark job per call, re-executing the
    micro-batch source once per epoch in the streaming driver. dim now
    comes from the recipe stamps; a poisoned new_df (raising UDF) proves
    the batch is never scanned, and recipe mismatches still fail fast."""
    from syncmaven_spark.operators import (
        cosine_lsh_candidates_incremental,
        cosine_lsh_index,
    )

    rng = np.random.RandomState(7)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    old = emb.filter("vec_id < 30")
    new = emb.filter("vec_id >= 30")
    cfg = dict(n_planes=4, n_tables=8, max_bucket_size=None)
    index = cosine_lsh_index(old, **cfg)
    batch_index = cosine_lsh_index(new, **cfg)

    @F.udf("array<double>")
    def boom(v):
        raise RuntimeError("batch scanned")

    poisoned = new.withColumn("embedding", boom("embedding"))
    got = cosine_lsh_candidates_incremental(
        poisoned, index, new_index=batch_index, **cfg
    )
    assert got.count() >= 0  # evaluating candidates never touches new_df

    # the stamp-only path still fails fast on a wrong probe recipe
    with pytest.raises(ValueError, match="recipe mismatch"):
        cosine_lsh_candidates_incremental(
            poisoned, index, n_planes=8, n_tables=8,
            max_bucket_size=None, new_index=batch_index,
        )
    # and matches the clean-batch result exactly
    clean = {
        (r.id_a, r.id_b)
        for r in cosine_lsh_candidates_incremental(
            new, index, **cfg
        ).collect()
    }
    assert {(r.id_a, r.id_b) for r in got.collect()} == clean


def test_read_epoch_state_tolerates_footerless_epoch_dir(spark, tmp_path):
    """Round-7 advice (medium): an epoch dir with zero parquet footers —
    written by the older layout for an all-unusable-rows batch — made
    schema inference fail with UNABLE_TO_INFER_SCHEMA and permanently
    wedged the stream. The read now passes the known schema explicitly."""
    from syncmaven_spark.streaming.incremental import (
        _id_bucket,
        _read_epoch_state,
    )

    table = str(tmp_path / "sets")
    os.makedirs(os.path.join(table, "epoch=0", "bucket=1"))
    ddl = "doc_id long, _set array<bigint>"
    empty = _read_epoch_state(spark, table, ["doc_id", "_set"], ddl, 1)
    assert empty.count() == 0

    # a later real epoch beside the footerless one still reads fine
    spark.range(0, 20).select(
        F.col("id").alias("doc_id"), F.array(F.col("id")).alias("_set")
    ).withColumn("bucket", _id_bucket("doc_id", 8)).write.partitionBy(
        "bucket"
    ).parquet(os.path.join(table, "epoch=1"))
    got = _read_epoch_state(spark, table, ["doc_id", "_set"], ddl, 2)
    assert got.count() == 20


def test_ivf_append_assert_new_ids(spark):
    """Round-8 review: a replayed append re-ingests stored ids — the
    duplicate assignment rows consume top-k slots and silently evict true
    neighbors. assert_new_ids enforces the disjointness contract eagerly."""
    from syncmaven_spark.operators import ivf_append, ivf_index

    rng = np.random.RandomState(5)
    emb = spark.createDataFrame(
        [(i, rng.standard_normal(8).tolist()) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    a = emb.filter("vec_id < 40")
    b = emb.filter("vec_id >= 40")
    assignments, centroids_df = ivf_index(a, n_centroids=4)

    ok = ivf_append(
        b, centroids_df, assignments=assignments, assert_new_ids=True
    )
    assert ok.count() == 20
    overlapping = emb.filter("vec_id in (0, 45)")  # 0 is stored
    with pytest.raises(ValueError, match="re-ingests id"):
        ivf_append(
            overlapping, centroids_df,
            assignments=assignments, assert_new_ids=True,
        )
    # supplying the table turns the check ON (review pass 2: the
    # table-without-flag call was a silent no-op)
    with pytest.raises(ValueError, match="re-ingests id"):
        ivf_append(overlapping, centroids_df, assignments=assignments)
    # ids repeated WITHIN the batch are caught too
    with pytest.raises(ValueError, match="more than once"):
        ivf_append(
            b.unionByName(b.limit(1)), centroids_df,
            assignments=assignments,
        )
    # explicit opt-out carries the table without checking
    assert ivf_append(
        overlapping, centroids_df,
        assignments=assignments, assert_new_ids=False,
    ).count() == 2
    with pytest.raises(ValueError, match="needs the stored"):
        ivf_append(b, centroids_df, assert_new_ids=True)


def test_state_consumers_refuse_old_layout_and_pending_journal(
    spark, tmp_path
):
    """Round-8 review: read_pairs and compact_state now enforce the same
    layout version the drivers do, and read_pairs refuses a mid-surgery
    state (pending compaction journal) instead of silently returning a
    pairs table missing the folded epochs."""
    import json

    from syncmaven_spark.streaming import (
        compact_state,
        read_pairs,
        run_streaming_near_dup_sync,
    )

    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    run_streaming_near_dup_sync(
        spark, src, schema, state, ckpt, threshold=0.3, max_bucket_size=None
    )

    # pending journal → read_pairs refuses
    jpath = state + "/.compact_journal_pairs.json"
    with open(jpath, "w") as f:
        json.dump({"fold": [], "up_to": 0}, f)
    with pytest.raises(ValueError, match="incomplete compaction"):
        read_pairs(spark, state)
    os.remove(jpath)
    assert read_pairs(spark, state).count() >= 1

    # old layout → both consumers refuse with the dedicated message
    with open(state + "/recipe.json", encoding="utf-8") as f:
        recipe = json.load(f)
    recipe["layout"] = 2
    with open(state + "/recipe.json", "w", encoding="utf-8") as f:
        json.dump(recipe, f)
    with pytest.raises(ValueError, match="older/different on-disk layout"):
        read_pairs(spark, state)
    with pytest.raises(ValueError, match="older/different on-disk layout"):
        compact_state(spark, state, up_to_epoch=0)


def test_decontamination_cap_pinned_across_runs(spark, tmp_path):
    """Round-8 review: the decon driver pins max_bucket_size in
    recipe.json on the first run — a later run with a different cap would
    make epochs undetectably incomplete (contamination past the cap is
    silently exempt) and fails fast instead."""
    import json

    from syncmaven_spark.streaming import (
        prepare_decontamination_state,
        run_streaming_decontamination_sync,
    )

    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    text = "the quick brown fox jumps over the lazy dog in the garden"
    bench = spark.createDataFrame(
        [(10, text)], "doc_id long, text string"
    )
    prepare_decontamination_state(spark, bench, state)
    spark.createDataFrame(
        [(1, text + " today")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    run_streaming_decontamination_sync(
        spark, src, schema, state, ckpt, threshold=0.3
    )
    with open(state + "/recipe.json", encoding="utf-8") as f:
        assert json.load(f)["max_bucket_size"] is None  # pinned on run 1

    spark.createDataFrame(
        [(2, text + " tomorrow")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(ValueError, match="max_bucket_size"):
        run_streaming_decontamination_sync(
            spark, src, schema, state, ckpt, threshold=0.3,
            max_bucket_size=5,
        )
    # the pinned cap still runs
    run_streaming_decontamination_sync(
        spark, src, schema, state, ckpt, threshold=0.3
    )
    got = {
        (r.train_id, r.bench_id)
        for r in spark.read.parquet(state + "/pairs").collect()
    }
    assert got == {(1, 10), (2, 10)}


def test_decontamination_cap_never_pinned_retroactively(spark, tmp_path):
    """Review pass 2: a state that already processed epochs WITHOUT a
    recorded cap was mined under an unknown cap — the next run must not
    bless its own cap as the pinned history."""
    import json

    from syncmaven_spark.streaming import (
        prepare_decontamination_state,
        run_streaming_decontamination_sync,
    )

    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    text = "the quick brown fox jumps over the lazy dog in the garden"
    bench = spark.createDataFrame([(10, text)], "doc_id long, text string")
    prepare_decontamination_state(spark, bench, state)
    spark.createDataFrame(
        [(1, text + " now")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    run_streaming_decontamination_sync(
        spark, src, schema, state, ckpt, threshold=0.3
    )

    # simulate a pre-pin state: epochs processed, cap record missing
    with open(state + "/recipe.json", encoding="utf-8") as f:
        recipe = json.load(f)
    del recipe["max_bucket_size"]
    with open(state + "/recipe.json", "w", encoding="utf-8") as f:
        json.dump(recipe, f)
    spark.createDataFrame(
        [(2, text + " later")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(ValueError, match="unknown"):
        run_streaming_decontamination_sync(
            spark, src, schema, state, ckpt, threshold=0.3
        )


def test_decontamination_method_pin_legacy_and_cap_scoping(spark, tmp_path):
    """Review pass 3: a pre-'method' state resumes as jaccard (the only
    metric that existed — no pointless rebuild), a containment run
    against it still fails fast, and the bucket cap is NOT pinned/checked
    under containment (it has no bucket stage — refusing runs over a
    no-op knob)."""
    import json

    from syncmaven_spark.streaming import (
        prepare_decontamination_state,
        run_streaming_decontamination_sync,
    )

    text = "the quick brown fox jumps over the lazy dog in the garden"
    bench = spark.createDataFrame([(10, text)], "doc_id long, text string")

    # legacy state: mined, then 'method' stripped from the recipe
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))
    prepare_decontamination_state(spark, bench, state)
    spark.createDataFrame(
        [(1, text + " now")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    run_streaming_decontamination_sync(
        spark, src, schema, state, ckpt, threshold=0.3
    )
    with open(state + "/recipe.json", encoding="utf-8") as f:
        recipe = json.load(f)
    del recipe["method"]
    with open(state + "/recipe.json", "w", encoding="utf-8") as f:
        json.dump(recipe, f)

    # containment against the legacy-jaccard history fails fast...
    spark.createDataFrame(
        [(2, text + " later")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(ValueError, match="mined with method='jaccard'"):
        run_streaming_decontamination_sync(
            spark, src, schema, state, ckpt,
            threshold=0.3, method="containment",
        )
    # ...while a jaccard resume re-pins the knowable historical value
    run_streaming_decontamination_sync(
        spark, src, schema, state, ckpt, threshold=0.3
    )
    with open(state + "/recipe.json", encoding="utf-8") as f:
        assert json.load(f)["method"] == "jaccard"

    # containment state: the cap is a no-op knob, never pinned/refused
    src2, state2, ckpt2 = (
        str(tmp_path / d) for d in ("src2", "state2", "ckpt2")
    )
    prepare_decontamination_state(spark, bench, state2)
    spark.createDataFrame(
        [(1, text + " x")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src2)
    schema2 = spark.read.parquet(src2).schema
    kw = dict(threshold=0.3, method="containment")
    run_streaming_decontamination_sync(
        spark, src2, schema2, state2, ckpt2, **kw
    )
    with open(state2 + "/recipe.json", encoding="utf-8") as f:
        assert "max_bucket_size" not in json.load(f)
    spark.createDataFrame(
        [(2, text + " y")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src2)
    run_streaming_decontamination_sync(
        spark, src2, schema2, state2, ckpt2, max_bucket_size=200, **kw
    )
    got = {
        (r.train_id, r.bench_id)
        for r in spark.read.parquet(state2 + "/pairs").collect()
    }
    assert got == {(1, 10), (2, 10)}


def test_merge_tmp_into_base_recovers_any_interruption_point(tmp_path):
    """_merge_tmp_into_base must be resumable from ANY prefix of its file
    moves: files already moved are no longer in tmp, never-moved files
    still are, and a re-run completes the merge with nothing lost or
    duplicated."""
    from syncmaven_spark.streaming.incremental import _merge_tmp_into_base

    def build_tmp(root):
        files = []
        for part in ("hbucket=0", "hbucket=3"):
            d = root / part
            d.mkdir(parents=True)
            for i in range(3):
                p = d / f"part-{part[-1]}{i}-uuid.parquet"
                p.write_text(f"{part}/{i}")
                files.append((part, p.name, f"{part}/{i}"))
        (root / "_SUCCESS").write_text("")
        (root / ".part-crc").write_text("")
        return files

    import itertools
    import os
    import shutil

    for k in range(0, 7):  # interrupt after k of the 6 file moves
        tmp = tmp_path / f"tmp{k}"
        base = tmp_path / f"base{k}"
        files = build_tmp(tmp)
        # pre-existing base content from an earlier compaction must
        # survive untouched
        (base / "hbucket=0").mkdir(parents=True)
        (base / "hbucket=0" / "part-old.parquet").write_text("old")
        # simulate a crash: k files already moved (atomic renames)
        for part, name, _ in itertools.islice(files, k):
            os.makedirs(base / part, exist_ok=True)
            os.replace(tmp / part / name, base / part / name)
        _merge_tmp_into_base(str(tmp), str(base))
        assert not tmp.exists()
        got = {
            (os.path.relpath(os.path.join(r, f), base))
            for r, _, fs in os.walk(base)
            for f in fs
        }
        want = {os.path.join(p, n) for p, n, _ in files} | {
            os.path.join("hbucket=0", "part-old.parquet")
        }
        assert got == want, (k, got ^ want)
        assert (base / "hbucket=0" / "part-old.parquet").read_text() == "old"
        for part, name, content in files:
            assert (base / part / name).read_text() == content
        shutil.rmtree(base)


def test_read_pairs_simhash_direction_flip(spark, tmp_path):
    """For the simhash family the recorded per-epoch value is max_hamming
    and the completeness direction FLIPS: an epoch mined with a SMALLER
    bound never emitted pairs in (bound, requested], so it is the
    incomplete one; pairs filter as hamming <= requested."""
    from syncmaven_spark.streaming import (
        read_pairs,
        run_streaming_near_dup_sync,
    )

    base_text = "the quick brown fox jumps over the lazy dog tonight"
    src, state, ckpt = (str(tmp_path / d) for d in ("src", "state", "ckpt"))

    def write(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    # max_hamming is part of the RECIPE for simhash (it fixes the chunk
    # layout), so unlike jaccard/cosine thresholds it cannot vary between
    # epochs — the direction flip matters when the requested cut exceeds
    # the constant recorded bound
    kwargs = dict(family="simhash", max_hamming=8, max_bucket_size=None)
    write([(1, base_text), (2, base_text + " extra tail words here")])
    schema = spark.read.parquet(src).schema
    run_streaming_near_dup_sync(spark, src, schema, state, ckpt, **kwargs)
    write([(3, base_text)])  # token-identical to 1 → hamming 0
    run_streaming_near_dup_sync(spark, src, schema, state, ckpt, **kwargs)

    # cut at 2: both epochs mined with max_hamming 8 >= 2 → complete;
    # pairs filter hamming <= 2 (NOT >= — the flipped direction)
    cut = {
        (r.id_a, r.id_b, r.hamming)
        for r in read_pairs(spark, state, 2).collect()
    }
    assert all(h <= 2 for _, _, h in cut)
    assert (1, 3, 0) in cut
    # cut at 10: epochs were mined at 8 < 10 → pairs with hamming in
    # (8, 10] were never emitted → incomplete, refuse
    with pytest.raises(ValueError, match="mined at 8"):
        read_pairs(spark, state, 10)
