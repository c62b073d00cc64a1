"""ALWAYS-ON sf0.1 scale gates — no env vars, run in every ``pytest tests/``.

Round-5 verdict items #1 and #2: the opt-in suites (``SPARK_GRAFT_SCALE_PARITY``,
``SPARK_GRAFT_SCALE_STRESS``) only run when someone remembers to set the env
var, and the two flagship dedup entries had no at-scale correctness gate at
all because their DuckDB oracles are quadratic (>10 min at sf0.1). This file
closes both:

1. **Planted-duplicate recall gate** for the production-default MinHash
   recipe (``minhash_verified_pairs`` with no overrides: 64 perms, 32 bands,
   3-word shingles, bucket cap 200). 200 near-duplicate pairs are PLANTED
   into the sf0.1 corpus with construction-known Jaccard ≥ 0.96 (copy = the
   normalized token sequence minus its last token, so the copy's shingle set
   is a subset of the base's missing at most one shingle; bases are chosen
   with ≥ 25 distinct shingles). At j ≥ 0.96 and 2 rows/band the band-miss
   probability is (1-j²)³² < 1e-35 per pair, so the documented bound demands
   ALL 200 pairs — the gate asserts exactly that, plus value-exactness of
   the emitted Jaccards, plus the full cluster pipeline (verified pairs →
   connected components → canonical flags) grouping every copy with its
   base. This is the recall story for ``dedup_minhash_candidates`` and
   ``dedup_cluster_pipeline`` that the quadratic oracle cannot provide at
   scale.

2. **Always-on scale tier**: a 2-replica corpus running the scale-stress
   behaviors (exact-dedup group collapse, capped-LSH replica-pair recall,
   distributed-only connected components on chains), plus the 10 most
   scale-sensitive SQL-oracled catalog entries compared against DuckDB at
   sf0.1. The 10× replica suite and the full 101-entry sf0.1 parity pass
   remain opt-in; this tier is the slice that must never rot unnoticed.

Budget: the whole file targets ~60-90 s on local[32] — measured per test in
comments below.
"""

import os
from functools import reduce

import pytest
from pyspark.sql import DataFrame, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_SF_DIR", "/root/testdata/sf0.1")

# always-on means "wherever the sf0.1 dataset exists" — on a checkout
# without the generated testdata these must SKIP, not error out of the
# module fixtures
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"scale testdata not present: {SF_DIR}"
)

PLANT_N = 200
PLANT_OFFSET = 10_000_000
DECOY_OFFSET = 20_000_000
REPLICA_OFFSET = 1_000_000


@pytest.fixture(scope="module")
def docs(spark):
    from syncmaven_spark.session import load_tables

    return load_tables(spark, SF_DIR, register_views=False)["documents"]


@pytest.fixture(scope="module")
def planted(spark, docs):
    """(base ids, augmented corpus): 200 planted near-dup copies with
    construction-known Jaccard ≥ 24/25 vs their base."""
    from syncmaven_spark.operators.dedup import _shingles

    n_shingles = F.size(F.array_distinct(_shingles(F.col("text"), 3)))
    base = (
        docs.withColumn("_n", n_shingles)
        .filter(F.col("_n") >= 25)
        .orderBy("doc_id")
        .limit(PLANT_N)
        .select("doc_id", "text", "lang", "source")
        .cache()
    )
    base_ids = [r.doc_id for r in base.select("doc_id").collect()]
    assert len(base_ids) == PLANT_N, "corpus drifted: too few shingle-rich docs"
    # copy = the SAME normalized token sequence minus its last token: the
    # copy's trigram-shingle set is the base's minus (at most) the final
    # trigram, so jaccard = |copy|/|base| >= 24/25 by construction
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^\w\s]+", " ")), r"\s+"
    )
    copies = base.select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.array_join(F.slice(toks, 1, F.size(toks) - 1), " ").alias("text"),
        "lang",
        "source",
    )
    # below-threshold DECOYS (the false-positive leg, same single run):
    # keep only the first third of the token sequence — its shingle set is
    # a subset of the base's with |decoy| <= (|base|+2)/3 - 2 shingles, so
    # jaccard <= ~0.36 < 0.8 by construction — none may be emitted
    decoys = base.select(
        (F.col("doc_id") + DECOY_OFFSET).alias("doc_id"),
        F.array_join(
            F.slice(toks, 1, F.greatest(F.size(toks) / 3, F.lit(5)).cast("int")),
            " ",
        ).alias("text"),
        "lang",
        "source",
    )
    aug = (
        docs.select("doc_id", "text", "lang", "source").union(copies).union(decoys)
    )
    return base_ids, aug


@pytest.fixture(scope="module")
def production_pairs(spark, planted):
    """One production-default run shared by the recall and pipeline gates."""
    from syncmaven_spark.operators.dedup import minhash_verified_pairs

    _, aug = planted
    # NO overrides: whatever the library defaults are is what this gates —
    # if someone changes the default recipe, this file re-judges it at sf0.1
    return minhash_verified_pairs(aug, "text", "doc_id", threshold=0.8)


# ~20 s: one minhash+LSH+verify pass over 5200 docs
def test_production_default_recall_on_planted_pairs(spark, planted, production_pairs):
    base_ids, aug = planted
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in production_pairs.filter(
            (F.col("id_b") - F.col("id_a") == PLANT_OFFSET)
            & (F.col("id_b") >= PLANT_OFFSET)
        ).collect()
    }
    missing = [b for b in base_ids if (b, b + PLANT_OFFSET) not in got]
    # the documented band-miss bound at j>=0.96 is (1-j^2)^32 < 1e-35 per
    # pair — over 200 pairs the expected misses are ~0, so the production
    # default (bucket cap INCLUDED) must recover every planted pair
    assert not missing, (
        f"production-default recipe lost {len(missing)}/{PLANT_N} planted "
        f"pairs (band-miss bound allows none): {missing[:10]}"
    )
    assert min(got.values()) >= 0.9  # construction: >= 24/25, rounded

    # value-exactness on the planted sample: emitted jaccard must equal the
    # exact hashed-shingle-set jaccard (precision leg, no quadratic oracle)
    from syncmaven_spark.operators.dedup import _shingles

    hashed = F.array_distinct(
        F.transform(_shingles(F.col("text"), 3), lambda w: F.xxhash64(w))
    )
    sets = aug.filter(
        (F.col("doc_id").isin(base_ids))
        | (F.col("doc_id") - PLANT_OFFSET).isin(base_ids)
    ).select("doc_id", hashed.alias("s"))
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sets.select(
        (F.col("doc_id") - PLANT_OFFSET).alias("id_a"), F.col("s").alias("sb")
    )
    exact = {
        r.id_a: r.j
        for r in a.join(b, "id_a")
        .select(
            "id_a",
            F.round(
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / F.size(F.array_union("sa", "sb")),
                4,
            ).alias("j"),
        )
        .collect()
    }
    wrong = {
        base: (got[(base, base + PLANT_OFFSET)], exact[base])
        for base in base_ids
        if got[(base, base + PLANT_OFFSET)] != exact[base]
    }
    assert not wrong, f"emitted jaccard diverges from exact: {wrong}"

    # false-positive leg: decoys keep only the first third of their base's
    # tokens (typically jaccard ≈ 0.3; a highly repetitive base CAN push a
    # decoy past 0.8, so the gate is the per-pair EXACT jaccard, not the
    # construction bound): every (base, decoy) pair must be emitted iff its
    # exact jaccard ≥ 0.8 — the exact-verification stage enforces the
    # boundary even when LSH banding (correctly, ~(1-0.3²)³² ≈ 5%)
    # surfaces a below-threshold candidate
    decoy_sets = aug.filter(
        (F.col("doc_id") >= DECOY_OFFSET)
        & (F.col("doc_id") - DECOY_OFFSET).isin(base_ids)
    ).select((F.col("doc_id") - DECOY_OFFSET).alias("id_a"), hashed.alias("sd"))
    decoy_exact = {
        r.id_a: r.j
        for r in a.join(decoy_sets, "id_a")
        .select(
            "id_a",
            F.round(
                F.size(F.array_intersect("sa", "sd")).cast("double")
                / F.size(F.array_union("sa", "sd")),
                4,
            ).alias("j"),
        )
        .collect()
    }
    emitted_decoys = {
        r.id_a
        for r in production_pairs.filter(
            (F.col("id_b") - F.col("id_a") == DECOY_OFFSET)
            & (F.col("id_b") >= DECOY_OFFSET)
            & F.col("id_a").isin(base_ids)
        ).collect()
    }
    should = {b for b, j in decoy_exact.items() if j >= 0.8}
    false_pos = emitted_decoys - should
    false_neg = should - emitted_decoys
    assert not false_pos, f"below-threshold decoy pairs emitted: {false_pos}"
    assert not false_neg, f"≥0.8 decoy pairs missed: {false_neg}"
    # the decoy population must actually exercise the below-threshold side
    assert sum(1 for j in decoy_exact.values() if j < 0.8) >= PLANT_N * 0.9


# ~8 s: CC over the (persisted, reused) verified pairs
def test_cluster_pipeline_groups_planted_copies_with_base(
    spark, planted, production_pairs
):
    from syncmaven_spark.operators.graph import dedup_cluster_assignments

    base_ids, aug = planted
    assigned = dedup_cluster_assignments(
        production_pairs, aug.select("doc_id")
    ).cache()
    try:
        labels = {
            r.v: (r.component, r.is_canonical)
            for r in assigned.filter(
                (F.col("v").isin(base_ids))
                | (F.col("v") - PLANT_OFFSET).isin(base_ids)
            ).collect()
        }
        split = [
            b
            for b in base_ids
            if labels[b][0] != labels[b + PLANT_OFFSET][0]
        ]
        assert not split, f"copies clustered away from their base: {split[:10]}"
        # the copy's id is larger than every base id, so a planted copy can
        # never be its cluster's canonical representative
        canon_copies = [
            b for b in base_ids if labels[b + PLANT_OFFSET][1]
        ]
        assert not canon_copies, f"planted copies marked canonical: {canon_copies[:10]}"
        # full-corpus invariant, not just the sample: exactly one canonical
        # per component
        bad = (
            assigned.groupBy("component")
            .agg(F.sum(F.col("is_canonical").cast("int")).alias("n"))
            .filter(F.col("n") != 1)
            .count()
        )
        assert bad == 0
    finally:
        assigned.unpersist()


# --- always-on 2-replica tier (the 10x versions stay opt-in) --------------


@pytest.fixture(scope="module")
def two_replica(docs):
    return docs.select("doc_id", "text", "lang", "source").union(
        docs.select(
            (F.col("doc_id") + REPLICA_OFFSET).alias("doc_id"),
            "text",
            "lang",
            "source",
        )
    )


# ~5 s
def test_exact_dedup_collapses_2x_replicas(docs, two_replica):
    from syncmaven_spark.operators.dedup import exact_dedup

    n_texts = docs.select("text").distinct().count()
    kept = exact_dedup(two_replica, ["text"], "doc_id")
    assert kept.count() == n_texts
    assert kept.filter(F.col("doc_id") >= REPLICA_OFFSET).count() == 0


# ~10 s
def test_capped_lsh_finds_replica_pairs_at_2x(docs, two_replica):
    from syncmaven_spark.operators.dedup import minhash_lsh_candidates

    cands = minhash_lsh_candidates(
        two_replica, "text", "doc_id", num_perm=64, bands=32, shingle_k=3,
        max_bucket_size=200,
    ).cache()
    try:
        unique_texts = (
            docs.groupBy("text")
            .agg(F.count("*").alias("n"), F.min("doc_id").alias("doc_id"))
            .filter(F.col("n") == 1)
            .select("doc_id")
            .orderBy("doc_id")
            .limit(20)
        )
        base_ids = [r.doc_id for r in unique_texts.collect()]
        assert base_ids
        found = {
            r.id_a
            for r in cands.filter(
                (F.col("id_b") - F.col("id_a") == REPLICA_OFFSET)
                & F.col("id_a").isin(base_ids)
            ).collect()
        }
        missing = set(base_ids) - found
        assert not missing, f"identical replicas not candidate-paired: {missing}"
        assert cands.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    finally:
        cands.unpersist()


# ~6 s
def test_distributed_cc_on_2x_chains(docs):
    from syncmaven_spark.operators.graph import connected_components

    edges = docs.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + REPLICA_OFFSET).alias("id_b"),
    )
    labels = connected_components(edges, "id_a", "id_b", local_finish_edges=0)
    assert labels.filter(
        F.col("component") != F.col("v") % REPLICA_OFFSET
    ).count() == 0
    assert labels.count() == docs.count() * 2


# --- the 10 most scale-sensitive SQL-oracled entries at sf0.1 -------------
#
# Chosen for shapes whose bugs historically appear only past sf0.01:
# candidate blow-up (simhash/ngram/cosine dedup), iterative convergence
# (connected components), explode-heavy aggregation (ngram freq), multi-way
# semi/anti self-joins (sole_late_supplier), banded/as-of joins, windowed
# market share, and timestamp-grid gap fill. ~35 s total (measured; the
# slowest two are ~9 s each). The full 101-entry sf0.1 pass stays opt-in.
SCALE_TIER_ENTRIES = [
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "graph_connected_components",
    "text_ngram_freq",
    "rel_sole_late_supplier",
    "join_range_bands",
    "join_asof_backward",
    "rel_market_share",
    "ts_gap_fill",
    # round-6 additions: per-shard packing (window cumsum layout) and the
    # repetition filters (sorted-run-length bigram mode) — both sub-second
    "pack_concat_chunks",
    "text_repetition_stats",
]


@pytest.fixture(scope="module")
def scale_con():
    from syncmaven_spark.oracle import duckdb_connection

    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", SCALE_TIER_ENTRIES)
def test_scale_tier_entry_matches_oracle(spark, scale_con, name):
    from syncmaven_spark.oracle import compare
    from syncmaven_spark.queries import CATALOG

    qd = CATALOG[name]
    result = compare(name, qd.spark_fn(spark, SF_DIR), scale_con, qd.oracle)
    assert result.ok, result.detail
