"""Round-9 fixes, each reproducing its round-8 VERDICT/ADVICE item:

- _adc_topk slabs the (n_q × batch) sims transient and chunks oversized
  query batches instead of raising (ADVICE medium / verdict #2);
- _encode_udf skips empty Arrow batches instead of tripping the dim guard
  (ADVICE low);
- rerank_exact_topk bounds its two broadcasts (ADVICE low);
- rel_excess_volume_suppliers carries no single-partition Window (verdict
  #4 — the scalar-agg rewrite);
- the ADC probe plan is asserted directly: codes-only ReadSchema, no
  vector column, no row-at-a-time Python (verdict #6).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import syncmaven_spark.operators.pq as pq_mod
from syncmaven_spark.operators import (
    ivfpq_index,
    ivfpq_probe,
    pq_encode,
    pq_probe,
    pq_train,
    rerank_exact_topk,
)


def _toy_corpus(spark, n=40, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, dim)
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _pairs(df):
    return {(r.q_id, r.n_id, r.approx_sim, r.rank) for r in df.collect()}


def test_pq_probe_chunked_equals_unchunked(spark, monkeypatch):
    """With LUT_BYTES_CAP forced below the batch's total LUT size, pq_probe
    must chunk the query batch internally and return exactly the unchunked
    result — the round-8 path raised and told the caller to chunk."""
    df = _toy_corpus(spark, n=40, dim=8)
    books_df = pq_train(df, m=4, n_codes=8, seed=3)
    codes_df = pq_encode(df, books_df)
    queries = df.filter("vec_id < 7")
    baseline = _pairs(
        pq_probe(queries, codes_df, books_df, k=4, exclude_self=True)
    )
    # per-query LUT = 4 × 8 × 8 = 256 B; cap at 3 queries' worth → the
    # 7-query batch needs 3 chunks
    monkeypatch.setattr(pq_mod, "LUT_BYTES_CAP", 3 * 256)
    assert pq_mod._lut_chunk_size(4, 8) == 3
    chunked = _pairs(
        pq_probe(queries, codes_df, books_df, k=4, exclude_self=True)
    )
    assert chunked == baseline


def test_ivfpq_probe_chunked_equals_unchunked(spark, monkeypatch):
    df = _toy_corpus(spark, n=60, dim=8, seed=11)
    cells_codes, centroids_df, codebooks_df = ivfpq_index(
        df, n_centroids=4, m=4, n_codes=8
    )
    queries = df.filter("vec_id < 7")
    kwargs = dict(k=4, n_probe=2, exclude_self=True)
    baseline = _pairs(
        ivfpq_probe(queries, cells_codes, centroids_df, codebooks_df, **kwargs)
    )
    monkeypatch.setattr(pq_mod, "LUT_BYTES_CAP", 2 * 256)
    chunked = _pairs(
        ivfpq_probe(queries, cells_codes, centroids_df, codebooks_df, **kwargs)
    )
    assert chunked == baseline


def test_adc_slab_boundary_equals_unslabbed(spark, monkeypatch):
    """Forcing the query-axis slab to 1 (the finest possible slicing) must
    not change any emitted (pair, sim, rank) — the slab is a pure memory
    bound, not an approximation."""
    df = _toy_corpus(spark, n=40, dim=8)
    books_df = pq_train(df, m=4, n_codes=8, seed=3)
    codes_df = pq_encode(df, books_df)
    queries = df.filter("vec_id < 5")
    baseline = _pairs(
        pq_probe(queries, codes_df, books_df, k=4, exclude_self=True)
    )
    monkeypatch.setattr(pq_mod, "_ADC_SLAB_BYTES", 1)  # slab = 1 query
    slabbed = _pairs(
        pq_probe(queries, codes_df, books_df, k=4, exclude_self=True)
    )
    assert slabbed == baseline


def test_encode_udf_skips_empty_arrow_batch():
    """ADVICE low: an empty Arrow batch made series.tolist() == [] reshape
    to (0,) and trip the 'expected N-dim vectors' guard, failing the job.
    The kernel must yield an empty series instead."""
    books = np.zeros((2, 4, 3))
    udf = pq_mod._encode_udf(books)
    out = list(udf.func(iter([pd.Series([], dtype=object)])))
    assert len(out) == 1 and len(out[0]) == 0
    # non-empty batches still validate dimensions
    with pytest.raises(ValueError, match="expected 6-dim"):
        list(udf.func(iter([pd.Series([[1.0, 2.0]])])))


def test_rerank_exact_topk_bounds_broadcasts(spark):
    """ADVICE low: both broadcast sides (shortlist pairs, query vectors)
    now carry the limit(n+1)-probe guard with an actionable error."""
    df = _toy_corpus(spark, n=20, dim=8)
    shortlist = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "q_id long, n_id long"
    )
    queries = df.filter("vec_id = 0")
    # in-bound call unchanged
    got = rerank_exact_topk(shortlist, queries, df, k=3)
    assert got.count() == 3
    with pytest.raises(ValueError, match="shortlist"):
        rerank_exact_topk(shortlist, queries, df, k=3, max_broadcast_rows=4)
    big_short = spark.createDataFrame(
        [(0, 1)], "q_id long, n_id long"
    )
    with pytest.raises(ValueError, match="query-vector"):
        rerank_exact_topk(
            big_short, df.limit(10), df, k=3, max_broadcast_rows=5
        )


def test_excess_volume_suppliers_has_no_window(spark):
    """Verdict #4: the grand average is a 1-row agg cross-joined back, not
    an unpartitioned window — sp's output never serializes through one
    partition."""
    from syncmaven_spark.queries import CATALOG

    from tests.conftest import SF_SMOKE

    df = CATALOG["rel_excess_volume_suppliers"].spark_fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_pq_probe_plan_reads_codes_only(spark, tmp_path):
    """Verdict #6: the ADC probe's plan properties, asserted on the plan
    string itself — the scan reads the codes table (ReadSchema carries
    ``codes``, never the float vector column) and Python appears only
    Arrow-batched (no BatchEvalPython)."""
    df = _toy_corpus(spark, n=40, dim=8)
    books_df = pq_train(df, m=4, n_codes=8, seed=3)
    codes_path = str(tmp_path / "codes")
    pq_encode(df, books_df).write.parquet(codes_path)
    codes_df = spark.read.parquet(codes_path)
    probe = pq_probe(
        df.filter("vec_id < 3"), codes_df, books_df, k=4, exclude_self=True
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "codes" in plan and "ReadSchema" in plan
    assert "embedding" not in plan  # the query read happened at call time
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan


def test_ivfpq_probe_plan_prunes_to_codes_and_cells(spark, tmp_path):
    df = _toy_corpus(spark, n=60, dim=8, seed=11)
    cells_codes, centroids_df, codebooks_df = ivfpq_index(
        df, n_centroids=4, m=4, n_codes=8
    )
    store = str(tmp_path / "store")
    cells_codes.write.partitionBy("cell").parquet(store)
    stored = spark.read.parquet(store)
    probe = ivfpq_probe(
        df.filter("vec_id < 3"), stored, centroids_df, codebooks_df,
        k=4, n_probe=2, exclude_self=True,
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "codes" in plan and "ReadSchema" in plan
    assert "embedding" not in plan
    assert "BatchEvalPython" not in plan
    # the probed-cell restriction reaches the scan as a partition filter
    assert "cell" in plan
