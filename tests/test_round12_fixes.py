"""Round-12 advice/fix pins:

- the sub_dim==2 GEMM formulation's RAW SCORES (not just the argmin)
  match the pinned einsum on this interpreter's BLAS, and the one-time
  self-check falls back to the einsum when they would not;
- a malformed SPARK_GRAFT_DRIVER_KERNEL_THREADS is ignored with a
  warning instead of crashing pq_train;
- reindex_ann_state accepts an explicit ``state_buckets=None`` override
  and re-derives the sidecar bucket count from the new corpus.
"""

import numpy as np
import pytest

import syncmaven_spark.operators.pq as pq_mod
from syncmaven_spark.operators.pq import (
    _assign_codes,
    _driver_kernel_threads,
    _gemm_scores_exact,
)


def test_gemm_selfcheck_consistent_with_raw_scores():
    """Round-11 advice: argmin equality alone can hide a ULP-level FMA
    difference. Raw-score equality of the GEMM and einsum formulations is
    a property of the HOST's BLAS kernel (an FMA-using dgemm skips one
    intermediate rounding and is a ULP off the einsum — observed live on
    an AVX512/FMA3 OpenBLAS host), so the test cannot assert equality
    unconditionally; it asserts that the one-time self-check AGREES with
    a direct raw-score comparison at a production shape, i.e. the GEMM
    fast path is enabled exactly when it is bit-safe on this stack."""
    rng = np.random.default_rng(7)
    m, n_codes, sub_dim, n = 32, 256, 2, 512
    books = rng.standard_normal((m, n_codes, sub_dim))
    xs = rng.standard_normal((n, m, sub_dim))
    ein = np.einsum("njs,jcs->njc", xs, books, optimize=False)
    gem = np.matmul(
        xs.transpose(1, 0, 2),
        np.ascontiguousarray(books.transpose(0, 2, 1)),
    ).transpose(1, 0, 2)
    assert _gemm_scores_exact() is bool(np.array_equal(ein, gem))
    # whichever path the self-check picked, assignment must reproduce the
    # pinned einsum reference bitwise — THAT is the BLAS-independence
    # contract the codebooks rely on
    from tests.test_round11_opt import _reference_assign

    X = xs.reshape(n, m * sub_dim)
    assert np.array_equal(
        _reference_assign(X, books), _assign_codes(X, books, threads=2)
    )


def test_assign_codes_einsum_fallback_when_selfcheck_fails(monkeypatch):
    """With the self-check forced to False, sub_dim==2 must route through
    the einsum and still reproduce the reference bitwise."""
    monkeypatch.setattr(pq_mod, "_GEMM_SCORES_EXACT", False)
    rng = np.random.RandomState(21)
    m, n_codes, sub_dim = 8, 32, 2
    X = rng.standard_normal((300, m * sub_dim))
    books = rng.standard_normal((m, n_codes, sub_dim))
    from tests.test_round11_opt import _reference_assign

    assert np.array_equal(
        _reference_assign(X, books), _assign_codes(X, books, threads=4)
    )


def test_reindex_rederives_buckets_on_explicit_none(spark, tmp_path):
    """Round-11 advice: reindex pinned the old recipe's state_buckets, so
    a grown corpus kept its original (unprunable) bucket count. An
    EXPLICIT ``state_buckets=None`` override must re-derive from the NEW
    corpus; the default (no override) still inherits the old recipe."""
    import json
    import os

    from syncmaven_spark.streaming.ann import (
        _derive_state_buckets,
        prepare_ann_state,
        reindex_ann_state,
    )

    rng = np.random.RandomState(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    state = str(tmp_path / "state")
    prepare_ann_state(
        spark, base, state, n_centroids=4, m=4, n_codes=8, state_buckets=64
    )

    def buckets(d):
        with open(os.path.join(d, "recipe.json")) as f:
            return json.load(f)["state_buckets"]

    assert buckets(state) == 64
    # default: inherit the pinned value
    inherit = str(tmp_path / "state_inherit")
    reindex_ann_state(spark, base, state, inherit)
    assert buckets(inherit) == 64
    # explicit None: re-derive from the new corpus size
    rederived = str(tmp_path / "state_rederived")
    reindex_ann_state(spark, base, state, rederived, state_buckets=None)
    assert buckets(rederived) == _derive_state_buckets(len(rows))


def test_driver_kernel_threads_malformed_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_KERNEL_THREADS", "eight")
    with pytest.warns(UserWarning, match="SPARK_GRAFT_DRIVER_KERNEL_THREADS"):
        n = _driver_kernel_threads()
    assert n >= 1
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_KERNEL_THREADS", "3")
    assert _driver_kernel_threads() == 3
