"""Round-11 optimization pins — each asserts an optimization changed NO
observable value:

- the batched-GEMM path of ``_assign_codes`` (taken when sub_dim == 2)
  and the driver-side thread split are BIT-identical to the sequential
  einsum formulation across shapes, including edge slabs;
- the streaming driver's single-pass ``_epoch_drift_record`` returns
  exactly the values the two-job layout (``ivf_drift`` +
  ``pq_drift_assigned``) returns, in both encode modes;
- the bounded driver-created codebook/centroid tables (pandas+Arrow,
  one partition) still round-trip through ``load_pq_codebooks`` /
  ``_load_codebook`` to the exact trained matrices.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from syncmaven_spark.operators.pq import (
    _assign_codes,
    load_pq_codebooks,
    pq_drift_assigned,
    pq_train,
)
from syncmaven_spark.operators.similarity import (
    _load_codebook,
    ivf_drift,
    ivf_index,
)
from syncmaven_spark.streaming.ann import _epoch_drift_record


def _reference_assign(Xn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """The pre-round-11 sequential einsum formulation, verbatim — the
    ground truth both the GEMM path and the thread split must reproduce
    bit-for-bit."""
    m, n_codes, sub_dim = books.shape
    n = len(Xn)
    Xs = np.ascontiguousarray(Xn.reshape(n, m, sub_dim))
    c2 = (books * books).sum(axis=2)
    out = np.empty((n, m), dtype=np.int64)
    slab = max(1, (32 * 1024 * 1024) // (m * n_codes * 8))
    buf = np.empty((min(slab, n), m, n_codes))
    for i in range(0, n, slab):
        xs = Xs[i : i + slab]
        b = buf[: len(xs)]
        np.einsum("njs,jcs->njc", xs, books, out=b, optimize=False)
        b *= -2.0
        b += c2[None, :, :]
        out[i : i + slab] = b.argmin(axis=2)
    return out


@pytest.mark.parametrize(
    "n,m,n_codes,sub_dim",
    [
        (2048, 32, 256, 2),  # the catalog's m=32 recipe → GEMM path
        (1, 32, 256, 2),  # single row through the GEMM path
        (777, 8, 64, 8),  # einsum path (sub_dim != 2)
        (5, 4, 16, 16),  # tiny einsum path
    ],
)
def test_assign_codes_matches_reference_bitwise(n, m, n_codes, sub_dim):
    rng = np.random.RandomState(11)
    X = rng.standard_normal((n, m * sub_dim))
    books = rng.standard_normal((m, n_codes, sub_dim))
    ref = _reference_assign(X, books)
    for threads in (1, 8):
        assert np.array_equal(ref, _assign_codes(X, books, threads=threads))


def test_assign_codes_gemm_exact_on_tied_codebook():
    # cycle-padded (duplicate) codebook entries produce EXACT score ties;
    # argmin must keep breaking them to the lowest code index on the GEMM
    # path exactly as the einsum did
    rng = np.random.RandomState(3)
    m, n_codes, sub_dim = 4, 8, 2
    base = rng.standard_normal((m, 3, sub_dim))
    books = np.concatenate([base, base[:, :3], base[:, :2]], axis=1)
    X = rng.standard_normal((64, m * sub_dim))
    assert np.array_equal(
        _reference_assign(X, books), _assign_codes(X, books, threads=4)
    )


@pytest.fixture(scope="module")
def _assigned(spark):
    rng = np.random.RandomState(5)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(16)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assignments, cents = ivf_index(df, n_centroids=4, sample_size=300)
    books = pq_train(df, m=8, n_codes=16, sample_size=300)
    return df, assignments, cents, books


@pytest.mark.parametrize("residual", [False, True])
def test_epoch_drift_record_equals_two_job_layout(_assigned, residual):
    df, assignments, cents, books_df = _assigned
    centroids, ivf_recipe = _load_codebook(cents)
    books, pq_recipe = load_pq_codebooks(books_df)
    loaded = (centroids, ivf_recipe, books, pq_recipe)
    rec = _epoch_drift_record(
        assignments, (centroids, ivf_recipe), (books, pq_recipe), residual
    )
    cell_row = ivf_drift(assignments, cents, _loaded=(centroids, ivf_recipe)).first()
    recon_row = pq_drift_assigned(
        assignments, cents, books_df,
        encode_residuals=residual, _loaded=loaded,
    ).first()
    assert rec["n_vectors"] == cell_row["n_vectors"] == recon_row["n_vectors"]
    for key in ("mean_cell_cos", "p10_cell_cos", "min_cell_cos"):
        assert rec[key] == cell_row[key]
    for key in ("mean_recon_cos", "p10_recon_cos", "min_recon_cos"):
        assert rec[key] == recon_row[key]


def test_bounded_artifact_tables_roundtrip_and_are_single_partition(_assigned):
    _df, _assignments, cents, books_df = _assigned
    assert cents.rdd.getNumPartitions() == 1
    assert books_df.rdd.getNumPartitions() == 1
    centroids, recipe = _load_codebook(cents)
    assert recipe["n_centroids"] == 4
    books, pq_recipe = load_pq_codebooks(books_df)
    assert books.shape == (8, 16, 2)
    assert pq_recipe["m"] == 8 and pq_recipe["n_codes"] == 16
