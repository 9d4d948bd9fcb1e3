"""Sparse COO block layer vs numpy oracles.

Mirrors the reference's test_sparse_arrays workload
(`/root/reference/Static Scheduler/wukong/tests/test_collections.py:179-190`):
threshold → map_blocks(COO) → axis-0 sum, plus roundtrip/elementwise/ragged
coverage the dense layer gets in test_blockmatrix.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from wukong_spark.blockmatrix import BlockMatrix
from wukong_spark.sparse import SparseBlockMatrix


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _masked(rng, shape, thresh=0.95):
    a = rng.random(shape)
    return np.where(a < thresh, 0.0, a)


def test_roundtrip_exact(spark, rng):
    a = _masked(rng, (40, 30))
    bm = BlockMatrix.from_numpy(spark, a, 10, 10)
    s = SparseBlockMatrix.from_dense(bm)
    assert np.array_equal(s.to_dense().to_numpy(), a)


def test_nnz_and_sum(spark, rng):
    a = _masked(rng, (50, 20))
    s = SparseBlockMatrix.from_dense(BlockMatrix.from_numpy(spark, a, 10, 10))
    assert s.nnz() == int((a != 0).sum())
    assert abs(s.sum() - a.sum()) < 1e-9


def test_col_sums_reference_workload(spark, rng):
    """The reference's exact shape: (100, 10) in (10, 10) chunks,
    x[x < 0.95] = 0, sum(axis=0)[:10]."""
    a = _masked(rng, (100, 10))
    s = SparseBlockMatrix.from_dense(BlockMatrix.from_numpy(spark, a, 10, 10))
    got = s.col_sums()[:10]
    assert np.allclose(got, a.sum(axis=0)[:10], atol=1e-9)


def test_col_sums_ragged_edge_blocks(spark, rng):
    a = _masked(rng, (37, 23))
    s = SparseBlockMatrix.from_dense(BlockMatrix.from_numpy(spark, a, 10, 10))
    assert np.allclose(s.col_sums(), a.sum(axis=0), atol=1e-9)


def test_map_values(spark, rng):
    a = _masked(rng, (30, 30))
    s = SparseBlockMatrix.from_dense(BlockMatrix.from_numpy(spark, a, 10, 10))
    doubled = s.map_values(lambda v: v * 2.0)
    assert np.allclose(doubled.to_dense().to_numpy(), a * 2.0, atol=1e-12)
    assert doubled.nnz() == s.nnz()


def test_all_zero_block(spark):
    a = np.zeros((20, 20))
    a[0, 0] = 5.0  # one nonzero so only block (0,0) has entries
    s = SparseBlockMatrix.from_dense(BlockMatrix.from_numpy(spark, a, 10, 10))
    assert s.nnz() == 1
    assert np.array_equal(s.to_dense().to_numpy(), a)
    assert np.allclose(s.col_sums(), a.sum(axis=0), atol=1e-12)
