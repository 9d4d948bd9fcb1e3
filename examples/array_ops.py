"""Chunked-array manipulation tour (dask.array user-surface parity beyond
the reference's flagship factorizations): rechunk → slice → concatenate →
cumsum → least squares, composed on one distributed matrix.

The reference executes these as opaque dask graphs (SURVEY.md §1.1 — the
dask.array chunked-ndarray surface); here each is a first-class BlockMatrix
operator with its own plan shape (see wukong_spark/blockmatrix.py).
"""

from __future__ import annotations

import numpy as np


def run(spark) -> bool:
    from wukong_spark.blockmatrix import BlockMatrix

    a = BlockMatrix.random(spark, 600, 200, 128, 64, seed=3)
    a.df.persist()
    dense = a.to_numpy()

    # rechunk: pure data movement, bitwise-exact
    r = a.rechunk(100, 50)
    ok_rechunk = np.array_equal(r.to_numpy(), dense)

    # slice: block-pruned range read
    s = a.slice(50, 350, 20, 180)
    ok_slice = np.array_equal(s.to_numpy(), dense[50:350, 20:180])

    # concatenate: ragged blockings allowed
    b = BlockMatrix.random(spark, 100, 200, 30, 70, seed=4)
    v = a.vstack(b)
    ok_concat = np.array_equal(v.to_numpy(), np.vstack([dense, b.to_numpy()]))

    # cumsum: two-phase distributed prefix sum
    cs = a.cumsum_rows()
    ok_cumsum = np.allclose(cs.to_numpy(), np.cumsum(dense, axis=0), atol=1e-10)

    # map_overlap: ghost-cell stencil (3-row zero-padded vertical sum)
    def stencil(x):
        z = np.zeros((1, x.shape[1]))
        return (x + np.vstack([z, x[:-1]])) + np.vstack([x[1:], z])

    mo = a.map_overlap(stencil, depth=1)
    ok_overlap = np.array_equal(mo.to_numpy(), stencil(dense))

    # least squares: QR path, QᵀB reduced distributed
    xt = np.random.default_rng(5).standard_normal((200, 1))
    y = BlockMatrix.from_numpy(spark, dense @ xt, 128, 1)
    x = a.lstsq(y)
    ok_lstsq = np.abs(x - xt).max() < 1e-8

    a.df.unpersist()
    print(
        f"  rechunk={ok_rechunk} slice={ok_slice} concat={ok_concat}"
        f" cumsum={ok_cumsum} overlap={ok_overlap} lstsq={ok_lstsq}"
    )
    return all([ok_rechunk, ok_slice, ok_concat, ok_cumsum, ok_overlap, ok_lstsq])


if __name__ == "__main__":
    from _common import report, session

    report("array_ops", run(session()))
