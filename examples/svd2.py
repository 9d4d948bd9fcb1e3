"""Compressed (randomized) SVD, k=5 (reference:
`Static Scheduler/examples/svd2.py:44-45`, `README.md:227-248`): HMT
sketch + TSQR on a seeded square block matrix; top-k singular values
checked against the dense numpy SVD."""

from __future__ import annotations

import numpy as np


def run(spark) -> bool:
    from wukong_spark.blockmatrix import BlockMatrix

    # scaled-down 10000x10000/2000-chunk benchmark shape
    a = BlockMatrix.random(spark, 800, 400, 200, 200, seed=3)
    u, s, vt = a.svd_compressed(k=5, seed=1)
    s_true = np.linalg.svd(a.to_numpy(), compute_uv=False)[:5]
    rel = float(np.abs(s - s_true).max() / s_true[0])
    print(f"  top-5 sigma={np.round(s, 3)} rel_err={rel:.2e}")
    return rel < 0.05


if __name__ == "__main__":
    from _common import report, session

    report("svd2_compressed", run(session()))
