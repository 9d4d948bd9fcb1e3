"""Tall-skinny SVD (reference: `Static Scheduler/examples/svd1.py`,
`README.md:204-225`): seeded random block matrix → distributed Gramian →
driver eigendecomposition; verified by reconstruction."""

from __future__ import annotations

import numpy as np


def run(spark) -> bool:
    from wukong_spark.blockmatrix import BlockMatrix

    # scaled-down 200000x1000/10000-chunk benchmark shape
    a = BlockMatrix.random(spark, 4000, 16, 500, 16, seed=7)
    u, s, vt = a.svd_tall_skinny()
    approx = u.to_numpy() @ np.diag(s) @ vt
    err = float(np.abs(approx - a.to_numpy()).max())
    print(f"  sigma_max={s[0]:.4f} recon_err={err:.2e}")
    return err < 1e-8


if __name__ == "__main__":
    from _common import report, session

    report("svd1_tall_skinny", run(session()))
