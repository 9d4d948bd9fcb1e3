"""Block matrix multiply (reference: `README.md:250-271`,
`docs/examples/examples.rst:102-113`): C = A·B via the SUMMA join +
k-ordered accumulate; verified against numpy on the reassembled blocks."""

from __future__ import annotations

import numpy as np


def run(spark) -> bool:
    from wukong_spark.blockmatrix import BlockMatrix

    # scaled-down 10000x10000/1000-chunk benchmark shape
    a = BlockMatrix.random(spark, 512, 512, 128, 128, seed=1)
    b = BlockMatrix.random(spark, 512, 512, 128, 128, seed=2)
    c = a.matmul(b)
    err = float(np.abs(c.to_numpy() - a.to_numpy() @ b.to_numpy()).max())
    print(f"  gemm max_err={err:.2e}")
    return err < 1e-9


if __name__ == "__main__":
    from _common import report, session

    report("gemm", run(session()))
