"""Linear-algebra queries exposed through the driver contract.

Two flavors:
- `embed_gramian` — AᵀA over the embeddings table expressed RELATIONALLY
  (posexplode + join + agg, fully Catalyst-visible) with an exact DuckDB
  oracle.  The BLAS-blocked fast path for the same computation is
  BlockMatrix.gramian (tests/test_blockmatrix.py).
- `la_*` — the reference's flagship chunked-array workloads (GEMM, TSQR,
  tall-skinny SVD, compressed SVD, Cholesky — README.md:204-271,
  docs/examples/examples.rst:46-113) on seeded synthetic block matrices.
  Inputs are generated, not read from tables, so no SQL oracle exists —
  the driver records rows-only checks; the numpy-oracle correctness lives
  in tests/test_blockmatrix.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from wukong_spark.blockmatrix import BlockMatrix, cholesky_blocked
from wukong_spark.queries import query
from wukong_spark.queries.helpers import tbl


@query(
    "embed_gramian",
    oracle="""
    WITH ex AS (
      SELECT vec_id, s.i AS i, CAST(embedding[s.i] AS DOUBLE) AS x
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) s
      WHERE vec_id < 1000
    )
    SELECT a.i AS i, b.i AS j, ROUND(SUM(a.x * b.x), 6) AS g
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
)
def embed_gramian(spark: SparkSession, sf_dir: str):
    """Gramian AᵀA of the embedding matrix, upper triangle, relational form.

    Shape: posexplode (64 rows per vector) → self-join on vec_id (row-local,
    no skew) → hash agg on (i, j).  All codegen; the pandas-UDF/BLAS variant
    is BlockMatrix.gramian.  Round-6 absorbs summation-order float drift.
    """
    e = tbl(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    ex = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i0", "x"),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.i") <= F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.round(F.sum(F.col("a.x") * F.col("b.x")), 6).alias("g"))
    )


@query("la_gemm_block_norms", headline=True)
def la_gemm_block_norms(spark: SparkSession, sf_dir: str):
    """GEMM (README.md:250-271): C = A·B on seeded 1024² matrices,
    256-blocks; returns per-output-block Frobenius norms.

    The SUMMA join + in-order accumulate makes the result deterministic, so
    repeated runs hash identically (rows-only driver check)."""
    a = BlockMatrix.random(spark, 1024, 1024, 256, 256, seed=11)
    b = BlockMatrix.random(spark, 1024, 1024, 256, 256, seed=22)
    c = a.matmul(b)

    import pandas as pd  # local import keeps the closure light

    def fro(batches):
        for pdf in batches:
            out = [
                (int(bi), int(bj), round(float(np.sqrt((np.frombuffer(d) ** 2).sum())), 4))
                for bi, bj, d in zip(pdf["bi"], pdf["bj"], pdf["data"])
            ]
            yield pd.DataFrame(out, columns=["bi", "bj", "fro"])

    return c.df.mapInPandas(fro, "bi int, bj int, fro double")


@query("la_tsqr_factors", headline=True)
def la_tsqr_factors(spark: SparkSession, sf_dir: str):
    """TSQR (docs/examples/examples.rst:72-82) on a seeded 8192×32 matrix
    (scaled-down 262144×128 benchmark); returns quality metrics."""
    a = BlockMatrix.random(spark, 8192, 32, 1024, 32, seed=5)
    q, r = a.tsqr()
    qn = q.to_numpy()
    an = a.to_numpy()
    orth_err = float(np.abs(qn.T @ qn - np.eye(32)).max())
    recon_err = float(np.abs(qn @ r - an).max())
    return spark.createDataFrame(
        [(round(orth_err, 10) < 1e-8, round(recon_err, 10) < 1e-8, 32)],
        "orthonormal boolean, reconstructs boolean, rank int",
    )


@query("la_svd_tall_skinny_sigma", headline=True)
def la_svd_tall_skinny_sigma(spark: SparkSession, sf_dir: str):
    """Tall-skinny SVD (README.md:204-225) on seeded 20000×16, 2500-row
    blocks (scaled-down 200000×1000 benchmark); returns singular values."""
    a = BlockMatrix.random(spark, 20000, 16, 2500, 16, seed=9)
    _, s, _ = a.svd_tall_skinny()
    return spark.createDataFrame(
        [(i, round(float(v), 6)) for i, v in enumerate(s)], "rank int, sigma double"
    )


@query("la_svd_compressed_sigma", headline=True)
def la_svd_compressed_sigma(spark: SparkSession, sf_dir: str):
    """Compressed/randomized SVD k=5 (README.md:227-248, svd2.py:44-45) on
    a seeded 2000×1000 matrix, 500-blocks (scaled-down 10000×10000)."""
    a = BlockMatrix.random(spark, 2000, 1000, 500, 500, seed=13)
    _, s, _ = a.svd_compressed(k=5, seed=1)
    return spark.createDataFrame(
        [(i, round(float(v), 6)) for i, v in enumerate(s)], "rank int, sigma double"
    )


@query("la_cholesky_check", headline=True)
def la_cholesky_check(spark: SparkSession, sf_dir: str):
    """Cholesky (docs/examples/examples.rst:84-100) on the doc's own SPD
    input tril(ones(100,100)) @ its transpose, 25-blocks."""
    t = np.tril(np.ones((100, 100)))
    spd = t @ t.T
    m = BlockMatrix.from_numpy(spark, spd, 25, 25)
    l_mat = cholesky_blocked(m)
    ok = bool(np.allclose(l_mat @ l_mat.T, spd, atol=1e-8))
    return spark.createDataFrame(
        [(ok, float(round(np.abs(l_mat @ l_mat.T - spd).max(), 10)))],
        "reconstructs boolean, max_err double",
    )
