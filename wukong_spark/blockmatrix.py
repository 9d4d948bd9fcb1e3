"""Block-matrix linear algebra layer (SURVEY.md §2.2 B-II).

The reference's flagship workloads are chunked-ndarray jobs executed as Dask
graphs: random block generation (`/root/reference/README.md:220,243,265`),
GEMM (`README.md:250-271`), tall-skinny SVD (`README.md:204-225`),
compressed/randomized SVD (`README.md:227-248`,
`Static Scheduler/examples/svd2.py:44-45`), QR/TSQR
(`docs/examples/examples.rst:62-82`), Cholesky
(`docs/examples/examples.rst:84-100`), elementwise/transpose/reductions
(`Static Scheduler/wukong/tests/test_collections.py:90-95`).

Spark-first design (NOT a translation of Dask's task graphs):

- A distributed matrix is a DataFrame of blocks
  ``(bi int, bj int, data binary)`` — ``data`` is the row-major float64
  buffer of block (bi, bj).  Binary payloads move through Arrow batches;
  per-block math is numpy inside ``mapInPandas``/``applyInPandas`` (the
  sanctioned Python escape hatch — per-element Column math would be
  absurd here, per-block BLAS is the right granularity).
- Block generation is *deterministic per block id* regardless of
  partitioning or executor count (`np.random.Generator(PCG64(seed + bid))`),
  mirroring how dask seeds chunked RandomState.
- GEMM is the classic SUMMA join: A ⋈ B on the contraction index, per-pair
  ``np.dot`` partials, shuffle to (bi, bj), in-order accumulation →
  deterministic bitwise-stable sums.
- Reductions that produce *small* results (Gramian, R factors, singular
  values) land on the driver — everything O(matrix) stays distributed.

Scale notes: at 100 TB the same plans hold — the only driver-side
materializations are c×c / (k+p)×m factors.  Shuffle volume for GEMM is
one partial block per (i,k,j) triple, the textbook lower bound without
3D-replication tricks.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StructField,
    StructType,
)

BLOCK_SCHEMA = StructType(
    [
        StructField("bi", IntegerType(), False),
        StructField("bj", IntegerType(), False),
        StructField("data", BinaryType(), False),
    ]
)


def _grid(n: int, bs: int) -> int:
    return (n + bs - 1) // bs


@dataclass
class BlockMatrix:
    """Distributed dense matrix of float64 blocks.

    ``df`` columns: bi, bj, data (row-major float64 bytes of the block).
    Edge blocks are short (shape inferred from global dims).
    """

    df: DataFrame
    n_rows: int
    n_cols: int
    block_rows: int
    block_cols: int

    # -- geometry ---------------------------------------------------------
    @property
    def grid_rows(self) -> int:
        return _grid(self.n_rows, self.block_rows)

    @property
    def grid_cols(self) -> int:
        return _grid(self.n_cols, self.block_cols)

    def block_shape(self, bi: int, bj: int) -> tuple[int, int]:
        r = min(self.block_rows, self.n_rows - bi * self.block_rows)
        c = min(self.block_cols, self.n_cols - bj * self.block_cols)
        return r, c

    # -- constructors -----------------------------------------------------
    @staticmethod
    def random(
        spark: SparkSession,
        n_rows: int,
        n_cols: int,
        block_rows: int,
        block_cols: int,
        seed: int = 0,
    ) -> "BlockMatrix":
        """Seeded random matrix ≈ da.random.random((n, m), chunks=(br, bc)).

        Deterministic per block id — independent of partitioning, executor
        count, and scheduling order, so results are reproducible on any
        cluster size (the property dask gets from chunked RandomState).
        """
        nbr, nbc = _grid(n_rows, block_rows), _grid(n_cols, block_cols)

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bid in pdf["id"]:
                    bi, bj = int(bid) // nbc, int(bid) % nbc
                    r = min(block_rows, n_rows - bi * block_rows)
                    c = min(block_cols, n_cols - bj * block_cols)
                    rng = np.random.default_rng(seed + int(bid))
                    out.append((bi, bj, rng.random((r, c)).tobytes()))
                yield pd.DataFrame(out, columns=["bi", "bj", "data"])

        # one block per row, partition count set at range creation — no
        # repartition shuffle before generation
        df = spark.range(0, nbr * nbc, 1, min(nbr * nbc, 256)).mapInPandas(
            gen, BLOCK_SCHEMA
        )
        return BlockMatrix(df, n_rows, n_cols, block_rows, block_cols)

    @staticmethod
    def from_numpy(
        spark: SparkSession, a: np.ndarray, block_rows: int, block_cols: int
    ) -> "BlockMatrix":
        n, m = a.shape
        rows = []
        for bi in range(_grid(n, block_rows)):
            for bj in range(_grid(m, block_cols)):
                blk = a[
                    bi * block_rows : (bi + 1) * block_rows,
                    bj * block_cols : (bj + 1) * block_cols,
                ]
                rows.append((bi, bj, np.ascontiguousarray(blk, dtype=np.float64).tobytes()))
        df = spark.createDataFrame(rows, BLOCK_SCHEMA)
        return BlockMatrix(df, n, m, block_rows, block_cols)

    def to_numpy(self) -> np.ndarray:
        """Driver-side reassembly — tests/small results only."""
        out = np.zeros((self.n_rows, self.n_cols))
        for row in self.df.collect():
            r, c = self.block_shape(row.bi, row.bj)
            out[
                row.bi * self.block_rows : row.bi * self.block_rows + r,
                row.bj * self.block_cols : row.bj * self.block_cols + c,
            ] = np.frombuffer(row.data).reshape(r, c)
        return out

    # -- elementwise ------------------------------------------------------
    def _map_blocks(
        self, fn: Callable[[np.ndarray], np.ndarray], out_cols: int | None = None
    ) -> "BlockMatrix":
        """Blockwise map.  ``out_cols`` declares a column-count change
        (e.g. projecting p→k columns); requires a one-block-wide matrix."""
        br, bc, n, m = self.block_rows, self.block_cols, self.n_rows, self.n_cols
        if out_cols is not None:
            assert self.grid_cols == 1, "out_cols only for one-block-wide matrices"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                datas = []
                for bi, bj, data in zip(pdf["bi"], pdf["bj"], pdf["data"]):
                    r = min(br, n - int(bi) * br)
                    c = min(bc, m - int(bj) * bc)
                    blk = np.frombuffer(data).reshape(r, c)
                    datas.append(np.ascontiguousarray(fn(blk)).tobytes())
                yield pd.DataFrame({"bi": pdf["bi"], "bj": pdf["bj"], "data": datas})

        new_m = m if out_cols is None else out_cols
        new_bc = bc if out_cols is None else out_cols
        return BlockMatrix(
            self.df.mapInPandas(run, BLOCK_SCHEMA), n, new_m, br, new_bc
        )

    def scale(self, alpha: float) -> "BlockMatrix":
        return self._map_blocks(lambda b: b * alpha)

    def map_elementwise(self, fn: Callable[[np.ndarray], np.ndarray]) -> "BlockMatrix":
        """x.map_blocks-style elementwise op (shape-preserving)."""
        return self._map_blocks(fn)

    def _zip_blocks(
        self, other: "BlockMatrix", fn: Callable[[np.ndarray, np.ndarray], np.ndarray]
    ) -> "BlockMatrix":
        assert (self.n_rows, self.n_cols) == (other.n_rows, other.n_cols)
        assert (self.block_rows, self.block_cols) == (other.block_rows, other.block_cols)
        br, bc, n, m = self.block_rows, self.block_cols, self.n_rows, self.n_cols
        joined = self.df.alias("a").join(
            other.df.alias("b"),
            (F.col("a.bi") == F.col("b.bi")) & (F.col("a.bj") == F.col("b.bj")),
        ).select(
            F.col("a.bi").alias("bi"),
            F.col("a.bj").alias("bj"),
            F.col("a.data").alias("da"),
            F.col("b.data").alias("db"),
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi, bj, da, db in zip(pdf["bi"], pdf["bj"], pdf["da"], pdf["db"]):
                    r = min(br, n - int(bi) * br)
                    c = min(bc, m - int(bj) * bc)
                    x = np.frombuffer(da).reshape(r, c)
                    y = np.frombuffer(db).reshape(r, c)
                    out.append((int(bi), int(bj), np.ascontiguousarray(fn(x, y)).tobytes()))
                yield pd.DataFrame(out, columns=["bi", "bj", "data"])

        return BlockMatrix(joined.mapInPandas(run, BLOCK_SCHEMA), n, m, br, bc)

    def add(self, other: "BlockMatrix") -> "BlockMatrix":
        return self._zip_blocks(other, np.add)

    def subtract(self, other: "BlockMatrix") -> "BlockMatrix":
        return self._zip_blocks(other, np.subtract)

    def multiply(self, other: "BlockMatrix") -> "BlockMatrix":
        """Hadamard (elementwise) product."""
        return self._zip_blocks(other, np.multiply)

    def transpose(self) -> "BlockMatrix":
        br, bc, n, m = self.block_rows, self.block_cols, self.n_rows, self.n_cols

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi, bj, data in zip(pdf["bi"], pdf["bj"], pdf["data"]):
                    r = min(br, n - int(bi) * br)
                    c = min(bc, m - int(bj) * bc)
                    blk = np.frombuffer(data).reshape(r, c)
                    out.append((int(bj), int(bi), np.ascontiguousarray(blk.T).tobytes()))
                yield pd.DataFrame(out, columns=["bi", "bj", "data"])

        return BlockMatrix(self.df.mapInPandas(run, BLOCK_SCHEMA), m, n, bc, br)

    # -- reductions -------------------------------------------------------
    def frobenius_norm(self) -> float:
        """‖A‖_F via per-block partial sums + Spark agg (tree reduction)."""
        br, bc, n, m = self.block_rows, self.block_cols, self.n_rows, self.n_cols

        def sq(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                vals = [
                    float((np.frombuffer(d) ** 2).sum()) for d in pdf["data"]
                ]
                yield pd.DataFrame({"ss": vals})

        part = self.df.mapInPandas(sq, "ss double")
        total = part.agg(F.sum("ss")).collect()[0][0]
        return math.sqrt(total)

    def col_sums(self) -> np.ndarray:
        """Column sums (axis=0 reduction): per-block partial → driver combine."""
        bc, m = self.block_cols, self.n_cols
        br, n = self.block_rows, self.n_rows

        def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi, bj, data in zip(pdf["bi"], pdf["bj"], pdf["data"]):
                    r = min(br, n - int(bi) * br)
                    c = min(bc, m - int(bj) * bc)
                    s = np.frombuffer(data).reshape(r, c).sum(axis=0)
                    out.append((int(bj), s.tobytes()))
                yield pd.DataFrame(out, columns=["bj", "partial"])

        def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
            total = np.sum([np.frombuffer(p) for p in pdf["partial"]], axis=0)
            return pd.DataFrame({"bj": [key[0]], "partial": [total.tobytes()]})

        merged = (
            self.df.mapInPandas(part, "bj int, partial binary")
            .groupBy("bj")
            .applyInPandas(merge, "bj int, partial binary")
            .collect()
        )
        out = np.zeros(m)
        for row in merged:
            c = min(bc, m - row.bj * bc)
            out[row.bj * bc : row.bj * bc + c] = np.frombuffer(row.partial)
        return out

    def row_sums(self) -> np.ndarray:
        """Row sums (axis=1 reduction): per-block partial → driver combine."""
        bc, m = self.block_cols, self.n_cols
        br, n = self.block_rows, self.n_rows

        def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi, bj, data in zip(pdf["bi"], pdf["bj"], pdf["data"]):
                    r = min(br, n - int(bi) * br)
                    c = min(bc, m - int(bj) * bc)
                    s = np.frombuffer(data).reshape(r, c).sum(axis=1)
                    out.append((int(bi), s.tobytes()))
                yield pd.DataFrame(out, columns=["bi", "partial"])

        def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
            total = np.sum([np.frombuffer(p) for p in pdf["partial"]], axis=0)
            return pd.DataFrame({"bi": [key[0]], "partial": [total.tobytes()]})

        merged = (
            self.df.mapInPandas(part, "bi int, partial binary")
            .groupBy("bi")
            .applyInPandas(merge, "bi int, partial binary")
            .collect()
        )
        out = np.zeros(n)
        for row in merged:
            r = min(br, n - row.bi * br)
            out[row.bi * br : row.bi * br + r] = np.frombuffer(row.partial)
        return out

    def map_with_row_vector(
        self, vec: np.ndarray, fn: Callable[[np.ndarray, np.ndarray], np.ndarray]
    ) -> "BlockMatrix":
        """Numpy-style broadcasting against a per-ROW vector (length n_rows):
        each block sees its row-slice of `vec` — e.g. demeaning
        `x - x.mean(axis=1)[:, None]` (reference workload,
        `wukong/tests/test_collections.py:90-95`).

        Scale: `vec` ships once in the task closure (length-n driver array
        — fine for the tall-skinny shapes this layer targets; a huge n
        would instead join a (bi, slice) table)."""
        br, bc, n, m = self.block_rows, self.block_cols, self.n_rows, self.n_cols

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                datas = []
                for bi, bj, data in zip(pdf["bi"], pdf["bj"], pdf["data"]):
                    r = min(br, n - int(bi) * br)
                    c = min(bc, m - int(bj) * bc)
                    blk = np.frombuffer(data).reshape(r, c)
                    vslice = vec[int(bi) * br : int(bi) * br + r]
                    datas.append(
                        np.ascontiguousarray(fn(blk, vslice[:, None])).tobytes()
                    )
                yield pd.DataFrame(
                    {"bi": pdf["bi"], "bj": pdf["bj"], "data": datas}
                )

        return BlockMatrix(
            self.df.mapInPandas(run, BLOCK_SCHEMA), n, m, br, bc
        )

    def map_with_col_vector(
        self, vec: np.ndarray, fn: Callable[[np.ndarray, np.ndarray], np.ndarray]
    ) -> "BlockMatrix":
        """Broadcasting against a per-COLUMN vector (length n_cols):
        `x - x.mean(axis=0)` / feature standardization."""
        br, bc, n, m = self.block_rows, self.block_cols, self.n_rows, self.n_cols

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                datas = []
                for bi, bj, data in zip(pdf["bi"], pdf["bj"], pdf["data"]):
                    r = min(br, n - int(bi) * br)
                    c = min(bc, m - int(bj) * bc)
                    blk = np.frombuffer(data).reshape(r, c)
                    vslice = vec[int(bj) * bc : int(bj) * bc + c]
                    datas.append(
                        np.ascontiguousarray(fn(blk, vslice[None, :])).tobytes()
                    )
                yield pd.DataFrame(
                    {"bi": pdf["bi"], "bj": pdf["bj"], "data": datas}
                )

        return BlockMatrix(
            self.df.mapInPandas(run, BLOCK_SCHEMA), n, m, br, bc
        )

    # -- GEMM (SUMMA join) -------------------------------------------------
    def matmul(self, other: "BlockMatrix") -> "BlockMatrix":
        """C = A @ B — the canonical Spark SUMMA:
        join on the contraction index, per-pair np.dot, in-order accumulate.

        Determinism: partials are sorted by k before summation inside each
        (bi, bj) group, so the float result is bitwise-reproducible and
        matches a numpy oracle that accumulates in the same k order.
        """
        assert self.n_cols == other.n_rows, "inner dims must agree"
        assert self.block_cols == other.block_rows, "inner block dims must agree"
        A, B = self, other
        br, bc = A.block_rows, B.block_cols
        n, m = A.n_rows, B.n_cols
        kbs = A.block_cols
        kdim = A.n_cols

        joined = A.df.alias("a").join(
            B.df.alias("b"), F.col("a.bj") == F.col("b.bi")
        ).select(
            F.col("a.bi").alias("bi"),
            F.col("b.bj").alias("bj"),
            F.col("a.bj").alias("k"),
            F.col("a.data").alias("da"),
            F.col("b.data").alias("db"),
        )

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi, bj, k, da, db in zip(
                    pdf["bi"], pdf["bj"], pdf["k"], pdf["da"], pdf["db"]
                ):
                    ra = min(br, n - int(bi) * br)
                    cb = min(bc, m - int(bj) * bc)
                    kk = min(kbs, kdim - int(k) * kbs)
                    x = np.frombuffer(da).reshape(ra, kk)
                    y = np.frombuffer(db).reshape(kk, cb)
                    out.append((int(bi), int(bj), int(k), np.dot(x, y).tobytes()))
                yield pd.DataFrame(out, columns=["bi", "bj", "k", "p"])

        partials = joined.mapInPandas(partial, "bi int, bj int, k int, p binary")

        def accumulate(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("k")  # deterministic summation order
            acc = None
            for p in pdf["p"]:
                blk = np.frombuffer(p)
                acc = blk.copy() if acc is None else acc + blk
            return pd.DataFrame({"bi": [key[0]], "bj": [key[1]], "data": [acc.tobytes()]})

        out_df = partials.groupBy("bi", "bj").applyInPandas(accumulate, BLOCK_SCHEMA)
        return BlockMatrix(out_df, n, m, br, bc)

    # -- factorizations ---------------------------------------------------
    def gramian(self) -> np.ndarray:
        """AᵀA for tall-skinny A (n_cols small): per-block AᵢᵀAᵢ → sum.

        The reduction is Spark's partial+final agg over c×c buffers — the
        tree-reduction pattern of the reference's SVD path (README.md:204).
        """
        c_total = self.n_cols
        br, n = self.block_rows, self.n_rows
        assert self.grid_cols == 1, "gramian: matrix must be one block wide"

        def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi, data in zip(pdf["bi"], pdf["data"]):
                    r = min(br, n - int(bi) * br)
                    blk = np.frombuffer(data).reshape(r, c_total)
                    out.append((0, np.dot(blk.T, blk).tobytes()))
                yield pd.DataFrame(out, columns=["g", "gram"])

        def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
            total = np.sum([np.frombuffer(p) for p in pdf["gram"]], axis=0)
            return pd.DataFrame({"g": [0], "gram": [total.tobytes()]})

        rows = (
            self.df.mapInPandas(part, "g int, gram binary")
            .groupBy("g")
            .applyInPandas(merge, "g int, gram binary")
            .collect()
        )
        return np.frombuffer(rows[0].gram).reshape(c_total, c_total)

    def tsqr(self) -> tuple["BlockMatrix", np.ndarray]:
        """Direct TSQR (docs/examples/examples.rst:72-82; Benson et al.).

        Pass 1 (distributed): per-block-row QR → Q1ᵢ stays on executors,
        small R1ᵢ (c×c) to the driver.  Driver: QR of the stacked R1s →
        Q2, R.  Pass 2 (distributed): Qᵢ = Q1ᵢ · Q2ᵢ-slice (slice broadcast
        in the task closure).  Orthonormality holds even for rank-deficient
        input (unlike the A·R⁻¹ shortcut).  Driver memory is
        O(grid_rows · c²); a tree-merge of R factors drops in when
        grid_rows explodes.

        Returns (Q as BlockMatrix, R as numpy (c×c)).
        """
        c = self.n_cols
        br, n = self.block_rows, self.n_rows
        assert self.grid_cols == 1, "tsqr: matrix must be one block wide"

        def local_qr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi, data in zip(pdf["bi"], pdf["data"]):
                    r = min(br, n - int(bi) * br)
                    blk = np.frombuffer(data).reshape(r, c)
                    q1, r1 = np.linalg.qr(blk, mode="reduced")
                    out.append(
                        (int(bi), np.ascontiguousarray(q1).tobytes(),
                         np.ascontiguousarray(r1).tobytes())
                    )
                yield pd.DataFrame(out, columns=["bi", "q1", "r1"])

        stage1 = self.df.mapInPandas(
            local_qr, "bi int, q1 binary, r1 binary"
        ).persist()
        r_rows = stage1.select("bi", "r1").collect()
        r_rows.sort(key=lambda x: x.bi)
        # per-block R1 has min(r_i, c) rows; track offsets into the stack
        offsets: dict[int, tuple[int, int]] = {}
        pieces = []
        off = 0
        for row in r_rows:
            ki = np.frombuffer(row.r1).size // c
            offsets[row.bi] = (off, ki)
            pieces.append(np.frombuffer(row.r1).reshape(ki, c))
            off += ki
        q2, r_final = np.linalg.qr(np.vstack(pieces), mode="reduced")
        # canonicalize: non-negative diagonal of R (flip matching Q2 columns)
        signs = np.sign(np.diag(r_final))
        signs[signs == 0] = 1.0
        r_final = r_final * signs[:, None]
        q2 = q2 * signs[None, :]
        q2_slices = {bi: q2[o : o + k, :] for bi, (o, k) in offsets.items()}

        def emit_q(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi, q1buf in zip(pdf["bi"], pdf["q1"]):
                    sl = q2_slices[int(bi)]
                    q1 = np.frombuffer(q1buf).reshape(-1, sl.shape[0])
                    out.append((int(bi), 0, np.dot(q1, sl).tobytes()))
                yield pd.DataFrame(out, columns=["bi", "bj", "data"])

        qdf = stage1.select("bi", "q1").mapInPandas(emit_q, BLOCK_SCHEMA)
        q = BlockMatrix(qdf, n, c, br, c)
        return q, r_final

    def svd_tall_skinny(self) -> tuple["BlockMatrix", np.ndarray, np.ndarray]:
        """SVD for tall-skinny A via the Gramian (README.md:204-225).

        AᵀA = V Σ² Vᵀ on the driver (c×c eigh), U = A·V·Σ⁻¹ blockwise.
        Returns (U BlockMatrix, s (c,), Vt (c×c)).
        """
        # persist across gramian + U projection; released before return —
        # U is lazy, so callers that materialize U later re-run the input
        # lineage (deterministic); persist the input themselves to avoid it
        self.df.persist()
        g = self.gramian()
        evals, evecs = np.linalg.eigh(g)
        order = np.argsort(evals)[::-1]
        evals, evecs = evals[order], evecs[:, order]
        s = np.sqrt(np.clip(evals, 0, None))
        inv_s = np.where(s > 1e-12, 1.0 / s, 0.0)
        proj = evecs * inv_s[None, :]
        u = self._map_blocks(lambda b: b @ proj)
        self.df.unpersist()
        return u, s, evecs.T

    def svd_compressed(
        self, k: int, seed: int = 0, oversample: int = 10, n_iter: int = 1
    ) -> tuple["BlockMatrix", np.ndarray, np.ndarray]:
        """Randomized SVD (da.linalg.svd_compressed — README.md:227-248,
        examples/svd2.py).  Halko-Martinsson-Tropp sketch:

        Y = A·Ω (Ω broadcast, m×(k+p))  →  TSQR(Y) → Q
        B = Qᵀ·A  ((k+p)×m, driver)      →  SVD(B) → Ũ, s, Vt
        U = Q·Ũ (blockwise)

        Power iterations (n_iter) sharpen the spectrum for slowly-decaying
        singular values; dask's default is 0 (`da.linalg.svd_compressed`
        n_power_iter=0) — we default to 1, trading one extra distributed
        pass for a tighter HMT error envelope on noisy spectra.
        """
        p = k + oversample
        rng = np.random.default_rng(seed)
        omega = rng.standard_normal((self.n_cols, p))
        # A is read by the sketch, every power iteration, and the final
        # projection (~2+2·n_iter jobs) — persist once instead of re-running
        # its lineage (e.g. the random generator) per job
        self.df.persist()

        def sketch(mat: "BlockMatrix", w: np.ndarray) -> "BlockMatrix":
            """Y = mat @ w with w broadcast to every block; sum over bj."""
            br = mat.block_rows
            n, m = mat.n_rows, mat.n_cols
            bc = mat.block_cols

            def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    out = []
                    for bi, bj, data in zip(pdf["bi"], pdf["bj"], pdf["data"]):
                        r = min(br, n - int(bi) * br)
                        c = min(bc, m - int(bj) * bc)
                        blk = np.frombuffer(data).reshape(r, c)
                        wj = w[int(bj) * bc : int(bj) * bc + c, :]
                        out.append((int(bi), int(bj), np.dot(blk, wj).tobytes()))
                    yield pd.DataFrame(out, columns=["bi", "k", "p"])

            partials = mat.df.mapInPandas(part, "bi int, k int, p binary")

            def acc(key, pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values("k")
                total = None
                for buf in pdf["p"]:
                    b = np.frombuffer(buf)
                    total = b.copy() if total is None else total + b
                return pd.DataFrame(
                    {"bi": [key[0]], "bj": [0], "data": [total.tobytes()]}
                )

            ydf = partials.groupBy("bi").applyInPandas(acc, BLOCK_SCHEMA)
            return BlockMatrix(ydf, n, w.shape[1], br, w.shape[1])

        y = sketch(self, omega)
        for _ in range(n_iter):
            # subspace iteration with DRIVER-side stabilization: the m×p
            # factor Z = AᵀY is small, so its QR runs locally — only the
            # final Y needs a distributed TSQR (saves 1 distributed
            # factorization per iteration vs. orthonormalizing Y each round)
            z = self.transpose_matvec(y)  # (m × p) on driver
            z, _ = np.linalg.qr(z, mode="reduced")
            y = sketch(self, z)
        q, _ = y.tsqr()
        b = self.transpose_matvec(q).T  # B = Qᵀ A, (p × m) on driver
        ub, s, vt = np.linalg.svd(b, full_matrices=False)
        u = q._map_blocks(lambda blk: blk @ ub[:, :k], out_cols=k)
        # released before return (same contract as svd_tall_skinny): U is
        # lazy; a caller that materializes U re-runs the input lineage —
        # persist the input (or U) yourself if you need U cheap
        self.df.unpersist()
        return u, s[:k], vt[:k, :]

    def transpose_matvec(self, other: "BlockMatrix") -> np.ndarray:
        """Aᵀ·Y for conformable tall-skinny Y (few cols) → small driver array.

        Computed as a single joined pass: per (bi) pair AᵢᵀYᵢ, summed by
        Spark agg — never materializes Aᵀ.
        """
        assert self.n_rows == other.n_rows and self.block_rows == other.block_rows
        p = other.n_cols
        m = self.n_cols
        br = self.block_rows
        bc = self.block_cols
        n = self.n_rows

        joined = self.df.alias("a").join(
            other.df.alias("y"), F.col("a.bi") == F.col("y.bi")
        ).select(
            F.col("a.bi").alias("bi"),
            F.col("a.bj").alias("bj"),
            F.col("a.data").alias("da"),
            F.col("y.data").alias("dy"),
        )

        def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for bi, bj, da, dy in zip(pdf["bi"], pdf["bj"], pdf["da"], pdf["dy"]):
                    r = min(br, n - int(bi) * br)
                    c = min(bc, m - int(bj) * bc)
                    a = np.frombuffer(da).reshape(r, c)
                    yv = np.frombuffer(dy).reshape(r, p)
                    out.append((int(bj), int(bi), np.dot(a.T, yv).tobytes()))
                yield pd.DataFrame(out, columns=["bj", "k", "p"])

        def acc(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("k")
            total = None
            for buf in pdf["p"]:
                b = np.frombuffer(buf)
                total = b.copy() if total is None else total + b
            return pd.DataFrame({"bj": [key[0]], "z": [total.tobytes()]})

        rows = (
            joined.mapInPandas(part, "bj int, k int, p binary")
            .groupBy("bj")
            .applyInPandas(acc, "bj int, z binary")
            .collect()
        )
        out = np.zeros((m, p))
        for row in rows:
            c = min(bc, m - row.bj * bc)
            out[row.bj * bc : row.bj * bc + c, :] = np.frombuffer(row.z).reshape(c, p)
        return out


def cholesky_blocked(a: BlockMatrix) -> np.ndarray:
    """Blocked right-looking Cholesky (docs/examples/examples.rst:84-100).

    The reference's own benchmark scale is 100×100 / 25-blocks — inherently
    sequential over block columns.  Round-1 implementation: stream blocks to
    the driver once, run the blocked algorithm locally (per-block BLAS),
    return L.  The distributed trailing-update variant (driver loop over
    block columns, each step a join + applyInPandas on the trailing
    submatrix) is the known scale path; at the reference's scale the
    sequential chain dominates and driver-local is strictly faster.
    """
    assert a.n_rows == a.n_cols
    mat = a.to_numpy()
    n = a.n_rows
    bs = a.block_rows
    nb = _grid(n, bs)
    l_mat = np.zeros_like(mat)
    for j in range(nb):
        j0, j1 = j * bs, min((j + 1) * bs, n)
        ajj = mat[j0:j1, j0:j1].copy()
        for k in range(j):
            k0, k1 = k * bs, min((k + 1) * bs, n)
            ljk = l_mat[j0:j1, k0:k1]
            ajj -= ljk @ ljk.T
        ljj = np.linalg.cholesky(ajj)
        l_mat[j0:j1, j0:j1] = ljj
        ljj_inv_t = np.linalg.inv(ljj).T
        for i in range(j + 1, nb):
            i0, i1 = i * bs, min((i + 1) * bs, n)
            aij = mat[i0:i1, j0:j1].copy()
            for k in range(j):
                k0, k1 = k * bs, min((k + 1) * bs, n)
                aij -= l_mat[i0:i1, k0:k1] @ l_mat[j0:j1, k0:k1].T
            l_mat[i0:i1, j0:j1] = aij @ ljj_inv_t
    return l_mat
