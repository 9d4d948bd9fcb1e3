"""Sparse (COO) block support (SURVEY.md §2.2 B-II, sparse-arrays row).

Reference capability: converting a chunked dense array's blocks to
`sparse.COO` and reducing over the result —
`/root/reference/Static Scheduler/wukong/tests/test_collections.py:179-190`
(`x[x < 0.95] = 0; s = x.map_blocks(sparse.COO); c.compute(s.sum(axis=0)[:10])`)
— the one test_collections workload round 2 left without a mirror.

Spark-first design: a sparse matrix is a DataFrame of COO blocks
``(bi, bj, nnz, rows, cols, vals)`` — ``rows``/``cols`` are int32 index
buffers, ``vals`` the float64 nonzeros.  Conversion and reductions are
per-block mapInArrow (shuffle-free); ``nnz`` is a plain long column so
counting total nonzeros is a pure JVM aggregate that never touches the
value buffers.  At 100 TB the win over dense blocks is exactly the COO
win: shuffle/cache volume drops from O(rows·cols) to O(nnz) per block,
and reductions stream the nonzeros only.

The `sparse` pip package is NOT required (absent from this container):
COO layout is three parallel numpy arrays, which is all the reference's
workload exercises.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wukong_spark.blockmatrix import BLOCK_SCHEMA, BlockMatrix, _grid

SPARSE_SCHEMA = "bi int, bj int, nnz long, rows binary, cols binary, vals binary"


def _pa_sparse_schema(pa):
    return pa.schema(
        [
            ("bi", pa.int32()),
            ("bj", pa.int32()),
            ("nnz", pa.int64()),
            ("rows", pa.binary()),
            ("cols", pa.binary()),
            ("vals", pa.binary()),
        ]
    )


@dataclass
class SparseBlockMatrix:
    """Distributed sparse matrix of COO blocks (missing block ≡ all-zero)."""

    df: DataFrame
    n_rows: int
    n_cols: int
    block_rows: int
    block_cols: int

    @property
    def grid_rows(self) -> int:
        return _grid(self.n_rows, self.block_rows)

    @property
    def grid_cols(self) -> int:
        return _grid(self.n_cols, self.block_cols)

    # -- conversion (x.map_blocks(sparse.COO)) ----------------------------
    @staticmethod
    def from_dense(dense: BlockMatrix) -> "SparseBlockMatrix":
        """Blockwise dense→COO, the `map_blocks(sparse.COO)` mirror.
        Shuffle-free: each dense block maps to one COO block in place."""
        br, bc = dense.block_rows, dense.block_cols
        n, m = dense.n_rows, dense.n_cols

        def conv(batches) -> Iterator:
            import pyarrow as pa

            schema = _pa_sparse_schema(pa)
            for rb in batches:
                bi_c, bj_c, d_c = rb.column("bi"), rb.column("bj"), rb.column("data")
                out: dict[str, list] = {k: [] for k in ("bi", "bj", "nnz", "rows", "cols", "vals")}
                for i in range(rb.num_rows):
                    bi, bj = bi_c[i].as_py(), bj_c[i].as_py()
                    r = min(br, n - bi * br)
                    c = min(bc, m - bj * bc)
                    blk = np.frombuffer(d_c[i].as_buffer(), dtype=np.float64).reshape(r, c)
                    ri, ci = np.nonzero(blk)
                    out["bi"].append(bi)
                    out["bj"].append(bj)
                    out["nnz"].append(int(ri.size))
                    out["rows"].append(ri.astype(np.int32).tobytes())
                    out["cols"].append(ci.astype(np.int32).tobytes())
                    out["vals"].append(np.ascontiguousarray(blk[ri, ci]).tobytes())
                yield pa.RecordBatch.from_pydict(out, schema=schema)

        return SparseBlockMatrix(dense.df.mapInArrow(conv, SPARSE_SCHEMA), n, m, br, bc)

    def to_dense(self) -> BlockMatrix:
        """Blockwise COO→dense (the `.todense()`/compute path)."""
        br, bc = self.block_rows, self.block_cols
        n, m = self.n_rows, self.n_cols

        def conv(batches) -> Iterator:
            import pyarrow as pa

            schema = pa.schema(
                [("bi", pa.int32()), ("bj", pa.int32()), ("data", pa.binary())]
            )
            for rb in batches:
                bi_c, bj_c = rb.column("bi"), rb.column("bj")
                r_c, c_c, v_c = rb.column("rows"), rb.column("cols"), rb.column("vals")
                out: dict[str, list] = {"bi": [], "bj": [], "data": []}
                for i in range(rb.num_rows):
                    bi, bj = bi_c[i].as_py(), bj_c[i].as_py()
                    r = min(br, n - bi * br)
                    c = min(bc, m - bj * bc)
                    blk = np.zeros((r, c))
                    ri = np.frombuffer(r_c[i].as_buffer(), dtype=np.int32)
                    ci = np.frombuffer(c_c[i].as_buffer(), dtype=np.int32)
                    blk[ri, ci] = np.frombuffer(v_c[i].as_buffer(), dtype=np.float64)
                    out["bi"].append(bi)
                    out["bj"].append(bj)
                    out["data"].append(blk.tobytes())
                yield pa.RecordBatch.from_pydict(out, schema=schema)

        return BlockMatrix(self.df.mapInArrow(conv, BLOCK_SCHEMA), n, m, br, bc)

    # -- elementwise ------------------------------------------------------
    def map_values(self, fn: Callable[[np.ndarray], np.ndarray]) -> "SparseBlockMatrix":
        """Elementwise op over the STORED nonzeros (COO semantics: requires
        fn(0) = 0, same contract sparse.COO enforces for its ufuncs)."""

        def run(batches) -> Iterator:
            import pyarrow as pa

            schema = _pa_sparse_schema(pa)
            for rb in batches:
                cols = {k: rb.column(k) for k in ("bi", "bj", "nnz", "rows", "cols")}
                v_c = rb.column("vals")
                out: dict[str, list] = {k: [] for k in ("bi", "bj", "nnz", "rows", "cols", "vals")}
                for i in range(rb.num_rows):
                    for k, c in cols.items():
                        out[k].append(c[i].as_py())  # index buffers pass through
                    v = np.frombuffer(v_c[i].as_buffer(), dtype=np.float64)
                    out["vals"].append(np.ascontiguousarray(fn(v)).tobytes())
                yield pa.RecordBatch.from_pydict(out, schema=schema)

        return SparseBlockMatrix(
            self.df.mapInArrow(run, SPARSE_SCHEMA),
            self.n_rows, self.n_cols, self.block_rows, self.block_cols,
        )

    # -- reductions -------------------------------------------------------
    def nnz(self) -> int:
        """Total stored nonzeros — a pure JVM aggregate over the nnz column
        (the value buffers are never deserialized)."""
        out = self.df.agg(F.sum("nnz")).collect()[0][0]
        return int(out or 0)

    def sum(self) -> float:
        """Grand sum of nonzeros: per-block partial + Spark agg."""

        def part(batches) -> Iterator:
            import pyarrow as pa

            for rb in batches:
                v_c = rb.column("vals")
                vals = [
                    float(np.frombuffer(v_c[i].as_buffer(), dtype=np.float64).sum())
                    for i in range(rb.num_rows)
                ]
                yield pa.RecordBatch.from_pydict(
                    {"s": vals}, schema=pa.schema([("s", pa.float64())])
                )

        out = self.df.mapInArrow(part, "s double").agg(F.sum("s")).collect()[0][0]
        return float(out or 0.0)

    def col_sums(self) -> np.ndarray:
        """Column sums (the reference workload's s.sum(axis=0)): per-block
        bincount over the nonzeros → merge per block column → driver
        assemble.  Cost is O(nnz), never O(rows·cols)."""
        bc, m = self.block_cols, self.n_cols

        def part(batches) -> Iterator:
            import pyarrow as pa

            schema = pa.schema([("bj", pa.int32()), ("partial", pa.binary())])
            for rb in batches:
                bj_c = rb.column("bj")
                c_c, v_c = rb.column("cols"), rb.column("vals")
                out: dict[str, list] = {"bj": [], "partial": []}
                for i in range(rb.num_rows):
                    bj = bj_c[i].as_py()
                    c = min(bc, m - bj * bc)
                    ci = np.frombuffer(c_c[i].as_buffer(), dtype=np.int32)
                    v = np.frombuffer(v_c[i].as_buffer(), dtype=np.float64)
                    s = np.bincount(ci, weights=v, minlength=c)
                    out["bj"].append(bj)
                    out["partial"].append(s.tobytes())
                yield pa.RecordBatch.from_pydict(out, schema=schema)

        def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
            total = np.sum([np.frombuffer(p) for p in pdf["partial"]], axis=0)
            return pd.DataFrame({"bj": [key[0]], "partial": [total.tobytes()]})

        merged = (
            self.df.mapInArrow(part, "bj int, partial binary")
            .groupBy("bj")
            .applyInPandas(merge, "bj int, partial binary")
            .collect()
        )
        out = np.zeros(m)
        for row in merged:
            c = min(bc, m - row.bj * bc)
            out[row.bj * bc : row.bj * bc + c] = np.frombuffer(row.partial)
        return out
