"""Margin audit for the embed_lsh_neardup_pairs numpy rewrite (r18,
VERDICT r17 #5).

The entry's pair stage decides three float questions per candidate pair:
(1) bucket membership — sign of 8 hyperplane dots per vector; (2) the
cos > 0.5 keep filter; (3) the ROUND(cos, 4) output value.  Moving the
pair stage from the JVM HOF (strict left-to-right float64 summation) to
numpy dgemm (pairwise/SIMD summation) changes summation ORDER, so the
rewrite is only safe if no decision sits within the reordering error
(~1e-13 for 64-term O(1) dots).  This tool measures, on the actual
driver data at every SF:

- min |plane·v| over all (vector, plane) pairs      (sign margin)
- min |cos − 0.5| over ALL within-bucket pairs      (threshold margin)
- min distance of cos·1e4 to a .5 rounding boundary
  over surviving pairs                               (rounding margin)
- max |cos_seq − cos_blas| over all pairs            (actual reorder error)

The rewrite additionally carries a runtime guard (recompute
sequentially when within 1e-6 of a boundary), so the audit's job is to
show the guard band dwarfs the reorder error, not to prove margins can
never shrink on regenerated data.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

N_PLANES = 8
PLANES = np.array(
    [
        [(((7 * (i + 11 * j) + 5) % 13) - 6) / 10.0 for i in range(64)]
        for j in range(N_PLANES)
    ]
)


def seq_dot(a: np.ndarray, b: np.ndarray) -> float:
    acc = 0.0
    for x, y in zip(a.tolist(), b.tolist()):
        acc += x * y
    return acc


def audit(sf_dir: str) -> None:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding::DOUBLE[] FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows])
    n = len(ids)

    # (1) bucket sign margins (sequential dots, as the JVM computes them)
    dots = np.empty((n, N_PLANES))
    for i in range(n):
        for j in range(N_PLANES):
            dots[i, j] = seq_dot(V[i], PLANES[j])
    sign_margin = float(np.abs(dots).min())
    buckets = (dots >= 0).astype(np.int64) @ (1 << np.arange(N_PLANES))

    # sequential norms (JVM order)
    nrm_seq = np.array([np.sqrt(seq_dot(V[i], V[i])) for i in range(n)])
    nrm_blas = np.sqrt(np.einsum("ij,ij->i", V, V))

    thr_margin = np.inf
    round_margin = np.inf
    reorder_err = 0.0
    n_pairs = n_keep = 0
    for b in np.unique(buckets):
        idx = np.where(buckets == b)[0]
        if len(idx) < 2:
            continue
        Vb = V[idx]
        G = Vb @ Vb.T
        for p in range(len(idx)):
            for q in range(p + 1, len(idx)):
                i, j = idx[p], idx[q]
                cos_seq = seq_dot(V[i], V[j]) / (nrm_seq[i] * nrm_seq[j])
                cos_blas = G[p, q] / (nrm_blas[idx[p]] * nrm_blas[idx[q]])
                n_pairs += 1
                reorder_err = max(reorder_err, abs(cos_seq - cos_blas))
                thr_margin = min(thr_margin, abs(cos_seq - 0.5))
                if cos_seq > 0.5:
                    n_keep += 1
                    frac = abs(cos_seq * 1e4 - np.floor(cos_seq * 1e4) - 0.5)
                    round_margin = min(round_margin, frac / 1e4)
    print(
        f"{sf_dir}: n={n} pairs={n_pairs} kept={n_keep} "
        f"sign_margin={sign_margin:.3e} thr_margin={thr_margin:.3e} "
        f"round_margin={round_margin:.3e} reorder_err={reorder_err:.3e}"
    )


if __name__ == "__main__":
    for sf in sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        audit(sf)
