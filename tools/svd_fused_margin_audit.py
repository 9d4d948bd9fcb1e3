"""Margin audit for the r18 svd_compressed single-pass fusion (VERDICT r17
Next #6).

The fusion computes B = Qᵀ·A as driver-side R⁻ᵀ·(AᵀY)ᵀ instead of a second
distributed pass transpose_matvec(Q).  Exact-arithmetic-identical, but the
float bits of B (hence σ) shift by ~cond(R)·eps, and the declared queries
emit floor(σ·scale+.5) integers against literal VALUES oracles — so before
shipping, measure on the ACTUAL driver workloads:

  1. |σ_new − σ_old| per rank (the shift the fusion introduces);
  2. the rounded integers old vs new (must be identical);
  3. each σ's margin to its nearest rounding boundary under BOTH paths
     (must dwarf cross-host BLAS drift ~1e-9·σ, same bar _sigma_rows uses).

Replicates the distributed arithmetic bit-exactly in numpy: per-block
_gen_block streams, sketch partial dots summed bj-ascending, tmv partials
summed bi-ascending, TSQR per-block QR -> stacked-R QR with sign
canonicalization — the same LAPACK calls on the same doubles in the same
order as the executors perform them.

Usage: python tools/svd_fused_margin_audit.py   (writes JSON to stdout)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wukong_spark.blockmatrix import _gen_block, _grid  # noqa: E402


def gen_blocks(seed, n, m, br, bc):
    gr, gc = _grid(n, br), _grid(m, bc)
    blocks = {}
    for bi in range(gr):
        for bj in range(gc):
            r = min(br, n - bi * br)
            c = min(bc, m - bj * bc)
            blocks[(bi, bj)] = _gen_block(seed, bi * gc + bj, r, c)
    return blocks, gr, gc


def sketch(blocks, gr, gc, bc, w):
    """Y = A·W, partials summed bj-ascending (the acc sort order)."""
    y = {}
    for bi in range(gr):
        total = None
        for bj in range(gc):
            blk = blocks[(bi, bj)]
            wj = w[bj * bc : bj * bc + blk.shape[1], :]
            p = np.dot(blk, wj).ravel()
            total = p.copy() if total is None else total + p
        y[bi] = total.reshape(blocks[(bi, 0)].shape[0], w.shape[1])
    return y


def tmv(blocks, gr, gc, m, bc, y):
    """AᵀY, partials summed bi-ascending per bj (the acc sort order)."""
    p = next(iter(y.values())).shape[1]
    out = np.zeros((m, p))
    for bj in range(gc):
        total = None
        for bi in range(gr):
            part = np.dot(blocks[(bi, bj)].T, y[bi]).ravel()
            total = part.copy() if total is None else total + part
        c = min(bc, m - bj * bc)
        out[bj * bc : bj * bc + c, :] = total.reshape(c, p)
    return out


def tsqr(y, gr):
    """Direct-path TSQR: per-block QR, stacked-R QR, sign-canonicalized."""
    q1s, pieces, offsets, off = {}, [], {}, 0
    for bi in range(gr):
        q1, r1 = np.linalg.qr(y[bi], mode="reduced")
        q1s[bi] = np.ascontiguousarray(q1)
        r1 = np.ascontiguousarray(r1)
        offsets[bi] = (off, r1.shape[0])
        pieces.append(r1)
        off += r1.shape[0]
    q2, r_final = np.linalg.qr(np.vstack(pieces), mode="reduced")
    signs = np.sign(np.diag(r_final))
    signs[signs == 0] = 1.0
    r_final = r_final * signs[:, None]
    q2 = q2 * signs[None, :]
    q = {bi: np.dot(q1s[bi], q2[o : o + k, :]) for bi, (o, k) in offsets.items()}
    return q, r_final


def run(name, n, m, bs, seed, sk_seed, n_iter, k=5, oversample=10, scale=1000.0):
    blocks, gr, gc = gen_blocks(seed, n, m, bs, bs)
    p = k + oversample
    rng = np.random.default_rng(sk_seed)
    omega = rng.standard_normal((m, p))

    y = sketch(blocks, gr, gc, bs, omega)
    z = tmv(blocks, gr, gc, m, bs, y)
    for _ in range(n_iter):
        zq, _ = np.linalg.qr(z, mode="reduced")
        y = sketch(blocks, gr, gc, bs, zq)
        z = tmv(blocks, gr, gc, m, bs, y)
    q, r_final = tsqr(y, gr)

    # OLD path: B = transpose_matvec(Q).T — a second full pass over A
    b_old = tmv(blocks, gr, gc, m, bs, q).T
    s_old = np.linalg.svd(b_old, compute_uv=False)[:k]
    # NEW path: B = R⁻ᵀ·Zᵀ — Z came free from the fused sketch pass
    b_new = np.linalg.solve(r_final.T, z.T)
    ub, s_new_full, _ = np.linalg.svd(b_new, full_matrices=False)
    s_new = s_new_full[:k]

    def ints(s):
        return [int(np.floor(float(v) * scale + 0.5)) for v in s]

    def margins(s):
        x = np.asarray([float(v) for v in s]) * scale + 0.5
        fr = x % 1.0
        return np.minimum(fr, 1.0 - fr).round(6).tolist()

    # U orthonormality under the new path (la_svd_compressed_check's gate)
    u = np.vstack([np.dot(q[bi], ub[:, :k]) for bi in range(gr)])
    orth_err_new = float(np.abs(u.T @ u - np.eye(k)).max())

    return {
        "workload": name,
        "dims": [n, m, bs],
        "n_iter": n_iter,
        "ints_old": ints(s_old),
        "ints_new": ints(s_new),
        "ints_equal": ints(s_old) == ints(s_new),
        "max_abs_sigma_shift": float(np.abs(s_old - s_new).max()),
        "margin_old": margins(s_old),
        "margin_new": margins(s_new),
        "min_margin_new": float(min(margins(s_new))),
        "cond_R": float(np.linalg.cond(r_final)),
        "orth_err_new": orth_err_new,
    }


def main():
    out = [
        # la_svd_compressed_sigma (all SFs) + la_svd_compressed_check input
        run("la_svd_compressed_sigma", 2000, 1000, 500, 13, 1, 1),
        # la_svd_compressed_ref sf>=0.1 branch
        run("la_svd_compressed_ref@sf0.1", 10000, 10000, 1000, 41, 2, 0),
        # la_svd_compressed_ref sf<0.1 branch
        run("la_svd_compressed_ref@small", 2500, 1250, 625, 41, 2, 0),
    ]
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
