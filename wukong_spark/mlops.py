"""Distributed model inference (SURVEY.md §2.2 B-IV).

Reference capability: `ParallelPostFit(SVC).predict(X).compute()` — fit a
model locally, broadcast it, predict in parallel over chunks
(`/root/reference/README.md:273-305`,
`docs/examples/examples.rst:119-141`).  Spark-first: broadcast the fitted
model once, run Arrow-batched `mapInPandas` over feature columns — the
cluster never re-serializes the model per row, and prediction is
vectorized per batch.

sklearn is optional in this environment: `predict_broadcast` takes ANY
object with a `.predict(ndarray) -> ndarray` method; `LinearModel` is a
self-contained numpy implementation used by tests (and a realistic stand-in
— an sklearn estimator drops into the same slot unchanged).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class LinearModel:
    """Minimal fitted linear classifier (decision = sign(Xw + b)).

    Stand-in for the reference's fitted SVC (linear kernel decision
    function is exactly this); any `.predict`-bearing object may replace it.
    """

    weights: np.ndarray
    bias: float

    def predict(self, x: np.ndarray) -> np.ndarray:
        return (x @ self.weights + self.bias >= 0).astype(np.int32)

    @staticmethod
    def fit(x: np.ndarray, y: np.ndarray, lr: float = 0.1, epochs: int = 200) -> "LinearModel":
        """Tiny batch-perceptron fit — deterministic, dependency-free."""
        w = np.zeros(x.shape[1])
        b = 0.0
        for _ in range(epochs):
            pred = (x @ w + b >= 0).astype(np.int32)
            err = y - pred
            w += lr * (x.T @ err) / len(y)
            b += lr * err.mean()
        return LinearModel(w, b)


@dataclass
class SoftmaxModel:
    """Minimal fitted multiclass linear classifier: argmax of K linear
    scores.  Pairs with `softmax_fit_newton` (weights (d, K), bias (K,))
    and drops into `predict_broadcast` like any `.predict`-bearing
    object."""

    weights: np.ndarray
    bias: np.ndarray

    def predict(self, x: np.ndarray) -> np.ndarray:
        return (x @ self.weights + self.bias).argmax(axis=1).astype(np.int32)


def predict_broadcast(
    df: DataFrame,
    model,
    features_col: str = "features",
    output_col: str = "prediction",
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Parallel inference: broadcast `model`, mapInPandas batched predict.

    Scale: model ships once per executor (broadcast, not per-task closure
    re-pickle); each Arrow batch becomes one vectorized `.predict` call —
    the Spark analogue of dask_ml's chunked ParallelPostFit.
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model)
    keep = list(id_cols) + [features_col]
    schema = ", ".join(
        [f"{c} {t}" for c, t in df.select(*keep).dtypes if c != features_col]
        + [f"{output_col} int"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bc.value
        for pdf in batches:
            x = np.vstack(pdf[features_col].map(np.asarray).to_numpy())
            out = pdf[[c for c in keep if c != features_col]].copy()
            out[output_col] = m.predict(x).astype(np.int32)
            yield out

    return df.select(*keep).mapInPandas(run, schema)


def linreg_fit_normal(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    l2: float = 0.0,
) -> tuple[np.ndarray, float]:
    """Closed-form linear regression via distributed normal equations —
    the training-side complement of `predict_broadcast` (the reference's
    dask_ml surface pairs chunked predict with chunked estimators,
    README.md:280-305).

    ONE distributed pass: each Arrow batch accumulates XᵀX and Xᵀy with an
    intercept column appended; per-partition partials are (d+1)×(d+2)
    doubles, so driver traffic is O(d²·partitions) — independent of row
    count, the same scaling story as BlockMatrix.gramian.  The (d+1)²
    solve runs on the driver ((XᵀX + λ·diag(1…1,0))β = Xᵀy — the
    intercept is not penalized).

    Returns (weights, intercept).
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[features_col].map(np.asarray).to_numpy()).astype(
                np.float64
            )
            x = np.hstack([x, np.ones((len(x), 1))])
            y = pdf[label_col].to_numpy(dtype=np.float64)
            m = np.hstack([x.T @ x, (x.T @ y)[:, None]])
            g = m if g is None else g + m
        if g is not None:
            yield pd.DataFrame({"d": [g.shape[0]], "p": [g.tobytes()]})

    rows = (
        df.select(features_col, label_col).mapInPandas(partials, "d int, p binary")
    ).collect()
    if not rows:
        raise ValueError("linreg_fit_normal: empty input")
    d1 = rows[0].d
    total = np.zeros((d1, d1 + 1))
    for row in rows:
        total += np.frombuffer(row.p).reshape(d1, d1 + 1)
    g, b = total[:, :d1], total[:, d1]
    reg = np.eye(d1) * l2
    reg[-1, -1] = 0.0  # never shrink the intercept
    beta = np.linalg.solve(g + reg, b)
    return beta[:-1], float(beta[-1])


def logreg_fit_newton(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    l2: float = 1e-3,
    iters: int = 25,
    tol: float = 1e-10,
) -> tuple[np.ndarray, float]:
    """L2-regularized logistic regression via distributed Newton-IRLS —
    the classification-side complement of `linreg_fit_normal` (dask_ml
    pairs LinearRegression with LogisticRegression on the same chunked
    estimator surface, README.md:280-305).

    Per iteration, ONE distributed pass accumulates the gradient
    Xᵀ(y − σ(Xw)) − λw and Hessian XᵀSX + λI (S = σ(1−σ)) with an
    intercept column appended; per-partition partials are (d+1)×(d+2)
    doubles, so driver traffic is O(d²·partitions) per step — independent
    of row count.  The (d+1)² Newton solve runs on the driver; the
    updated coefficient vector re-broadcasts each step (the iterative
    broadcast pattern of kmeans/connected-components).  λ > 0 keeps the
    optimum finite on separable data; the intercept is not penalized.
    Stops early once the max |gradient| per row drops below `tol`.

    Returns (weights, intercept).
    """
    spark = df.sparkSession
    src = df.select(features_col, label_col)
    d1 = None
    w = None
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(w)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            wv = bc.value
            g = None
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.vstack(pdf[features_col].map(np.asarray).to_numpy()).astype(
                    np.float64
                )
                x = np.hstack([x, np.ones((len(x), 1))])
                y = pdf[label_col].to_numpy(dtype=np.float64)
                wb = np.zeros(x.shape[1]) if wv is None else wv
                z = x @ wb
                p = 1.0 / (1.0 + np.exp(-z))
                s = p * (1.0 - p)
                # [XᵀSX | Xᵀ(y−p) | n] — one (d+1)×(d+2) partial + count
                m = np.hstack([x.T @ (x * s[:, None]), (x.T @ (y - p))[:, None]])
                m = np.vstack([m, np.zeros((1, m.shape[1]))])
                m[-1, -1] = float(len(y))
                g = m if g is None else g + m
            if g is not None:
                yield pd.DataFrame({"d": [g.shape[0] - 1], "p": [g.tobytes()]})

        rows = src.mapInPandas(partials, "d int, p binary").collect()
        if not rows:
            raise ValueError("logreg_fit_newton: empty input")
        d1 = rows[0].d
        total = np.zeros((d1 + 1, d1 + 1))
        for row in rows:
            total += np.frombuffer(row.p).reshape(d1 + 1, d1 + 1)
        h, grad, n = total[:d1, :d1], total[:d1, d1], total[d1, d1]
        if w is None:
            w = np.zeros(d1)
        reg = np.eye(d1) * l2
        reg[-1, -1] = 0.0  # never shrink the intercept
        grad = grad - reg @ w
        if np.abs(grad).max() / max(1.0, n) < tol:
            break
        # damping floor keeps the Hessian invertible when σ saturates
        w = w + np.linalg.solve(h + reg + np.eye(d1) * 1e-12, grad)
    return w[:-1], float(w[-1])


def softmax_fit_newton(
    df: DataFrame,
    n_classes: int,
    features_col: str = "features",
    label_col: str = "label",
    l2: float = 1e-3,
    iters: int = 25,
    tol: float = 1e-10,
) -> tuple[np.ndarray, np.ndarray]:
    """L2-regularized MULTICLASS (softmax) logistic regression via
    distributed Newton — the K-class extension of `logreg_fit_newton`
    (same broadcast-coefficients / one-pass-partials shape; breadth
    beyond the reference's binary ParallelPostFit surface,
    `/root/reference/README.md:273-305`).

    Per iteration, ONE distributed pass accumulates the flattened
    gradient Xᵀ(Y − P) − λW (Y one-hot, P row-softmax, intercept column
    appended) and the FULL Newton Hessian: K×K blocks
    H[a,b] = Xᵀ diag(pₐ(δ_ab − p_b)) X + λδ_ab·I.  Per-partition
    partials are ((d+1)K)² + (d+1)K doubles — independent of row count,
    ~0.9 MB at d=64, K=5 — so driver traffic stays O((dK)²·partitions)
    per step while the solve runs once on the driver.  λ > 0 also pins
    the softmax's sum-shift degeneracy (the unregularized problem is
    invariant to adding a constant column), so the optimum is unique;
    intercept rows are not penalized.  Stops once max |gradient| per row
    drops below `tol`.

    Returns (weights (d, K), intercepts (K,)).
    """
    spark = df.sparkSession
    src = df.select(features_col, label_col)
    k = int(n_classes)
    w = None  # (d+1, K) once d is known
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(w)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            wv = bc.value
            acc = None
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.vstack(pdf[features_col].map(np.asarray).to_numpy()).astype(
                    np.float64
                )
                x = np.hstack([x, np.ones((len(x), 1))])
                d1 = x.shape[1]
                y = pdf[label_col].to_numpy(dtype=np.int64)
                wb = np.zeros((d1, k)) if wv is None else wv
                z = x @ wb
                z -= z.max(axis=1, keepdims=True)
                p = np.exp(z)
                p /= p.sum(axis=1, keepdims=True)
                onehot = np.zeros((len(y), k))
                onehot[np.arange(len(y)), y] = 1.0
                g = x.T @ (onehot - p)  # (d1, K)
                h = np.zeros((d1 * k, d1 * k))
                for a in range(k):
                    for b in range(a, k):
                        s = p[:, a] * ((1.0 if a == b else 0.0) - p[:, b])
                        blk = x.T @ (x * s[:, None])
                        h[a * d1 : (a + 1) * d1, b * d1 : (b + 1) * d1] += blk
                        if b != a:  # Hessian is block-symmetric
                            h[b * d1 : (b + 1) * d1, a * d1 : (a + 1) * d1] += blk
                m = np.concatenate([h.ravel(), g.ravel(order="F"), [float(len(y))]])
                acc = m if acc is None else acc + m
            if acc is not None:
                yield pd.DataFrame({"d": [d1], "p": [acc.tobytes()]})

        rows = src.mapInPandas(partials, "d int, p binary").collect()
        if not rows:
            raise ValueError("softmax_fit_newton: empty input")
        d1 = rows[0].d
        dk = d1 * k
        total = np.zeros(dk * dk + dk + 1)
        for row in rows:
            total += np.frombuffer(row.p)
        h = total[: dk * dk].reshape(dk, dk)
        grad = total[dk * dk : dk * dk + dk]
        n = total[-1]
        if w is None:
            w = np.zeros((d1, k))
        # λ on every weight, never on the K intercept rows
        reg = np.full(dk, l2)
        reg[d1 - 1 :: d1] = 0.0
        grad = grad - reg * w.ravel(order="F")
        if np.abs(grad).max() / max(1.0, n) < tol:
            break
        # Hessian is only PSD (softmax shift degeneracy) — λ-regularized
        # diagonal plus a damping floor keeps the solve well-posed
        step = np.linalg.solve(h + np.diag(reg) + np.eye(dk) * 1e-10, grad)
        w = w + step.reshape(d1, k, order="F")
    return w[:-1], np.asarray(w[-1])


def make_classification_blocks(
    spark,
    n_samples: int,
    n_features: int,
    n_partitions: int,
    seed: int = 0,
) -> DataFrame:
    """Seeded synthetic classification data, generated per-partition
    (reference: dask_ml make_classification chunked, README.md:294-300).

    Deterministic per partition id regardless of scheduling — the same
    property BlockMatrix.random provides for arrays.
    """
    per = (n_samples + n_partitions - 1) // n_partitions

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pid in pdf["id"]:
                rng = np.random.default_rng(seed + int(pid))
                n = min(per, n_samples - int(pid) * per)
                if n <= 0:
                    continue
                w = np.random.default_rng(seed).standard_normal(n_features)
                x = rng.standard_normal((n, n_features))
                y = (x @ w >= 0).astype(np.int32)
                yield pd.DataFrame(
                    {
                        "sample_id": np.arange(int(pid) * per, int(pid) * per + n),
                        "features": list(x),
                        "label": y,
                    }
                )

    # partition count fixed at range creation — no repartition shuffle
    return spark.range(0, n_partitions, 1, n_partitions).mapInPandas(
        gen, "sample_id long, features array<double>, label int"
    )


def als_fit(
    ratings: DataFrame,
    n_users: int,
    n_items: int,
    n_factors: int = 8,
    reg: float = 0.1,
    iters: int = 5,
    seed: int = 11,
) -> tuple[np.ndarray, np.ndarray, list[float]]:
    """Distributed ALTERNATING LEAST SQUARES over a (user_id, item_id,
    rating) table — the collaborative-filtering workload the reference
    runs as an opaque dask graph; here every half-step is a DataFrame
    job.

    Each half-step solves, per entity, the EXACT regularized normal
    equations over its observed ratings — (V_SᵀV_S + λI) u = V_Sᵀ r_S —
    via `applyInPandas` grouped on that entity, with the OTHER side's
    factor matrix broadcast (k and the entity counts keep it small
    here; at web scale the join side blocks by entity range and factors
    co-partition with the ratings instead of broadcasting).  The
    objective Σ(r − u·v)² + λ(‖U‖² + ‖V‖²) is re-measured after every
    full iteration by one Arrow pass over the ratings — ALS decreases
    it monotonically, which the caller can assert.

    Returns (U, V, objectives) with objectives[0] the initial value."""
    spark = ratings.sparkSession
    rng = np.random.default_rng(seed)
    u_mat = rng.standard_normal((n_users, n_factors)) * 0.1
    v_mat = rng.standard_normal((n_items, n_factors)) * 0.1

    def half_step(df: DataFrame, group: str, other: np.ndarray, n_out: int):
        bc = spark.sparkContext.broadcast(other)
        key_other = "item_id" if group == "user_id" else "user_id"

        def solve(pdf: pd.DataFrame) -> pd.DataFrame:
            o = bc.value
            s = pdf[key_other].to_numpy()
            r = pdf["rating"].to_numpy(dtype=np.float64)
            vs = o[s]
            a = vs.T @ vs + reg * np.eye(o.shape[1])
            f = np.linalg.solve(a, vs.T @ r)
            return pd.DataFrame(
                {"idx": [int(pdf[group].iloc[0])], "f": [f.tolist()]}
            )

        rows = (
            df.groupBy(group)
            .applyInPandas(solve, "idx long, f array<double>")
            .collect()
        )
        out = np.zeros((n_out, other.shape[1]))
        for row in rows:
            out[row["idx"]] = np.asarray(row["f"])
        return out

    def objective(u: np.ndarray, v: np.ndarray) -> float:
        bc = spark.sparkContext.broadcast((u, v))

        def sq(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            uu, vv = bc.value
            t = 0.0
            got = False
            for pdf in batches:
                if not len(pdf):
                    continue
                pred = np.einsum(
                    "ij,ij->i",
                    uu[pdf["user_id"].to_numpy()],
                    vv[pdf["item_id"].to_numpy()],
                )
                t += float(((pdf["rating"].to_numpy() - pred) ** 2).sum())
                got = True
            if got:
                yield pd.DataFrame({"s": [t]})

        parts = ratings.mapInPandas(sq, "s double").collect()
        sse = float(sum(r["s"] for r in parts))
        return sse + reg * (float((u * u).sum()) + float((v * v).sum()))

    objs = [objective(u_mat, v_mat)]
    for _ in range(iters):
        u_mat = half_step(ratings, "user_id", v_mat, n_users)
        v_mat = half_step(ratings, "item_id", u_mat, n_items)
        # final half-step of the loop is the USER solve of the NEXT pass —
        # callers wanting user-side optimality re-solve users once after
        objs.append(objective(u_mat, v_mat))
    u_mat = half_step(ratings, "user_id", v_mat, n_users)
    objs.append(objective(u_mat, v_mat))
    return u_mat, v_mat, objs
