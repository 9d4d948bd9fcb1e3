"""mlops.kfold_ridge (r12, VERDICT r11 #8): the general-d one-pass
k-fold ridge via per-fold Gramian partials, pinned against (a) a direct
numpy reference fit per fold and (b) the in-plan Cramer d=2 entry
`ml_kfold_ridge_check` on the same gate data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _ridge_ref(x, y, lam):
    """Reference: train on (x, y) with intercept appended, λ on feature
    diagonal only."""
    z = np.hstack([x, np.ones((len(x), 1))])
    g = z.T @ z
    reg = np.eye(z.shape[1]) * lam
    reg[-1, -1] = 0.0
    return np.linalg.solve(g + reg, z.T @ y)


def test_kfold_ridge_matches_numpy_reference(spark):
    """5 folds, d=3 synthetic features with a known generating model:
    every fold's coefficients and held-out MSE from the ONE-PASS
    Gramian operator equal the explicit train-on-the-other-four numpy
    fit to 1e-9 relative."""
    from wukong_spark.mlops import kfold_ridge

    rng = np.random.RandomState(7)
    n, d, lam = 2000, 3, 10.0
    x = rng.randint(0, 50, size=(n, d)).astype(np.float64)
    y = x @ np.array([2.0, -1.0, 0.5]) + 3.0 + rng.randint(-5, 6, size=n)
    fold = np.arange(n) % 5

    rows = [
        (int(fold[i]), [float(v) for v in x[i]], float(y[i])) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "fold long, features array<double>, label double"
    ).repartition(8)
    got = kfold_ridge(df, l2=lam)
    assert [g["fold"] for g in got] == [0, 1, 2, 3, 4]
    for g in got:
        f = g["fold"]
        tr = fold != f
        beta = _ridge_ref(x[tr], y[tr], lam)
        np.testing.assert_allclose(g["weights"], beta[:-1], rtol=1e-9)
        assert g["intercept"] == pytest.approx(beta[-1], rel=1e-9)
        va = ~tr
        pred = x[va] @ beta[:-1] + beta[-1]
        mse = float(np.mean((y[va] - pred) ** 2))
        assert g["val_mse"] == pytest.approx(mse, rel=1e-9)
        assert g["n_train"] == int(tr.sum()) and g["n_val"] == int(va.sum())


def test_kfold_ridge_matches_cramer_entry(spark):
    """The operator on the entry's exact (x1, x2, y, fold) frame agrees
    with ml_kfold_ridge_check's in-plan Cramer solve — one implementation
    is plan-side exact SQL, the other driver-side numpy; both must be the
    same model."""
    from wukong_spark.mlops import kfold_ridge
    from wukong_spark.queries import load_all

    entry = load_all()["ml_kfold_ridge_check"].fn(spark, SF_SMOKE)
    want = {r["fold"]: r for r in entry.collect()}

    from wukong_spark.queries.helpers import tbl

    li = (
        tbl(spark, SF_SMOKE, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("x1"),
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("x2"),
        )
    )
    o = tbl(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice")).cast("long").alias("y"),
    )
    df = li.join(o, "l_orderkey").select(
        (F.col("l_orderkey") % 5).alias("fold"),
        F.array(
            F.col("x1").cast("double"), F.col("x2").cast("double")
        ).alias("features"),
        F.col("y").cast("double").alias("label"),
    )
    got = kfold_ridge(df, l2=1000.0)
    for g in got:
        w = want[g["fold"]]
        assert g["n_train"] == w["n_train"] and g["n_val"] == w["n_val"]
        assert g["weights"][0] == pytest.approx(w["b1_6"], abs=2e-6)
        assert g["weights"][1] == pytest.approx(w["b2_6"], abs=2e-6)
        assert g["intercept"] == pytest.approx(w["b0_6"], abs=2e-6)
        assert g["val_mse"] == pytest.approx(w["val_mse_r"], rel=1e-6)


def test_kfold_ridge_empty_input_raises(spark):
    from wukong_spark.mlops import kfold_ridge

    df = spark.createDataFrame(
        [], "fold long, features array<double>, label double"
    )
    with pytest.raises(ValueError, match="empty input"):
        kfold_ridge(df)
