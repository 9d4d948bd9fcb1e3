"""ML inference through the driver contract (SURVEY.md §2.2 B-IV).

`ml_predict_embeddings` runs the REAL distributed-inference path —
broadcast model + Arrow-batched mapInPandas (wukong_spark.mlops) — with a
fixed deterministic weight vector, so a DuckDB oracle can verify the
decision function end-to-end: the parity test the reference itself uses
(local predict vs distributed predict, README.md:294-304), with SQL as
the local side.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from wukong_spark.mlops import LinearModel, predict_broadcast
from wukong_spark.queries import query
from wukong_spark.queries.helpers import local_frame, tbl

#: deterministic 64-dim weights, reproducible in SQL: w_i = ((7i+3) mod 13 − 6)/10
FIXED_W = [(((7 * i + 3) % 13) - 6) / 10.0 for i in range(64)]
FIXED_B = 0.05

_W_SQL = "[" + ", ".join(f"{w}" for w in FIXED_W) + "]"


@query(
    "ml_predict_embeddings",
    oracle=f"""
    SELECT vec_id, label,
           CASE WHEN list_dot_product(embedding::DOUBLE[], {_W_SQL}::DOUBLE[]) + {FIXED_B} >= 0
                THEN 1 ELSE 0 END AS prediction
    FROM embeddings
    """,
    headline=True,
)
def ml_predict_embeddings(spark: SparkSession, sf_dir: str):
    """Broadcast-model batch inference over the embeddings table.

    Model ships once per executor via broadcast; each Arrow batch is one
    vectorized predict.  Scores are O(1) with cross-engine float drift
    ~1e-15, so the sign threshold is stable.
    """
    e = tbl(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label", "CAST(embedding AS array<double>) AS features"
    )
    model = LinearModel(np.array(FIXED_W), FIXED_B)
    return predict_broadcast(e, model, id_cols=("vec_id", "label"))


@query(
    "ml_predict_ref",
    headline=True,
    # literal counts are the sf<0.1 branch's — above it the entry runs the
    # reference 800k dims no literal can match (tagged r15 after the sf0.1
    # sweep reported the by-design mismatch as a FAIL)
    oracle_sf=0.01,
    # literal oracle (VERDICT r2 #1): generation (per-partition PCG64) and
    # the perceptron fit are fully deterministic, so the sf=0.01 confusion
    # counts are fixed integers; the closest sample to the decision boundary
    # sits at |margin| 2.8e-6 — 7 orders above float64 BLAS drift, so no
    # count can flip across platforms.  (Counts are the sf<0.1 branch's —
    # the only branch the correctness gate runs.)  margin_ok asserts that
    # minimum-|margin| contract IN-PLAN (ADVICE r4): if platform drift ever
    # pushes a sample inside the 1e-7 gate, this column flips first and the
    # failure reads as a margin violation, not an opaque count mismatch.
    oracle="""
    SELECT * FROM (VALUES (0, 0, 39846, TRUE), (0, 1, 47, TRUE),
                          (1, 0, 76, TRUE), (1, 1, 40031, TRUE))
      AS t(label, prediction, n, margin_ok)
    ORDER BY label, prediction
    """,
)
def ml_predict_ref(spark: SparkSession, sf_dir: str):
    """Parallel inference at the reference's published workload size
    (README.md:298-300): 800,000 samples in 20 chunks, fitted model
    broadcast, chunked vectorized predict — the ParallelPostFit(SVC)
    benchmark.  Scaled 80,000/20 below bench sf.

    Fit runs driver-local on the first chunk (exactly the reference's
    pattern: sklearn fit is local, only predict distributes), then the
    summary is a label×prediction confusion count — 4 deterministic rows.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    from wukong_spark.session import register_result_checkpoint

    sf = _sf(sf_dir)
    n = 800_000 if sf >= 0.1 else 80_000
    n_parts = n_features = 20
    seed = 17
    rng = np.random.default_rng(17)
    x0 = rng.standard_normal((min(n // 20, 5000), 20))
    y0 = (x0 @ np.random.default_rng(17).standard_normal(20) >= 0).astype(np.int32)
    model = LinearModel.fit(x0, y0)
    # ONE scan of the generated blocks (VERDICT r15 Next #1): the predict
    # pass emits |decision margin| alongside the prediction, so the
    # boundary-distance contract behind the literal confusion counts folds
    # into the same groupBy.  r17 opt round (guide §4.1/§2.3): generation,
    # predict AND the per-partition partial confusion counts are FUSED
    # into a single Python pass — the old make_classification_blocks →
    # predict_broadcast chain ran TWO chained MapInPandas nodes in one
    # stage (two Python workers per core; the 800k×20 features crossed
    # Python→JVM→Python as Arrow list<double>, ~128 MB each way) and then
    # shipped 800k rows into the JVM groupBy.  The fused pass generates
    # each partition's block exactly as make_classification_blocks does
    # (same rng streams, bitwise-identical x/label), predicts in place,
    # and emits ≤4 partial rows per partition: (label, prediction,
    # partial count, partial min |margin|).  Counts sum and mins min —
    # exact associative merges — so the 4-row grouped result is
    # value-identical to the unfused plan's.  The 4-row grouped result is
    # eagerly checkpointed (trivial) so deriving the global min does not
    # replay the generation.
    bc = spark.sparkContext.broadcast(model)
    per = (n + n_parts - 1) // n_parts

    def gen_predict_partials(
        batches: "Iterator[pd.DataFrame]",
    ) -> "Iterator[pd.DataFrame]":
        m = bc.value
        for pdf in batches:
            for pid in pdf["id"]:
                prng = np.random.default_rng(seed + int(pid))
                nn = min(per, n - int(pid) * per)
                if nn <= 0:
                    continue
                # identical streams to make_classification_blocks: w from
                # a fresh rng(seed), x from rng(seed + pid)
                w = np.random.default_rng(seed).standard_normal(n_features)
                x = prng.standard_normal((nn, n_features))
                y = (x @ w >= 0).astype(np.int32)
                margin = m.decision_function(x)
                p = (margin >= 0).astype(np.int32)  # == m.predict(x)
                am = np.abs(np.asarray(margin, dtype=np.float64))
                part = pd.DataFrame({"label": y, "prediction": p, "am": am})
                yield (
                    part.groupby(["label", "prediction"], as_index=False)
                    .agg(n=("am", "size"), gm=("am", "min"))
                    .astype({"n": np.int64})
                )

    partials = spark.range(0, n_parts, 1, n_parts).mapInPandas(
        gen_predict_partials, "label int, prediction int, n long, gm double"
    )
    grouped = register_result_checkpoint(
        partials.groupBy("label", "prediction")
        .agg(F.sum("n").alias("n"), F.min("gm").alias("gm"))
        .localCheckpoint(eager=True)
    )
    margin = grouped.agg(F.min("gm").alias("min_margin"))
    return (
        grouped.crossJoin(F.broadcast(margin))
        .select(
            "label",
            "prediction",
            "n",
            (F.col("min_margin") > F.lit(1e-7)).alias("margin_ok"),
        )
        .orderBy("label", "prediction")
    )


def _sf(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.01


@query(
    "ml_linreg_simple",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, COUNT(*) AS x FROM lineitem GROUP BY l_orderkey
    ),
    xy AS (
      SELECT CAST(li.x AS BIGINT) AS x,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS y
      FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM xy
    )
    SELECT n AS n_orders,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS slope_cents_6,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6)
             AS intercept_cents_6
    FROM s
    """,
)
def ml_linreg_simple(spark: SparkSession, sf_dir: str):
    """Closed-form simple linear regression, fully SQL-oracled: regress
    order total (cents) on lineitem count per order.

    All five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are EXACT BIGINT
    sums — order-independent in both engines — and the slope/intercept are
    then a fixed sequence of IEEE double ops on identical integers, so the
    round-6 doubles hash-match bit-for-bit.  This is the degenerate d=1
    case of the normal-equations path `linreg_fit_normal` runs distributed
    (dask_ml estimator surface, README.md:280-305).

    Scale shape: one groupBy on l_orderkey (co-partitioned with the join
    key), one broadcast-or-shuffle join, one scalar agg — no driver data."""
    from pyspark.sql import functions as F

    from wukong_spark.queries.helpers import cents

    li = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    o = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), cents("o_totalprice").alias("y")
    )
    s = li.join(o, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        F.col("n").alias("n_orders"),
        F.round(slope, 6).alias("slope_cents_6"),
        F.round((sy - slope * sx) / n, 6).alias("intercept_cents_6"),
    )


@query(
    "ml_kfold_cv_check",
    # every emitted double is a FIXED sequence of IEEE ops on exact
    # BIGINT sufficient statistics (the ml_linreg_simple discipline):
    # per-fold integer stats, train = total − fold (exact integer
    # subtraction), then identical formula text in both engines — the
    # round-6 values hash bit-for-bit.  y is whole DOLLARS so Σy² stays
    # far from int64 overflow at any gate sf.
    oracle="""
    WITH li AS (
      SELECT l_orderkey, COUNT(*) AS x FROM lineitem GROUP BY l_orderkey
    ),
    xy AS (
      SELECT li.l_orderkey % 5 AS fold,
             CAST(li.x AS BIGINT) AS x,
             CAST(ROUND(o.o_totalprice) AS BIGINT) AS y
      FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
    ),
    pf AS (
      SELECT fold, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM xy GROUP BY fold
    ),
    tot AS (
      SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
             SUM(sxy) AS tsxy, SUM(sxx) AS tsxx FROM pf
    ),
    fit AS (
      SELECT pf.fold, pf.n AS n_val, t.tn - pf.n AS n_train,
             pf.n, pf.sx, pf.sy, pf.sxy, pf.sxx, pf.syy,
             (CAST(t.tn - pf.n AS DOUBLE) * CAST(t.tsxy - pf.sxy AS DOUBLE)
              - CAST(t.tsx - pf.sx AS DOUBLE) * CAST(t.tsy - pf.sy AS DOUBLE))
             / (CAST(t.tn - pf.n AS DOUBLE) * CAST(t.tsxx - pf.sxx AS DOUBLE)
                - CAST(t.tsx - pf.sx AS DOUBLE) * CAST(t.tsx - pf.sx AS DOUBLE))
               AS b
      FROM pf CROSS JOIN tot t
    ),
    fit2 AS (
      SELECT fold, n_val, n_train, n, sx, sy, sxy, sxx, syy, b,
             (CAST((SELECT tsy FROM tot) - sy AS DOUBLE)
              - b * CAST((SELECT tsx FROM tot) - sx AS DOUBLE))
             / CAST((SELECT tn FROM tot) - n AS DOUBLE) AS a
      FROM fit
    )
    SELECT fold, CAST(n_train AS BIGINT) AS n_train,
           CAST(n_val AS BIGINT) AS n_val,
           ROUND(b, 6) AS slope_6, ROUND(a, 6) AS intercept_6,
           ROUND((CAST(syy AS DOUBLE) + a * a * CAST(n AS DOUBLE)
                  + b * b * CAST(sxx AS DOUBLE)
                  - 2 * a * CAST(sy AS DOUBLE) - 2 * b * CAST(sxy AS DOUBLE)
                  + 2 * a * b * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS val_mse_6
    FROM fit2 ORDER BY fold
    """,
)
def ml_kfold_cv_check(spark: SparkSession, sf_dir: str):
    """K-FOLD CROSS-VALIDATION (r11) — the model-selection loop every ML
    pipeline runs (the dask_ml GridSearch/CV surface, reference
    README.md:280-305), demonstrated on the closed-form d=1 regression
    so the ENTIRE fit+score loop is SQL-oracled: 5 deterministic folds
    (orderkey mod 5), each fold's model trained on the OTHER four and
    scored on the held-out fold.

    Exactness: one pass computes per-fold integer sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²); training stats are total − fold — exact
    BIGINT subtraction, so 5 models cost ONE data pass, the classic CV
    sufficient-statistics trick (no 5× rescan).  Slope/intercept and the
    held-out MSE — expanded as (Σy² + a²n + b²Σx² − 2aΣy − 2bΣxy +
    2abΣx)/n, a fixed IEEE op sequence on identical integers — hash
    bit-for-bit at round-6.

    100 TB path: one groupBy(l_orderkey) + one join + one 5-row fold
    agg; the fold dimension never rescans the data — CV cost is
    O(one pass), not O(k passes)."""
    from pyspark.sql import functions as F

    li = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    o = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice")).cast("long").alias("y"),
    )
    xy = li.join(o, "l_orderkey").select(
        (F.col("l_orderkey") % 5).alias("fold"), "x", "y"
    )
    pf = xy.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    tot = pf.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxy").alias("tsxy"),
        F.sum("sxx").alias("tsxx"),
    )
    j = pf.crossJoin(F.broadcast(tot))
    d = lambda c: c.cast("double")  # noqa: E731
    b = (
        d(F.col("tn") - F.col("n")) * d(F.col("tsxy") - F.col("sxy"))
        - d(F.col("tsx") - F.col("sx")) * d(F.col("tsy") - F.col("sy"))
    ) / (
        d(F.col("tn") - F.col("n")) * d(F.col("tsxx") - F.col("sxx"))
        - d(F.col("tsx") - F.col("sx")) * d(F.col("tsx") - F.col("sx"))
    )
    j = j.withColumn("b", b)
    a = (
        d(F.col("tsy") - F.col("sy")) - F.col("b") * d(F.col("tsx") - F.col("sx"))
    ) / d(F.col("tn") - F.col("n"))
    j = j.withColumn("a", a)
    mse = (
        d(F.col("syy"))
        + F.col("a") * F.col("a") * d(F.col("n"))
        + F.col("b") * F.col("b") * d(F.col("sxx"))
        - 2 * F.col("a") * d(F.col("sy"))
        - 2 * F.col("b") * d(F.col("sxy"))
        + 2 * F.col("a") * F.col("b") * d(F.col("sx"))
    ) / d(F.col("n"))
    return j.select(
        "fold",
        (F.col("tn") - F.col("n")).alias("n_train"),
        F.col("n").alias("n_val"),
        F.round(F.col("b"), 6).alias("slope_6"),
        F.round(F.col("a"), 6).alias("intercept_6"),
        F.round(mse, 6).alias("val_mse_6"),
    ).orderBy("fold")


@query(
    "ml_linreg_check",
    oracle=(
        "SELECT TRUE AS gradient_zero, TRUE AS beats_mean_baseline, 64 AS n_features"
    ),
)
def ml_linreg_check(spark: SparkSession, sf_dir: str):
    """Normal-equations ridge regression contract on the embeddings table
    (label ~ embedding, λ=1e-6): fit via `linreg_fit_normal` (one
    distributed XᵀX/Xᵀy pass), then verify with an INDEPENDENT second
    distributed pass over the data:

    - gradient_zero: ‖Xᵀ(y−Xβ) − λ·β‖∞ / max(1, ‖Xᵀy‖∞) < 1e-8 — the
      first-order optimality condition recomputed from per-row residuals,
      not from the solver's own accumulators;
    - beats_mean_baseline: Σr² < Σ(y−ȳ)² — an intercept-bearing least
      squares fit can never lose to the mean-only model by more than the
      ridge bias, and λ=1e-6 is far below that slack.

    Only the verdicts leave the cluster."""
    import pandas as pd
    from pyspark.sql import functions as F

    from wukong_spark.mlops import linreg_fit_normal

    e = tbl(spark, sf_dir, "embeddings").selectExpr(
        "CAST(embedding AS array<double>) AS features", "CAST(label AS double) AS label"
    )
    e = e.persist()  # read by the fit pass and the verification pass
    w, b = linreg_fit_normal(e, l2=1e-6)
    bc = spark.sparkContext.broadcast((w, b))

    def verify(batches):
        wv, bv = bc.value
        g = None  # [Xᵀr (d) | Σr², Σy, Σy², n]
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["features"].map(np.asarray).to_numpy()).astype(np.float64)
            y = pdf["label"].to_numpy(dtype=np.float64)
            r = y - (x @ wv + bv)
            m = np.concatenate(
                [x.T @ r, [float(r @ r), float(y.sum()), float(y @ y), float(len(y))]]
            )
            g = m if g is None else g + m
        if g is not None:
            yield pd.DataFrame({"p": [g.tobytes()]})

    parts = e.select("features", "label").mapInPandas(verify, "p binary").collect()
    e.unpersist()
    total = np.sum([np.frombuffer(row.p) for row in parts], axis=0)
    d = len(w)
    grad, sse, sy, syy, n = total[:d], total[d], total[d + 1], total[d + 2], total[d + 3]
    # ‖Xᵀy‖∞ = ‖Xᵀr + XᵀXβ-ish‖ scale anchor: use the gradient's natural
    # scale ‖Xᵀ(y−ȳ)‖ ≈ n — max(1, n) keeps the gate relative and unitful
    grad_rel = float(np.abs(grad - 1e-6 * w).max()) / max(1.0, float(n))
    sse_mean = syy - sy * sy / n
    return local_frame(
        spark,
        [(bool(grad_rel < 1e-8), bool(sse < sse_mean), d)],
        "gradient_zero boolean, beats_mean_baseline boolean, n_features int",
    )


@query(
    "ml_logreg_check",
    oracle=(
        "SELECT TRUE AS gradient_zero, TRUE AS beats_null_logloss,"
        " 64 AS n_features"
    ),
)
def ml_logreg_check(spark: SparkSession, sf_dir: str):
    """Distributed Newton-IRLS logistic regression contract on the
    embeddings table (P(label is odd) ~ embedding, λ=1e-3): fit via
    `logreg_fit_newton` (one gradient/Hessian pass per step, coefficients
    re-broadcast), then verify with an INDEPENDENT second pass:

    - gradient_zero: ‖Xᵀ(y−σ(Xw)) − λw‖∞ / max(1, n) < 1e-8 — the
      first-order optimality condition of the regularized log-likelihood,
      recomputed from per-row probabilities, not the solver's own
      accumulators;
    - beats_null_logloss: Σ logloss(model) < Σ logloss(ȳ) — a fitted
      intercept-bearing model can never lose to the base-rate-only model
      at λ this small.

    Only the verdicts leave the cluster (la_gemm_check pattern)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from wukong_spark.mlops import logreg_fit_newton

    e = tbl(spark, sf_dir, "embeddings").selectExpr(
        "CAST(embedding AS array<double>) AS features",
        "CAST(label % 2 AS double) AS label",
    )
    e = e.persist()  # read by every Newton pass and the verification pass
    w, b = logreg_fit_newton(e, l2=1e-3)
    bc = spark.sparkContext.broadcast((w, b))

    def verify(batches):
        wv, bv = bc.value
        g = None  # [Xᵀ(y−p) (d) | Σ logloss_model, Σy, n]
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["features"].map(np.asarray).to_numpy()).astype(
                np.float64
            )
            y = pdf["label"].to_numpy(dtype=np.float64)
            z = x @ wv + bv
            p = 1.0 / (1.0 + np.exp(-z))
            # numerically-stable per-row logloss: log(1+e^z) − y·z
            ll = np.logaddexp(0.0, z) - y * z
            m = np.concatenate(
                [x.T @ (y - p), [float(ll.sum()), float(y.sum()), float(len(y))]]
            )
            g = m if g is None else g + m
        if g is not None:
            yield pd.DataFrame({"p": [g.tobytes()]})

    parts = e.select("features", "label").mapInPandas(verify, "p binary").collect()
    e.unpersist()
    total = np.sum([np.frombuffer(row.p) for row in parts], axis=0)
    d = len(w)
    grad, ll_model, sy, n = total[:d], total[d], total[d + 1], total[d + 2]
    grad_rel = float(np.abs(grad - 1e-3 * w).max()) / max(1.0, float(n))
    pbar = sy / n
    ll_null = -n * (pbar * np.log(pbar) + (1 - pbar) * np.log(1 - pbar))
    return local_frame(
        spark,
        [(bool(grad_rel < 1e-8), bool(ll_model < ll_null), d)],
        "gradient_zero boolean, beats_null_logloss boolean, n_features int",
    )


@query(
    "ml_softmax_check",
    oracle=(
        "SELECT TRUE AS gradient_zero, TRUE AS beats_null_logloss,"
        " 64 AS n_features, 5 AS n_classes"
    ),
)
def ml_softmax_check(spark: SparkSession, sf_dir: str):
    """Distributed Newton MULTICLASS (softmax) logistic regression
    contract on the embeddings table (P(label mod 5) ~ embedding,
    λ=1e-3): fit via `softmax_fit_newton` (one gradient + full-Hessian
    pass per step, (d+1)K coefficients re-broadcast), then verify with
    an INDEPENDENT second pass:

    - gradient_zero: ‖Xᵀ(Y−P) − λW‖∞ / max(1, n) < 1e-8 — first-order
      optimality of the regularized multinomial log-likelihood,
      recomputed from per-row softmax probabilities, not the solver's
      own accumulators;
    - beats_null_logloss: Σ −log p_model(yᵢ) < Σ −log(n_{yᵢ}/n) — a
      fitted intercept-bearing softmax can never lose to the class-
      frequency model at λ this small.

    Only the verdicts leave the cluster (ml_logreg_check pattern)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from wukong_spark.mlops import softmax_fit_newton

    k = 5
    e = tbl(spark, sf_dir, "embeddings").selectExpr(
        "CAST(embedding AS array<double>) AS features",
        "CAST(label % 5 AS int) AS label",
    )
    e = e.persist()  # read by every Newton pass and the verification pass
    w, b = softmax_fit_newton(e, n_classes=k, l2=1e-3)
    bc = spark.sparkContext.broadcast((w, b))

    def verify(batches):
        wv, bv = bc.value
        g = None  # [Xᵀ(Y−P) ((d+1)·K) | Σ −log p(yᵢ) | per-class counts (K)]
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["features"].map(np.asarray).to_numpy()).astype(
                np.float64
            )
            y = pdf["label"].to_numpy(dtype=np.int64)
            xi = np.hstack([x, np.ones((len(x), 1))])
            z = xi @ np.vstack([wv, bv])
            z -= z.max(axis=1, keepdims=True)
            p = np.exp(z)
            p /= p.sum(axis=1, keepdims=True)
            onehot = np.zeros((len(y), len(bv)))
            onehot[np.arange(len(y)), y] = 1.0
            ll = -np.log(np.maximum(p[np.arange(len(y)), y], 1e-300))
            counts = np.bincount(y, minlength=len(bv)).astype(np.float64)
            m = np.concatenate(
                [(xi.T @ (onehot - p)).ravel(order="F"), [float(ll.sum())], counts]
            )
            g = m if g is None else g + m
        if g is not None:
            yield pd.DataFrame({"p": [g.tobytes()]})

    parts = e.select("features", "label").mapInPandas(verify, "p binary").collect()
    e.unpersist()
    total = np.sum([np.frombuffer(row.p) for row in parts], axis=0)
    d1 = w.shape[0] + 1
    grad = total[: d1 * k].reshape(d1, k, order="F")
    grad[:-1] -= 1e-3 * w
    ll_model = total[d1 * k]
    counts = total[d1 * k + 1 :]
    n = counts.sum()
    grad_rel = float(np.abs(grad).max()) / max(1.0, float(n))
    present = counts > 0
    ll_null = float(-(counts[present] * np.log(counts[present] / n)).sum())
    return local_frame(
        spark,
        [(bool(grad_rel < 1e-8), bool(ll_model < ll_null), w.shape[0], k)],
        "gradient_zero boolean, beats_null_logloss boolean,"
        " n_features int, n_classes int",
    )


#: deterministic 64×5 softmax weights, reproducible in SQL:
#: w[i][c] = ((7i + 11c + 3) mod 13 − 6)/10, b[c] = (c − 2)/20
_SOFT_W = [[(((7 * i + 11 * c + 3) % 13) - 6) / 10.0 for i in range(64)] for c in range(5)]
_SOFT_B = [(c - 2) / 20.0 for c in range(5)]

_SOFT_SCORES_SQL = ",\n           ".join(
    "list_dot_product(embedding::DOUBLE[], ["
    + ", ".join(str(w) for w in _SOFT_W[c])
    + f"]::DOUBLE[]) + {_SOFT_B[c]} AS s{c}"
    for c in range(5)
)


@query(
    "ml_softmax_predict",
    oracle=f"""
    SELECT vec_id, label,
           CASE greatest(s0, s1, s2, s3, s4)
             WHEN s0 THEN 0 WHEN s1 THEN 1 WHEN s2 THEN 2
             WHEN s3 THEN 3 ELSE 4 END AS prediction
    FROM (
      SELECT vec_id, label,
           {_SOFT_SCORES_SQL}
      FROM embeddings)
    ORDER BY vec_id
    """,
)
def ml_softmax_predict(spark: SparkSession, sf_dir: str):
    """MULTICLASS broadcast-model batch inference over the embeddings
    table: argmax of 5 fixed linear scores, computed on the REAL
    distributed path (model broadcast once, Arrow-batched vectorized
    predict per batch) and cross-checked by DuckDB computing the same
    five dot products and a greatest-CASE argmax.

    Class-score GAPS are O(1) while cross-engine float drift is ~1e-15,
    so the argmax is stable (the same accepted-hazard class as the
    binary entry's sign threshold; CASE WHEN matches `greatest` against
    the identical float value, so the SQL tie-break is exact)."""
    from wukong_spark.mlops import SoftmaxModel

    e = tbl(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label", "CAST(embedding AS array<double>) AS features"
    )
    model = SoftmaxModel(np.array(_SOFT_W).T, np.array(_SOFT_B))
    return predict_broadcast(e, model, id_cols=("vec_id", "label")).orderBy(
        "vec_id"
    )


def _gen_ratings(spark: SparkSession, n_users: int, n_items: int):
    """Seeded (user_id, item_id, rating) table: each user rates 20
    deterministic items with a low-rank-plus-noise rating, so ALS has
    real structure to recover."""
    from typing import Iterator

    import pandas as pd

    k_true = 4

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                u = int(i)
                rng = np.random.default_rng(21000 + u)
                ut = rng.standard_normal(k_true)
                items = rng.choice(n_items, 20, replace=False)
                for it in items:
                    vt = np.random.default_rng(22000 + int(it)).standard_normal(
                        k_true
                    )
                    r = float(ut @ vt + 0.1 * rng.standard_normal())
                    rows.append((u, int(it), r))
            yield pd.DataFrame(rows, columns=["user_id", "item_id", "rating"])

    return spark.range(0, n_users, 1, 8).mapInPandas(
        gen, "user_id long, item_id long, rating double"
    )


@query(
    "ml_als_check",
    headline=True,
    oracle=(
        "SELECT TRUE AS user_grad_zero, TRUE AS objective_monotonic,"
        " TRUE AS beats_mean_baseline, 200 AS n_users, 100 AS n_items,"
        " 8 AS n_factors"
    ),
)
def ml_als_check(spark: SparkSession, sf_dir: str):
    """Distributed ALS collaborative filtering contract (r10, de-
    bottlenecked r11 per VERDICT r10 #1): fit 3 alternating iterations
    over a seeded low-rank ratings table with CO-PARTITIONED factor
    DataFrames (`mlops.als_fit`: per-entity exact normal-equation
    solves via applyInPandas; the other side's factor ROWS join in by
    entity key — no full-matrix broadcast, and ZERO O(n_entities)
    driver collects, pinned by tests/test_plan_shape.py::
    test_als_never_collects_factors), then verify with INDEPENDENT
    passes (the ml_logreg_check pattern):

    - user_grad_zero: after the closing user half-step, every user's
      regularized gradient (V_SᵀV_S + λI)u − V_Sᵀr — recomputed from
      the ratings in a fresh grouped join pass, not the solver's
      buffers — has ‖·‖∞ < 1e-8;
    - objective_monotonic: the full objective, re-measured over the
      ratings after every iteration (JVM-side zip_with/aggregate dot
      products), never increases (the ALS guarantee — each half-step
      is an exact argmin);
    - beats_mean_baseline: final SSE < Σ(r − r̄)², with the SSE summed
      inside the same numpy grad pass (independent of the fit's own
      JVM objective path) and the baseline recomputed in-plan;
    - n_users/n_items: distinct-entity counts of the factor SHARDS —
      every observed entity must carry a factor row.

    Only the verdicts and two counts leave the cluster."""
    import pandas as pd
    from pyspark.sql import functions as F

    from wukong_spark.mlops import als_fit

    n_users, n_items, k, reg = 200, 100, 8, 0.1
    ratings = _gen_ratings(spark, n_users, n_items).persist()
    # 2 iterations keep every contract (monotonicity is over the measured
    # sequence; the closing half-step makes the user side exactly optimal)
    # while holding the registry's per-entry runtime budget (ROUND_NOTES)
    u_df, v_df, objs = als_fit(ratings, n_factors=k, reg=reg, iters=2)

    joined = (
        ratings.join(v_df.withColumnRenamed("f", "vf"), "item_id")
        .join(u_df.withColumnRenamed("f", "uf"), "user_id")
        .select("user_id", "rating", "uf", "vf")
    )

    def user_grad(pdf: pd.DataFrame) -> pd.DataFrame:
        vs = np.stack(pdf["vf"].to_numpy())
        u = np.asarray(pdf["uf"].iloc[0], dtype=np.float64)
        r = pdf["rating"].to_numpy(dtype=np.float64)
        g = (vs.T @ vs + reg * np.eye(k)) @ u - vs.T @ r
        sse = float(((r - vs @ u) ** 2).sum())
        return pd.DataFrame({"g": [float(np.abs(g).max())], "sse": [sse]})

    # r17 opt round (guide §1.2: job-count-bound entry): the four
    # verification legs — gradient/SSE agg, ratings mean-baseline stats,
    # and both factor counts — are all 1-row aggregates, so crossJoin
    # them into ONE collect job (4 driver round-trips → 1; each leg is
    # still its own distributed stage under that job, same exchanges,
    # same values)
    grad_leg = (
        joined.groupBy("user_id")
        .applyInPandas(user_grad, "g double, sse double")
        .agg(F.max("g").alias("gmax"), F.sum("sse").alias("sse"))
    )
    stats_leg = ratings.agg(
        F.sum(F.col("rating") * F.col("rating")).alias("srr"),
        F.sum("rating").alias("sr"),
        F.count(F.lit(1)).alias("n"),
    )
    cnt_u_leg = u_df.agg(F.count(F.lit(1)).alias("nu"))
    cnt_v_leg = v_df.agg(F.count(F.lit(1)).alias("nv"))
    row = (
        grad_leg.crossJoin(stats_leg)
        .crossJoin(cnt_u_leg)
        .crossJoin(cnt_v_leg)
        .collect()[0]
    )
    gmax, sse_final = float(row["gmax"]), float(row["sse"])
    # mean-baseline SSE without a window: Σr² − (Σr)²/n
    sse_mean = float(row["srr"]) - float(row["sr"]) ** 2 / float(row["n"])
    monotonic = all(b <= a + 1e-9 for a, b in zip(objs, objs[1:]))
    got_users, got_items = int(row["nu"]), int(row["nv"])
    ratings.unpersist()
    from wukong_spark.session import release_checkpoint

    # only scalars leave; both factor checkpoints are done (leak audit r15)
    release_checkpoint(u_df)
    release_checkpoint(v_df)
    return local_frame(
        spark,
        [
            (
                bool(gmax < 1e-8),
                bool(monotonic),
                bool(sse_final < sse_mean),
                int(got_users),
                int(got_items),
                k,
            )
        ],
        "user_grad_zero boolean, objective_monotonic boolean,"
        " beats_mean_baseline boolean, n_users int, n_items int,"
        " n_factors int",
    )


# --- k-fold ridge CV (d=2 + intercept), shared Cramer/MSE formula text ---
# The EXACT same strings feed the Spark selectExpr stages and the DuckDB
# oracle, so the fixed IEEE op sequence is identical in both engines and
# the round-6 doubles hash bit-for-bit (the ml_kfold_cv_check discipline
# lifted to a 3x3 system solved by Cramer's rule).
_KR_TRAIN = (
    "CAST(ts11 - s11 AS DOUBLE) + 1000.0 AS m11,"
    " CAST(ts12 - s12 AS DOUBLE) AS m12,"
    " CAST(ts1 - s1 AS DOUBLE) AS m13,"
    " CAST(ts22 - s22 AS DOUBLE) + 1000.0 AS m22,"
    " CAST(ts2 - s2 AS DOUBLE) AS m23,"
    " CAST(tn - n AS DOUBLE) AS m33,"
    " CAST(ts1y - s1y AS DOUBLE) AS v1,"
    " CAST(ts2y - s2y AS DOUBLE) AS v2,"
    " CAST(tsy - sy AS DOUBLE) AS v3,"
    " tn - n AS n_train"
)
_KR_DETS = (
    "m11*(m22*m33 - m23*m23) - m12*(m12*m33 - m23*m13)"
    " + m13*(m12*m23 - m22*m13) AS det,"
    " v1*(m22*m33 - m23*m23) - m12*(v2*m33 - m23*v3)"
    " + m13*(v2*m23 - m22*v3) AS det1,"
    " m11*(v2*m33 - m23*v3) - v1*(m12*m33 - m23*m13)"
    " + m13*(m12*v3 - v2*m13) AS det2,"
    " m11*(m22*v3 - v2*m23) - m12*(m12*v3 - v2*m13)"
    " + v1*(m12*m23 - m22*m13) AS det3"
)
_KR_MSE = (
    "(CAST(syy AS DOUBLE) + b1*b1*CAST(s11 AS DOUBLE)"
    " + b2*b2*CAST(s22 AS DOUBLE) + b0*b0*CAST(n AS DOUBLE)"
    " + 2*b1*b2*CAST(s12 AS DOUBLE) + 2*b1*b0*CAST(s1 AS DOUBLE)"
    " + 2*b2*b0*CAST(s2 AS DOUBLE) - 2*b1*CAST(s1y AS DOUBLE)"
    " - 2*b2*CAST(s2y AS DOUBLE) - 2*b0*CAST(sy AS DOUBLE))"
    " / CAST(n AS DOUBLE)"
)


@query(
    "ml_kfold_ridge_check",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, COUNT(*) AS x1,
             SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS x2
      FROM lineitem GROUP BY l_orderkey
    ),
    xy AS (
      SELECT li.l_orderkey % 5 AS fold, li.x1, li.x2,
             CAST(ROUND(o.o_totalprice) AS BIGINT) AS y
      FROM li JOIN orders o ON o.o_orderkey = li.l_orderkey
    ),
    pf AS (
      SELECT fold, COUNT(*) AS n, SUM(x1) AS s1, SUM(x2) AS s2,
             SUM(x1*x1) AS s11, SUM(x1*x2) AS s12, SUM(x2*x2) AS s22,
             SUM(y) AS sy, SUM(x1*y) AS s1y, SUM(x2*y) AS s2y,
             SUM(y*y) AS syy
      FROM xy GROUP BY fold
    ),
    tot AS (
      SELECT SUM(n) AS tn, SUM(s1) AS ts1, SUM(s2) AS ts2,
             SUM(s11) AS ts11, SUM(s12) AS ts12, SUM(s22) AS ts22,
             SUM(sy) AS tsy, SUM(s1y) AS ts1y, SUM(s2y) AS ts2y
      FROM pf
    ),
    tr AS (
      SELECT fold, n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy,
             {_KR_TRAIN}
      FROM pf CROSS JOIN tot
    ),
    dt AS (
      SELECT fold, n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy, n_train,
             {_KR_DETS}
      FROM tr
    ),
    b AS (
      SELECT *, det1/det AS b1, det2/det AS b2, det3/det AS b0 FROM dt
    )
    SELECT fold, CAST(n_train AS BIGINT) AS n_train, CAST(n AS BIGINT) AS n_val,
           ROUND(b1, 6) AS b1_6, ROUND(b2, 6) AS b2_6, ROUND(b0, 6) AS b0_6,
           CAST(ROUND({_KR_MSE}, 0) AS BIGINT) AS val_mse_r
    FROM b ORDER BY fold
    """,
)
def ml_kfold_ridge_check(spark: SparkSession, sf_dir: str):
    """K-FOLD RIDGE CV for MULTIVARIATE features (r12, VERDICT r11 #8 —
    `ml_kfold_cv_check`'s sufficient-statistics trick generalized past
    d=1): per-order features x = (lineitem count, Σ quantity) plus an
    unpenalized intercept, y = order total, 5 deterministic folds, ridge
    λ=1000 — every fold's 3×3 normal-equation system solved IN-PLAN by
    Cramer's rule whose formula text is char-identical in Spark and
    DuckDB, so all 5 models' coefficients hash bit-for-bit at round-6.
    The held-out MSE is ~1e10 (whole dollars squared), where a 1e-6
    rounding grid sits AT the double ulp and a 1-ulp cross-engine
    accumulation difference flips the digit (caught at sf0.001) — so
    the MSE is emitted on an INTEGER grid (round-0 bigint), 6 orders
    above the drift.

    The one-pass structure is the point: per-fold integer Gramian
    statistics (n, Σx_i, Σx_i x_j, Σx_i y, Σy, Σy²), train = total −
    fold by EXACT bigint subtraction, and the validation MSE is a
    quadratic form in the same statistics — 5 fits + 5 scorings, ONE
    scan, no rescan per fold.  The general-d operator (driver-side
    numpy solve over the same partials) is `mlops.kfold_ridge`, pinned
    against this entry in tests/test_kfold_ridge.py.

    100 TB path: one groupBy(l_orderkey), one join, one 5-row fold agg;
    adding folds or features never adds a data pass (stats grow as
    k·d², the data motion doesn't)."""
    from pyspark.sql import functions as F

    li = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("x1"),
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("x2"),
        )
    )
    o = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice")).cast("long").alias("y"),
    )
    xy = li.join(o, "l_orderkey").select(
        (F.col("l_orderkey") % 5).alias("fold"), "x1", "x2", "y"
    )
    pf = xy.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    tot = pf.agg(
        F.sum("n").alias("tn"),
        F.sum("s1").alias("ts1"),
        F.sum("s2").alias("ts2"),
        F.sum("s11").alias("ts11"),
        F.sum("s12").alias("ts12"),
        F.sum("s22").alias("ts22"),
        F.sum("sy").alias("tsy"),
        F.sum("s1y").alias("ts1y"),
        F.sum("s2y").alias("ts2y"),
    )
    keep = "fold, n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy"
    tr = pf.crossJoin(F.broadcast(tot)).selectExpr(
        *keep.split(", "), *_KR_TRAIN.split(", ")
    )
    dt = tr.selectExpr(*keep.split(", "), "n_train", *_KR_DETS.split(", "))
    b = dt.selectExpr("*", "det1/det AS b1", "det2/det AS b2", "det3/det AS b0")
    return b.selectExpr(
        "fold",
        "CAST(n_train AS BIGINT) AS n_train",
        "CAST(n AS BIGINT) AS n_val",
        "ROUND(b1, 6) AS b1_6",
        "ROUND(b2, 6) AS b2_6",
        "ROUND(b0, 6) AS b0_6",
        f"CAST(ROUND({_KR_MSE}, 0) AS BIGINT) AS val_mse_r",
    ).orderBy("fold")
