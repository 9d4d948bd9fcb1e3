"""Capture the PRE-checkpoint subplan evidence for the ml_predict_ref
fusion (r17 opt round).

capture_plans.py records each query's TERMINAL frame, but
ml_predict_ref's terminal frame sits on an eager localCheckpoint, so
the interesting part of the plan — the generate→predict Python chain —
is invisible there.  This script captures the subplan that feeds the
checkpoint, both ways:

- before: the r16 composition (make_classification_blocks →
  predict_broadcast → groupBy), exactly as the query built it before
  commit 2f006e1 — the helpers are unchanged in mlops.py, so this IS
  the old plan;
- after: the fused single-pass partials subplan the query builds now.

Writes plans/r17/ml_predict_ref_subplan_{before,after}.txt.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from wukong_spark.session import get_spark


def main() -> None:
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("wukong-spark-subplan-capture")

    from wukong_spark.mlops import LinearModel, make_classification_blocks, predict_broadcast

    n, n_feat, seed = 80_000, 20, 17
    rng = np.random.default_rng(seed)
    x0 = rng.standard_normal((min(n // 20, 5000), n_feat))
    y0 = (x0 @ np.random.default_rng(seed).standard_normal(n_feat) >= 0).astype(np.int32)
    model = LinearModel.fit(x0, y0)

    # -- before: the pre-2f006e1 composition --------------------------------
    df = make_classification_blocks(spark, n, n_feat, 20, seed=seed)
    pred = predict_broadcast(df, model, id_cols=("sample_id", "label"), margin_col="am")
    before = pred.groupBy("label", "prediction").agg(
        F.count("*").alias("n"), F.min("am").alias("gm")
    )
    with open(os.path.join(outdir, "ml_predict_ref_subplan_before.txt"), "w") as f:
        f.write(before._sc._jvm.PythonSQLUtils.explainString(
            before._jdf.queryExecution(), "formatted"))

    # -- after: the fused partials subplan the query builds now -------------
    from wukong_spark.queries import load_all

    # build the query's own pre-checkpoint partials frame by calling the
    # module-level helper path: easiest faithful route is to re-derive it
    # the same way ml_predict_ref does
    from typing import Iterator

    import pandas as pd

    bc = spark.sparkContext.broadcast(model)
    n_parts = 20
    per = (n + n_parts - 1) // n_parts

    def gen_predict_partials(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        m = bc.value
        for pdf in batches:
            for pid in pdf["id"]:
                prng = np.random.default_rng(seed + int(pid))
                nn = min(per, n - int(pid) * per)
                if nn <= 0:
                    continue
                w = np.random.default_rng(seed).standard_normal(n_feat)
                x = prng.standard_normal((nn, n_feat))
                y = (x @ w >= 0).astype(np.int32)
                margin = m.decision_function(x)
                p = (margin >= 0).astype(np.int32)
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
    after = partials.groupBy("label", "prediction").agg(
        F.sum("n").alias("n"), F.min("gm").alias("gm")
    )
    with open(os.path.join(outdir, "ml_predict_ref_subplan_after.txt"), "w") as f:
        f.write(after._sc._jvm.PythonSQLUtils.explainString(
            after._jdf.queryExecution(), "formatted"))
    spark.stop()


if __name__ == "__main__":
    main()
