"""Parallel model inference (reference: `README.md:273-305`,
`docs/examples/examples.rst:119-141` ParallelPostFit(SVC)): broadcast a
fitted model, score partitions in parallel via Arrow-batched mapInPandas —
the predictions must equal local scoring."""

from __future__ import annotations

import numpy as np


def run(spark) -> bool:
    from wukong_spark.mlops import (
        LinearModel,
        make_classification_blocks,
        predict_broadcast,
    )

    # scaled-down 800000-sample/20-chunk benchmark shape
    df = make_classification_blocks(
        spark, n_samples=20_000, n_features=8, n_partitions=20, seed=4
    )
    sample = df.limit(2_000).toPandas()
    model = LinearModel.fit(
        np.vstack(sample["features"].map(np.asarray)), sample["label"].to_numpy()
    )
    scored = predict_broadcast(df, model, id_cols=("sample_id",))

    pdf = scored.toPandas().sort_values("sample_id")
    local = model.predict(
        np.vstack(df.toPandas().sort_values("sample_id")["features"].map(np.asarray))
    )
    agree = float((pdf["prediction"].to_numpy() == local).mean())
    print(f"  n={len(pdf)} agreement_with_local={agree:.4f}")
    return agree == 1.0


if __name__ == "__main__":
    from _common import report, session

    report("svc_inference", run(session()))
