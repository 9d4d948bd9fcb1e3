"""ML inference + multimodal plumbing tests.

Inference mirrors the reference oracle: distributed predict must equal the
local model's predict exactly (`/root/reference/README.md:294-304` —
ParallelPostFit differential pattern)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wukong_spark.mlops import LinearModel, make_classification_blocks, predict_broadcast
from wukong_spark.operators.multimodal import (
    attach_media_metadata,
    decode_images,
    frame_sample,
)


def test_make_classification_deterministic(spark):
    a = make_classification_blocks(spark, 1000, 8, 10, seed=3).toPandas()
    b = make_classification_blocks(spark, 1000, 8, 10, seed=3).toPandas()
    a = a.sort_values("sample_id", ignore_index=True)
    b = b.sort_values("sample_id", ignore_index=True)
    assert len(a) == 1000
    assert (a["sample_id"] == b["sample_id"]).all()
    assert all(np.array_equal(x, y) for x, y in zip(a["features"], b["features"]))


def test_predict_broadcast_matches_local(spark):
    # fit locally, predict distributed, compare to local predict — exact
    df = make_classification_blocks(spark, 2000, 8, 20, seed=3)
    local = df.toPandas().sort_values("sample_id", ignore_index=True)
    x = np.vstack(local["features"].map(np.asarray).to_numpy())
    y = local["label"].to_numpy()
    model = LinearModel.fit(x, y)

    pred_df = predict_broadcast(df, model, id_cols=("sample_id",)).toPandas()
    pred_df = pred_df.sort_values("sample_id", ignore_index=True)
    assert np.array_equal(pred_df["prediction"].to_numpy(), model.predict(x))
    # the fitted stand-in should beat chance comfortably on its own data
    assert (model.predict(x) == y).mean() > 0.9


def _media_df(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )
    return attach_media_metadata(payload, "blob", kind="image", mime="image/fake", id_col="doc_id")


def test_attach_media_metadata(spark):
    m = _media_df(spark).toPandas()
    assert len(m) == 20
    assert set(m["kind"]) == {"image"}
    assert (m["n_bytes"] > 0).all()
    assert m["checksum"].str.len().eq(32).all()


def test_decode_stub_raises_without_fake(spark):
    with pytest.raises(NotImplementedError, match="fake_decoder"):
        decode_images(_media_df(spark))


def test_decode_images_fake_deterministic(spark):
    out1 = decode_images(_media_df(spark), fake_decoder=True, height=8, width=8).toPandas()
    out2 = decode_images(_media_df(spark), fake_decoder=True, height=8, width=8).toPandas()
    out1 = out1.sort_values("media_id", ignore_index=True)
    out2 = out2.sort_values("media_id", ignore_index=True)
    assert len(out1) == 20
    assert (out1["height"] == 8).all()
    assert all(len(p) == 8 * 8 * 3 for p in out1["pixels"])
    assert all(np.array_equal(p, q) for p, q in zip(out1["pixels"], out2["pixels"]))
    # channel means consistent with pixels
    row = out1.iloc[0]
    px = np.array(row["pixels"]).reshape(8, 8, 3)
    assert abs(px[..., 0].mean() - row["mean_r"]) < 1e-9


def test_frame_sample(spark):
    out = frame_sample(_media_df(spark), n_frames=3, fake_decoder=True).toPandas()
    assert len(out) == 60
    assert set(out["frame_idx"]) == {0, 1, 2}
