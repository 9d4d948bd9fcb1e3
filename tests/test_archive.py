"""Archive-shard ingestion (WebDataset-style tar/zip/gzip) tests."""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from wukong_spark.operators.archive import (
    decompress_column,
    explode_tar,
    explode_zip,
    group_webdataset_samples,
)


def _tar_bytes(members: dict[str, bytes], gz: bool = False) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz" if gz else "w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


_SAMPLES = {
    "000.jpg": b"fakejpegbytes",
    "000.json": b'{"caption": "a"}',
    "001.jpg": b"morefakebytes!",
    "001.json": b'{"caption": "b"}',
}


def test_explode_tar_plain_and_gzip(spark):
    for gz in (False, True):
        df = spark.createDataFrame(
            [(1, bytearray(_tar_bytes(_SAMPLES, gz=gz)))],
            "media_id long, payload binary",
        )
        out = explode_tar(df).toPandas().sort_values("member", ignore_index=True)
        assert list(out["member"]) == sorted(_SAMPLES)
        for _, r in out.iterrows():
            assert bytes(r["content"]) == _SAMPLES[r["member"]]
            assert r["n_bytes"] == len(_SAMPLES[r["member"]])


def test_explode_tar_bz2_and_xz(spark):
    """Wiki/crawl dumps ship .tar.bz2 and .tar.xz; tarfile's r:* sniff
    plus stdlib bz2/lzma cover both (r9)."""
    import tarfile as _tf

    for mode in ("w:bz2", "w:xz"):
        buf = io.BytesIO()
        with _tf.open(fileobj=buf, mode=mode) as tf:
            for name, data in _SAMPLES.items():
                info = _tf.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        df = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()))], "media_id long, payload binary"
        )
        out = explode_tar(df).toPandas().sort_values("member", ignore_index=True)
        assert list(out["member"]) == sorted(_SAMPLES), mode
        for _, r in out.iterrows():
            assert bytes(r["content"]) == _SAMPLES[r["member"]]


def test_decompress_column_bz2_and_xz(spark):
    import bz2 as _bz2
    import lzma as _lzma

    doc = b'{"text": "compressed jsonl line"}\n' * 50
    for codec, comp in (("bz2", _bz2.compress), ("xz", _lzma.compress)):
        df = spark.createDataFrame(
            [(1, bytearray(comp(doc)))], "media_id long, payload binary"
        )
        out = decompress_column(df, codec=codec).collect()[0]
        assert bytes(out.payload) == doc, codec


def test_explode_zip(spark):
    df = spark.createDataFrame(
        [(2, bytearray(_zip_bytes(_SAMPLES)))], "media_id long, payload binary"
    )
    out = explode_zip(df).toPandas().sort_values("member", ignore_index=True)
    assert list(out["member"]) == sorted(_SAMPLES)
    assert all(bytes(r["content"]) == _SAMPLES[r["member"]] for _, r in out.iterrows())


def test_decompress_column_gzip(spark):
    raw = b"x" * 1000 + b"hello jsonl\n"
    df = spark.createDataFrame(
        [(1, bytearray(gzip.compress(raw)))], "media_id long, payload binary"
    )
    out = decompress_column(df).collect()[0]
    assert bytes(out.payload) == raw
    with pytest.raises(NotImplementedError, match="zstd"):
        decompress_column(df, codec="zstd")


def test_webdataset_grouping(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_tar_bytes(_SAMPLES)))], "media_id long, payload binary"
    )
    grouped = group_webdataset_samples(explode_tar(df))
    rows = {r.key: r for r in grouped.collect()}
    assert set(rows) == {"000", "001"}
    assert set(rows["000"].fields.keys()) == {"jpg", "json"}
    assert bytes(rows["000"].fields["jpg"]) == _SAMPLES["000.jpg"]


def test_tar_to_image_decode_pipeline(spark):
    """Full WebDataset-ish path: tar shard of real BMPs → explode →
    decode_images — archive bytes to pixel tensors without leaving Spark."""
    from wukong_spark.operators.multimodal import decode_images, encode_bmp

    rng = np.random.default_rng(55)
    imgs = {f"{i:03d}.bmp": rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for i in range(4)}
    shard = _tar_bytes({k: encode_bmp(v) for k, v in imgs.items()})
    df = spark.createDataFrame([(1, bytearray(shard))], "media_id long, payload binary")
    members = explode_tar(df).select(
        F.monotonically_increasing_id().alias("media_id"),
        F.col("member"),
        F.col("content").alias("payload"),
    )
    decoded = decode_images(members, height=8, width=8).toPandas()
    assert len(decoded) == 4
    got_means = sorted(round(m, 3) for m in decoded["mean_r"])
    want_means = sorted(round(float(v[..., 0].mean()), 3) for v in imgs.values())
    assert got_means == want_means


def test_member_size_guard():
    from wukong_spark.operators.archive import MAX_MEMBER_BYTES, _check_member

    _check_member("ok", 1000)
    with pytest.raises(ValueError, match="bomb"):
        _check_member("evil", MAX_MEMBER_BYTES + 1)


def test_write_webdataset_shards_empty_and_padding(spark):
    """Export robustness (r11): an empty sample frame yields zero shards;
    a 1-sample frame yields one valid shard that round-trips."""
    from pyspark.sql import functions as F

    from wukong_spark.operators.archive import (
        explode_tar,
        group_webdataset_samples,
        write_webdataset_shards,
    )

    empty = spark.createDataFrame(
        [], "key string, fields map<string, binary>"
    )
    assert write_webdataset_shards(empty, n_shards=4).count() == 0

    one = spark.createDataFrame(
        [("s0", {"txt": bytearray(b"hello"), "json": bytearray(b"{}")})],
        "key string, fields map<string, binary>",
    )
    shards = write_webdataset_shards(one, n_shards=4)
    assert shards.count() == 1
    back = group_webdataset_samples(
        explode_tar(
            shards.select(F.col("shard_id").cast("long").alias("media_id"), "payload")
        )
    ).collect()
    assert len(back) == 1 and back[0]["key"] == "s0"
    fields = dict(back[0]["fields"])
    assert bytes(fields["txt"]) == b"hello" and bytes(fields["json"]) == b"{}"
