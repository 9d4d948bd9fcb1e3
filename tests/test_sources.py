"""Source/sink round-trips + the two scale write disciplines."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from wukong_spark.sources import read_any, write_any, write_bucketed_table


@pytest.fixture()
def tmppath():
    d = tempfile.mkdtemp(prefix="wukong-sources-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet")


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc", "xml"])
def test_roundtrip_formats(spark, tmppath, fmt):
    src = _orders(spark).limit(200)
    if fmt == "xml":  # XML writes timestamps as strings; keep types simple
        src = src.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    write_any(src, f"{tmppath}/data", fmt=fmt)
    # parquet/orc are self-describing; csv/json/xml need the explicit schema
    if fmt in ("parquet", "orc"):
        schema = None
    elif fmt == "xml":
        schema = (
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double"
        )
    else:
        schema = (
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
        )
    back = read_any(spark, f"{tmppath}/data", fmt=fmt, schema=schema)
    assert back.count() == 200
    a = src.agg(F.sum("o_orderkey")).collect()[0][0]
    b = back.agg(F.sum("o_orderkey")).collect()[0][0]
    assert a == b


def test_text_format_lines_roundtrip(spark, tmppath):
    src = _orders(spark).limit(50).selectExpr("o_orderpriority AS value")
    write_any(src, f"{tmppath}/lines", fmt="text")
    back = read_any(spark, f"{tmppath}/lines", fmt="text")
    assert back.count() == 50
    assert dict(back.dtypes) == {"value": "string"}


def test_avro_unavailable_raises_clearly(spark):
    with pytest.raises(ValueError, match="spark-avro"):
        read_any(spark, "/nonexistent", fmt="avro")


def test_partitioned_write_prunes(spark, tmppath):
    src = _orders(spark).withColumn("y", F.year("o_orderdate"))
    write_any(src, f"{tmppath}/by_year", partition_by=["y"])
    back = spark.read.parquet(f"{tmppath}/by_year").filter(F.col("y") == 1996)
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    # partition filter reaches the scan: only year=1996 directories read
    assert "PartitionFilters" in plan
    assert back.count() == src.filter(F.col("y") == 1996).count()


def test_bucketed_join_no_shuffle(spark, tmppath):
    import re

    # managed tables land in ./spark-warehouse (gitignored)
    orders = _orders(spark)
    custs = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    write_bucketed_table(orders, "orders_b", "o_custkey", 4)
    write_bucketed_table(custs, "cust_b", "c_custkey", 4)
    joined = (
        spark.table("orders_b")
        .hint("merge")  # force sort-merge so bucket co-location is observable
        .join(spark.table("cust_b"), F.col("o_custkey") == F.col("c_custkey"))
    )
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    # both sides bucketed on the key → NO shuffle exchange in the plan
    shuffles = re.findall(r"\(\d+\) Exchange\b", plan)
    assert not shuffles, shuffles
    assert joined.count() == orders.join(custs, orders.o_custkey == custs.c_custkey).count()
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS cust_b")


def test_binary_file_ingestion_to_multimodal(spark, tmppath):
    """binaryFile source → metadata wrap → fake decode: the full multimodal
    ingestion path over real files on disk."""
    import os

    from wukong_spark.operators.multimodal import attach_media_metadata, decode_images
    from wukong_spark.sources import read_binary_files

    os.makedirs(f"{tmppath}/media", exist_ok=True)
    payloads = {f"img_{i}.bin": bytes([i] * (100 + i)) for i in range(5)}
    for name, data in payloads.items():
        with open(f"{tmppath}/media/{name}", "wb") as f:
            f.write(data)

    raw = read_binary_files(spark, f"{tmppath}/media", glob="*.bin")
    assert raw.count() == 5
    assert dict(raw.dtypes)["content"] == "binary"

    with_id = raw.withColumn(
        "fid", F.regexp_extract(F.col("path"), r"img_(\d+)\.bin", 1).cast("long")
    )
    media = attach_media_metadata(with_id, "content", "image", "image/png", "fid")
    rows = {r.media_id: r for r in media.collect()}
    assert rows[3].n_bytes == 103

    decoded = decode_images(media, fake_decoder=True, height=4, width=4)
    out = decoded.collect()
    assert len(out) == 5
    assert all(len(r.pixels) == 4 * 4 * 3 for r in out)
