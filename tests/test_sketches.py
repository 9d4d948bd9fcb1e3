"""Sketch-aggregate accuracy contracts (the rows-only queries' real oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wukong_spark.queries import load_all
from wukong_spark.session import load_table
from tests.conftest import SF_CORRECT

REG = load_all()


def test_approx_stats_within_bounds(spark):
    # the sketch surface itself (registry-wise it lives inside
    # sketch_check's aggregation since r7): numeric error bounds vs exact
    l = load_table(spark, SF_CORRECT, "lineitem")
    got = {
        r["l_returnflag"]: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
            F.percentile_approx(
                "l_extendedprice", F.lit(0.5), F.lit(10000)
            ).alias("approx_p50"),
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        g = got[flag]
        assert abs(g["approx_orders"] - e["n"]) / e["n"] < 0.05, flag
        assert abs(g["approx_p50"] - e["p50"]) / e["p50"] < 0.01, flag
