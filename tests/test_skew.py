"""Salted two-phase aggregation: exact equivalence with plain groupBy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wukong_spark.operators.skew import salted_agg
from wukong_spark.session import load_table
from tests.conftest import SF_SMOKE


def test_salted_matches_plain(spark):
    e = load_table(spark, SF_SMOKE, "events")
    got = salted_agg(
        e,
        keys=["event_type"],
        aggs={
            "n": ("count", None),
            "min_event": ("min", "event_id"),
            "max_event": ("max", "event_id"),
            "sum_user": ("sum", "user_id"),
        },
        buckets=8,
    )
    want = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
        F.sum("user_id").alias("sum_user"),
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w


def test_salted_rejects_non_decomposable(spark):
    e = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(e, ["event_type"], {"a": ("avg", "value")})


def test_salted_plan_has_two_aggregations(spark):
    e = load_table(spark, SF_SMOKE, "events")
    df = salted_agg(e, ["event_type"], {"n": ("count", None)}, buckets=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two shuffle boundaries: (key, salt) then (key)
    assert plan.count("Exchange") >= 2


def test_salted_ops_empty_inputs(spark):
    """Empty frames must flow through both skew operators without error
    and yield empty results (r11 robustness batch)."""
    from pyspark.sql import functions as F

    from wukong_spark.operators.skew import salted_agg, salted_join

    empty = spark.range(0).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("v")
    )
    full = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    assert salted_agg(empty, ["k"], {"n": ("count", None)}).count() == 0
    assert salted_join(empty, full, on=["k"], hot_keys=[(1,)]).count() == 0
    assert salted_join(
        full.withColumnRenamed("w", "v"), empty.withColumnRenamed("v", "w"),
        on=["k"], hot_keys=[(1,)]
    ).count() == 0


def test_salted_ops_tolerate_map_columns(spark):
    """ADVICE r11 low: the content-derived salt hashes only HASHABLE
    columns — a map-typed column must not raise AnalysisException in
    either salted operator, and results still match the plain plan."""
    from pyspark.sql import functions as F

    from wukong_spark.operators.skew import salted_agg, salted_join

    df = spark.range(200).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("v"),
        F.create_map(F.lit("a"), F.col("id")).alias("m"),
    )
    got = (
        salted_agg(df, ["k"], {"n": ("count", None), "s": ("sum", "v")}, buckets=4)
        .orderBy("k")
        .collect()
    )
    want = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .orderBy("k")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    small = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("t"))
    j = salted_join(df, small, on=["k"], hot_keys=[(0,)], buckets=4)
    assert j.count() == df.join(small, ["k"]).count()


def test_salt_expr_all_unhashable_degenerates_not_fails(spark):
    """A frame whose every column is map-typed salts to the constant 0
    (documented degeneration: correct results, no spread) instead of
    raising."""
    from pyspark.sql import functions as F

    from wukong_spark.operators.skew import _salt_expr

    df = spark.range(10).select(
        F.create_map(F.lit("a"), F.col("id")).alias("m")
    )
    vals = df.select(_salt_expr(df, 8).alias("s")).distinct().collect()
    assert [r["s"] for r in vals] == [0]
