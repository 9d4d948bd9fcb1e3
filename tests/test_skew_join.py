"""AQE skew-join handling: a pathologically skewed join must (a) still be
correct and (b) get its skewed partition split by AQE when thresholds are
crossed — the runtime re-plan this engine relies on instead of manual
salting for joins (SURVEY.md §4 "locality/skew" row)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_skewed_join_correct_and_aqe_splits(spark):
    # 1 hot key carrying ~95% of rows + a long tail
    hot = spark.range(0, 190_000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(0, 10_000).select(
        (F.col("id") % 997 + 100).alias("k"), F.col("id").alias("payload")
    )
    left = hot.union(tail)
    right = spark.range(0, 2_000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # force SMJ (no broadcast escape) and make the hot partition count
        # as skewed at toy scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")

        joined = left.join(right, "k")
        # action on THIS DataFrame's own QueryExecution (count() would spawn
        # a separate one and leave this plan non-final)
        n = len(joined.collect())
        assert n == 190_000 + 10_000  # every row matched exactly once

        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in executed
        assert "SortMergeJoin" in executed
        assert "skew=true" in executed, "AQE did not split the skewed partition"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_multikey_and_nulls(spark):
    """salted_join (r10): composite keys salt correctly, NULL join keys
    drop from BOTH branches (inner-join semantics — `~isin(hot)` is
    NULL for null keys and would otherwise leak them out of only the
    cold branch), and the result equals the plain inner join exactly."""
    from pyspark.sql import functions as F

    from wukong_spark.operators.skew import salted_join

    big = spark.range(0, 20000, 1, 8).select(
        F.when(F.col("id") % 4 == 3, None)
        .otherwise(F.when(F.col("id") % 3 < 2, F.lit(0)).otherwise(F.col("id") % 40))
        .alias("k1"),
        (F.col("id") % 2).alias("k2"),
        (F.col("id") % 11).alias("v"),
    )
    dim = spark.range(0, 40).select(
        F.col("id").alias("k1"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("k2"),
        (F.col("id") * 3).alias("w"),
    )
    salted = salted_join(big, dim, on=["k1", "k2"], hot_keys=[(0, 0), (0, 1)])
    plain = big.join(dim, ["k1", "k2"], "inner")
    assert salted.count() == plain.count()
    assert (
        salted.groupBy("k1", "k2")
        .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
        .exceptAll(
            plain.groupBy("k1", "k2").agg(F.sum(F.col("v") * F.col("w")).alias("s"))
        )
        .count()
        == 0
    )
    # no __salt column may leak into the result schema
    assert "__salt" not in salted.columns


def test_salted_join_null_hot_key(spark):
    """ADVICE r10 (high): when the big side's HOTTEST key is NULL,
    detect_hot_keys must not return a None-containing tuple — `col ==
    lit(None)` is SQL NULL for every row, so `~hot_pred` would silently
    empty the entire cold branch (wrong results, not just bad
    partitioning).  Auto-detected and explicitly-passed null tuples must
    both yield exactly the plain inner join."""
    from pyspark.sql import functions as F

    from wukong_spark.operators.skew import detect_hot_keys, salted_join

    # 2/3 of rows carry a NULL key — the hottest "key" is the null
    big = spark.range(0, 12000, 1, 8).select(
        F.when(F.col("id") % 3 < 2, None)
        .otherwise(F.col("id") % 20)
        .alias("k"),
        (F.col("id") % 5).alias("v"),
    )
    dim = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    hot = detect_hot_keys(big, ["k"], fraction=0.5)
    assert all(t[0] is not None for t in hot)

    plain = big.join(dim, ["k"], "inner")
    for hk in (None, [(None,)], [(None,), (0,)]):
        salted = salted_join(big, dim, on=["k"], hot_keys=hk)
        assert salted.count() == plain.count() > 0
        assert (
            salted.groupBy("k")
            .agg(F.sum(F.col("v") * F.col("w")).alias("s"))
            .exceptAll(
                plain.groupBy("k").agg(F.sum(F.col("v") * F.col("w")).alias("s"))
            )
            .count()
            == 0
        )
