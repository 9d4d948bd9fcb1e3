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


def test_bloom_build_probe_contracts(spark):
    """Bloom filter (r9): zero false negatives structurally; FP rate near
    the 12-bits/key design point; string and integer key dtypes both
    work (different hash lanes, same contracts)."""
    import numpy as np

    from wukong_spark.operators.membership import bloom_build, bloom_probe

    members = spark.range(0, 2000).selectExpr("id AS key")
    bits = bloom_build(members, "key", ((12 * 2000 + 7) // 8) * 8, k=7)
    probe = spark.range(0, 6000).selectExpr("id AS key")
    rows = bloom_probe(probe, "key", bits, k=7).collect()
    hits = {r.key: r.maybe for r in rows}
    assert all(hits[i] for i in range(2000))  # no false negatives
    fp = sum(hits[i] for i in range(2000, 6000))
    assert fp / 4000 < 0.05  # ~0.8 % expected at this sizing

    smem = members.selectExpr("CAST(key AS STRING) AS key")
    sbits = bloom_build(smem, "key", ((12 * 2000 + 7) // 8) * 8, k=7)
    srows = bloom_probe(
        probe.selectExpr("CAST(key AS STRING) AS key"), "key", sbits, k=7
    ).collect()
    shits = {int(r.key): r.maybe for r in srows}
    assert all(shits[i] for i in range(2000))
    assert sum(shits[i] for i in range(2000, 6000)) / 4000 < 0.05
    assert isinstance(bits, np.ndarray)


def test_bloom_null_carrying_int_column(spark):
    """ADVICE r9 (medium): an integral key column with NULLs arrives as
    float64/object only in the batches that hold a null.  The hash branch
    is now schema-decided, so build and probe must agree even when nulls
    land in some partitions and not others — no false negatives, and the
    null key itself round-trips."""
    members = spark.range(0, 4000, 1, 8).selectExpr(
        "CASE WHEN id % 1000 = 999 THEN NULL ELSE id END AS key"
    )
    from wukong_spark.operators.membership import bloom_build, bloom_probe

    bits = bloom_build(members, "key", ((12 * 4000 + 7) // 8) * 8, k=7)
    probe = spark.range(0, 12000, 1, 8).selectExpr(
        "CASE WHEN id = 0 THEN NULL ELSE id END AS key"
    )
    rows = bloom_probe(probe, "key", bits, k=7).collect()
    hits = {r.key: r.maybe for r in rows}
    # every non-null member present (999/1999/2999/3999 were nulled out)
    members_set = {i for i in range(1, 4000) if i % 1000 != 999}
    assert all(hits[i] for i in members_set)
    assert hits[None]  # NULL was inserted → NULL probe must hit
    fp = sum(hits[i] for i in range(4000, 12000))
    assert fp / 8000 < 0.05


def test_countmin_estimates_bounded(spark):
    """Count-Min (r9): estimates never under-count, and every key's
    overestimate stays within 3eN/width (prob < 1e-6 per key)."""
    import math

    import numpy as np
    import pandas as pd

    from wukong_spark.operators.membership import (
        countmin_build,
        countmin_estimate,
    )

    # skewed stream: key = id % 200, with key 7 heavy (every 3rd row)
    df = spark.range(0, 20000).selectExpr(
        "CASE WHEN id % 3 = 0 THEN CAST(7 AS BIGINT) ELSE id % 200 END AS key"
    )
    cms = countmin_build(df, "key", 4096, 7)
    truth = df.groupBy("key").count().toPandas()
    ests = countmin_estimate(cms, truth["key"])
    t = truth["count"].to_numpy()
    assert (ests >= t).all()
    assert ((ests - t) <= 3 * math.e * 20000 / 4096).all()
    assert int(cms.sum()) == 7 * 20000  # every row counted in every row-hash
    # heavy hitter is recovered exactly-ish
    heavy = truth.loc[truth["key"] == 7, "count"].iloc[0]
    est7 = countmin_estimate(cms, pd.Series([7], dtype="int64"))[0]
    assert heavy <= est7 <= heavy + 3 * math.e * 20000 / 4096
    assert isinstance(cms, np.ndarray)


def test_local_heavy_candidates_superset(spark):
    """local_heavy_candidates (r10): the per-batch top-m union must
    contain EVERY φ-heavy key (pigeonhole superset), across a skewed
    multi-partition stream."""
    from pyspark.sql import functions as F

    from wukong_spark.operators.membership import local_heavy_candidates

    # key 3 holds 1/3 of the stream; keys 0..599 share the rest, so only
    # key 3 exceeds phi = 1/100 of N = 30000
    df = spark.range(0, 30000, 1, 8).select(
        F.when(F.col("id") % 3 == 0, F.lit(3).cast("long"))
        .otherwise(F.col("id") % 600 + 1000)
        .alias("k")
    )
    cand = {r[0] for r in local_heavy_candidates(df, "k", 0.01).collect()}
    truth = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    heavy = {k for k, n in truth.items() if n > 0.01 * 30000}
    assert heavy <= cand
    # and the candidate set is bounded, not the full key space
    assert len(cand) <= 8 * 2 * 100 + 1


def test_bloom_large_int64_keys_with_nulls(spark):
    """ADVICE r10 (medium): bigint keys with |v| >= 2^53 must hash
    identically in null-carrying and null-free batches.  Arrow->pandas
    promotes a null-carrying int64 batch to float64, rounding such keys
    BEFORE any Python code runs — the operators therefore project
    coalesce(key, 0) + an isnull flag so every batch stays exact int64.
    Build over null-carrying partitions, probe from null-free ones: no
    false negatives allowed."""
    import math

    import pandas as pd
    from pyspark.sql import functions as F

    from wukong_spark.operators.membership import (
        bloom_build,
        bloom_probe,
        countmin_build,
        countmin_estimate,
    )

    base = 1 << 60
    # 2000 odd-offset keys near 2^60 (float64 rounds them to multiples
    # of 256 up here), with a null every 16 rows so EVERY batch carries
    # nulls — the promotion trap fires in every partition
    members = spark.range(0, 2000, 1, 8).select(
        F.when(F.col("id") % 16 == 5, None)
        .otherwise(F.lit(base) + F.col("id") * 2 + 1)
        .alias("key")
    )
    bits = bloom_build(members, "key", ((12 * 2000 + 7) // 8) * 8, k=7)
    # probe side is NULL-FREE: batches arrive as exact int64
    probe = spark.range(0, 2000, 1, 8).select(
        (F.lit(base) + F.col("id") * 2 + 1).alias("key")
    )
    rows = bloom_probe(probe, "key", bits, k=7).collect()
    member_set = {base + i * 2 + 1 for i in range(2000) if i % 16 != 5}
    misses = [r.key for r in rows if r.key in member_set and not r.maybe]
    assert misses == [], f"false negatives on large int64 keys: {misses[:5]}"

    # Count-Min: same trap, never-underestimate must hold
    cms = countmin_build(members, "key", 2048, 5)
    truth = (
        members.filter(F.col("key").isNotNull()).groupBy("key").count().toPandas()
    )
    ests = countmin_estimate(cms, truth["key"].astype("int64"), integral=True)
    assert (ests >= truth["count"].to_numpy()).all()


def test_local_heavy_candidates_null_key(spark):
    """ADVICE r10 (low): a φ-heavy NULL key must surface as a candidate —
    pandas value_counts() drops NaN by default, which would quietly
    violate the documented pigeonhole superset guarantee."""
    from pyspark.sql import functions as F

    from wukong_spark.operators.membership import local_heavy_candidates

    # NULL holds 1/3 of the stream — clearly phi-heavy at phi = 1/100
    df = spark.range(0, 30000, 1, 8).select(
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id") % 600 + 1000)
        .alias("k")
    )
    cand = {r[0] for r in local_heavy_candidates(df, "k", 0.01).collect()}
    assert None in cand
    # string dtype path too (object series hold None)
    sdf = df.select(F.col("k").cast("string").alias("k"))
    scand = {r[0] for r in local_heavy_candidates(sdf, "k", 0.01).collect()}
    assert None in scand


def test_value_hist_build_merge_clip_nulls(spark):
    """value_hist_build (r13): (a) exact counts on a known grid with
    NULLs dropped; (b) MERGEABILITY — partials over disjoint splits sum
    to the one-pass histogram cell-for-cell; (c) out-of-domain values
    clip into the edge buckets (never lost, never crash)."""
    import numpy as np
    from pyspark.sql import functions as F

    from wukong_spark.operators.membership import value_hist_build

    df = spark.range(0, 1000, 1, 8).select(F.col("id").alias("v"))
    with_null = df.unionByName(
        spark.createDataFrame([(None,)], "v long")
    )
    h = value_hist_build(with_null, "v", 100, 16)
    assert list(h[:10]) == [100] * 10 and h.sum() == 1000

    lo = value_hist_build(df.filter("v < 437"), "v", 100, 16)
    hi = value_hist_build(df.filter("v >= 437"), "v", 100, 16)
    assert np.array_equal(lo + hi, value_hist_build(df, "v", 100, 16))

    spiky = spark.createDataFrame([(-5,), (10**12,), (50,)], "v long")
    hs = value_hist_build(spiky, "v", 100, 16)
    assert hs[0] == 2 and hs[15] == 1 and hs.sum() == 3
