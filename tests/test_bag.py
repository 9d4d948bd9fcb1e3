"""Bag (dask.bag parity) — local-python oracles, mirroring the reference's
bag test shapes (test_collections.py:106-110 groupby by arbitrary key fn)."""

from __future__ import annotations

from collections import Counter

from wukong_spark.bag import Bag


def test_map_filter_fold(spark):
    b = Bag.from_sequence(spark, range(100), npartitions=7)
    got = b.map(lambda x: x * x).filter(lambda x: x % 2 == 0).fold(
        lambda a, x: a + x, 0
    )
    want = sum(x * x for x in range(100) if (x * x) % 2 == 0)
    assert got == want


def test_groupby_arbitrary_key_fn(spark):
    # the reference's bag groupby: hash by arbitrary key fn
    data = list(range(50))
    b = Bag.from_sequence(spark, data, npartitions=5)
    got = dict(b.groupby(lambda x: x % 3).compute())
    assert set(got) == {0, 1, 2}
    for k, vals in got.items():
        assert sorted(vals) == [x for x in data if x % 3 == k]


def test_foldby_matches_groupby_reduce(spark):
    words = ["a", "b", "a", "c", "b", "a"] * 20
    b = Bag.from_sequence(spark, words, npartitions=4)
    got = dict(b.frequencies().compute())
    assert got == dict(Counter(words))


def test_flatten_distinct_count(spark):
    b = Bag.from_sequence(spark, [[1, 2], [2, 3], [3, 4]], npartitions=2)
    assert sorted(b.flatten().distinct().compute()) == [1, 2, 3, 4]
    assert b.flatten().count() == 6


def test_from_dataframe_and_back(spark):
    df = spark.range(10).withColumnRenamed("id", "x")
    b = Bag.from_dataframe(df).map(lambda d: (d["x"], d["x"] * 2))
    out = b.to_dataframe(spark, "x long, double long")
    assert out.count() == 10
    assert out.agg({"double": "sum"}).collect()[0][0] == 90


def test_bag_topk_pluck_starmap_remove(spark):
    """Round-5 parity adds: topk (TakeOrdered, no full sort), pluck with
    default, starmap over tuples, remove = inverted filter."""
    from wukong_spark.bag import Bag

    b = Bag.from_sequence(spark, [5, 1, 9, 3, 7], npartitions=3)
    assert b.topk(2) == [9, 7]
    assert b.topk(2, key=lambda x: -x) == [1, 3]

    d = Bag.from_sequence(
        spark, [{"a": 1, "b": 2}, {"a": 3}, {"b": 4}], npartitions=2
    )
    assert sorted(d.pluck("a", default=-1).compute()) == [-1, 1, 3]

    t = Bag.from_sequence(spark, [(1, 2), (3, 4)], npartitions=2)
    assert sorted(t.starmap(lambda x, y: x + y).compute()) == [3, 7]

    assert sorted(b.remove(lambda x: x > 4).compute()) == [1, 3]


def test_bag_pluck_no_default_raises(spark):
    import pytest

    b = Bag.from_sequence(spark, [1, 2, 3])
    with pytest.raises(Exception):  # Py4J wraps the executor TypeError
        b.pluck("a").compute()
    # an explicit default masks the same error (toolz.get semantics)
    assert b.pluck("a", default=-1).compute() == [-1, -1, -1]


def test_bag_scalar_reductions(spark):
    import math

    xs = [3.0, -1.0, 4.0, 1.0, 5.0, -9.0, 2.0, 6.0]
    b = Bag.from_sequence(spark, xs, npartitions=3)
    assert b.min() == min(xs)
    assert b.max() == max(xs)
    assert abs(b.mean() - sum(xs) / len(xs)) < 1e-12
    mu = sum(xs) / len(xs)
    assert abs(b.var() - sum((x - mu) ** 2 for x in xs) / len(xs)) < 1e-9
    assert abs(b.std(ddof=1) - math.sqrt(sum((x - mu) ** 2 for x in xs) / 7)) < 1e-9
    assert Bag.from_sequence(spark, [0, 0, 2]).any() is True
    assert Bag.from_sequence(spark, [0, 0]).any() is False
    assert Bag.from_sequence(spark, [1, 2, 3]).all() is True
    assert Bag.from_sequence(spark, [1, 0, 3]).all() is False


def test_bag_accumulate_matches_itertools(spark):
    import itertools
    import operator

    xs = list(range(1, 21))
    b = Bag.from_sequence(spark, xs, npartitions=4)
    assert b.accumulate(operator.add).compute() == list(
        itertools.accumulate(xs, operator.add)
    )
    # with initial (itertools semantics: prepended, length n+1)
    assert b.accumulate(operator.add, initial=100).compute() == list(
        itertools.accumulate(xs, operator.add, initial=100)
    )
    # non-commutative but associative binop (string concat)
    ws = list("abcdefg")
    bw = Bag.from_sequence(spark, ws, npartitions=3)
    assert bw.accumulate(operator.add).compute() == list(
        itertools.accumulate(ws, operator.add)
    )


def test_bag_random_sample_deterministic(spark):
    b = Bag.from_sequence(spark, list(range(1000)), npartitions=4)
    s1 = b.random_sample(0.1, random_state=7).compute()
    s2 = b.random_sample(0.1, random_state=7).compute()
    assert s1 == s2
    assert 40 < len(s1) < 200  # ~100 expected
    s3 = b.random_sample(0.1, random_state=8).compute()
    assert s1 != s3


def test_bag_accumulate_release_frees_parent_store(spark):
    import operator

    from pyspark import StorageLevel

    from wukong_spark.bag import Bag

    b = Bag.from_sequence(spark, list(range(50)), npartitions=4)
    acc = b.accumulate(operator.add)
    assert len(acc._cached_deps) == 1
    parent = acc._cached_deps[0]
    assert parent.getStorageLevel() != StorageLevel.NONE
    got = acc.compute()
    acc.release()
    assert acc._cached_deps == []
    assert parent.getStorageLevel() == StorageLevel.NONE
    # results remain valid after release (lineage recompute)
    assert got[-1] == sum(range(50))
    acc.release()  # idempotent

    # caller-persisted parent: accumulate must NOT claim ownership
    b2 = Bag.from_sequence(spark, [1, 2, 3], npartitions=2)
    b2._rdd.persist(StorageLevel.MEMORY_AND_DISK)
    acc2 = b2.accumulate(operator.add)
    assert acc2._cached_deps == []
    b2._rdd.unpersist()
