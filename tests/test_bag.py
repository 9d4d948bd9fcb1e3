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
