"""Connected components: union-find oracle on collected edges (sf0.001)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wukong_spark.operators.graph import connected_components
from wukong_spark.session import load_table
from tests.conftest import SF_SMOKE


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_cc_matches_union_find_on_synthetic(spark):
    # two chains + an isolate-pair: distinct components with known minima
    e = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)]
    df = spark.createDataFrame(e, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    want = _uf_components(e)
    # union-find parent-compression yields min-id roots here by construction
    assert got == want


def test_cc_customer_supplier_graph(spark):
    """Bipartite customer↔supplier graph from orders⋈lineitem: the Spark
    result must equal a local union-find on the same edges."""
    o = load_table(spark, SF_SMOKE, "orders")
    l = load_table(spark, SF_SMOKE, "lineitem")
    # disambiguate the two id spaces: suppliers get an offset
    edges = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    want = _uf_components([(r.src, r.dst) for r in edges.collect()])
    assert got == want


def test_cc_raises_without_convergence(spark):
    """A path graph with diameter > max_iter must raise, never return
    partial labels silently."""
    import pytest

    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=3)
    # and with enough rounds it fully converges to component 0
    got = {r.component for r in connected_components(df, max_iter=50).collect()}
    assert got == {0}
