"""Relational operator surface (SURVEY.md §2.2 B-III).

The reference executes the full dask.dataframe surface as opaque task graphs
(`Static Scheduler/wukong/scheduler.py:444-448` — run_spec opaque;
`wukong/tests/test_collections.py:40-175` — the tested ops: select, assign,
range filter, groupby-agg, groupby-apply, drop_duplicates, cumsum, rolling,
set_index/sort, joins via dd.merge).  Here every one of those ops is a
Catalyst-visible DataFrame expression so pushdown/pruning/codegen apply —
the single most important design rule from SURVEY.md §4.

Scale notes apply per query in docstrings; common ones:
- dimension joins (region/nation/supplier/part) broadcast — no shuffle of the
  fact table for them;
- fact-fact joins (orders ⋈ lineitem) shuffle on the join key once, and AQE
  handles skew;
- aggregations are partial+final (map-side combine) automatically because
  they are expressed as built-in aggregates, never UDFs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wukong_spark.queries import query
from wukong_spark.queries.helpers import cents, pct_units, r4, tbl


# ---------------------------------------------------------------------------
# TPC-H-style aggregation queries
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_u,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                    * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS BIGINT) AS sum_charge_u,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str):
    """TPC-H Q1 pricing summary: scan→filter→hash-agg, fully codegen'd.

    Scale: one shuffle (final agg over ≤6 groups); partials combine map-side.
    Money sums in integer cents/micros for cross-engine exactness.
    """
    l = tbl(spark, sf_dir, "lineitem")
    pc, dc, tc = cents("l_extendedprice"), pct_units("l_discount"), pct_units("l_tax")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents("l_quantity")).alias("sum_qty_c"),
            F.sum(pc).alias("sum_base_price_c"),
            F.sum(pc * (100 - dc)).alias("sum_disc_price_u"),
            F.sum(pc * (100 - dc) * (100 + tc)).alias("sum_charge_u"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_u DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str):
    """TPC-H Q3: 3-way join + agg + deterministic top-k.

    Scale: customer is the small side → broadcast into orders; orders⋈lineitem
    shuffles once on orderkey; top-10 is a TakeOrderedAndProject (no full
    sort materialization).
    """
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    l = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    pc, dc = cents("l_extendedprice"), pct_units("l_discount")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(pc * (100 - dc)).alias("revenue_u"))
        .select("l_orderkey", "revenue_u", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_u"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    headline=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str):
    """TPC-H Q5: 6-way join (fact chain + 3 broadcast dims) + agg.

    Scale: region/nation/supplier/customer broadcast (dims); the only
    shuffle is orders⋈lineitem on orderkey + the tiny final agg.
    """
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    pc, dc = cents("l_extendedprice"), pct_units("l_discount")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(pc * (100 - dc)).alias("revenue_u"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_u,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    headline=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str):
    """TPC-H Q6: pure scan-filter-agg; every predicate pushes to parquet."""
    l = tbl(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents("l_extendedprice") * pct_units("l_discount")).alias("revenue_u"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_u,
           CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, acctbal_c, n.n_name
    ORDER BY revenue_u DESC, c_custkey
    LIMIT 20
    """,
    headline=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str):
    """TPC-H Q10: returned-item revenue per customer, deterministic top-20."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = tbl(spark, sf_dir, "nation")
    pc, dc = cents("l_extendedprice"), pct_units("l_discount")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            cents("c_acctbal").alias("acctbal_c"),
            "n_name",
        )
        .agg(F.sum(pc * (100 - dc)).alias("revenue_u"))
        .select("c_custkey", "c_name", "revenue_u", "acctbal_c", "n_name")
        .orderBy(F.desc("revenue_u"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Core operator family: agg stats, distinct, conditional agg, scalar exprs
# ---------------------------------------------------------------------------

@query(
    "agg_stats_lineitem",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    """,
)
def agg_stats_lineitem(spark: SparkSession, sf_dir: str):
    """Global statistics: count/sum/min/max/avg/stddev/count-distinct
    (dask surface: df.mean/std/count — test_collections.py:57-58,63)."""
    l = tbl(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("l_quantity")).alias("sum_qty_c"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
        r4(F.stddev_samp("l_extendedprice")).alias("sd_price"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


@query(
    "groupby_count",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_count(spark: SparkSession, sf_dir: str):
    """groupby(['x','y']).count() (test_collections.py:63)."""
    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "distinct_part_attrs",
    oracle="SELECT DISTINCT p_brand, p_type FROM part",
)
def distinct_part_attrs(spark: SparkSession, sf_dir: str):
    """drop_duplicates (test_collections.py:59) → shuffle-dedup on the key."""
    return tbl(spark, sf_dir, "part").select("p_brand", "p_type").dropDuplicates()


@query(
    "filter_range_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-02-01'
    """,
)
def filter_range_projection(spark: SparkSession, sf_dir: str):
    """Range filter + projection (df.loc[a:b] — test_collections.py:64,132).

    Scale: filter and 3-column projection both reach the parquet scan
    (PushedFilters + pruned ReadSchema) — no full-row materialization.
    """
    return (
        tbl(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-02-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            cents("l_extendedprice").alias("price_c"),
        )
    )


@query(
    "conditional_agg_case",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN o_totalprice > 200000
                         THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS big_total_c
    FROM orders GROUP BY o_orderstatus
    """,
)
def conditional_agg_case(spark: SparkSession, sf_dir: str):
    """CASE WHEN conditional aggregation (constant-folded by Catalyst)."""
    o = tbl(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 200000
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(big, 1).otherwise(0)).cast("long").alias("n_big"),
        F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("n_urgent"),
        F.sum(F.when(big, cents("o_totalprice")).otherwise(F.lit(0))).alias("big_total_c"),
    )


@query(
    "string_funcs_part",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_u,
           SUBSTRING(p_type, 1, 5) AS type5,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           CAST(ROUND(p_retailprice * p_size * 100) AS BIGINT) AS shelf_value_c
    FROM part WHERE p_size >= 25
    """,
)
def string_funcs_part(spark: SparkSession, sf_dir: str):
    """Scalar string/arithmetic function surface, all JVM built-ins."""
    p = tbl(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * F.col("p_size") * 100).cast("long").alias("shelf_value_c"),
    )


@query(
    "date_funcs_orders",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
    FROM orders GROUP BY y, m
    """,
)
def date_funcs_orders(spark: SparkSession, sf_dir: str):
    """Date-part extraction + monthly rollup."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("o_totalprice")).alias("total_c"),
        )
    )


# ---------------------------------------------------------------------------
# Join family (SURVEY.md §2.2 B-III "joins" row)
# ---------------------------------------------------------------------------

@query(
    "join_inner_enrich",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, c.c_name, c.c_mktsegment, n.n_name
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderkey <= 500
    """,
)
def join_inner_enrich(spark: SparkSession, sf_dir: str):
    """Inner join enrichment, dims broadcast (no fact shuffle)."""
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("o_orderkey", "o_orderstatus", "c_name", "c_mktsegment", "n_name")
    )


@query(
    "join_left_outer_counts",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer_counts(spark: SparkSession, sf_dir: str):
    """Left outer join preserving customers with zero orders."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi_active_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str):
    """Left-semi join (EXISTS): customers with a big order."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_inactive_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str):
    """Left-anti join (NOT EXISTS): customers with no orders."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_range_nonequi",
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_peers
    FROM supplier s JOIN customer c
      ON c.c_nationkey = s.s_nationkey
     AND c.c_acctbal > s.s_acctbal
    GROUP BY s.s_suppkey
    """,
)
def join_range_nonequi(spark: SparkSession, sf_dir: str):
    """Non-equi (range) join: equi key + inequality residual.

    Scale: the equi conjunct (nationkey) is the hash key so this stays a
    hash join with a residual filter — not a cartesian product.
    """
    s = tbl(spark, sf_dir, "supplier")
    c = tbl(spark, sf_dir, "customer")
    return (
        s.join(c, (c.c_nationkey == s.s_nationkey) & (c.c_acctbal > s.s_acctbal))
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_peers"))
    )


# ---------------------------------------------------------------------------
# Set operations (dask dd.concat surface)
# ---------------------------------------------------------------------------

@query(
    "setop_union_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_nations(spark: SparkSession, sf_dir: str):
    """UNION (dedup) of customer and supplier nation keys."""
    c = tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str):
    """INTERSECT: nations with both customers and suppliers."""
    c = tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_except_nations(spark: SparkSession, sf_dir: str):
    """EXCEPT (distinct semantics): nations with customers but no suppliers."""
    c = tbl(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = tbl(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# ---------------------------------------------------------------------------
# Window / analytic operators (cumsum, rolling, rank — B-III)
# ---------------------------------------------------------------------------

@query(
    "window_cumsum_orders",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS running_total_c
    FROM orders
    """,
    headline=True,
)
def window_cumsum_orders(spark: SparkSession, sf_dir: str):
    """cumsum (test_collections.py:62) as a window running total.

    Scale: one shuffle on the partition key; integer cents make the running
    sum order-exact. Explicit unique-key ordering (orderdate, orderkey).
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tbl(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.sum(cents("o_totalprice")).over(w).alias("running_total_c"),
        )
    )


@query(
    "window_rank_top_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_c,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_rank_top_orders(spark: SparkSession, sf_dir: str):
    """Top-N per group via row_number with unique tie-break."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        tbl(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            cents("o_totalprice").alias("totalprice_c"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_order_gap",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
)
def window_lag_order_gap(spark: SparkSession, sf_dir: str):
    """lag(): days since the customer's previous order (NULL for first)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return tbl(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# Sort / top-k
# ---------------------------------------------------------------------------

@query(
    "orderby_topk_parts",
    oracle="""
    SELECT p_partkey, p_name, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c
    FROM part ORDER BY price_c DESC, p_partkey LIMIT 15
    """,
)
def orderby_topk_parts(spark: SparkSession, sf_dir: str):
    """Global sort + limit → TakeOrderedAndProject (no full sort at scale)."""
    return (
        tbl(spark, sf_dir, "part")
        .select("p_partkey", "p_name", cents("p_retailprice").alias("price_c"))
        .orderBy(F.desc("price_c"), "p_partkey")
        .limit(15)
    )
