"""Pandas-UDF surface queries — the sanctioned Python escape hatches
(SURVEY.md §2.2 B-V "UDF surface"), each verified against a pure-SQL oracle.

In the reference EVERYTHING is an opaque Python task
(`/root/reference/AWS Lambda Task Executor/TaskExecutor/function.py:3826-3847`).
In the rebuild, Python appears only at three sanctioned boundaries — scalar
pandas_udf, grouped applyInPandas (= dask groupby.apply,
`wukong/tests/test_collections.py:152-175`), and partition mapInPandas
(= dask map_partitions) — and each one is Arrow-batched.  These queries
prove the boundaries compute exactly what the declarative engine computes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from wukong_spark.queries import query
from wukong_spark.queries.helpers import tbl


def round_half_away(s, digits: int):
    """Round half away from zero — DuckDB ROUND's mode (and what Spark's
    F.round targets; NB Spark rounds the shortest-decimal representation,
    so the two can still differ on a thin set of exact half-boundary
    doubles).  pandas/numpy .round() and Python round() are banker's
    (half-to-even), a systematically different mode; every Python-side
    rounding in this module goes through this helper so Python-side results
    at least share DuckDB's convention."""
    import numpy as np

    scale = 10.0**digits
    arr = np.asarray(s, dtype=float)
    out = np.copysign(np.floor(np.abs(arr) * scale + 0.5), arr) / scale
    return pd.Series(out, index=getattr(s, "index", None))


@query(
    "grouped_apply_zscore",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND((o_totalprice - AVG(o_totalprice) OVER (PARTITION BY o_custkey))
                 / NULLIF(STDDEV_SAMP(o_totalprice) OVER (PARTITION BY o_custkey), 0),
                 4) AS z
    FROM orders
    """,
)
def grouped_apply_zscore(spark: SparkSession, sf_dir: str):
    """dask groupby.apply parity: per-customer z-score of order totals via
    applyInPandas, oracle-checked against the SQL window formulation.

    Scale: one shuffle on the group key; each group is one pandas frame —
    the dask `groupby(...).apply(fn)` execution model exactly.
    """
    o = tbl(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)
        z = (pdf["o_totalprice"] - mu) / sd if sd and sd > 0 else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "z": round_half_away(z, 4),
            }
        )

    return o.groupBy("o_custkey").applyInPandas(
        zscore, "o_custkey long, o_orderkey long, z double"
    )


@query(
    "scalar_pandas_udf_margin",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)
               AS charged_c
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def scalar_pandas_udf_margin(spark: SparkSession, sf_dir: str):
    """Vectorized scalar pandas_udf computing the charge formula —
    numerically identical to the SQL expression (same doubles, same order),
    demonstrating the Arrow scalar-UDF boundary."""

    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    l = tbl(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge("l_extendedprice", "l_discount", "l_tax") * 100)
        .cast("long")
        .alias("charged_c"),
    )


@query(
    "map_in_pandas_filter",
    oracle="""
    SELECT event_id, user_id, ROUND(value * 2, 4) AS doubled
    FROM events WHERE event_type = 'purchase' AND value > 50
    """,
)
def map_in_pandas_filter(spark: SparkSession, sf_dir: str):
    """dask map_partitions parity: partition-wise pandas filter+transform
    via mapInPandas, oracle-checked against the SQL predicate."""
    e = tbl(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hit = pdf[(pdf["event_type"] == "purchase") & (pdf["value"] > 50)]
            yield pd.DataFrame(
                {
                    "event_id": hit["event_id"],
                    "user_id": hit["user_id"],
                    "doubled": round_half_away(hit["value"] * 2, 4),
                }
            )

    return e.mapInPandas(run, "event_id long, user_id long, doubled double")


@query(
    "top_words",
    oracle="""
    WITH words AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents
    )
    SELECT w, COUNT(*) AS n
    FROM words GROUP BY w
    ORDER BY n DESC, w LIMIT 25
    """,
)
def top_words(spark: SparkSession, sf_dir: str):
    """Corpus word frequency top-k (explode → count → TakeOrdered)."""
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(25)
    )


@query(
    "events_dedup_exact",
    oracle="""
    SELECT user_id, event_type, CAST(ROUND(value * 10000) AS BIGINT) AS value_4,
           COUNT(*) AS n_dupes, MIN(event_id) AS first_event
    FROM events
    GROUP BY user_id, event_type, value_4
    HAVING COUNT(*) > 1
    """,
)
def events_dedup_exact(spark: SparkSession, sf_dir: str):
    """Exact duplicate detection on a composite key (the events analogue of
    document dedup: group → count > 1 → keep first)."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id",
            "event_type",
            F.round(F.col("value") * 10000).cast("long").alias("value_4"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_dupes"),
            F.min("event_id").alias("first_event"),
        )
        .filter(F.col("n_dupes") > 1)
    )


@query(
    "grouped_agg_weighted_discount",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                     * CAST(ROUND(l_quantity * 100) AS BIGINT)) * 1.0
                 / SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)), 4)
               AS wavg_disc_pct
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def grouped_agg_weighted_discount(spark: SparkSession, sf_dir: str):
    """Grouped-aggregate pandas_udf (the 4th UDF flavor, alongside scalar /
    grouped-map / partition-map): quantity-weighted average discount.

    The UDF sums in int64 (exact, order-independent) and divides once, so
    the result is bit-identical to the SQL formulation.  Scale shape: a
    pandas GROUPED_AGG cannot partial-aggregate (all group rows gather on
    one executor) — fine for low-cardinality groups like (flag, status);
    for high-cardinality keys prefer the built-in F.sum decomposition.
    """

    @pandas_udf("double")
    def wavg(disc: pd.Series, qty: pd.Series) -> float:
        d = round_half_away(disc * 100, 0).astype("int64")
        q = round_half_away(qty * 100, 0).astype("int64")
        ratio = float((d * q).sum()) / float(q.sum())
        return float(round_half_away(pd.Series([ratio]), 4)[0])

    l = tbl(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        wavg("l_discount", "l_quantity").alias("wavg_disc_pct")
    )


@query(
    "map_in_arrow_value_buckets",
    oracle="""
    SELECT CAST(FLOOR(value / 10) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_4
    FROM events WHERE event_type <> 'error'
    GROUP BY bucket
    """,
)
def map_in_arrow_value_buckets(spark: SparkSession, sf_dir: str):
    """The 5th Python boundary: mapInArrow — zero-copy RecordBatch in/out
    (no pandas conversion at all).  Bucketing is computed in pyarrow
    compute kernels; the aggregation stays JVM-side after the boundary."""
    import pyarrow as pa
    import pyarrow.compute as pc

    e = tbl(spark, sf_dir, "events").filter(F.col("event_type") != "error").select("value")

    def run(batches):
        for batch in batches:
            v = batch.column(0)
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(pc.floor(pc.divide(v, 10.0)), pa.int64()),
                    # half_towards_infinity == half away from zero == the
                    # mode F.round and DuckDB ROUND use (pyarrow defaults
                    # to banker's half_to_even — would diverge on exact .5)
                    pc.cast(
                        pc.round(
                            pc.multiply(v, 10000.0),
                            round_mode="half_towards_infinity",
                        ),
                        pa.int64(),
                    ),
                ],
                ["bucket", "value_4"],
            )

    buckets = e.mapInArrow(run, "bucket long, value_4 long")
    return buckets.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value_4").alias("sum_value_4")
    )
