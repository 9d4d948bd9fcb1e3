"""Shared helpers for cross-engine (Spark ↔ DuckDB) exact queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from wukong_spark.session import load_table


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def cents(col: str | Column) -> Column:
    """Money double → integer cents (exact, order-independent summation).

    Floating-point SUM is order-dependent; Spark's partial aggregation and
    DuckDB's scan order differ, so double sums can disagree in the last few
    ulps and poison a value-hash.  Integer summation is associative and
    exact.  DuckDB mirror: CAST(ROUND(x * 100) AS BIGINT).

    Scale note: plain cents sums overflow past ~9e16 dollars, but the
    cents×pct products used for discounted revenue carry ~1e11 per row and
    overflow int64 around ~9e12 summed dollars (≈ sf100) — at true 100 TB
    scale switch those accumulators to DECIMAL(38,0) (Spark sums decimals
    exactly; DuckDB already widens to HUGEINT).  The per-row conversion is
    identical either way.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def pct_units(col: str | Column) -> Column:
    """Rate-like double (discount/tax, 2-decimals) → integer hundredths."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def r4(col: Column) -> Column:
    """Round a derived double to 4 decimals for hash-stable output."""
    return F.round(col, 4)


def split_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Split a scan that arrived under-partitioned (single-row-group file)
    so CPU-heavy map stages (md5/shingle pipelines) parallelize.

    At real scale the scan already has many partitions and this is a no-op
    — the repartition only fires when the input has fewer partitions than
    half the cluster's parallelism, i.e. exactly the tiny-file situation
    where the shuffled bytes are negligible."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
