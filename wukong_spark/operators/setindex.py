"""set_index-style range repartitioning (VERDICT r5 missing #2).

Reference parity: `dd.DataFrame.set_index('name', shuffle='tasks')`
(`Static Scheduler/wukong/tests/test_collections.py:113-129`) — dask's
task-shuffle set_index samples the key's quantiles, range-partitions rows
into those quantile buckets, and sorts each partition, leaving the frame
globally ordered by the new index with known per-partition key bounds.

Spark-first mapping: `repartitionByRange(n, col)` IS that algorithm
(reservoir-sample the key → compute n-quantile range bounds → one range
exchange), and `sortWithinPartitions(col)` completes the global order.
Catalyst tracks the resulting RangePartitioning(col) as the output
partitioning + ordering, so downstream per-key windows, merge joins, and
range lookups on the index column reuse it without another exchange —
exactly why dask users call set_index before repeated key-wise work.

At 100 TB: the range exchange is one full shuffle (unavoidable for a
global order); the sampling step is O(partitions) driver traffic only.
Skewed index values land entire identical-key runs in one partition —
acceptable for an index (dask shares the behavior); AQE's skew handling
does not split range partitions, so pick a higher `n` for heavy-tailed
keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def set_index(df: DataFrame, col: str, n_partitions: int) -> DataFrame:
    """Globally order `df` by `col` into `n_partitions` range partitions.

    Postconditions (the dask set_index contract):
    - every partition holds a contiguous, disjoint key range of `col`;
      partition i's max ≤ partition i+1's min (ties never straddle);
    - rows are sorted by `col` within each partition, so the frame is
      globally sorted by `col` in partition order;
    - no rows added or dropped.
    """
    return df.repartitionByRange(n_partitions, col).sortWithinPartitions(col)


def global_row_number(
    df: DataFrame,
    order_col: str,
    n_partitions: int = 32,
    out_col: str = "row_id",
) -> DataFrame:
    """Contiguous 0-based global row numbers in `order_col` order WITHOUT
    a single-partition sort (r11) — the scalable zipWithIndex / dask
    `assign(index=...)` shape every training pipeline runs to give
    examples stable ids.

    The naive `row_number().over(Window.orderBy(col))` plans an Exchange
    SinglePartition — one task sorts the entire table, the canonical
    100 TB scale killer.  This operator instead:

    1. range-partitions + locally sorts on `order_col` (the set_index
       machinery: one range exchange, sampling is O(partitions) driver
       traffic);
    2. counts rows per partition (one tiny job — n_partitions longs to
       the driver);
    3. broadcasts the exclusive prefix offsets and adds
       offset[pid] + local position, map-side via mapInPandas.

    The result is deterministic whenever `order_col` is unique (ties
    within a key are partition-local order — pass a tie-break column
    composed into `order_col` if ties exist).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    s = set_index(df, order_col, n_partitions).withColumn(
        "__pid", F.spark_partition_id()
    )
    s = s.localCheckpoint(eager=True)  # pin the partitioning: both the
    # count job and the numbering pass must see the SAME layout
    counts = {
        r["__pid"]: r["n"]
        for r in s.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = df.sparkSession.sparkContext.broadcast(offsets)

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def number(batches):
        offs = bc.value
        pos = None
        for pdf in batches:
            if not len(pdf):
                continue
            if pos is None:
                pos = offs[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns=["__pid"])
            pdf[out_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    return s.mapInPandas(number, f"{out_fields}, {out_col} long")
