"""Iterative graph algorithm: connected components by min-label propagation.

This is the driver-coordinated-iteration pattern (the category the driver
contract marks non-SQL-expressible): a loop of Spark jobs where each
iteration's output feeds the next.  Reference parity: iterative workloads
are exactly what Wukong's Lambda-reuse machinery exists for
(`/root/reference/AWS Lambda Task Executor/TaskExecutor/function.py:243-382`,
`scheduler.py:2794-2848`); Spark's equivalent is a resident session with
per-iteration persist/unpersist — no executor lifecycle code at all.

Scale discipline per iteration:
- labels are (node, label) pairs — never adjacency materialization;
- each step is join(edges, labels) → min-agg, both shuffling on the SAME
  key, so the exchange is reused;
- each iteration's labels are eagerly localCheckpoint'ed: persist alone
  keeps the full lineage, and an iterated union-of-joins plan grows
  EXPONENTIALLY (the plan audit caught a 2,000-node plan after 5 rounds) —
  checkpointing truncates lineage to the materialized partitions;
- convergence check is a 1-row count of changed labels (cheap action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """(src, dst) edge list → (node, component) with component = min node id
    reachable.  Undirected: edges propagate labels both ways each round.

    Converges in O(graph diameter) rounds (min-label flood fill); each
    round is two shuffles (propagate + min-agg).  Raises RuntimeError if
    max_iter rounds pass without convergence — partial labels are wrong
    labels, never returned silently.
    """
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    both = both.distinct().persist()

    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    # free each superseded checkpoint's cached RDD immediately instead of
    # waiting for driver GC + ContextCleaner
    from wukong_spark.session import release_checkpoint as _release

    converged = False
    for _ in range(max_iter):
        # candidate labels: own label ∪ every neighbor's label
        via_nbr = (
            both.join(labels, both.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(via_nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        _release(labels)
        labels = new_labels
        if changed == 0:
            converged = True
            break

    both.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter"
        )
    return labels


def pagerank_bucketed(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    table: str = "bkt_pagerank_edges",
    buckets: int = 8,
) -> DataFrame:
    """Damped PageRank whose per-iteration edges⋈ranks join needs NO
    exchange on the edge side (VERDICT r10 #2: the bucketed_join_check
    lever applied to iteration).

    The adjacency is written ONCE as (src, dst, d) — out-degree
    pre-joined, so the degree lookup also vanishes from the loop —
    bucketed AND sorted by src.  Every iteration then feeds the bucketed
    scan straight into the sort-merge join: only the (node, rank) side
    (n_nodes rows) and the dst-grouped contribution sum shuffle.  The
    plain variant exchanges the full edge set every iteration because
    localCheckpoint drops partitioning metadata; a bucket layout is
    DURABLE partitioning the planner can see across jobs — the Spark
    analogue of the reference reusing warm Lambdas for iterative jobs
    (`Static Scheduler/wukong/scheduler.py:2794-2848`).

    Assumes every node has out-degree ≥ 1 (true for an undirected edge
    list passed in both directions) — no dangling-mass correction.
    `table` is left in the warehouse: paying the layout once and
    reusing it IS the point; callers that want cleanup drop it.

    100 TB path: per iteration the shuffles carry (node, rank) pairs —
    linear in the node count — while the edge set (the 100 TB part)
    never moves again after the bucketed write.
    """
    from wukong_spark.layout import drop_managed_table

    spark = edges.sparkSession
    # Hadoop-FS cleanup (layout.py): works for file:/hdfs:/s3a: warehouses
    # alike — a previous session's managed-table directory survives DROP
    # TABLE under an in-memory catalog and must be cleared too
    drop_managed_table(spark, table)

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    (
        edges.join(deg, "src")
        .write.mode("overwrite")
        .bucketBy(buckets, "src")
        .sortBy("src")
        .saveAsTable(table)
    )
    adj = spark.table(table)
    # bucket layout satisfies the groupBy clustering: no exchange here
    nodes = adj.select("src").distinct()
    n = nodes.count()
    ranks = nodes.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("r"))
    for _ in range(iters):
        contrib = adj.join(ranks, adj["src"] == ranks["node"]).select(
            F.col("dst").alias("node"), (F.col("r") / F.col("d")).alias("c")
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit((1.0 - damping) / n) + F.lit(damping) * F.sum("c")).alias("r")
        )
    return ranks
