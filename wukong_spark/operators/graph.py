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
