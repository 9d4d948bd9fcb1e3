"""Tree reduction over 1,024 leaves (reference:
`Static Scheduler/examples/tree_reduction.py:46`, `README.md:180-202`):
pairwise `operator.add` — Spark's treeAggregate IS the reduction tree."""

from __future__ import annotations

import operator


def run(spark) -> bool:
    from wukong_spark.taskgraph import WukongClient

    client = WukongClient(spark)
    leaves = list(range(1024))
    total = client.tree_reduce(leaves, operator.add, 0, depth=2)
    return total == sum(leaves)


if __name__ == "__main__":
    from _common import report, session

    report("tree_reduction", run(session()))
