"""Linear chain of dependent tasks (reference:
`Static Scheduler/examples/linear_dag.py`; pipelined by the reference's DFS
path builder, `scheduler.py:2176-2179` — pipelined natively by Spark stage
fusion here): each task consumes the previous Future."""

from __future__ import annotations


def run(spark) -> bool:
    from wukong_spark.taskgraph import WukongClient

    client = WukongClient(spark)
    x = client.submit(lambda: 1)
    for _ in range(5):
        x = client.submit(lambda v: v * 2, x, pure=False)
    return x.result() == 32


if __name__ == "__main__":
    from _common import report, session

    report("linear_dag", run(session()))
