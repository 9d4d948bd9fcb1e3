"""Single-task submit (reference: `Static Scheduler/examples/single_node.py`):
one function call becomes one cluster task; the Future blocks for its value."""

from __future__ import annotations


def run(spark) -> bool:
    from wukong_spark.taskgraph import WukongClient

    client = WukongClient(spark)
    fut = client.submit(lambda x: x + 1, 41)
    return fut.result() == 42


if __name__ == "__main__":
    from _common import report, session

    report("single_node", run(session()))
