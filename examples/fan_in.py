"""Fan-in (reference: `Static Scheduler/examples/fan_in.py`,
`README.md:170-176`): two independent parents computed in parallel, joined
by a child task taking both Futures."""

from __future__ import annotations


def run(spark) -> bool:
    from wukong_spark.taskgraph import WukongClient

    client = WukongClient(spark)
    a = client.submit(lambda: 10)
    b = client.submit(lambda: 32)
    total = client.submit(lambda x, y: x + y, a, b)
    return total.result() == 42


if __name__ == "__main__":
    from _common import report, session

    report("fan_in", run(session()))
