"""Worker-visible coordination, ported from the reference's worker-side
patterns (`wukong/variable.py`, `queues.py`, `lock.py` are scheduler
extensions a function running in a Lambda can call): the Spark rebuild
hosts the named state on the DRIVER and task code reaches it through the
token-authenticated coordination channel
(`wukong_spark.coordination.coordination_client` — MIGRATING.md §8).

Three ported idioms, end to end:

1. live config read — driver sets a `Variable`, already-running tasks
   read the CURRENT value (what `snapshot_broadcast` cannot do);
2. worker→driver progress feed — each task `put`s its partition stats
   into a named `Queue`, the driver drains it after `collect()`;
3. cross-task critical section — a channel `Lock` serializes a
   read-modify-write on shared state across concurrently running tasks.
"""

from __future__ import annotations


def run(spark) -> bool:
    from wukong_spark.coordination import Queue, Variable, coordination_client

    client = coordination_client(spark)
    sc = spark.sparkContext

    # 1. live config: tasks see the value the driver set at launch time
    Variable("ex-threshold").set(25)

    def over_threshold(pid, it):
        limit = client.variable_get("ex-threshold", timeout=30)
        vals = [x for x in it if x > limit]
        # 2. progress feed: one control-plane message per partition
        client.queue_put("ex-progress", (pid, len(vals)), timeout=30)
        return iter(vals)

    kept = sc.parallelize(range(40), 4).mapPartitionsWithIndex(over_threshold).collect()
    if sorted(kept) != list(range(26, 40)):
        return False
    progress = sorted(Queue("ex-progress").get(timeout=10, batch=4))
    if progress != [(0, 0), (1, 0), (2, 4), (3, 10)]:
        return False

    # 3. critical section: without the lock these read-modify-writes race;
    # with it the final counter is exact
    Variable("ex-counter").set(0)

    def bump(_):
        assert client.lock_acquire("ex-lock", timeout=60)
        try:
            cur = client.variable_get("ex-counter", timeout=10)
            client.variable_set("ex-counter", cur + 1)
        finally:
            client.lock_release("ex-lock")
        return 1

    n = 8
    sc.parallelize(range(n), n).map(bump).collect()
    ok = Variable("ex-counter").get(timeout=10) == n

    Variable("ex-threshold").delete()
    Variable("ex-counter").delete()
    Queue("ex-progress").delete()
    return ok


if __name__ == "__main__":
    from _common import report, session

    report("coordination_channel", run(session()))
