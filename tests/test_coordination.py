"""A30 coordination primitives (SURVEY.md §2.1) — semantics mirrored from
the reference's dask.distributed-inherited Variable/Queue/Lock/PubSub/Actor
(`Static Scheduler/wukong/{variable,queues,lock,pubsub,actor}.py`)."""

import threading
import time

import pytest

from wukong_spark.coordination import (
    ActorHandle,
    Lock,
    Pub,
    Queue,
    Sub,
    Variable,
    actor,
)


def test_variable_set_get_shared_name():
    v1 = Variable("shared-x")
    v2 = Variable("shared-x")
    v1.set(41)
    assert v2.get() == 41
    v2.set(42)
    assert v1.get(timeout=1) == 42
    v1.delete()


def test_variable_get_blocks_until_set():
    v = Variable()
    got = []

    def reader():
        got.append(v.get(timeout=5))

    t = threading.Thread(target=reader)
    t.start()
    time.sleep(0.05)
    v.set("ready")
    t.join(timeout=5)
    assert got == ["ready"]
    v.delete()


def test_variable_timeout():
    v = Variable()
    with pytest.raises(TimeoutError):
        v.get(timeout=0.05)
    v.delete()


def test_variable_holds_future(spark):
    from wukong_spark.taskgraph import WukongClient

    client = WukongClient(spark)
    v = Variable("fut-var")
    fut = client.submit(lambda: 7)
    v.set(fut)
    assert v.get().result() == 7
    v.delete()


def test_queue_fifo_and_qsize():
    q = Queue()
    for i in range(5):
        q.put(i)
    assert q.qsize() == 5
    assert [q.get() for _ in range(5)] == [0, 1, 2, 3, 4]


def test_queue_shared_name_and_batch():
    qa, qb = Queue("shared-q"), Queue("shared-q")
    qa.put("a")
    qa.put("b")
    qa.put("c")
    assert qb.get(batch=2) == ["a", "b"]
    assert qb.get(batch=True) == ["c"]


def test_queue_timeout_and_maxsize():
    q = Queue(maxsize=1)
    q.put(1)
    with pytest.raises(TimeoutError):
        q.put(2, timeout=0.05)
    assert q.get() == 1
    with pytest.raises(TimeoutError):
        q.get(timeout=0.05)


def test_queue_delete_resets_state():
    q = Queue("del-q")
    q.put(1)
    q.delete()
    q2 = Queue("del-q")  # re-creating the name starts empty
    assert q2.qsize() == 0


def test_queue_cross_thread_handoff():
    q = Queue("handoff")
    out = []

    def consumer():
        out.append(q.get(timeout=5))

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    Queue("handoff").put("payload")
    t.join(timeout=5)
    assert out == ["payload"]


def test_lock_mutual_exclusion():
    lock = Lock("mutex-test")
    counter = {"v": 0}

    def worker():
        for _ in range(200):
            with Lock("mutex-test"):
                cur = counter["v"]
                counter["v"] = cur + 1

    ts = [threading.Thread(target=worker) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert counter["v"] == 800
    assert not lock.locked()


def test_lock_nonblocking_and_timeout():
    lock = Lock()
    assert lock.acquire()
    other = Lock(lock.name)
    assert other.acquire(blocking=False) is False
    assert other.acquire(timeout=0.05) is False
    lock.release()
    assert other.acquire(blocking=False)
    other.release()


def test_pubsub_fanout_and_late_subscriber():
    pub = Pub("chan")
    early = Sub("chan")
    pub.put(1)
    late = Sub("chan")  # subscribed after message 1 → must not see it
    pub.put(2)
    assert early.get(timeout=1) == 1
    assert early.get(timeout=1) == 2
    assert late.get(timeout=1) == 2
    with pytest.raises(TimeoutError):
        late.get(timeout=0.05)
    early.unsubscribe()
    pub.put(3)
    assert late.get(timeout=1) == 3
    late.unsubscribe()


def test_actor_serializes_state_mutations():
    class Counter:
        def __init__(self):
            self.n = 0

        def increment(self):
            cur = self.n
            time.sleep(0.001)  # widen the race window
            self.n = cur + 1
            return self.n

    handle = ActorHandle(Counter)
    futs = [handle.increment() for _ in range(50)]
    results = sorted(f.result(timeout=10) for f in futs)
    assert results == list(range(1, 51))  # strictly sequential — no lost updates
    assert handle.n == 50
    handle.stop()


def test_actor_error_propagates_and_decorator():
    @actor
    class Div:
        def div(self, a, b):
            return a / b

    h = Div()
    assert h.div(8, 2).result(timeout=5) == 4
    with pytest.raises(ZeroDivisionError):
        h.div(1, 0).result(timeout=5)
    # repeated result() returns the same outcome
    f = h.div(9, 3)
    assert f.result(timeout=5) == 3
    assert f.result(timeout=5) == 3
    h.stop()


def test_coordination_fenced_inside_tasks(spark):
    """VERDICT r16 #6: task-side access to driver-local named state must
    fail with an explicit error (not hang on a fresh empty registry),
    and the documented alternative — a broadcast snapshot — must work."""
    import pytest

    from wukong_spark.coordination import Variable

    v = Variable("fence-probe")
    v.set(41)

    def probe(_):
        try:
            Variable("fence-probe").get(timeout=1)
            return "no-error"
        except RuntimeError as e:
            return "fenced" if "driver-local" in str(e) else f"wrong: {e}"

    got = spark.sparkContext.parallelize([1], 1).map(probe).collect()
    assert got == ["fenced"]

    # the supported task-side read path: point-in-time broadcast snapshot
    bc = v.snapshot_broadcast(spark)
    got = (
        spark.sparkContext.parallelize([1, 2], 2)
        .map(lambda x: x + bc.value)
        .collect()
    )
    assert sorted(got) == [42, 43]
    # a later set does not mutate the live broadcast: re-snapshot per job
    v.set(100)
    assert bc.value == 41
    assert v.snapshot_broadcast(spark).value == 100
    v.delete()


# ---------------------------------------------------------------------------
# Executor-visible coordination channel (VERDICT r16 #6 option (a)):
# the driver-hosted request server + picklable task-side client.
# ---------------------------------------------------------------------------


def test_channel_task_reads_and_writes_variable(spark):
    from wukong_spark.coordination import Variable, coordination_client

    v = Variable("chan-var")
    v.set(7)
    client = coordination_client(spark)

    def read(_):
        return client.variable_get("chan-var", timeout=10)

    assert spark.sparkContext.parallelize([1], 1).map(read).collect() == [7]

    # write FROM a task, observe on the driver — the half snapshot_broadcast
    # cannot do
    def write(x):
        client.variable_set("chan-var", x * 6)
        return x

    spark.sparkContext.parallelize([7], 1).map(write).collect()
    assert v.get(timeout=10) == 42
    v.delete()


def test_channel_queue_producer_tasks(spark):
    from wukong_spark.coordination import Queue, coordination_client

    client = coordination_client(spark)
    q = Queue("chan-q")

    def produce(pid, it):
        n = sum(1 for _ in it)
        client.queue_put("chan-q", (pid, n), timeout=30)
        return iter([n])

    spark.sparkContext.parallelize(range(40), 4).mapPartitionsWithIndex(
        produce
    ).collect()
    got = sorted(q.get(timeout=10, batch=4))
    assert got == [(0, 10), (1, 10), (2, 10), (3, 10)]
    assert q.qsize() == 0
    q.delete()


def test_channel_lock_serializes_read_modify_write(spark):
    """N concurrent tasks each do an unprotected-unless-locked
    read-modify-write on a shared Variable; the channel Lock must
    serialize them (final value == N) across task/process boundaries."""
    from wukong_spark.coordination import Variable, coordination_client

    v = Variable("chan-counter")
    v.set(0)
    client = coordination_client(spark)

    def bump(_):
        assert client.lock_acquire("chan-lock", timeout=60)
        try:
            cur = client.variable_get("chan-counter", timeout=10)
            time.sleep(0.02)  # widen the race window sans lock
            client.variable_set("chan-counter", cur + 1)
        finally:
            client.lock_release("chan-lock")
        return 1

    n = 16
    spark.sparkContext.parallelize(range(n), n).map(bump).collect()
    assert v.get(timeout=10) == n
    v.delete()


def test_channel_errors_and_auth():
    from wukong_spark.coordination import CoordinationClient, CoordinationServer

    srv = CoordinationServer().start()
    try:
        client = srv.client()
        # semantic timeout from the server, as the matching exception type
        with pytest.raises(TimeoutError):
            client.variable_get("chan-never-set", timeout=0.2)
        # unknown op propagates the server-side exception
        with pytest.raises(ValueError, match="unknown coordination op"):
            client._call({"op": "nope"}, 5.0)
        # wrong token: server drops the connection without unpickling
        bad = CoordinationClient("127.0.0.1", srv.port, b"x" * 16)
        with pytest.raises((ConnectionError, OSError)):
            bad.variable_get("chan-never-set", timeout=0.2)
    finally:
        srv.stop()
