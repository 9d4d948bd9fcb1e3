"""The snapshot table's change feed as a first-class Structured
Streaming source (r17, `streaming/snapshot_source.py`): manifest
versions are the offsets, each appended file is one input partition,
compaction/rebucket commits contribute nothing, checkpoints resume from
the exact version boundary, and a vacuumed unprocessed range fails loud
(the CDF retention contract)."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from wukong_spark.streaming import run_to_memory
from wukong_spark.streaming.snapshot_source import register
from wukong_spark.tableformat import SnapshotStateTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, n long")


@pytest.fixture()
def work():
    d = tempfile.mkdtemp(prefix=f"cdfsrc_{uuid.uuid4().hex[:6]}-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_feed_covers_commits_and_skips_compaction(spark, work):
    t = SnapshotStateTable(spark, f"{work}/t", "k", n_buckets=2)
    t.merge(_mk(spark, [(1, 10), (2, 20)]))   # v0
    t.merge(_mk(spark, [(1, 5)]))             # v1
    t.compact()                               # v2: data_unchanged → no rows
    t.merge(_mk(spark, [(3, 30)]))            # v3
    register(spark)
    stream = (
        spark.readStream.format("snapshot_changes")
        .option("path", f"{work}/t").load()
    )
    out = run_to_memory(stream, f"cdf_{uuid.uuid4().hex[:6]}", complete=False)
    rows = sorted((r["k"], r["n"], r["__commit"]) for r in out.collect())
    assert rows == [(1, 5, 1), (1, 10, 0), (2, 20, 0), (3, 30, 3)]
    # start_version is exclusive: only commits AFTER v1
    tail = run_to_memory(
        spark.readStream.format("snapshot_changes")
        .option("path", f"{work}/t").option("start_version", "1").load(),
        f"cdf_{uuid.uuid4().hex[:6]}", complete=False,
    )
    assert sorted((r["k"], r["__commit"]) for r in tail.collect()) == [(3, 3)]


def test_checkpoint_resumes_from_version_boundary(spark, work):
    """Two availableNow passes over one checkpoint: the second batch
    carries ONLY the commits that landed in between — versions are the
    offsets, so resume is exact with no reprocessing."""
    t = SnapshotStateTable(spark, f"{work}/t", "k", n_buckets=2)
    t.merge(_mk(spark, [(1, 1), (2, 2)]))     # v0
    register(spark)
    seen: list[tuple] = []
    batches: list[int] = []

    def drain():
        q = (
            spark.readStream.format("snapshot_changes")
            .option("path", f"{work}/t").load()
            .writeStream.foreachBatch(
                lambda df, eid: (
                    seen.extend(
                        (r["k"], r["__commit"]) for r in df.collect()
                    ),
                    batches.append(eid),
                )
            )
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = sorted(seen)
    assert first == [(1, 0), (2, 0)]
    t.merge(_mk(spark, [(3, 3)]))             # v1 lands after pass 1
    seen.clear()
    drain()
    assert sorted(seen) == [(3, 1)], "resume must carry only v1's rows"


def test_schema_evolution_nulls_in_feed_and_batch_reader(spark, work):
    t = SnapshotStateTable(
        spark, f"{work}/t", "k", n_buckets=2, mode="latest", order_col="ts"
    )
    t.merge(spark.createDataFrame([(1, 1, "a")], "k long, ts long, v string"))
    t.merge(
        spark.createDataFrame(
            [(2, 2, "b", 9)], "k long, ts long, v string, w long"
        ),
        schema_evolution=True,
    )
    register(spark)
    out = run_to_memory(
        spark.readStream.format("snapshot_changes")
        .option("path", f"{work}/t").load(),
        f"cdf_{uuid.uuid4().hex[:6]}", complete=False,
    )
    got = {r["k"]: r["w"] for r in out.collect()}
    assert got == {1: None, 2: 9}  # pre-widening file reads NULL
    # batch raw scan: head files, __commit tagged, same null fill
    raw = (
        spark.read.format("snapshot_changes")
        .option("path", f"{work}/t").load()
    )
    assert {(r["k"], r["__commit"], r["w"]) for r in raw.collect()} == {
        (1, 0, None), (2, 1, 9),
    }


def test_vacuumed_unprocessed_range_fails_loud(spark, work):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    t = SnapshotStateTable(spark, f"{work}/t", "k", n_buckets=2)
    t.merge(_mk(spark, [(1, 1)]))             # v0
    t.merge(_mk(spark, [(2, 2)]))             # v1
    t.vacuum(keep_versions=1, stage_retention_s=0.0)   # drops v0
    register(spark)
    with pytest.raises(StreamingQueryException, match="vacuum"):
        run_to_memory(
            spark.readStream.format("snapshot_changes")
            .option("path", f"{work}/t").load(),
            f"cdf_{uuid.uuid4().hex[:6]}", complete=False,
        )
