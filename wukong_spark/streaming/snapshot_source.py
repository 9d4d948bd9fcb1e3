"""Structured Streaming source for the snapshot table's change feed
(r17) — the Spark-native way to FOLLOW a `tableformat.SnapshotStateTable`
incrementally, built on Spark 4's Python Data Source API
(`pyspark.sql.datasource`).

    from wukong_spark.streaming.snapshot_source import register
    register(spark)
    feed = (spark.readStream.format("snapshot_changes")
            .option("path", table_dir).load())
    # feed rows = the table's raw delta rows, each tagged __commit

Offset design — the part that makes this exactly-once for free: the
table's MANIFEST VERSIONS are the offsets.  A micro-batch covers
versions (start, end]; its input files are each covered commit's
manifest-diff (exactly `read_changes`' file algebra), and since data
files and manifests are immutable, any batch is bit-replayable after a
crash until `vacuum` drops its versions (the same CDF-retention contract
the batch feed documents).  Compaction / rebucket commits are
``data_unchanged`` and contribute no partitions — bytes moved, no rows
changed.

Scale shape: `partitions()` is a driver-side manifest scan (O(files
appended), no data IO); each appended file becomes ONE input partition
read executor-side via pyarrow, so a commit's rows stream in parallel
and nothing ever rescans the table.  Schema is pinned at stream start
from the head manifest; files written before a schema widening surface
the newer columns as NULL (the same per-version resolution `read`
applies).

Local-filesystem storage backends only: executors open the data files
directly by path.  An object-store deployment would give executors the
store's native scheme (s3a://...) through the same manifest paths —
the `spark_path` indirection is already in place.

Reference analogue: subscribing to published-dataset updates
(`client.py:2213-2340` publish/persist surface); here the subscription
is a first-class streaming DataFrame.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "snapshot_changes"


def _manifest_dir_entries(path: str) -> list[int]:
    mdir = os.path.join(path, "manifests")
    out = []
    if os.path.isdir(mdir):
        for e in os.listdir(mdir):
            if e.startswith("v") and e.endswith(".json") and not e.startswith(".tmp"):
                try:
                    out.append(int(e[1:-5]))
                except ValueError:
                    continue
    return sorted(out)


def _load_manifest(path: str, v: int) -> dict:
    with open(os.path.join(path, "manifests", f"v{v:09d}.json")) as f:
        return json.load(f)


def _head_schema(path: str) -> StructType:
    vs = _manifest_dir_entries(path)
    for v in reversed(vs):
        raw = _load_manifest(path, v).get("schema")
        if raw:
            return StructType.fromJson(json.loads(raw))
    raise ValueError(f"no committed schema under {path!r} (empty table?)")


class _FilePartition(InputPartition):
    def __init__(self, abs_path: str, version: int):
        self.abs_path = abs_path
        self.version = version


def _read_file_rows(part: _FilePartition, schema: StructType) -> Iterator[tuple]:
    """Executor-side: one appended parquet file → tuples in schema order.
    Columns the file predates (schema evolution) yield None."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(part.abs_path)
    present = set(tbl.column_names)
    cols = []
    n = tbl.num_rows
    for f in schema.fields:
        if f.name in present:
            cols.append(tbl.column(f.name).to_pylist())
        else:
            cols.append([None] * n)
    return zip(*cols) if n else iter(())


class SnapshotChangesStreamReader(DataSourceStreamReader):
    """Versions-as-offsets stream reader over a snapshot table dir."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snapshot_changes requires .option('path', table_dir)")
        self.schema_ = schema
        start = options.get("start_version", "earliest")
        # start offset is EXCLUSIVE; 'earliest' covers v0's initial files
        self.start_v = -1 if start == "earliest" else int(start)

    def initialOffset(self) -> dict:
        return {"version": self.start_v}

    def latestOffset(self) -> dict:
        vs = _manifest_dir_entries(self.path)
        return {"version": vs[-1] if vs else self.start_v}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        a, b = int(start["version"]), int(end["version"])
        if b <= a:
            return []
        vs = set(_manifest_dir_entries(self.path))
        missing = [v for v in range(max(a, 0), b + 1) if v not in vs]
        if missing:
            raise ValueError(
                f"versions {missing} were vacuumed — the change stream "
                "needs every manifest in its unprocessed range (CDF "
                "retention window)"
            )
        parts: list[InputPartition] = []
        for v in sorted(vs):
            if not a < v <= b:
                continue
            m = _load_manifest(self.path, v)
            if m.get("data_unchanged") or m.get("note") in ("compact", "rebucket"):
                continue
            prev: set[str] = set()
            if v - 1 in vs:
                prev = {
                    r
                    for fl in _load_manifest(self.path, v - 1)["files"].values()
                    for r in fl
                }
            for fl in m["files"].values():
                for r in fl:
                    if r not in prev:
                        parts.append(
                            _FilePartition(
                                os.path.join(self.path, "data", r), v
                            )
                        )
        return parts

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        return _read_file_rows(partition, self.schema_)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable manifests; nothing to acknowledge


class SnapshotRawReader(DataSourceReader):
    """Batch companion: the RAW delta rows of one snapshot (default
    head), each tagged __commit — the un-reduced file set a debugger or
    downstream re-sharder wants.  The COMBINED state (sum/argmax,
    tombstone filtering) is `SnapshotStateTable.read`'s job — a data
    source emits rows, it doesn't aggregate."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snapshot_table requires .option('path', table_dir)")
        self.schema_ = schema
        self.version = options.get("version")

    def partitions(self) -> Sequence[InputPartition]:
        vs = _manifest_dir_entries(self.path)
        if not vs:
            return []
        v = vs[-1] if self.version is None else int(self.version)
        m = _load_manifest(self.path, v)
        return [
            _FilePartition(os.path.join(self.path, "data", r), v)
            for fl in m["files"].values()
            for r in fl
        ]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        return _read_file_rows(partition, self.schema_)


class SnapshotChangeFeedDataSource(DataSource):
    """format('snapshot_changes'): streaming change feed AND batch raw
    scan of a `SnapshotStateTable` directory."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("snapshot_changes requires .option('path', table_dir)")
        return _head_schema(path)

    def streamReader(self, schema: StructType) -> SnapshotChangesStreamReader:
        return SnapshotChangesStreamReader(schema, dict(self.options))

    def reader(self, schema: StructType) -> SnapshotRawReader:
        return SnapshotRawReader(schema, dict(self.options))


def register(spark) -> None:
    """Idempotently register the data source with this session."""
    spark.dataSource.register(SnapshotChangeFeedDataSource)
