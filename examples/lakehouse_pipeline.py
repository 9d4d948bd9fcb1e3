"""Lakehouse tour on the manifest-based snapshot table format (r16) —
what a CDC/ingest pipeline does with a versioned table, end to end, on
plain parquet (`wukong_spark/tableformat.py`):

1. commit a base snapshot, stream updates/deletes in as MERGE-on-read
   commits (each atomic: an O_EXCL manifest is THE commit point);
2. read the head, time-travel to any earlier snapshot, and point-look-up
   keys through bucket-pruned file lists;
3. follow the table incrementally via the change data feed
   (read_changes = exactly the rows each commit appended);
4. run the compactor (identical-rows OPTIMIZE transaction, expiring
   tombstones older than the retention horizon) and vacuum the files no
   kept snapshot references;
5. evolve the table as it grows (r17): widen the schema with
   `schema_evolution=True` (old files read the new column as NULL),
   range-read with file-level data skipping (`read(key_range=...)`
   opens only files whose footer key window can match), and re-shard
   with `rebucket(N)` when the day-1 bucket count no longer fits.

Every primitive used here is driver-gated in the registry
(lakehouse_snapshot_merge_check, lakehouse_change_feed_check,
stream_lakehouse_commit_sink, lakehouse_key_skipping_check,
lakehouse_schema_evolution_check, lakehouse_rebucket_check); this
example wires them into the operational loop a real table lives in.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid


def run(spark) -> bool:
    from pyspark.sql import functions as F

    from wukong_spark.tableformat import CommitConflictError, SnapshotStateTable

    work = tempfile.mkdtemp(prefix=f"lakehouse_ex_{uuid.uuid4().hex[:8]}-")
    try:
        t = SnapshotStateTable(
            spark, f"{work}/t", "k", n_buckets=4,
            mode="latest", order_col="seq", delete_col="deleted",
        )
        mk = lambda rows: spark.createDataFrame(
            rows, "k long, seq long, v long, deleted boolean"
        )
        # 1. base + two CDC commits (the second deletes a key)
        v0 = t.merge(mk([(k, 0, k * 10, False) for k in range(1, 6)]))
        v1 = t.merge(mk([(2, 1, 999, False), (6, 1, 60, False)]))
        v2 = t.merge(mk([(3, 2, 30, True)]))  # tombstone k=3
        if [v0, v1, v2] != [0, 1, 2]:
            return False

        # 2. head vs time travel vs point lookup
        head = {r["k"]: r["v"] for r in t.read().collect()}
        if head != {1: 10, 2: 999, 4: 40, 5: 50, 6: 60}:
            return False
        if {r["k"] for r in t.read(version=v0).collect()} != {1, 2, 3, 4, 5}:
            return False
        if {r["k"]: r["v"] for r in t.read_keys([2, 4]).collect()} != {
            2: 999, 4: 40,
        }:
            return False

        # 3. incremental consumer: the change feed is the two commits
        feed = sorted(
            (r["k"], r["__commit"], r["deleted"])
            for r in t.read_changes(v0, v2).collect()
        )
        if feed != [(2, 1, False), (3, 2, True), (6, 1, False)]:
            return False

        # optimistic concurrency, both halves (r17): a stale writer whose
        # delta's buckets OVERLAP an intervening commit's write set must
        # conflict, not clobber — k=3 collides with v2's tombstone commit
        try:
            t.merge(mk([(3, 9, 9, False)]), expect_version=v1)
            return False
        except CommitConflictError:
            pass
        # ...while a stale writer whose buckets are DISJOINT from every
        # intervening commit auto-rebases and lands (strict mode stays
        # available via auto_rebase=False)
        try:
            t.merge(
                mk([(9, 9, 9, False)]), expect_version=v1, auto_rebase=False
            )
            return False
        except CommitConflictError:
            pass
        v3 = t.merge(mk([(9, 9, 90, False)]), expect_version=v1)
        if v3 != v2 + 1:
            return False

        # 4. compactor + GC: identical rows (k=3's old tombstone expires
        #    under the seq<10 retention horizon), then vacuum leaves only
        #    files the kept snapshot references
        before = sorted(tuple(r) for r in t.read().collect())
        cv = t.compact(expire_tombstones_below=9)
        if sorted(tuple(r) for r in t.read().collect()) != before:
            return False
        t.vacuum(keep=[cv])
        if t.history() != [cv]:
            return False
        if sorted(tuple(r) for r in t.read().collect()) != before or (
            v3 != cv - 1
        ):
            return False

        # 5. growth path: widen the schema (old rows read NULL for the
        #    new column), range-read with data skipping, then re-shard
        ev = t.merge(
            spark.createDataFrame(
                [(2, 10, 1000, False, "gold")],
                "k long, seq long, v long, deleted boolean, tier string",
            ),
            schema_evolution=True,
        )
        tiers = {r["k"]: r["tier"] for r in t.read().collect()}
        if tiers[2] != "gold" or tiers[1] is not None:
            return False
        kept, total = t.prune_info((1, 4), version=ev)
        if not (kept <= total):  # skipping is advisory; range read exact
            return False
        if {r["k"] for r in t.read(key_range=(1, 4)).collect()} != {1, 2, 4}:
            return False
        rb = t.rebucket(8)
        if t._load_manifest(rb)["n_buckets"] != 8:
            return False
        return {r["k"]: r["tier"] for r in t.read_keys([2]).collect()} == {
            2: "gold"
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    from _common import session

    print("lakehouse_pipeline:", "OK" if run(session()) else "FAILED")
