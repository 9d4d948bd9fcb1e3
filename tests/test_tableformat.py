"""SnapshotStateTable (wukong_spark/tableformat.py, r16): manifest-based
snapshots on plain parquet — atomic commits with optimistic concurrency,
time travel, snapshot isolation, compaction-as-transaction, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wukong_spark.tableformat import CommitConflictError, SnapshotStateTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, n long")


def test_merge_commits_and_time_travel(spark, tmp_path):
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=4)
    v0 = t.merge(_mk(spark, [(1, 10), (2, 20), (3, 30)]))
    v1 = t.merge(_mk(spark, [(2, 5), (4, 40)]))
    assert (v0, v1) == (0, 1) and t.history() == [0, 1]
    head = {r["k"]: r["n"] for r in t.read().collect()}
    assert head == {1: 10, 2: 25, 3: 30, 4: 40}
    # TIME TRAVEL: v0 still reads the pre-merge state
    old = {r["k"]: r["n"] for r in t.read(version=0).collect()}
    assert old == {1: 10, 2: 20, 3: 30}


def test_snapshot_isolation_pinned_reader(spark, tmp_path):
    """A reader that resolved a snapshot BEFORE a concurrent commit must
    see the old rows when it finally collects — manifests reference
    immutable files, so later commits cannot bleed in."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=4)
    t.merge(_mk(spark, [(1, 1), (2, 2)]))
    pinned = t.read()  # plan resolved against v0's files
    t.merge(_mk(spark, [(1, 100)]))  # v1 lands before the read executes
    assert {r["k"]: r["n"] for r in pinned.collect()} == {1: 1, 2: 2}
    assert {r["k"]: r["n"] for r in t.read().collect()} == {1: 101, 2: 2}


def test_commit_conflict_detection(spark, tmp_path):
    """Optimistic concurrency: two writers staging against the same head
    race to create the same manifest — the loser must get
    CommitConflictError, never a silent overwrite."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=4)
    base = t.merge(_mk(spark, [(1, 1)]))
    # the competing writer claims v1 first
    winner = t._commit(base + 1, {0: []}, "competing-writer")
    assert winner == 1
    with pytest.raises(CommitConflictError):
        # our delta was computed against v0 — its commit must CONFLICT,
        # never silently land on top of the competing writer's v1
        # (auto_rebase=False pins the strict OCC path; the disjoint-
        # bucket rebase path has its own tests below)
        t.merge(_mk(spark, [(2, 2)]), expect_version=base, auto_rebase=False)
    # conflict left no half-visible snapshot: head is the winner's
    assert t.current_version() == 1
    # the associative-delta retry path: re-merge against the new head
    assert t.merge(_mk(spark, [(2, 2)])) == 2


def test_untouched_buckets_carry_by_reference(spark, tmp_path):
    """A merge touching one bucket must reference every other bucket's
    files UNCHANGED in the new manifest (zero IO on untouched data)."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=8)
    t.merge(
        spark.range(0, 400).select(F.col("id").alias("k"), F.lit(1).alias("n"))
    )
    m0 = t._load_manifest(0)["files"]
    delta = _mk(spark, [(7, 5)])
    b7 = delta.select(
        F.pmod(F.hash("k"), F.lit(8)).alias("b")
    ).collect()[0]["b"]
    t.merge(delta)
    m1 = t._load_manifest(1)["files"]
    for b in map(str, range(8)):
        if int(b) == b7:
            assert m1[b] != m0[b]
        else:
            assert m1[b] == m0[b]  # same file names: carried by reference
    got = {r["k"]: r["n"] for r in t.read().collect()}
    assert got[7] == 6 and got[0] == 1 and len(got) == 400


def test_compaction_is_a_transaction(spark, tmp_path):
    """compact() rewrites many small files into one per bucket as a NEW
    snapshot with identical rows; the pre-compaction snapshot still
    time-travels correctly."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=2)
    for i in range(5):
        t.merge(_mk(spark, [(i, i), (i + 100, 1)]))
    before_v = t.current_version()
    before = sorted(tuple(r) for r in t.read().collect())
    n_files_before = t.file_count()
    cv = t.compact()
    assert cv == before_v + 1
    assert t.file_count() < n_files_before
    assert sorted(tuple(r) for r in t.read().collect()) == before
    assert sorted(tuple(r) for r in t.read(version=before_v).collect()) == before


def test_vacuum_reclaims_unreferenced_files(spark, tmp_path):
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=2)
    for i in range(4):
        t.merge(_mk(spark, [(1, 1), (2 * i, 3)]))
    t.compact()
    head = t.current_version()
    want = sorted(tuple(r) for r in t.read().collect())
    removed = t.vacuum(keep_versions=1)
    assert removed > 0
    assert t.history() == [head]
    assert sorted(tuple(r) for r in t.read().collect()) == want
    # every remaining data file is referenced by the kept manifest
    live = {
        r
        for fl in t._load_manifest(head)["files"].values()
        for r in fl
    }
    on_disk = {e for e in os.listdir(t._data_dir) if e.endswith(".parquet")}
    assert on_disk == live


def test_latest_mode_tombstones_across_snapshots(spark, tmp_path):
    """mode='latest' + delete_col on the snapshot table: tombstones hide
    keys at head, stay visible to time travel BEFORE the delete, and a
    late older update cannot resurrect the key."""
    t = SnapshotStateTable(
        spark, str(tmp_path / "t"), "k", n_buckets=4,
        mode="latest", order_col="ord", delete_col="dead",
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "k long, ord long, v long, dead boolean"
    )
    t.merge(mk([(1, 10, 100, False), (2, 10, 200, False)]))
    t.merge(mk([(1, 20, 100, True)]))  # delete k=1 @ ord 20
    assert {r["k"] for r in t.read().collect()} == {2}
    assert {r["k"] for r in t.read(version=0).collect()} == {1, 2}
    t.merge(mk([(1, 15, 111, False)]))  # late, older than the tombstone
    assert {r["k"] for r in t.read().collect()} == {2}


def test_read_keys_prunes_to_touched_bucket_files(spark, tmp_path):
    """read_keys must (a) equal a filtered full read and (b) list ONLY
    the touched buckets' files in its scan — the point-lookup path that
    keeps MERGE INTO source lookups O(touched buckets) at any size."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=8)
    t.merge(
        spark.range(0, 400).select(F.col("id").alias("k"), F.lit(1).alias("n"))
    )
    t.merge(_mk(spark, [(7, 5)]))
    got = {r["k"]: r["n"] for r in t.read_keys([7, 0]).collect()}
    assert got == {7: 6, 0: 1}
    b_touched = {
        r["b"]
        for r in spark.createDataFrame([(7,), (0,)], "k long")
        .select(F.pmod(F.hash("k"), F.lit(8)).alias("b"))
        .collect()
    }
    infiles = {
        os.path.basename(p) for p in t.read_keys([7, 0]).inputFiles()
    }
    m = t._load_manifest(t.current_version())["files"]
    # every scanned file lies in a touched bucket (the bucket cut), and
    # sts pruning may drop MORE — files whose key window excludes every
    # probe key (r17 stats skipping) — but never a file that matters:
    # the result equality above already proved sufficiency
    for b, fl in m.items():
        for rel in fl:
            if rel in infiles:
                assert int(b) in b_touched, (b, rel)
    assert infiles, "scan pruned to nothing"


def test_latest_mode_multirow_delta_reduced_on_write(spark, tmp_path):
    """mode='latest' merges collapse a multi-row-per-key delta to its
    per-key argmax ON WRITE (r16 watch item b) — the one-row invariant
    is enforced instead of documented."""
    t = SnapshotStateTable(
        spark, str(tmp_path / "t"), "k", n_buckets=4,
        mode="latest", order_col="ord",
    )
    mk = lambda rows: spark.createDataFrame(rows, "k long, ord long, v long")
    t.merge(mk([(1, 10, 100), (1, 30, 300), (1, 20, 200), (2, 1, 7)]))
    got = {r["k"]: (r["ord"], r["v"]) for r in t.read().collect()}
    assert got == {1: (30, 300), 2: (1, 7)}
    # and the stored files hold ONE row for k=1 (reduced before staging)
    raw = t._read_files(
        [r for fl in t._load_manifest(0)["files"].values() for r in fl]
    )
    assert raw.filter(F.col("k") == 1).count() == 1


def test_compact_expires_old_tombstones(spark, tmp_path):
    """compact(expire_tombstones_below=h) physically drops tombstones
    older than the horizon; newer tombstones survive and keep guarding
    against resurrection."""
    t = SnapshotStateTable(
        spark, str(tmp_path / "t"), "k", n_buckets=2,
        mode="latest", order_col="ord", delete_col="dead",
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "k long, ord long, v long, dead boolean"
    )
    t.merge(mk([(1, 10, 1, False), (2, 10, 2, False), (3, 10, 3, False)]))
    t.merge(mk([(1, 20, 1, True)]))    # old tombstone (ord 20)
    t.merge(mk([(2, 90, 2, True)]))    # recent tombstone (ord 90)
    t.compact(expire_tombstones_below=50)
    full = {r["k"]: r["dead"] for r in t.read(include_tombstones=True).collect()}
    assert full == {2: True, 3: False}, full  # k=1's tombstone expired
    assert {r["k"] for r in t.read().collect()} == {3}
    # the surviving tombstone still wins over an older straggler
    t.merge(mk([(2, 50, 22, False)]))
    assert {r["k"] for r in t.read().collect()} == {3}


def test_read_changes_is_the_commit_delta(spark, tmp_path):
    """Change data feed: read_changes(a, b) returns exactly the rows
    committed in (a, b] with their commit versions, reading only the
    appended files; a compaction inside the range is SKIPPED (r17,
    VERDICT r16 #2 — the Delta/Iceberg CDF data_unchanged contract),
    so a feed straddling the compactor keeps working."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=4)
    t.merge(_mk(spark, [(1, 10), (2, 20)]))          # v0
    t.merge(_mk(spark, [(1, 5)]))                    # v1
    t.merge(_mk(spark, [(3, 30)]))                   # v2
    ch = sorted(
        (r["k"], r["n"], r["__commit"])
        for r in t.read_changes(0, 2).collect()
    )
    assert ch == [(1, 5, 1), (3, 30, 2)]
    # cost pin: only the two appended files are scanned
    assert len(t.read_changes(0, 2).inputFiles()) == 2
    assert t._load_manifest(2).get("data_unchanged") is False
    t.compact()                                      # v3 (data_unchanged)
    assert t._load_manifest(3)["data_unchanged"] is True
    t.merge(_mk(spark, [(4, 4)]))                    # v4
    # a range straddling the compaction yields the MERGE deltas only —
    # the compaction moved bytes, not rows
    ch3 = sorted(
        (r["k"], r["n"], r["__commit"])
        for r in t.read_changes(0, 4).collect()
    )
    assert ch3 == [(1, 5, 1), (3, 30, 2), (4, 4, 4)]
    # reading forward from the compacted snapshot works as before
    ch2 = [(r["k"], r["n"], r["__commit"]) for r in t.read_changes(3, 4).collect()]
    assert ch2 == [(4, 4, 4)]
    # the feed's lookback ends where vacuum reclaimed manifests (the
    # CDF-vs-VACUUM retention window): the endpoints survive but the
    # in-range manifests are gone
    t.vacuum(keep=[0, 4], stage_retention_s=0.0)
    with pytest.raises(ValueError, match="vacuumed"):
        t.read_changes(0, 4)


def test_snapshot_table_equals_bucketed_sink(spark, tmp_path):
    """The two state sinks share merge_column_exprs — pin the shared
    semantics END TO END: the same delta sequence through
    SnapshotStateTable (merge-on-read) and BucketedUpsertState (merge-on-
    write) must produce identical state, in both modes."""
    import numpy as np

    from wukong_spark.streaming import BucketedUpsertState

    rng = np.random.default_rng(7)

    def deltas_sum():
        out = []
        for _ in range(4):
            ks = rng.choice(30, size=rng.integers(1, 12), replace=False)
            out.append([(int(k), int(rng.integers(-5, 9))) for k in ks])
        return out

    # sum mode
    snap = SnapshotStateTable(spark, str(tmp_path / "s"), "k", n_buckets=4)
    bkt = BucketedUpsertState(spark, str(tmp_path / "b"), "k", n_buckets=4)
    for d in deltas_sum():
        df = spark.createDataFrame(d, "k long, n long")
        snap.merge(df)
        bkt.merge(df)
    a = {r["k"]: r["n"] for r in snap.read().collect()}
    b = {r["k"]: r["n"] for r in bkt.read().collect()}
    assert a == b, (a, b)

    # latest mode with tombstones
    snap2 = SnapshotStateTable(
        spark, str(tmp_path / "s2"), "k", n_buckets=4,
        mode="latest", order_col="ord", delete_col="dead",
    )
    bkt2 = BucketedUpsertState(
        spark, str(tmp_path / "b2"), "k", n_buckets=4,
        mode="latest", order_col="ord", delete_col="dead",
    )
    for _ in range(4):
        ks = rng.choice(20, size=rng.integers(1, 8), replace=False)
        rows = [
            (int(k), int(rng.integers(0, 50)), int(rng.integers(0, 100)),
             bool(rng.random() < 0.25))
            for k in ks
        ]
        df = spark.createDataFrame(rows, "k long, ord long, v long, dead boolean")
        snap2.merge(df)
        bkt2.merge(df)
    a2 = {r["k"]: (r["ord"], r["v"]) for r in snap2.read().collect()}
    b2 = {r["k"]: (r["ord"], r["v"]) for r in bkt2.read().collect()}
    assert a2 == b2, (a2, b2)


def test_snapshot_table_commit_order_invariance(spark, tmp_path):
    """Associativity pin: in mode='latest' (argmax over (ord, commit)
    with per-key-unique ords), applying the same delta set in ANY
    commit order converges to the same head read."""
    import itertools

    deltas = [
        [(1, 10, 100, False), (2, 11, 200, False)],
        [(1, 30, 300, True), (3, 5, 50, False)],
        [(1, 20, 222, False), (2, 40, 444, False)],
    ]
    results = []
    for i, perm in enumerate(itertools.permutations(range(3))):
        t = SnapshotStateTable(
            spark, str(tmp_path / f"p{i}"), "k", n_buckets=2,
            mode="latest", order_col="ord", delete_col="dead",
        )
        for j in perm:
            t.merge(
                spark.createDataFrame(
                    deltas[j], "k long, ord long, v long, dead boolean"
                )
            )
        results.append(
            sorted(tuple(r) for r in t.read(include_tombstones=True).collect())
        )
    assert all(r == results[0] for r in results), results
