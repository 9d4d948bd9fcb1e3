"""Storage-portable lakehouse protocol (r17, VERDICT r16 #1/#4/#7 and
ADVICE r17): the SnapshotStateTable commit protocol must be correct on
an S3-like store (atomic single-object PUT + conditional put-if-absent,
NO rename), manifest commits must be crash-atomic on the local
filesystem, vacuum must not eat an in-flight merge's staged files, and
lost commit races must auto-rebase exactly when the write sets are
bucket-disjoint."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from wukong_spark.storage import LocalFSStorage, SimulatedObjectStore
from wukong_spark.tableformat import CommitConflictError, SnapshotStateTable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, n long")


def _buckets_of(spark, keys, n_buckets):
    rows = (
        spark.createDataFrame([(k,) for k in keys], "k long")
        .select("k", F.pmod(F.hash("k"), F.lit(n_buckets)).alias("b"))
        .collect()
    )
    return {r["k"]: r["b"] for r in rows}


def _disjoint_key_split(spark, n_buckets=8, universe=200):
    """Two key sets guaranteed to hash to disjoint bucket sets."""
    bmap = _buckets_of(spark, list(range(universe)), n_buckets)
    half = set(range(n_buckets // 2))
    a = [k for k, b in bmap.items() if b in half][:6]
    b = [k for k, b in bmap.items() if b not in half][:6]
    assert a and b
    return a, b


# -- storage backends ------------------------------------------------------

def test_local_put_if_absent_is_crash_atomic(tmp_path):
    """ADVICE r17 tableformat.py:143: the visible manifest name must
    never hold truncated bytes.  LocalFSStorage writes+fsyncs a temp
    file first, then claims the name with os.link — so the name either
    doesn't exist or holds the complete payload, and the second claim
    of the same name loses."""
    st = LocalFSStorage(str(tmp_path / "t"))
    payload = json.dumps({"v": 1, "big": "x" * 4096}).encode()
    assert st.put_if_absent("manifests/v1.json", payload) is True
    # loser sees False and the winner's bytes are untouched
    assert st.put_if_absent("manifests/v1.json", b"loser") is False
    assert st.read_bytes("manifests/v1.json") == payload
    # no temp residue is ever listed as an object
    assert st.list("manifests") == ["v1.json"]
    # a leftover .tmp- file (simulated crash mid-stage) is invisible
    with open(tmp_path / "t" / "manifests" / ".tmp-dead", "wb") as f:
        f.write(b'{"trunc')
    assert st.list("manifests") == ["v1.json"]


def test_simulated_object_store_has_no_rename_and_one_put_wins(tmp_path):
    st = SimulatedObjectStore(str(tmp_path / "s"))
    assert not hasattr(st, "rename")
    assert st.put_if_absent("manifests/v0.json", b"A") is True
    assert st.put_if_absent("manifests/v0.json", b"B") is False
    assert st.read_bytes("manifests/v0.json") == b"A"


def test_object_store_race_hook_exactly_one_winner(tmp_path):
    """The worst-case interleaving: a competing writer's conditional PUT
    lands between our staging and our claim — ours must lose, with the
    competitor's manifest fully visible."""
    st = SimulatedObjectStore(
        str(tmp_path / "s"),
        before_put=lambda key: st.force_put(key, b'{"winner": "them"}'),
    )
    assert st.put_if_absent("manifests/v3.json", b'{"winner": "us"}') is False
    assert json.loads(st.read_bytes("manifests/v3.json"))["winner"] == "them"


# -- table format on the simulated object store ----------------------------

def test_snapshot_table_full_protocol_on_object_store(spark, tmp_path):
    """merge / time travel / read_keys / compact / change feed / vacuum,
    all with rename never available — proving the commit protocol leans
    only on atomic PUT + put-if-absent (VERDICT r16 #1)."""
    store = SimulatedObjectStore(str(tmp_path / "remote"))
    t = SnapshotStateTable(
        spark, str(tmp_path / "scratch"), "k", n_buckets=4, storage=store
    )
    t.merge(_mk(spark, [(1, 10), (2, 20)]))            # v0
    t.merge(_mk(spark, [(1, 5), (3, 30)]))             # v1
    assert {r["k"]: r["n"] for r in t.read().collect()} == {1: 15, 2: 20, 3: 30}
    assert {r["k"]: r["n"] for r in t.read(version=0).collect()} == {1: 10, 2: 20}
    got = {r["k"]: r["n"] for r in t.read_keys([1, 3]).collect()}
    assert got == {1: 15, 3: 30}
    t.compact()                                        # v2 (data_unchanged)
    ch = sorted((r["k"], r["__commit"]) for r in t.read_changes(0, 2).collect())
    assert ch == [(1, 1), (3, 1)]
    t.merge(_mk(spark, [(4, 4)]))                      # v3
    removed = t.vacuum(keep_versions=2, stage_retention_s=0.0)
    assert removed > 0
    assert {r["k"]: r["n"] for r in t.read().collect()} == {
        1: 15, 2: 20, 3: 30, 4: 4,
    }
    # the scratch dir holds no durable state — only the store does
    assert not os.path.isdir(os.path.join(str(tmp_path / "scratch"), "data"))


def test_two_writer_race_on_object_store_one_commit_wins(spark, tmp_path):
    """Two writers race the SAME version on the simulated store: exactly
    one v1 manifest exists afterwards; the loser (strict OCC) raises and
    its staged files stay unreferenced; a retry lands as v2 with both
    deltas merged."""
    store = SimulatedObjectStore(str(tmp_path / "remote"))
    t1 = SnapshotStateTable(
        spark, str(tmp_path / "w1"), "k", n_buckets=4, storage=store
    )
    t2 = SnapshotStateTable(
        spark, str(tmp_path / "w2"), "k", n_buckets=4, storage=store
    )
    t1.merge(_mk(spark, [(1, 1)]))                     # v0
    t2.merge(_mk(spark, [(2, 2)]), expect_version=0)   # claims v1 first
    with pytest.raises(CommitConflictError):
        t1.merge(_mk(spark, [(1, 100)]), expect_version=0, auto_rebase=False)
    assert set(store.list("manifests")) == {
        "v000000000.json", "v000000001.json"
    }
    assert t1.history() == [0, 1]
    assert {r["k"]: r["n"] for r in t1.read().collect()} == {1: 1, 2: 2}
    # associative retry from the new head
    assert t1.merge(_mk(spark, [(1, 100)])) == 2
    assert {r["k"]: r["n"] for r in t1.read().collect()} == {1: 101, 2: 2}


# -- auto-rebase (VERDICT r16 #4) -------------------------------------------

def test_merge_auto_rebases_when_buckets_disjoint(spark, tmp_path):
    keys_a, keys_b = _disjoint_key_split(spark)
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=8)
    t.merge(_mk(spark, [(k, 1) for k in keys_a + keys_b]))   # v0
    # writer B lands v1 touching only keys_b's buckets
    t.merge(_mk(spark, [(keys_b[0], 10)]), expect_version=0)
    # writer A computed against v0, touches only keys_a's buckets —
    # bucket-disjoint from v1, so the merge rebases and LANDS (as v2)
    v = t.merge(_mk(spark, [(keys_a[0], 100)]), expect_version=0)
    assert v == 2
    got = {r["k"]: r["n"] for r in t.read().collect()}
    assert got[keys_b[0]] == 11 and got[keys_a[0]] == 101
    # the rebased delta's rows carry the LANDED commit version (the
    # argmax tie-break and change feed both key on it)
    ch = {(r["k"], r["__commit"]) for r in t.read_changes(0, 2).collect()}
    assert (keys_a[0], 2) in ch and (keys_b[0], 1) in ch


def test_merge_conflict_raises_when_buckets_overlap(spark, tmp_path):
    keys_a, _ = _disjoint_key_split(spark)
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=8)
    t.merge(_mk(spark, [(k, 1) for k in keys_a]))            # v0
    t.merge(_mk(spark, [(keys_a[0], 10)]), expect_version=0)  # v1
    with pytest.raises(CommitConflictError):
        # same bucket as the intervening commit → read-set violated
        t.merge(_mk(spark, [(keys_a[0], 100)]), expect_version=0)
    # an intervening COMPACTION always blocks rebase
    t2 = SnapshotStateTable(spark, str(tmp_path / "t2"), "k", n_buckets=8)
    t2.merge(_mk(spark, [(k, 1) for k in keys_a]))           # v0
    t2.merge(_mk(spark, [(keys_a[0], 1)]))                   # v1
    t2.compact()                                             # v2
    with pytest.raises(CommitConflictError):
        t2.merge(_mk(spark, [(keys_a[1], 5)]), expect_version=1)


# -- vacuum hardening --------------------------------------------------------

def test_vacuum_spares_infly_staged_files(spark, tmp_path):
    """ADVICE r17 tableformat.py:455: a file referenced by NO manifest
    may belong to an in-flight merge — vacuum must age-gate it, while
    files referenced only by dropped manifests (durably committed)
    delete immediately."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=2)
    for i in range(3):
        t.merge(_mk(spark, [(1, 1), (2 * i, 3)]))
    t.compact()
    # simulate an in-flight merge: staged+published but not yet committed
    staged, _ = t._stage_files(
        t._bucketed(_mk(spark, [(9, 9)]).withColumn("__commit", F.lit(99)))
    )
    infly = [r for rels in staged.values() for r in rels]
    removed = t.vacuum(keep_versions=1)  # default 1h stage retention
    assert removed > 0
    for r in infly:
        assert t.storage.exists(f"data/{r}"), "in-flight staged file eaten"
    # with the horizon collapsed the stale stage is reclaimed
    t.vacuum(keep_versions=1, stage_retention_s=0.0)
    for r in infly:
        assert not t.storage.exists(f"data/{r}")


def test_vacuum_reader_race_semantics_pinned(spark, tmp_path):
    """VERDICT r16 #7: a reader pinned to a version that vacuum drops
    fails its NEXT action with Spark's file-not-found (cleanly, no wrong
    rows); pinning the version via `keep` keeps it readable."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=2)
    t.merge(_mk(spark, [(1, 10), (2, 20)]))                  # v0
    t.merge(_mk(spark, [(1, 1)]))                            # v1
    t.compact()                                              # v2
    pinned_ok = t.read(version=0)
    t.vacuum(keep=[0, 2], stage_retention_s=0.0)
    assert {r["k"]: r["n"] for r in pinned_ok.collect()} == {1: 10, 2: 20}
    doomed = t.read(version=2)
    t.vacuum(keep=[0], stage_retention_s=0.0)  # drops v2's files
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        doomed.collect()
    assert isinstance(ei.value, Py4JJavaError) or "PATH_NOT_FOUND" in str(
        ei.value
    ) or "FileNotFound" in str(ei.value)


# -- ADVICE r17: read_keys type sensitivity, compact empty bucket -----------

def test_read_keys_casts_lookup_to_committed_key_type(spark, tmp_path):
    """Spark's hash() is type-sensitive: an IntegerType-keyed table
    probed with long lookup keys hashed to the wrong buckets and
    silently returned nothing (ADVICE r17 tableformat.py:284)."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=8)
    ints = spark.createDataFrame([(i, i * 10) for i in range(1, 30)], "k int, n long")
    t.merge(ints)
    got = {r["k"]: r["n"] for r in t.read_keys([3, 7]).collect()}
    assert got == {3: 30, 7: 70}


def test_compact_twice_with_emptied_bucket(spark, tmp_path):
    """ADVICE r17 tableformat.py:379: an expiring compaction can empty a
    bucket's file list; a SECOND compaction must not crash on the
    zero-path parquet read."""
    t = SnapshotStateTable(
        spark, str(tmp_path / "t"), "k", n_buckets=2,
        mode="latest", order_col="seq", delete_col="del",
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "k long, seq long, n long, del boolean"
    )
    t.merge(mk([(1, 1, 10, False), (2, 1, 20, False)]))
    # tombstone EVERY key, then expire all tombstones → buckets empty
    t.merge(mk([(1, 2, 10, True), (2, 2, 20, True)]))
    t.compact(expire_tombstones_below=100)
    assert t.read(include_tombstones=True).count() == 0
    v = t.compact(expire_tombstones_below=100)  # crashed before r17
    assert v == t.current_version()


# -- BucketedUpsertState torn-swap rollback (ADVICE r17) ---------------------

def test_upsert_state_torn_swap_rolls_back(spark, tmp_path):
    """A crash midway through the multi-bucket swap loop must roll BACK
    to the consistent pre-merge state (merge never reported success) —
    not commit forward per bucket into torn state."""
    import shutil

    from wukong_spark.streaming import BucketedUpsertState

    sd = str(tmp_path / "state")
    st = BucketedUpsertState(spark, sd, "k", n_buckets=4)
    st.merge(_mk(spark, [(0, 1), (1, 1), (2, 1), (3, 1)]))
    before = {r["k"]: r["n"] for r in st.read().collect()}

    # hand-craft the torn layout a mid-loop crash leaves: journal says
    # buckets [b0, b1] were being swapped; b0 already swapped to "new"
    # (parked old copy present), b1 not yet reached (dst still pre-merge,
    # nothing parked); NO __DONE marker
    bmap = _buckets_of(spark, [0, 1, 2, 3], 4)
    b_new = bmap[0]
    b_untouched = next(b for k, b in bmap.items() if b != b_new)
    old_root = f"{sd}__old"
    os.makedirs(old_root, exist_ok=True)
    with open(os.path.join(old_root, "__JOURNAL.json"), "w") as f:
        json.dump({"touched": [int(b_new), int(b_untouched)], "new": []}, f)
    # park bucket b_new's pre-merge dir, replace dst with "half-merged"
    shutil.move(
        os.path.join(sd, f"__bkt={b_new}"),
        os.path.join(old_root, f"__bkt={b_new}"),
    )
    poison = spark.createDataFrame([(0, 999)], "k long, n long").withColumn(
        "__bkt", F.lit(int(b_new))
    )
    poison.drop("__bkt").write.mode("overwrite").parquet(
        os.path.join(sd, f"__bkt={b_new}")
    )
    # recovery (triggered by read) must restore the parked copy
    after = {r["k"]: r["n"] for r in st.read().collect()}
    assert after == before
    assert not os.path.isdir(old_root)

    # completed swap (marker present) must roll FORWARD: parked copies
    # are garbage, the new state stays
    st.merge(_mk(spark, [(0, 5)]))
    want = {r["k"]: r["n"] for r in st.read().collect()}
    os.makedirs(old_root, exist_ok=True)
    with open(os.path.join(old_root, "__JOURNAL.json"), "w") as f:
        json.dump({"touched": [int(b_new)], "new": []}, f)
    shutil.copytree(
        os.path.join(sd, f"__bkt={b_new}"),
        os.path.join(old_root, f"__bkt={b_new}"),
    )
    with open(os.path.join(old_root, "__DONE"), "w"):
        pass
    assert {r["k"]: r["n"] for r in st.read().collect()} == want
    assert not os.path.isdir(old_root)


def test_upsert_state_new_bucket_insert_rolls_back(spark, tmp_path):
    """Torn swap where the interrupted merge was INSERTING a brand-new
    bucket (nothing parked): rollback must remove the half-landed new
    bucket dir so state returns to exactly pre-merge."""
    from wukong_spark.streaming import BucketedUpsertState

    sd = str(tmp_path / "state")
    st = BucketedUpsertState(spark, sd, "k", n_buckets=4)
    bmap = _buckets_of(spark, list(range(20)), 4)
    b0 = bmap[0]
    seed_keys = [k for k, b in bmap.items() if b == b0][:3]
    new_key = next(k for k, b in bmap.items() if b != b0)
    st.merge(_mk(spark, [(k, 1) for k in seed_keys]))
    before = {r["k"]: r["n"] for r in st.read().collect()}
    old_root = f"{sd}__old"
    os.makedirs(old_root, exist_ok=True)
    with open(os.path.join(old_root, "__JOURNAL.json"), "w") as f:
        json.dump(
            {"touched": [int(bmap[new_key])], "new": [int(bmap[new_key])]}, f
        )
    half = spark.createDataFrame([(new_key, 7)], "k long, n long")
    half.write.mode("overwrite").parquet(
        os.path.join(sd, f"__bkt={bmap[new_key]}")
    )
    assert {r["k"]: r["n"] for r in st.read().collect()} == before


def test_lost_round_staged_files_are_dropped(spark, tmp_path):
    """A lost commit round's staged data files bake a version someone
    else claimed — merge() must GC them on the spot (raise path AND
    rebase restage path), not lean on vacuum's age gate (r17 watch
    item b)."""
    keys_a, keys_b = _disjoint_key_split(spark)
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=8)
    t.merge(_mk(spark, [(k, 1) for k in keys_a + keys_b]))   # v0
    t.merge(_mk(spark, [(keys_a[0], 10)]), expect_version=0)  # v1

    def unreferenced():
        live = {
            r
            for v in t.history()
            for fl in t._load_manifest(v)["files"].values()
            for r in fl
        }
        return [e for e in t.storage.list("data") if e not in live]

    # overlap → raise: the loser's staged files must be gone
    with pytest.raises(CommitConflictError):
        t.merge(_mk(spark, [(keys_a[0], 100)]), expect_version=0)
    assert unreferenced() == []
    # disjoint → rebase: the pre-rebase staging round is GC'd too
    v = t.merge(_mk(spark, [(keys_b[0], 7)]), expect_version=0)
    assert v == 2
    assert unreferenced() == []


def test_four_threaded_writers_all_land_with_rebase(spark, tmp_path):
    """REAL concurrency (not sequential simulation): four driver threads
    race bucket-disjoint merges against the same snapshot through the
    conditional-put commit path.  Every writer must eventually land via
    auto-rebase (write sets are disjoint), versions must be a contiguous
    1..4, and the converged table must hold every delta — the
    multi-writer contract end-to-end under true interleaving."""
    import threading

    bmap = _buckets_of(spark, list(range(400)), 8)
    by_bucket: dict[int, list[int]] = {}
    for k, b in bmap.items():
        by_bucket.setdefault(b, []).append(k)
    # four writers, two exclusive buckets each
    groups = [
        by_bucket[0][:3] + by_bucket[1][:3],
        by_bucket[2][:3] + by_bucket[3][:3],
        by_bucket[4][:3] + by_bucket[5][:3],
        by_bucket[6][:3] + by_bucket[7][:3],
    ]
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=8)
    t.merge(_mk(spark, [(k, 1) for g in groups for k in g]))  # v0
    results: dict[int, int | Exception] = {}
    barrier = threading.Barrier(4)

    def writer(i: int) -> None:
        try:
            barrier.wait(timeout=30)
            results[i] = t.merge(
                _mk(spark, [(k, 100 + i) for k in groups[i]]),
                expect_version=0,
                max_rebase_retries=8,
            )
        except Exception as e:  # surfaced below
            results[i] = e
        finally:
            from wukong_spark.session import release_pending  # noqa: F401

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    errs = {i: r for i, r in results.items() if isinstance(r, Exception)}
    assert not errs, f"writers failed: {errs}"
    assert sorted(results.values()) == [1, 2, 3, 4]
    got = {r["k"]: r["n"] for r in t.read().collect()}
    for i, g in enumerate(groups):
        for k in g:
            assert got[k] == 101 + i, (i, k, got[k])
    # no orphaned staging survived the lost rounds
    live = {
        r
        for v in t.history()
        for fl in t._load_manifest(v)["files"].values()
        for r in fl
    }
    assert [e for e in t.storage.list("data") if e not in live] == []


# -- data skipping (file-level key stats) ------------------------------------

def test_key_range_skipping_prunes_disjoint_commit_files(spark, tmp_path):
    """Files whose footer key min/max can't intersect the requested range
    are never opened: two merges with disjoint key windows (the
    time-ordered-ingest shape) → a range read keeps only the second
    commit's files, and the result still matches the full-scan filter."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=2)
    t.merge(_mk(spark, [(i, i * 10) for i in range(10)]).repartition(1))
    t.merge(_mk(spark, [(i, 7) for i in range(100, 110)]).repartition(1))

    kept, total = t.prune_info((100, 109))
    assert total == 4 and kept == 2, (kept, total)  # 2 buckets × 2 commits
    kept, total = t.prune_info((0, 9))
    assert kept == 2
    kept, total = t.prune_info((5, 105))  # straddles both windows
    assert kept == 4

    got = {r["k"]: r["n"] for r in t.read(key_range=(100, 109)).collect()}
    assert got == {k: 7 for k in range(100, 110)}
    # open-ended ranges
    got = {r["k"] for r in t.read(key_range=(None, 9)).collect()}
    assert got == set(range(10))
    got = {r["k"] for r in t.read(key_range=(100, None)).collect()}
    assert got == set(range(100, 110))


def test_key_range_equals_full_scan_filter_with_updates(spark, tmp_path):
    """Skipping must be invisible to semantics: a key-range read over a
    table with cross-commit updates to the same keys (sum mode) equals
    the unpruned read + filter."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=4)
    t.merge(_mk(spark, [(i, 1) for i in range(20)]).repartition(1))
    t.merge(_mk(spark, [(i, 100) for i in range(15, 25)]).repartition(1))
    want = {
        r["k"]: r["n"]
        for r in t.read().filter(F.col("k").between(12, 22)).collect()
    }
    got = {r["k"]: r["n"] for r in t.read(key_range=(12, 22)).collect()}
    assert got == want and got[15] == 101 and got[12] == 1


def test_read_keys_stats_prune_and_correctness(spark, tmp_path):
    """read_keys' second pruning stage (after the bucket cut) drops files
    whose key window excludes every probe key, without changing results;
    files with no stats are kept (conservative default)."""
    t = SnapshotStateTable(
        spark, str(tmp_path / "t"), "k", n_buckets=2,
        mode="latest", order_col="ts",
    )
    mk = lambda rows: spark.createDataFrame(rows, "k long, ts long, v string")
    t.merge(mk([(1, 1, "a"), (2, 1, "b")]).repartition(1))
    t.merge(mk([(101, 2, "x"), (102, 2, "y"), (1, 2, "a2")]).repartition(1))

    m = t._load_manifest(t.current_version())
    sts = m.get("stats", {})
    assert sts, "stats missing from manifest"
    # the first commit's files exclude key 101
    first = [r for fl in m["files"].values() for r in fl if "-0000" in r]
    excl = [r for r in sts if not t._stats_keep(sts.get(r), values=[101])]
    assert excl, "no file pruned for point lookup"
    got = {r["k"]: r["v"] for r in t.read_keys([1, 101]).collect()}
    assert got == {1: "a2", 101: "x"}
    # conservative default: no stats → keep
    assert t._stats_keep(None, values=[101])
    assert t._stats_keep({}, lo=0, hi=1)


def test_stats_carry_through_merge_compact_and_objstore(spark, tmp_path):
    """Skipping stats ride the manifest like the file lists: carried by
    reference across merges, regenerated by compact for its rewritten
    files, and present on the rename-free simulated object store."""
    store = SimulatedObjectStore(str(tmp_path / "remote"))
    t = SnapshotStateTable(
        spark, str(tmp_path / "t"), "k", n_buckets=2, storage=store
    )
    t.merge(_mk(spark, [(i, 1) for i in range(5)]).repartition(1))
    t.merge(_mk(spark, [(i, 2) for i in range(200, 205)]).repartition(1))
    m = t._load_manifest(t.current_version())
    rels = {r for fl in m["files"].values() for r in fl}
    assert set(m["stats"]) == rels, "every listed file carries stats"
    v_compact = t.compact()
    m2 = t._load_manifest(v_compact)
    rels2 = {r for fl in m2["files"].values() for r in fl}
    assert set(m2["stats"]) == rels2
    # post-compact each bucket is one file spanning both windows → a
    # narrow range keeps everything (documented: compaction widens
    # per-file windows; skipping pays off on the un-compacted tail)
    kept, total = t.prune_info((0, 4), version=v_compact)
    assert (kept, total) == (total, total)
    # pre-compact version still prunes
    kept, total = t.prune_info((0, 4), version=v_compact - 1)
    assert kept < total
    got = {r["k"]: r["n"] for r in t.read(key_range=(200, 204)).collect()}
    assert got == {k: 2 for k in range(200, 205)}


# -- schema evolution + key-clustered compaction ----------------------------

def test_schema_evolution_widens_and_nulls_backfill(spark, tmp_path):
    """merge(schema_evolution=True): new columns append to the table
    schema; files written before the column existed read as NULL (every
    read resolves files against the version's COMMITTED schema, never a
    sampled file footer); omitted non-structural columns NULL-fill."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=2)
    t.merge(_mk(spark, [(1, 10), (2, 20)]))                       # v0
    with pytest.raises(ValueError, match="schema_evolution"):
        t.merge(
            spark.createDataFrame([(3, 1, 7)], "k long, n long, extra long")
        )
    # a sum table only accumulates: non-numeric evolution is rejected
    with pytest.raises(ValueError, match="non-numeric"):
        t.merge(
            spark.createDataFrame([(3, 1, "x")], "k long, n long, tag string"),
            schema_evolution=True,
        )
    t.merge(                                                      # v1 widened
        spark.createDataFrame([(2, 5, 7)], "k long, n long, extra long"),
        schema_evolution=True,
    )
    got = {r["k"]: (r["n"], r["extra"]) for r in t.read().collect()}
    # n accumulates; extra is NULL for keys with no post-widening rows
    # (sum of an all-null group), 7 where the new delta contributed
    assert got[1] == (10, None) and got[2] == (25, 7)
    # a delta omitting n NULL-fills it (sum ignores nulls)
    t.merge(
        spark.createDataFrame([(1, 3)], "k long, extra long"),
        schema_evolution=True,
    )
    got = {r["k"]: (r["n"], r["extra"]) for r in t.read().collect()}
    assert got == {1: (10, 3), 2: (25, 7)}
    # structural columns are not evolvable
    with pytest.raises(ValueError, match="required"):
        t.merge(
            spark.createDataFrame([(5,)], "extra long"),
            schema_evolution=True,
        )


def test_schema_evolution_latest_mode_and_change_feed(spark, tmp_path):
    """Evolution under mode='latest': the argmax carries the widened
    payload; the change feed across the widening commit reads old files
    under the newest schema in range (schemas only widen)."""
    t = SnapshotStateTable(
        spark, str(tmp_path / "t"), "k", n_buckets=2,
        mode="latest", order_col="ts",
    )
    t.merge(spark.createDataFrame([(1, 1, "a")], "k long, ts long, v string"))
    t.merge(
        spark.createDataFrame(
            [(1, 2, "b", 99)], "k long, ts long, v string, score long"
        ),
        schema_evolution=True,
    )
    got = {r["k"]: (r["v"], r["score"]) for r in t.read().collect()}
    assert got == {1: ("b", 99)}
    ch = {(r["k"], r["__commit"], r["score"]) for r in t.read_changes(0, 1).collect()}
    assert ch == {(1, 1, 99)}
    # time travel BEFORE the widening shows the narrow schema
    assert "score" not in t.read(version=0).columns


def test_clustered_compaction_preserves_skipping(spark, tmp_path):
    """compact(files_per_bucket=N) range-splits each bucket's rewrite by
    key (1-D OPTIMIZE ZORDER): post-compaction files bound narrow key
    windows, so key-range reads keep pruning — the default single wide
    file per bucket cannot."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=2)
    for lo in (0, 100, 200, 300):
        t.merge(
            _mk(spark, [(lo + i, 1) for i in range(100)]).repartition(1)
        )
    v = t.compact(files_per_bucket=4)
    m = t._load_manifest(v)
    assert all(len(fl) == 4 for fl in m["files"].values())
    kept, total = t.prune_info((0, 40), version=v)
    assert total == 8 and kept <= total // 2, (kept, total)
    got = {r["k"] for r in t.read(key_range=(0, 40), version=v).collect()}
    assert got == set(range(41))
    # read()-rows identical across the clustered compaction
    assert t.read(version=v).count() == 400


# -- bucket-count evolution (rebucket) --------------------------------------

def test_rebucket_reshards_and_versions_keep_their_count(spark, tmp_path):
    """rebucket(N) rewrites the head under a new bucket count as one
    data_unchanged transaction; every snapshot's probes hash with ITS
    OWN manifest's count, so read_keys stays correct before and after,
    merges land under the new sharding, and the change feed skips the
    rebucket like a compaction."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=2)
    t.merge(_mk(spark, [(i, i) for i in range(40)]))              # v0
    t.merge(_mk(spark, [(7, 100)]))                               # v1
    v2 = t.rebucket(5)
    m = t._load_manifest(v2)
    assert m["n_buckets"] == 5 and m["data_unchanged"]
    assert set(map(int, m["files"])) == set(range(5))
    # rows identical, merge-on-read combine intact
    got = {r["k"]: r["n"] for r in t.read().collect()}
    assert got[7] == 107 and len(got) == 40
    # point probes on head (5-way hash) and time travel (2-way hash)
    assert {r["k"]: r["n"] for r in t.read_keys([7, 13]).collect()} == {
        7: 107, 13: 13,
    }
    assert {r["k"]: r["n"] for r in t.read_keys([7], version=1).collect()} == {
        7: 107,
    }
    # a merge after the rebucket lands under the NEW count
    t.merge(_mk(spark, [(41, 41)]))                               # v3
    assert t._load_manifest(3)["n_buckets"] == 5
    assert {r["k"] for r in t.read_keys([41]).collect()} == {41}
    # the feed across the rebucket carries only real row changes
    ch = sorted((r["k"], r["__commit"]) for r in t.read_changes(0, 3).collect())
    assert ch == [(7, 1), (41, 3)]


def test_constructor_bucket_mismatch_is_harmless(spark, tmp_path):
    """A session opening an existing table with the WRONG constructor
    n_buckets still probes correctly — the manifest's recorded count
    wins (pre-r17 this silently returned no rows for existing keys)."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=7)
    t.merge(_mk(spark, [(i, i) for i in range(30)]))
    t2 = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=3)
    assert {r["k"]: r["n"] for r in t2.read_keys([5, 29]).collect()} == {
        5: 5, 29: 29,
    }
    # and its merges keep the TABLE'S sharding, not the constructor's
    t2.merge(_mk(spark, [(5, 100)]))
    assert t2._load_manifest(t2.current_version())["n_buckets"] == 7
    assert {r["k"]: r["n"] for r in t.read_keys([5]).collect()} == {5: 105}


def test_merge_race_against_rebucket_raises(spark, tmp_path):
    """A rebucket's write set is the whole table: a merge computed
    against the pre-rebucket snapshot must NOT auto-rebase."""
    t = SnapshotStateTable(spark, str(tmp_path / "t"), "k", n_buckets=2)
    t.merge(_mk(spark, [(1, 1), (2, 2)]))                         # v0
    t.rebucket(4)                                                 # v1
    with pytest.raises(CommitConflictError):
        t.merge(_mk(spark, [(3, 3)]), expect_version=0)
    # re-derived against the new head it lands fine
    t.merge(_mk(spark, [(3, 3)]))
    assert {r["k"] for r in t.read().collect()} == {1, 2, 3}


# -- DML surface (DELETE FROM / UPDATE WHERE) -------------------------------

def test_delete_where_and_update_where(spark, tmp_path):
    """DELETE/UPDATE ... WHERE compile to single MERGE commits: deletes
    tombstone the matching live keys, updates re-emit them with the set
    expressions applied; both are O(matching) writes and flow through
    the normal commit protocol (visible in the change feed, subject to
    OCC)."""
    t = SnapshotStateTable(
        spark, str(tmp_path / "t"), "k", n_buckets=2,
        mode="latest", order_col="seq", delete_col="gone",
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "k long, seq long, status string, price long, gone boolean"
    )
    t.merge(mk([(i, 0, "open", i * 10, False) for i in range(1, 7)]))  # v0
    v1 = t.delete_where(F.col("price") >= 50, order=1)
    assert {r["k"] for r in t.read().collect()} == {1, 2, 3, 4}
    v2 = t.update_where(
        F.col("k") <= 2, {"status": "closed", "price": F.col("price") + 1},
        order=2,
    )
    got = {r["k"]: (r["status"], r["price"]) for r in t.read().collect()}
    assert got == {
        1: ("closed", 11), 2: ("closed", 21),
        3: ("open", 30), 4: ("open", 40),
    }
    # both ops are ordinary commits: feed shows tombstones then updates
    ch = sorted(
        (r["k"], r["__commit"], r["gone"]) for r in t.read_changes(0, v2).collect()
    )
    assert ch == [
        (1, 2, False), (2, 2, False), (5, 1, True), (6, 1, True),
    ]
    # a deleted key does not resurrect via update (matches live rows only)
    t.update_where(F.col("k") == 5, {"status": "zombie"}, order=3)
    assert 5 not in {r["k"] for r in t.read().collect()}
    # guards
    with pytest.raises(ValueError, match="structural"):
        t.update_where(F.lit(True), {"seq": 9}, order=4)
    tsum = SnapshotStateTable(spark, str(tmp_path / "s"), "k", n_buckets=2)
    tsum.merge(_mk(spark, [(1, 1)]))
    with pytest.raises(ValueError, match="delete_col"):
        tsum.delete_where(F.lit(True), order=1)
    with pytest.raises(ValueError, match="latest"):
        tsum.update_where(F.lit(True), {"n": 0}, order=1)
