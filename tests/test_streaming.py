"""Structured Streaming ↔ batch parity tests.

The invariant: a streaming plan over the same files with
trigger=availableNow produces exactly the batch answer (modulo row order).
"""

from __future__ import annotations

import pandas as pd
import pytest

from wukong_spark.queries import load_all
from wukong_spark.streaming import (
    read_events_stream,
    run_to_memory,
    sessionize_stream,
    windowed_counts,
)
from tests.conftest import SF_SMOKE

REG = load_all()


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def test_stream_tumbling_matches_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    result = run_to_memory(
        windowed_counts(stream, "1 hour"), "tumbling_test"
    ).toPandas()

    batch = (
        REG["events_tumbling_hourly"].fn(spark, SF_SMOKE)
        .select("window_start", "event_type", "n_events", "sum_value_4")
        .toPandas()
    )
    got, want = _norm(result), _norm(batch)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_sessionize_counts(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    result = run_to_memory(sessionize_stream(stream), "session_test").toPandas()
    batch = REG["events_sessionize_30m"].fn(spark, SF_SMOKE).toPandas()
    # session_window merges identically to the lag+cumsum rewrite:
    # same number of sessions and same total events per user
    got = result.groupby("user_id")["n_events"].agg(["count", "sum"]).reset_index()
    want = batch.groupby("user_id")["n_events"].agg(["count", "sum"]).reset_index()
    pd.testing.assert_frame_equal(
        _norm(got), _norm(want), check_dtype=False
    )


def test_stream_is_incremental(spark):
    # the plan really is a streaming plan (not a disguised batch)
    stream = read_events_stream(spark, SF_SMOKE)
    assert stream.isStreaming
    agg = windowed_counts(stream)
    assert agg.isStreaming


def test_stream_starts_on_empty_source_dir(spark, tmp_path):
    """ADVICE r4: the ts-type probe must not kill the stream when the
    source directory exists but has no files yet — it falls back to the
    declared long type and the stream starts."""
    from wukong_spark.streaming import read_events_dir_stream

    empty = tmp_path / "events_empty"
    empty.mkdir()
    stream = read_events_dir_stream(spark, str(empty))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"  # normalized from long


def test_stateful_user_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState accumulates per-user state across micro-batches:
    stream the events split into 4 files (1 file per trigger), final running
    totals must equal the batch aggregation."""
    import pyspark.sql.functions as F
    from wukong_spark.streaming import read_events_dir_stream, stateful_user_totals

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    staged = str(tmp_path / "events_split")
    raw.repartition(4).write.parquet(staged)

    stream = read_events_dir_stream(spark, staged, max_files_per_trigger=1)
    out = run_to_memory(
        stateful_user_totals(stream), "stateful_totals_test", mode="update"
    ).toPandas()

    # multiple micro-batches really happened (users re-emitted with state)
    n_users = raw.select("user_id").distinct().count()
    assert len(out) > n_users

    # last emission per user (running totals are monotone in n_events)
    final = out.sort_values("n_events").groupby("user_id").tail(1)
    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .toPandas()
    )
    merged = final.merge(batch, on="user_id", suffixes=("_got", "_want"))
    assert len(merged) == n_users
    assert (merged["n_events_got"] == merged["n_events_want"]).all()
    assert (merged["sum_value_got"] - merged["sum_value_want"]).abs().max() < 1e-6


def test_stream_file_sink_exactly_once_across_restart(spark, tmp_path):
    """Checkpointed file sink: stop the stream, add new source files,
    restart with the same checkpoint — every record lands exactly once."""
    import glob
    import shutil

    import pyspark.sql.functions as F
    from wukong_spark.streaming import EVENTS_SCHEMA

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    alldir, src = str(tmp_path / "all"), str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    raw.repartition(4).write.parquet(alldir)
    parts = sorted(glob.glob(f"{alldir}/part-*.parquet"))
    assert len(parts) == 4
    (tmp_path / "src").mkdir()

    def run_stream():
        q = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(src)
            .filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    total_purchases = raw.filter(F.col("event_type") == "purchase").count()
    for p in parts[:2]:
        shutil.copy(p, src)
    run_stream()
    first = spark.read.parquet(out).count()
    assert 0 < first < total_purchases  # a strict subset so far

    for p in parts[2:]:
        shutil.copy(p, src)
    run_stream()  # same checkpoint: files 1-2 must NOT reprocess

    got = spark.read.parquet(out)
    want = raw.filter(F.col("event_type") == "purchase")
    assert got.count() == want.count()
    assert (
        got.agg(F.sum("event_id")).collect()[0][0]
        == want.agg(F.sum("event_id")).collect()[0][0]
    )


def test_stream_dedup_drops_exact_dupes(spark, tmp_path):
    """Watermarked streaming dropDuplicates removes injected duplicates."""
    import pyspark.sql.functions as F
    from wukong_spark.streaming import dedup_stream, read_events_dir_stream, run_to_memory

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(500)
    staged = str(tmp_path / "dupes")
    raw.union(raw).write.parquet(staged)  # every event exactly twice

    stream = read_events_dir_stream(spark, staged)
    out = run_to_memory(
        dedup_stream(stream, keys=["event_id"]), "dedup_stream_test", complete=False
    )
    assert out.count() == 500


def test_stream_stream_join_bounded_state(spark):
    """Purchases join clicks of the same user within 1 h — results must
    match the equivalent batch interval join."""
    import pyspark.sql.functions as F
    from wukong_spark.streaming import (
        purchases_with_last_click_stream,
        read_events_stream,
        run_to_memory,
    )

    stream = read_events_stream(spark, SF_SMOKE)
    got = run_to_memory(
        purchases_with_last_click_stream(stream),
        "ss_join_test",
        complete=False,
    ).count()

    from wukong_spark.streaming import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = normalize_event_ts(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    want = p.join(
        c,
        (F.col("user_id") == F.col("cu"))
        & (F.col("cts") <= F.col("ts"))
        & (F.col("cts") >= F.col("ts") - F.expr("INTERVAL 1 hour")),
    ).count()
    assert got == want


def test_foreach_batch_sink(spark):
    """foreachBatch drives an arbitrary sink callable per micro-batch."""
    import pyspark.sql.functions as F
    from wukong_spark.streaming import read_events_stream, run_foreach_batch

    stream = read_events_stream(spark, SF_SMOKE)
    seen: list[int] = []
    epochs = run_foreach_batch(
        stream.filter(F.col("event_type") == "error"),
        lambda bdf, _eid: seen.append(bdf.count()),
    )
    assert len(epochs) >= 1
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    want = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .filter(F.col("event_type") == "error")
        .count()
    )
    assert sum(seen) == want


def test_bloom_dedup_bounded_state_across_batches(spark, tmp_path):
    """bloom_dedup_stream (r11, VERDICT r10 #4): dedup state must stay
    O(n_bits) — the SAME fixed byte size in every micro-batch — while
    distinct keys grow across batches, and the emitted key set must
    equal batch DISTINCT (a seen key can never re-emit: its bits are
    set — the structural no-false-negative guarantee).  n_bits here is
    deliberately small relative to dropDuplicates' key-set state shape:
    500+ distinct keys pass through 2 KiB of state per bucket."""
    import pyspark.sql.functions as F
    from wukong_spark.streaming import (
        bloom_dedup_stream,
        read_events_dir_stream,
        run_to_memory,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    staged = str(tmp_path / "events_split_bloom")
    raw.repartition(4).write.parquet(staged)

    stream = read_events_dir_stream(spark, staged, max_files_per_trigger=1).select(
        "user_id", "event_type"
    )
    # 2^17 bits = 16 KiB per bucket, fixed.  The in-operator assert
    # refuses any state blob whose size drifted — if state ever scaled
    # with keys, a later batch would trip it.
    out = run_to_memory(
        bloom_dedup_stream(
            stream, ["user_id", "event_type"], n_bits=1 << 17, n_buckets=4
        ),
        "bloom_dedup_test",
        mode="update",
    ).toPandas()

    batch = (
        raw.select("user_id", "event_type").distinct().toPandas()
    )
    got = set(map(tuple, out[["user_id", "event_type"]].itertuples(index=False)))
    want = set(map(tuple, batch.itertuples(index=False)))
    # exactly once: no key emitted twice
    assert len(out) == len(got)
    # no false negatives: emitted set never exceeds the distinct set
    assert got <= want
    # sizing gives parity (at this density FP prob < 1e-9 per probe)
    assert got == want
    assert len(want) > 50  # the state bound was actually exercised


def test_bloom_dedup_nullable_int64_keys_across_batches(spark, tmp_path):
    """ADVICE r11 medium: hash lanes are computed PLAN-SIDE, so a
    null-carrying micro-batch can no longer promote an int64 key column
    to float64 and re-emit the same key rendered '5.0' vs '5' across
    batches.  Keys at 2^60 pin the full trap: under the old astype(str)
    path, batch 1 (null present) rendered both 2^60 and 2^60+1 as the
    SAME float64 string (collapsing two distinct keys) and batch 2
    (null-free) rendered 2^60 differently (re-emitting it)."""
    from wukong_spark.streaming import (
        bloom_dedup_stream,
        read_events_dir_stream,
        run_to_memory,
    )

    big = 1 << 60
    staged = str(tmp_path / "nullable_keys")
    schema = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )
    batch1 = [(1, 0, big, "a", 0.0, ""), (2, 0, None, "a", 0.0, ""),
              (3, 0, big + 1, "a", 0.0, "")]
    batch2 = [(4, 0, big, "a", 0.0, "")]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(staged)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(staged)

    stream = read_events_dir_stream(spark, staged, max_files_per_trigger=1)
    out = run_to_memory(
        bloom_dedup_stream(
            stream.select("user_id"), ["user_id"], n_bits=1 << 14, n_buckets=2
        ),
        "bloom_nullable_test",
        mode="update",
    ).collect()

    got = sorted((r["user_id"] for r in out), key=lambda v: (v is None, v))
    # exactly once per distinct key: both big keys kept distinct, 2^60
    # emitted a single time across the two batches, NULL emitted once
    assert got == [big, big + 1, None]


def test_bloom_rotating_dedup_epochs_across_batches(spark, tmp_path):
    """bloom_dedup_rotating_stream (r12, VERDICT r11 #4): the
    generational contract — a key emits in epoch e iff it did not occur
    in epoch e−1, at most once per epoch — with the rotation crossing
    MICRO-BATCH boundaries (one file per epoch, maxFilesPerTrigger=1),
    so the (epoch, cur, prev) state round-trips the state store and the
    retire path runs between batches.  Pins: chained suppression (a key
    present every epoch emits once), re-emission after a full-epoch gap
    (the older generation actually retires), and fixed O(bits) state
    (the in-operator asserts refuse a drifted blob on every batch)."""
    import pyspark.sql.functions as F

    from wukong_spark.streaming import (
        bloom_dedup_rotating_stream,
        read_events_dir_stream,
        run_to_memory,
    )

    def ts_ns(day):  # ts long (nanos) → timestamp day `day`
        return day * 86_400 * 10**9

    schema = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )
    # A every epoch; B in 10 and 12 (gap); C only 11; D in 10+11
    epochs = {
        10: [(1, "A"), (2, "B"), (3, "D")],
        11: [(4, "A"), (5, "C"), (6, "D")],
        12: [(7, "A"), (8, "B")],
    }
    staged = str(tmp_path / "rotating_epochs")
    eid = 0
    for day in sorted(epochs):
        rows = []
        for _, key in epochs[day]:
            eid += 1
            rows.append((eid, ts_ns(day), 0, key, 0.0, ""))
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(f"{staged}/day={day}")

    # one file per epoch, fed in arrival order = event-time order
    import glob
    import os
    import shutil as sh

    merged = str(tmp_path / "rotating_merged")
    os_files = sorted(glob.glob(f"{staged}/day=*/*.parquet"))
    os.makedirs(merged)
    for i, f in enumerate(os_files):
        dst = f"{merged}/{i:03d}.parquet"
        sh.copy(f, dst)
        # the file source orders by modification time — pin it so
        # arrival order is the epoch order the test constructs
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    stream = read_events_dir_stream(spark, merged, max_files_per_trigger=1)
    out = run_to_memory(
        bloom_dedup_rotating_stream(
            stream.select("ts", "event_type"),
            ["event_type"],
            epoch=F.datediff(F.to_date("ts"), F.lit("1970-01-01")),
            n_bits=1 << 14,
            n_buckets=2,
        ),
        "bloom_rotating_test",
        mode="update",
    ).collect()

    got = sorted((r["event_type"], r["epoch"]) for r in out)
    assert got == [("A", 10), ("B", 10), ("B", 12), ("C", 11), ("D", 10)]


def test_cms_heavy_hitters_bounded_state_across_batches(spark, tmp_path):
    """cms_heavy_hitters_stream (r12): a key whose count crosses the
    threshold MID-STREAM emits exactly once (never again in later
    batches), keys that only cross via accumulation ACROSS batches are
    caught (the sketch state round-trips), sub-threshold keys never
    emit, and state stays fixed-size every batch (in-operator asserts)."""
    from wukong_spark.streaming import (
        cms_heavy_hitters_stream,
        read_events_dir_stream,
        run_to_memory,
    )

    staged = str(tmp_path / "cms_hh")
    schema = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )
    # batch 1: A x3 (crosses immediately), B x2 (accumulating), C x1
    # batch 2: A x2 (already emitted — must NOT re-emit), B x1 (crosses
    #          now via carried state), C x1 (still below)
    batches = [
        [("A", 3), ("B", 2), ("C", 1)],
        [("A", 2), ("B", 1), ("C", 1)],
    ]
    import os

    eid = 0
    for i, spec in enumerate(batches):
        rows = []
        for key, cnt in spec:
            for _ in range(cnt):
                eid += 1
                rows.append((eid, 0, 0, key, 0.0, ""))
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(staged)
        # pin arrival order (the file source sorts by mtime)
        for f in os.listdir(staged):
            p = os.path.join(staged, f)
            if f.endswith(".parquet") and os.path.getmtime(p) > 1e9 + i:
                os.utime(p, (1e9 + i, 1e9 + i))

    stream = read_events_dir_stream(spark, staged, max_files_per_trigger=1)
    out = run_to_memory(
        cms_heavy_hitters_stream(
            stream.select("event_type"),
            ["event_type"],
            threshold=3,
            width=256,
            bloom_bits=1 << 12,
            n_buckets=2,
        ),
        "cms_hh_test",
        mode="update",
    ).collect()

    got = sorted(r["event_type"] for r in out)
    assert got == ["A", "B"]  # A once despite 5 total; B via carry; C never


def test_bloom_rotating_random_stream_matches_referee(spark, tmp_path):
    """Seeded random (key, epoch) stream in one availableNow batch vs a
    pure-Python referee of the contract: emit (k, e) iff e is k's first
    occurrence in epoch e AND k did not occur in epoch e−1.  Exercises
    epoch gaps, long chains, and re-emission after expiry on data the
    author didn't hand-pick."""
    import numpy as np
    import pyspark.sql.functions as F

    from wukong_spark.streaming import (
        bloom_dedup_rotating_stream,
        read_events_dir_stream,
        run_to_memory,
    )

    rng = np.random.RandomState(12)
    n = 800
    keys = rng.randint(0, 60, n)  # 60 keys
    epochs = np.sort(rng.choice([3, 4, 5, 7, 8, 11, 12], n))  # gaps at 6, 9-10
    schema = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )
    rows = [
        (i, int(epochs[i]) * 86_400 * 10**9, int(keys[i]), "x", 0.0, "")
        for i in range(n)
    ]
    staged = str(tmp_path / "rot_random")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staged)

    stream = read_events_dir_stream(spark, staged)
    out = run_to_memory(
        bloom_dedup_rotating_stream(
            stream.select("ts", "user_id"),
            ["user_id"],
            epoch=F.datediff(F.to_date("ts"), F.lit("1970-01-01")),
            n_bits=1 << 14,
            n_buckets=4,
        ),
        "rot_random_test",
        mode="update",
    ).collect()
    got = sorted((r["user_id"], r["epoch"]) for r in out)

    per_epoch: dict = {}
    for k, e in zip(keys, epochs):
        per_epoch.setdefault(int(e), set()).add(int(k))
    want = sorted(
        (k, e)
        for e, ks in per_epoch.items()
        for k in ks
        if k not in per_epoch.get(e - 1, set())
    )
    assert got == want


def test_cms_heavy_hitters_threshold_one_equals_dedup(spark, tmp_path):
    """threshold=1 degenerates to exactly-once key emission — every
    distinct key emits once, none twice (the Bloom gate alone)."""
    from wukong_spark.streaming import (
        cms_heavy_hitters_stream,
        read_events_dir_stream,
        run_to_memory,
    )

    schema = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )
    rows = [(i, 0, i % 7, "t", 0.0, "") for i in range(50)]
    staged = str(tmp_path / "cms_t1")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staged)
    stream = read_events_dir_stream(spark, staged)
    out = run_to_memory(
        cms_heavy_hitters_stream(
            stream.select("user_id"), ["user_id"], threshold=1,
            width=256, bloom_bits=1 << 12, n_buckets=2,
        ),
        "cms_t1_test",
        mode="update",
    ).collect()
    assert sorted(r["user_id"] for r in out) == list(range(7))


def test_streaming_entries_conf_guard_covers_registry():
    """The stream_* conf bit-identity property (r12 verdict item 3) is
    asserted per-entry inside tests/test_queries_oracle.py's differential
    harness (_run_conf_guarded) — on the execution those tests already
    pay for, instead of a second full run of every stream entry here
    (r18, driver pytest-budget gate).  This test pins that the guard
    actually covers the streaming surface."""
    from tests.test_queries_oracle import NO_ORACLE_QUERIES, ORACLE_QUERIES

    covered = {n for n in ORACLE_QUERIES + NO_ORACLE_QUERIES if n.startswith("stream_")}
    stream_entries = {n for n in REG if n.startswith("stream_")}
    assert len(stream_entries) >= 10
    assert stream_entries == covered


def test_bloom_rotating_null_epochs_dropped_plan_side(spark, tmp_path):
    """ADVICE r12: rows whose epoch expression evaluates to NULL used to
    fall into pandas groupby's silently-dropped NaN group AND promote
    __epoch to float64 in the Arrow batch.  The fix filters them
    plan-side — pin that (a) null-epoch rows are dropped without error,
    (b) every valid row still dedups exactly as before."""
    import pyspark.sql.functions as F

    from wukong_spark.streaming import (
        bloom_dedup_rotating_stream,
        read_events_dir_stream,
        run_to_memory,
    )

    schema = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )
    day = 86_400 * 10**9
    rows = [
        (1, 10 * day, 0, "A", 0.0, ""),
        (2, 10 * day, 0, "A", 0.0, ""),  # dup, suppressed
        (3, 10 * day, 0, "B", 0.0, ""),
        (4, 11 * day, 0, "C", 0.0, ""),
    ]
    staged = str(tmp_path / "rotating_null_epoch")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(staged)

    stream = read_events_dir_stream(spark, staged)
    # epoch is NULL for event_type B: that row must be dropped plan-side
    epoch = F.when(F.col("event_type") != "B",
                   F.datediff(F.to_date("ts"), F.lit("1970-01-01")))
    out = run_to_memory(
        bloom_dedup_rotating_stream(
            stream.select("ts", "event_type"),
            ["event_type"],
            epoch=epoch,
            n_bits=1 << 14,
            n_buckets=2,
        ),
        "bloom_rotating_null_test",
        mode="update",
    ).collect()
    got = sorted((r["event_type"], r["epoch"]) for r in out)
    assert got == [("A", 10), ("C", 11)]


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """BucketedUpsertState (r15, VERDICT r14 item 2): a delta whose keys
    hash into a subset of buckets must (a) report exactly those buckets
    touched, (b) leave every untouched bucket's files BYTE-IDENTICAL on
    disk (path, size, mtime — no rewrite), and (c) still produce the
    exact batch-equivalent totals.  This pins write-amplification ∝
    touched buckets, not total state."""
    import os

    from pyspark.sql import functions as F

    from wukong_spark.streaming import BucketedUpsertState

    state = BucketedUpsertState(
        spark, str(tmp_path / "state"), "k", n_buckets=8
    )
    base = spark.range(0, 400).select(
        F.col("id").alias("k"), F.lit(1).alias("n")
    )
    r = state.merge(base)
    assert sorted(r["touched"]) == list(range(8))  # 400 keys hit all 8

    def snapshot(skip_buckets):
        files = {}
        for root, _, names in os.walk(state.state_dir):
            if any(f"__bkt={b}" in root for b in skip_buckets):
                continue
            for n in names:
                p = os.path.join(root, n)
                st = os.stat(p)
                files[p] = (st.st_size, st.st_mtime_ns)
        return files

    # a single-key delta touches exactly one bucket
    delta = spark.createDataFrame([(7, 5)], "k long, n long")
    b7 = delta.select(
        F.pmod(F.hash(F.col("k")), F.lit(8)).alias("b")
    ).collect()[0]["b"]
    before = snapshot({b7})
    r = state.merge(delta)
    assert r["touched"] == [b7]
    assert snapshot({b7}) == before  # untouched buckets not rewritten

    got = {row["k"]: row["n"] for row in state.read().collect()}
    assert got[7] == 6 and got[0] == 1 and len(got) == 400

    # new key inserts into its bucket without disturbing others
    delta2 = spark.createDataFrame([(9999, 2)], "k long, n long")
    b2 = delta2.select(
        F.pmod(F.hash(F.col("k")), F.lit(8)).alias("b")
    ).collect()[0]["b"]
    before = snapshot({b2})
    r = state.merge(delta2)
    assert r["touched"] == [b2]
    assert snapshot({b2}) == before
    got = {row["k"]: row["n"] for row in state.read().collect()}
    assert got[9999] == 2 and len(got) == 401


def test_bucketed_upsert_read_prunes_partitions(spark, tmp_path):
    """The BucketedUpsertState layout contract: __bkt is a real partition
    column, so the merge path's touched-bucket filter reaches the scan
    as a PartitionFilter — untouched bucket directories are pruned at
    PLAN time, not row-filtered after a full read."""
    from pyspark.sql import functions as F

    from wukong_spark.streaming import BucketedUpsertState

    state = BucketedUpsertState(
        spark, str(tmp_path / "state"), "k", n_buckets=8
    )
    state.merge(
        spark.range(0, 200).select(F.col("id").alias("k"), F.lit(1).alias("n"))
    )
    plan = (
        spark.read.parquet(state.state_dir)
        .filter(F.col("__bkt").isin([3]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "__bkt" in plan.split(
        "PartitionFilters", 1
    )[1][:200], plan[:800]


def test_bucketed_upsert_latest_mode_is_order_associative(spark, tmp_path):
    """mode='latest' (r15): matched keys keep the row with the larger
    order value — and because the combine is an argmax it is
    ASSOCIATIVE: applying deltas out of event order converges to the
    same state as a global argmax.  Untouched buckets still never
    rewrite."""
    import os

    from pyspark.sql import functions as F

    from wukong_spark.streaming import BucketedUpsertState

    state = BucketedUpsertState(
        spark, str(tmp_path / "st"), "k", n_buckets=4,
        mode="latest", order_col="ord",
    )
    mk = lambda rows: spark.createDataFrame(rows, "k long, ord long, v long")
    state.merge(mk([(1, 10, 100), (2, 10, 200)]))
    # OUT-OF-ORDER delta: older ord for k=1 must NOT overwrite; newer
    # for k=2 must; new key 3 inserts
    state.merge(mk([(1, 5, 111), (2, 20, 222), (3, 1, 333)]))
    got = {r["k"]: (r["ord"], r["v"]) for r in state.read().collect()}
    assert got == {1: (10, 100), 2: (20, 222), 3: (1, 333)}, got
    # tie → delta wins
    state.merge(mk([(1, 10, 150)]))
    got = {r["k"]: (r["ord"], r["v"]) for r in state.read().collect()}
    assert got[1] == (10, 150), got

    def snapshot(skip):
        files = {}
        for root, _, names in os.walk(state.state_dir):
            if any(f"__bkt={b}" in root for b in skip):
                continue
            for n in names:
                p = os.path.join(root, n)
                st = os.stat(p)
                files[p] = (st.st_size, st.st_mtime_ns)
        return files

    delta = mk([(3, 9, 999)])
    b = delta.select(F.pmod(F.hash("k"), F.lit(4)).alias("b")).collect()[0]["b"]
    before = snapshot({b})
    r = state.merge(delta)
    assert r["touched"] == [b]
    assert snapshot({b}) == before


def test_bucketed_upsert_tombstone_deletes(spark, tmp_path):
    """delete_col (r16, VERDICT r15 Next #6): a winning tombstone hides
    the key from read() but is RETAINED in state, so a late-arriving
    OLDER update cannot resurrect the key (associative argmax) while a
    genuinely newer update can re-insert it.  Untouched buckets still
    never rewrite."""
    import os

    from pyspark.sql import functions as F

    from wukong_spark.streaming import BucketedUpsertState

    state = BucketedUpsertState(
        spark, str(tmp_path / "st"), "k", n_buckets=4,
        mode="latest", order_col="ord", delete_col="dead",
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "k long, ord long, v long, dead boolean"
    )
    state.merge(mk([(1, 10, 100, False), (2, 10, 200, False)]))
    # delete k=1 at ord 20
    state.merge(mk([(1, 20, 100, True)]))
    got = {r["k"]: (r["ord"], r["v"]) for r in state.read().collect()}
    assert got == {2: (10, 200)}, got
    # tombstone retained: visible with include_tombstones
    full = {r["k"]: r["dead"] for r in state.read(True).collect()}
    assert full == {1: True, 2: False}, full
    # LATE older update (ord 15 < 20) must NOT resurrect k=1
    state.merge(mk([(1, 15, 111, False)]))
    got = {r["k"] for r in state.read().collect()}
    assert got == {2}, got
    # newer update (ord 30) re-inserts
    state.merge(mk([(1, 30, 300, False)]))
    got = {r["k"]: (r["ord"], r["v"]) for r in state.read().collect()}
    assert got == {1: (30, 300), 2: (10, 200)}, got

    # untouched-bucket byte identity extends to the delete path
    def snapshot(skip):
        files = {}
        for root, _, names in os.walk(state.state_dir):
            if any(f"__bkt={b}" in root for b in skip):
                continue
            for n in names:
                p = os.path.join(root, n)
                st = os.stat(p)
                files[p] = (st.st_size, st.st_mtime_ns)
        return files

    delta = mk([(2, 40, 200, True)])
    b = delta.select(F.pmod(F.hash("k"), F.lit(4)).alias("b")).collect()[0]["b"]
    before = snapshot({b})
    r = state.merge(delta)
    assert r["touched"] == [b]
    assert snapshot({b}) == before
    assert {r["k"] for r in state.read().collect()} == {1}


def test_bucketed_upsert_recovers_interrupted_swap(spark, tmp_path):
    """Crash-recoverable swap (ADVICE r15): merge parks replaced buckets
    under {state_dir}__old/ before moving staged ones in.  Simulate the
    two crash windows by hand and assert _recover() restores a missing
    bucket from the parked copy, and discards the parked copy when the
    new bucket landed."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from wukong_spark.streaming import BucketedUpsertState

    state = BucketedUpsertState(
        spark, str(tmp_path / "st"), "k", n_buckets=4
    )
    state.merge(
        spark.range(0, 80).select(F.col("id").alias("k"), F.lit(1).alias("n"))
    )
    want = {r["k"]: r["n"] for r in state.read().collect()}
    bkt = next(
        e for e in os.listdir(state.state_dir) if e.startswith("__bkt=")
    )
    old_root = state.state_dir + "__old"

    # crash window 1: bucket parked, staged copy never moved in
    os.makedirs(old_root, exist_ok=True)
    shutil.move(
        os.path.join(state.state_dir, bkt), os.path.join(old_root, bkt)
    )
    assert {r["k"]: r["n"] for r in state.read().collect()} == want
    assert not os.path.isdir(old_root)

    # crash window 2: new bucket landed, parked copy left behind —
    # recovery must keep the NEW data and drop the parked copy
    os.makedirs(old_root, exist_ok=True)
    shutil.copytree(
        os.path.join(state.state_dir, bkt), os.path.join(old_root, bkt)
    )
    state.merge(spark.createDataFrame([(0, 1)], "k long, n long"))
    assert not os.path.isdir(old_root)
    got = {r["k"]: r["n"] for r in state.read().collect()}
    want[0] = want[0] + 1
    assert got == want


def test_bucketed_upsert_merge_expires_old_tombstones(spark, tmp_path):
    """merge(expire_tombstones_below=h) drops horizon-expired tombstones
    in the buckets it rewrites anyway (zero extra IO); newer tombstones
    survive and keep guarding against resurrection."""
    from pyspark.sql import functions as F

    from wukong_spark.streaming import BucketedUpsertState

    state = BucketedUpsertState(
        spark, str(tmp_path / "st"), "k", n_buckets=1,
        mode="latest", order_col="ord", delete_col="dead",
    )
    mk = lambda rows: spark.createDataFrame(
        rows, "k long, ord long, v long, dead boolean"
    )
    state.merge(mk([(1, 10, 1, False), (2, 10, 2, False), (3, 10, 3, False)]))
    state.merge(mk([(1, 20, 1, True)]))   # old tombstone (ord 20)
    state.merge(mk([(2, 90, 2, True)]))   # recent tombstone (ord 90)
    # a later merge with the watermark at 50 expires k=1's tombstone
    state.merge(mk([(4, 95, 4, False)]), expire_tombstones_below=50)
    full = {r["k"]: r["dead"] for r in state.read(True).collect()}
    assert full == {2: True, 3: False, 4: False}, full
    # the surviving tombstone still wins over an older straggler
    state.merge(mk([(2, 60, 22, False)]))
    assert {r["k"] for r in state.read().collect()} == {3, 4}
