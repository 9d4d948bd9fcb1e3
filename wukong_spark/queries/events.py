"""Event-time windowing + JSON scalar surface (SURVEY.md §2.2 B-V / M5).

The reference has no streaming subsystem — its only time-windowing is pandas
`rolling` executed as opaque tasks (`wukong/tests/test_collections.py:138-141`).
The rebuild exposes event-time tumbling/sliding/session windows as *batch*
DataFrame ops over the `events` table (the Structured Streaming variants in
wukong_spark/streaming reuse the same expressions).

Scale notes: every windowing query shuffles once on its grouping key
(window-bucket or user_id); watermark-style late-data semantics only matter
in the streaming variants.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wukong_spark.queries import query
from wukong_spark.queries.helpers import local_frame, r4, tbl


@query(
    "events_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_4,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY window_start, event_type
    """,
    headline=True,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str):
    """Tumbling 1-hour event-time window aggregation.

    F.window aligns to the epoch in the session timezone (UTC) so a 1-hour
    tumble is exactly date_trunc('hour'). One shuffle on (bucket, type).
    Values are summed as round(value·10⁴) BIGINTs — double SUM is
    summation-order-dependent, so cross-engine equality needs the integer
    scaling discipline used by the other agg queries.
    """
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").getField("start").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("sum_value_4"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "events_sliding_1h_30m",
    oracle="""
    WITH cand AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 1800) AS BIGINT) - s.i) * 1800 * 1000000
             ) AS window_start,
             value
      FROM events e, (SELECT unnest([0, 1]) AS i) s
    )
    SELECT window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_4
    FROM cand GROUP BY window_start
    """,
)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str):
    """Sliding window: length 1 h, slide 30 min (each event in 2 windows).

    Spark's F.window(ts, '1 hour', '30 minutes') replicates each row into
    its containing windows before the aggregation — same plan shape as the
    oracle's 2-way unnest.  Integer-scaled sum for cross-engine exactness.
    """
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").getField("start").alias("window_start")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("sum_value_4"),
        )
    )


@query(
    "events_sessionize_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) <= 1800000000
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_4
    FROM numbered GROUP BY user_id, session_id
    """,
    headline=True,
)
def events_sessionize_30m(spark: SparkSession, sf_dir: str):
    """Session windows (30-min inactivity gap) via lag + cumulative flag.

    The classic batch sessionization: flag rows whose gap from the previous
    event exceeds the timeout, running-sum the flags into a session id,
    aggregate per (user, session).  Two window passes + one agg, all on the
    same user_id partitioning → a single shuffle reused across stages.
    """
    e = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval subtraction works for TIMESTAMP_NTZ and is tz/DST-independent
    # (unix_micros would force LTZ and break on non-UTC driver sessions)
    gap_ok = (F.col("ts") - F.lag(F.col("ts")).over(w)) <= F.expr(
        "INTERVAL '30' MINUTE"
    )
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(gap_ok, 0).otherwise(1).alias("new_session"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        "value",
        F.sum("new_session").over(wrun).cast("long").alias("session_id"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("sum_value_4"),
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str):
    """JSON scalar extraction (get_json_object) + filtered rollup."""
    e = tbl(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "events_rolling_avg3",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS roll_avg
    FROM events
    """,
)
def events_rolling_avg3(spark: SparkSession, sf_dir: str):
    """rolling(3).mean() (test_collections.py:138-141) as a row-frame window.

    Rolling AVG over 3 rows is order-fixed in both engines → identical
    float result; rounded to 4 for hash stability anyway.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return tbl(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        r4(F.avg("value").over(w)).alias("roll_avg"),
    )


@query(
    "events_rolling_30m_range",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_30m,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) OVER w AS BIGINT) AS sum_value_4
    FROM (
      SELECT event_id, user_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling_30m_range(spark: SparkSession, sf_dir: str):
    """TIME-range rolling window (RANGE frame, not ROWS): per user, the
    count and sum of events in the trailing 30 MINUTES — the frame the
    reference's pandas `rolling(N)` cannot express (row frames only).

    The order key is integer epoch seconds derived by NTZ interval
    arithmetic (`unix_timestamp` rejects TIMESTAMP_NTZ; the interval cast
    truncates exactly like DuckDB's floor(epoch)).  RANGE frames treat
    equal-key rows as peers in both engines, so ties are
    order-independent — no tie-break column needed, unlike every ROWS
    frame in this file.  Scale: partitioned by user_id (bounded per-key
    state), integer-scaled values for cross-engine exact sums."""
    e = tbl(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "CAST(ts - TIMESTAMP_NTZ '1970-01-01 00:00:00' AS BIGINT)"
        ).alias("epoch_s"),
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-1800, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_30m"),
        F.sum("v4").over(w).alias("sum_value_4"),
    )


@query(
    "asof_join_last_click",
    oracle="""
    WITH ce AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      FROM ce
    )
    SELECT event_id, user_id, ts,
           COALESCE(last_click_ts, TIMESTAMP '1970-01-01') AS last_click_ts
    FROM w WHERE event_type = 'purchase'
    """,
)
def asof_join_last_click(spark: SparkSession, sf_dir: str):
    """As-of join (attribution): each purchase matched to the same user's
    most recent click at or before it.

    Spark has no ASOF JOIN operator; the scalable formulation is the
    union-merge: both event streams share one shuffle on user_id, a running
    MAX over the click timestamps gives every purchase its predecessor in
    a single sorted pass — no per-row range join, no candidate blowup.
    (A backward range join would be O(clicks × purchases) per user; this
    is O(n log n) in the partition sort.)
    """
    e = tbl(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select("event_id", "user_id", "ts", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn(
            "last_click_ts",
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            # epoch sentinel = "no prior click" (NULL would compare NaT≠NaT
            # in pandas-based harnesses)
            F.coalesce(
                F.col("last_click_ts"),
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            ).alias("last_click_ts"),
        )
    )


@query(
    "asof_operator_tolerance_check",
    # drives the LIBRARY operator (operators/asof.merge_asof) through
    # the gate: purchases <- last click within 30 min, backward
    # inclusive at equal ts (the oracle's window orders clicks BEFORE a
    # same-ts purchase to match); only the matched TS is emitted, so
    # multiple same-ts clicks (operator: largest-payload tie-break;
    # oracle: MAX) cannot diverge
    oracle="""
    WITH ce AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id
               ORDER BY ts,
                        CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                        event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS lc
      FROM ce
    )
    SELECT event_id, user_id, ts,
           COALESCE(
             CASE WHEN ts - lc <= INTERVAL 30 MINUTES THEN lc END,
             TIMESTAMP '1970-01-01'
           ) AS last_click_ts
    FROM w WHERE event_type = 'purchase' ORDER BY event_id
    """,
)
def asof_operator_tolerance_check(spark: SparkSession, sf_dir: str):
    """merge_asof AS A LIBRARY OPERATOR (r14) — the reusable
    `operators/asof.merge_asof` (pandas/dask `merge_asof` parity:
    backward/forward/nearest + tolerance, union-merge plan, property-
    tested against pandas itself in tests/test_properties.py) run
    through the correctness gate: each purchase matched to the same
    user's most recent click within a 30-minute tolerance, unmatched
    purchases keeping the epoch sentinel.

    Plan: ONE shuffle on user_id shared by both event streams, a keyed
    running last over (on, tag, payload) — O(n log n) per key, no range
    join, no candidate blowup; the tolerance is a map-side interval
    comparison after the match."""
    from wukong_spark.operators.asof import merge_asof

    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    m = merge_asof(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        direction="backward",
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    )
    return m.select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(
            F.col("r_ts"),
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("last_click_ts"),
    ).orderBy("event_id")


@query(
    "asof_operator_forward_check",
    # the operator's FORWARD direction through the gate: each purchase
    # matched to the user's NEXT click at-or-after it (inclusive at
    # equal ts — the oracle's window orders same-ts clicks after the
    # purchase to match); only the matched TS is emitted so same-ts
    # click multiplicity cannot diverge
    oracle="""
    WITH ce AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT event_id, user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id
               ORDER BY ts,
                        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END,
                        event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS nc
      FROM ce
    )
    SELECT event_id, user_id, ts,
           COALESCE(nc, TIMESTAMP '2200-01-01') AS next_click_ts
    FROM w WHERE event_type = 'purchase' ORDER BY event_id
    """,
)
def asof_operator_forward_check(spark: SparkSession, sf_dir: str):
    """merge_asof FORWARD direction through the gate (r14) — each
    purchase matched to the same user's NEXT click at or after it (the
    "what did they do next" join), far-future sentinel (2200 — inside pandas' ns range) when none.
    Companion to `asof_operator_tolerance_check` (backward+tolerance);
    together with the pandas property tests all three directions are
    pinned by an independent oracle.

    Same union-merge plan: one user_id exchange shared by both streams,
    a keyed running FIRST over the forward frame — no range join."""
    from wukong_spark.operators.asof import merge_asof

    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    m = merge_asof(
        purchases, clicks, on="ts", by="user_id", direction="forward"
    )
    return m.select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(
            F.col("r_ts"),
            F.lit("2200-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("next_click_ts"),
    ).orderBy("event_id")


@query(
    "asof_operator_global_check",
    # the KEYLESS operator (operators/asof.merge_asof_global, r15)
    # through the gate: each purchase matched to the globally most
    # recent click by ANY user at-or-before it — the bare ordered-index
    # alignment with no by-key.  Only the matched TS is emitted, so
    # same-ts click multiplicity cannot diverge.  The oracle's window
    # has NO PARTITION BY (fine single-node in DuckDB; the operator
    # replaces it with a range exchange + boundary-seed pass).
    oracle="""
    WITH ce AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               ORDER BY ts,
                        CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
                        event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS lc
      FROM ce
    )
    SELECT event_id, user_id, ts,
           COALESCE(lc, TIMESTAMP '1970-01-01') AS last_any_click_ts
    FROM w WHERE event_type = 'purchase' ORDER BY event_id
    """,
)
def asof_operator_global_check(spark: SparkSession, sf_dir: str):
    """KEYLESS merge_asof through the gate (r15, VERDICT r14 item 3) —
    `operators/asof.merge_asof_global`: each purchase matched to the
    most recent click by ANY user (a market-wide "state of the world
    as-of this event" lookup, the dask ordered-index alignment shape,
    reference `test_collections.py:132-149`).  Epoch sentinel when no
    prior click exists.

    Plan: one range exchange on ts over the tagged union (equal keys
    never straddle), per-partition pandas.merge_asof, and a boundary
    exchange of ≤ n_partitions single rows — NEVER an unpartitioned
    window (the 1pw scale-killer this operator exists to avoid)."""
    from wukong_spark.operators.asof import merge_asof_global

    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "ts", F.col("event_id").alias("click_id")
    )
    m = merge_asof_global(
        purchases, clicks, on="ts", direction="backward", n_partitions=16
    )
    return m.select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(
            F.col("r_ts"),
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("last_any_click_ts"),
    ).orderBy("event_id")


@query(
    "asof_operator_exactfalse_check",
    # allow_exact_matches=False through the gate (r15): most recent
    # click STRICTLY before each purchase — the oracle excludes equal-ts
    # clicks by sorting them after the purchase inside the preceding
    # frame; only the matched TS is emitted
    oracle="""
    WITH ce AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id
               ORDER BY ts,
                        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END,
                        event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS lc
      FROM ce
    )
    SELECT event_id, user_id, ts,
           COALESCE(lc, TIMESTAMP '1970-01-01') AS prev_click_ts
    FROM w WHERE event_type = 'purchase' ORDER BY event_id
    """,
)
def asof_operator_exactfalse_check(spark: SparkSession, sf_dir: str):
    """merge_asof(allow_exact_matches=False) through the gate (r15,
    VERDICT r14 item 6) — each purchase matched to the same user's most
    recent click STRICTLY before it (a same-instant click must not
    count as "prior"), epoch sentinel when none.  The pandas parameter
    matrix (direction × exact) is property-tested in
    tests/test_properties.py; this pins the exclusive backward path on
    real data through the DuckDB gate.

    Same union-merge plan as the inclusive entries: the parameter only
    swaps the equal-ts tag order inside the one keyed window."""
    from wukong_spark.operators.asof import merge_asof

    ev = tbl(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    m = merge_asof(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=False,
    )
    return m.select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(
            F.col("r_ts"),
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("prev_click_ts"),
    ).orderBy("event_id")


@query(
    "attribution_last_touch",
    # last-touch channel attribution: each purchase's revenue goes to
    # the user's most recent NON-purchase event type at or before it
    # ('direct' when none) — the IGNORE-NULLS running last over the
    # (ts, event_id) total order is deterministic; revenue is exact
    # scaled ints
    oracle="""
    WITH w AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 10000) AS BIGINT) AS v4,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS channel
      FROM events
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(v4) AS BIGINT) AS revenue_4
    FROM w WHERE event_type = 'purchase'
    GROUP BY COALESCE(channel, 'direct') ORDER BY channel
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str):
    """LAST-TOUCH REVENUE ATTRIBUTION (r14) — the marketing-warehouse
    staple built on the as-of machinery (`asof_join_last_click`'s
    union-merge shape): every purchase's revenue is credited to the
    channel (event_type) of the user's most recent non-purchase event
    at or before it, 'direct' when the purchase has no predecessor;
    rolled up to per-channel purchase counts and exact revenue.

    Plan: ONE shuffle on user_id shared by all event types, a running
    IGNORE-NULLS last over the (ts, event_id) total order (keyed
    window — bounded per-user state), one channel-keyed agg.  No range
    join, no candidate blowup: O(n log n) in the per-user sort, exactly
    the as-of discipline.  First/linear/time-decay attribution swap the
    window expression only."""
    e = tbl(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("channel", channel)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("v4").cast("long").alias("revenue_4"),
        )
        .orderBy("channel")
    )


@query(
    "asof_join_nearest",
    oracle="""
    WITH ce AS (
      SELECT event_id, user_id, ts, event_type FROM events
      WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts,
             MIN(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fwd_ts
      FROM ce
    ), d AS (
      SELECT event_id, user_id, ts,
             -- per-timestamp floor BEFORE subtracting (matches Spark's
             -- CAST(ts - epoch AS BIGINT) per side; floor-of-difference
             -- would disagree by 1 on sub-second timestamps)
             epoch_us(ts) // 1000000 - epoch_us(back_ts) // 1000000
               AS back_diff_s,
             epoch_us(fwd_ts) // 1000000 - epoch_us(ts) // 1000000
               AS fwd_diff_s,
             back_ts, fwd_ts
      FROM w WHERE event_type = 'purchase'
    ), pick AS (
      SELECT event_id, user_id, ts,
             CASE
               WHEN back_diff_s IS NOT NULL
                    AND (fwd_diff_s IS NULL OR back_diff_s <= fwd_diff_s)
                 THEN back_ts
               ELSE fwd_ts
             END AS cand_ts,
             CASE
               WHEN back_diff_s IS NOT NULL
                    AND (fwd_diff_s IS NULL OR back_diff_s <= fwd_diff_s)
                 THEN back_diff_s
               ELSE fwd_diff_s
             END AS cand_diff_s
      FROM d
    )
    SELECT event_id, user_id, ts,
           CASE WHEN cand_diff_s IS NOT NULL AND cand_diff_s <= 7200
                THEN cand_ts ELSE TIMESTAMP '1970-01-01' END
             AS nearest_click_ts,
           CAST(CASE WHEN cand_diff_s IS NOT NULL AND cand_diff_s <= 7200
                THEN cand_diff_s ELSE -1 END AS BIGINT) AS diff_s
    FROM pick
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str):
    """NEAREST-direction as-of join with tolerance (r11) — the pandas
    `merge_asof(direction='nearest', tolerance=...)` semantics the
    backward-only `asof_join_last_click` doesn't cover: each purchase
    matched to the same user's temporally CLOSEST click, looking both
    ways, dropped to a sentinel when the nearest click is further than
    2 hours.  Ties (equidistant clicks) deterministically prefer the
    earlier (backward) one.

    Scalable formulation: the same union-merge as the backward as-of —
    both event streams share ONE shuffle on user_id, a running MAX over
    preceding click timestamps and a running MIN over following ones
    give each purchase both candidates in a single sorted pass; the
    nearest pick and the tolerance gate are per-row CASE arithmetic.
    No range join, no candidate blowup — O(n log n) in the partition
    sort regardless of click density."""
    e = tbl(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select("event_id", "user_id", "ts", "event_type")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    p = (
        e.withColumn("back_ts", F.max(click_ts).over(wb))
        .withColumn("fwd_ts", F.min(click_ts).over(wf))
        .filter(F.col("event_type") == "purchase")
    )
    # NTZ-safe integer second difference (unix_* reject TIMESTAMP_NTZ)
    def secs(a, b):
        return F.expr(
            f"CAST({a} - TIMESTAMP_NTZ '1970-01-01 00:00:00' AS BIGINT)"
        ) - F.expr(
            f"CAST({b} - TIMESTAMP_NTZ '1970-01-01 00:00:00' AS BIGINT)"
        )

    p = p.withColumn("back_diff_s", secs("ts", "back_ts")).withColumn(
        "fwd_diff_s", secs("fwd_ts", "ts")
    )
    back_wins = F.col("back_diff_s").isNotNull() & (
        F.col("fwd_diff_s").isNull()
        | (F.col("back_diff_s") <= F.col("fwd_diff_s"))
    )
    p = p.withColumn(
        "cand_ts", F.when(back_wins, F.col("back_ts")).otherwise(F.col("fwd_ts"))
    ).withColumn(
        "cand_diff_s",
        F.when(back_wins, F.col("back_diff_s")).otherwise(F.col("fwd_diff_s")),
    )
    within = F.col("cand_diff_s").isNotNull() & (F.col("cand_diff_s") <= 7200)
    return p.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("cand_ts"))
        .otherwise(F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"))
        .alias("nearest_click_ts"),
        F.when(within, F.col("cand_diff_s")).otherwise(F.lit(-1)).cast("long").alias("diff_s"),
    )


@query(
    "salted_agg_event_type",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_4,
           MIN(event_id) AS min_event,
           MAX(event_id) AS max_event
    FROM events
    GROUP BY event_type
    """,
)
def salted_agg_event_type(spark: SparkSession, sf_dir: str):
    """Skew-resilient aggregation on a 5-value key (the worst-case shape:
    millions of rows per key at scale) via two-phase salting — results are
    exactly the plain GROUP BY, verified by the oracle.  See
    wukong_spark/operators/skew.py for the decomposition rules."""
    from wukong_spark.operators.skew import salted_agg

    e = tbl(spark, sf_dir, "events")
    return salted_agg(
        e.withColumn("value_4", F.round(F.col("value") * 10000).cast("long")),
        keys=["event_type"],
        aggs={
            "n": ("count", None),
            "sum_value_4": ("sum", "value_4"),
            "min_event": ("min", "event_id"),
            "max_event": ("max", "event_id"),
        },
        buckets=32,
    )


@query(
    "rollup_daily_from_hourly",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS sv4
      FROM events GROUP BY h, event_type
    )
    SELECT date_trunc('day', h) AS day, event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(sv4) AS BIGINT) AS sum_value_4
    FROM hourly GROUP BY day, event_type
    """,
)
def rollup_daily_from_hourly(spark: SparkSession, sf_dir: str):
    """Hypertable-style continuous aggregate: the daily rollup is computed
    FROM the hourly rollup (not from raw events) — the reaggregation
    identity (sum-of-sums, sum-of-counts) that makes materialized
    time-bucket hierarchies valid.  The oracle reaggregates the same way;
    tests/test_queries_oracle.py hash-proves hourly→daily ≡ direct daily.

    Scale shape: raw→hourly shuffles once on (hour, type); hourly→daily is
    a ~24×-smaller second agg — at 100 TB the hourly layer would be a
    materialized parquet table and dashboards would never touch raw events.
    """
    e = tbl(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("sv4"),
    )
    return hourly.groupBy(
        F.date_trunc("day", "h").alias("day"), "event_type"
    ).agg(
        F.sum("n").alias("n_events"),
        F.sum("sv4").alias("sum_value_4"),
    )


@query(
    "events_resample_5m",
    oracle="""
    WITH b AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 300) AS BIGINT)) * 300 * 1000000
             ) AS bucket, value
      FROM events
    ),
    agg AS (
      SELECT bucket, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS sv4,
             ROUND(MIN(value), 4) AS mn4,
             ROUND(MAX(value), 4) AS mx4
      FROM b GROUP BY bucket
    ),
    bounds AS (SELECT MIN(bucket) AS mn, MAX(bucket) AS mx FROM agg),
    spine AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 5 MINUTE)) AS bucket
      FROM bounds
    )
    SELECT s.bucket AS bucket,
           COALESCE(a.n, 0) AS n_events,
           COALESCE(a.sv4, 0) AS sum_value_4,
           COALESCE(a.mn4, 0.0) AS min_value_4,
           COALESCE(a.mx4, 0.0) AS max_value_4
    FROM spine s LEFT JOIN agg a ON a.bucket = s.bucket
    """,
)
def events_resample_5m(spark: SparkSession, sf_dir: str):
    """Time-series resample to a regular 5-minute grid WITH gap filling —
    dask.dataframe's `df.resample('5min').agg(...)` surface (pandas
    semantics: empty bins appear in the output; the reference runs exactly
    such pandas-time-series tasks as opaque graphs,
    `wukong/tests/test_collections.py:138-141`).

    Plan: one shuffle aggregates events into 5-minute buckets; the bucket
    spine comes from sequence(min, max, 5 min) exploded off the 1-row
    bounds agg and left-joins the (small) bucket aggregate.  Empty bins
    are COALESCE-filled on both sides — the driver's comparator treats
    NULL/NaN as unequal, and n_events = 0 already marks them.

    Scale: the aggregated bucket table is O(time-range), not O(events) —
    at 100 TB of events it is still ~100k rows/year, so the spine join is
    a broadcast."""
    e = tbl(spark, sf_dir, "events")
    agg = e.groupBy(
        F.window("ts", "5 minutes").getField("start").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("sv4"),
        r4(F.min("value")).alias("mn4"),
        r4(F.max("value")).alias("mx4"),
    )
    bounds = agg.agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 5 minutes"))).alias("bucket")
    )
    return spine.join(agg, "bucket", "left").select(
        "bucket",
        F.coalesce("n", F.lit(0).cast("long")).alias("n_events"),
        F.coalesce("sv4", F.lit(0).cast("long")).alias("sum_value_4"),
        F.coalesce("mn4", F.lit(0.0)).alias("min_value_4"),
        F.coalesce("mx4", F.lit(0.0)).alias("max_value_4"),
    )


@query(
    "events_value_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 5.0) AS BIGINT) AS bin,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_4
    FROM events
    WHERE value IS NOT NULL
    GROUP BY bin
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str):
    """Fixed-width histogram over the value column — da.histogram /
    dask.dataframe binning parity (the reference's array surface includes
    histogramming via opaque chunked graphs).

    Bin id = floor(value / width): a single double division + floor —
    bit-identical cross-engine on identical inputs (no accumulation), so
    bin membership never flips.  One map-side bin computation + one
    shuffle on bin; counts and integer-scaled sums are exact.

    At 100 TB this is the textbook map-side-combine aggregation: ~dozens
    of distinct bins means partial aggregation collapses each task to a
    handful of rows before the exchange."""
    e = tbl(spark, sf_dir, "events")
    # null hygiene (symmetric with the oracle): a NULL bin would reach the
    # comparator as NaN, which it treats as unequal — and the driver
    # regenerates testdata between rounds, so "no NULLs today" is not a
    # contract
    return e.filter(F.col("value").isNotNull()).groupBy(
        F.floor(F.col("value") / 5.0).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("sum_value_4"),
    )


@query(
    "stream_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_4
    FROM events
    GROUP BY window_start, event_type
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str):
    """STREAMING tumbling-window aggregation, hash-verified against the
    batch SQL oracle — the batch/stream-parity invariant
    (wukong_spark/streaming: same window expressions, watermark-bounded
    state) promoted from pytest into the driver's correctness gate.

    Runs the events table as a bounded stream (trigger=availableNow over
    the parquet source, watermark 2 h) into a memory sink; with all data
    available the watermark finalizes every window, so the streaming
    result equals the batch aggregation exactly.  At 100 TB the identical
    plan runs unbounded: per-window state is evicted once older than
    max(event_time) − watermark."""
    import uuid

    from wukong_spark.streaming import (
        read_events_stream,
        run_to_memory,
        windowed_counts,
    )

    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    # unique sink name, dropped afterwards — a long-lived driver session
    # re-running the gate must not accumulate dead memory-sink tables.
    # (Staging for the single-file source is read_events_stream's cached,
    # atexit-cleaned symlink dir.)
    sink = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    try:
        ev = read_events_stream(spark, sf_dir)
        rows = run_to_memory(windowed_counts(ev), sink).collect()
        schema = (
            "window_start timestamp_ntz, event_type string,"
            " n_events long, sum_value_4 long"
        )
        return local_frame(spark, rows, schema)
    finally:
        spark.catalog.dropTempView(sink)
        # read_events_stream pins UTC + nanosAsLong for watermark/scan
        # semantics; restore BOTH so later queries in the same (possibly
        # non-UTC driver) session see their own settings
        restore_stream_conf(spark, prev_conf)


@query(
    "stream_ohlc_hourly_check",
    # identical oracle to events_ohlc_hourly modulo the column name —
    # batch/stream parity: min_by/max_by are ASSOCIATIVE under the
    # (ts, event_id) total order, so micro-batch partials merge to the
    # exact batch answer
    oracle="""
    WITH b AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 3600) AS BIGINT)) * 3600 * 1000000
             ) AS window_start,
             ts, event_id,
             CAST(ROUND(value * 10000) AS BIGINT) AS v4
      FROM events
    ), r AS (
      SELECT window_start, v4,
             ROW_NUMBER() OVER (PARTITION BY window_start
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY window_start
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT window_start,
           CAST(MAX(CASE WHEN rn_a = 1 THEN v4 END) AS BIGINT) AS open_4,
           MAX(v4) AS high_4,
           MIN(v4) AS low_4,
           CAST(MAX(CASE WHEN rn_d = 1 THEN v4 END) AS BIGINT) AS close_4,
           COUNT(*) AS n_events,
           CAST(SUM(v4) AS BIGINT) AS volume_4
    FROM r GROUP BY window_start ORDER BY window_start
    """,
)
def stream_ohlc_hourly_check(spark: SparkSession, sf_dir: str):
    """STREAMING OHLC BARS (r14) — events_ohlc_hourly's aggregation run
    as a watermarked Structured Streaming window: open/close via
    min_by/max_by over the (ts, event_id) struct are ASSOCIATIVE
    aggregates (the argmin of a union is the argmin of the argmins), so
    micro-batch partial states merge to the exact batch candlesticks —
    the batch/stream-parity invariant, hash-checked against the same
    oracle as the batch entry.

    At 100 TB the identical plan runs unbounded: per-window OHLC state
    is a fixed handful of scalars per (window, symbol), finalized and
    evicted once older than max(event_time) − watermark."""
    import uuid

    from wukong_spark.streaming import (
        read_events_stream,
        restore_stream_conf,
        run_to_memory,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    sink = f"stream_ohlc_{uuid.uuid4().hex[:8]}"
    try:
        ev = read_events_stream(spark, sf_dir)
        agg = (
            ev.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.min_by(
                    F.round(F.col("value") * 10000).cast("long"),
                    F.struct("ts", "event_id"),
                ).alias("open_4"),
                F.max(F.round(F.col("value") * 10000).cast("long")).alias(
                    "high_4"
                ),
                F.min(F.round(F.col("value") * 10000).cast("long")).alias(
                    "low_4"
                ),
                F.max_by(
                    F.round(F.col("value") * 10000).cast("long"),
                    F.struct("ts", "event_id"),
                ).alias("close_4"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 10000).cast("long")).alias(
                    "volume_4"
                ),
            )
            .select(
                F.col("w").getField("start")
                .cast("timestamp_ntz")
                .alias("window_start"),
                "open_4",
                "high_4",
                "low_4",
                "close_4",
                "n_events",
                "volume_4",
            )
        )
        rows = run_to_memory(agg, sink).collect()
        schema = (
            "window_start timestamp_ntz, open_4 long, high_4 long,"
            " low_4 long, close_4 long, n_events long, volume_4 long"
        )
        return local_frame(spark, rows, schema).orderBy("window_start")
    finally:
        spark.catalog.dropTempView(sink)
        restore_stream_conf(spark, prev_conf)


@query(
    "stream_sessionize_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) < 1800000000
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
               AS sum_value_4
    FROM numbered GROUP BY user_id, sid
    """,
)
def stream_sessionize_30m(spark: SparkSession, sf_dir: str):
    """STREAMING sessionization (F.session_window, 30-min gap), hash-
    verified against the batch lag+cumsum rewrite — the second
    batch/stream-parity entry in the driver gate (VERDICT r5 #6).

    Boundary semantics, encoded exactly in the oracle: session_window
    assigns each event the interval [ts, ts+gap) and merges OVERLAPPING
    intervals, so an event exactly `gap` after its predecessor starts a
    NEW session — the oracle's lag test is strict `<` (the batch
    `events_sessionize_30m` entry keeps dask-style `<=`; both are valid
    sessionization contracts, this one is Spark's native).  With
    trigger=availableNow and all data behind the watermark, streaming
    session state finalizes completely, so the results agree exactly.
    At 100 TB the same plan runs unbounded with per-user session state
    evicted at the watermark."""
    import uuid

    from wukong_spark.streaming import (
        read_events_stream,
        run_to_memory,
        sessionize_stream,
    )

    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    sink = f"stream_sess_{uuid.uuid4().hex[:8]}"
    try:
        ev = read_events_stream(spark, sf_dir)
        rows = run_to_memory(sessionize_stream(ev), sink).collect()
        schema = (
            "user_id long, session_start timestamp_ntz,"
            " n_events long, sum_value_4 long"
        )
        return local_frame(spark, rows, schema)
    finally:
        spark.catalog.dropTempView(sink)
        restore_stream_conf(spark, prev_conf)


@query(
    "stream_dedup_exact",
    oracle="""
    SELECT DISTINCT user_id, event_type,
           CAST(ROUND(value * 10000) AS BIGINT) AS value_4
    FROM events
    """,
)
def stream_dedup_exact(spark: SparkSession, sf_dir: str):
    """STREAMING exact dedup (dropDuplicatesWithinWatermark), hash-verified
    against batch DISTINCT — the third batch/stream-parity entry in the
    driver gate (VERDICT r5 #6) and the streaming face of the batch
    `events_dedup_exact` / `dedup_exact_md5` operators.

    Emits only the surviving KEY SET: which physical row survives a
    streaming dedup depends on arrival order (file split order here), so
    any row-identity column (event_id, ts) would be nondeterministic — the
    deterministic contract is the distinct keys, which is also what the
    batch fingerprint dedup certifies.  State is O(keys inside the
    watermark horizon); at 100 TB that bound (not the full key history) is
    what makes streaming dedup feasible."""
    import uuid

    from wukong_spark.streaming import (
        dedup_stream,
        read_events_stream,
        run_to_memory,
    )

    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    try:
        ev = read_events_stream(spark, sf_dir).select(
            "ts",
            "user_id",
            "event_type",
            F.round(F.col("value") * 10000).cast("long").alias("value_4"),
        )
        # watermark wider than the table's whole time span: parity with
        # batch DISTINCT must not depend on availableNow happening to run
        # one micro-batch — if the source ever splits into several batches
        # (multi-file layout, maxFilesPerTrigger), a 2 h watermark would
        # evict state and re-emit far-apart duplicate keys.  Production
        # streams keep dedup_stream's bounded default; THIS entry's
        # contract is exact batch parity, so state must span the data.
        d = dedup_stream(
            ev, ["user_id", "event_type", "value_4"], watermark="3650 days"
        ).select("user_id", "event_type", "value_4")
        # dedup emits rows as they arrive → append-mode sink
        rows = run_to_memory(d, sink, complete=False).collect()
        return local_frame(spark,
            rows, "user_id long, event_type string, value_4 long"
        )
    finally:
        spark.catalog.dropTempView(sink)
        restore_stream_conf(spark, prev_conf)


@query(
    "stream_bloom_dedup_check",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_bloom_dedup_check(spark: SparkSession, sf_dir: str):
    """STREAMING BLOOM-GATED DEDUP (r11, VERDICT r10 #4) — exact-once
    key emission with BOUNDED sketch state: an applyInPandasWithState
    operator (`streaming.bloom_dedup_stream`) whose per-bucket state is
    a fixed 4-Mbit Bloom array, O(bits) by construction, instead of
    `dropDuplicatesWithinWatermark`'s O(keys-in-watermark) state store
    (the production shape once the key space outgrows the state store).

    Parity contract vs batch DISTINCT: no-false-negative is STRUCTURAL
    (a seen key can never re-emit — its bits are set), so the emitted
    set is always duplicate-free; a false POSITIVE would silently drop
    a new key, and the sizing makes that negligible — ~1k keys/bucket ×
    7 set bits against 2²² bits gives p ≈ (7k/4M)⁷ < 1e-19 per probe
    (the CMS heavy-hitters sizing discipline), so batch parity is
    deterministic-in-practice at any driver regen.  State size is
    pinned O(bits) in tests/test_streaming.py (constant state bytes
    while distinct keys grow; an in-operator assert refuses a
    wrong-size blob)."""
    import uuid

    from wukong_spark.streaming import (
        bloom_dedup_stream,
        read_events_stream,
        run_to_memory,
    )

    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    sink = f"stream_bloomdedup_{uuid.uuid4().hex[:8]}"
    try:
        ev = read_events_stream(spark, sf_dir).select("user_id", "event_type")
        d = bloom_dedup_stream(ev, ["user_id", "event_type"])
        rows = run_to_memory(d, sink, mode="update").collect()
        return local_frame(spark, rows, "user_id long, event_type string")
    finally:
        spark.catalog.dropTempView(sink)
        restore_stream_conf(spark, prev_conf)


@query(
    "stream_bloom_rotating_check",
    # a key emits in epoch (day) e iff it did not occur in day e-1, at
    # most once per day — the within-watermark dedup contract the
    # rotating two-generation Bloom implements
    oracle="""
    WITH t AS (
      SELECT DISTINCT user_id, event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS epoch
      FROM events
    )
    SELECT a.user_id, a.event_type, a.epoch
    FROM t a LEFT JOIN t b
      ON b.user_id = a.user_id AND b.event_type = a.event_type
     AND b.epoch = a.epoch - 1
    WHERE b.epoch IS NULL
    """,
)
def stream_bloom_rotating_check(spark: SparkSession, sf_dir: str):
    """GENERATIONAL streaming Bloom dedup (r12, VERDICT r11 #4) — the
    `dropDuplicatesWithinWatermark` contract at O(bits) state over an
    UNBOUNDED stream: `streaming.bloom_dedup_rotating_stream` rotates
    two Bloom generations per bucket keyed to event-time day number
    (probe both, insert current, retire the older when the epoch
    advances), so state stays a fixed 2 × 4 Mbit per bucket while the
    FP rate is STATIONARY — the eternal single Bloom of
    `stream_bloom_dedup_check` degrades monotonically as keys
    accumulate; this is the production shape for a stream with no end.

    Parity contract vs the batch anti-join: a (user_id, event_type)
    emits on day e iff it did not occur on day e−1 (30 day-epochs in
    the events table, so the retire path cycles 29 times).  In-epoch
    exactly-once and cross-epoch suppression are structural
    (no-false-negative Bloom probes over both live generations); a
    false positive would need ~(7·270/4M)⁷ ≈ 1e-25 — far below the
    driver-regen noise floor.  State size is pinned constant across
    epoch advances in tests/test_streaming.py."""
    import uuid

    from wukong_spark.streaming import (
        bloom_dedup_rotating_stream,
        read_events_stream,
        run_to_memory,
    )

    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    sink = f"stream_bloomrot_{uuid.uuid4().hex[:8]}"
    try:
        ev = read_events_stream(spark, sf_dir).select("ts", "user_id", "event_type")
        d = bloom_dedup_rotating_stream(
            ev,
            ["user_id", "event_type"],
            epoch=F.datediff(F.to_date("ts"), F.lit("1970-01-01")),
        )
        rows = run_to_memory(d, sink, mode="update").collect()
        return local_frame(spark,
            rows, "user_id long, event_type string, epoch long"
        )
    finally:
        spark.catalog.dropTempView(sink)
        restore_stream_conf(spark, prev_conf)


@query(
    "stream_interval_join_clicks",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts, c.event_id AS click_id, c.ts AS click_ts,
           CAST(ROUND(p.value * 10000) AS BIGINT) AS purchase_value_4
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.user_id % 5 = 0 AND c.user_id % 5 = 0
    """,
)
def stream_interval_join_clicks(spark: SparkSession, sf_dir: str):
    """STREAM-STREAM interval join, hash-verified against the batch
    interval join — the fourth batch/stream-parity entry in the driver
    gate: every (purchase, click-of-same-user-within-preceding-hour)
    pair, both sides arriving as streams with bounded join state.

    Unlike stream dedup, the full pair set is arrival-order independent,
    so every output column is deterministic.  The watermark is set wider
    than the data span for the same reason as stream_dedup_exact: parity
    must not depend on availableNow running one micro-batch (state
    evicted between batches would silently drop pairs).  Production use
    keeps purchases_with_last_click_stream's bounded default — at 100 TB
    the watermark IS the state bound."""
    import uuid

    from wukong_spark.streaming import (
        purchases_with_last_click_stream,
        read_events_stream,
        run_to_memory,
    )

    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    sink = f"stream_ivj_{uuid.uuid4().hex[:8]}"
    try:
        # deterministic 1-in-5 user subset: bounds the gate's join state
        # and output while exercising the identical plan (the oracle
        # filters the same subset)
        ev = read_events_stream(spark, sf_dir).filter(F.col("user_id") % 5 == 0)
        j = purchases_with_last_click_stream(
            ev, join_window="1 hour", watermark="3650 days"
        ).select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "purchase_ts",
            "click_id",
            "click_ts",
            F.round(F.col("value") * 10000).cast("long").alias("purchase_value_4"),
        )
        rows = run_to_memory(j, sink, complete=False).collect()
        schema = (
            "purchase_id long, user_id long, purchase_ts timestamp_ntz,"
            " click_id long, click_ts timestamp_ntz, purchase_value_4 long"
        )
        return local_frame(spark, rows, schema)
    finally:
        spark.catalog.dropTempView(sink)
        restore_stream_conf(spark, prev_conf)


@query(
    "stream_stateful_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
               AS sum_value_4
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str):
    """CUSTOM STATEFUL streaming operator (applyInPandasWithState) — the
    fifth batch/stream-parity entry in the driver gate (VERDICT r6 #5):
    per-user running (count, sum) totals maintained in explicit state
    across micro-batches, hash-verified against the batch per-user
    aggregate.

    Determinism recipe: values are integer-scaled BEFORE entering the
    state machine (round(value·10⁴) as a double — exact in float64 far
    beyond any realistic per-user total), so the state sum is
    order-independent integer arithmetic, not order-dependent float
    accumulation.  Update mode emits one running-total row per touched
    key per micro-batch; the final per-user row is selected by max
    n_events (the count is strictly monotone per emission), making the
    result identical whether availableNow ran one micro-batch or many.
    At 100 TB: state is partitioned by user_id in the state store, O(1)
    per key — total state grows with distinct users, not events."""
    import uuid

    from pyspark.sql import Window

    from wukong_spark.streaming import (
        read_events_stream,
        run_to_memory,
        stateful_user_totals,
    )

    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    sink = f"stream_stateful_{uuid.uuid4().hex[:8]}"
    try:
        ev = read_events_stream(spark, sf_dir).select(
            "ts",
            "user_id",
            F.round(F.col("value") * 10000).cast("double").alias("value"),
        )
        st = stateful_user_totals(ev)
        rows = run_to_memory(st, sink, mode="update").collect()
        emitted = local_frame(spark,
            rows, "user_id long, n_events long, sum_value double"
        )
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        return (
            emitted.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                "n_events",
                F.col("sum_value").cast("long").alias("sum_value_4"),
            )
        )
    finally:
        spark.catalog.dropTempView(sink)
        restore_stream_conf(spark, prev_conf)


@query(
    "stream_sliding_1h_30m",
    oracle="""
    WITH cand AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 1800) AS BIGINT) - s.i) * 1800 * 1000000
             ) AS window_start,
             event_type, value
      FROM events e, (SELECT unnest([0, 1]) AS i) s
    )
    SELECT window_start, event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
               AS sum_value_4
    FROM cand GROUP BY window_start, event_type
    """,
)
def stream_sliding_1h_30m(spark: SparkSession, sf_dir: str):
    """STREAMING sliding-window aggregation (1 h window, 30 min slide —
    each event lands in 2 windows), hash-verified against the batch 2-way
    replication — the sixth batch/stream-parity entry in the driver gate.

    Same recipe as stream_tumbling_hourly: bounded availableNow run, a
    2 h watermark finalizes every window once all data is read, so the
    streaming result equals the batch aggregation exactly.  At 100 TB the
    sliding-window state is 2× tumbling's (one open aggregate per
    overlapping window), still bounded by the watermark horizon."""
    import uuid

    from wukong_spark.streaming import (
        read_events_stream,
        run_to_memory,
        windowed_counts,
    )

    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    sink = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    try:
        ev = read_events_stream(spark, sf_dir)
        agg = windowed_counts(ev, window="1 hour", slide="30 minutes")
        rows = run_to_memory(agg, sink).collect()
        schema = (
            "window_start timestamp_ntz, event_type string,"
            " n_events long, sum_value_4 long"
        )
        return local_frame(spark, rows, schema)
    finally:
        spark.catalog.dropTempView(sink)
        restore_stream_conf(spark, prev_conf)


@query(
    "partitioned_scan_prune_check",
    oracle="""
    SELECT user_id % 16 AS user_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_4
    FROM events
    WHERE event_type = 'click'
    GROUP BY user_bucket
    ORDER BY user_bucket
    """,
)
def partitioned_scan_prune_check(spark: SparkSession, sf_dir: str):
    """Partition-pruned layout (r9): rewrite events PARTITIONED BY
    event_type (hive-style directories), then read back filtered to one
    type — the filter resolves at PLANNING time to a directory listing
    (`PartitionFilters` in the scan, pinned in test_plan_shape.py), so
    only ~1/5 of the data is ever opened.  This is the complement of the
    bucketing entry: bucketing kills the join shuffle, partitioning
    kills the scan.  Results hash-check against DuckDB filtering the
    original un-partitioned parquet."""
    from wukong_spark.layout import fs_delete, warehouse_uri

    path = warehouse_uri(spark, "evt_by_type_tmp")
    fs_delete(spark, path)
    # deferred cleanup (VERDICT r15 Next #8): the layout dies with the
    # result at release_pending(), so gate runs leave no warehouse litter
    from wukong_spark.session import register_result_path

    register_result_path(spark, path)
    tbl(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(path)
    e = spark.read.parquet(path).filter(F.col("event_type") == "click")
    return (
        e.groupBy((F.col("user_id") % 16).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long"))
            .cast("long")
            .alias("sum_value_4"),
        )
        .orderBy("user_bucket")
    )


@query(
    "funnel_click_signup_purchase",
    oracle="""
    WITH c AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ), s AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
      WHERE e.event_type = 'signup' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT * FROM (VALUES
      (1, 'click',    (SELECT COUNT(*) FROM c)),
      (2, 'signup',   (SELECT COUNT(*) FROM s)),
      (3, 'purchase', (SELECT COUNT(*) FROM p)))
      AS t(stage, event_type, n_users)
    ORDER BY stage
    """,
)
def funnel_click_signup_purchase(spark: SparkSession, sf_dir: str):
    """ORDERED funnel analysis (r10, product-analytics staple): users
    counted at stage k only if the stage-k event happened strictly
    AFTER their stage-(k−1) entry time — click → signup → purchase.
    Each stage is one groupBy(min ts) + an equi-join back on user_id
    with the time predicate as a join residual; no window over the full
    event stream, no per-user sort.

    100 TB path: every stage shuffles on user_id only (and the stage
    tables shrink monotonically); at cluster scale the three joins
    co-locate on one user_id partitioning."""
    e = tbl(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s = (
        e.filter(F.col("event_type") == "signup")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [c.count(), s.count(), p.count()]
    return local_frame(spark,
        [
            (1, "click", counts[0]),
            (2, "signup", counts[1]),
            (3, "purchase", counts[2]),
        ],
        "stage int, event_type string, n_users bigint",
    ).orderBy("stage")


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS wk
      FROM events e
    )
    SELECT f.cohort AS cohort_week,
           CAST(date_diff('day', f.cohort, a.wk) // 7 AS INT) AS week_k,
           COUNT(*) AS n_active
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY cohort_week, week_k
    ORDER BY cohort_week, week_k
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str):
    """COHORT retention triangle (r10): users grouped by first-activity
    week; n_active = distinct users of cohort c active in week c+k.
    Week buckets via date_trunc('week') (Monday start in BOTH engines,
    kept as timestamps — the comparator's precedent from the daily
    rollup);
    the week offset is an exact day-difference // 7 — both truncated
    stamps are Mondays, so the division is integral and cross-engine
    stable (no engine-specific week-diff semantics involved).

    100 TB path: first-activity table shuffles once on user_id; the
    (user, week) activity set is the DISTINCT of a map-side projection;
    the final agg is over cohort×k — tiny."""
    e = tbl(spark, sf_dir, "events").select("user_id", "ts")
    f = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    a = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        a.join(f, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("int")
            .alias("week_k"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_k")
    )


@query(
    "scd2_user_type_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_t
      FROM events
    ), changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_t IS NULL OR prev_t <> event_type
    ), versioned AS (
      SELECT user_id, event_type AS attr, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS version_n
      FROM changes
    )
    SELECT user_id, CAST(version_n AS BIGINT) AS version_n, attr,
           valid_from,
           COALESCE(valid_to, TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
           (valid_to IS NULL) AS is_current
    FROM versioned
    """,
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str):
    """SCD TYPE-2 dimension build (r10, the warehouse history pattern):
    collapse each user's event stream into attribute VERSIONS — a new
    version opens whenever the tracked attribute (event_type here)
    differs from the previous event — with [valid_from, valid_to)
    intervals and an is_current flag, exactly the row layout a
    slowly-changing dimension table carries.

    One lag pass flags changes, one lead + row_number pass builds the
    intervals — all three windows share the SAME (user_id) partitioning
    and (ts, event_id) order, so Catalyst plans a single shuffle.  The
    open interval's NULL valid_to is COALESCEd to a 2200-01-01 sentinel
    on BOTH engines (the comparator treats NaT ≠ NaT, and pandas
    nanosecond timestamps overflow past 2262 — no 9999-12-31)."""
    e = tbl(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.withColumn(
        "prev_t", F.lag("event_type").over(w)
    ).filter(F.col("prev_t").isNull() | (F.col("prev_t") != F.col("event_type")))
    versioned = changes.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version_n"),
        F.col("event_type").alias("attr"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to_raw"),
    )
    return versioned.select(
        "user_id",
        "version_n",
        "attr",
        "valid_from",
        F.coalesce(
            F.col("valid_to_raw"),
            F.lit("2200-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("valid_to"),
        F.col("valid_to_raw").isNull().alias("is_current"),
    )


@query(
    "incremental_rollup_check",
    # the oracle computes the rollup DIRECTLY over all events; the Spark
    # side maintains it INCREMENTALLY (base view + delta partition,
    # merged by the sum-of-sums identity) — hash equality proves the
    # maintenance step is exact
    oracle="""
    SELECT date_trunc('hour', ts) AS h, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
             AS sum_value_4
    FROM events
    GROUP BY h, event_type
    ORDER BY h, event_type
    """,
)
def incremental_rollup_check(spark: SparkSession, sf_dir: str):
    """INCREMENTAL VIEW MAINTENANCE (r10): the hourly rollup is NOT
    recomputed from all events — the stream splits at the last day
    boundary into the "already materialized" base and the "newly
    ingested" delta partition; the delta's hourly aggregate merges into
    the base view by the reaggregation identity (count → sum of
    counts, sum → sum of sums), exactly how a lakehouse keeps a
    continuous aggregate fresh without touching history.  The oracle
    recomputes the rollup directly over everything — hash equality IS
    the proof that maintenance ≡ recompute.

    100 TB path: the delta is one day of a year-partitioned table; the
    merge touches only the hour×type groups the delta contains, and the
    base view never rescans."""
    e = tbl(spark, sf_dir, "events")
    split = e.agg(F.date_trunc("day", F.max("ts")).alias("s")).collect()[0]["s"]

    def hourly(df):
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long"))
            .cast("long")
            .alias("sum_value_4"),
        )

    base_view = hourly(e.filter(F.col("ts") < F.lit(split)))
    delta_agg = hourly(e.filter(F.col("ts") >= F.lit(split)))
    return (
        base_view.unionByName(delta_agg)
        .groupBy("h", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_4").cast("long").alias("sum_value_4"),
        )
        .orderBy("h", "event_type")
    )


@query(
    "compaction_small_files_check",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
             AS sum_value_4,
           TRUE AS files_reduced,
           TRUE AS sized_to_target
    FROM events
    """,
)
def compaction_small_files_check(spark: SparkSession, sf_dir: str):
    """SMALL-FILES COMPACTION (r10) — the table-maintenance op every
    streaming-ingested lake needs: events land as 64 tiny files (the
    per-trigger micro-batch pattern), then compaction rewrites them
    sized to a byte target — partition count = ceil(bytes / target) —
    in one repartition pass.  Row count and an integer checksum
    hash-check against DuckDB on the ORIGINAL table, proving the
    rewrite is lossless; `files_reduced` pins ≥ 8× fewer files and
    `sized_to_target` pins the output file count to the computed
    target ±1.

    100 TB path: compaction is per table-partition (never a global
    repartition); the byte-targeted partition count is exactly how
    OPTIMIZE jobs size their output, and readers regain
    maxPartitionBytes-aligned scans afterwards."""
    import math

    from wukong_spark.layout import fs_delete, fs_list_files, warehouse_uri

    small_dir = warehouse_uri(spark, "evt_small_tmp")
    big_dir = warehouse_uri(spark, "evt_compact_tmp")
    from wukong_spark.session import register_result_path

    for p in (small_dir, big_dir):
        fs_delete(spark, p)
        register_result_path(spark, p)  # dropped at release_pending()
    e = tbl(spark, sf_dir, "events")
    e.repartition(64).write.mode("overwrite").parquet(small_dir)

    def parquet_files(path: str) -> list[tuple[str, int]]:
        # Hadoop-FS listing (layout.py): (name, bytes) pairs, any scheme
        return fs_list_files(spark, path, suffix=".parquet")

    small_files = parquet_files(small_dir)
    total_bytes = sum(sz for _, sz in small_files)
    target = max(1, math.ceil(total_bytes / (4 * 1024 * 1024)))
    spark.read.parquet(small_dir).repartition(target).write.mode(
        "overwrite"
    ).parquet(big_dir)
    big_files = parquet_files(big_dir)
    out = spark.read.parquet(big_dir).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 10000).cast("long"))
        .cast("long")
        .alias("sum_value_4"),
    ).collect()[0]
    return local_frame(spark,
        [
            (
                int(out["n_rows"]),
                int(out["sum_value_4"]),
                len(big_files) * 8 <= len(small_files),
                abs(len(big_files) - target) <= 1,
            )
        ],
        "n_rows bigint, sum_value_4 bigint, files_reduced boolean,"
        " sized_to_target boolean",
    )


@query(
    "stream_countmin_merge_check",
    # mergeability is EXACT: a Count-Min sketch built by summing
    # per-micro-batch partials must equal the one-pass batch sketch
    # cell for cell (integer counters, order-free addition), so the
    # parity booleans are deterministic
    oracle="""
    SELECT TRUE AS sketches_identical, TRUE AS never_underestimates,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS n_keys,
           (SELECT COUNT(*) FROM events) AS n_rows
    """,
)
def stream_countmin_merge_check(spark: SparkSession, sf_dir: str):
    """SKETCHES ON A STREAM (r10): the Count-Min sketch is built
    micro-batch by micro-batch through a foreachBatch sink — each
    batch contributes a counter-block partial, summed into the running
    sketch — and must equal the one-pass BATCH sketch cell-for-cell:
    integer counters add order-free, which is exactly why sketches are
    the streaming aggregation currency.  The second contract re-checks
    never-underestimates for every distinct key against exact batch
    counts.

    100 TB path: the stream never keeps raw rows — O(w·d) state total
    regardless of stream length — and the same merge works across
    PARALLEL streams (kafka partitions), not just sequential batches."""
    import numpy as np

    from wukong_spark.operators.membership import (
        countmin_build,
        countmin_estimate,
    )
    from wukong_spark.streaming import read_events_stream, run_foreach_batch

    width, depth = 4096, 5
    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    try:
        ev = read_events_stream(spark, sf_dir).select("user_id")
        streamed = np.zeros((depth, width), np.int64)

        def absorb(bdf, _epoch):
            nonlocal streamed
            if bdf.count():
                streamed = streamed + countmin_build(
                    bdf, "user_id", width, depth
                )

        run_foreach_batch(ev, absorb)

        # batch replay INSIDE the snapshot region: tbl(events) pins
        # nanosAsLong for its lazy scan, and the collects below are the
        # last actions that need it — restoring after keeps the entry
        # conf-neutral for the shared session
        e = tbl(spark, sf_dir, "events").select("user_id")
        batch_cms = countmin_build(e, "user_id", width, depth)
        truth = e.groupBy("user_id").count().toPandas()
        ests = countmin_estimate(batch_cms, truth["user_id"], integral=True)
        return local_frame(spark,
            [
                (
                    bool(np.array_equal(streamed, batch_cms)),
                    bool((ests >= truth["count"].to_numpy()).all()),
                    len(truth),
                    int(truth["count"].sum()),
                )
            ],
            "sketches_identical boolean, never_underestimates boolean,"
            " n_keys bigint, n_rows bigint",
        )
    finally:
        restore_stream_conf(spark, prev_conf)


@query(
    "events_value_histogram",
    oracle="""
    SELECT CAST(FLOOR(CAST(ROUND(value * 10000) AS BIGINT) / 250000.0)
                AS BIGINT) AS bin_id,
           COUNT(*) AS n,
           CAST(MIN(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS min_v4,
           CAST(MAX(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT) AS max_v4
    FROM events
    GROUP BY bin_id
    ORDER BY bin_id
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str):
    """Fixed-width HISTOGRAM of the event value distribution (bin width
    25.0, computed in exact integer 1e-4 space so binning is
    cross-engine stable: round → BIGINT → float divide → floor, every
    step identical IEEE in both engines).  One map-side partial
    aggregation — the profiling pass a pipeline runs before choosing
    normalization or outlier gates.

    100 TB path: ~20 bins of state per task regardless of row count;
    the same shape computes per-column profiles for a whole table in
    one pass."""
    e = tbl(spark, sf_dir, "events")
    v4 = F.round(F.col("value") * 10000).cast("long")
    return (
        e.select(v4.alias("v4"))
        .groupBy(F.floor(F.col("v4") / 250000.0).cast("long").alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v4").alias("min_v4"),
            F.max("v4").alias("max_v4"),
        )
        .orderBy("bin_id")
    )


@query(
    "schema_evolution_check",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CASE WHEN o_orderkey % 2 = 1
                THEN ROUND(o_totalprice * 100) ELSE -1 END AS BIGINT)
             AS price_cents
    FROM orders ORDER BY o_orderkey
    """,
)
def schema_evolution_check(spark: SparkSession, sf_dir: str):
    """SCHEMA EVOLUTION on read (r11) — the ingest reality every
    long-lived corpus hits: older parquet files lack columns newer ones
    carry.  Half of orders is written with a v1 schema (orderkey,
    custkey), the other half with v2 (+ price_cents); one
    `mergeSchema=true` read unifies them — v1 rows surface NULL for the
    added column (COALESCEd to a -1 sentinel for the hash), v2 rows keep
    their values.  Every row hash-matches the oracle computing the same
    merge directly from the original table.

    100 TB path: mergeSchema's footer reconciliation is a planning-time
    cost over file metadata only; the data files are never rewritten —
    the alternative (rewrite the corpus on every column add) is exactly
    what evolution-on-read exists to avoid."""
    from wukong_spark.layout import fs_delete, warehouse_uri

    path = warehouse_uri(spark, "orders_evolved_tmp")
    fs_delete(spark, path)
    from wukong_spark.session import register_result_path

    register_result_path(spark, path)  # dropped at release_pending()
    o = tbl(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_custkey")
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    v1.write.mode("overwrite").parquet(path)
    v2.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return merged.select(
        "o_orderkey",
        "o_custkey",
        F.coalesce(F.col("price_cents"), F.lit(-1)).cast("long").alias(
            "price_cents"
        ),
    ).orderBy("o_orderkey")


@query(
    "format_roundtrip_check",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
             AS sum_value_4,
           COUNT(DISTINCT user_id) AS n_users,
           TRUE AS csv_roundtrip_exact,
           TRUE AS json_roundtrip_exact,
           TRUE AS orc_roundtrip_exact
    FROM events
    """,
)
def format_roundtrip_check(spark: SparkSession, sf_dir: str):
    """FORMAT FIDELITY through the source/sink surface (r10, ORC added
    r11): events write out as CSV (header + ISO timestamps), JSONL, and
    ORC (typed columnar — Spark-native, the schema rides in the file),
    read back through `sources.read_any` with an explicit schema, and
    every copy must reproduce the parquet original EXACTLY — row count, integer
    value checksum, and per-row md5 over the (event_id, user_id,
    event_type, value-in-1e-4) tuple, compared as full set equality via
    exceptAll in-plan.  Timestamps round-trip at microsecond precision
    via an explicit format (CSV has no type system; the schema is the
    contract).

    100 TB path: text formats cost ~5-10× parquet scan time and lose
    pushdown/pruning — this entry exists because ingest corpora arrive
    as CSV/JSONL anyway, and the fidelity contract is what lets the
    pipeline normalize them to parquet once and trust it."""
    from wukong_spark.layout import fs_delete, warehouse_uri
    from wukong_spark.sources import read_any

    csv_dir = warehouse_uri(spark, "evt_csv_tmp")
    json_dir = warehouse_uri(spark, "evt_json_tmp")
    orc_dir = warehouse_uri(spark, "evt_orc_tmp")
    from wukong_spark.session import register_result_path

    for p in (csv_dir, json_dir, orc_dir):
        fs_delete(spark, p)
        register_result_path(spark, p)  # dropped at release_pending()
    e = tbl(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
    )
    e.write.mode("overwrite").option("header", "true").csv(csv_dir)
    e.write.mode("overwrite").json(json_dir)
    e.write.mode("overwrite").orc(orc_dir)
    schema = (
        "event_id long, user_id long, event_type string, v4 long, ts_s string"
    )
    back_csv = read_any(spark, csv_dir, "csv", schema=schema, header=True)
    back_json = read_any(spark, json_dir, "json", schema=schema)
    back_orc = read_any(spark, orc_dir, "orc")

    def fingerprint(df):
        return df.select(
            F.md5(
                F.concat_ws(
                    "|", "event_id", "user_id", "event_type", "v4", "ts_s"
                )
            ).alias("h")
        )

    csv_ok = (
        fingerprint(e).exceptAll(fingerprint(back_csv)).count() == 0
        and back_csv.count() == e.count()
    )
    json_ok = (
        fingerprint(e).exceptAll(fingerprint(back_json)).count() == 0
        and back_json.count() == e.count()
    )
    orc_ok = (
        fingerprint(e).exceptAll(fingerprint(back_orc)).count() == 0
        and back_orc.count() == e.count()
    )
    stats = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v4").alias("s"),
        F.countDistinct("user_id").alias("u"),
    ).collect()[0]
    return local_frame(spark,
        [
            (
                int(stats["n"]), int(stats["s"]), int(stats["u"]),
                csv_ok, json_ok, orc_ok,
            )
        ],
        "n_rows bigint, sum_value_4 bigint, n_users bigint,"
        " csv_roundtrip_exact boolean, json_roundtrip_exact boolean,"
        " orc_roundtrip_exact boolean",
    )


@query(
    "csv_malformed_ingest_check",
    # both engines derive the expectation from the same construction
    # rules over range(): every 7th line is broken, the rest carry
    # id, id*13%1000 — so counts and checksums are pure arithmetic
    oracle="""
    WITH r AS (SELECT unnest(range(0, 2000)) AS id)
    SELECT
      (SELECT COUNT(*) FROM r WHERE id % 7 <> 0) AS n_good,
      (SELECT COUNT(*) FROM r WHERE id % 7 = 0) AS n_corrupt,
      (SELECT CAST(SUM(id * 13 % 1000) AS BIGINT) FROM r WHERE id % 7 <> 0)
        AS sum_v_good,
      TRUE AS corrupt_rows_preserved
    """,
)
def csv_malformed_ingest_check(spark: SparkSession, sf_dir: str):
    """MALFORMED-ROW CSV ingest (r11) — the reality of text-format
    corpora: some lines are broken, and the pipeline must COUNT and
    QUARANTINE them, not die or silently drop.  A generated CSV where
    every 7th line is garbage (wrong arity / non-numeric) is read in
    PERMISSIVE mode with a corrupt-record column: good rows parse with
    exact values, broken rows land in the quarantine column with their
    RAW TEXT PRESERVED (the re-processing contract).

    The good-row checksum and both counts hash-match pure arithmetic
    over the construction rules; corrupt_rows_preserved verifies every
    quarantined line is the verbatim input text.

    100 TB path: permissive parse is map-side; the quarantine column
    prunes away when unselected, and the bad-row lane is what feeds a
    dead-letter sink instead of failing a 12-hour job."""
    from wukong_spark.layout import fs_delete, warehouse_uri

    path = warehouse_uri(spark, "csv_malformed_tmp")
    fs_delete(spark, path)
    from wukong_spark.session import register_result_path

    register_result_path(spark, path)  # dropped at release_pending()
    n = 2000
    lines = spark.range(0, n, 1, 4).select(
        F.when(
            F.col("id") % 7 == 0,
            F.concat(F.lit("broken|"), F.col("id").cast("string")),
        )
        .otherwise(
            F.concat_ws(
                ",",
                F.col("id").cast("string"),
                (F.col("id") * 13 % 1000).cast("string"),
            )
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(path)
    df = (
        spark.read.schema("id long, v long, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    ).cache()
    good = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    stats = good.agg(
        F.count(F.lit(1)).alias("n_good"), F.sum("v").alias("sum_v")
    ).collect()[0]
    # quarantined lines must be the verbatim input text ("broken|<id>")
    preserved = bad.filter(~F.col("_corrupt").startswith("broken|")).count()
    n_bad = bad.count()
    df.unpersist()
    return local_frame(spark,
        [(int(stats["n_good"]), int(n_bad), int(stats["sum_v"]), preserved == 0)],
        "n_good bigint, n_corrupt bigint, sum_v_good bigint,"
        " corrupt_rows_preserved boolean",
    )


@query(
    "stream_cms_heavy_hitters_check",
    oracle="""
    SELECT user_id, event_type FROM events
    GROUP BY user_id, event_type HAVING COUNT(*) >= 18
    """,
)
def stream_cms_heavy_hitters_check(spark: SparkSession, sf_dir: str):
    """STREAMING HEAVY HITTERS with bounded sketch state (r12) — each
    (user_id, event_type) key emits EXACTLY ONCE, the first time its
    running total reaches 18, from
    `streaming.cms_heavy_hitters_stream`: per-bucket state is one
    Count-Min sketch (5×4096 int64) plus one emitted-keys Bloom, both
    fixed size — an unbounded stream with unbounded key cardinality
    carries O(sketch) state, never O(keys).

    Parity contract vs batch HAVING COUNT(*) >= 18: the emitted key set
    is arrival-order independent (final totals don't depend on batch
    splits; the Bloom's no-false-negative guarantee makes emission
    exactly-once), CMS can only over-count so no qualifying key is
    missed, and a spurious emission needs a key colliding in all 5
    sketch rows — width 8192 against ~1.4k keys gives
    (1.4k/8192)⁵ ≈ 1.5e-4 per key, the membership.py sizing discipline.
    Counts are not emitted: an estimate at crossing time is
    split-dependent; the key set is the deterministic contract."""
    import uuid

    from wukong_spark.streaming import (
        cms_heavy_hitters_stream,
        read_events_stream,
        run_to_memory,
    )

    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    sink = f"stream_cmshh_{uuid.uuid4().hex[:8]}"
    try:
        ev = read_events_stream(spark, sf_dir).select("user_id", "event_type")
        d = cms_heavy_hitters_stream(
            ev, ["user_id", "event_type"], threshold=18, width=8192
        )
        rows = run_to_memory(d, sink, mode="update").collect()
        return local_frame(spark, rows, "user_id long, event_type string")
    finally:
        spark.catalog.dropTempView(sink)
        restore_stream_conf(spark, prev_conf)


@query(
    "events_exact_quantiles",
    # identical integer index arithmetic both sides: 0-based rank
    # idx = ((n-1) * p) // 100 over value_4 ascending; with ties the
    # value at any rank is the sorted multiset's value — order-free
    oracle="""
    WITH v AS (
      SELECT CAST(ROUND(value * 10000) AS BIGINT) AS value_4 FROM events
    ), o AS (
      SELECT value_4, ROW_NUMBER() OVER (ORDER BY value_4) - 1 AS rid FROM v
    ), nn AS (SELECT COUNT(*) AS n FROM v),
    spec AS (SELECT * FROM (VALUES (25), (50), (75), (90), (99)) AS s(p))
    SELECT s.p AS p_pct, o.value_4 AS q_value_4
    FROM spec s
    JOIN nn ON TRUE
    JOIN o ON o.rid = ((nn.n - 1) * s.p) // 100
    ORDER BY p_pct
    """,
)
def events_exact_quantiles(spark: SparkSession, sf_dir: str):
    """EXACT distributed quantiles WITHOUT a single-partition sort (r12)
    — p25/p50/p75/p90/p99 of the event value as discrete order
    statistics: rank idx = ⌊(n−1)·p⌋ over the globally-numbered sort
    order from `operators.setindex.global_row_number` (range exchange +
    per-partition sort + broadcast prefix offsets — the plan that
    scales where `ROW_NUMBER() OVER (ORDER BY ...)`'s Exchange
    SinglePartition dies; pinned in test_plan_shape.py for the
    numbering operator).

    `percentile_approx` is the usual streaming answer but its sketch is
    implementation-defined (no cross-engine oracle); DISCRETE order
    statistics on the integer value_4 are exact and engine-portable —
    with duplicate values the value AT a rank is determined by the
    sorted multiset alone, so tie order is irrelevant.  The probe set
    joins as 5 broadcast rows; driver traffic beyond that is one scalar
    count plus n_partitions offsets."""
    from wukong_spark.operators.setindex import global_row_number

    v = tbl(spark, sf_dir, "events").select(
        F.round(F.col("value") * 10000).cast("long").alias("value_4")
    )
    numbered = global_row_number(v, "value_4", n_partitions=32, out_col="rid")
    n = v.count()
    spec = local_frame(spark,
        [(p, (n - 1) * p // 100) for p in (25, 50, 75, 90, 99)],
        "p_pct int, rid long",
    )
    return (
        numbered.join(F.broadcast(spec), "rid")
        .select("p_pct", F.col("value_4").alias("q_value_4"))
        .orderBy("p_pct")
    )


@query(
    "stream_static_enrich_check",
    oracle="""
    SELECT c.c_nationkey AS nationkey, e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(e.value * 10000) AS BIGINT)) AS BIGINT)
             AS sum_value_4
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_nationkey, e.event_type
    """,
)
def stream_static_enrich_check(spark: SparkSession, sf_dir: str):
    """STREAM-STATIC dimension enrichment (r12) — the most common
    production streaming shape: an unbounded fact stream joined to a
    static dimension snapshot (events → customer → nation rollup).
    Spark plans this as a BROADCAST of the static side into every
    micro-batch — no stream state at all (unlike stream-stream joins,
    there is nothing to buffer: the dimension is a local hash table),
    so the join adds zero to the state store and re-snapshots the
    dimension per batch.

    Batch/stream parity: the aggregated rollup over the whole stream
    (complete output mode) must hash-match the batch join+agg — the
    fifth batch/stream-parity entry in the gate family."""
    import uuid

    from wukong_spark.streaming import read_events_stream, run_to_memory

    from wukong_spark.streaming import (
        restore_stream_conf,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    sink = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    try:
        ev = read_events_stream(spark, sf_dir).select(
            "user_id",
            "event_type",
            F.round(F.col("value") * 10000).cast("long").alias("value_4"),
        )
        cust = tbl(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_nationkey").alias("nationkey"),
        )
        joined = (
            ev.join(F.broadcast(cust), "user_id")
            .groupBy("nationkey", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value_4").alias("sum_value_4"),
            )
        )
        rows = run_to_memory(joined, sink, complete=True).collect()
        return local_frame(spark,
            rows,
            "nationkey long, event_type string, n_events long, sum_value_4 long",
        )
    finally:
        spark.catalog.dropTempView(sink)
        restore_stream_conf(spark, prev_conf)


@query(
    "events_gap_fill_locf",
    # identical spine + identical LAST_VALUE IGNORE NULLS window framing
    # in both engines; carried values are exact BIGINTs
    oracle="""
    WITH b AS (
      SELECT event_type,
             make_timestamp(
               (CAST(floor(epoch(ts) / 3600) AS BIGINT)) * 3600 * 1000000
             ) AS bucket,
             CAST(ROUND(value * 10000) AS BIGINT) AS v4
      FROM events
    ),
    agg AS (
      SELECT event_type, bucket, CAST(SUM(v4) AS BIGINT) AS sv4 FROM b
      GROUP BY event_type, bucket
    ),
    bounds AS (SELECT MIN(bucket) AS mn, MAX(bucket) AS mx FROM agg),
    spine AS (
      SELECT t.event_type, s.bucket
      FROM (SELECT DISTINCT event_type FROM b) t
      CROSS JOIN (
        SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
        FROM bounds
      ) s
    ),
    joined AS (
      SELECT sp.event_type, sp.bucket, a.sv4
      FROM spine sp LEFT JOIN agg a
        ON a.event_type = sp.event_type AND a.bucket = sp.bucket
    )
    SELECT event_type, bucket,
           COALESCE(last_value(sv4 IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0) AS filled_sum_value_4,
           (sv4 IS NULL) AS was_gap
    FROM joined ORDER BY event_type, bucket
    """,
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str):
    """GAP FILL with LAST-OBSERVATION-CARRIED-FORWARD (r12) — the other
    half of time-series regularization next to `events_resample_5m`'s
    zero-fill: empty (event_type, hour) buckets inherit the most recent
    observed hourly sum via `last(..., ignorenulls=True)` over an
    UNBOUNDED PRECEDING row frame — pandas `ffill` semantics, the shape
    sensor/metrics pipelines run constantly.

    Plan: one keyed bucket aggregation; the spine is event_types ×
    sequence(min, max, 1 hour) exploded off a 1-row bounds agg (never a
    driver loop); the forward-fill window partitions by event_type so
    each series sorts independently — no global sort, no single
    partition.  Carried values are exact BIGINTs; `was_gap` marks
    synthesized rows.  Leading gaps before a series' first observation
    COALESCE to 0 in both engines."""
    # F.window buckets NTZ timestamps natively — epoch arithmetic
    # (unix_timestamp/timestamp_seconds) shifts by the session tz on the
    # driver's non-UTC session (the events_resample_5m lesson)
    et = tbl(spark, sf_dir, "events").select(
        "event_type",
        F.window("ts", "1 hour").getField("start").alias("bucket"),
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    agg = et.groupBy("event_type", "bucket").agg(F.sum("v4").alias("sv4"))
    bounds = agg.agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    spine = (
        et.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(bounds).select(
                F.explode(
                    F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
                ).alias("bucket")
            )
        )
    )
    joined = spine.join(agg, ["event_type", "bucket"], "left")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "bucket",
        F.coalesce(F.last("sv4", ignorenulls=True).over(w), F.lit(0)).alias(
            "filled_sum_value_4"
        ),
        F.col("sv4").isNull().alias("was_gap"),
    ).orderBy("event_type", "bucket")


@query(
    "events_grouped_median_mad",
    # discrete order statistics per group with one shared index
    # convention (0-based rank = (cnt-1) DIV 2, the lower median) —
    # exact BIGINTs end to end, tie order irrelevant
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 10000) AS BIGINT) AS v4
      FROM events
    ), r AS (
      SELECT event_type, v4,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v4) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM v
    ), med AS (
      SELECT event_type, v4 AS median_4, cnt FROM r
      WHERE rn = (cnt - 1) // 2
    ), dev AS (
      SELECT v.event_type, ABS(v.v4 - m.median_4) AS d
      FROM v JOIN med m ON m.event_type = v.event_type
    ), rd AS (
      SELECT event_type, d,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM dev
    )
    SELECT m.event_type, m.cnt AS n, m.median_4, rd.d AS mad_4
    FROM med m JOIN rd ON rd.event_type = m.event_type
    WHERE rd.rn = (rd.cnt - 1) // 2
    ORDER BY m.event_type
    """,
)
def events_grouped_median_mad(spark: SparkSession, sf_dir: str):
    """GROUPED ROBUST STATISTICS (r12) — per-event-type median and MAD
    (median absolute deviation) as exact DISCRETE order statistics on
    the integer value_4: the outlier-resistant describe() every
    monitoring pipeline wants where mean/stddev are skew-blind.  Lower-
    median convention (0-based rank (cnt−1) DIV 2) shared by both
    engines; with duplicate values the value AT a rank is the sorted
    multiset's, so tie order is irrelevant and the result is exact —
    no percentile_approx sketch, no float.

    Plan: two ranked passes (values, then absolute deviations from the
    broadcast per-group medians), each one hash-partitioned window per
    group — groups sort independently, no global sort.  At 100 TB a
    heavy single group bounds the partition (the known window-skew
    shape; the salting lever applies if one group dominates)."""
    from pyspark.sql.window import Window

    v = tbl(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 10000).cast("long").alias("v4")
    )
    w = Window.partitionBy("event_type").orderBy("v4")
    r = v.select(
        "event_type",
        "v4",
        (F.row_number().over(w) - 1).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("cnt"),
    )
    med = r.filter(F.col("rn") == F.expr("(cnt - 1) DIV 2")).select(
        "event_type", F.col("v4").alias("median_4"), "cnt"
    )
    dev = v.join(F.broadcast(med.select("event_type", "median_4")), "event_type").select(
        "event_type", F.abs(F.col("v4") - F.col("median_4")).alias("d")
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    rd = dev.select(
        "event_type",
        "d",
        (F.row_number().over(wd) - 1).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("cnt"),
    )
    mad = rd.filter(F.col("rn") == F.expr("(cnt - 1) DIV 2")).select(
        "event_type", F.col("d").alias("mad_4")
    )
    return (
        med.join(mad, "event_type")
        .select("event_type", F.col("cnt").alias("n"), "median_4", "mad_4")
        .orderBy("event_type")
    )


@query(
    "stream_merge_upsert_sink",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
             AS sum_value_4
    FROM events GROUP BY user_id
    """,
)
def stream_merge_upsert_sink(spark: SparkSession, sf_dir: str):
    """STREAMING MERGE-UPSERT SINK (r12; bucketed r15 — VERDICT r14
    item 2): each micro-batch's per-user aggregates MERGE into a keyed
    HASH-BUCKETED parquet state table via foreachBatch
    (`streaming.BucketedUpsertState`: matched keys accumulate, new keys
    insert).  The source is the events table split into 4 files
    streamed one per trigger, so ≥4 real merge rounds run and the final
    table must equal the batch aggregation — upsert idempotence +
    accumulation correctness in one contract.

    100 TB path: each round broadcasts the batch DELTA aggregate
    (small) and rewrites ONLY the bucket partitions its keys hash to —
    bytes written per batch ∝ touched buckets, never total state
    (pinned in tests/test_streaming.py).  With Delta/Iceberg this
    becomes MERGE INTO; the bucketed layout and join shape carry over
    unchanged."""
    import tempfile
    import uuid

    from wukong_spark.streaming import (
        BucketedUpsertState,
        read_events_dir_stream,
        restore_stream_conf,
        run_foreach_batch,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    work = tempfile.mkdtemp(prefix=f"stream_merge_{uuid.uuid4().hex[:8]}-")
    src = f"{work}/src"
    state = BucketedUpsertState(spark, f"{work}/state", "user_id", n_buckets=8)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        raw.repartition(4).write.parquet(src)

        stream = read_events_dir_stream(spark, src, max_files_per_trigger=1)

        def merge(bdf, epoch_id):
            state.merge(
                bdf.groupBy("user_id").agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum(
                        F.round(F.col("value") * 10000).cast("long")
                    ).alias("sum_value_4"),
                )
            )

        epochs = run_foreach_batch(
            stream.select("user_id", "value"), merge
        )
        assert len(epochs) >= 4, f"expected >=4 micro-batches, got {epochs}"
        rows = state.read().collect()
        return local_frame(spark,
            rows, "user_id long, n_events long, sum_value_4 long"
        )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        restore_stream_conf(spark, prev_conf)


@query(
    "stream_lakehouse_commit_sink",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
             AS sum_value_4
    FROM events GROUP BY user_id
    """,
)
def stream_lakehouse_commit_sink(spark: SparkSession, sf_dir: str):
    """STREAMING SINK INTO THE SNAPSHOT TABLE FORMAT (r16): each
    micro-batch's per-user aggregates land as ONE atomic MERGE-ON-READ
    commit on `tableformat.SnapshotStateTable` via foreachBatch — the
    foreachBatch→Delta-MERGE idiom on the jar-less table format.  The
    events table streams as ≥4 file-per-trigger batches, so ≥5 snapshots
    commit (base none — first batch creates v0) and a reader between any
    two commits sees a consistent snapshot (manifest isolation, pinned in
    tests/test_tableformat.py); the HEAD must equal the batch aggregation.

    100 TB path: per batch the commit writes O(delta) files + one
    manifest; read-side merge cost is bounded by the closing compact()
    (exactly a streaming ingest pipeline's compactor cadence)."""
    import shutil
    import tempfile
    import uuid

    from wukong_spark.streaming import (
        read_events_dir_stream,
        restore_stream_conf,
        run_foreach_batch,
        snapshot_stream_conf,
    )
    from wukong_spark.tableformat import SnapshotStateTable

    prev_conf = snapshot_stream_conf(spark)
    work = tempfile.mkdtemp(prefix=f"stream_lake_{uuid.uuid4().hex[:8]}-")
    src = f"{work}/src"
    t = SnapshotStateTable(spark, f"{work}/t", "user_id", n_buckets=8)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        raw.repartition(4).write.parquet(src)

        stream = read_events_dir_stream(spark, src, max_files_per_trigger=1)

        def commit(bdf, epoch_id):
            t.merge(
                bdf.groupBy("user_id").agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum(
                        F.round(F.col("value") * 10000).cast("long")
                    ).alias("sum_value_4"),
                )
            )

        epochs = run_foreach_batch(stream.select("user_id", "value"), commit)
        assert len(epochs) >= 4, f"expected >=4 micro-batches, got {epochs}"
        assert len(t.history()) >= 4, t.history()
        t.compact()  # the ingest compactor step; rows must be unchanged
        rows = t.read().collect()
        return local_frame(spark,
            rows, "user_id long, n_events long, sum_value_4 long"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        restore_stream_conf(spark, prev_conf)


@query(
    "stream_upsert_latest_sink",
    # last-write-wins BY EVENT TIME: the converged state must equal the
    # global per-user argmax over (ts, event_id) no matter how events
    # were split across micro-batches — the combine is an associative
    # argmax, which is exactly what makes it SQL-checkable
    oracle="""
    WITH r AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 10000) AS BIGINT) AS value_4,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rk
      FROM events
    )
    SELECT user_id, ts AS last_ts, event_id AS last_event_id, value_4
    FROM r WHERE rk = 1 ORDER BY user_id
    """,
)
def stream_upsert_latest_sink(spark: SparkSession, sf_dir: str):
    """STREAMING LATEST-STATE SINK (r15) — the other half of lakehouse
    MERGE next to the accumulate sink: last-write-wins BY EVENT TIME
    (CDC latest-state / SCD-1).  Each micro-batch reduces to one row
    per user (argmax over the (ts, event_id) total order), then
    `BucketedUpsertState(mode="latest", order_col=struct(ts,event_id))`
    keeps whichever of {state, delta} carries the larger order value.
    Because the combine is an associative argmax, OUT-OF-ORDER
    micro-batches converge to the same state as a global argmax — which
    is what lets a SQL oracle check a streaming sink at all.  The
    source is the events table split into 4 files streamed one per
    trigger, so ≥4 real merge rounds run.

    100 TB path: identical to the accumulate sink — delta broadcasts,
    only touched bucket partitions are read and swapped; state bytes
    per batch ∝ touched buckets (pinned in tests/test_streaming.py for
    the shared class)."""
    import tempfile
    import uuid

    from wukong_spark.streaming import (
        BucketedUpsertState,
        read_events_dir_stream,
        restore_stream_conf,
        run_foreach_batch,
        snapshot_stream_conf,
    )

    prev_conf = snapshot_stream_conf(spark)
    work = tempfile.mkdtemp(prefix=f"stream_latest_{uuid.uuid4().hex[:8]}-")
    src = f"{work}/src"
    state = BucketedUpsertState(
        spark, f"{work}/state", "user_id", n_buckets=8,
        mode="latest", order_col="ord",
    )
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        raw.repartition(4).write.parquet(src)

        stream = read_events_dir_stream(spark, src, max_files_per_trigger=1)

        def merge(bdf, epoch_id):
            state.merge(
                bdf.groupBy("user_id").agg(
                    F.max(
                        F.struct(
                            F.col("ts").alias("ts"),
                            F.col("event_id").alias("event_id"),
                        )
                    ).alias("ord"),
                    F.max_by(
                        F.round(F.col("value") * 10000).cast("long"),
                        F.struct(F.col("ts"), F.col("event_id")),
                    ).alias("value_4"),
                )
            )

        epochs = run_foreach_batch(
            stream.select("user_id", "ts", "event_id", "value"), merge
        )
        assert len(epochs) >= 4, f"expected >=4 micro-batches, got {epochs}"
        rows = (
            state.read()
            .select(
                "user_id",
                F.col("ord.ts").cast("timestamp_ntz").alias("last_ts"),
                F.col("ord.event_id").alias("last_event_id"),
                "value_4",
            )
            .collect()
        )
        return local_frame(spark,
            rows,
            "user_id long, last_ts timestamp_ntz, last_event_id long,"
            " value_4 long",
        ).orderBy("user_id")
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        restore_stream_conf(spark, prev_conf)


@query(
    "events_transition_matrix",
    # per-user event-type bigrams in ts order (event_id breaks ts ties —
    # both engines order identically), integer counts + round-6 rows
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ), c AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ), tot AS (
      SELECT prev_type, SUM(n) AS row_n FROM c GROUP BY prev_type
    )
    SELECT c.prev_type, c.next_type, c.n,
           ROUND(CAST(c.n AS DOUBLE) / CAST(t.row_n AS DOUBLE), 6) AS p_6
    FROM c JOIN tot t ON t.prev_type = c.prev_type
    ORDER BY c.prev_type, c.next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str):
    """EVENT-SEQUENCE TRANSITION MATRIX (r12) — the first-order Markov
    view of user journeys: per-user event streams ordered by (ts,
    event_id) — the unique tiebreak both engines share — yield
    (prev → next) bigrams, aggregated to exact integer counts and
    row-normalized transition probabilities (one double division on
    exact BIGINTs, round-6).

    Plan: one user_id-keyed window (users sort independently — no
    global sort), one keyed count, a |event_types|-row totals broadcast.
    At 100 TB the window partitions by user — millions of small
    sequences, the friendly skew shape — and the matrix itself is
    |types|² rows regardless of corpus size."""
    from pyspark.sql.window import Window

    e = tbl(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return (
        c.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("row_n").cast("double"), 6
            ).alias("p_6"),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "events_cusum_changepoints",
    # CUSUM kept in PURE INTEGERS: C_t = Σ_{i<=t} (n*s_i − S) where s_i
    # is the hourly sum, S the total, n the hour count — zero float until
    # nothing (none at all); the flag compares integers to an integer
    # threshold scaled the same way
    oracle="""
    WITH b AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 3600) AS BIGINT)) * 3600 * 1000000
             ) AS bucket,
             CAST(ROUND(value * 10000) AS BIGINT) AS v4
      FROM events
    ), h AS (
      SELECT bucket, CAST(SUM(v4) AS BIGINT) AS s FROM b GROUP BY bucket
    ), tot AS (
      SELECT COUNT(*) AS n, CAST(SUM(s) AS BIGINT) AS total FROM h
    ), c AS (
      SELECT h.bucket, h.s,
             CAST(SUM(t.n * h.s - t.total) OVER (
               ORDER BY h.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cusum_scaled,
             t.n, t.total
      FROM h CROSS JOIN tot t
    )
    SELECT bucket, s AS hourly_sum_4, cusum_scaled,
           ABS(CAST(cusum_scaled AS DOUBLE))
             > 50.0 * CAST(n AS DOUBLE) * CAST(total AS DOUBLE) / 100.0
             AS flagged
    FROM c ORDER BY bucket
    """,
)
def events_cusum_changepoints(spark: SparkSession, sf_dir: str):
    """CUSUM CHANGE DETECTION over the hourly value series (r12) — the
    classic mean-shift detector every metrics pipeline runs: the
    cumulative sum of deviations from the global mean, kept in PURE
    INTEGERS by scaling (C_t = Σ n·s_i − S instead of Σ s_i − S/n), so
    the statistic is exact in both engines.  Only the FLAG (|C| above
    50 % of n·S/100) is computed in double — n·S overflows int64 at
    100 TB per-series totals, and a comparison tolerates double.

    Plan: one keyed hourly aggregation, a 1-row totals broadcast, then
    the running sum via `operators/setindex.global_cumsum` (r14) — a
    range exchange on bucket + broadcast prefix offsets, never an
    Exchange SinglePartition window.  At scale a per-metric CUSUM adds
    the series key to the grouping and range keys; the machinery is
    identical."""
    b = tbl(spark, sf_dir, "events").select(
        F.window("ts", "1 hour").getField("start").alias("bucket"),
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    h = b.groupBy("bucket").agg(F.sum("v4").alias("s"))
    tot = h.agg(F.count(F.lit(1)).alias("n"), F.sum("s").alias("total"))
    # running sum via global_cumsum's range-exchange pattern (r14,
    # plan-audit 1pw rule) — the hourly series is one row per bucket,
    # but a SUM OVER (ORDER BY) window would still plan an Exchange
    # SinglePartition; the rank-cut machinery removes the class
    from wukong_spark.operators.setindex import global_cumsum

    dev = h.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "s",
        (F.col("n") * F.col("s") - F.col("total")).alias("__dev"),
        "n",
        "total",
    )
    c = global_cumsum(
        dev, "__dev", "bucket", n_partitions=16, out_col="cusum_scaled"
    )
    return c.select(
        "bucket",
        F.col("s").alias("hourly_sum_4"),
        "cusum_scaled",
        (
            # threshold in DOUBLE: 50 * n * total as int64 wraps silently
            # at 100 TB per-series totals while DuckDB promotes to
            # HUGEINT (r12 verdict item 4) — the flag is a comparison,
            # not an exact artifact, so double is the right domain.
            F.abs(F.col("cusum_scaled").cast("double"))
            > F.lit(50.0)
            * F.col("n").cast("double")
            * F.col("total").cast("double")
            / F.lit(100.0)
        ).alias("flagged"),
    ).orderBy("bucket")


@query(
    "events_seasonal_naive_error",
    # seasonal-naive baseline (predict this hour = same hour yesterday):
    # errors are exact integer |s_h - s_{h-24}|; the lag is a KEYED
    # self-join on bucket = bucket - 24h, not a window — scale-safe and
    # engine-exact; MAE/bias emitted as one rounded division of exact
    # ints
    oracle="""
    WITH b AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 3600) AS BIGINT)) * 3600 * 1000000
             ) AS bucket,
             CAST(ROUND(value * 10000) AS BIGINT) AS v4
      FROM events
    ), h AS (
      SELECT bucket, CAST(SUM(v4) AS BIGINT) AS s FROM b GROUP BY bucket
    ), j AS (
      SELECT cur.bucket, cur.s, prev.s AS s_lag
      FROM h cur JOIN h prev
        ON prev.bucket = cur.bucket - INTERVAL 24 HOURS
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(ABS(s - s_lag)) AS BIGINT) AS abs_err_4,
           CAST(SUM(s - s_lag) AS BIGINT) AS bias_4,
           CAST(MAX(ABS(s - s_lag)) AS BIGINT) AS max_err_4,
           ROUND(CAST(SUM(ABS(s - s_lag)) AS DOUBLE) / COUNT(*), 4)
             AS mae_4
    FROM j
    """,
)
def events_seasonal_naive_error(spark: SparkSession, sf_dir: str):
    """SEASONAL-NAIVE FORECAST ERROR (r14) — the baseline every
    forecasting system must beat (and the MASE denominator): predict
    each hour's value as the SAME HOUR YESTERDAY and score |actual −
    predicted| over all scoreable hours.  Exact scaled integers end to
    end; MAE is one rounded division.

    Plan: one keyed hourly agg, then the 24-hour lag as a KEYED
    SELF-JOIN on bucket = bucket − 24h — the join-instead-of-lag
    pattern: a LAG window over the series would plan an unpartitioned
    Window (the 1pw class) while the shifted equi-join shuffles only
    (bucket, sum) rows on the join key.  Hours with no prior-day
    counterpart drop out (inner join) in both engines.  At scale a
    per-series error adds the series key to both the agg and join
    keys."""
    b = tbl(spark, sf_dir, "events").select(
        F.window("ts", "1 hour").getField("start").alias("bucket"),
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    h = b.groupBy("bucket").agg(F.sum("v4").alias("s"))
    prev = h.select(
        (F.col("bucket") + F.expr("INTERVAL 24 HOURS")).alias("bucket"),
        F.col("s").alias("s_lag"),
    )
    j = h.join(prev, "bucket")
    return j.agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(F.abs(F.col("s") - F.col("s_lag")))
        .cast("long")
        .alias("abs_err_4"),
        F.sum(F.col("s") - F.col("s_lag")).cast("long").alias("bias_4"),
        F.max(F.abs(F.col("s") - F.col("s_lag")))
        .cast("long")
        .alias("max_err_4"),
        F.round(
            F.sum(F.abs(F.col("s") - F.col("s_lag"))).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mae_4"),
    )


@query(
    "events_trailing_wau",
    # trailing 7-day distinct users per day (the WAU rollup), EXACT:
    # each (day, user) pair is fanned to the 7 target days it supports
    # (a bounded explode — never an unbounded range join), then one
    # distinct-count per target day; target days clipped to the data's
    # max so both engines score the same spine
    oracle="""
    WITH p AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ), mx AS (
      SELECT MAX(d) AS mxd FROM p
    ), fan AS (
      SELECT p.d + CAST(x.i AS INTEGER) AS target_d, p.user_id
      FROM p CROSS JOIN (SELECT unnest(range(0, 7)) AS i) x
    )
    SELECT CAST(target_d AS TIMESTAMP) AS target_d,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM fan, mx
    WHERE target_d <= mx.mxd
    GROUP BY target_d ORDER BY target_d
    """,
)
def events_trailing_wau(spark: SparkSession, sf_dir: str):
    """TRAILING 7-DAY ACTIVE USERS (r14) — the DAU/WAU/MAU rollup every
    product warehouse materializes: for each day, the EXACT count of
    distinct users active in the trailing 7-day window.

    Plan: dedup to (day, user) pairs (one keyed distinct — the heavy
    reduction happens FIRST, so the fan-out runs on ~active-users rows,
    not raw events), then each pair explodes to the 7 target days it
    supports — a BOUNDED map-side fan-out, never a range join or a
    window over a user list — and one distinct-count agg per target
    day.  At 100 TB the explode factor is the window length (7), fixed
    by the metric's definition; MAU swaps 7 → 30.  Target days beyond
    the data's max are clipped identically in both engines."""
    p = (
        tbl(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
    )
    mxd = p.agg(F.max("d")).collect()[0][0]  # one scalar date
    fan = p.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("target_d"),
        "user_id",
    ).filter(F.col("target_d") <= F.lit(mxd))
    return (
        fan.groupBy(
            F.col("target_d").cast("timestamp_ntz").alias("target_d")
        )
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
        .orderBy("target_d")
    )


@query(
    "events_trailing_wau_hll",
    # the SKETCH path of events_trailing_wau: per-(day, bucket) HLL
    # registers (md5-derived 60-bit hash — engine-portably exact), the
    # trailing 7-day union is a register MAX after a bounded fan-out
    # (HLL mergeability), estimate formula text shared verbatim with
    # sketch_hll_distinct_check; within_error gates vs the exact WAU
    oracle="""
    WITH h AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d,
             CAST(('0x' || substr(md5('wau-' || CAST(user_id AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS h
      FROM events
    ), mx AS (SELECT MAX(d) AS mxd FROM h),
    regs AS (
      SELECT d, h % 4096 AS bucket,
             MAX(CASE WHEN h // 4096 = 0 THEN 49
                      ELSE 49 - LENGTH(BIN(h // 4096)) END) AS r
      FROM h GROUP BY d, bucket
    ), fan AS (
      SELECT regs.d + CAST(x.i AS INTEGER) AS target_d, bucket, r
      FROM regs CROSS JOIN (SELECT unnest(range(0, 7)) AS i) x
    ), merged AS (
      SELECT target_d, bucket, MAX(r) AS r
      FROM fan, mx WHERE target_d <= mx.mxd
      GROUP BY target_d, bucket
    ), agg AS (
      SELECT target_d, COUNT(*) AS present,
             SUM(POWER(2.0, -r)) AS s_present
      FROM merged GROUP BY target_d
    ), est AS (
      SELECT target_d,
             (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
               / (s_present + (4096 - present) * 1.0) AS raw,
             4096 - present AS v
      FROM agg
    ), fin AS (
      SELECT target_d,
             CASE WHEN raw <= 2.5 * 4096.0 AND v > 0
                  THEN 4096.0 * LN(4096.0 / v) ELSE raw END AS e
      FROM est
    ), exact AS (
      SELECT p.d + CAST(x.i AS INTEGER) AS target_d,
             CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau_exact
      FROM (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events) p
      CROSS JOIN (SELECT unnest(range(0, 7)) AS i) x, mx
      WHERE p.d + CAST(x.i AS INTEGER) <= mx.mxd
      GROUP BY 1
    )
    SELECT CAST(f.target_d AS TIMESTAMP) AS target_d,
           ex.wau_exact,
           ROUND(f.e, 6) AS wau_hll_6,
           ABS(f.e - ex.wau_exact) / ex.wau_exact < 0.08 AS within_error
    FROM fin f JOIN exact ex ON ex.target_d = f.target_d
    ORDER BY target_d
    """,
)
def events_trailing_wau_hll(spark: SparkSession, sf_dir: str):
    """TRAILING WAU VIA MERGEABLE HLL SKETCHES (r14) — the production
    path of `events_trailing_wau`: the exact rollup re-counts every
    window, but HLL registers built ONCE per (day, bucket) merge by a
    plain MAX, so the trailing 7-day union costs a bounded fan-out of
    4096-register sketches — never a re-scan of the raw events, and a
    year of daily sketches composes into any window length after the
    fact.  Registers use the registry's engine-portable md5 60-bit hash
    and exact-integer rank (49 − LENGTH(BIN(w))), and the estimate
    formula text is shared verbatim with `sketch_hll_distinct_check`,
    so DuckDB replays the ESTIMATES bit-for-bit (round-6; the only fp
    freedom is the ≤4096-term power sum, ~1e-11 against the grid).
    within_error (<8 %, ~5σ) gates each window against the exact WAU.

    100 TB path: per day the state is 4096 bytes-ish of registers
    regardless of user cardinality; the merge shuffles (day, bucket, r)
    rows with map-side MAX combine.  The exact column exists for the
    gate only — production reads the sketch."""
    ev = tbl(spark, sf_dir, "events")
    from wukong_spark.queries.textops import md5_long

    h = ev.select(
        F.col("ts").cast("date").alias("d"),
        md5_long(
            F.concat(F.lit("wau-"), F.col("user_id").cast("string"))
        ).alias("h"),
    ).distinct()
    mxd = h.agg(F.max("d")).collect()[0][0]
    regs = (
        h.selectExpr(
            "d",
            "h % 4096 AS bucket",
            "CASE WHEN h DIV 4096 = 0 THEN 49"
            " ELSE 49 - LENGTH(BIN(h DIV 4096)) END AS rr",
        )
        .groupBy("d", "bucket")
        .agg(F.max("rr").alias("r"))
    )
    merged = (
        regs.select(
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("target_d"),
            "bucket",
            "r",
        )
        .filter(F.col("target_d") <= F.lit(mxd))
        .groupBy("target_d", "bucket")
        .agg(F.max("r").alias("r"))
    )
    agg = merged.groupBy("target_d").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.expr("POWER(2.0, -r)")).alias("s_present"),
    )
    fin = agg.selectExpr(
        "target_d",
        "(0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0"
        " / (s_present + (4096 - present) * 1.0) AS raw",
        "4096 - present AS v",
    ).selectExpr(
        "target_d",
        "CASE WHEN raw <= 2.5 * 4096.0 AND v > 0"
        " THEN 4096.0 * LN(4096.0 / v) ELSE raw END AS e",
    )
    exact = (
        ev.select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .select(
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("target_d"),
            "user_id",
        )
        .filter(F.col("target_d") <= F.lit(mxd))
        .groupBy("target_d")
        .agg(F.countDistinct("user_id").cast("long").alias("wau_exact"))
    )
    return (
        fin.join(exact, "target_d")
        .select(
            F.col("target_d").cast("timestamp_ntz").alias("target_d"),
            "wau_exact",
            F.round("e", 6).alias("wau_hll_6"),
            (
                F.abs(F.col("e") - F.col("wau_exact")) / F.col("wau_exact")
                < 0.08
            ).alias("within_error"),
        )
        .orderBy("target_d")
    )


@query(
    "events_ohlc_hourly",
    # OHLC bars in exact scaled ints: open/close picked by the total
    # order (ts, event_id) — event_id is unique, so first/last are
    # deterministic; high/low/volume are plain min/max/sum
    oracle="""
    WITH b AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 3600) AS BIGINT)) * 3600 * 1000000
             ) AS bucket,
             ts, event_id,
             CAST(ROUND(value * 10000) AS BIGINT) AS v4
      FROM events
    ), r AS (
      SELECT bucket, v4,
             ROW_NUMBER() OVER (PARTITION BY bucket
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT bucket,
           CAST(MAX(CASE WHEN rn_a = 1 THEN v4 END) AS BIGINT) AS open_4,
           MAX(v4) AS high_4,
           MIN(v4) AS low_4,
           CAST(MAX(CASE WHEN rn_d = 1 THEN v4 END) AS BIGINT) AS close_4,
           COUNT(*) AS n_events,
           CAST(SUM(v4) AS BIGINT) AS volume_4
    FROM r GROUP BY bucket ORDER BY bucket
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str):
    """HOURLY OHLC BARS (r14) — the candlestick aggregation every
    market-data and metrics warehouse materializes: per hour the Open
    (value at the earliest (ts, event_id)), High, Low, Close (latest),
    event count, and summed volume, all in exact scaled integers.  The
    (ts, event_id) composite is a total order (event_id unique), so
    open/close are deterministic under any execution order.

    Plan: ONE keyed aggregation — open/close via `min_by`/`max_by` with
    a struct ordering key (JVM TypedAggregate, no window, no second
    pass), high/low/volume ride the same agg.  At 100 TB this is a
    single map-side-combinable exchange on the bucket key; a per-symbol
    OHLC adds the series key to the grouping, same single shuffle.  The
    oracle replays open/close as rank-1 rows of partitioned windows —
    keyed windows, oracle-side only."""
    b = tbl(spark, sf_dir, "events").select(
        F.window("ts", "1 hour").getField("start").alias("bucket"),
        "ts",
        "event_id",
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.min_by("v4", F.struct("ts", "event_id"))
            .cast("long")
            .alias("open_4"),
            F.max("v4").alias("high_4"),
            F.min("v4").alias("low_4"),
            F.max_by("v4", F.struct("ts", "event_id"))
            .cast("long")
            .alias("close_4"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v4").cast("long").alias("volume_4"),
        )
        .orderBy("bucket")
    )


@query(
    "events_max_drawdown",
    # running peak + drawdown in PURE INTEGERS: hourly sums are exact
    # scaled BIGINTs, the prefix max is order-exact, drawdown is one
    # integer subtraction — bit-identical in both engines
    oracle="""
    WITH b AS (
      SELECT make_timestamp(
               (CAST(floor(epoch(ts) / 3600) AS BIGINT)) * 3600 * 1000000
             ) AS bucket,
             CAST(ROUND(value * 10000) AS BIGINT) AS v4
      FROM events
    ), h AS (
      SELECT bucket, CAST(SUM(v4) AS BIGINT) AS s FROM b GROUP BY bucket
    ), c AS (
      SELECT bucket, s,
             CAST(MAX(s) OVER (
               ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS peak_4
      FROM h
    )
    SELECT bucket, s AS hourly_sum_4, peak_4,
           CAST(peak_4 - s AS BIGINT) AS drawdown_4
    FROM c ORDER BY bucket
    """,
)
def events_max_drawdown(spark: SparkSession, sf_dir: str):
    """RUNNING PEAK / DRAWDOWN (r14) — the high-watermark analytic under
    every financial and SLO dashboard: for the hourly value series, the
    prefix MAXIMUM so far (the peak) and the per-hour drawdown
    peak − value; MAX(drawdown) downstream is the classic maximum-
    drawdown statistic.  Exact scaled integers end to end.

    Plan: one keyed hourly aggregation, then the running peak via
    `operators/setindex.global_cummax` — a range exchange on bucket +
    broadcast exclusive prefix MAXIMA + a map-side numpy running max —
    never a MAX OVER (ORDER BY) Exchange SinglePartition window (the
    r14 1pw audit rule).  At scale a per-series drawdown adds the
    series key to the grouping and range keys, same machinery."""
    from wukong_spark.operators.setindex import global_cummax

    b = tbl(spark, sf_dir, "events").select(
        F.window("ts", "1 hour").getField("start").alias("bucket"),
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    h = b.groupBy("bucket").agg(F.sum("v4").alias("s"))
    c = global_cummax(h, "s", "bucket", n_partitions=16, out_col="peak_4")
    return c.select(
        "bucket",
        F.col("s").alias("hourly_sum_4"),
        "peak_4",
        (F.col("peak_4") - F.col("s")).cast("long").alias("drawdown_4"),
    ).orderBy("bucket")


@query(
    "events_equidepth_histogram",
    # identical integer bucket assignment both sides: bucket =
    # (0-based rank * 8) DIV n over value_4 ascending; tied values are
    # interchangeable, so every bucket's count/min/max/sum is the sorted
    # multiset's — exact BIGINTs end to end
    oracle="""
    WITH v AS (
      SELECT CAST(ROUND(value * 10000) AS BIGINT) AS v4 FROM events
    ), r AS (
      SELECT v4, ROW_NUMBER() OVER (ORDER BY v4) - 1 AS rid,
             COUNT(*) OVER () AS n
      FROM v
    )
    SELECT (rid * 8) // n AS bucket, COUNT(*) AS n_rows,
           MIN(v4) AS lo_4, MAX(v4) AS hi_4, CAST(SUM(v4) AS BIGINT) AS sum_4
    FROM r GROUP BY (rid * 8) // n ORDER BY bucket
    """,
)
def events_equidepth_histogram(spark: SparkSession, sf_dir: str):
    """EQUI-DEPTH HISTOGRAM (r12) — the statistic ANALYZE TABLE computes
    for optimizer cardinality estimates and the partner of the
    equi-WIDTH `events_value_histogram`: 8 buckets holding equal row
    counts (±1 — the exact integer formula bucket = rank·8 DIV n), each
    with its count, boundary values, and sum.  Ranks come from
    `global_row_number`'s range-partitioned order — no single-partition
    sort — and with duplicate values the multiset inside a rank range is
    determined by the sorted multiset alone, so every emitted cell is
    exact regardless of tie order.

    100 TB path: one range exchange (the numbering), then a keyed
    8-group aggregate; the driver sees n_partitions offsets and one
    scalar count, nothing else."""
    from wukong_spark.operators.setindex import global_row_number

    v = tbl(spark, sf_dir, "events").select(
        F.round(F.col("value") * 10000).cast("long").alias("v4")
    )
    numbered = global_row_number(v, "v4", n_partitions=32, out_col="rid")
    n = v.count()
    return (
        numbered.select(
            F.expr(f"(rid * 8) DIV {n}").alias("bucket"), "v4"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v4").alias("lo_4"),
            F.max("v4").alias("hi_4"),
            F.sum("v4").alias("sum_4"),
        )
        .orderBy("bucket")
    )


@query(
    "stream_quantile_hist_check",
    # the sketch is an EXACT counting histogram over a fixed value grid
    # (bucket width 4096 on v4), so (a) micro-batch partials sum to the
    # one-pass batch sketch cell-for-cell and (b) the bucket recovered
    # for rank k = FLOOR(q*(n-1)) + 1 is exactly the bucket of the k-th
    # order statistic — both engines compute k with the same IEEE double
    # product, and the order statistic itself is integer
    oracle="""
    WITH v AS (
      SELECT CAST(ROUND(value * 10000) AS BIGINT) AS v4 FROM events
    ), n AS (SELECT COUNT(*) AS n FROM v),
    r AS (SELECT v4, ROW_NUMBER() OVER (ORDER BY v4) AS rn FROM v),
    qs AS (
      SELECT CAST(0.5 AS DOUBLE) AS q
      UNION ALL SELECT CAST(0.9 AS DOUBLE)
      UNION ALL SELECT CAST(0.99 AS DOUBLE)
    ), ks AS (
      SELECT q, CAST(FLOOR(q * (n.n - 1)) AS BIGINT) + 1 AS k, n.n AS n
      FROM qs CROSS JOIN n
    ), os AS (
      SELECT ks.q, ks.n, r.v4 AS ostat FROM ks JOIN r ON r.rn = ks.k
    )
    SELECT os.q, TRUE AS sketches_identical, TRUE AS in_domain,
           os.ostat // 4096 AS bucket_id,
           (os.ostat // 4096) * 4096 AS bucket_lo,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v
            WHERE v4 < ((os.ostat // 4096) + 1) * 4096) AS n_le,
           CAST(os.n AS BIGINT) AS n_rows
    FROM os ORDER BY q
    """,
)
def stream_quantile_hist_check(spark: SparkSession, sf_dir: str):
    """QUANTILE SKETCH ON A STREAM (r13) — the rank-query companion to
    stream_countmin_merge_check: a mergeable value-bucket histogram
    (`operators.membership.value_hist_build`, int64[4096] over bucket
    width 4096 on v4 = round(value*10000)) built micro-batch by
    micro-batch through foreachBatch and summed — integer counters add
    order-free, so the streamed sketch must equal the one-pass BATCH
    sketch cell-for-cell.  Quantile recovery: for q in {0.5, 0.9, 0.99}
    the first bucket whose cumulative count reaches rank
    k = floor(q*(n-1)) + 1 is exactly the bucket holding the k-th order
    statistic — the oracle recomputes that bucket from the true order
    statistic via ROW_NUMBER, so the sketch's answer is checked against
    exact SQL, not against itself.

    100 TB path: O(n_buckets) int64 state TOTAL regardless of stream
    length or key cardinality; partials merge by addition across
    micro-batches AND across parallel streams (kafka partitions); rank
    queries are one cumsum, value-resolution error <= bucket width.
    The domain contract (v4 within [0, 4096*4096), 3x headroom over
    shipped data) is emitted as the in_domain boolean rather than
    silently clipped."""
    import numpy as np

    from wukong_spark.operators.membership import value_hist_build
    from wukong_spark.streaming import (
        read_events_stream,
        restore_stream_conf,
        run_foreach_batch,
        snapshot_stream_conf,
    )

    W = NB = 4096
    prev_conf = snapshot_stream_conf(spark)
    try:
        ev = read_events_stream(spark, sf_dir).select(
            F.round(F.col("value") * 10000).cast("long").alias("v4")
        )
        streamed = np.zeros(NB, np.int64)

        def absorb(bdf, _epoch):
            nonlocal streamed
            if bdf.count():
                streamed = streamed + value_hist_build(bdf, "v4", W, NB)

        run_foreach_batch(ev, absorb)

        e = tbl(spark, sf_dir, "events").select(
            F.round(F.col("value") * 10000).cast("long").alias("v4")
        )
        batch_hist = value_hist_build(e, "v4", W, NB)
        identical = bool(np.array_equal(streamed, batch_hist))
        mn, mx = e.agg(F.min("v4"), F.max("v4")).collect()[0]
        in_domain = bool(mn is not None and mn >= 0 and mx < W * NB)

        cum = np.cumsum(streamed)
        n = int(cum[-1])
        rows = []
        for q in (0.5, 0.9, 0.99):
            k = int(np.floor(q * (n - 1))) + 1
            b = int(np.searchsorted(cum, k, side="left"))
            rows.append((q, identical, in_domain, b, b * W, int(cum[b]), n))
        return local_frame(spark,
            rows,
            "q double, sketches_identical boolean, in_domain boolean,"
            " bucket_id long, bucket_lo long, n_le long, n_rows long",
        )
    finally:
        restore_stream_conf(spark, prev_conf)


@query(
    "events_anomaly_mad",
    # median and MAD are exact ORDER STATISTICS on integer v4 (rank
    # k = FLOOR(0.5*(n-1)) + 1, the quantile_disc convention both
    # engines replay with the same IEEE product), so med, MAD, the
    # 3*MAD threshold and the anomaly counts are all exact integers —
    # no float enters the pipeline
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(ROUND(value * 10000) AS BIGINT) AS v4
      FROM events
    ), n AS (
      SELECT event_type, COUNT(*) AS n FROM v GROUP BY event_type
    ), r AS (
      SELECT event_type, v4,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v4) AS rn
      FROM v
    ), med AS (
      SELECT r.event_type, r.v4 AS med4
      FROM r JOIN n ON n.event_type = r.event_type
      WHERE r.rn = CAST(FLOOR(0.5 * (n.n - 1)) AS BIGINT) + 1
    ), d AS (
      SELECT v.event_type, ABS(v.v4 - m.med4) AS ad
      FROM v JOIN med m ON m.event_type = v.event_type
    ), r2 AS (
      SELECT event_type, ad,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad) AS rn
      FROM d
    ), mad AS (
      SELECT r2.event_type, r2.ad AS mad4
      FROM r2 JOIN n ON n.event_type = r2.event_type
      WHERE r2.rn = CAST(FLOOR(0.5 * (n.n - 1)) AS BIGINT) + 1
    )
    SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(me.med4) AS med_4, MIN(m.mad4) AS mad_4,
           CAST(SUM(CASE WHEN d.ad > 3 * m.mad4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies
    FROM d
    JOIN med me ON me.event_type = d.event_type
    JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type ORDER BY d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str):
    """ROBUST ANOMALY DETECTION via median absolute deviation (r13) —
    the outlier flag metrics pipelines use when means/stddevs are
    poisoned by the very outliers they hunt: per series (event_type),
    med = median(v4), MAD = median(|v4 − med|), anomaly ⇔
    |x − med| > 3·MAD.  Medians are exact lower-median order statistics
    (rank floor(0.5·(n−1))+1), so on integer-scaled values the whole
    pipeline — both medians, the threshold, the counts — is exact
    integer arithmetic in both engines.

    Plan: two per-key rank windows (value, then absolute deviation) and
    two broadcast joins of the per-key scalars back onto the rows.  At
    100 TB each window partitions by the series key — millions of
    independent small sorts, no global sort anywhere — and the med/MAD
    tables are one row per key (broadcast).  The exact-median pass can
    swap for value_hist_build's bucketed rank recovery when per-key
    cardinality explodes."""
    from pyspark.sql.window import Window

    v = tbl(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 10000).cast("long").alias("v4")
    )
    n = v.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    k = (F.floor(F.lit(0.5) * (F.col("n") - 1)).cast("long") + 1).alias("k")
    kn = n.select("event_type", k)

    w1 = Window.partitionBy("event_type").orderBy("v4")
    med = (
        v.withColumn("rn", F.row_number().over(w1))
        .join(F.broadcast(kn), "event_type")
        .filter(F.col("rn") == F.col("k"))
        .select("event_type", F.col("v4").alias("med4"))
    )
    d = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v4") - F.col("med4")).alias("ad")
    )
    w2 = Window.partitionBy("event_type").orderBy("ad")
    mad = (
        d.withColumn("rn", F.row_number().over(w2))
        .join(F.broadcast(kn), "event_type")
        .filter(F.col("rn") == F.col("k"))
        .select("event_type", F.col("ad").alias("mad4"))
    )
    return (
        d.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("med4").alias("med_4"),
            F.min("mad4").alias("mad_4"),
            F.sum(F.when(F.col("ad") > 3 * F.col("mad4"), 1).otherwise(0))
            .cast("long")
            .alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


@query(
    "events_twap_by_type",
    # durations come from LEAD over the (epoch_s, event_id) TOTAL order;
    # Σ v4·dur is bounded by max_v4 · table_timespan (durations telescope
    # to the span, ~5.6e6 · 2e8 ≈ 1.1e15 ≪ 2^63), so numerator and
    # denominator are exact BIGINTs at every scale; the TWAP itself is
    # one double division rounded on a value far above ulp drift
    oracle="""
    WITH e AS (
      SELECT event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
             CAST(ROUND(value * 10000) AS BIGINT) AS v4
      FROM events
    ), d AS (
      SELECT event_type, v4,
             LEAD(epoch_s) OVER (
               PARTITION BY event_type ORDER BY epoch_s, event_id
             ) - epoch_s AS dur
      FROM e
    )
    SELECT event_type,
           CAST(COUNT(dur) AS BIGINT) AS n_intervals,
           CAST(SUM(v4 * dur) AS BIGINT) AS num_4s,
           CAST(SUM(dur) AS BIGINT) AS den_s,
           ROUND(CAST(SUM(v4 * dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 6)
             AS twap_6
    FROM d WHERE dur IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_twap_by_type(spark: SparkSession, sf_dir: str):
    """TIME-WEIGHTED AVERAGE over an irregular event series (r13) — the
    finance/metrics primitive plain AVG gets wrong when samples arrive
    unevenly: each observation holds until the next one, so it weighs by
    its duration (TWAP = Σ vᵢ·durᵢ / Σ durᵢ, last observation open-ended
    and excluded).  Durations come from LEAD over the total order
    (epoch seconds, event_id tiebreak), so ties contribute zero
    deterministically.

    Exactness: durations TELESCOPE — Σ dur per series is bounded by the
    table's timespan regardless of row count, so the int64 numerator
    bound is max_v4 · span (~1.1e15), scale-independent; both sums stay
    exact BIGINTs at 100 TB (the r12 HUGEINT lesson applied by
    construction, not by cast alone).

    Plan: one per-key LEAD window + one keyed agg, both on the series
    key — at scale this is millions of independent per-key passes; the
    NTZ interval cast derives integer epoch seconds without tz
    sensitivity (unix_timestamp rejects NTZ)."""
    from pyspark.sql.window import Window

    e = tbl(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr(
            "CAST(ts - TIMESTAMP_NTZ '1970-01-01 00:00:00' AS BIGINT)"
        ).alias("epoch_s"),
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    w = Window.partitionBy("event_type").orderBy("epoch_s", "event_id")
    d = e.select(
        "event_type",
        "v4",
        (F.lead("epoch_s").over(w) - F.col("epoch_s")).alias("dur"),
    ).filter(F.col("dur").isNotNull())
    return (
        d.groupBy("event_type")
        .agg(
            F.count("dur").cast("long").alias("n_intervals"),
            F.sum(F.col("v4") * F.col("dur")).cast("long").alias("num_4s"),
            F.sum("dur").cast("long").alias("den_s"),
        )
        .selectExpr(
            "event_type",
            "n_intervals",
            "num_4s",
            "den_s",
            "ROUND(CAST(num_4s AS DOUBLE) / CAST(den_s AS DOUBLE), 6)"
            " AS twap_6",
        )
        .orderBy("event_type")
    )


@query(
    "events_gap_fill_interp",
    # identical spine + identical prev/next IGNORE-NULLS windows over
    # integer row positions in both engines; fraction computed in DOUBLE
    # and rounded to 4dp (established repo-wide double contract)
    oracle="""
    WITH b AS (
      SELECT event_type,
             make_timestamp(
               (CAST(floor(epoch(ts) / 3600) AS BIGINT)) * 3600 * 1000000
             ) AS bucket,
             CAST(ROUND(value * 10000) AS BIGINT) AS v4
      FROM events
    ),
    agg AS (
      SELECT event_type, bucket, CAST(SUM(v4) AS BIGINT) AS sv4 FROM b
      GROUP BY event_type, bucket
    ),
    bounds AS (SELECT MIN(bucket) AS mn, MAX(bucket) AS mx FROM agg),
    spine AS (
      SELECT t.event_type, s.bucket
      FROM (SELECT DISTINCT event_type FROM b) t
      CROSS JOIN (
        SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
        FROM bounds
      ) s
    ),
    joined AS (
      SELECT sp.event_type, sp.bucket, a.sv4,
             ROW_NUMBER() OVER (
               PARTITION BY sp.event_type ORDER BY sp.bucket
             ) AS t
      FROM spine sp LEFT JOIN agg a
        ON a.event_type = sp.event_type AND a.bucket = sp.bucket
    ),
    ctx AS (
      SELECT event_type, bucket, sv4, t,
             last_value(sv4 IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS pv,
             last_value(CASE WHEN sv4 IS NOT NULL THEN t END IGNORE NULLS)
               OVER (
                 PARTITION BY event_type ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS pt,
             first_value(sv4 IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY t
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS nv,
             first_value(CASE WHEN sv4 IS NOT NULL THEN t END IGNORE NULLS)
               OVER (
                 PARTITION BY event_type ORDER BY t
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
               ) AS nt
      FROM joined
    )
    SELECT event_type, bucket,
           ROUND(CASE
             WHEN sv4 IS NOT NULL THEN CAST(sv4 AS DOUBLE)
             WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
             WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
             ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / (nt - pt))
           END, 4) AS filled_v4,
           (sv4 IS NULL) AS was_gap
    FROM ctx ORDER BY event_type, bucket
    """,
)
def events_gap_fill_interp(spark: SparkSession, sf_dir: str):
    """GAP FILL with LINEAR INTERPOLATION (r17) — pandas
    `Series.interpolate` semantics next to `events_gap_fill_locf`'s
    forward fill: an empty (event_type, hour) bucket takes
    prev + (next − prev) · Δt/Δspan between its nearest observed
    neighbors; leading gaps take the first observation, trailing gaps
    carry the last (pandas' limit_direction='both' edge rule).

    Plan: the LOCF spine (bucket agg + sequence-exploded hourly grid),
    then ONE ordered pass per series computing four IGNORE-NULLS
    windows — prev/next value and their integer row positions (the
    uniform hourly grid makes row position ≡ time, so no NTZ epoch
    arithmetic is ever needed).  Each window partitions by event_type:
    no global sort, no single partition, and the fraction is one DOUBLE
    expression rounded to 4dp in both engines.  100 TB shape: identical
    to LOCF — everything keys on (event_type), the series axis."""
    from pyspark.sql.window import Window

    et = tbl(spark, sf_dir, "events").select(
        "event_type",
        F.window("ts", "1 hour").getField("start").alias("bucket"),
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    agg = et.groupBy("event_type", "bucket").agg(F.sum("v4").alias("sv4"))
    bounds = agg.agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    spine = (
        et.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(bounds).select(
                F.explode(
                    F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
                ).alias("bucket")
            )
        )
    )
    wo = Window.partitionBy("event_type").orderBy("bucket")
    joined = (
        spine.join(agg, ["event_type", "bucket"], "left")
        .withColumn("t", F.row_number().over(wo))
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("sv4").isNotNull(), F.col("t"))
    ctx = joined.select(
        "event_type",
        "bucket",
        "sv4",
        "t",
        F.last("sv4", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(wp).alias("pt"),
        F.first("sv4", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_t, ignorenulls=True).over(wn).alias("nt"),
    )
    filled = (
        F.when(F.col("sv4").isNotNull(), F.col("sv4").cast("double"))
        .when(F.col("pv").isNull(), F.col("nv").cast("double"))
        .when(F.col("nv").isNull(), F.col("pv").cast("double"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((F.col("t") - F.col("pt")).cast("double") / (F.col("nt") - F.col("pt")))
        )
    )
    return ctx.select(
        "event_type",
        "bucket",
        F.round(filled, 4).alias("filled_v4"),
        F.col("sv4").isNull().alias("was_gap"),
    ).orderBy("event_type", "bucket")


@query(
    "events_ewma_hourly",
    # the recurrence is evaluated with the IDENTICAL expression tree in
    # both engines (s' = 0.2*x + 0.8*s over float64, same op order), so
    # the round-4 compare is far above any residual ulp; the recursive
    # referee rebuilds each series step by step
    oracle="""
    WITH RECURSIVE agg AS MATERIALIZED (
      SELECT event_type,
             CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)
               / 10000.0 AS x,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY make_timestamp(
                 (CAST(floor(epoch(ts)/3600) AS BIGINT))*3600*1000000)
             ) - 1 AS t
      FROM events
      GROUP BY event_type, make_timestamp(
        (CAST(floor(epoch(ts)/3600) AS BIGINT))*3600*1000000)
    ),
    r AS (
      SELECT event_type, t, x AS s FROM agg WHERE t = 0
      UNION ALL
      SELECT a.event_type, a.t, 0.2 * a.x + 0.8 * r.s
      FROM agg a JOIN r ON a.event_type = r.event_type AND a.t = r.t + 1
    )
    SELECT event_type, COUNT(*) AS n_hours,
           ROUND(MAX(CASE WHEN t = mx THEN s END), 4) AS ewma_last
    FROM (SELECT *, MAX(t) OVER (PARTITION BY event_type) AS mx FROM r)
    GROUP BY event_type ORDER BY event_type
    """,
)
def events_ewma_hourly(spark: SparkSession, sf_dir: str):
    """EXPONENTIALLY WEIGHTED MOVING AVERAGE per series (r17) — the
    smoothing recurrence s_t = α·x_t + (1−α)·s_{t−1} (α = 0.2,
    s_0 = x_0; pandas `ewm(alpha, adjust=False)` semantics) over each
    event type's hourly means.  A linear recurrence is the canonical
    NON-window-expressible analytic: no frame can weight by (1−α)^{t−i}
    with t varying per row, so this is the driver-contract category the
    iterative operators live in — here solved per SERIES, the natural
    parallel unit.

    Plan: one keyed hourly aggregation (exact BIGINT sum, one double
    division), then ONE `applyInPandas` per event_type evaluating the
    recurrence with the same float64 expression the DuckDB RECURSIVE
    referee uses — series are independent, so the scale axis is #series
    (keyed exchange), never time.  100 TB shape: a series too long for
    one task would chunk via the global_scan prefix machinery
    (operators/setindex.py) — the associative form of this recurrence
    is s_t = A_t·s_0 + B_t with (A, B) composing left-to-right, exactly
    the scan-combine shape."""
    import pandas as pd

    et = tbl(spark, sf_dir, "events").select(
        "event_type",
        F.window("ts", "1 hour").getField("start").alias("bucket"),
        F.round(F.col("value") * 10000).cast("long").alias("v4"),
    )
    agg = (
        et.groupBy("event_type", "bucket")
        .agg((F.sum("v4").cast("double") / F.lit(10000.0)).alias("x"))
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket")
        s = None
        for x in pdf["x"]:
            s = float(x) if s is None else 0.2 * float(x) + 0.8 * s
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_hours": [len(pdf)],
                "ewma_raw": [s],
            }
        )

    # round JVM-side: F.round is half-away like DuckDB's ROUND (Python's
    # round() is banker's — a .00005 tie would diverge)
    return (
        agg.groupBy("event_type")
        .applyInPandas(ewma, "event_type string, n_hours long, ewma_raw double")
        .select(
            "event_type", "n_hours", F.round("ewma_raw", 4).alias("ewma_last")
        )
        .orderBy("event_type")
    )


@query(
    "events_autocorr_hourly",
    # CORR over identically-built lag pairs; round-4 doubles (the
    # stats_corr_covar contract — co-moment accumulation drift is
    # orders below the rounding grid)
    oracle="""
    WITH agg AS (
      SELECT event_type,
             make_timestamp(
               (CAST(floor(epoch(ts)/3600) AS BIGINT))*3600*1000000
             ) AS bucket,
             CAST(SUM(CAST(ROUND(value*10000) AS BIGINT)) AS DOUBLE)
               / 10000.0 AS x
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, x,
             LAG(x, 1) OVER (
               PARTITION BY event_type ORDER BY bucket) AS x1,
             LAG(x, 24) OVER (
               PARTITION BY event_type ORDER BY bucket) AS x24
      FROM agg
    )
    SELECT event_type,
           ROUND(CORR(x, x1), 4) AS acf_1,
           ROUND(CORR(x, x24), 4) AS acf_24,
           COUNT(*) AS n_hours
    FROM lagged GROUP BY event_type ORDER BY event_type
    """,
)
def events_autocorr_hourly(spark: SparkSession, sf_dir: str):
    """AUTOCORRELATION per series (r17) — lag-1 and lag-24 (daily
    seasonality probe) Pearson correlation of each event type's hourly
    means: the standard seasonality/persistence diagnostic a metrics
    pipeline runs before choosing window sizes or alerting baselines.

    Plan: one keyed hourly aggregation, two LAG windows partitioned by
    event_type (each series sorts independently — no global sort), one
    CORR aggregate per lag.  corr's null-pair handling (leading rows
    with no lag) matches across engines; co-moment accumulation drift
    is ~1e-12 against a 1e-4 rounding grid (the stats_corr_covar
    contract).  100 TB shape: everything keys on the series axis."""
    from pyspark.sql.window import Window

    agg = (
        tbl(spark, sf_dir, "events")
        .select(
            "event_type",
            F.window("ts", "1 hour").getField("start").alias("bucket"),
            F.round(F.col("value") * 10000).cast("long").alias("v4"),
        )
        .groupBy("event_type", "bucket")
        .agg((F.sum("v4").cast("double") / F.lit(10000.0)).alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    lagged = agg.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 24).over(w).alias("x24"),
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.round(F.corr("x", "x1"), 4).alias("acf_1"),
            F.round(F.corr("x", "x24"), 4).alias("acf_24"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .orderBy("event_type")
    )
