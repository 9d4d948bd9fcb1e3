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
        .select("window_start", "event_type", "n_events", "sum_value")
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
