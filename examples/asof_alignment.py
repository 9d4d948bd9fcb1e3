"""Ordered-data alignment tour (reference: the dask.dataframe
ordered-index workloads, `Static Scheduler/wukong/tests/
test_collections.py:113-149`): keyed merge_asof, the KEYLESS/global
merge_asof, and the generalized ordered-prefix scan — the three
operators a pandas time-series migration reaches for first, each
self-checked against pandas/numpy on the same data."""

from __future__ import annotations

import numpy as np
import pandas as pd


def run(spark) -> bool:
    from pyspark.sql import functions as F

    from wukong_spark.operators.asof import merge_asof, merge_asof_global
    from wukong_spark.operators.setindex import global_scan

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    trades = pd.DataFrame(
        {
            "sym": rng.integers(0, 5, n_l),
            "t": np.sort(rng.integers(0, 10_000, n_l)).astype(np.int64),
            "trade_id": np.arange(n_l, dtype=np.int64),
        }
    )
    quotes = (
        pd.DataFrame(
            {
                "sym": rng.integers(0, 5, n_r),
                "t": rng.integers(0, 10_000, n_r).astype(np.int64),
                "px": rng.integers(90, 110, n_r).astype(np.int64),
            }
        )
        .drop_duplicates(["sym", "t"])
        .sort_values("t", kind="stable")
        .reset_index(drop=True)
    )
    tdf, qdf = spark.createDataFrame(trades), spark.createDataFrame(quotes)

    # 1. keyed as-of: each trade gets its symbol's latest quote ≤ t
    got = (
        merge_asof(tdf, qdf, on="t", by="sym", direction="backward")
        .toPandas()
        .sort_values("trade_id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        trades, quotes, on="t", by="sym", direction="backward"
    )
    g, w = got["r_px"].astype("float64"), want["px"].astype("float64")
    keyed_ok = bool(((g == w) | (g.isna() & w.isna())).all())

    # 2. keyless as-of: market-wide "latest quote by ANY symbol" —
    #    range partition + boundary-seed exchange, never a global sort
    mkt = quotes.drop(columns=["sym"]).drop_duplicates(["t"])
    got_g = (
        merge_asof_global(
            tdf,
            spark.createDataFrame(mkt),
            on="t",
            direction="nearest",
            n_partitions=8,
        )
        .toPandas()
        .sort_values("trade_id")
        .reset_index(drop=True)
    )
    want_g = pd.merge_asof(trades, mkt, on="t", direction="nearest")
    g2, w2 = got_g["r_px"].astype("float64"), want_g["px"].astype("float64")
    global_ok = bool(((g2 == w2) | (g2.isna() & w2.isna())).all())

    # 3. generalized ordered-prefix scan: running all-time-high price in
    #    quote order (one range exchange + broadcast prefix — the
    #    distributed MAX OVER (ORDER BY))
    got_s = (
        global_scan(
            spark.createDataFrame(mkt), "px", "t", op="max",
            n_partitions=8, out_col="high",
        )
        .toPandas()
        .sort_values("t")["high"]
        .to_numpy()
    )
    want_s = np.maximum.accumulate(
        mkt.sort_values("t")["px"].to_numpy()
    )
    scan_ok = bool((got_s == want_s).all())

    return keyed_ok and global_ok and scan_ok


if __name__ == "__main__":
    from _common import report, session

    report("asof_alignment", run(session()))
