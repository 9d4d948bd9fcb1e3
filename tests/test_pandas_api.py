"""pandas-API-on-Spark parity — the dask.dataframe user surface.

The reference's dataframe capability IS the pandas API executed as opaque
task graphs (`/root/reference/Static Scheduler/wukong/tests/
test_collections.py:40-175`).  pyspark.pandas provides the same user
surface natively; these tests mirror the reference's own test cases
(cumsum :62, groupby count :63, drop_duplicates :59, assign :59,
loc range :64,132-149, rolling :138-141, groupby-apply :152-175) with
local pandas as the oracle — the reference's exact differential pattern
(remote vs `.compute(scheduler="sync")`, test_collections.py:54,66-70).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(7)
    return pd.DataFrame(
        {
            "x": rng.integers(0, 10, 500),
            "y": rng.integers(0, 5, 500),
            "v": rng.random(500),
        }
    )


@pytest.fixture(scope="module")
def psdf(spark, pdf):
    import pyspark.pandas as ps

    ps.set_option("compute.ops_on_diff_frames", True)
    return ps.from_pandas(pdf)


def test_assign_and_arithmetic(pdf, psdf):
    # df.assign(z=df.x + df.y) — test_collections.py:59
    got = psdf.assign(z=psdf.x + psdf.y).z.to_pandas()
    want = pdf.assign(z=pdf.x + pdf.y).z
    pd.testing.assert_series_equal(
        got.sort_index(), want.sort_index(), check_dtype=False
    )


def test_cumsum(pdf, psdf):
    # df.x.cumsum() — test_collections.py:62
    got = psdf.v.cumsum().to_pandas().sort_index()
    want = pdf.v.cumsum().sort_index()
    pd.testing.assert_series_equal(got, want, check_dtype=False, rtol=1e-12)


def test_groupby_count(pdf, psdf):
    # df.groupby(['x','y']).count() — test_collections.py:63
    got = psdf.groupby(["x", "y"]).v.count().to_pandas().sort_index()
    want = pdf.groupby(["x", "y"]).v.count().sort_index()
    pd.testing.assert_series_equal(got, want, check_dtype=False)


def test_drop_duplicates(pdf, psdf):
    # drop_duplicates — test_collections.py:59
    got = psdf[["x", "y"]].drop_duplicates().to_pandas()
    want = pdf[["x", "y"]].drop_duplicates()
    assert (
        got.sort_values(["x", "y"]).reset_index(drop=True).equals(
            want.sort_values(["x", "y"]).reset_index(drop=True)
        )
    )


def test_loc_range_slice(pdf, psdf):
    # df.loc[50:75] — test_collections.py:64
    got = psdf.loc[50:75].to_pandas().sort_index()
    want = pdf.loc[50:75]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_mean(pdf, psdf):
    # df.A.rolling(2).mean() — test_collections.py:138-141
    got = psdf.v.rolling(2).mean().to_pandas().sort_index()
    want = pdf.v.rolling(2).mean().sort_index()
    pd.testing.assert_series_equal(got, want, check_dtype=False, rtol=1e-12)


def test_describe_stats(pdf, psdf):
    # mean/std — test_collections.py:57-58
    assert abs(float(psdf.v.mean()) - pdf.v.mean()) < 1e-12
    assert abs(float(psdf.v.std()) - pdf.v.std()) < 1e-12


def test_groupby_transform_custom_fn(pdf, psdf):
    # groupby custom per-group fn (index-preserving) — test_collections.py:152-175
    def demean(g):
        return g - g.mean()

    got = psdf.groupby("x").v.transform(demean).to_pandas().sort_index()
    want = pdf.groupby("x").v.transform(demean).sort_index()
    pd.testing.assert_series_equal(got, want, check_dtype=False, rtol=1e-9)


def test_value_counts_and_sort(pdf, psdf):
    got = psdf.x.value_counts().to_pandas().sort_index()
    want = pdf.x.value_counts().sort_index()
    pd.testing.assert_series_equal(got, want, check_dtype=False)
