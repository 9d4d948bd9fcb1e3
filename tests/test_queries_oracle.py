"""Differential tests: every registered query vs its DuckDB oracle at sf0.01.

Mirrors the reference's dominant oracle pattern — compute remotely, compare
against local/sync execution (`/root/reference/Static Scheduler/wukong/tests/
test_collections.py:54,66-70`) — with DuckDB playing the "sync scheduler".
Exact cell equality (no tolerance): the queries are designed to be
bit-stable cross-engine (integer cents, rounded doubles).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from wukong_spark.queries import load_all
from tests.conftest import SF_CORRECT

REG = load_all()
ORACLE_QUERIES = sorted(n for n, s in REG.items() if s.oracle is not None)
NO_ORACLE_QUERIES = sorted(n for n, s in REG.items() if s.oracle is None)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = REG[name]
    got = _normalize(spec.fn(spark, SF_CORRECT).toPandas())
    want = _normalize(duck.execute(spec.oracle).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"rowcount {len(got)} != {len(want)}"
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(gv, wv)) if not _cells_equal(x, y)
        ]
        assert not bad, f"col {c}: {len(bad)} mismatches, first: {bad[0]}"


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_query_runs(spark, name):
    """Non-SQL-expressible ops still must run and return a stable schema."""
    df = REG[name].fn(spark, SF_CORRECT)
    assert df.columns
    assert df.count() >= 0
