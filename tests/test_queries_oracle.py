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


# stream_* entries must leave the shared session conf EXACTLY as found —
# including confs UNSET before (r12 verdict item 3: a caller restored the
# tz but leaked spark.sql.legacy.parquet.nanosAsLong=true, changing parquet
# scan semantics for every later query).  Asserted here, on the execution
# these differential tests already pay for — the standalone test that
# re-ran every stream entry a second time just for this check was retired
# (r18, driver pytest-budget gate).  Batch entries are exempt: load_table
# sets the events confs deliberately and documents why.
_CONF_KEYS = (
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.session.timeZone",
    "spark.sql.shuffle.partitions",
)


def _run_conf_guarded(spark, spec, name, sf_dir):
    guard = name.startswith("stream_")
    before = {k: spark.conf.get(k, None) for k in _CONF_KEYS} if guard else None
    df = spec.fn(spark, sf_dir)
    if guard:
        after = {k: spark.conf.get(k, None) for k in _CONF_KEYS}
        assert after == before, f"{name} leaked session conf: {before} -> {after}"
    return df


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    spec = REG[name]
    got = _normalize(_run_conf_guarded(spark, spec, name, SF_CORRECT).toPandas())
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
    df = _run_conf_guarded(spark, REG[name], name, SF_CORRECT)
    assert df.columns
    assert df.count() >= 0
