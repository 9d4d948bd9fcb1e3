from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from wukong_spark.session import TABLES, get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Test inputs are tiny (sf0.001/sf0.01 tables, 100-2000-dim matrices):
    # per-stage Python-worker round trips, not data, dominate suite wall
    # time, and the heaviest file measures 148 s on a 16-slot session vs
    # 175-225 s on 32 (r18, driver pytest-budget gate — VERDICT r17 #2).
    # Cap the TEST session's width at 16; a driver-set SPARK_GRAFT_CPUS
    # below that is honored unchanged (the 8-core gate run).
    cpus = min(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 16)
    s = get_spark(
        "wukong-spark-tests", master=f"local[{cpus}]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_CORRECT}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(autouse=True)
def _release_result_checkpoints():
    """Free result-backing checkpoints operators registered during the
    test (leak audit r15) — keeps the session-scoped SparkSession's
    storage flat across the suite, as a long-lived gate session would."""
    yield
    try:
        from wukong_spark.session import release_pending

        release_pending()
    except Exception:
        pass
