"""Shared session bootstrap for the example scripts."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wukong_spark.session import get_spark  # noqa: E402


def session():
    spark = get_spark("wukong-spark-example")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def report(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
    if not ok:
        raise SystemExit(1)
