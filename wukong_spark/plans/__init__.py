"""Plan introspection + plan-fingerprint caching.

The 100 TB discipline is enforced by *reading plans*, not guessing:
these helpers expose the formatted/executed physical plan and the
scale-relevant predicates on it (pushdown reached the scan? dims broadcast?
how many shuffles? did anything fall back to row-at-a-time Python?).
Used by tests/test_plan_shape.py and ad-hoc audits.

Reference parity note: the reference has no optimizer to introspect (its
run_spec is opaque to the scheduler, `/root/reference/Static Scheduler/
wukong/scheduler.py:444-448`); plan visibility is a capability the Spark
rebuild adds.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from wukong_spark.session import PlanCache  # noqa: F401  (re-export)


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text of the optimized physical plan."""
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    """toString of the (possibly AQE-finalized) executed plan — call after
    an action to see runtime join/partition choices."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_shuffles(plan: str) -> int:
    """Shuffle exchanges in a formatted plan (broadcast exchanges excluded)."""
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_pushed_filters(plan: str, *cols: str) -> bool:
    """True if the scan carries a non-empty PushedFilters list mentioning
    every given column (no cols → any non-empty list)."""
    if "PushedFilters" not in plan:
        return False
    seg = plan.split("PushedFilters")[1][:500]
    if seg.lstrip(": ").startswith("[]"):
        return False
    return all(c in seg for c in cols)


def read_schema(plan: str) -> str:
    """The pruned scan schema segment (column-pruning check)."""
    return plan.split("ReadSchema")[1][:500] if "ReadSchema" in plan else ""


def broadcast_join_count(plan: str) -> int:
    return plan.count("BroadcastHashJoin")


def has_cartesian(plan: str) -> bool:
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def python_eval_count(plan: str) -> tuple[int, int]:
    """(row_at_a_time, arrow_vectorized) Python boundaries in the plan.
    The first number should be 0 everywhere — BatchEvalPython is the
    slow path this engine bans from hot paths."""
    rows = plan.count("BatchEvalPython")
    # NB: count MapInArrow before MapInPandas-style nodes — the node names
    # are distinct, but keep every Python-boundary physical node listed
    arrow = (
        plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")  # also matches ...WithState
        + plan.count("MapInPandas")
        + plan.count("MapInArrow")
        + plan.count("AggregateInPandas")
    )
    return rows, arrow
