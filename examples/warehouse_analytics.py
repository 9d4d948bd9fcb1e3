"""Warehouse-analytics tour on the r14 distributed rank-cut family —
the single-partition-window-free forms of the classic global analytics:
Pareto/ABC classification, revenue decile (Lorenz) shares, exact
stratified splitting, running peak/drawdown, and as-of attribution via
the reusable merge_asof operator.

Each stage is the registry operator itself (value-checked against a
DuckDB oracle by the driver gate); this example wires them into the
report pack a revenue warehouse actually publishes.  The point being
demonstrated: NONE of these plans contains an Exchange SinglePartition
window (tools/plan_audit.py's 1pw rule) — every global order statistic
comes from a range exchange + broadcast prefix offsets
(operators/setindex.py) or a keyed window.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def run(spark) -> bool:
    from pyspark.sql import functions as F

    from wukong_spark import plans
    from wukong_spark.queries.events import (
        attribution_last_touch,
        events_max_drawdown,
    )
    from wukong_spark.queries.relational3 import (
        pareto_abc_customers,
        revenue_decile_concentration,
    )
    from wukong_spark.queries.sampling import split_exact_stratified

    # 1. Pareto/ABC: who holds the revenue mass?
    abc = {r["cls"]: r for r in pareto_abc_customers(spark, SF_DIR).collect()}
    if set(abc) != {"A", "B", "C"}:
        return False
    # classes are revenue-ordered: every A customer out-earns every B,
    # every B every C (TPC-H revenue is near-uniform, so A is NOT small
    # here — the boundary ordering is the invariant, not the class size)
    if not (
        abc["A"]["min_rev_c"] >= abc["B"]["max_rev_c"]
        and abc["B"]["min_rev_c"] >= abc["C"]["max_rev_c"]
    ):
        return False

    # 2. Lorenz deciles: cumulative share must be monotone and end at 1
    dec = revenue_decile_concentration(spark, SF_DIR).collect()
    shares = [r["cum_share_6"] for r in dec]
    if shares != sorted(shares) or abs(shares[-1] - 1.0) > 1e-6:
        return False

    # 3. drawdown: peak is monotone, drawdown never negative
    dd = events_max_drawdown(spark, SF_DIR).collect()
    peaks = [r["peak_4"] for r in dd]
    if peaks != sorted(peaks) or any(r["drawdown_4"] < 0 for r in dd):
        return False

    # 4. last-touch attribution sums to total purchase revenue
    att = attribution_last_touch(spark, SF_DIR)
    att_total = att.agg(F.sum("revenue_4")).collect()[0][0]
    from wukong_spark.queries.helpers import tbl

    direct = (
        tbl(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.round(F.col("value") * 10000).cast("long")))
        .collect()[0][0]
    )
    if att_total != direct:
        return False

    # 5. exact stratified split: per-lang counts sum back to the corpus
    spl = split_exact_stratified(spark, SF_DIR)
    n_docs = spl.agg(F.sum("n_docs")).collect()[0][0]
    if n_docs != tbl(spark, SF_DIR, "documents").count():
        return False

    # 6. the plan discipline itself: zero SinglePartition windows
    for df in (
        pareto_abc_customers(spark, SF_DIR),
        revenue_decile_concentration(spark, SF_DIR),
        events_max_drawdown(spark, SF_DIR),
    ):
        if plans.single_partition_window_count(plans.formatted_plan(df)):
            return False
    return True


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _common import report, session

    report("warehouse_analytics", run(session()))
