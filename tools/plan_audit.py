"""Physical-plan audit across the whole query registry.

Prints one line per registered query with the scale-relevant plan metrics:

  SMJ   sort-merge joins          (expected 0 at test SF — dims broadcast;
                                   SMJ appears legitimately at cluster scale)
  BHJ   broadcast hash joins
  Exch  shuffle exchanges         (broadcast exchanges excluded)
  push  pushed filters reached the scan
  rowPy row-at-a-time Python      (MUST be 0 — the banned slow path)
  arrow Arrow-vectorized Python boundaries
  1pw   SinglePartition windows   (MUST be 0 — a Window fed by
                                   Exchange SinglePartition on
                                   non-constant-bounded input funnels
                                   every row through ONE task; windows
                                   over a TakeOrdered/limit K-row frame
                                   are exempt)

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wukong_spark import plans  # noqa: E402
from wukong_spark.queries import load_all  # noqa: E402
from wukong_spark.session import get_spark, release_pending  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    reg = load_all()
    targets = names or sorted(reg)

    spark = get_spark("wukong-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    for n in targets:
        try:
            plan = plans.formatted_plan(reg[n].fn(spark, sf_dir))
        except Exception as exc:  # keep auditing the rest
            print(f"{n:36s} ERROR {type(exc).__name__}: {exc}", file=sys.stderr)
            bad += 1
            continue
        finally:
            # some entries materialize during construction; free their
            # result-backing checkpoints between audits (leak audit r15)
            release_pending()
        rows, arrow = plans.python_eval_count(plan)
        spw = plans.single_partition_window_count(plan)
        flags = []
        if rows:
            flags.append("ROW-PYTHON!")
            bad += 1
        if spw:
            flags.append("1PART-WIN!")
            bad += 1
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN!")
            bad += 1
        elif "BroadcastNestedLoopJoin" in plan:
            # tiny-broadcast NLJ = the scalar-subquery / small-query-set
            # pattern (intentional); verify the build side really is small
            flags.append("bnlj")
        print(
            f"{n:36s} SMJ={plan.count('SortMergeJoin')} "
            f"BHJ={plans.broadcast_join_count(plan)} "
            f"Exch={plans.count_shuffles(plan)} "
            f"push={'y' if plans.has_pushed_filters(plan) else '-'} "
            f"rowPy={rows} arrow={arrow} 1pw={spw} {' '.join(flags)}"
        )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
