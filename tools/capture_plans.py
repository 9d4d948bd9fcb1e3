"""Capture .explain("formatted") for headline queries into plans/<dir>/.

Usage: python tools/capture_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for every headline query (or the ones
named).  Uses the tuned bench session (same confs as bench.py) so the
captured plans match what the bench executes.  Queries whose construction
runs driver-loop jobs (cholesky, ALS, pagerank) execute those jobs here —
the captured plan is the TERMINAL frame's plan, same as the bench's timed
action sees.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wukong_spark.queries import load_all
from wukong_spark.session import get_spark, release_pending


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    names = [n for n, s in sorted(reg.items()) if s.headline and (not only or n in only)]
    spark = get_spark("wukong-spark-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = reg[name]
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture failures loudly but keep going
            plan = f"CAPTURE FAILED: {e!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"# captured {name} ({len(plan)} B)", file=sys.stderr)
        spark.catalog.clearCache()
        release_pending()
    spark.stop()


if __name__ == "__main__":
    main()
