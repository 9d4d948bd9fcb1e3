"""Count Spark jobs/stages/tasks one query runs end-to-end.

Evidence tool for driver-looped queries (cholesky, svd_compressed,
pagerank) whose interesting dataflow never appears in the terminal
frame's explain(): runs the named queries in a fresh tuned session and
prints, per query, the number of jobs, stages and tasks the full entry
executed (REST API, same source as the bench stage sidecar).

Usage: python tools/job_count.py query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wukong_spark.queries import load_all
from wukong_spark.session import get_spark, release_pending


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    spark = get_spark("job-count", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in sys.argv[1:]:
        jobs0 = {j["jobId"] for j in _rest(spark, "jobs")}
        stages0 = {(s["stageId"], s["attemptId"]) for s in _rest(spark, "stages")}
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        release_pending()
        jobs = [j for j in _rest(spark, "jobs") if j["jobId"] not in jobs0]
        stages = [
            s
            for s in _rest(spark, "stages")
            if (s["stageId"], s["attemptId"]) not in stages0
            and s.get("numTasks", 0) > 0
            and s.get("status") == "COMPLETE"
        ]
        out[name] = {
            "jobs": len(jobs),
            "stages": len(stages),
            "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1048576, 2
            ),
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
