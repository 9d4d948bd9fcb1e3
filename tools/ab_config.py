"""Config A/B harness (r18, VERDICT r17 Next #1).

Runs a small query subset (default: la_cholesky_check, la_svd_ts_ref +
two canaries) in a FRESH subprocess per config so JVM/alloc env changes
actually take effect, and logs /proc/meminfo + steal + driver RSS around
every pass — the evidence VERDICT r17 asked for to separate external
contention from a self-inflicted 32-way memory-footprint pathology.

Configs:
  r17  — current defaults (alloc tuning + pinned pre-touched heap)
  r16  — WUKONG_NO_ALLOC_TUNING=1 WUKONG_JVM_TUNING=0 (the r16 shape)
  mix1 — alloc tuning ON, JVM tuning OFF
  mix2 — alloc tuning OFF, JVM tuning ON

Usage: python tools/ab_config.py [config ...]  (default: r17 r16)
Writes one JSON line per config to stdout and a full log to
/tmp/ab_config_<config>.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

QUERIES = os.environ.get(
    "AB_QUERIES",
    "la_cholesky_check,la_svd_ts_ref,q1_pricing_summary,q6_forecast_revenue",
)
PASSES = int(os.environ.get("AB_PASSES", "4"))

CONFIGS = {
    "r17": {},
    "r16": {"WUKONG_NO_ALLOC_TUNING": "1", "WUKONG_JVM_TUNING": "0"},
    "mix1": {"WUKONG_JVM_TUNING": "0"},
    "mix2": {"WUKONG_NO_ALLOC_TUNING": "1"},
}

_CHILD = r"""
import json, os, resource, sys, time
sys.path.insert(0, os.environ["AB_REPO"])

def host_sample():
    s = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            if k in ("MemAvailable", "MemFree"):
                s[k] = int(v.split()[0])
    with open("/proc/stat") as f:
        s["steal_j"] = int(f.readline().split()[8])
    s["rss_self_kb"] = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    s["t"] = time.time()
    return s

from wukong_spark.queries import load_all
from wukong_spark.session import get_spark, release_pending

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
reg = load_all()
names = os.environ["AB_QUERIES"].split(",")
spark = get_spark("ab-config")
spark.sparkContext.setLogLevel("ERROR")
# same warmup as bench.py
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite").save()
spark.range(0, 64, 1, 32).mapInArrow(lambda it: it, "id long").write.format("noop").mode("overwrite").save()
from wukong_spark.blockmatrix import BlockMatrix
_bm = BlockMatrix.random(spark, 128, 32, 32, 32, seed=1)
_q, _ = _bm.tsqr()
_q.gramian()
_bm.matmul(_bm.transpose()).subtract(_bm.matmul(_bm.transpose())).max_abs()

out = {"queries": {}, "host": []}
n_passes = int(os.environ.get("AB_PASSES", "4"))
for name in names:
    spec = reg[name]
    passes, samples = [], []
    for i in range(n_passes):
        s0 = host_sample()
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        s1 = host_sample()
        passes.append(round(dt, 3))
        samples.append({"before": s0, "after": s1})
        spark.catalog.clearCache()
        release_pending()
    out["queries"][name] = {"passes": passes, "samples": samples}
    print(f"## {name}: {passes}", file=sys.stderr)
json.dump(out, open(os.environ["AB_OUT"], "w"))
spark.stop()
"""


def main() -> None:
    configs = sys.argv[1:] or ["r17", "r16"]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cfg in configs:
        env = dict(os.environ)
        env.update(CONFIGS[cfg])
        env["AB_REPO"] = here
        env["AB_QUERIES"] = QUERIES
        env["AB_PASSES"] = str(PASSES)
        env["AB_OUT"] = f"/tmp/ab_config_{cfg}.json"
        r = subprocess.run(
            [sys.executable, "-c", _CHILD], env=env, capture_output=True, text=True
        )
        if r.returncode != 0:
            print(f"{cfg}: FAILED\n{r.stderr[-2000:]}")
            continue
        d = json.load(open(env["AB_OUT"]))
        summary = {q: v["passes"] for q, v in d["queries"].items()}
        print(json.dumps({"config": cfg, "passes": summary}))


if __name__ == "__main__":
    main()
