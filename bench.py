"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE compact JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The line is kept small (< 4 KB, self-checked) because the driver captures
only a stdout tail — round 5's per-pass/per-stage diagnostics inflated the
line past the capture window and the driver recorded "parsed": null
(VERDICT r5 §wrong).  Diagnostics now land in a sidecar FILE instead:
BENCH_STAGES_r{N}.json next to this script, holding {"passes": {...},
"stages": {...}} — committed alongside the round artifacts.

Timing policy (VERDICT r4 #2 — variance-proofing on unknown hosts):
- every query gets best-of-2 (steady-state latency, not GC/JIT noise);
- HEAVY queries (first pass > 5 s) get up to 3 passes, stopping early
  when the two best passes agree within 15 % — the la_* workloads swing
  ±25-90 % on slower hosts and a single unlucky pass must not define the
  round's number;
- if the best two STILL disagree by > 25 % after 3 passes, a 4th runs
  (VERDICT r9 #1 — a contended host can poison two of three passes);
- a pathological first pass (> 90 s) skips retries (bounded wall-clock);
- contended-host flag: the cheap code-stable canaries (q1/q3/q5/q6) are
  compared against committed sidecar history at the same sf; if a
  majority run > 30 % over their median historical best the JSON line
  carries "contended": true so the artifact itself says "host noise,
  not plans".

Stage sidecar (VERDICT r4 #6): per-stage executor-run millis + shuffle
bytes for every query's FIRST pass, read from the Spark UI REST API, so
host-speed vs plan-regression arguments are settled by data: a plan
regression shows up as new stages / more shuffle bytes, a slow host as
uniformly scaled run times on identical stages.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wukong_spark.queries import load_all
from wukong_spark.session import get_spark, release_pending

HEAVY_THRESHOLD_S = 5.0
# r14: retire la_gemm_ref's 1.5-2x cold first pass.  r18 (VERDICT r17
# Next #4): la_cholesky_check gets the same uncounted settle pass — its
# r17 official number was a single 109.8 s cold pass on the slow-fault
# host (the 32-way first-touch collapse, see wukong_spark/_alloc.py),
# while its steady state is ~6.5 s; one settle pass plus the arena warm
# wave below measure the query, not the host's page-fault path.
WARMUP_UNCOUNTED = {"la_gemm_ref", "la_cholesky_check"}
PATHOLOGICAL_S = 90.0
AGREE_PCT = 0.15
DISAGREE_4TH_PASS_PCT = 0.25  # best two > 25 % apart after 3 passes → 4th
#: cheap, code-stable reference queries whose steady-state latency has not
#: changed since r1 — if THESE inflate vs sidecar history the host is
#: contended, not the plans (r8/r9 both lost their official number to this)
CANARIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
)
CONTENDED_PCT = 0.30


def _fetch_stages(spark) -> list[dict]:
    """Completed stages from the UI REST API ([] if the UI is off)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    if not base:
        return []
    try:
        url = f"{base}/api/v1/applications/{app}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=5) as r:
            return json.loads(r.read())
    except Exception:
        return []


def _new_stage_rows(spark, seen: set) -> list[dict]:
    """Compact rows for stages not yet attributed to an earlier query."""
    rows = []
    for s in _fetch_stages(spark):
        sid = (s.get("stageId"), s.get("attemptId"))
        if sid in seen:
            continue
        seen.add(sid)
        ms = int(s.get("executorRunTime", 0))
        if ms == 0:
            continue
        rows.append(
            {
                "id": s.get("stageId"),
                "name": str(s.get("name", "")).split(" at ")[0][:48],
                "run_ms": ms,
                "tasks": s.get("numTasks", 0),
                "shuf_r_mb": round(s.get("shuffleReadBytes", 0) / 1048576, 1),
                "shuf_w_mb": round(s.get("shuffleWriteBytes", 0) / 1048576, 1),
                "input_mb": round(s.get("inputBytes", 0) / 1048576, 1),
            }
        )
    return rows


def _canary_history(here: str, rnd: int, sf: float) -> dict[str, list[float]]:
    """Best canary pass times from PRIOR rounds' committed sidecars at the
    same scale factor — the baseline for the contended-host check."""
    hist: dict[str, list[float]] = {}
    for f in os.listdir(here):
        if not (f.startswith("BENCH_STAGES_r") and f.endswith(".json")):
            continue
        digits = f[len("BENCH_STAGES_r") : -len(".json")]
        if not digits.isdigit() or int(digits) >= rnd:
            continue
        try:
            with open(os.path.join(here, f)) as fh:
                d = json.load(fh)
        except (OSError, ValueError):
            continue
        if d.get("sf") != sf:
            continue
        for q in CANARIES:
            ps = (d.get("passes") or {}).get(q)
            if ps:
                hist.setdefault(q, []).append(min(ps))
    return hist


def _is_contended(
    timings: dict[str, float], here: str, rnd: int, sf: float
) -> bool:
    """True when a majority of history-backed canaries run >30 % over
    their median historical best — the uniform-inflation signature of a
    busy host (identical plans, scaled task time).  Lets a judge
    adjudicate slow-host-vs-regression from the artifact alone."""
    hist = _canary_history(here, rnd, sf)
    slow, checked = 0, 0
    for q, bests in hist.items():
        if q not in timings:
            continue
        med = sorted(bests)[len(bests) // 2]
        checked += 1
        ratio = timings[q] / med if med > 0 else 1.0
        if ratio > 1.0 + CONTENDED_PCT:
            slow += 1
        print(f"# canary {q}: {timings[q]:.3f}s vs median-best {med:.3f}s"
              f" (x{ratio:.2f})", file=sys.stderr)
    return checked >= 2 and slow * 2 > checked


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    headline = {n: s for n, s in sorted(reg.items()) if s.headline}
    # UI on for the stage-metrics REST endpoint (one-time jetty startup;
    # the status store itself is maintained regardless)
    spark = get_spark("wukong-spark-bench", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    # warmup (not counted): JVM + parquet footer reads, and the Python/Arrow
    # worker pool — daemon process startup is per-session, not per-query
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(0, 64, 1, 32).mapInArrow(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    # r18 arena warm wave (same per-session class as the worker-pool
    # startup above): on this host first-touch page faults run at
    # ~0.1 GB/s and COLLAPSE under 32-way concurrency (_alloc.py), so a
    # worker's first real task pays seconds of kernel fault time that
    # belongs to the session, not to any query.  One n-task wave faults
    # ~192 MB into every worker's malloc arena; the raised trim threshold
    # keeps those pages resident for every later Arrow/numpy allocation.
    # Re-run before each WARMUP_UNCOUNTED settle pass: Spark CULLS python
    # workers idle > 1 minute (PythonWorkerFactory's hardcoded
    # IDLE_WORKER_TIMEOUT), so by the time the la_ family runs, the
    # session-start wave's arenas are gone (measured: a 90 s idle gap
    # sends la_cholesky_check 6.8 s → 57 s).
    # r18: wave wall-times land in the sidecar as contention evidence —
    # the canary flag under-fires when a contention wave hits only
    # allocation-heavy Python stages (plans/r18/bench_stages_degraded_2097
    # vs the clean 12744 run: la_* ×10 on identical stages, canaries
    # ×1.1-1.4).  A warm-pool wave is ~0.3-3 s quiet; a fault-path
    # collapse inflates it ×10.  Diagnostics only: a cold (idle-culled)
    # pool legitimately slows a wave, so this does NOT feed the
    # contended flag.
    arena_wave_s: list[float] = []

    def _arena_wave():
        n = spark.sparkContext.defaultParallelism

        def _touch_arena(batches):
            import numpy as np

            a = np.empty(192 << 20, dtype=np.uint8)
            a[::4096] = 1
            del a
            yield from batches

        t0 = time.perf_counter()
        spark.range(0, n, 1, n).mapInArrow(
            _touch_arena, "id long"
        ).write.format("noop").mode("overwrite").save()
        arena_wave_s.append(round(time.perf_counter() - t0, 3))

    _arena_wave()
    # warm the block-matrix arrow/binary path end-to-end (worker arrow
    # serializers + codegen for the mapInArrow/applyInPandas plan shapes) —
    # otherwise the first la_* query pays ~8 s of one-time session cost
    from wukong_spark.blockmatrix import BlockMatrix

    _bm = BlockMatrix.random(spark, 128, 32, 32, 32, seed=1)
    _q, _ = _bm.tsqr()
    _q.gramian()
    _bm.matmul(_bm.transpose()).subtract(_bm.matmul(_bm.transpose())).max_abs()

    timings: dict[str, float] = {}
    stage_rows: dict[str, list[dict]] = {}
    pass_log: dict[str, list[float]] = {}
    seen_stages: set = set()
    _new_stage_rows(spark, seen_stages)  # absorb warmup stages

    # heavy linalg workloads run LAST: their GC/memory pressure would
    # otherwise bleed into the next query's measurement (q10 measured 0.8 s
    # in isolation vs 3.8 s right after the 10,000² GEMM); the GEMM itself
    # (the heaviest) runs dead last
    ordered = sorted(
        headline.items(),
        key=lambda kv: (kv[0].startswith("la_"), kv[0] == "la_gemm_ref", kv[0]),
    )
    for name, spec in ordered:
        # drain stages from the previous query's retry passes so the
        # attribution window is exactly THIS query's first pass
        _new_stage_rows(spark, seen_stages)
        if name in WARMUP_UNCOUNTED:
            # r14 (VERDICT r13 item 7): la_gemm_ref's first pass runs
            # 1.5-2x steady state (large-plan codegen + executor memory
            # ramp the small warmup GEMM doesn't reach), poisoning the
            # pass spread and triggering retry passes.  One UNCOUNTED
            # warmup pass retires it; the counted passes then agree
            # within the 15 % early-stop.  r18: preceded by an arena
            # wave — the idle-culled worker pool is otherwise re-warmed
            # inside the counted passes (see _arena_wave).
            _arena_wave()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
            release_pending()
            _new_stage_rows(spark, seen_stages)  # absorb warmup stages
        passes: list[float] = []
        for i in range(4):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # noop sink: forces full materialization of every output column
            # (count() would let Catalyst prune projections/windows away)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            passes.append(dt)
            if i == 0:
                # stage attribution window = first pass only (deterministic)
                stage_rows[name] = _new_stage_rows(spark, seen_stages)
            # caches a query persisted internally must not bleed into the
            # next measurement (or the next pass) — clearCache for SQL
            # caches, release_pending for result-backing localCheckpoint
            # RDDs (the r14 kcore-113s session-state class, leak audit r15)
            spark.catalog.clearCache()
            release_pending()
            if dt > PATHOLOGICAL_S and i >= 1:
                # pathological pass — don't double down on wall-clock.
                # r18 (VERDICT r17 Next #4, additive): a pathological
                # FIRST pass no longer short-circuits to a single-pass
                # number — one retry runs so a lone bad window cannot
                # print a x17 (the la_cholesky_check r17 failure mode);
                # with i >= 1 the retry itself stays bounded.
                break
            if i == 1 and passes[0] <= HEAVY_THRESHOLD_S:
                break  # light query: best-of-2 suffices
            if i >= 1:
                b = sorted(passes)[:2]
                if b[1] - b[0] <= AGREE_PCT * b[0]:
                    break  # two passes agree — stop early
                if i == 2 and b[1] - b[0] <= DISAGREE_4TH_PASS_PCT * b[0]:
                    break  # mild spread after 3 passes: accept the best
                # best two still >25 % apart → take the 4th pass (r9: a
                # contended host can poison two of three passes)
        timings[name] = round(min(passes), 3)
        pass_log[name] = [round(p, 3) for p in passes]
        print(f"# {name}: {timings[name]:.3f}s  passes={pass_log[name]}", file=sys.stderr)

    # absorb any unattributed stages so the sidecar stays per-query
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # sidecar kept for queries worth diagnosing (best > 2 s) to bound size
    stages_out = {
        n: rows for n, rows in stage_rows.items() if timings.get(n, 0) > 2.0 and rows
    }
    # per-pass + per-stage diagnostics go to a FILE, never the stdout line
    # (the driver's tail capture is small; see module docstring)
    here = os.path.dirname(os.path.abspath(__file__))
    # sidecar round number: explicit override first (re-running bench.py
    # before the driver writes BENCH_rNN.json would otherwise overwrite the
    # same sidecar, and a stray BENCH_r file would skew the inference)
    rnd_env = os.environ.get("SPARK_GRAFT_ROUND", "")
    if rnd_env.isdigit():
        rnd = int(rnd_env)
    else:
        rounds = [
            int(f[len("BENCH_r") : -len(".json")])
            for f in os.listdir(here)
            if f.startswith("BENCH_r") and f.endswith(".json") and f[7:-5].isdigit()
        ]
        rnd = (max(rounds) + 1) if rounds else 0
    sidecar = os.path.join(here, f"BENCH_STAGES_r{rnd:02d}.json")
    # never clobber an existing (committed) sidecar unless the caller
    # explicitly pinned the round via SPARK_GRAFT_ROUND (VERDICT r15
    # wrong #1: the driver's run overwrote the committed quiet-host
    # artifact).  Unpinned re-runs land on a pid-suffixed path, which the
    # canary-history scan deliberately ignores (non-digit round field).
    if os.path.exists(sidecar) and not rnd_env.isdigit():
        sidecar = os.path.join(
            here, f"BENCH_STAGES_r{rnd:02d}-{os.getpid()}.json"
        )
    try:
        with open(sidecar, "w") as f:
            json.dump(
                {
                    "passes": pass_log,
                    "stages": stages_out,
                    "sf": float(sf),
                    "arena_wave_s": arena_wave_s,
                },
                f,
            )
        print(f"# stage sidecar -> {sidecar}", file=sys.stderr)
    except OSError as e:  # read-only checkout must not kill the bench line
        print(f"# sidecar write failed: {e}", file=sys.stderr)

    payload = {
        "metric": "headline_queries_e2e",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    # contended-host flag (VERDICT r9 #1): untouched canary queries
    # inflated >30 % over committed sidecar history means the number is
    # host noise, not a plan regression — record that in the artifact
    if _is_contended(timings, here, rnd, float(sf)):
        payload["contended"] = True
        print("# CONTENDED RUN: canary queries uniformly inflated vs"
              " sidecar history", file=sys.stderr)
    line = json.dumps(payload)
    # driver-contract self-check: the line must stay inside the driver's
    # stdout tail capture.  Degrade gracefully (drop per-query detail, keep
    # the total) rather than die — a missing line is the r5 failure mode;
    # no assert, which python -O would strip and whose firing would kill
    # the very output it protects.
    if len(line) >= 4096:
        print(f"# bench line {len(line)} B >= 4 KB — dropping queries detail", file=sys.stderr)
        payload.pop("queries", None)
        line = json.dumps(payload)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
