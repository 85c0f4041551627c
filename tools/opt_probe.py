"""Per-query optimization probe (round 13, guide §1).

For each named registry query: warm at sf0.001 (codegen) + once at the
target SF (page cache), then time median-of-N noop-sink runs, and pull
job/stage/task counts + cumulative task time for the timed window from
the live UI REST API (the probe session enables the UI; bench.py keeps
it off). Optionally dumps .explain("formatted") to plans/r13/.

Usage:
  python -u tools/opt_probe.py q1_pricing_summary mm8_jpeg_roundtrip
  python -u tools/opt_probe.py --explain-dir plans/r13 --suffix before all
  (``all`` = the bench HEADLINE list)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPEATS = 3


def _ui_json(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def normalize_plan(plan: str) -> str:
    """Strip the volatile tokens from a formatted explain dump so
    "plan unchanged" claims are mechanically checkable by diff
    (VERDICT r13 #10): expression IDs (#123 -> #x — fresh analysis
    renumbers them every session while the structure is identical),
    AQE plan ids, and tempdir paths (plans whose fixtures live under
    mkdtemp roots). Column NAMES, operator order, join strategies,
    PushedFilters and ReadSchema all survive — a structural change
    still diffs."""
    import re

    plan = re.sub(r"#\d+", "#x", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
    plan = re.sub(r"/tmp/\S+", "/tmp/X", plan)
    # checkpoint/createDataFrame leaves (Scan ExistingRDD) print the
    # session-lifetime RDD id — pure sequence noise
    plan = re.sub(r"RDD\[\d+\]", "RDD[x]", plan)
    return plan


def _job_window_stats(port: int, app_id: str, first_job: int) -> dict:
    jobs = [
        j
        for j in _ui_json(port, f"applications/{app_id}/jobs")
        if j["jobId"] >= first_job
    ]
    n_stages = sum(len(j["stageIds"]) for j in jobs)
    n_tasks = sum(j["numTasks"] for j in jobs)
    return {"jobs": len(jobs), "stages": n_stages, "tasks": n_tasks}


def main() -> None:
    import gc

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain_dir = None
    suffix = "before"
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--explain-dir":
            explain_dir = argv[i + 1]
        if a == "--suffix":
            suffix = argv[i + 1]
    args = [
        a
        for i, a in enumerate(argv)
        if not a.startswith("--") and (i == 0 or argv[i - 1] not in ("--explain-dir", "--suffix"))
    ]

    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    from migrator_spark.plans.registry import REGISTRY
    from migrator_spark.session import get_spark

    names = []
    for a in args:
        if a == "all":
            import bench

            names.extend(bench.HEADLINE)
        else:
            names.append(a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[-1]) if sc.uiWebUrl else 4040
    app_id = sc.applicationId
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"?? {name}: not in registry")
            continue
        if os.path.isdir(warm_dir):
            spec.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        if explain_dir:
            Path(explain_dir).mkdir(parents=True, exist_ok=True)
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (Path(explain_dir) / f"{name}_{suffix}.txt").write_text(
                normalize_plan(plan)
            )
        # warm at target SF
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        gc.collect()
        sc._jvm.System.gc()
        time.sleep(0.2)
        try:
            first_job = max(
                (j["jobId"] for j in _ui_json(port, f"applications/{app_id}/jobs")),
                default=-1,
            ) + 1
        except Exception:
            first_job = -1
        walls = []
        for _ in range(REPEATS):
            sc.setJobDescription(f"opt-probe:{name}")
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            sc.setJobDescription(None)
        med = statistics.median(walls)
        stats = {}
        if first_job >= 0:
            try:
                stats = _job_window_stats(port, app_id, first_job)
                for k in stats:
                    stats[k] = round(stats[k] / REPEATS, 1)
            except Exception as exc:
                stats = {"err": str(exc)[:60]}
        results[name] = round(med, 3)
        print(
            f"{name}: median {med:.3f}s  walls={[round(w, 3) for w in walls]}  "
            f"per-run {stats}",
            flush=True,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
