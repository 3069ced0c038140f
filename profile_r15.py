#!/usr/bin/env python3
"""Round-15 optimization profiler: per-query and per-subtree timings
with stage-level REST metrics (guide §1/§7.1).

Usage:
    python3 profile_r15.py <mode> [args]

Modes:
    entry <name> [runs]   construct+count a registered entry, min-of-N,
                          with construction time split out
    families <name>       per-family noop timings for a mega entry
    stages <name>         run entry once, then dump per-stage metrics
                          (executorCpuTime, shuffle bytes) from REST

Runs on local[$SPARK_GRAFT_CPUS or 32] at $SPARK_GRAFT_SF_DIR or
sf0.1 with the Spark UI enabled so the REST API is reachable.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark_ui():
    from timescale_cdc_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    return get_spark(
        app_name="profile_r15",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )


def rest(path: str):
    url = f"http://localhost:4049/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def mode_entry(name: str, runs: int = 3) -> None:
    from timescale_cdc_spark.queries import QUERIES

    spark = get_spark_ui()
    best_c = best_t = float("inf")
    for i in range(runs):
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = df.count()
        t = time.perf_counter() - t0
        best_c, best_t = min(best_c, c), min(best_t, t)
        print(f"run{i}: construct {c:.3f}s count {t:.3f}s rows {n}",
              flush=True)
    print(f"BEST {name}: construct {best_c:.3f}s count {best_t:.3f}s "
          f"total {best_c + best_t:.3f}s", flush=True)


def mode_families(name: str) -> None:
    from pyspark.sql import functions as F

    from timescale_cdc_spark.queries import QUERIES

    spark = get_spark_ui()
    t0 = time.perf_counter()
    df = QUERIES[name](spark, SF_DIR)
    print(f"_construct {time.perf_counter() - t0:.3f}s", flush=True)
    fams = [r[0] for r in df.select("family").distinct().collect()]
    for fam in sorted(fams):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.filter(F.col("family") == fam).count()
            best = min(best, time.perf_counter() - t0)
        print(f"{fam}: {best:.3f}s", flush=True)


def mode_stages(name: str) -> None:
    from timescale_cdc_spark.queries import QUERIES

    spark = get_spark_ui()
    # warm pass first so codegen/scan caches don't pollute
    QUERIES[name](spark, SF_DIR).count()
    apps = rest("applications")
    app_id = apps[0]["id"]
    before = {s["stageId"] for s in rest(f"applications/{app_id}/stages")}
    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.perf_counter()
    QUERIES[name](spark, SF_DIR).count()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    stages = [
        s
        for s in rest(f"applications/{app_id}/stages")
        if s["stageId"] not in before and s["status"] == "COMPLETE"
    ]
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"wall {wall:.3f}s; {len(stages)} new stages "
          "(sorted by executorRunTime):", flush=True)
    for s in stages[:25]:
        print(
            f"  stage {s['stageId']} tasks={s['numCompleteTasks']} "
            f"run={s['executorRunTime'] / 1e3:.2f}s "
            f"cpu={s.get('executorCpuTime', 0) / 1e9:.2f}s "
            f"sRead={s.get('shuffleReadBytes', 0) >> 20}MB "
            f"sWrite={s.get('shuffleWriteBytes', 0) >> 20}MB "
            f"in={s.get('inputBytes', 0) >> 20}MB "
            f"| {s.get('description') or s['name'][:80]}",
            flush=True,
        )


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "entry":
        mode_entry(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif mode == "families":
        mode_families(sys.argv[2])
    elif mode == "stages":
        mode_stages(sys.argv[2])
    else:
        raise SystemExit(f"unknown mode {mode}")
