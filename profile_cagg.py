#!/usr/bin/env python3
"""Round-15 cagg profiler: split cdc_continuous_aggregate's per-pass
cost and interleaved-A/B the two candidate changes (guide §1.2):

  A = current entry shape
  B = bounds-free cascade (start_s=0 passed, skipping the min/max
      bounds job) + the hourly real-time view materialized ONCE
      (localCheckpoint) instead of evaluated in both union branches

Both variants rebuild the caggs from scratch every rep (rmtree first),
exactly like the registered entry — no cross-rep state. Output-identity
is checked once with exceptAll both ways before timing.

Usage: python3 profile_cagg.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SPLIT_S = 1705708800  # 2024-01-20T00:00:00Z — the entry's constant


def build(spark, variant: str):
    from pyspark.sql import functions as F

    from timescale_cdc_spark.cdc.caggs import (
        ContinuousAggregate,
        cascade_refresh,
        query_hierarchy,
    )
    from timescale_cdc_spark.queries.base import scratch_path, t

    path_h = scratch_path(SF_DIR, f"cagg_prof_hour_{variant}")
    path_d = scratch_path(SF_DIR, f"cagg_prof_day_{variant}")
    shutil.rmtree(path_h, ignore_errors=True)
    shutil.rmtree(path_d, ignore_errors=True)

    def hour_aggs():
        return [
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        ]

    def day_aggs():
        return [
            F.sum("n").alias("n"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        ]

    ev = t(spark, SF_DIR, "events")
    hour = ContinuousAggregate(
        spark, path_h, "1 hour", "ts", ["event_type"], hour_aggs
    )
    day = ContinuousAggregate(
        spark, path_d, "1 day", "bucket", ["event_type"], day_aggs
    )
    t0 = time.perf_counter()
    if variant == "A":
        cascade_refresh([hour, day], ev, end_s=SPLIT_S)
    else:
        cascade_refresh([hour, day], ev, start_s=0, end_s=SPLIT_S)
    refresh_s = time.perf_counter() - t0

    def project(df, level):
        return df.select(
            F.lit(level).alias("level"),
            "event_type",
            "bucket",
            "n",
            F.col("sum_dec").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
        )

    if variant == "A":
        out = project(hour.query(ev), "hour").unionByName(
            project(query_hierarchy([hour, day], ev), "day")
        )
    else:
        hv = hour.query(ev).localCheckpoint(eager=False)
        out = project(hv, "hour").unionByName(project(day.query(hv), "day"))
    return out, refresh_s


def main() -> None:
    from timescale_cdc_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="profile_cagg")

    # output identity first (exceptAll both ways must be empty)
    a, _ = build(spark, "A")
    b, _ = build(spark, "B")
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(f"identity: exceptAll A-B={d1} B-A={d2}", flush=True)
    assert d1 == 0 and d2 == 0, "variants disagree — abort"

    res: dict[str, list[tuple[float, float]]] = {"A": [], "B": []}
    # warmup one of each
    for v in ("A", "B"):
        df, _ = build(spark, v)
        df.count()
    for i in range(reps):
        for v in ("A", "B"):
            t0 = time.perf_counter()
            df, refresh_s = build(spark, v)
            n = df.count()
            total = time.perf_counter() - t0
            res[v].append((refresh_s, total))
            print(
                f"rep{i} {v}: refresh {refresh_s:.3f}s total {total:.3f}s "
                f"rows {n}",
                flush=True,
            )
    for v in ("A", "B"):
        rs = sorted(x[0] for x in res[v])
        ts = sorted(x[1] for x in res[v])
        print(
            f"{v}: refresh min {rs[0]:.3f} med {rs[len(rs) // 2]:.3f} | "
            f"total min {ts[0]:.3f} med {ts[len(ts) // 2]:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
