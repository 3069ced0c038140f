#!/usr/bin/env python3
"""End-to-end time-series quickstart — the hypertable query surface
(the workloads the reference creates hypertables for, init.sql:69-72)
on the events fixture, one family per step:

  1. bucketed hyperaggs + gapfill (time_bucket_gapfill/locf/twa)
  2. a continuous aggregate + a daily level stacked on it
     (cascade_refresh) with the real-time hierarchy view
  3. state_agg / heartbeat_agg: time-in-state and liveness per user
  4. freq_agg/topn: heavy hitters per day with error bounds
  5. dashboard downsampling: M4 pre-thin -> LTTB, and ASAP smoothing

Run:  python3 examples/timeseries_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from timescale_cdc_spark.catalog import load_table
from timescale_cdc_spark.cdc.caggs import (
    ContinuousAggregate,
    cascade_refresh,
    query_hierarchy,
)
from timescale_cdc_spark.functions.freq import freq_agg, topn
from timescale_cdc_spark.functions.hyper import time_bucket_gapfill
from timescale_cdc_spark.functions.state import (
    duration_in,
    heartbeat_summary,
    state_agg,
)
from timescale_cdc_spark.operators.downsample import (
    asap_smooth,
    lttb,
    m4_downsample,
)
from timescale_cdc_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="timeseries_quickstart")
    ev = load_table(spark, sf_dir, "events")

    print("== 1. gapfilled hourly hyperaggs (per event_type) ==")
    filled = time_bucket_gapfill(
        ev, "1 hour", "ts", ["event_type"], "value", "event_id"
    )
    filled.orderBy("event_type", "bucket").show(6, truncate=False)

    print("== 2. hourly cagg + daily level (hierarchy) ==")
    root = tempfile.mkdtemp(prefix="ts_quickstart_")
    try:
        hourly = ContinuousAggregate(
            spark, os.path.join(root, "h"), "1 hour", "ts",
            ["event_type"],
            lambda: [
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_v"),
            ],
        )
        daily = ContinuousAggregate(
            spark, os.path.join(root, "d"), "1 day", "bucket",
            ["event_type"],
            lambda: [
                F.sum("n").alias("n"),
                F.sum("sum_v").alias("sum_v"),
            ],
        )
        cascade_refresh([hourly, daily], ev)
        print("daily (materialized from hourly partials):")
        daily.materialized().select(
            "event_type", "bucket", "n", "sum_v"
        ).orderBy("event_type", "bucket").show(5)
        print("real-time hierarchy view (exact at any refresh lag):")
        query_hierarchy([hourly, daily], ev).orderBy(
            "event_type", "bucket"
        ).show(5)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print("== 3. time-in-state + liveness per user ==")
    st = state_agg(ev, "ts", ["user_id"], "event_type", "event_id",
                   "1 day")
    st.select(
        "user_id", "bucket", "n_transitions",
        duration_in("durs", "error").alias("error_us"),
    ).orderBy(F.desc("error_us")).show(5)
    heartbeat_summary(ev, "ts", ["user_id"], "10 minutes", "1 day").select(
        "user_id", "bucket", "live_us", "n_ranges", "uptime"
    ).orderBy(F.desc("uptime")).show(5)

    print("== 4. daily heavy hitters with error bounds ==")
    agg = freq_agg(ev, "ts", ["user_id"], "event_type", "1 day",
                   max_size=8)
    topn(agg, 2, ["user_id"]).orderBy(
        "user_id", "bucket", F.desc("min_freq")
    ).show(8)

    print("== 5. dashboard downsampling ==")
    thinned = m4_downsample(ev, ["event_type"], "ts", "value",
                            "1 hour").drop("bucket")
    pts = lttb(thinned, ["event_type"], "ts", "value", 50)
    print(f"M4 pre-thin -> LTTB: {ev.count()} events -> "
          f"{pts.count()} plot points")
    sm = asap_smooth(ev, ["event_type"], "ts", "value", resolution=100)
    print(f"ASAP smoothed series points: {sm.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
