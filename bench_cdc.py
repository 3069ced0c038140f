#!/usr/bin/env python3
"""CDC-pipeline throughput benchmark: the capture → append → route →
replay path at volume (default 1M events), printing one JSON line.

The reference's delivery path is Kafka Connect polling every 5 s with
tasks.max=1 (readme.md:54, connector json:12) — a single-threaded
row-at-a-time JDBC loop. This measures our columnar equivalents:

  append    — envelope write with dense event_id assignment (A5/A6/A9)
  route     — filtered per-table view scan over the log (A11/B4)
  replay    — latest-state reconstruction, last-event-wins (B30)
  poll      — incremental (ts, event_id) offset scan (B1)

Usage: python bench_cdc.py [n_events]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from timescale_cdc_spark.cdc import EventLog, latest_state
from timescale_cdc_spark.cdc.incremental import IncrementalPoller
from timescale_cdc_spark.session import get_spark
from pyspark.sql import types as T

ROW_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="bench_cdc")
    root = tempfile.mkdtemp(prefix="bench_cdc_")
    log = EventLog(spark, f"{root}/log")

    # Synthetic envelope: n events over 200k keys across 4 tables,
    # INSERT/UPDATE/DELETE mix, one day of timestamps.
    env = (
        spark.range(n)
        .select(
            F.timestamp_seconds(
                F.lit(1735689600) + (F.col("id") % 86400)
            ).alias("ts"),
            F.lit("dataschema").alias("schema_name"),
            F.concat(F.lit("t"), (F.col("id") % 4).cast("string")).alias(
                "table_name"
            ),
            F.when(F.col("id") % 10 == 0, "DELETE")
            .when(F.col("id") % 3 == 0, "INSERT")
            .otherwise("UPDATE")
            .alias("operation"),
            F.lit(None).cast("string").alias("before"),
            F.to_json(
                F.struct(
                    (F.col("id") % 200000).alias("id"), F.col("id").alias("v")
                )
            ).alias("after"),
        )
    )

    t0 = time.perf_counter()
    written = log.append(env)
    t_append = time.perf_counter() - t0

    t0 = time.perf_counter()
    routed = log.read_table("dataschema", "t1").count()
    t_route = time.perf_counter() - t0

    t0 = time.perf_counter()
    state_rows = latest_state(
        log.read_table("dataschema", "t2"), "id", ROW_SCHEMA
    ).count()
    t_replay = time.perf_counter() - t0

    poller = IncrementalPoller(f"{root}/offset.json", start_ts="2025-01-01 00:00:00")
    t0 = time.perf_counter()
    polled = poller.poll(log.read()).count()
    t_poll = time.perf_counter() - t0

    shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "cdc_pipeline_events_per_sec",
                "value": round(written / t_append, 1),
                "unit": "events/sec",
                "n_events": written,
                "stages_sec": {
                    "append_with_id_assignment": round(t_append, 3),
                    "route_one_table": round(t_route, 3),
                    "replay_latest_state": round(t_replay, 3),
                    "incremental_poll": round(t_poll, 3),
                },
                "rows": {
                    "routed": routed,
                    "replayed_state": state_rows,
                    "polled": polled,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
