#!/usr/bin/env python3
"""End-to-end CDC quickstart — the Spark-native version of the
reference's readme smoke loop (readme.md:108-130: INSERT into
dataschema.assets / dataschema.anomaly → inspect cdc.event_log →
see events on the cdc-* topics).

Run:  python3 examples/cdc_quickstart.py [workdir]

Walks the full pipeline on a throwaway directory:
  1. seed the assets table, apply an insert + update + delete batch
  2. capture: snapshot diff → envelope rows → event log append
     (dense event ids, date partitions)
  3. inspect the log (the `SELECT * FROM cdc.event_log` step)
  4. deliver: structured-streaming fan-out to cdc-<table> topic dirs
  5. consume: per-topic reads + latest-state replay == final table
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from timescale_cdc_spark.cdc import EventLog, cdc_transform, latest_state
from timescale_cdc_spark.schemas import ASSETS_SCHEMA
from timescale_cdc_spark.session import get_spark
from timescale_cdc_spark.streaming.pipeline import CdcStreamPipeline

T0 = dt.datetime(2025, 6, 1, 12, 0, 0)


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="cdc_quickstart_"
    )
    spark = get_spark(app_name="cdc_quickstart", master="local[4]",
                      shuffle_partitions=4)
    log = EventLog(spark, f"{workdir}/event_log")

    def assets(rows):
        return spark.createDataFrame(rows, schema=ASSETS_SCHEMA)

    # 1. the reference's seed data (init.sql:97-101) + readme's inserts
    states = [
        [],
        [(1, "Water Pump", "WP001", T0, T0),
         (2, "Steam Trap", "STM002", T0, T0),
         (3, "Compressor", "CMP003", T0, T0)],
        # readme.md:110 INSERT Boiler + an update and a delete
        [(1, "Water Pump XL", "WP001", T0, T0),
         (3, "Compressor", "CMP003", T0, T0),
         (4, "Boiler", "BLR004", T0, T0)],
    ]

    # 2. capture each transition into the shared event log
    for i in range(1, len(states)):
        ts = T0 + dt.timedelta(minutes=i)
        n = log.append(
            cdc_transform(assets(states[i - 1]), assets(states[i]),
                          "id", "dataschema", "assets", F.lit(ts))
        )
        print(f"batch {i}: captured {n} change events")

    # 3. inspect — `SELECT * FROM cdc.event_log` (readme.md:119-121)
    print("\ncdc.event_log:")
    log.read().orderBy("event_id").select(
        "event_id", "ts", "table_name", "operation", "after"
    ).show(truncate=45)

    # 4. deliver to cdc-<table> topics (the Kafka Connect step,
    #    cdc-timescale-connector.json:15-16) — availableNow drains the
    #    backlog exactly once and stops
    pipe = CdcStreamPipeline(
        spark, log, f"{workdir}/topics",
        tables=[("dataschema", "assets")],
    )
    q = pipe.start(available_now=True)
    q.awaitTermination(120)

    # 5. consume the topic + replay to current state
    delivered = pipe.read_topic("assets")
    print(f"topic cdc-assets: {delivered.count()} events delivered")
    final = latest_state(log.read_table("dataschema", "assets"),
                         "id", ASSETS_SCHEMA)
    print("\nreplayed current state (must equal the final table):")
    final.orderBy("id").select("id", "name", "serialnumber").show()

    got = {(r["id"], r["name"]) for r in final.collect()}
    want = {(r[0], r[1]) for r in states[-1]}
    assert got == want, f"replay mismatch: {got} != {want}"
    print("OK: replayed state equals the final table")
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
