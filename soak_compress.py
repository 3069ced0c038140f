#!/usr/bin/env python3
"""Compression soak: the compress_chunk analog at realistic chunk
size — one day of CDC envelopes (rows_per_day micro-batch appends of
repetitive table/op/JSON payloads, the event-log shape), then
``compress_partition`` (segment/order sort + zstd). Reports
bytes_before/bytes_after/ratio and verifies content equality.

Usage: python soak_compress.py [rows_per_day] [batches]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timescale_cdc_spark.cdc.log import EventLog  # noqa: E402
from timescale_cdc_spark.cdc.retention import (  # noqa: E402
    compress_partition,
)
from timescale_cdc_spark.session import get_spark  # noqa: E402

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="soak_compress")
    root = os.path.join(tempfile.gettempdir(), "timescale_cdc_spark_io",
                        "soak_compress")
    shutil.rmtree(root, ignore_errors=True)
    log = EventLog(spark, os.path.join(root, "log"))

    per_batch = rows // batches
    for b in range(batches):
        batch = spark.range(per_batch).select(
            F.lit("dataschema").alias("schema_name"),
            F.concat(
                F.lit("t"), (F.col("id") % 5).cast("string")
            ).alias("table_name"),
            F.element_at(
                F.array(F.lit("INSERT"), F.lit("UPDATE"), F.lit("DELETE")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("operation"),
            F.timestamp_seconds(
                F.lit(int(T0.timestamp())) + (F.col("id") % 86400)
            ).alias("ts"),
            F.to_json(
                F.struct(
                    (F.col("id") % 1000).alias("asset_id"),
                    F.concat(F.lit("Pump Model "),
                             (F.col("id") % 7).cast("string")).alias("name"),
                    F.concat(F.lit("SN"),
                             (F.col("id") % 97).cast("string")).alias("sn"),
                )
            ).alias("after"),
        ).withColumn("before", F.lit(None).cast("string"))
        log.append(batch, distributed_ids=True)

    n0 = log.read().count()
    checksum0 = log.read().agg(
        F.sum(F.xxhash64("event_id", "table_name", "operation", "after").cast("decimal(38,0)"))
    ).collect()[0][0]
    t0 = time.time()
    stats = compress_partition(log, T0.date())
    elapsed = round(time.time() - t0, 2)
    assert stats["rows"] == n0
    assert log.read().count() == n0
    checksum1 = log.read().agg(
        F.sum(F.xxhash64("event_id", "table_name", "operation", "after").cast("decimal(38,0)"))
    ).collect()[0][0]
    assert checksum0 == checksum1

    print(json.dumps({
        "soak": "compress_chunk",
        "rows": n0,
        "batches": batches,
        "bytes_before": stats["bytes_before"],
        "bytes_after": stats["bytes_after"],
        "ratio": round(stats["bytes_before"] / stats["bytes_after"], 2),
        "compress_s": elapsed,
    }))


if __name__ == "__main__":
    main()
