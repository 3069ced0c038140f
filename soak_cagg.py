#!/usr/bin/env python3
"""Continuous-aggregate soak: prove the 100 TB claim that INCREMENTAL
refresh cost is O(refresh window), not O(table), as the source grows.

Scenario: a day-partitioned event source grows one day at a time
(rows_per_day synthetic events, n_keys series). After each day's
append the cagg is refreshed on THAT day's window only. Every
``full_every`` days the equivalent one-shot full recompute is timed
for comparison — the per-day refresh curve must stay flat while the
full-recompute curve grows with the table.

Invariants checked in-run:
- after every refresh, materialized() row count == keys × buckets
  seen so far (every bucket materialized exactly once);
- at the end, the real-time view over the full source equals the
  one-shot aggregate EXACTLY (collected and compared);
- a final mid-history backfill (late data into day 1) is refreshed
  against the FULL source and only corrects that day.

Prints one JSON line for SCALE.md.

Usage: python soak_cagg.py [days] [rows_per_day] [n_keys]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timescale_cdc_spark.cdc.caggs import ContinuousAggregate  # noqa: E402
from timescale_cdc_spark.session import get_spark  # noqa: E402

DAY0 = 1704067200  # 2024-01-01T00:00:00Z


def day_batch(spark, day: int, rows: int, n_keys: int):
    """Deterministic synthetic day: rows spread across the day's
    seconds, keys round-robin, 2-dp values."""
    return spark.range(rows).select(
        F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")).alias(
            "k"
        ),
        F.timestamp_seconds(
            F.lit(DAY0 + day * 86400) + (F.col("id") * 37 % 86400)
        ).alias("ts"),
        (F.round((F.col("id") * 7919 % 10000) / 100.0, 2)).alias("v"),
    )


def aggs():
    return [
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    ]


def full_agg(src):
    eb = F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("long") * 3600
    return (
        src.withColumn("_eb", eb)
        .groupBy("k", "_eb")
        .agg(*aggs())
        .withColumn("bucket", F.timestamp_seconds("_eb"))
        .drop("_eb")
    )


def main() -> None:
    days = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows_per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    full_every = 5

    spark = get_spark(app_name="soak_cagg")
    root = os.path.join(tempfile.gettempdir(), "timescale_cdc_spark_io",
                        "soak_cagg")
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "events")
    cagg = ContinuousAggregate(
        spark, os.path.join(root, "cagg"), "1 hour", "ts", ["k"], aggs
    )

    refresh_s: list[float] = []
    full_s: dict[int, float] = {}
    for day in range(days):
        batch = day_batch(spark, day, rows_per_day, n_keys)
        batch.withColumn("d", F.to_date("ts")).write.mode(
            "append"
        ).partitionBy("d").parquet(src_dir)
        src = spark.read.parquet(src_dir)
        t0 = time.time()
        cagg.refresh(
            src,
            start_s=DAY0 + day * 86400,
            end_s=DAY0 + (day + 1) * 86400,
        )
        dt_r = time.time() - t0
        refresh_s.append(round(dt_r, 2))
        n_mat = cagg.materialized().count()
        expect = n_keys * 24 * (day + 1)
        assert n_mat == expect, (day, n_mat, expect)
        if (day + 1) % full_every == 0:
            t0 = time.time()
            full_agg(src).count()
            full_s[day + 1] = round(time.time() - t0, 2)
        print(
            f"day {day:02d}: refresh {dt_r:5.2f}s  mat_rows {n_mat}",
            flush=True,
        )

    # exactness of the real-time view over the whole history
    src = spark.read.parquet(src_dir)
    rt = {
        tuple(r)
        for r in cagg.query(src).select("k", "bucket", "n", "sum_v").collect()
    }
    full = {
        tuple(r)
        for r in full_agg(src).select("k", "bucket", "n", "sum_v").collect()
    }
    assert rt == full, "real-time view diverged from one-shot aggregate"

    # late-data backfill into day 1, refreshed against the FULL source
    late = day_batch(spark, 1, 1000, n_keys).withColumn(
        "v", F.lit(999.99)
    )
    late.withColumn("d", F.to_date("ts")).write.mode("append").partitionBy(
        "d"
    ).parquet(src_dir)
    src = spark.read.parquet(src_dir)
    t0 = time.time()
    cagg.refresh(src, start_s=DAY0 + 86400, end_s=DAY0 + 2 * 86400)
    backfill_t = round(time.time() - t0, 2)
    rt2 = {
        tuple(r)
        for r in cagg.materialized().select("k", "bucket", "n", "sum_v").collect()
    }
    full2 = {
        tuple(r)
        for r in full_agg(src).select("k", "bucket", "n", "sum_v").collect()
    }
    assert rt2 == full2, "backfill refresh diverged"

    # Input-pruning evidence (the actual 100 TB claim): a one-day
    # refresh window's source scan touches one day's files, not the
    # table — the window filter prunes on the d= partition values'
    # parquet stats (ts min/max per file).
    last_window = src.filter(
        (F.col("ts") >= F.timestamp_seconds(F.lit(DAY0 + (days - 1) * 86400)))
        & (F.col("ts") < F.timestamp_seconds(F.lit(DAY0 + days * 86400)))
    )
    files_window = (
        last_window.select(F.input_file_name().alias("f")).distinct().count()
    )
    files_total = src.select(F.input_file_name().alias("f")).distinct().count()

    print(
        json.dumps(
            {
                "days": days,
                "rows_per_day": rows_per_day,
                "n_keys": n_keys,
                "refresh_s": refresh_s,
                "full_recompute_s": full_s,
                "backfill_day1_s": backfill_t,
                "final_source_rows": src.count(),
                "final_mat_rows": cagg.materialized().count(),
                "window_files_touched": files_window,
                "total_files": files_total,
            }
        )
    )


if __name__ == "__main__":
    main()
