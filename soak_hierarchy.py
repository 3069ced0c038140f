#!/usr/bin/env python3
"""Hierarchical-cagg soak: a two-level hierarchy (hourly over facts,
daily over the hourly partials) refreshed day-by-day with
cascade_refresh as the source grows — proving the caggs-on-caggs
claims at scale:

- per-day cascade cost stays FLAT as the table grows (level 0 reads
  O(day) facts; level 1 reads O(day) hourly partial rows — never
  facts);
- after every cascade, the daily materialized table equals the
  direct daily aggregate over all COMPLETE days, and
  query_hierarchy equals it over everything;
- a mid-history backfill re-cascades: one hourly day region and one
  daily bucket corrected, full equality restored.

Prints one JSON line for SCALE.md.

Usage: python soak_hierarchy.py [days] [rows_per_day] [n_keys]
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

from timescale_cdc_spark.cdc.caggs import (  # noqa: E402
    ContinuousAggregate,
    cascade_refresh,
    query_hierarchy,
)
from timescale_cdc_spark.session import get_spark  # noqa: E402

DAY0 = 1704067200


def day_batch(spark, day: int, rows: int, n_keys: int):
    return spark.range(rows).select(
        F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")).alias(
            "k"
        ),
        F.timestamp_seconds(
            F.lit(DAY0 + day * 86400)
            + (F.col("id") % 86400)
        ).alias("ts"),
        F.round((F.xxhash64("id") % 10000) / 100.0, 2).alias("v"),
    )


def hourly_aggs():
    return [
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).alias("sum_v"),
    ]


def daily_merge_aggs():
    return [
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
    ]


def daily_direct(src):
    eb = F.floor(F.unix_timestamp(F.col("ts")) / 86400).cast("long") * 86400
    return (
        src.withColumn("_eb", eb)
        .groupBy("k", "_eb")
        .agg(*hourly_aggs())
        .withColumn("bucket", F.timestamp_seconds("_eb"))
        .drop("_eb")
    )


def rows_of(df):
    return {
        (r["k"], str(r["bucket"]), r["n"], float(r["sum_v"]))
        for r in df.select("k", "bucket", "n", "sum_v").collect()
    }


def main() -> None:
    days = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows_per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    spark = get_spark(app_name="soak_hierarchy")
    root = os.path.join(tempfile.gettempdir(), "timescale_cdc_spark_io",
                        "soak_hierarchy")
    shutil.rmtree(root, ignore_errors=True)
    src_dir = os.path.join(root, "events")
    hourly = ContinuousAggregate(
        spark, os.path.join(root, "h"), "1 hour", "ts", ["k"], hourly_aggs
    )
    daily = ContinuousAggregate(
        spark, os.path.join(root, "d"), "1 day", "bucket", ["k"],
        daily_merge_aggs,
    )
    levels = [hourly, daily]

    cascade_s: list[float] = []
    for day in range(days):
        batch = day_batch(spark, day, rows_per_day, n_keys)
        batch.withColumn("d", F.to_date("ts")).write.mode(
            "append"
        ).partitionBy("d").parquet(src_dir)
        src = spark.read.parquet(src_dir)
        t0 = time.time()
        cascade_refresh(
            levels, src,
            start_s=DAY0 + day * 86400,
            end_s=DAY0 + (day + 1) * 86400,
        )
        cascade_s.append(round(time.time() - t0, 2))
        n_daily = daily.materialized().count()
        assert n_daily == n_keys * (day + 1), (day, n_daily)
        print(f"day {day:02d}: cascade {cascade_s[-1]:5.2f}s "
              f"daily_rows {n_daily}", flush=True)

    src = spark.read.parquet(src_dir)
    assert rows_of(daily.materialized()) == rows_of(daily_direct(src))
    assert rows_of(query_hierarchy(levels, src)) == rows_of(
        daily_direct(src)
    )

    # mid-history backfill into day 2
    late = day_batch(spark, 2, 1000, n_keys).withColumn(
        "v", F.lit(999.99)
    )
    late.withColumn("d", F.to_date("ts")).write.mode("append").partitionBy(
        "d"
    ).parquet(src_dir)
    src = spark.read.parquet(src_dir)
    t0 = time.time()
    cascade_refresh(levels, src, start_s=DAY0 + 2 * 86400,
                    end_s=DAY0 + 3 * 86400)
    backfill_t = round(time.time() - t0, 2)
    assert rows_of(daily.materialized()) == rows_of(daily_direct(src))

    print(json.dumps({
        "soak": "hierarchical_cagg",
        "days": days,
        "rows_per_day": rows_per_day,
        "n_keys": n_keys,
        "cascade_s": cascade_s,
        "backfill_cascade_s": backfill_t,
    }))


if __name__ == "__main__":
    main()
