#!/usr/bin/env python3
"""Z-order layout soak (round 9, operators/layout.py): multi-dimension
chunk exclusion at 5M rows — the TimescaleDB space-dimension /
OPTIMIZE-ZORDER story, measured from real parquet footers.

Setup: 5M events over (user_id ∈ [0, 10k), 30 days of ts), written
three ways with identical 50k-row files: z-ordered on (user_id, ts),
ts-sorted (the event-log's natural layout), and unsorted. A
stats-consulting reader's row-group opens are counted via footer
min/max (rowgroup_prune_stats — the same stats a real scan consults)
for three predicate shapes:

- box (user range × time range): the dashboard "one customer, one
  week" query;
- user-only: where a time-sorted log CANNOT prune at all;
- ts-only: the single-sort layout's home turf — z-order should still
  prune, just less sharply.

Asserts: z-order opens <25% of row groups on the box, <50% on either
single dimension; the ts-sorted layout opens 100% on user-only; the
unsorted layout opens ~100% everywhere. Also asserts read-back row
equality for the z layout (the rewrite is a reorder, never a rewrite
of values).

Round 10 (VERDICT r9 #1) adds the MAINTENANCE-PATH phase: the same
z-order applied where it now lives in production — a cold event-log
chunk rewritten by run_maintenance(zorder_by=('table_name', 'ts'))
(cdc/retention.py::compress_partition) — with footer-measured pruning
BEFORE and AFTER on the "one table × one hour" box the reference's
(table_name, ts) btree index serves (init.sql:64-66), an
order-insensitive content hash proving the rewrite is a pure reorder,
and a second maintenance run proving the persisted _layout.json
bounds are reused (bounds_source == 'manifest').

Usage: python soak_zorder.py [n_rows] [n_log_rows]
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

from timescale_cdc_spark.operators.layout import (
    rowgroup_prune_stats,
    zorder_write,
)
from timescale_cdc_spark.session import get_spark

USERS = 10_000
DAYS = 30
T0 = 1_704_067_200  # 2024-01-01


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_log = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark(app_name="soak_zorder")
    scratch = os.path.join(tempfile.gettempdir(), f"soak_zorder_{os.getpid()}")

    df = spark.range(n).select(
        F.abs(F.xxhash64("id") % USERS).alias("user_id"),
        F.timestamp_seconds(
            T0 + F.abs(F.xxhash64("id", F.lit(1)) % (86400 * DAYS))
        ).alias("ts"),
        F.col("id").alias("payload"),
    )

    t0 = time.perf_counter()
    zorder_write(df, f"{scratch}/z", ["user_id", "ts"],
                 max_records_per_file=50_000)
    z_write_s = time.perf_counter() - t0
    (
        df.repartitionByRange(32, "ts").sortWithinPartitions("ts")
        .write.mode("overwrite").option("maxRecordsPerFile", 50_000)
        .parquet(f"{scratch}/linear")
    )
    df.write.mode("overwrite").option(
        "maxRecordsPerFile", 50_000
    ).parquet(f"{scratch}/unsorted")

    box = {
        "user_id": (2_000, 2_200),
        "ts": (dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 15)),
    }
    user_only = {"user_id": box["user_id"]}
    ts_only = {"ts": box["ts"]}

    stats = {}
    for layout in ("z", "linear", "unsorted"):
        for pname, pred in (("box", box), ("user", user_only),
                            ("ts", ts_only)):
            opened, total = rowgroup_prune_stats(
                f"{scratch}/{layout}", pred
            )
            stats[f"{layout}_{pname}"] = [opened, total]

    def frac(k):
        o, t = stats[k]
        return o / t

    assert frac("z_box") < 0.25, stats
    assert frac("z_user") < 0.50, stats
    assert frac("z_ts") < 0.50, stats
    assert frac("linear_user") == 1.0, stats  # time-sort can't help
    assert frac("unsorted_box") > 0.9, stats

    back = spark.read.parquet(f"{scratch}/z")
    assert back.count() == n
    assert back.exceptAll(df).count() == 0

    maint = _maintenance_phase(spark, scratch, n_log)

    print(
        json.dumps(
            {
                "metric": "zorder_soak",
                "n_rows": n,
                "z_write_s": round(z_write_s, 2),
                "rowgroups_opened": stats,
                "prune_fraction": {
                    k: round(frac(k), 4) for k in stats
                },
                "maintenance": maint,
            }
        )
    )
    shutil.rmtree(scratch, ignore_errors=True)


def _maintenance_phase(spark, scratch: str, n: int) -> dict:
    """Z-order as a maintenance policy over a real event log."""
    from timescale_cdc_spark.cdc.log import EventLog
    from timescale_cdc_spark.cdc.retention import read_layout
    from timescale_cdc_spark.maintenance import run_maintenance

    cold_day = dt.date(2024, 1, 1)
    now = dt.date(2024, 1, 10)
    log = EventLog(spark, f"{scratch}/log")
    # several appends → several unsorted files inside the cold chunk
    per_batch = max(n // 4, 1)
    for b in range(4):
        env = spark.range(per_batch).select(
            F.timestamp_seconds(
                T0 + F.abs(F.xxhash64("id", F.lit(10 + b)) % 86400)
            ).alias("ts"),
            F.lit("dataschema").alias("schema_name"),
            F.concat(
                F.lit("t"),
                (F.abs(F.xxhash64("id", F.lit(20 + b))) % 8).cast("string"),
            ).alias("table_name"),
            F.lit("INSERT").alias("operation"),
            F.lit(None).cast("string").alias("before"),
            F.to_json(F.struct((F.col("id") + b * per_batch).alias("id")))
            .alias("after"),
        )
        log.append(env, distributed_ids=True)

    part = os.path.join(log.data_path, f"event_date={cold_day.isoformat()}")
    box = {
        "table_name": ("t3", "t3"),
        "ts": (
            dt.datetime(2024, 1, 1, 9, 0),
            dt.datetime(2024, 1, 1, 10, 0),
        ),
    }
    opened0, total0 = rowgroup_prune_stats(part, box)

    content_hash = lambda: log.read().select(  # noqa: E731
        # bit_xor: order-insensitive and overflow-free under ANSI
        F.expr(
            "bit_xor(xxhash64(ts, schema_name, table_name, operation, "
            "after, event_id))"
        ).alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]
    before = content_hash()

    t0 = time.perf_counter()
    report = run_maintenance(
        f"{scratch}/log",
        retention_days=365,
        now=now,
        compress_after_days=2,
        zorder_by=("table_name", "ts"),
        zorder_max_records_per_file=50_000,
    )
    rewrite_s = time.perf_counter() - t0
    stats1 = report["compressed_partitions"][cold_day.isoformat()]
    assert stats1["layout"] == "zordered", stats1
    assert stats1["bounds_source"] == "computed", stats1

    after = content_hash()
    assert (before["h"], before["n"]) == (after["h"], after["n"])
    opened1, total1 = rowgroup_prune_stats(part, box)
    # the maintenance rewrite coalesces files — compare FRACTIONS
    assert total1 > 0 and opened1 / total1 < 0.5, (opened1, total1)
    assert opened0 / max(total0, 1) > 0.9, (opened0, total0)

    # second run: bounds come from the persisted manifest
    report2 = run_maintenance(
        f"{scratch}/log",
        retention_days=365,
        now=now,
        compress_after_days=2,
        zorder_by=("table_name", "ts"),
        zorder_max_records_per_file=50_000,
    )
    stats2 = report2["compressed_partitions"][cold_day.isoformat()]
    assert stats2["bounds_source"] == "manifest", stats2
    assert stats2["bounds"] == stats1["bounds"]
    assert read_layout(part)["zorder_by"] == ["table_name", "ts"]
    assert (before["h"], before["n"]) == (
        content_hash()["h"], content_hash()["n"]
    )

    return {
        "n_log_rows": before["n"],
        "rewrite_s": round(rewrite_s, 2),
        "box_open_before": [opened0, total0],
        "box_open_after": [opened1, total1],
        "prune_fraction_before": round(opened0 / max(total0, 1), 4),
        "prune_fraction_after": round(opened1 / total1, 4),
        "bounds_source_run2": stats2["bounds_source"],
    }


if __name__ == "__main__":
    main()
