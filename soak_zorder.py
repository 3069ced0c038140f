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

Usage: python soak_zorder.py [n_rows]
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
            }
        )
    )
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
