#!/usr/bin/env python3
"""Streaming continuous-aggregate END-TO-END soak (VERDICT r7 #4):
the integration a real deployment runs, composed from pieces that are
each unit-tested but — until this soak — never driven as one loop:

    EventLog.append (CDC envelopes, idempotent id assignment)
      → CdcStreamPipeline (log stream → cdc-<table> topic sinks,
        whitelist routing keeps the noise table out)
      → ContinuousAggregate.attach (file-source stream on the routed
        topic → per-batch source landing + touched-window refresh)
      → ContinuousAggregate.query (real-time union view)
      → round 9 (VERDICT r8 #6): a LEVEL-2 DAILY cagg cascaded off the
        streamed hourly one — refreshed per round over exactly the
        touched day window, capped at the hourly watermark aligned
        down to days (cascade_refresh's complete-bucket rule), its
        real-time view read through query_hierarchy

Invariants, checked at EVERY round:
  - query(source) == the full one-shot aggregation of everything the
    ROUTER delivered so far (real-time equality regardless of refresh
    lag — the load-bearing cagg property, now proven END TO END
    through the router rather than on a hand-fed source);
  - a LATE round (timestamps days back) widens the refresh window
    backward and equality still holds — at BOTH levels (the late day
    is re-refreshed at level 2 from the updated hourly partials);
  - query_hierarchy([hour, day]) == the full one-shot DAILY
    aggregation of everything delivered, at every round — exact even
    while the touched day is still incomplete at the hourly level
    (real-time tail) and after it materializes (stored partials). The
    daily sum rolls up the hourly DECIMAL partial, so rollup==direct
    is exact, not an IEEE-order accident;
  - rows of the non-whitelisted noise table never reach the cagg
    source (routing isolation).

Per-round cost is the attach-stream drain time (landing + refresh of
the touched windows) — at scale this is O(batch) + O(touched buckets
x keys), never O(topic history); the equality check is the soak
harness's own full recompute, not part of the deployment loop.

Prints one JSON line for SCALE.md.

Usage: python soak_stream_cagg.py [rounds] [rows_per_round] [n_keys]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timescale_cdc_spark.cdc.caggs import ContinuousAggregate  # noqa: E402
from timescale_cdc_spark.cdc.log import EventLog  # noqa: E402
from timescale_cdc_spark.schemas import EVENT_LOG_SCHEMA  # noqa: E402
from timescale_cdc_spark.session import get_spark  # noqa: E402
from timescale_cdc_spark.streaming.pipeline import (  # noqa: E402
    CdcStreamPipeline,
)

ROOT = "/tmp/soak_stream_cagg"
DAY0 = 1704067200  # 2024-01-01T00:00:00Z


def envelopes(spark, round_no: int, rows: int, n_keys: int, late: bool):
    """One round of INSERT envelopes for dataschema.metrics (the
    cagg's table): ts walks six hours per round (so a multi-round run
    crosses day boundaries and the daily cascade level materializes)
    — except a late round, which lands 1.5 days back (the
    invalidation-widening case). A 5% tail of dataschema.assets rows
    rides along as routing noise."""
    base_ts = DAY0 + (round_no - 10 if late else round_no) * 21600
    n_noise = rows // 20
    metrics = spark.range(rows).select(
        F.timestamp_seconds(
            F.lit(base_ts) + (F.col("id") % 3600)
        ).alias("ts"),
        F.lit("dataschema").alias("schema_name"),
        F.lit("metrics").alias("table_name"),
        F.lit("INSERT").alias("operation"),
        F.lit(None).cast("string").alias("before"),
        F.to_json(
            F.struct(
                F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string"))
                .alias("k"),
                F.round((F.xxhash64("id") % 10000) / 100.0, 2).alias("v"),
            )
        ).alias("after"),
    )
    noise = spark.range(n_noise).select(
        F.timestamp_seconds(F.lit(base_ts) + (F.col("id") % 3600)).alias(
            "ts"
        ),
        F.lit("dataschema").alias("schema_name"),
        F.lit("assets").alias("table_name"),
        F.lit("UPDATE").alias("operation"),
        F.lit(None).cast("string").alias("before"),
        F.to_json(F.struct(F.col("id").alias("id"))).alias("after"),
    )
    return metrics.unionByName(noise)


def aggs():
    # sum kept as DECIMAL partial (sum_dec) so the daily cascade level
    # rolls up exactly; sum_v stays for the hourly-level compare
    return [
        F.count("*").alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).alias("sum_dec"),
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias(
            "sum_v"
        ),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    ]


def day_aggs():
    # rollup algebra over the hourly level's PARTIAL columns
    return [
        F.sum("n").alias("n"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    ]


def full_agg_daily(src):
    eb = F.floor(F.unix_timestamp(F.col("ts")) / 86400).cast("long") * 86400
    return (
        src.withColumn("_eb", eb)
        .groupBy("k", "_eb")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("sum_dec"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .withColumn("bucket", F.timestamp_seconds("_eb"))
        .drop("_eb")
    )


def sorted_rows_daily(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "k",
            "bucket",
            "n",
            F.col("sum_dec").cast("double").alias("sum_v"),
            "min_v",
            "max_v",
        ).collect()
    )


def full_agg(src):
    eb = F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("long") * 3600
    return (
        src.withColumn("_eb", eb)
        .groupBy("k", "_eb")
        .agg(*aggs())
        .withColumn("bucket", F.timestamp_seconds("_eb"))
        .drop("_eb")
    )


def sorted_rows(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "k", "bucket", "n", "sum_v", "min_v", "max_v"
        ).collect()
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows_per_round = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    late_round = rounds // 2  # one mid-run late (backfill) round

    shutil.rmtree(ROOT, ignore_errors=True)
    spark = get_spark(app_name="soak_stream_cagg")

    log = EventLog(spark, f"{ROOT}/log")
    pipeline = CdcStreamPipeline(
        spark,
        log,
        f"{ROOT}/topics",
        [("dataschema", "metrics"), ("dataschema", "assets")],
        checkpoint_dir=f"{ROOT}/router_ckpt",
    )
    topic = pipeline.topic_path("metrics")

    cagg = ContinuousAggregate(
        spark, f"{ROOT}/cagg", "1 hour", "ts", ["k"], aggs
    )
    day = ContinuousAggregate(
        spark, f"{ROOT}/cagg_day", "1 day", "bucket", ["k"], day_aggs
    )
    src_dir = f"{ROOT}/cagg_src"

    # consumer: file-source stream over the routed topic's batch dirs,
    # envelope parsed to the cagg's (ts, k, v) shape BEFORE attach
    topic_stream = (
        spark.readStream.schema(EVENT_LOG_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(topic + "/_batch_id=*")
        .select(
            "ts",
            "table_name",
            F.get_json_object("after", "$.k").alias("k"),
            F.get_json_object("after", "$.v").cast("double").alias("v"),
        )
    )
    attach_q = cagg.attach(topic_stream, src_dir, f"{ROOT}/cagg_ckpt")

    per_round = []
    total_events = 0
    try:
        for r in range(rounds):
            late = r == late_round
            n = log.append(envelopes(spark, r, rows_per_round, n_keys, late))
            total_events += n

            t0 = time.perf_counter()
            rq = pipeline.start(available_now=True)
            rq.awaitTermination()
            t_route = time.perf_counter() - t0

            # round 14 (VERDICT r13 #5): once mid-soak — right after
            # the late round's data lands in the topic but BEFORE it
            # is consumed — stop the attach and resume a fresh query
            # from the same checkpoint. The per-round equality checks
            # below then prove the resume processed the pending late
            # batch exactly once (a double-apply or a skip breaks the
            # real-time equality at both levels).
            if r == late_round:
                attach_q.stop()
                attach_q = cagg.attach(
                    topic_stream, src_dir, f"{ROOT}/cagg_ckpt"
                )

            wm_before = cagg.watermark_s()
            t0 = time.perf_counter()
            attach_q.processAllAvailable()
            t_refresh = time.perf_counter() - t0
            wm_after = cagg.watermark_s()

            # level-2 cascade step: refresh the daily cagg over exactly
            # the day window this round touched, capped at the hourly
            # watermark aligned DOWN to days (complete-bucket rule —
            # an in-progress day stays out of the daily watermark and
            # is served by query_hierarchy's real-time tail)
            base_ts = DAY0 + (r - 10 if late else r) * 21600
            t0 = time.perf_counter()
            # one-day start offset (the Timescale refresh-policy lag
            # window): a day COMPLETES only once a later batch lands in
            # the next day, and that batch's own span no longer covers
            # it — the lag window picks it up exactly once
            lo_d = day.align_down(base_ts) - 86400
            hi_d = min(
                day.align_up(base_ts + 21600), day.align_down(wm_after)
            )
            if hi_d > lo_d:
                day.refresh(
                    cagg.materialized(), start_s=lo_d, end_s=hi_d
                )
            t_cascade = time.perf_counter() - t0

            source = spark.read.parquet(src_dir)
            # routing isolation: only metrics rows reached the cagg
            assert (
                source.where(F.col("table_name") != "metrics").count() == 0
            )
            delivered = pipeline.read_topic("metrics").select(
                "ts",
                F.get_json_object("after", "$.k").alias("k"),
                F.get_json_object("after", "$.v").cast("double").alias("v"),
            )
            # END-TO-END real-time equality through the router
            assert sorted_rows(cagg.query(source.drop("table_name"))) == (
                sorted_rows(full_agg(delivered))
            ), f"round {r}"
            # ... and through the WHOLE HIERARCHY: the daily view must
            # equal the one-shot daily aggregate at every refresh lag
            from timescale_cdc_spark.cdc.caggs import query_hierarchy

            assert sorted_rows_daily(
                query_hierarchy([cagg, day], source.drop("table_name"))
            ) == sorted_rows_daily(full_agg_daily(delivered)), (
                f"round {r} (daily)"
            )
            per_round.append(
                {
                    "round": r,
                    "late": late,
                    "route_s": round(t_route, 2),
                    "refresh_s": round(t_refresh, 2),
                    "cascade_s": round(t_cascade, 2),
                    "day_materialized": day.exists(),
                    "watermark_moved": wm_after != wm_before,
                }
            )
    finally:
        attach_q.stop()

    late_stats = per_round[late_round]
    assert late_stats["late"]
    # the late round must NOT advance the watermark past the tail —
    # it refreshes a two-days-old window
    print(
        json.dumps(
            {
                "soak": "stream_cagg_end_to_end",
                "rounds": rounds,
                "rows_per_round": rows_per_round,
                "n_keys": n_keys,
                "total_events": total_events,
                "late_round": late_round,
                "per_round": per_round,
                "mean_refresh_s": round(
                    sum(p["refresh_s"] for p in per_round) / rounds, 2
                ),
                "mean_cascade_s": round(
                    sum(p["cascade_s"] for p in per_round) / rounds, 2
                ),
                "materialized_rows": cagg.materialized().count(),
                "materialized_rows_daily": (
                    day.materialized().count() if day.exists() else 0
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
