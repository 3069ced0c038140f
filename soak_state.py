#!/usr/bin/env python3
"""State/liveness/frequency rollup soak: the round-7 toolkit families
(functions/state.py, functions/freq.py) at millions of facts — build
hourly partials ONCE, store them, then serve daily results two ways
and prove the merge:

- state_agg: daily rollup of hourly time-in-state maps must equal the
  direct daily computation EXACTLY (integer microseconds, exceptAll
  both ways on exploded entries);
- heartbeat_agg: daily rollup of bucket-clipped liveness ranges must
  equal the direct daily summary EXACTLY (ranges, live/dead, counts);
- freq_agg small regime (12 states < max_size): rollup == direct
  exactly with err == 0;
- freq_agg compressed regime (501 items >> max_size=16): the
  undercount (est <= true <= est + err) and completeness (the ~1/3
  heavy hitter survives and ranks #1) guarantees hold per (key, day),
  verified DISTRIBUTED (join vs exact counts; violations counted in
  Spark, never collected).

Prints one JSON line for SCALE.md.

Usage: python soak_state.py [days] [rows_per_day] [n_keys]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timescale_cdc_spark.functions.freq import (  # noqa: E402
    freq_agg,
    freq_partials,
    freq_rollup,
    topn,
)
from timescale_cdc_spark.functions.state import (  # noqa: E402
    heartbeat_partials,
    heartbeat_rollup,
    heartbeat_summary,
    state_agg,
    state_partials,
    state_rollup,
)
from timescale_cdc_spark.session import get_spark  # noqa: E402

DAY0 = 1704067200  # 2024-01-01T00:00:00Z


def facts(spark, days: int, rows_per_day: int, n_keys: int):
    """Deterministic synthetic facts: round-robin keys, wrapping
    second-granular timestamps, a 12-value state column, and a skewed
    item column (1/3 'hot', the rest uniform over 500)."""
    n = days * rows_per_day
    h = F.xxhash64("id")
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")).alias(
            "k"
        ),
        F.timestamp_seconds(
            F.lit(DAY0) + (F.col("id") % (days * 86400))
        ).alias("ts"),
        F.concat(F.lit("s"), (F.pmod(h, F.lit(12))).cast("string")).alias(
            "state"
        ),
        F.when(F.col("id") % 3 == 0, F.lit("hot"))
        .otherwise(
            F.concat(F.lit("i"), F.pmod(h, F.lit(500)).cast("string"))
        )
        .alias("item"),
    )


def timed(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def assert_equal(a, b, cols, label):
    aa, bb = a.select(*cols), b.select(*cols)
    extra = aa.exceptAll(bb).count()
    missing = bb.exceptAll(aa).count()
    assert extra == 0 and missing == 0, (label, extra, missing)


def main() -> None:
    days = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rows_per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    spark = get_spark(app_name="soak_state")

    src = facts(spark, days, rows_per_day, n_keys)
    src.write.mode("overwrite").parquet("/tmp/soak_state_facts")
    src = spark.read.parquet("/tmp/soak_state_facts")
    n_facts = src.count()
    out = {"soak": "state_liveness_freq_rollup", "facts": n_facts}

    # ---- state_agg -------------------------------------------------
    t_build, n_hourly = timed(
        state_partials(src, "ts", ["k"], "state", "event_id", "1 hour")
    )
    hourly = state_partials(src, "ts", ["k"], "state", "event_id", "1 hour")
    hourly.write.mode("overwrite").parquet("/tmp/soak_state_p")
    hourly = spark.read.parquet("/tmp/soak_state_p")
    t_roll, n_daily = timed(state_rollup(hourly, ["k"], "1 day"))
    t_direct, n_direct = timed(
        state_agg(src, "ts", ["k"], "state", "event_id", "1 day")
    )
    assert n_daily == n_direct == n_keys * days

    def st_entries(df):
        return df.select(
            "k", "bucket", "n", "n_transitions",
            F.explode("durs").alias("state", "dur_us"),
        )

    assert_equal(
        st_entries(state_rollup(hourly, ["k"], "1 day")),
        st_entries(
            state_agg(src, "ts", ["k"], "state", "event_id", "1 day")
        ),
        ["k", "bucket", "n", "n_transitions", "state", "dur_us"],
        "state",
    )
    out.update({
        "state_hourly_partials": n_hourly,
        "state_build_hourly_s": round(t_build, 2),
        "state_daily_rollup_s": round(t_roll, 2),
        "state_daily_direct_s": round(t_direct, 2),
    })

    # ---- heartbeat_agg --------------------------------------------
    # irregular beats: keep ~30% of rows -> per-key gaps of
    # ~200-2000s against a 10-minute lease => real island structure
    beats = src.where(F.pmod(F.xxhash64("event_id"), F.lit(10)) < 3)
    n_beats = beats.count()
    t_build_hb, n_hb_hourly = timed(
        heartbeat_partials(beats, "ts", ["k"], "10 minutes", "1 hour")
    )
    hb_hourly = heartbeat_partials(
        beats, "ts", ["k"], "10 minutes", "1 hour"
    )
    hb_hourly.write.mode("overwrite").parquet("/tmp/soak_state_hb")
    hb_hourly = spark.read.parquet("/tmp/soak_state_hb")
    t_roll_hb, _ = timed(heartbeat_rollup(hb_hourly, ["k"], "1 day"))
    t_direct_hb, _ = timed(
        heartbeat_summary(beats, "ts", ["k"], "10 minutes", "1 day")
    )
    cols = ["k", "bucket", "ranges", "live_us", "n_ranges",
            "n_heartbeats", "dead_us", "uptime"]
    assert_equal(
        heartbeat_rollup(hb_hourly, ["k"], "1 day"),
        heartbeat_summary(beats, "ts", ["k"], "10 minutes", "1 day"),
        cols,
        "heartbeat",
    )
    # island structure is non-degenerate: strictly more islands than
    # keys, strictly less than beats
    n_islands = (
        heartbeat_rollup(hb_hourly, ["k"], "1 day")
        .agg(F.sum("n_ranges"))
        .collect()[0][0]
    )
    assert n_keys * days < n_islands < n_beats, n_islands
    out.update({
        "heartbeats": n_beats,
        "hb_hourly_partials": n_hb_hourly,
        "hb_islands_daily": int(n_islands),
        "hb_build_hourly_s": round(t_build_hb, 2),
        "hb_daily_rollup_s": round(t_roll_hb, 2),
        "hb_daily_direct_s": round(t_direct_hb, 2),
    })

    # ---- freq_agg: small regime (12 states, max_size 16) ----------
    fr_hourly = freq_partials(src, "ts", ["k"], "state", "1 hour", 16)
    fr_hourly.write.mode("overwrite").parquet("/tmp/soak_state_fr")
    fr_hourly = spark.read.parquet("/tmp/soak_state_fr")
    t_roll_fr, _ = timed(freq_rollup(fr_hourly, ["k"], "1 day", 16))
    t_direct_fr, _ = timed(
        freq_agg(src, "ts", ["k"], "state", "1 day", 16)
    )

    def fr_entries(df):
        return df.select(
            "k", "bucket", "err", "n", F.explode("mg").alias("item", "c")
        )

    rolled_fr = freq_rollup(fr_hourly, ["k"], "1 day", 16)
    assert rolled_fr.where(F.col("err") != 0).count() == 0
    assert_equal(
        fr_entries(rolled_fr),
        fr_entries(freq_agg(src, "ts", ["k"], "state", "1 day", 16)),
        ["k", "bucket", "err", "n", "item", "c"],
        "freq_small",
    )
    out.update({
        "freq_small_daily_rollup_s": round(t_roll_fr, 2),
        "freq_small_daily_direct_s": round(t_direct_fr, 2),
    })

    # ---- freq_agg: compressed regime (501 items, max_size 16) -----
    fc_hourly = freq_partials(src, "ts", ["k"], "item", "1 hour", 16)
    fc_hourly.write.mode("overwrite").parquet("/tmp/soak_state_fc")
    fc_hourly = spark.read.parquet("/tmp/soak_state_fc")
    t_roll_fc, _ = timed(freq_rollup(fc_hourly, ["k"], "1 day", 16))
    rolled_fc = freq_rollup(fc_hourly, ["k"], "1 day", 16)
    exact = (
        src.withColumn(
            "bucket",
            F.timestamp_seconds(
                (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast(
                    "long"
                )
            ),
        )
        .groupBy("k", "bucket", "item")
        .agg(F.count("*").alias("true_c"))
    )
    joined = fr_entries(rolled_fc).join(exact, ["k", "bucket", "item"])
    # every summary entry found in exact (inner join keeps all), and
    # est <= true <= est + err everywhere
    n_entries = fr_entries(rolled_fc).count()
    stats = joined.agg(
        F.count("*").alias("n"),
        F.sum((F.col("c") > F.col("true_c")).cast("long")).alias("over"),
        F.sum(
            (F.col("true_c") > F.col("c") + F.col("err")).cast("long")
        ).alias("under"),
    ).collect()[0]
    assert stats["n"] == n_entries
    assert stats["over"] == 0 and stats["under"] == 0, stats
    # completeness: the heavy hitter is tracked and ranked #1 in
    # EVERY (key, day)
    top1 = topn(rolled_fc, 1, ["k"])
    n_groups = rolled_fc.count()
    assert top1.where(F.col("item") == "hot").count() == n_groups
    out.update({
        "freq_compressed_daily_rollup_s": round(t_roll_fc, 2),
        "freq_compressed_groups": int(n_groups),
    })

    print(json.dumps(out))


if __name__ == "__main__":
    main()
