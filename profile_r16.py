#!/usr/bin/env python3
"""Round 16 profiling harness.

Subcommands (run one at a time; never concurrently with a bench leg):

  construct   — per-builder plan-CONSTRUCTION time (py4j chatter) for
                the lib mega-entries' builder functions, min-of-N,
                plus whole-entry construct time. No actions run.
  ab NAME     — interleaved A/B of a toggled optimization (see the
                TOGGLES registry), min+median of N alternating reps,
                exceptAll identity check first.

Methodology per OPTIMIZATION_r15.md: the host swings ±30-50% between
runs, so every before/after claim comes from SAME-SESSION interleaved
measurement, never two totals from different legs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from timescale_cdc_spark.session import get_spark

    return get_spark(app_name="profile_r16")


def _t(fn, n=3):
    """min-of-n construction time of fn() (no action)."""
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def cmd_construct() -> None:
    from pyspark.sql import functions as F

    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions import freq, hyper, state
    from timescale_cdc_spark.queries import QUERIES

    spark = _spark()
    ev = load_table(spark, SF_DIR, "events")
    key = ["user_id"]
    et = ["event_type"]

    # materialized partial frames so each rollup builder is timed on a
    # realistic input plan without re-timing its producer
    sp = state.state_partials(ev, "ts", key, "event_type", "event_id", "1 hour")
    hp = state.heartbeat_partials(ev, "ts", key, "10 minutes", "1 hour")
    fp = freq.freq_partials(ev, "ts", key, "event_type", "1 hour", 16)
    up = hyper.uddsketch_partials(ev, "ts", et, "value", "1 hour", dense=False)
    cp = hyper.counter_partials(ev, "ts", et, "value", "event_id", "1 hour")
    st = hyper.stats_agg_partials(ev, "ts", et, "value", "1 hour")
    ca = hyper.candlestick_agg(ev, "ts", et, "value", "event_id", "1 hour")
    tw = hyper.twa_partials(ev, "ts", et, "value", "event_id", "1 hour")
    ga = hyper.gauge_partials(ev, "ts", et, "value", "event_id", "1 hour")

    builders = {
        "state_partials": lambda: state.state_partials(
            ev, "ts", key, "event_type", "event_id", "1 hour"
        ),
        "state_rollup(seams)": lambda: state.state_rollup(
            sp, key, "1 day", keep_seams=True
        ),
        "state_interpolated": lambda: state.state_interpolated(
            state.state_rollup(sp, key, "1 day", keep_seams=True), key, "1 day"
        ),
        "heartbeat_partials": lambda: state.heartbeat_partials(
            ev, "ts", key, "10 minutes", "1 hour"
        ),
        "heartbeat_rollup": lambda: state.heartbeat_rollup(hp, key, "1 day"),
        "freq_partials": lambda: freq.freq_partials(
            ev, "ts", key, "event_type", "1 hour", 16
        ),
        "freq_rollup": lambda: freq.freq_rollup(fp, key, "1 day", 16),
        "uddsketch_partials(sparse)": lambda: hyper.uddsketch_partials(
            ev, "ts", et, "value", "1 hour", dense=False
        ),
        "uddsketch_rollup(sparse)": lambda: hyper.uddsketch_rollup(
            up, et, "1 day"
        ),
        "uddsketch_quantiles": lambda: hyper.uddsketch_quantiles(
            hyper.uddsketch_rollup(up, et, "1 day"), [0.5, 0.9, 0.99]
        ),
        "counter_partials": lambda: hyper.counter_partials(
            ev, "ts", et, "value", "event_id", "1 hour"
        ),
        "counter_rollup": lambda: hyper.counter_rollup(cp, et, "1 day"),
        "stats_agg_partials": lambda: hyper.stats_agg_partials(
            ev, "ts", et, "value", "1 hour"
        ),
        "stats_rollup": lambda: hyper.stats_rollup(st, et, "bucket", "1 day"),
        "candlestick_agg": lambda: hyper.candlestick_agg(
            ev, "ts", et, "value", "event_id", "1 hour"
        ),
        "candlestick_rollup": lambda: hyper.candlestick_rollup(
            ca, et, "bucket", "1 day"
        ),
        "twa_partials": lambda: hyper.twa_partials(
            ev, "ts", et, "value", "event_id", "1 hour"
        ),
        "twa_rollup": lambda: hyper.twa_rollup(tw, et, "1 day"),
        "gauge_partials": lambda: hyper.gauge_partials(
            ev, "ts", et, "value", "event_id", "1 hour"
        ),
        "gauge_rollup": lambda: hyper.gauge_rollup(ga, et, "1 day"),
        "percentile_agg(exact)": lambda: hyper.percentile_agg(
            ev, "ts", et, "value", [0.5, 0.9, 0.99], "1 day", exact=True
        ),
        "histogram": lambda: hyper.histogram(ev, "value", et, 0, 500, 20),
        "hll(partials+rollup)": lambda: hyper.hll_rollup(
            hyper.approx_distinct_agg(ev, "ts", et, "user_id", "1 hour"),
            et,
            "bucket",
            "1 day",
        ),
    }
    # warm the py4j path once
    for name, fn in builders.items():
        fn()
    rows = []
    for name, fn in builders.items():
        rows.append((name, _t(fn, 3)))
    rows.sort(key=lambda r: -r[1])
    total = sum(r[1] for r in rows)
    print(f"-- builder construct times (min-of-3, s); sum={total:.3f}")
    for name, s in rows:
        print(f"{s:8.3f}  {name}")

    for entry in (
        "lib_state_heartbeat_freq",
        "lib_stats_counter_candle",
        "lib_m4_split_sample",
        "cdc_continuous_aggregate",
    ):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[entry](spark, SF_DIR)
            ts.append(time.perf_counter() - t0)
        print(f"entry construct {entry}: min {min(ts):.3f} all "
              + ",".join(f"{x:.3f}" for x in ts))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "construct"
    if cmd == "construct":
        cmd_construct()
    else:
        print(f"unknown subcommand {cmd}", file=sys.stderr)
        sys.exit(2)
