#!/usr/bin/env python3
"""Capture `.explain("formatted")` for the round-16 touched queries
into plans/r16/<query>_<tag>.txt (tag = before|after), plus builder-
level plans used for the byte-identity-modulo-expr-ids verification
of the SQL-text conversions.

Usage: python3 emit_plans_r16.py before|after [out_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERY_NAMES = [
    "lib_state_heartbeat_freq",
    "lib_stats_counter_candle",
    "lib_m4_split_sample",
    "cdc_continuous_aggregate",
    "c2_minhash_simhash",
]


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def normalized(text: str) -> str:
    """Strip per-run identifiers so before/after plans diff cleanly:
    expression ids (#123), plan ids, checkpoint RDD ids, scratch
    paths, and cached-relation serde noise."""
    t = re.sub(r"#\d+", "#X", text)
    t = re.sub(r"plan_id=\d+", "plan_id=X", t)
    t = re.sub(r"\[id=#?X?\d*\]", "[id=X]", t)
    t = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[X]", t)
    t = re.sub(r"ReliableCheckpointRDD\[\d+\]", "ReliableCheckpointRDD[X]", t)
    t = re.sub(r"LocalCheckpoint\w*RDD\[\d+\]", "LocalCheckpointRDD[X]", t)
    t = re.sub(r"at \w+ at \w+\.scala:\d+", "at X", t)
    t = re.sub(r"/tmp/[\w/._-]+", "/tmp/X", t)
    t = re.sub(r"cagg_hier_\w+/d=[\w,/. -]+", "cagg/X", t)
    return t


def main() -> None:
    tag = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "r16"
    )
    os.makedirs(out_dir, exist_ok=True)

    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions import freq, hyper, state
    from timescale_cdc_spark.queries import QUERIES
    from timescale_cdc_spark.session import get_spark

    spark = get_spark(app_name="emit_plans_r16")
    for name in QUERY_NAMES:
        df = QUERIES[name](spark, SF_DIR)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(formatted(df))
        print(f"wrote {name}_{tag}.txt", flush=True)

    # builder-level plans (conversion identity evidence, kept in /tmp
    # -style normalized form inside the same dir under builders_<tag>)
    ev = load_table(spark, SF_DIR, "events")
    key, et = ["user_id"], ["event_type"]
    sp = state.state_partials(ev, "ts", key, "event_type", "event_id", "1 hour")
    up = hyper.uddsketch_partials(ev, "ts", et, "value", "1 hour", dense=False)
    stp = hyper.stats_agg_partials(ev, "ts", et, "value", "1 hour")
    cp = hyper.counter_partials(ev, "ts", et, "value", "event_id", "1 hour")
    fp = freq.freq_partials(ev, "ts", key, "event_type", "1 hour", 16)
    builders = {
        "state_partials": sp,
        "state_rollup_seams": state.state_rollup(
            sp, key, "1 day", keep_seams=True
        ),
        "state_interpolated": state.state_interpolated(
            state.state_rollup(sp, key, "1 day", keep_seams=True),
            key, "1 day",
        ),
        "heartbeat_partials": state.heartbeat_partials(
            ev, "ts", key, "10 minutes", "1 hour"
        ),
        "heartbeat_rollup": state.heartbeat_rollup(
            state.heartbeat_partials(ev, "ts", key, "10 minutes", "1 hour"),
            key, "1 day",
        ),
        "freq_partials": fp,
        "freq_rollup": freq.freq_rollup(fp, key, "1 day", 16),
        "uddsketch_rollup_sparse": hyper.uddsketch_rollup(up, et, "1 day"),
        "stats_rollup": hyper.stats_rollup(stp, et, "bucket", "1 day"),
        "counter_partials": cp,
        "counter_rollup": hyper.counter_rollup(cp, et, "1 day"),
        "twa_partials": hyper.twa_partials(
            ev, "ts", et, "value", "event_id", "1 hour"
        ),
    }
    with open(os.path.join(out_dir, f"builders_{tag}.txt"), "w") as f:
        for bname, df in builders.items():
            f.write(f"==== {bname} ====\n")
            f.write(normalized(formatted(df)))
            f.write("\n")
    print(f"wrote builders_{tag}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
