#!/usr/bin/env python3
"""Kill-window soak for the FUSED initial-cascade commit (round 16,
VERDICT r15 #4): drive a SIGKILL-equivalent crash at every boundary
of `_cascade_initial_fused` (pre_write, post_write, mid_rename,
pre_lower_commit, between_commits) and prove, for each:

1. the crashed state is never torn — each level's manifest is either
   absent or a fully consistent committed generation whose regions
   all point at existing directories;
2. the real-time hierarchy view stays EXACT in the crashed state
   (absent manifest → full on-the-fly aggregation; lower-only commit
   → upper serves from its real-time tail);
3. re-running the cascade from the crashed state converges to
   bit-equality with a never-crashed control (fused again when both
   manifests are absent, the general sequential path when the crash
   landed between the two commits).

Each scenario runs the cascade in a CHILD process with
CAGG_FUSED_KILL_AT=<boundary> (the env-gated hook in cdc/caggs.py,
inert in production); the parent verifies and recovers. Prints one
JSON line for SCALE.md.

Usage: python3 soak_cagg_fused.py [rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ROOT = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), "soak_cagg_fused"
)
KILL_POINTS = [
    "pre_write",
    "post_write",
    "mid_rename",
    "pre_lower_commit",
    "between_commits",
]

CHILD = r"""
import os, sys
sys.path.insert(0, {root!r})
from timescale_cdc_spark.session import get_spark
from timescale_cdc_spark.cdc import caggs as C
from pyspark.sql import functions as F
sys.path.insert(0, os.path.dirname({root!r}))
from soak_cagg_fused import build_levels, source_df
spark = get_spark(master="local[4]", shuffle_partitions=4,
                  app_name="soak_fused_child")
hour, day = build_levels(spark, {base!r})
src = source_df(spark, {rows})
C.cascade_refresh([hour, day], src, start_s=0, end_s={end_s})
spark.stop()
"""

DAY0 = 1704067200  # 2024-01-01T00:00:00Z
END_S = DAY0 + 5 * 86400


def source_df(spark, rows: int):
    from pyspark.sql import functions as F

    return spark.range(rows).select(
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("k"),
        F.timestamp_seconds(
            F.lit(DAY0) + (F.col("id") * 97 % (5 * 86400))
        ).alias("ts"),
        F.round((F.col("id") * 7919 % 10000) / 100.0, 2).alias("v"),
    )


def build_levels(spark, base: str):
    from pyspark.sql import functions as F

    from timescale_cdc_spark.cdc.caggs import ContinuousAggregate

    def hour_aggs():
        return [
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("sum_dec"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        ]

    def day_aggs():
        return [
            F.sum("n").alias("n"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        ]

    hour = ContinuousAggregate(
        spark, os.path.join(base, "hour"), "1 hour", "ts", ["k"], hour_aggs
    )
    day = ContinuousAggregate(
        spark, os.path.join(base, "day"), "1 day", "bucket", ["k"], day_aggs
    )
    return hour, day


def manifest_consistent(path: str) -> bool:
    """Absent, or a committed generation whose regions all exist."""
    mf = os.path.join(path, "_MANIFEST.json")
    if not os.path.exists(mf):
        return True
    with open(mf) as f:
        m = json.load(f)
    for day, v in m.get("regions", {}).items():
        if not os.path.isdir(os.path.join(path, f"d={day}", v)):
            return False
    return True


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    repo = os.path.dirname(os.path.abspath(__file__))
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)

    from timescale_cdc_spark.cdc import caggs as C
    from timescale_cdc_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4,
                      app_name="soak_fused_parent")
    src = source_df(spark, rows)

    # never-crashed control (fused) + sequential cross-check
    ctl_base = os.path.join(ROOT, "control")
    h_ctl, d_ctl = build_levels(spark, ctl_base)
    C.cascade_refresh([h_ctl, d_ctl], src, start_s=0, end_s=END_S)
    seq_base = os.path.join(ROOT, "sequential")
    h_seq, d_seq = build_levels(spark, seq_base)
    fused_orig = C._cascade_initial_fused
    C._cascade_initial_fused = lambda *a, **k: False
    C.cascade_refresh([h_seq, d_seq], src, start_s=0, end_s=END_S)
    C._cascade_initial_fused = fused_orig
    for a, b in ((h_ctl, h_seq), (d_ctl, d_seq)):
        assert a.materialized().exceptAll(b.materialized()).count() == 0
        assert b.materialized().exceptAll(a.materialized()).count() == 0
    ctl_hour = h_ctl.query(src)
    ctl_day = d_ctl.query(h_ctl.query(src))

    results = {}
    t0 = time.time()
    for kp in KILL_POINTS:
        base = os.path.join(ROOT, f"kill_{kp}")
        env = dict(os.environ, CAGG_FUSED_KILL_AT=kp)
        proc = subprocess.run(
            [sys.executable, "-c",
             CHILD.format(root=repo, base=base, rows=rows, end_s=END_S)],
            env=env, capture_output=True, text=True, timeout=600,
        )
        killed = proc.returncode == 137
        hour, day = build_levels(spark, base)
        ok_consistent = (
            manifest_consistent(hour.path) and manifest_consistent(day.path)
        )
        # crashed-state serving stays exact
        hv = hour.query(src)
        crash_hour_exact = (
            hv.exceptAll(ctl_hour).count() == 0
            and ctl_hour.exceptAll(hv).count() == 0
        )
        dv = day.query(hour.query(src))
        crash_day_exact = (
            dv.exceptAll(ctl_day).count() == 0
            and ctl_day.exceptAll(dv).count() == 0
        )
        # recovery: re-run the cascade (fused or sequential, whatever
        # the crashed state allows), then bit-compare to control
        C.cascade_refresh([hour, day], src, start_s=0, end_s=END_S)
        rec_ok = True
        for a, b in ((hour, h_ctl), (day, d_ctl)):
            rec_ok = rec_ok and (
                a.materialized().exceptAll(b.materialized()).count() == 0
                and b.materialized().exceptAll(a.materialized()).count() == 0
                and a.watermark_s() == b.watermark_s()
            )
        results[kp] = {
            "killed": killed,
            "consistent": ok_consistent,
            "crash_serving_exact": bool(crash_hour_exact and crash_day_exact),
            "recovered_bitequal": bool(rec_ok),
        }
        print(f"{kp}: {results[kp]}", flush=True)
        assert killed, f"{kp}: child did not die at the kill point"
        assert ok_consistent and results[kp]["crash_serving_exact"] and rec_ok

    print(json.dumps({
        "soak": "cagg_fused_kill_windows",
        "rows": rows,
        "kill_points": results,
        "all_green": all(
            v["killed"] and v["consistent"] and v["crash_serving_exact"]
            and v["recovered_bitequal"] for v in results.values()
        ),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
