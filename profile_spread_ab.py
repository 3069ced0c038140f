#!/usr/bin/env python3
"""Interleaved A/B of queries.base.spread() on the three lib mega
entries (guide §1: measure, interleaved to control for host drift).

Leg A = spread disabled (identity), leg B = spread enabled (HEAD).
Each rep: clearCache, construct the entry, noop-write it (guide
§1.4). Reports per-entry min/median of each leg from the SAME
session, alternating A,B,A,B,...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "4"))
ENTRIES = (
    "lib_state_heartbeat_freq",
    "lib_stats_counter_candle",
    "lib_m4_split_sample",
)


def main() -> None:
    from timescale_cdc_spark.session import get_spark
    from timescale_cdc_spark.queries import QUERIES
    from timescale_cdc_spark.queries import base as qbase
    from timescale_cdc_spark.queries import library as qlib

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="spread_ab")

    real_spread = qbase.spread
    identity = lambda df: df  # noqa: E731

    def run_once(name: str, enabled: bool) -> float:
        qlib.spread = real_spread if enabled else identity
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(
            f"AB {name} spread={'on' if enabled else 'off'}"
        )
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warmup both legs once (JIT, catalog, file listing)
    for name in ENTRIES:
        run_once(name, False)
        run_once(name, True)

    results: dict[str, dict[str, list[float]]] = {
        n: {"off": [], "on": []} for n in ENTRIES
    }
    for rep in range(REPS):
        for name in ENTRIES:
            results[name]["off"].append(run_once(name, False))
            results[name]["on"].append(run_once(name, True))
        print(f"rep {rep + 1}/{REPS} done", flush=True)

    qlib.spread = real_spread
    for name in ENTRIES:
        off, on = results[name]["off"], results[name]["on"]
        print(
            f"{name}: off min={min(off):.2f} med={statistics.median(off):.2f}"
            f" | on min={min(on):.2f} med={statistics.median(on):.2f}"
            f" | raw off={['%.2f' % v for v in off]}"
            f" on={['%.2f' % v for v in on]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
