#!/usr/bin/env python3
"""Interleaved A/B profiler for c2_minhash_simhash (round 13,
VERDICT r12 #1 — adjudication recorded in SCALE.md).

Times the registered entry and its component pipelines with the r10
interleaved methodology (variants alternate within one session so
host drift hits all equally; min-of-N per variant).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timescale_cdc_spark.queries import QUERIES  # noqa: E402
from timescale_cdc_spark.queries.llm_queries import (  # noqa: E402
    SKETCH_MAX_BUCKET,
    _planted_docs,
)
from timescale_cdc_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    simhash_pairs,
)
from timescale_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("PROFILE_RUNS", "4"))


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))

    def corpus():
        return _planted_docs(spark, SF_DIR).localCheckpoint()

    def run_full():
        return QUERIES["c2_minhash_simhash"](spark, SF_DIR).count()

    def run_minhash():
        return minhash_lsh_pairs(
            corpus(), "text", "doc_id", threshold=0.5,
            max_bucket=SKETCH_MAX_BUCKET,
        ).count()

    def run_simhash():
        return simhash_pairs(
            corpus(), "text", "doc_id", max_hamming=3,
            max_bucket=SKETCH_MAX_BUCKET,
        ).count()

    variants = {
        "full": run_full,
        "minhash": run_minhash,
        "simhash": run_simhash,
    }
    run_full()  # warm-up: amortize JVM/codegen startup

    times: dict[str, list[float]] = {k: [] for k in variants}
    rows: dict[str, int] = {}
    for _ in range(RUNS):
        for name, fn in variants.items():  # interleaved
            t0 = time.monotonic()
            rows[name] = fn()
            times[name].append(time.monotonic() - t0)

    for name in variants:
        ts = ", ".join(f"{x:.2f}" for x in times[name])
        print(f"{name:>8}: min={min(times[name]):.2f}s  rows={rows[name]}  "
              f"[{ts}]")


if __name__ == "__main__":
    main()
