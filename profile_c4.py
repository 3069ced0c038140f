#!/usr/bin/env python3
"""Interleaved A/B profiler for c4_text_analysis (round 14, VERDICT
r13 #2 — adjudication recorded in SCALE.md).

BENCH_r13 showed c4_text_analysis +24% calibration-normalized over
r12 (raw 0.596 → 1.183 s) with the entry code unchanged. The house
methodology for "likely drift" suspicions (r10/r13 precedents): run
BOTH trees' entries in ONE session, alternating per repetition so
host drift hits both equally, min-of-N per variant. The r12 tree is
checked out read-only via ``git worktree add`` at the commit carrying
BENCH_r12 (pass it as argv[1]; default 1786a94) and imported by
purging ``timescale_cdc_spark*`` from sys.modules with the tree root
prepended to sys.path — both variants then run against the same live
SparkSession/JVM.

Each variant is timed two ways: ``build`` (call the registered entry
— plan construction + analysis only) and ``run`` (build + count), so
a regression separates into plan-build vs execution.

Usage: python profile_c4.py [r12_commit] [runs]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from timescale_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def load_entry(root: str):
    """Import <root>'s registered c4 entry, isolated from whatever
    tree was imported before (module purge + path priority). The
    returned callable keeps its own module graph alive by reference,
    so two trees' entries can coexist in one process."""
    purged = [k for k in sys.modules if k.startswith("timescale_cdc_spark")]
    for k in purged:
        del sys.modules[k]
    sys.path.insert(0, root)
    try:
        from timescale_cdc_spark.queries import QUERIES

        return QUERIES["c4_text_analysis"]
    finally:
        sys.path.remove(root)


def main() -> None:
    commit = sys.argv[1] if len(sys.argv) > 1 else "1786a94"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    wt = f"/tmp/c4_ab_{commit}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, commit],
            check=True,
        )

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    entries = {"r12": load_entry(wt), "head": load_entry(REPO)}

    # warm-up both (JVM/codegen/catalog startup amortized off both)
    for fn in entries.values():
        fn(spark, SF_DIR).count()

    build: dict[str, list[float]] = {k: [] for k in entries}
    run: dict[str, list[float]] = {k: [] for k in entries}
    rows: dict[str, int] = {}
    for _ in range(runs):
        for name, fn in entries.items():  # interleaved
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            build[name].append(time.monotonic() - t0)
            rows[name] = df.count()
            run[name].append(time.monotonic() - t0)

    for name in entries:
        b = ", ".join(f"{x:.3f}" for x in build[name])
        r = ", ".join(f"{x:.3f}" for x in run[name])
        print(
            f"{name:>5}: build min={min(build[name]):.3f}s "
            f"run min={min(run[name]):.3f}s rows={rows[name]}\n"
            f"       build [{b}]\n       run   [{r}]"
        )


if __name__ == "__main__":
    main()
