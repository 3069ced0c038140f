#!/usr/bin/env python3
"""Interleaved A/B profiler for c4_text_analysis (round 14, VERDICT
r13 #2 — adjudication recorded in SCALE.md).

BENCH_r13 showed c4_text_analysis +24% calibration-normalized over
r12 (raw 0.596 → 1.183 s) with the entry code unchanged. The house
methodology for "likely drift" suspicions (r10/r13 precedents): run
BOTH trees' entries in ONE session, alternating per repetition so
host drift hits both equally, min-of-N per variant. The r12 tree is
checked out read-only via ``git worktree add`` at the commit carrying
BENCH_r12 (pass it as argv[1]; default 1786a94). Each repetition
switches trees with the ``tree()`` context manager — purge
``timescale_cdc_spark*`` from sys.modules and pin that tree's root at
sys.path[0] FOR THE DURATION of the call, because entries do
call-time imports that must resolve against the tree being measured
(review finding, round 14) — with the re-import outside the timer;
both variants run against the same live SparkSession/JVM.

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


import contextlib


@contextlib.contextmanager
def tree(root: str):
    """Make ``root`` THE resolvable timescale_cdc_spark tree for the
    duration of the block: purge the package from sys.modules and pin
    root at sys.path[0]. Crucial detail (round-14 review finding):
    entries do CALL-TIME imports (`from ...operators.text import ...`
    inside the function body), so the leg's root must stay on
    sys.path WHILE the entry executes — a load-then-restore helper
    would silently resolve those imports against the other tree and
    the A/B would compare HEAD with HEAD."""
    for k in [
        k for k in sys.modules if k.startswith("timescale_cdc_spark")
    ]:
        del sys.modules[k]
    sys.path.insert(0, root)
    try:
        yield
    finally:
        sys.path.remove(root)


def load_entry():
    from timescale_cdc_spark.queries import QUERIES

    return QUERIES["c4_text_analysis"]


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
    legs = {"r12": wt, "head": REPO}

    # warm-up both (JVM/codegen/catalog startup amortized off both)
    for root in legs.values():
        with tree(root):
            load_entry()(spark, SF_DIR).count()

    build: dict[str, list[float]] = {k: [] for k in legs}
    run: dict[str, list[float]] = {k: [] for k in legs}
    rows: dict[str, int] = {}
    for _ in range(runs):
        for name, root in legs.items():  # interleaved
            with tree(root):  # re-import untimed; call timed inside
                fn = load_entry()
                t0 = time.monotonic()
                df = fn(spark, SF_DIR)
                build[name].append(time.monotonic() - t0)
                rows[name] = df.count()
                run[name].append(time.monotonic() - t0)

    for name in legs:
        b = ", ".join(f"{x:.3f}" for x in build[name])
        r = ", ".join(f"{x:.3f}" for x in run[name])
        print(
            f"{name:>5}: build min={min(build[name]):.3f}s "
            f"run min={min(run[name]):.3f}s rows={rows[name]}\n"
            f"       build [{b}]\n       run   [{r}]"
        )


if __name__ == "__main__":
    main()
