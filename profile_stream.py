#!/usr/bin/env python3
"""Interleaved A/B profiler for the bench streaming-throughput leg
(round 15, VERDICT r14 #1 — adjudication recorded in SCALE.md).

BENCH_r14's 'streaming' block read append 37.9k / drain 34.3k
events/s vs r13's 51.6k / 60.4k raw (−27% / −43%) with
``_stream_throughput`` and the whole streaming package unchanged —
the classic host-drift suspicion, but a 43% drain drop is too large
to wave off without the house methodology: run BOTH trees' legs in
ONE session, alternating per repetition so drift hits both equally,
min/median per variant (the profile_c4.py pattern, including its
round-14 sys.modules-purge fix: the leg's root must stay pinned at
``sys.path[0]`` WHILE the leg executes, because
``_stream_throughput`` does call-time imports of the streaming
package that must resolve against the tree being measured).

The r13 tree is checked out read-only via ``git worktree add`` at the
commit carrying BENCH_r13 (argv[1]; default ba47154 — the final r13
code). Each repetition measures both legs' ``bench._stream_throughput``
against the same live SparkSession/JVM and the same ``SF_DIR``.

Usage: python profile_stream.py [r13_commit] [runs]
"""
from __future__ import annotations

import contextlib
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from timescale_cdc_spark.session import get_spark  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


@contextlib.contextmanager
def tree(root: str):
    """Make ``root`` THE resolvable tree for the duration of the
    block: purge the package AND the root-level ``bench`` module from
    sys.modules, pin root at sys.path[0] (see profile_c4.tree on why
    the pin must span the measured call, not just the import)."""
    for k in [
        k
        for k in sys.modules
        if k.startswith("timescale_cdc_spark") or k == "bench"
    ]:
        del sys.modules[k]
    sys.path.insert(0, root)
    try:
        yield
    finally:
        sys.path.remove(root)


def main() -> None:
    commit = sys.argv[1] if len(sys.argv) > 1 else "ba47154"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    wt = f"/tmp/stream_ab_{commit}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, commit],
            check=True,
        )

    spark = get_spark(
        master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    legs = {"r13": wt, "head": REPO}

    # warm-up both legs once (JVM/codegen/file-source startup);
    # results discarded
    for root in legs.values():
        with tree(root):
            import bench as B  # noqa: N814

            B._stream_throughput(spark)

    rates: dict[str, dict[str, list[int]]] = {
        k: {"append": [], "drain": []} for k in legs
    }
    events: dict[str, int] = {}
    for i in range(runs):
        for name, root in legs.items():  # interleaved
            with tree(root):
                import bench as B  # noqa: N814

                r = B._stream_throughput(spark)
                rates[name]["append"].append(r["append_events_per_s"])
                rates[name]["drain"].append(r["drain_events_per_s"])
                events[name] = r["events"]
        print(f"pass {i + 1}/{runs} done", flush=True)

    for name in legs:
        a, d = rates[name]["append"], rates[name]["drain"]
        print(
            f"{name:>5}: append max={max(a)} med={sorted(a)[len(a) // 2]} "
            f"drain max={max(d)} med={sorted(d)[len(d) // 2]} "
            f"events={events[name]}\n"
            f"       append {a}\n       drain  {d}"
        )


if __name__ == "__main__":
    main()
