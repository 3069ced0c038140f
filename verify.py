#!/usr/bin/env python3
"""One-command round regression gate (round 13, VERDICT r12 #5).

Runs, in fail-fast order, everything the grading driver checks:

  1. CONTRACT — `__spark_entry__.entry()` smoke + every `queries()`
     entry at sf0.01 compared against its `oracle_sql()` via DuckDB
     (the driver's t2 flow). Any hash/row/schema mismatch fails.
  2. BENCH — `bench.py` end-to-end; the final stdout line must parse
     as the summary JSON with a positive headline value.
  3. PYTEST — the full suite (includes the plan-pin tests in
     tests/test_plans.py, so a pushdown / broadcast / WindowGroupLimit
     / cached-scan regression fails here).

Optionally regenerates the plan artifact:

  python3 verify.py --plans 13     # also runs emit_plans.py 13

Skip the slow suite while iterating:

  python3 verify.py --no-pytest

Exit code 0 means every step passed; any failure exits nonzero with
the failing step named on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)


def _fail(step: str, detail: str = "") -> None:
    print(f"VERIFY FAIL [{step}] {detail}", file=sys.stderr, flush=True)
    sys.exit(1)


def step_contract() -> None:
    import __spark_entry__ as e
    from timescale_cdc_spark.oracle import compare_query
    from timescale_cdc_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    n = e.entry(spark).count()
    if n <= 0:
        _fail("contract", "entry() returned 0 rows")
    qs, osql = e.queries(), e.oracle_sql()
    bad: list[tuple[str, str]] = []
    for name in sorted(qs):
        if name in osql:
            r = compare_query(spark, name, "/root/testdata/sf0.01")
            status = "OK  " if r.ok else "BAD "
            print(f"{status}{name} {r.spark_rows}", flush=True)
            if not r.ok:
                bad.append((name, r.message))
        else:
            rows = qs[name](spark, "/root/testdata/sf0.01").count()
            print(f"rows-only {name} {rows}", flush=True)
            if rows <= 0:
                bad.append((name, "rows-only entry returned 0 rows"))
    spark.stop()
    if bad:
        _fail("contract", str(bad))


def step_bench() -> None:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True,
            text=True,
            timeout=900,
            cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        _fail("bench", "timed out after 900s")
    if proc.returncode != 0:
        _fail("bench", proc.stderr[-2000:])
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    try:
        summary = json.loads(lines[-1])
    except (IndexError, json.JSONDecodeError) as exc:
        _fail("bench", f"no parseable summary line: {exc}")
    if summary.get("metric") != "headline_queries_total" or not (
        summary.get("value", 0) > 0
    ):
        _fail("bench", f"bad summary: {lines[-1][:500]}")
    print("bench:", lines[-1], flush=True)


def step_pytest(slow: bool = False) -> None:
    # Default = the FAST tier (exactly the driver's `pytest tests/ -x
    # -q` invocation): every contract pin in <= ~10 min. The slow
    # tier (sf0.01 parity re-checks, index-lifecycle/crash-window
    # tests, multi-minute streaming drains — round 16, VERDICT r15
    # #1) is opt-in via --slow-tests and MUST be green at round end.
    cmd = [sys.executable, "-m", "pytest", "tests/", "-x", "-q"]
    if slow:
        cmd.append("--runslow")
    try:
        proc = subprocess.run(cmd, cwd=ROOT, timeout=3600)
    except subprocess.TimeoutExpired:
        _fail("pytest", "timed out after 3600s")
    if proc.returncode != 0:
        _fail("pytest", f"exit {proc.returncode}")


def step_plans(rnd: str) -> None:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "emit_plans.py"), rnd],
            cwd=ROOT,
            timeout=900,
        )
    except subprocess.TimeoutExpired:
        _fail("plans", "timed out after 900s")
    if proc.returncode != 0:
        _fail("plans", f"exit {proc.returncode}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-pytest", action="store_true",
                    help="skip the test suite (iteration mode)")
    ap.add_argument("--slow-tests", action="store_true",
                    help="run the slow tier too (pytest --runslow)")
    ap.add_argument("--no-bench", action="store_true",
                    help="skip the bench run (iteration mode)")
    ap.add_argument("--plans", metavar="N",
                    help="also regenerate PLANS_r{N}.md via emit_plans.py")
    args = ap.parse_args()

    t0 = time.monotonic()
    step_contract()
    if not args.no_bench:
        step_bench()
    if not args.no_pytest:
        step_pytest(slow=args.slow_tests)
    if args.plans:
        step_plans(args.plans)
    print(
        f"VERIFY PASS ({time.monotonic() - t0:.0f}s: contract"
        + ("" if args.no_bench else " + bench")
        + ("" if args.no_pytest else " + pytest")
        + (f" + plans r{args.plans}" if args.plans else "")
        + ")",
        flush=True,
    )


if __name__ == "__main__":
    main()
