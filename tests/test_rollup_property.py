"""Randomized (seeded, deterministic) equivalence properties for the
round-7 rollup families, in the style of test_poller_property: for
ANY generated observation set and any nested (fine, coarse) width
pair, rollup-of-fine-partials must equal the direct coarse
computation — exactly for state and heartbeat (integer microseconds),
exactly-with-zero-error for Misra-Gries in the small regime, and
within the undercount/completeness guarantees in the compressed
regime (checked against exact Python-side counts)."""

from __future__ import annotations

import datetime as dt
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from timescale_cdc_spark.functions.freq import freq_partials, freq_rollup
from timescale_cdc_spark.functions.state import (
    heartbeat_partials,
    heartbeat_rollup,
    heartbeat_summary,
    state_agg,
    state_partials,
    state_rollup,
)

T0 = dt.datetime(2024, 3, 1)
WIDTH_PAIRS = [("1 hour", "1 day"), ("30 minutes", "6 hours"),
               ("2 hours", "1 day")]


def _random_rows(seed: int, n: int = 400):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                T0 + dt.timedelta(minutes=rng.randint(0, 3 * 1440),
                                  seconds=rng.randint(0, 59)),
                f"k{rng.randint(0, 11)}",
                f"s{rng.randint(0, 4)}",
            )
        )
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("fine,coarse", WIDTH_PAIRS)
def test_state_rollup_equals_direct_random(spark, seed, fine, coarse):
    df = spark.createDataFrame(
        _random_rows(seed), "id long, t timestamp, k string, st string"
    )

    def entries(d):
        return d.select(
            "k", "bucket", "n", "n_transitions",
            F.explode("durs").alias("state", "dur_us"),
        )

    direct = state_agg(df, "t", ["k"], "st", "id", coarse)
    rolled = state_rollup(
        state_partials(df, "t", ["k"], "st", "id", fine), ["k"], coarse
    )
    assert direct.count() == rolled.count() > 0
    assert entries(direct).exceptAll(entries(rolled)).count() == 0
    assert entries(rolled).exceptAll(entries(direct)).count() == 0


@pytest.mark.parametrize("seed", [4, 5])
@pytest.mark.parametrize("fine,coarse", WIDTH_PAIRS[:2])
def test_heartbeat_rollup_equals_direct_random(spark, seed, fine, coarse):
    rows = [(t, k) for _, t, k, _ in _random_rows(seed)]
    df = spark.createDataFrame(rows, "t timestamp, k string")
    cols = ["k", "bucket", "ranges", "live_us", "n_ranges",
            "n_heartbeats", "dead_us", "uptime"]
    direct = heartbeat_summary(df, "t", ["k"], "45 minutes", coarse)
    rolled = heartbeat_rollup(
        heartbeat_partials(df, "t", ["k"], "45 minutes", fine),
        ["k"], coarse,
    )
    d, r = direct.select(*cols), rolled.select(*cols)
    assert d.count() == r.count() > 0
    assert d.exceptAll(r).count() == 0
    assert r.exceptAll(d).count() == 0


@pytest.mark.parametrize("seed", [6, 7])
def test_freq_rollup_guarantees_random(spark, seed):
    rows = _random_rows(seed)
    df = spark.createDataFrame(
        rows, "id long, t timestamp, k string, item string"
    )
    # small regime: 5 items < max_size -> exact, zero error
    rolled = freq_rollup(
        freq_partials(df, "t", ["k"], "item", "1 hour", 16),
        ["k"], "1 day", 16,
    )
    assert rolled.where(F.col("err") != 0).count() == 0
    exact = Counter()
    for _, t, k, item in rows:
        day = t.replace(hour=0, minute=0, second=0, microsecond=0)
        exact[(k, day, item)] += 1
    got = {}
    for r in rolled.collect():
        for item, c in r["mg"].items():
            got[(r["k"], r["bucket"], item)] = c
    assert got == dict(exact)
    # compressed regime: max_size=2 -> undercount + completeness vs
    # the same exact counts
    comp = freq_rollup(
        freq_partials(df, "t", ["k"], "item", "1 hour", 2),
        ["k"], "1 day", 2,
    )
    for r in comp.collect():
        err = r["err"]
        group = {
            item: c for (k2, d2, item), c in exact.items()
            if k2 == r["k"] and d2 == r["bucket"]
        }
        for item, est in r["mg"].items():
            assert est <= group[item] <= est + err, (r["k"], item)
        for item, true in group.items():
            if true > err:
                assert item in r["mg"], (r["k"], item, true, err)
