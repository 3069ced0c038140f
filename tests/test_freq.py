"""freq_agg / topn / rollup(freq_agg) (functions/freq.py): hand-
derived Misra-Gries semantics, the undercount/completeness guarantees
checked against exact counts in the compressed regime, exactness +
DuckDB parity in the small regime, rollup==direct in the exact
regime over the events fixture, and plan pinning (one exchange, no
Python eval).
"""

from __future__ import annotations

import datetime as dt
from collections import Counter

import pytest
from pyspark.sql import functions as F

from timescale_cdc_spark.functions.freq import (
    freq_agg,
    freq_partials,
    freq_rollup,
    topn,
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def skewed(spark):
    """One key, two hours. Hour 0: a×6, b×3, c×2, d×1. Hour 1: a×2,
    e×4, f×1. Exact counts are checkable by eye."""
    rows = []
    for item, cnt in [("a", 6), ("b", 3), ("c", 2), ("d", 1)]:
        rows += [("k", _ts(0, i), item) for i in range(cnt)]
    for item, cnt in [("a", 2), ("e", 4), ("f", 1)]:
        rows += [("k", _ts(1, 30 + i), item) for i in range(cnt)]
    return spark.createDataFrame(rows, "k string, ts timestamp, item string")


def test_exact_regime_no_error(skewed):
    p = {
        r["bucket"].hour: r
        for r in freq_agg(
            skewed, "ts", ["k"], "item", "1 hour", max_size=16
        ).collect()
    }
    assert p[0]["mg"] == {"a": 6, "b": 3, "c": 2, "d": 1}
    assert p[0]["err"] == 0 and p[0]["n"] == 12
    assert p[1]["mg"] == {"a": 2, "e": 4, "f": 1}


def test_compression_guarantees_hand_derived(skewed):
    """max_size=2 in hour 0: exact {a:6,b:3,c:2,d:1}; the 3rd largest
    (2) is subtracted and <=0 drop -> {a:4,b:1}, err=2. Every MG
    guarantee is visible: est<=true, true-est<=err, and every item
    with true>err survives."""
    p = {
        r["bucket"].hour: r
        for r in freq_agg(
            skewed, "ts", ["k"], "item", "1 hour", max_size=2
        ).collect()
    }
    assert p[0]["mg"] == {"a": 4, "b": 1}
    assert p[0]["err"] == 2
    exact = {"a": 6, "b": 3, "c": 2, "d": 1}
    for item, est in p[0]["mg"].items():
        assert est <= exact[item] <= est + p[0]["err"]
    for item, true in exact.items():
        if true > p[0]["err"]:
            assert item in p[0]["mg"], item


def test_rollup_merges_and_guarantees(skewed):
    """Hourly max_size=2 partials rolled to 1 day: counters add,
    errors add with the re-compression decrement, and the guarantees
    hold against the exact daily counts."""
    hourly = freq_partials(skewed, "ts", ["k"], "item", "1 hour", max_size=2)
    [day] = freq_rollup(hourly, ["k"], "1 day", max_size=2).collect()
    exact = {"a": 8, "b": 3, "c": 2, "d": 1, "e": 4, "f": 1}
    assert day["n"] == sum(exact.values())
    assert 0 < len(day["mg"]) <= 2
    for item, est in day["mg"].items():
        assert est <= exact[item] <= est + day["err"]
    for item, true in exact.items():
        if true > day["err"]:
            assert item in day["mg"], item


def test_topn_accessor_bounds(skewed):
    agg = freq_agg(skewed, "ts", ["k"], "item", "1 hour", max_size=2)
    rows = {
        (r["bucket"].hour, r["item"]): r
        for r in topn(agg, 2, ["k"]).collect()
    }
    r = rows[(0, "a")]
    assert r["min_freq"] == 4 and r["max_freq"] == 6
    assert r["total"] == 12
    assert r["min_frac"] == pytest.approx(4 / 12, abs=1e-6)
    assert r["max_frac"] == pytest.approx(6 / 12, abs=1e-6)
    # ordered: 'a' ranks above 'b'
    assert (0, "b") in rows and rows[(0, "b")]["min_freq"] == 1


def test_exact_regime_duckdb_parity_events(spark, sf_dir):
    """event_type cardinality is far below max_size=16, so every
    (user, day) summary must EQUAL the exact DuckDB counts with
    err=0."""
    import duckdb

    from timescale_cdc_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {}
    for r in freq_agg(
        ev, "ts", ["user_id"], "event_type", "1 day", max_size=16
    ).collect():
        assert r["err"] == 0
        got[(r["user_id"], str(r["bucket"]))] = (dict(r["mg"]), r["n"])
    want_rows = duckdb.sql(
        f"""
        SELECT user_id,
               to_timestamp(floor(epoch(ts) / 86400) * 86400) AS bucket,
               event_type, count(*) AS c
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2, 3
        """
    ).fetchall()
    want = {}
    for user_id, bucket, event_type, c in want_rows:
        key = (user_id, str(bucket.replace(tzinfo=None)))
        m, n = want.setdefault(key, ({}, 0))
        m[event_type] = c
        want[key] = (m, n + c)
    assert got == want


def test_rollup_equals_direct_exact_regime(spark, sf_dir):
    """In the exact regime (max_size above the item cardinality) the
    rollup of hourly summaries must equal the direct daily summary
    outright — same maps, zero error."""
    from timescale_cdc_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = freq_partials(
        ev, "ts", ["user_id"], "event_type", "1 hour", max_size=16
    )
    rolled = freq_rollup(hourly, ["user_id"], "1 day", max_size=16)
    direct = freq_agg(
        ev, "ts", ["user_id"], "event_type", "1 day", max_size=16
    )

    def entries(df):
        return df.select(
            "user_id", "bucket", "err", "n",
            F.explode("mg").alias("item", "c"),
        )

    assert direct.count() == rolled.count() > 0
    assert entries(direct).exceptAll(entries(rolled)).count() == 0
    assert entries(rolled).exceptAll(entries(direct)).count() == 0


def test_compressed_rollup_guarantees_synthetic(spark):
    """Zipf-ish stream over 40 items, 24 hourly buckets, max_size=8:
    after rollup to 1 day the undercount and completeness guarantees
    hold vs exact counts, and the true heavy hitter is ranked #1."""
    import random

    rnd = random.Random(11)
    items = [f"i{j:02d}" for j in range(40)]
    rows = []
    for h in range(24):
        for m in range(60):
            # heavy item i00 ~ 1/3 of mass; rest long-tail
            item = "i00" if rnd.random() < 0.34 else rnd.choice(items[1:])
            rows.append(("k", _ts(h, m), item))
    exact = Counter(item for _, _, item in rows)
    df = spark.createDataFrame(rows, "k string, ts timestamp, item string")
    hourly = freq_partials(df, "ts", ["k"], "item", "1 hour", max_size=8)
    [day] = freq_rollup(hourly, ["k"], "1 day", max_size=8).collect()
    assert day["n"] == len(rows)
    for item, est in day["mg"].items():
        assert est <= exact[item] <= est + day["err"], item
    for item, true in exact.items():
        if true > day["err"]:
            assert item in day["mg"], (item, true, day["err"])
    top = topn(
        freq_rollup(hourly, ["k"], "1 day", max_size=8), 1, ["k"]
    ).collect()
    assert top[0]["item"] == "i00"


def test_freq_plans_one_exchange_no_python(spark, skewed):
    p = freq_partials(skewed, "ts", ["k"], "item", "1 hour", max_size=4)
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rplan = (
        freq_rollup(p, ["k"], "1 day", max_size=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert rplan.count("Exchange hashpartitioning") == 2, rplan
    assert "BatchEvalPython" not in rplan and "ArrowEvalPython" not in rplan
