"""Bucketed range join + as-of join operator tests (B22/B23): results
must equal the naive (cross-product) reference computation on small
data — the bucketing is a pure optimization, never a semantics
change."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timescale_cdc_spark.operators.timejoin import as_of_join, range_join_bucketed

T0 = dt.datetime(2025, 6, 1, 12, 0, 0)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_range_join_matches_naive(spark):
    changes = _df(
        spark,
        [(1, T0), (2, T0 + dt.timedelta(minutes=30))],
        "change_id long, c_ts timestamp",
    )
    anomalies = _df(
        spark,
        [
            (10, T0 + dt.timedelta(minutes=2)),   # within 5m of change 1
            (11, T0 - dt.timedelta(minutes=4)),   # within 5m of change 1
            (12, T0 + dt.timedelta(minutes=20)),  # near nothing
            (13, T0 + dt.timedelta(minutes=34)),  # within 5m of change 2
            (14, T0 + dt.timedelta(minutes=5)),   # exactly at tolerance of change 1
        ],
        "anomaly_id long, a_ts timestamp",
    )
    got = {
        (r.change_id, r.anomaly_id)
        for r in range_join_bucketed(
            changes, anomalies, "c_ts", "a_ts", tolerance_seconds=300
        ).collect()
    }
    naive = {
        (r.change_id, r.anomaly_id)
        for r in changes.crossJoin(anomalies)
        .filter(
            F.abs(F.unix_timestamp("a_ts") - F.unix_timestamp("c_ts")) <= 300
        )
        .collect()
    }
    assert got == naive
    assert got == {(1, 10), (1, 11), (1, 14), (2, 13)}


def test_as_of_join_backward_and_forward(spark):
    purchases = _df(
        spark,
        [(1, 100, T0 + dt.timedelta(minutes=10)), (2, 100, T0 + dt.timedelta(minutes=1)),
         (3, 200, T0 + dt.timedelta(minutes=5))],
        "pid long, user_id long, p_ts timestamp",
    )
    clicks = _df(
        spark,
        [(50, 100, T0, 1.0), (51, 100, T0 + dt.timedelta(minutes=5), 2.0),
         (52, 300, T0, 9.0)],
        "cid long, user_id long, c_ts timestamp, v double",
    )
    back = {
        r.pid: r.right_cid
        for r in as_of_join(
            purchases, clicks, "user_id", "p_ts", "c_ts",
            right_cols=["cid", "v"], left_id="pid", tiebreak="cid",
        ).collect()
    }
    # pid 1 at +10m → latest click ≤ is cid 51 (+5m); pid 2 at +1m → cid 50;
    # pid 3 user 200 has no clicks → null
    assert back == {1: 51, 2: 50, 3: None}

    fwd = {
        r.pid: r.right_cid
        for r in as_of_join(
            purchases, clicks, "user_id", "p_ts", "c_ts",
            right_cols=["cid"], left_id="pid", tiebreak="cid",
            direction="forward",
        ).collect()
    }
    # earliest click ≥: pid 1 (+10m) → none; pid 2 (+1m) → cid 51
    assert fwd == {1: None, 2: 51, 3: None}


def test_as_of_join_union_equals_join_form(spark):
    """The union+window composition (zero join fan-out) must agree
    with the join-based form on both directions, including ties at
    equal timestamps and keys with no match."""
    import random

    from timescale_cdc_spark.operators.timejoin import as_of_join_union

    rng = random.Random(13)
    purchases = _df(
        spark,
        [(i, rng.randint(100, 105), T0 + dt.timedelta(seconds=rng.randint(0, 600)))
         for i in range(60)],
        "pid long, user_id long, p_ts timestamp",
    )
    clicks = _df(
        spark,
        [(1000 + i, rng.randint(100, 106),
          T0 + dt.timedelta(seconds=rng.choice([0, 60, 120, 300, 600])),
          float(i))
         for i in range(80)],
        "cid long, user_id long, c_ts timestamp, v double",
    )
    for direction in ("backward", "forward"):
        join_form = {
            r.pid: (r.right_cid, r.right_v)
            for r in as_of_join(
                purchases, clicks, "user_id", "p_ts", "c_ts",
                right_cols=["cid", "v"], left_id="pid", tiebreak="cid",
                direction=direction,
            ).collect()
        }
        union_form = {
            r.pid: (r.right_cid, r.right_v)
            for r in as_of_join_union(
                purchases, clicks, "user_id", "p_ts", "c_ts",
                right_cols=["cid", "v"], tiebreak="cid",
                direction=direction,
            ).collect()
        }
        assert union_form == join_form, direction

    # the union form's plan has no join at all
    out = as_of_join_union(
        purchases, clicks, "user_id", "p_ts", "c_ts",
        right_cols=["cid"], tiebreak="cid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
