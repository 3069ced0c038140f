"""Semantic tests for the Timescale hyperfunction analogs
(functions/hyper.py): dense gapfill grid, LOCF, linear interpolation,
LOCF time-weighted average, first/last-by-time. Oracle hash-parity is
covered by test_oracle_parity (ts_gapfill_hyperfunctions); these pin
the SEMANTICS on a hand-built frame where every expected value is
derivable by eye.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timescale_cdc_spark.functions.hyper import time_bucket_gapfill


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def tiny(spark):
    """One series, observations in hours 0, 1, and 4 — hours 2-3 are
    gaps. Hour 0 has two points for avg/first/last/twa checks."""
    rows = [
        (1, _ts(0, 0), "a", 10.0),
        (2, _ts(0, 30), "a", 20.0),
        (3, _ts(1, 15), "a", 30.0),
        (4, _ts(4, 0), "a", 50.0),
        # second series: single observation at hour 2
        (5, _ts(2, 0), "b", 7.0),
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp, k string, v double")


@pytest.fixture(scope="module")
def filled(tiny):
    out = time_bucket_gapfill(tiny, "1 hour", "ts", ["k"], "v", "id")
    return {
        (r["k"], r["bucket"].hour): r for r in out.collect()
    }, out.count()


def test_dense_grid_covers_global_range_per_key(filled):
    rows, n = filled
    # global range hour 0..4 → 5 buckets × 2 keys
    assert n == 10
    assert {(k, h) for k, h in rows} == {
        (k, h) for k in ("a", "b") for h in range(5)
    }


def test_gap_rows_have_null_raw_aggregates(filled):
    rows, _ = filled
    for k, h in [("a", 2), ("a", 3), ("b", 0), ("b", 4)]:
        r = rows[(k, h)]
        assert r["n_events"] is None
        assert r["avg_value"] is None
        assert r["twa"] is None
        assert r["first_val"] is None


def test_bucket_aggregates(filled):
    rows, _ = filled
    a0 = rows[("a", 0)]
    assert a0["n_events"] == 2
    assert a0["avg_value"] == pytest.approx(15.0)
    assert a0["first_val"] == 10.0
    assert a0["last_val"] == 20.0
    assert a0["delta"] == pytest.approx(10.0)
    # LOCF TWA in hour 0: 10.0 holds 00:00→00:30, 20.0 holds
    # 00:30→01:00 → (10*30 + 20*30)/60 = 15.0
    assert a0["twa"] == pytest.approx(15.0)
    # single-event bucket: twa == the value (holds to bucket end)
    b2 = rows[("b", 2)]
    assert b2["twa"] == pytest.approx(7.0)
    assert b2["delta"] == pytest.approx(0.0)


def test_locf_carries_last_observation(filled):
    rows, _ = filled
    # a: avg hour1 = 30 → hours 2,3 LOCF = 30; hour 4 has data again
    assert rows[("a", 2)]["locf_avg"] == pytest.approx(30.0)
    assert rows[("a", 3)]["locf_avg"] == pytest.approx(30.0)
    assert rows[("a", 4)]["locf_avg"] == pytest.approx(50.0)
    # b: nothing before hour 2 → LOCF null at 0,1; carried at 3,4
    assert rows[("b", 0)]["locf_avg"] is None
    assert rows[("b", 1)]["locf_avg"] is None
    assert rows[("b", 3)]["locf_avg"] == pytest.approx(7.0)


def test_interpolate_linear_between_known_null_at_edges(filled):
    rows, _ = filled
    # a: between hour1 (30) and hour4 (50): hour2 = 30 + 20*(1/3),
    # hour3 = 30 + 20*(2/3)
    assert rows[("a", 2)]["interp_avg"] == pytest.approx(36.666667, abs=1e-6)
    assert rows[("a", 3)]["interp_avg"] == pytest.approx(43.333333, abs=1e-6)
    # data rows keep their own value
    assert rows[("a", 1)]["interp_avg"] == pytest.approx(30.0)
    # b: before first / after last observation → null
    assert rows[("b", 0)]["interp_avg"] is None
    assert rows[("b", 4)]["interp_avg"] is None


def test_single_shuffle_bucket_aggregation(tiny):
    """The per-bucket windows (lead/row_number) and the groupBy must
    share ONE exchange of the fact table — the windows partition on
    the same (key, bucket) keys the aggregate groups on."""
    from timescale_cdc_spark.functions.hyper import bucketed_hyperaggs

    plan = bucketed_hyperaggs(
        tiny, "1 hour", "ts", ["k"], "v", "id"
    )._jdf.queryExecution().executedPlan().toString()
    # exchanges: exactly one hashpartitioning exchange over the facts
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_counter_delta_reset_aware(spark):
    """Counter 10→25→3→9 in one bucket: growth 15, reset, then the
    restart counts 3 (reset restarts near 0) + growth 6 → delta 24;
    one reset. Plain last-first would say -1."""
    from timescale_cdc_spark.functions.hyper import counter_delta

    rows = [
        ("a", _ts(0, 0), 10.0, 1),
        ("a", _ts(0, 10), 25.0, 2),
        ("a", _ts(0, 20), 3.0, 3),
        ("a", _ts(0, 30), 9.0, 4),
        # second key: monotone, no resets
        ("b", _ts(0, 5), 100.0, 5),
        ("b", _ts(0, 15), 250.0, 6),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, id long")
    out = {
        r["k"]: r
        for r in counter_delta(df, "ts", ["k"], "v", "id").collect()
    }
    assert out["a"]["delta"] == pytest.approx(15.0 + 3.0 + 6.0)
    assert out["a"]["n_resets"] == 1
    assert out["b"]["delta"] == pytest.approx(150.0)
    assert out["b"]["n_resets"] == 0

    # bucketed form: each bucket's first obs contributes nothing
    rows2 = [
        ("a", _ts(0, 0), 10.0, 1),
        ("a", _ts(0, 30), 40.0, 2),   # hour 0: delta 30
        ("a", _ts(1, 0), 50.0, 3),    # hour 1 first obs: no contribution
        ("a", _ts(1, 30), 55.0, 4),   # hour 1: delta 5
    ]
    df2 = spark.createDataFrame(rows2, "k string, ts timestamp, v double, id long")
    out2 = {
        r["bucket"].hour: r["delta"]
        for r in counter_delta(df2, "ts", ["k"], "v", "id", width="1 hour").collect()
    }
    assert out2[0] == pytest.approx(30.0)
    assert out2[1] == pytest.approx(5.0)


def test_histogram_under_over_flow(spark):
    from timescale_cdc_spark.functions.hyper import histogram

    rows = [("a", v) for v in [-5.0, 0.0, 2.5, 5.0, 7.5, 9.99, 10.0, 42.0]]
    df = spark.createDataFrame(rows, "k string, v double")
    [r] = histogram(df, "v", ["k"], 0.0, 10.0, 4).collect()
    # buckets: underflow | [0,2.5) [2.5,5) [5,7.5) [7.5,10) | overflow
    assert r["counts"] == [1, 1, 1, 1, 2, 2]


def test_sql_time_bucket_matches_helper(spark, sf_dir):
    """time_bucket registered as a Spark SQL-defined function (EP3
    SQL surface): identical output to the Python helper on the events
    fixture, for every width unit the helper accepts — and it inlines
    as a pure expression (no Python evaluation in the plan)."""
    from timescale_cdc_spark.catalog import register_views
    from timescale_cdc_spark.functions.time import time_bucket

    register_views(spark, sf_dir)
    for width in ["90 seconds", "15 minutes", "2 hours", "1 day"]:
        via_sql = spark.sql(
            f"SELECT event_id, time_bucket('{width}', ts) AS b FROM events"
        )
        via_helper = spark.sql("SELECT event_id, ts FROM events").select(
            "event_id", time_bucket(width, "ts").alias("b")
        )
        assert via_sql.exceptAll(via_helper).count() == 0
        assert via_helper.exceptAll(via_sql).count() == 0
    plan = spark.sql(
        "SELECT time_bucket('15 minutes', ts) FROM events"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stats_agg_semantics_hand_derived(spark):
    """y = 2x + 1 exactly over x=0..3 in one key: slope 2, intercept
    1, r2 = corr = 1; avg_y = 4, var_y = sample var of {1,3,5,7} =
    20/3. A second key with constant y pins the degenerate branch
    (zero variance -> null corr/r2, slope 0)."""
    from timescale_cdc_spark.functions.hyper import stats_agg

    rows = [("a", float(x), 2.0 * x + 1.0) for x in range(4)]
    rows += [("b", float(x), 5.0) for x in range(3)]
    df = spark.createDataFrame(rows, "k string, x double, y double").withColumn(
        "ts", F.lit(dt.datetime(2024, 1, 1))
    )
    out = {
        r["k"]: r
        for r in stats_agg(df, "ts", ["k"], "y", x_col="x").collect()
    }
    a = out["a"]
    assert a["n"] == 4
    assert a["avg_y"] == pytest.approx(4.0)
    assert a["var_y"] == pytest.approx(20.0 / 3.0)
    assert a["slope"] == pytest.approx(2.0)
    assert a["intercept"] == pytest.approx(1.0)
    assert a["r2"] == pytest.approx(1.0)
    assert a["corr_xy"] == pytest.approx(1.0)
    b = out["b"]
    assert b["slope"] == pytest.approx(0.0)
    assert b["corr_xy"] is None  # zero y-variance: correlation undefined


def test_stats_agg_duckdb_parity(spark, sf_dir):
    """Per (event_type, 1-day bucket) regression of value against
    time over the real events fixture must match DuckDB's identically
    named aggregates to float tolerance (not hash-exact: the two
    engines legitimately sum moments in different orders)."""
    import duckdb

    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import stats_agg

    ev = load_table(spark, sf_dir, "events")
    got = {
        (r["event_type"], str(r["bucket"])): r
        for r in stats_agg(
            ev, "ts", ["event_type"], "value", width="1 day"
        ).collect()
    }
    want = duckdb.sql(
        f"""
        SELECT event_type,
               to_timestamp(floor(epoch(ts) / 86400) * 86400) AS bucket,
               count(value) AS n,
               avg(value) AS avg_y,
               stddev_samp(value) AS stddev_y,
               var_samp(value) AS var_y,
               covar_samp(epoch(ts), value) AS covar_xy,
               corr(epoch(ts), value) AS corr_xy,
               regr_slope(value, epoch(ts)) AS slope,
               regr_intercept(value, epoch(ts)) AS intercept,
               regr_r2(value, epoch(ts)) AS r2
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2
        """
    ).fetchall()
    assert len(want) == len(got)
    cols = ["n", "avg_y", "stddev_y", "var_y", "covar_xy", "corr_xy",
            "slope", "intercept", "r2"]
    for row in want:
        key = (row[0], str(row[1].replace(tzinfo=None)))
        g = got[key]
        for i, c in enumerate(cols, start=2):
            assert g[c] == pytest.approx(row[i], rel=1e-6, abs=1e-9), (
                key, c, g[c], row[i]
            )


def test_stats_agg_single_shuffle(spark):
    """stats_agg must plan as partial-agg -> ONE exchange -> final-agg
    (every statistic is a declarative JVM aggregate), with no window
    and no Python evaluation."""
    from timescale_cdc_spark.functions.hyper import stats_agg

    rows = [("a", dt.datetime(2024, 1, 1, h), float(h)) for h in range(6)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    plan = stats_agg(
        df, "ts", ["k"], "v", width="1 hour"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_percentile_agg_exact_and_approx(spark):
    """1..100 in one key: exact p50 = 50.5, p90 = 90.1 (linear
    interpolation). The approx sketch at accuracy 10000 is exact at
    this n (rank error n/2e4 < 1), and max_err_rank reports the
    bound."""
    from timescale_cdc_spark.functions.hyper import percentile_agg

    rows = [("a", dt.datetime(2024, 1, 1), float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    [ex] = percentile_agg(
        df, "ts", ["k"], "v", [0.5, 0.9], exact=True
    ).collect()
    assert ex["n"] == 100
    assert ex["quantiles"][0] == pytest.approx(50.5)
    assert ex["quantiles"][1] == pytest.approx(90.1)
    assert ex["max_err_rank"] == 0.0
    [ap] = percentile_agg(df, "ts", ["k"], "v", [0.5, 0.9]).collect()
    # GK sketch returns an observed value within rank-error of the target
    assert abs(ap["quantiles"][0] - 50.5) <= 1.0
    assert abs(ap["quantiles"][1] - 90.1) <= 1.0
    assert ap["max_err_rank"] == pytest.approx(100 / 20000.0)


def test_percentile_agg_exact_duckdb_parity(spark, sf_dir):
    """exact=True must match DuckDB quantile_cont per (event_type,
    1-day bucket) on the real events fixture (both linear-interpolate)."""
    import duckdb

    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import percentile_agg

    ev = load_table(spark, sf_dir, "events")
    got = {
        (r["event_type"], str(r["bucket"])): r["quantiles"]
        for r in percentile_agg(
            ev, "ts", ["event_type"], "value", [0.25, 0.5, 0.95],
            width="1 day", exact=True,
        ).collect()
    }
    want = duckdb.sql(
        f"""
        SELECT event_type,
               to_timestamp(floor(epoch(ts) / 86400) * 86400) AS bucket,
               quantile_cont(value, [0.25, 0.5, 0.95]) AS qs
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2
        """
    ).fetchall()
    assert len(want) == len(got)
    for et, bucket, qs in want:
        g = got[(et, str(bucket.replace(tzinfo=None)))]
        for a, b in zip(g, qs):
            assert a == pytest.approx(b, rel=1e-9)


def test_candlestick_agg_semantics(spark):
    """Hour-0 series 10 → 30 → 5 → 20 (by ts, id tie-break): open 10,
    high 30, low 5, close 20, volume 4."""
    from timescale_cdc_spark.functions.hyper import candlestick_agg

    rows = [
        (1, _ts(0, 0), "a", 10.0),
        (2, _ts(0, 10), "a", 30.0),
        (3, _ts(0, 20), "a", 5.0),
        (4, _ts(0, 30), "a", 20.0),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, k string, v double")
    [r] = candlestick_agg(df, "ts", ["k"], "v", "id", "1 hour").collect()
    assert (r["open"], r["high"], r["low"], r["close"]) == (10.0, 30.0, 5.0, 20.0)
    assert r["volume"] == 4
    assert r["open_time"] == _ts(0, 0) and r["close_time"] == _ts(0, 30)


def test_percentile_and_candlestick_single_shuffle(spark):
    """Both new hyperaggs must plan as ONE exchange with no window and
    no Python evaluation (mergeable sketch / min_by declarative aggs)."""
    from timescale_cdc_spark.functions.hyper import (
        candlestick_agg,
        percentile_agg,
    )

    rows = [(1, dt.datetime(2024, 1, 1, h), "a", float(h)) for h in range(6)]
    df = spark.createDataFrame(rows, "id long, ts timestamp, k string, v double")
    for out in (
        percentile_agg(df, "ts", ["k"], "v", [0.5], width="1 hour"),
        candlestick_agg(df, "ts", ["k"], "v", "id", "1 hour"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stats_rollup_matches_direct_daily(spark, sf_dir):
    """Timescale rollup(stats_agg): hourly partials merged to daily
    must reproduce stats_agg computed directly at daily granularity —
    the two-step aggregation never re-reads facts, only the Chan
    pairwise merge of stored (n, mean, M2, co-moment) state."""
    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import (
        stats_agg,
        stats_agg_partials,
        stats_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = stats_agg_partials(ev, "ts", ["event_type"], "value", "1 hour")
    rolled = {
        (r["event_type"], str(r["bucket"])): r
        for r in stats_rollup(hourly, ["event_type"], width="1 day").collect()
    }
    direct = stats_agg(ev, "ts", ["event_type"], "value", width="1 day")
    cols = ["n", "avg_y", "stddev_y", "var_y", "covar_xy", "corr_xy",
            "slope", "intercept", "r2"]
    n_checked = 0
    for d in direct.collect():
        g = rolled[(d["event_type"], str(d["bucket"]))]
        for c in cols:
            if d[c] is None:
                assert g[c] is None, (c, g[c])
            else:
                assert g[c] == pytest.approx(d[c], rel=1e-6, abs=1e-9), (
                    d["event_type"], str(d["bucket"]), c, g[c], d[c]
                )
        n_checked += 1
    assert n_checked == len(rolled) and n_checked > 0


def test_stats_rollup_grand_total_and_degenerate(spark):
    """width=None merges ALL of a key's partials into one row; a
    single-observation bucket (n=1, zero moments) merges losslessly
    and a constant-y key keeps the degenerate semantics (null corr,
    r2=1 over varying x)."""
    from timescale_cdc_spark.functions.hyper import (
        stats_agg,
        stats_agg_partials,
        stats_rollup,
    )

    rows = [("a", dt.datetime(2024, 1, 1, h, m), float(h) * 2 + 1.0)
            for h in range(3) for m in ([0, 30] if h < 2 else [0])]
    rows += [("b", dt.datetime(2024, 1, 1, h), 5.0) for h in range(3)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    hourly = stats_agg_partials(df, "ts", ["k"], "v", "1 hour")
    rolled = {r["k"]: r for r in stats_rollup(hourly, ["k"]).collect()}
    direct = {
        r["k"]: r for r in stats_agg(df, "ts", ["k"], "v").collect()
    }
    for k in ("a", "b"):
        for c in ("n", "avg_y", "var_y", "slope", "intercept", "r2"):
            d, g = direct[k][c], rolled[k][c]
            if d is None:
                assert g is None, (k, c, g)
            else:
                assert g == pytest.approx(d, rel=1e-9, abs=1e-12), (k, c, g, d)
    assert rolled["b"]["corr_xy"] is None
    assert rolled["b"]["r2"] == pytest.approx(1.0)


def test_stats_rollup_plan_jvm_fold_one_exchange(spark):
    """The rollup must be ONE hash-aggregate exchange whose merge is a
    codegen'd higher-order fold — no Python eval, no window, no second
    shuffle."""
    from timescale_cdc_spark.functions.hyper import (
        stats_agg_partials,
        stats_rollup,
    )

    rows = [("a", dt.datetime(2024, 1, 1, h), float(h)) for h in range(6)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    hourly = stats_agg_partials(df, "ts", ["k"], "v", "1 hour")
    plan = stats_rollup(
        hourly, ["k"], width="1 day"
    )._jdf.queryExecution().executedPlan().toString()
    # two aggregations (partials + rollup) -> two exchanges total, but
    # the ROLLUP stage itself adds exactly one
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stats_partials_in_continuous_aggregate(spark, sf_dir, tmp_path):
    """The cagg two-step story end-to-end: a ContinuousAggregate whose
    agg_builder stores stats partials per (event_type, hour); querying
    daily stats via stats_rollup over the MATERIALIZED rows (facts
    never re-read) matches stats_agg straight over the source."""
    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.cdc.caggs import ContinuousAggregate
    from timescale_cdc_spark.functions.hyper import (
        stats_agg,
        stats_partial_columns,
        stats_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    cagg = ContinuousAggregate(
        spark,
        str(tmp_path / "stats_cagg"),
        "1 hour",
        "ts",
        ["event_type"],
        lambda: stats_partial_columns("ts", "value"),
    )
    cagg.refresh(ev)
    mat = cagg.materialized().select(
        "event_type", "bucket", "n", "mx", "my", "m2x", "m2y", "cxy"
    )
    rolled = {
        (r["event_type"], str(r["bucket"])): r
        for r in stats_rollup(mat, ["event_type"], width="1 day").collect()
    }
    direct = stats_agg(ev, "ts", ["event_type"], "value", width="1 day")
    for d in direct.collect():
        g = rolled[(d["event_type"], str(d["bucket"]))]
        assert g["n"] == d["n"]
        assert g["slope"] == pytest.approx(d["slope"], rel=1e-6)
        assert g["avg_y"] == pytest.approx(d["avg_y"], rel=1e-9)


def test_candlestick_rollup_matches_direct_daily(spark, sf_dir):
    """rollup(candlestick_agg): hourly candles merged to daily must
    equal candlestick_agg computed directly at daily granularity, and
    width=None must yield the whole-range candle per key."""
    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import (
        candlestick_agg,
        candlestick_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = candlestick_agg(ev, "ts", ["event_type"], "value", "event_id",
                             "1 hour")
    rolled = candlestick_rollup(hourly, ["event_type"], width="1 day")
    direct = candlestick_agg(ev, "ts", ["event_type"], "value", "event_id",
                             "1 day")
    cols = ["event_type", "bucket", "open", "high", "low", "close",
            "open_time", "close_time", "volume"]
    assert rolled.select(*cols).exceptAll(direct.select(*cols)).count() == 0
    assert direct.select(*cols).exceptAll(rolled.select(*cols)).count() == 0
    total = {r["event_type"]: r
             for r in candlestick_rollup(hourly, ["event_type"]).collect()}
    n_types = ev.select("event_type").distinct().count()
    assert len(total) == n_types
    for r in total.values():
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["open_time"] <= r["close_time"]


def test_hll_rollup_distinct_counts(spark, sf_dir):
    """rollup(hyperloglog): hourly HLL sketches of user_id unioned to
    daily must estimate within the sketch's error of the exact daily
    distinct count, and the rollup estimate must EQUAL the estimate
    of a sketch built directly at daily granularity (HLL union at the
    same lg_k is deterministic)."""
    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import (
        approx_distinct_agg,
        hll_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = approx_distinct_agg(ev, "ts", ["event_type"], "user_id",
                                 "1 hour")
    rolled = {
        (r["event_type"], str(r["bucket"])): r
        for r in hll_rollup(hourly, ["event_type"], width="1 day").collect()
    }
    direct = {
        (r["event_type"], str(r["bucket"])): r
        for r in approx_distinct_agg(ev, "ts", ["event_type"], "user_id",
                                     "1 day").collect()
    }
    exact = {
        (r["event_type"], str(r["bucket"])): r["d"]
        for r in ev.withColumn(
            "bucket",
            F.timestamp_seconds(
                (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
            ),
        ).groupBy("event_type", "bucket").agg(
            F.countDistinct("user_id").alias("d")
        ).collect()
    }
    assert set(rolled) == set(direct) == set(exact) and len(exact) > 0
    for k, r in rolled.items():
        # union-of-hourly == direct daily sketch, estimate-for-estimate
        assert r["distinct_est"] == pytest.approx(
            direct[k]["distinct_est"], rel=1e-12
        ), k
        # and within ~5x the 1.6% nominal error of the exact count
        assert abs(r["distinct_est"] - exact[k]) <= max(
            0.08 * exact[k], 3
        ), (k, r["distinct_est"], exact[k])
        assert r["n_rows"] == direct[k]["n_rows"]


def test_hll_rollup_plan_single_exchange(spark):
    from timescale_cdc_spark.functions.hyper import (
        approx_distinct_agg,
        hll_rollup,
    )

    rows = [("a", dt.datetime(2024, 1, 1, h), h % 3) for h in range(6)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, u long")
    hourly = approx_distinct_agg(df, "ts", ["k"], "u", "1 hour")
    plan = hll_rollup(
        hourly, ["k"], width="1 day"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan  # build + rollup
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_candlestick_duckdb_parity(spark, sf_dir):
    """Hourly candles over the real events fixture must match DuckDB's
    arg_min/arg_max formulation exactly (timestamps are unique in the
    fixture, so the (ts, id) tie-break never engages and plain
    ts-keyed arg_min/arg_max is the same candle)."""
    import duckdb

    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import candlestick_agg

    ev = load_table(spark, sf_dir, "events")
    got = {
        (r["event_type"], str(r["bucket"])): r
        for r in candlestick_agg(
            ev, "ts", ["event_type"], "value", "event_id", "1 hour"
        ).collect()
    }
    want = duckdb.sql(
        f"""
        SELECT event_type,
               to_timestamp(floor(epoch(ts) / 3600) * 3600) AS bucket,
               arg_min(value, ts) AS open,
               max(value) AS high,
               min(value) AS low,
               arg_max(value, ts) AS close,
               min(ts) AS open_time,
               max(ts) AS close_time,
               count(*) AS volume
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2
        """
    ).fetchall()
    assert len(want) == len(got) > 0
    for et, bucket, o, h, lo, c, ot, ct, vol in want:
        g = got[(et, str(bucket.replace(tzinfo=None)))]
        assert (g["open"], g["high"], g["low"], g["close"]) == (o, h, lo, c)
        assert g["open_time"] == ot and g["close_time"] == ct
        assert g["volume"] == vol


def test_twa_rollup_matches_direct_daily(spark, sf_dir):
    """rollup(time_weight): hourly LOCF-TWA partials merged to daily
    must reproduce the TWA computed directly at daily width — the
    merge adds the cross-boundary last_val x gap terms (including
    across EMPTY hours) and the tail extension to the coarse bucket
    end that the stored per-hour numerators cannot contain."""
    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import (
        bucketed_hyperaggs,
        twa_partials,
        twa_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = twa_partials(ev, "ts", ["event_type"], "value", "event_id",
                          "1 hour")
    rolled = {
        (r["event_type"], str(r["bucket"])): r
        for r in twa_rollup(hourly, ["event_type"], "1 day").collect()
    }
    direct = bucketed_hyperaggs(ev, "1 day", "ts", ["event_type"], "value",
                                "event_id")
    n = 0
    for d in direct.collect():
        g = rolled[(d["event_type"], str(
            dt.datetime.fromtimestamp(d["_eb"], dt.timezone.utc)
            .replace(tzinfo=None)))]
        assert g["n"] == d["n_events"]
        assert g["twa"] == pytest.approx(d["twa"], abs=2e-5), (
            d["event_type"], d["_eb"], g["twa"], d["twa"]
        )
        n += 1
    assert n == len(rolled) > 0


def test_twa_rollup_gap_and_tail_hand_derived(spark):
    """Hour buckets with an EMPTY hour between them: obs 10.0 at
    0:00 and 40.0 at 2:30. Hourly partials: hour0 (num 10x60m,
    end 1:00, last 10) and hour2 (num 40x30m, first 2:30, last 40).
    Day rollup: 10 holds 0:00->2:30 (150m, spanning the empty hour 1),
    40 holds 2:30->24:00 (1290m) -> twa = (10x150 + 40x1290)/1440."""
    from timescale_cdc_spark.functions.hyper import twa_partials, twa_rollup

    rows = [(1, _ts(0, 0), "a", 10.0), (2, _ts(2, 30), "a", 40.0)]
    df = spark.createDataFrame(rows, "id long, ts timestamp, k string, v double")
    hourly = twa_partials(df, "ts", ["k"], "v", "id", "1 hour")
    assert hourly.count() == 2  # empty hour 1 stores nothing
    [r] = twa_rollup(hourly, ["k"], "1 day").collect()
    expected = (10.0 * 150 + 40.0 * 1290) / 1440.0
    assert r["twa"] == pytest.approx(expected, abs=1e-6)
    assert r["n"] == 2


def test_twa_rollup_plan_jvm_fold(spark):
    from timescale_cdc_spark.functions.hyper import twa_partials, twa_rollup

    rows = [(i, dt.datetime(2024, 1, 1, i), "a", float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, ts timestamp, k string, v double")
    plan = twa_rollup(
        twa_partials(df, "ts", ["k"], "v", "id", "1 hour"), ["k"], "1 day"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial build (window+agg share one) + rollup agg = 2 exchanges
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_counter_rollup_matches_direct(spark, sf_dir):
    """rollup(counter_agg): hourly counter partials merged per key
    must reproduce counter_delta computed directly over the whole
    frame — boundary pairs between buckets contribute growth or a
    reset exactly as the direct lag chain does."""
    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import (
        counter_delta,
        counter_partials,
        counter_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = counter_partials(ev, "ts", ["event_type"], "value", "event_id",
                              "1 hour")
    rolled = {
        r["event_type"]: r
        for r in counter_rollup(hourly, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r
        for r in counter_delta(
            ev, "ts", ["event_type"], "value", "event_id"
        ).collect()
    }
    assert set(rolled) == set(direct) and len(direct) > 0
    for k, d in direct.items():
        g = rolled[k]
        assert g["n_obs"] == d["n_obs"]
        assert g["n_resets"] == d["n_resets"], k
        assert g["delta"] == pytest.approx(d["delta"], rel=1e-9), k


def test_counter_rollup_boundary_reset_hand_derived(spark):
    """Counter 10->40 in hour 0, restarts at 3 in hour 2 (empty hour 1
    between): within-hour deltas 30 and 6 (3->9), boundary 40->3 is a
    reset contributing 3. Total delta 30+3+6=39, one reset — a plain
    sum of bucket deltas would say 36 and zero resets."""
    from timescale_cdc_spark.functions.hyper import (
        counter_partials,
        counter_rollup,
    )

    rows = [
        (1, _ts(0, 0), "a", 10.0),
        (2, _ts(0, 30), "a", 40.0),
        (3, _ts(2, 0), "a", 3.0),
        (4, _ts(2, 30), "a", 9.0),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, k string, v double")
    hourly = counter_partials(df, "ts", ["k"], "v", "id", "1 hour")
    assert hourly.count() == 2
    [r] = counter_rollup(hourly, ["k"]).collect()
    assert r["delta"] == pytest.approx(39.0)
    assert r["n_resets"] == 1
    assert r["n_obs"] == 4
    # daily width keeps the same numbers in one bucket
    [rd] = counter_rollup(hourly, ["k"], width="1 day").collect()
    assert rd["delta"] == pytest.approx(39.0) and rd["n_resets"] == 1


def test_uddsketch_rollup_bit_identical_and_error_bounded(spark, sf_dir):
    """rollup(percentile_agg) via UDDSketch: hourly log-bucketed count
    arrays summed to daily must be IDENTICAL to sketches built
    directly at daily width (vector addition is loss-free), and every
    quantile read off the rolled sketch must be within the sketch's
    alpha relative-error bound of the exact percentile."""
    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import (
        uddsketch_partials,
        uddsketch_quantiles,
        uddsketch_rollup,
    )

    alpha = 0.01
    ev = load_table(spark, sf_dir, "events")
    hourly = uddsketch_partials(ev, "ts", ["event_type"], "value",
                                "1 hour", lo=0.01, hi=1e6, alpha=alpha)
    rolled = uddsketch_rollup(hourly, ["event_type"], width="1 day")
    direct = uddsketch_partials(ev, "ts", ["event_type"], "value",
                                "1 day", lo=0.01, hi=1e6, alpha=alpha)
    r = {
        (x["event_type"], str(x["bucket"])): x
        for x in rolled.collect()
    }
    d = {
        (x["event_type"], str(x["bucket"])): x
        for x in direct.collect()
    }
    assert set(r) == set(d) and len(d) > 0
    for k in d:
        assert r[k]["counts"] == d[k]["counts"], k  # bit-identical merge
        assert r[k]["n"] == d[k]["n"] and r[k]["n_nonpos"] == d[k]["n_nonpos"]

    ps = [0.1, 0.5, 0.9, 0.99]
    ests = {
        (x["event_type"], str(x["bucket"])): x["quantiles"]
        for x in uddsketch_quantiles(rolled, ps).collect()
    }
    # reference = the DISCRETE rank the sketch targets (smallest value
    # whose cumulative count reaches ceil(p*n)) — an interpolating
    # percentile is a different estimator and diverges arbitrarily at
    # tiny n (e.g. n=4 with values 0.6/21.9/78.7/288.6: p10 discrete
    # is 0.6 but interpolated is 6.98)
    import math

    groups = {}
    for x in ev.withColumn(
        "bucket",
        F.timestamp_seconds(
            (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
        ),
    ).select("event_type", "bucket", "value").collect():
        groups.setdefault(
            (x["event_type"], str(x["bucket"])), []
        ).append(x["value"])
    for k, qs in ests.items():
        vals = sorted(groups[k])
        for p, got in zip(ps, qs):
            want = vals[max(1, math.ceil(p * len(vals))) - 1]
            # bucket-midpoint read: relative error bounded by ~alpha
            assert abs(got - want) <= 2 * alpha * want, (k, p, got, want)


def test_uddsketch_sparse_chain_bit_identical(spark, sf_dir):
    """Round 15: ``uddsketch_partials(dense=False)`` →
    ``uddsketch_rollup`` (the sparse merge path the lib_stats udd
    family uses) must produce the SAME rolled rows, bit for bit —
    counts array, n, n_nonpos, lo, gamma, bucket — as the dense chain
    it replaced, at daily width AND at width=None (one sketch per
    key), and the sparse path must keep the mixed-config guard."""
    import pytest

    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import (
        uddsketch_partials,
        uddsketch_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    kw = dict(lo=0.01, hi=1e6, alpha=0.05)
    dense_h = uddsketch_partials(ev, "ts", ["event_type"], "value",
                                 "1 hour", **kw)
    sparse_h = uddsketch_partials(ev, "ts", ["event_type"], "value",
                                  "1 hour", dense=False, **kw)
    for width in ("1 day", None):
        a = uddsketch_rollup(dense_h, ["event_type"], width=width)
        b = uddsketch_rollup(sparse_h, ["event_type"], width=width)
        assert a.columns == b.columns
        cols = a.columns
        assert a.select(cols).exceptAll(b.select(cols)).count() == 0
        assert b.select(cols).exceptAll(a.select(cols)).count() == 0
        assert a.count() > 0

    # mixed configs must still raise on the sparse path
    other = uddsketch_partials(ev, "ts", ["event_type"], "value",
                               "1 hour", dense=False,
                               lo=0.01, hi=1e6, alpha=0.10)
    with pytest.raises(Exception, match="mixed"):
        uddsketch_rollup(
            sparse_h.unionByName(other), ["event_type"]
        ).collect()


def test_uddsketch_whole_range_and_plan(spark, sf_dir):
    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import (
        uddsketch_partials,
        uddsketch_quantiles,
        uddsketch_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    hourly = uddsketch_partials(ev, "ts", ["event_type"], "value", "1 hour",
                                lo=0.01, hi=1e6, alpha=0.01)
    total = uddsketch_rollup(hourly, ["event_type"])
    out = uddsketch_quantiles(total, [0.5])
    rows = out.collect()
    n_types = ev.select("event_type").distinct().count()
    assert len(rows) == n_types
    [med_all] = ev.agg(F.percentile("value", F.lit(0.5))).first()
    for r in rows:
        assert r["quantiles"][0] == pytest.approx(med_all, rel=0.25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_saturating_math(spark):
    """Toolkit saturating i32 arithmetic: clamps instead of wrapping
    or raising, _pos variants floor at 0 — edge values exact."""
    from timescale_cdc_spark.functions.saturating import (
        I32_MAX,
        I32_MIN,
        saturating_add,
        saturating_add_pos,
        saturating_mul,
        saturating_sub,
        saturating_sub_pos,
    )

    rows = [
        (I32_MAX, 1),
        (I32_MIN, -1),
        (100, 7),
        (I32_MAX, I32_MAX),
        (I32_MIN, I32_MIN),
        (-5, 3),
    ]
    df = spark.createDataFrame(rows, "a int, b int")
    got = df.select(
        "a", "b",
        saturating_add("a", "b").alias("add"),
        saturating_sub("a", "b").alias("sub"),
        saturating_mul("a", "b").alias("mul"),
        saturating_add_pos("a", "b").alias("addp"),
        saturating_sub_pos("a", "b").alias("subp"),
    ).collect()

    def clamp(v, lo=I32_MIN):
        return max(lo, min(I32_MAX, v))

    for r in got:
        a, b = r["a"], r["b"]
        assert r["add"] == clamp(a + b), (a, b)
        assert r["sub"] == clamp(a - b), (a, b)
        assert r["mul"] == clamp(a * b), (a, b)
        assert r["addp"] == clamp(a + b, 0), (a, b)
        assert r["subp"] == clamp(a - b, 0), (a, b)


def test_uddsketch_rollup_rejects_mixed_configs(spark):
    """Merging partials with different (lo, gamma, array-length)
    configs must raise in-plan instead of silently null-padding a
    zip_with over incompatible log grids (ADVICE r7)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from timescale_cdc_spark.functions.hyper import (
        uddsketch_partials,
        uddsketch_rollup,
    )
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    rows = [
        (1, dt.datetime(2024, 1, 1, h), "a", float(v))
        for h, v in enumerate([1.0, 5.0, 9.0, 2.0])
    ]
    df = spark.createDataFrame(
        rows, "id long, t timestamp, k string, v double"
    )
    fine_a = uddsketch_partials(df, "t", ["k"], "v", "1 hour", alpha=0.05)
    fine_b = uddsketch_partials(df, "t", ["k"], "v", "1 hour", alpha=0.10)
    mixed = fine_a.unionByName(fine_b)
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)) as ei:
        uddsketch_rollup(mixed, ["k"]).collect()
    assert "mixed" in str(ei.value)
    # same-config merge still works and stays bit-identical to direct
    ok = uddsketch_rollup(fine_a.unionByName(fine_a), ["k"]).collect()
    assert len(ok) == 1 and ok[0]["n"] == 8


def test_dense_grid_explicit_and_per_key_bounds(spark):
    """VERDICT r7 #3: dense_grid's default whole-range bounds let one
    long-lived key inflate every short-lived key's grid. Explicit
    start/finish (Timescale's gapfill signature, finish-inclusive) and
    per_key=True (grid rows == sum of per-key bucket spans) bound it."""
    import datetime as dt

    from pyspark.sql import functions as F

    from timescale_cdc_spark.functions.hyper import (
        dense_grid,
        time_bucket_gapfill,
    )

    rows = [
        # key a lives 10 days; key b only on day 2
        *[(i, dt.datetime(2024, 1, 1 + i), "a", 1.0) for i in range(10)],
        (100, dt.datetime(2024, 1, 2, 12), "b", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "id long, t timestamp, k string, v double"
    )
    # default: both keys span the global 10-day range
    g_default = dense_grid(df, "1 day", "t", ["k"])
    assert g_default.count() == 20
    # per_key: b gets exactly its own single day
    g_per_key = dense_grid(df, "1 day", "t", ["k"], per_key=True)
    counts = {
        r["k"]: r["n"]
        for r in g_per_key.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 10, "b": 1}
    # explicit bounds: pinned range regardless of the data. Timescale
    # semantics (ADVICE r8): bucket starts < finish, so the aligned
    # finish Jan 6 yields exactly Jan 3/4/5 — its own bucket excluded.
    g_pinned = dense_grid(
        df, "1 day", "t", ["k"],
        start=dt.datetime(2024, 1, 3), finish=dt.datetime(2024, 1, 6),
    )
    per_key_days = {
        r["k"]: sorted(x["_eb"] for x in g_pinned.where(F.col("k") == r["k"]).collect())
        for r in g_pinned.select("k").distinct().collect()
    }
    day3 = int(dt.datetime(2024, 1, 3, tzinfo=dt.timezone.utc).timestamp())
    assert per_key_days["a"] == [day3, day3 + 86400, day3 + 2 * 86400]
    assert per_key_days["b"] == per_key_days["a"]
    # a finish INSIDE a bucket still includes that bucket (start < finish)
    g_mid = dense_grid(
        df, "1 day", "t", ["k"],
        start=dt.datetime(2024, 1, 3), finish=dt.datetime(2024, 1, 5, 12),
    )
    assert sorted(
        x["_eb"] for x in g_mid.where(F.col("k") == "a").collect()
    ) == [day3, day3 + 86400, day3 + 2 * 86400]
    with pytest.raises(ValueError, match="exclusive"):
        dense_grid(df, "1 day", "t", ["k"], start=dt.datetime(2024, 1, 3),
                   per_key=True)
    # eager validation: start > finish raises a clear error, not an
    # opaque F.sequence failure at execution (ADVICE r8)
    with pytest.raises(ValueError, match="start .* must be <= finish"):
        dense_grid(df, "1 day", "t", ["k"],
                   start=dt.datetime(2024, 1, 5),
                   finish=dt.datetime(2024, 1, 3))
    # degenerate windows yield an EMPTY grid, not an error: start ==
    # finish (zero-width) and a start pinned beyond the observed max
    assert dense_grid(
        df, "1 day", "t", ["k"],
        start=dt.datetime(2024, 1, 3), finish=dt.datetime(2024, 1, 3),
    ).count() == 0
    assert dense_grid(
        df, "1 day", "t", ["k"], start=dt.datetime(2030, 1, 1),
    ).count() == 0
    # composed: gapfill with narrow bounds drops out-of-range rows and
    # still LOCFs within the window
    filled = time_bucket_gapfill(
        df, "1 day", "t", ["k"], "v", "id",
        start=dt.datetime(2024, 1, 3), finish=dt.datetime(2024, 1, 6),
    )
    assert filled.count() == 6  # 2 keys x 3 days
    b_rows = {str(r["bucket"]): r for r in filled.where(F.col("k") == "b").collect()}
    assert all(r["n_events"] is None for r in b_rows.values())


def test_uddsketch_accessors_error_and_rank(spark):
    """error() recovers alpha from the stored gamma (bound survives
    rollup); approx_percentile_rank reads a rank off the counts array
    within the alpha bound of the true rank (VERDICT r7 #5)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from timescale_cdc_spark.functions.hyper import (
        uddsketch_error,
        uddsketch_partials,
        uddsketch_percentile_rank,
        uddsketch_rollup,
    )

    vals = [float(i) for i in range(1, 101)]  # 1..100
    rows = [
        (i, dt.datetime(2024, 1, 1, i % 24), "a", v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "id long, t timestamp, k string, v double"
    )
    fine = uddsketch_partials(
        df, "t", ["k"], "v", "1 hour", lo=0.5, hi=1e4, alpha=0.01
    )
    rolled = uddsketch_rollup(fine, ["k"])
    err = uddsketch_error(rolled).select("error").first()["error"]
    assert err == pytest.approx(0.01, rel=1e-9)

    # true rank of value v in 1..100 is v/100; sketch rank must land
    # within the value-space alpha bound (rank error <= mass of one
    # log bucket around v — generous 3% here)
    for v, want in [(10.0, 0.10), (50.0, 0.50), (90.0, 0.90)]:
        got = (
            uddsketch_percentile_rank(rolled, v)
            .select("approx_rank")
            .first()["approx_rank"]
        )
        assert abs(got - want) <= 0.03, (v, got, want)
    # non-positive value -> non-positive mass (none here)
    got0 = (
        uddsketch_percentile_rank(rolled, -1.0)
        .select("approx_rank")
        .first()["approx_rank"]
    )
    assert got0 == 0.0


def test_gauge_rollup_bitexact_and_duckdb_parity(spark, sf_dir):
    """gauge_agg (round 8): delta telescopes to last-first, so the
    hourly->daily rollup recomputes delta/rate from the SAME two
    boundary readings the direct daily computation uses — equality is
    bit-exact, not approximate. Direct daily values also match
    DuckDB's arg_min/arg_max formulation (unique fixture timestamps,
    so ts-keyed arg_min/arg_max is the same reading pair)."""
    import duckdb

    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import (
        gauge_agg,
        gauge_partials,
        gauge_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    direct = gauge_agg(ev, "ts", ["event_type"], "value", "event_id",
                       "1 day")
    rolled = gauge_rollup(
        gauge_partials(ev, "ts", ["event_type"], "value", "event_id",
                       "1 hour"),
        ["event_type"],
        width="1 day",
    )
    # bit-exact both ways, all columns
    cols = sorted(direct.columns)
    assert direct.select(cols).exceptAll(rolled.select(cols)).count() == 0
    assert rolled.select(cols).exceptAll(direct.select(cols)).count() == 0

    got = {
        (r["event_type"], str(r["bucket"])): r for r in direct.collect()
    }
    want = duckdb.sql(
        f"""
        SELECT event_type,
               to_timestamp(floor(epoch(ts) / 86400) * 86400) AS bucket,
               arg_max(value, ts) - arg_min(value, ts) AS delta,
               CASE WHEN count(*) > 1 THEN
                 (arg_max(value, ts) - arg_min(value, ts))
                 / ((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0)
               END AS rate,
               count(*) AS n
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2
        """
    ).fetchall()
    assert len(want) == len(got) > 0
    for et, bucket, delta, rate, n in want:
        g = got[(et, str(bucket.replace(tzinfo=None)))]
        assert g["delta"] == delta and g["n"] == n
        assert g["rate"] == pytest.approx(rate, rel=1e-12)


def test_candlestick_vwap_decimal_exact_rollup(spark, sf_dir):
    """candlestick_agg with the full (ts, price, volume) signature:
    vwap read off the rolled-up candle equals the direct daily vwap
    EXACTLY when price x volume goes through DECIMAL (exact,
    order-independent sums — the queries/base.py money convention),
    and matches DuckDB's sum(p*v)/sum(v) on the same decimals. The
    default no-volume path keeps the original schema (tick volume)."""
    import duckdb

    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.hyper import (
        candlestick_agg,
        candlestick_rollup,
        vwap,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "ts",
        "event_type",
        "event_id",
        F.col("value").cast("decimal(18,2)").alias("price"),
        (F.pmod(F.col("event_id"), F.lit(7)) + 1)
        .cast("decimal(4,0)")
        .alias("vol"),
    )
    plain = candlestick_agg(ev, "ts", ["event_type"], "price",
                            "event_id", "1 hour")
    assert "vwap_num" not in plain.columns  # default path unchanged

    hourly = candlestick_agg(ev, "ts", ["event_type"], "price",
                             "event_id", "1 hour", volume_col="vol")
    daily_direct = vwap(
        candlestick_agg(ev, "ts", ["event_type"], "price", "event_id",
                        "1 day", volume_col="vol")
    )
    daily_rolled = vwap(
        candlestick_rollup(hourly, ["event_type"], width="1 day")
    )
    cols = ["event_type", "bucket", "volume", "vwap"]
    d = {(r["event_type"], str(r["bucket"])): r
         for r in daily_direct.select(cols).collect()}
    r_ = {(r["event_type"], str(r["bucket"])): r
          for r in daily_rolled.select(cols).collect()}
    assert d.keys() == r_.keys() and len(d) > 0
    for k in d:
        assert d[k]["volume"] == r_[k]["volume"]
        assert d[k]["vwap"] == r_[k]["vwap"]  # exact: decimal partials

    want = duckdb.sql(
        f"""
        SELECT event_type,
               to_timestamp(floor(epoch(ts) / 86400) * 86400) AS bucket,
               CAST(sum(CAST(value AS DECIMAL(18,2))
                        * ((event_id % 7) + 1)) AS DOUBLE)
               / CAST(sum((event_id % 7) + 1) AS DOUBLE) AS vwap
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2
        """
    ).fetchall()
    assert len(want) == len(d)
    for et, bucket, w in want:
        assert d[(et, str(bucket.replace(tzinfo=None)))]["vwap"] == (
            pytest.approx(w, rel=1e-12)
        )


def test_twa_interpolated_tiny(spark, tiny):
    """interpolated_average on the hand-derivable frame: each bucket
    except a key's first extends coverage back to the bucket start
    with the previous partial's last value (held across the empty
    hours 2-3 for series a)."""
    from timescale_cdc_spark.functions.hyper import (
        twa_interpolated,
        twa_partials,
    )

    partials = twa_partials(tiny, "ts", ["k"], "v", "id", "1 hour")
    out = {
        (r["k"], r["bucket"].hour): r["twa_interp"]
        for r in twa_interpolated(partials, ["k"], "1 hour").collect()
    }
    # hour 0 (first, no prev): 10 held 30min, 20 held 30min -> 15
    assert out[("a", 0)] == pytest.approx(15.0)
    # hour 1: head 0:00-0:15 carries prev last 20, then 30 to end
    # (20*900 + 30*2700) / 3600 = 27.5
    assert out[("a", 1)] == pytest.approx(27.5)
    # hour 4: prev last 30 carried across empty hours, head 0 -> 50
    assert out[("a", 4)] == pytest.approx(50.0)
    # key b single bucket (first) -> plain twa
    assert out[("b", 2)] == pytest.approx(7.0)
    assert len(out) == 4
