"""state_agg / state_timeline / heartbeat_agg hyperfunction analogs
(functions/state.py): hand-derived semantics on frames where every
expected microsecond is checkable by eye, exact rollup==direct
equivalence over the real events fixture, DuckDB cross-engine parity
for the direct computations, and plan pinning (one exchange per
family, JVM fold, no Python eval).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timescale_cdc_spark.functions.state import (
    duration_in,
    heartbeat_islands,
    heartbeat_partials,
    heartbeat_rollup,
    heartbeat_summary,
    state_agg,
    state_partials,
    state_rollup,
    state_timeline,
)

MIN_US = 60 * 1_000_000
HOUR_US = 3600 * 1_000_000


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def states(spark):
    """Key a: up@0:00, down@0:30, down@1:15, up@4:00 — hour 0 has a
    transition, hours 2-3 are empty (LOCF carries 'down'), the tail
    after 4:00 is 'up'. Key b: one observation."""
    rows = [
        (1, _ts(0, 0), "a", "up"),
        (2, _ts(0, 30), "a", "down"),
        (3, _ts(1, 15), "a", "down"),
        (4, _ts(4, 0), "a", "up"),
        (5, _ts(2, 0), "b", "up"),
    ]
    return spark.createDataFrame(
        rows, "id long, t timestamp, k string, st string"
    )


def test_state_partials_hand_derived(states):
    p = {
        (r["k"], r["bucket"].hour): r
        for r in state_partials(
            states, "t", ["k"], "st", "id", "1 hour"
        ).collect()
    }
    a0 = p[("a", 0)]
    # up holds 0:00-0:30, down holds 0:30-1:00 (bucket end)
    assert a0["durs"] == {"up": 30 * MIN_US, "down": 30 * MIN_US}
    assert a0["n"] == 2 and a0["n_transitions"] == 1
    assert a0["first_state"] == "up" and a0["last_state"] == "down"
    a1 = p[("a", 1)]
    # the 1:15 observation holds to the hour end; 1:00-1:15 is the
    # seam the ROLLUP attributes (to hour 0's last state)
    assert a1["durs"] == {"down": 45 * MIN_US}
    assert a1["n_transitions"] == 0
    # hours 2 and 3 have no observations -> no partial rows
    assert ("a", 2) not in p and ("a", 3) not in p
    assert p[("a", 4)]["durs"] == {"up": 60 * MIN_US}


def test_state_rollup_equals_direct_hand_derived(states):
    direct = {
        r["k"]: r
        for r in state_agg(
            states, "t", ["k"], "st", "id", "1 day"
        ).collect()
    }
    hourly = state_partials(states, "t", ["k"], "st", "id", "1 hour")
    rolled = {
        r["k"]: r
        for r in state_rollup(hourly, ["k"], "1 day").collect()
    }
    for k in ("a", "b"):
        assert rolled[k]["durs"] == direct[k]["durs"], k
        assert rolled[k]["n"] == direct[k]["n"]
        assert rolled[k]["n_transitions"] == direct[k]["n_transitions"]
    # and the daily numbers themselves: up 0:00-0:30 + 4:00-24:00,
    # down 0:30-4:00
    assert direct["a"]["durs"] == {
        "up": 30 * MIN_US + 20 * HOUR_US,
        "down": 210 * MIN_US,
    }
    assert direct["a"]["n_transitions"] == 2


def test_duration_in_accessor(states):
    day = state_agg(states, "t", ["k"], "st", "id", "1 day")
    got = {
        r["k"]: (r["up_us"], r["idle_us"])
        for r in day.select(
            "k",
            duration_in("durs", "up").alias("up_us"),
            duration_in("durs", "idle").alias("idle_us"),
        ).collect()
    }
    assert got["a"] == (30 * MIN_US + 20 * HOUR_US, 0)
    assert got["b"] == (22 * HOUR_US, 0)


def test_state_timeline_merges_runs(states):
    tl = [
        (r["state"], r["start_ts"], r["end_ts"])
        for r in state_timeline(states, "t", ["k"], "st", "id")
        .where(F.col("k") == "a")
        .orderBy("start_ts")
        .collect()
    ]
    # the two consecutive 'down' observations merge into one run
    assert tl == [
        ("up", _ts(0, 0), _ts(0, 30)),
        ("down", _ts(0, 30), _ts(4, 0)),
        ("up", _ts(4, 0), None),
    ]


def test_state_rollup_equals_direct_events_fixture(spark, sf_dir):
    """Exact (integer-microsecond) equivalence over the real events
    table: hourly partials rolled to 1 day == direct daily state_agg,
    per (user_id, day), including the transition count."""
    from timescale_cdc_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    direct = state_agg(
        ev, "ts", ["user_id"], "event_type", "event_id", "1 day"
    )
    hourly = state_partials(
        ev, "ts", ["user_id"], "event_type", "event_id", "1 hour"
    )
    rolled = state_rollup(hourly, ["user_id"], "1 day")
    # maps are not comparable via exceptAll; explode to entries
    def entries(df):
        return df.select(
            "user_id",
            "bucket",
            "n",
            "n_transitions",
            F.explode("durs").alias("state", "dur_us"),
        )

    assert direct.count() == rolled.count()
    assert entries(direct).exceptAll(entries(rolled)).count() == 0
    assert entries(rolled).exceptAll(entries(direct)).count() == 0


def test_state_agg_duckdb_parity(spark, sf_dir):
    """Direct daily time-in-state vs the same LOCF-to-bucket-end
    computation spelled in DuckDB SQL (lead over (user, day) with the
    day end as the final boundary) — exact integer equality."""
    import duckdb

    from timescale_cdc_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {
        (r["user_id"], str(r["bucket"]), r["state"]): (
            r["dur_us"],
            r["n"],
        )
        for r in state_agg(
            ev, "ts", ["user_id"], "event_type", "event_id", "1 day"
        )
        .select(
            "user_id", "bucket", "n", F.explode("durs").alias("state", "dur_us")
        )
        .collect()
    }
    want = duckdb.sql(
        f"""
        WITH b AS (
          SELECT user_id, event_type,
                 epoch_us(ts) AS us,
                 floor(epoch(ts) / 86400)::BIGINT * 86400 AS day_s,
                 coalesce(
                   lead(epoch_us(ts)) OVER (
                     PARTITION BY user_id, floor(epoch(ts) / 86400)
                     ORDER BY ts, event_id),
                   (floor(epoch(ts) / 86400)::BIGINT * 86400 + 86400)
                     * 1000000
                 ) - epoch_us(ts) AS held_us
          FROM '{sf_dir}/events.parquet'
        ),
        n_per AS (
          SELECT user_id, day_s, count(*) AS n FROM b GROUP BY 1, 2
        )
        SELECT b.user_id, to_timestamp(b.day_s) AS bucket,
               b.event_type AS state,
               sum(b.held_us)::BIGINT AS dur_us, any_value(n.n) AS n
        FROM b JOIN n_per n USING (user_id, day_s)
        GROUP BY 1, 2, 3
        """
    ).fetchall()
    assert len(want) == len(got)
    for user_id, bucket, state, dur_us, n in want:
        key = (user_id, str(bucket.replace(tzinfo=None)), state)
        assert got[key] == (dur_us, n), key


def test_state_plans_single_exchange_no_python(spark, states):
    """state_partials: the lead/lag windows and the two-level groupBy
    ride ONE (key, bucket) exchange. state_rollup adds exactly one
    more. No Python eval anywhere."""
    p = state_partials(states, "t", ["k"], "st", "id", "1 hour")
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rplan = (
        state_rollup(p, ["k"], "1 day")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert rplan.count("Exchange hashpartitioning") == 2, rplan
    assert "Window" in plan  # the LOCF annotate rides the exchange
    assert "BatchEvalPython" not in rplan and "ArrowEvalPython" not in rplan


# ---------------------------------------------------------------------------
# heartbeat_agg
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def beats(spark):
    """Key a (lease 10 min): beats at 0:00/0:05 merge to [0:00,0:15);
    0:20 -> [0:20,0:30); 0:55 -> [0:55,1:05) SPANS the hour seam.
    Key b: one beat at 2:00."""
    rows = [
        (_ts(0, 0), "a"),
        (_ts(0, 5), "a"),
        (_ts(0, 20), "a"),
        (_ts(0, 55), "a"),
        (_ts(2, 0), "b"),
    ]
    return spark.createDataFrame(rows, "t timestamp, k string")


def test_heartbeat_islands_hand_derived(beats):
    got = [
        (r["start_us"], r["end_us"], r["n_heartbeats"])
        for r in heartbeat_islands(beats, "t", ["k"], "10 minutes")
        .where(F.col("k") == "a")
        .orderBy("start_us")
        .collect()
    ]
    base = int(_ts(0).timestamp()) * 1_000_000
    assert got == [
        (base, base + 15 * MIN_US, 2),
        (base + 20 * MIN_US, base + 30 * MIN_US, 1),
        (base + 55 * MIN_US, base + 65 * MIN_US, 1),
    ]


def test_heartbeat_partials_clip_at_seam(beats):
    p = {
        (r["k"], r["bucket"].hour): r
        for r in heartbeat_partials(
            beats, "t", ["k"], "10 minutes", "1 hour"
        ).collect()
    }
    a0, a1 = p[("a", 0)], p[("a", 1)]
    # hour 0: 15 + 10 + 5 (clipped head of the spanning island)
    assert a0["live_us"] == 30 * MIN_US
    assert a0["n_ranges"] == 3 and a0["n_heartbeats"] == 4
    # hour 1: the clipped tail; its heartbeat was counted in hour 0
    assert a1["live_us"] == 5 * MIN_US
    assert a1["n_heartbeats"] == 0


def test_heartbeat_rollup_remerges_seam_split(beats):
    hourly = heartbeat_partials(beats, "t", ["k"], "10 minutes", "1 hour")
    daily = {
        r["k"]: r
        for r in heartbeat_rollup(hourly, ["k"], "1 day").collect()
    }
    a = daily["a"]
    # the seam-split island is ONE range again in the daily union
    assert a["n_ranges"] == 3
    assert a["live_us"] == 35 * MIN_US
    assert a["dead_us"] == 24 * HOUR_US - 35 * MIN_US
    assert a["uptime"] == pytest.approx(35 * 60 / 86400.0, abs=1e-6)
    direct = {
        r["k"]: r
        for r in heartbeat_summary(
            beats, "t", ["k"], "10 minutes", "1 day"
        ).collect()
    }
    for k in ("a", "b"):
        for c in ("ranges", "live_us", "n_ranges", "n_heartbeats",
                  "dead_us", "uptime"):
            assert daily[k][c] == direct[k][c], (k, c)


def test_heartbeat_rollup_equals_direct_events_fixture(spark, sf_dir):
    """Exact equivalence over the real events stream: per-user hourly
    liveness partials (lease 10 min) rolled to 1 day == direct daily
    summary — ranges, live/dead time, island and heartbeat counts."""
    from timescale_cdc_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = heartbeat_partials(
        ev, "ts", ["user_id"], "10 minutes", "1 hour"
    )
    rolled = heartbeat_rollup(hourly, ["user_id"], "1 day")
    direct = heartbeat_summary(
        ev, "ts", ["user_id"], "10 minutes", "1 day"
    )
    cols = [
        "user_id", "bucket", "ranges", "live_us", "n_ranges",
        "n_heartbeats", "dead_us", "uptime",
    ]
    r, d = rolled.select(*cols), direct.select(*cols)
    assert d.count() == r.count() and d.count() > 0
    assert d.exceptAll(r).count() == 0
    assert r.exceptAll(d).count() == 0


def test_heartbeat_islands_duckdb_parity(spark, sf_dir):
    """Per-user island count and total covered time vs the same
    gaps-and-islands computation in DuckDB SQL — exact integers."""
    import duckdb

    from timescale_cdc_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {
        r["user_id"]: (r["n_islands"], r["covered_us"])
        for r in heartbeat_islands(ev, "ts", ["user_id"], "10 minutes")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_islands"),
            F.sum(F.col("end_us") - F.col("start_us")).alias("covered_us"),
        )
        .collect()
    }
    want = duckdb.sql(
        f"""
        WITH hb AS (
          SELECT user_id, epoch_us(ts) AS s_us,
                 epoch_us(ts) + 600000000 AS e_us
          FROM '{sf_dir}/events.parquet'
        ),
        marked AS (
          SELECT user_id, s_us, e_us,
                 CASE WHEN s_us > coalesce(max(e_us) OVER (
                     PARTITION BY user_id ORDER BY s_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), -1) THEN 1 ELSE 0 END AS new_island
          FROM hb
        ),
        islands AS (
          SELECT user_id, s_us, e_us,
                 sum(new_island) OVER (
                   PARTITION BY user_id ORDER BY s_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS island
          FROM marked
        )
        SELECT user_id, count(DISTINCT island) AS n_islands,
               sum(dur)::BIGINT AS covered_us
        FROM (
          SELECT user_id, island,
                 max(e_us) - min(s_us) AS dur
          FROM islands GROUP BY 1, 2
        ) GROUP BY 1
        """
    ).fetchall()
    assert len(want) == len(got)
    for user_id, n_islands, covered_us in want:
        assert got[user_id] == (n_islands, covered_us), user_id


def test_heartbeat_plans_no_python(spark, beats):
    p = heartbeat_partials(beats, "t", ["k"], "10 minutes", "1 hour")
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rplan = (
        heartbeat_rollup(p, ["k"], "1 day")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in rplan and "ArrowEvalPython" not in rplan
    # partials partition by (key) for the islands window; every later
    # groupBy — (key, fine bucket) AND the rollup's (key, coarse
    # bucket) — clusters on a superset of that, so the COMPOSED plan
    # holds at ONE exchange total: rollup-over-partials adds no
    # shuffle at all when fused in a single query.
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert rplan.count("Exchange hashpartitioning") == 1, rplan


def test_state_at_point_in_time(states):
    from timescale_cdc_spark.functions.state import state_at

    tl = state_timeline(states, "t", ["k"], "st", "id")
    got = {
        r["k"]: r["state"]
        for r in state_at(tl, _ts(2, 30), ["k"]).collect()
    }
    # key a: inside the long 'down' run; key b: 'up' since 2:00
    assert got == {"a": "down", "b": "up"}
    # before key b's first observation -> only key a has a state
    early = {
        r["k"]: r["state"]
        for r in state_at(tl, _ts(1, 0), ["k"]).collect()
    }
    assert early == {"a": "down"}
    # open tail run
    late = {
        r["k"]: r["state"]
        for r in state_at(tl, _ts(23, 59), ["k"]).collect()
    }
    assert late == {"a": "up", "b": "up"}


def test_live_at_point_in_time(beats):
    from timescale_cdc_spark.functions.state import live_at

    daily = heartbeat_rollup(
        heartbeat_partials(beats, "t", ["k"], "10 minutes", "1 hour"),
        ["k"],
        "1 day",
    )
    # 0:10 -> inside [0:00,0:15) island; 0:17 -> gap; 1:02 -> inside
    # the seam-spanning island's tail
    for at, want in [
        (_ts(0, 10), True),
        (_ts(0, 17), False),
        (_ts(1, 2), True),
    ]:
        got = {
            r["k"]: r["live"]
            for r in live_at(daily, at, ["k"]).collect()
        }
        assert got["a"] is want, at
    # key b: dead everywhere except its one 2:00-2:10 lease
    got = {r["k"]: r["live"]
           for r in live_at(daily, _ts(2, 5), ["k"]).collect()}
    assert got["b"] is True


def test_state_timeline_duplicate_timestamp_tiebreak(spark):
    """Duplicate timestamps: run segmentation must follow the (ts, id)
    total order by contract, not whatever sort the plan reuses — two
    same-instant observations straddling a state change still produce
    deterministic runs (ADVICE r7)."""
    rows = [
        (1, _ts(0, 0), "a", "up"),
        (2, _ts(0, 0), "a", "down"),   # same instant, higher id
        (3, _ts(0, 5), "a", "down"),
        (4, _ts(0, 5), "a", "up"),     # same instant, higher id
    ]
    df = spark.createDataFrame(
        rows, "id long, t timestamp, k string, st string"
    )
    tl = state_timeline(df, "t", ["k"], "st", "id").orderBy("start_ts")
    got = [(r["state"], r["start_ts"], r["end_ts"]) for r in tl.collect()]
    # (ts,id) order: up@0:00, down@0:00, down@0:05, up@0:05
    # -> runs: up [0:00,0:00), down [0:00,0:05), up [0:05, open)
    assert [g[0] for g in got] == ["up", "down", "up"]
    assert got[0][1] == got[0][2] == _ts(0, 0)       # zero-length run
    assert got[1] == ("down", _ts(0, 0), _ts(0, 5))
    assert got[2] == ("up", _ts(0, 5), None)


def test_live_at_explicit_width_on_partials(beats):
    """heartbeat_partials rows carry no dead_us — live_at must demand
    an explicit width rather than silently degrading the containing-
    bucket filter to bucket <= at (ADVICE r7)."""
    from timescale_cdc_spark.functions.state import live_at

    partials = heartbeat_partials(beats, "t", ["k"], "10 minutes", "1 hour")
    with pytest.raises(ValueError, match="width"):
        live_at(partials, _ts(2, 5), ["k"])
    got = live_at(partials, _ts(2, 5), ["k"], width="1 hour").collect()
    # exactly ONE row, for the one key with a partial bucket containing
    # 2:05 (key a's islands end at 1:05 -> no bucket -> trivially dead,
    # no row) — NOT one row per historical bucket
    assert sorted((r["k"], r["live"]) for r in got) == [("b", True)]
    # and at 0:10 key a's hour-0 bucket contains the instant
    got0 = live_at(partials, _ts(0, 10), ["k"], width="1 hour").collect()
    assert sorted((r["k"], r["live"]) for r in got0) == [("a", True)]


def test_state_interpolated_tiny(spark, states):
    """interpolated_duration_in on the hand-derivable frame: the head
    of every observed bucket (and the whole of every empty bucket on
    the per-key grid) is attributed to the state carried in from the
    previous observed bucket."""
    from timescale_cdc_spark.functions.state import state_interpolated

    partials = state_partials(states, "t", ["k"], "st", "id", "1 hour")
    out = {
        (r["k"], r["bucket"].hour): dict(r["durs"])
        for r in state_interpolated(partials, ["k"], "1 hour").collect()
    }
    # key a hour 0 (first bucket, no carry): up 30min, down 30min
    assert out[("a", 0)] == {"up": 30 * MIN_US, "down": 30 * MIN_US}
    # hour 1: head 0:00-0:15 carries 'down' (prev last), then down
    assert out[("a", 1)] == {"down": HOUR_US}
    # hours 2, 3: EMPTY buckets on the grid, full width carried 'down'
    assert out[("a", 2)] == {"down": HOUR_US}
    assert out[("a", 3)] == {"down": HOUR_US}
    # hour 4: up from 4:00 to bucket end, head 0 adds nothing
    assert out[("a", 4)] == {"up": HOUR_US, "down": 0}
    # key b: single bucket, unchanged
    assert out[("b", 2)] == {"up": HOUR_US}
    assert len(out) == 6


def test_state_interpolated_matches_clipping_reference(spark, sf_dir):
    """The dense interpolated durations must equal the direct
    segment-clipping formulation computed in Python over the real
    events fixture: each observation held from its own timestamp to
    the NEXT observation of the key (across buckets), the final
    observation held to its bucket end, segments clipped to hour
    boundaries — integer-microsecond equality on every (key, bucket,
    state), including the all-empty buckets in between."""
    from collections import defaultdict

    from timescale_cdc_spark.catalog import load_table
    from timescale_cdc_spark.functions.state import state_interpolated

    W = HOUR_US
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < 50
    )
    rows = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    ).collect()
    per_key = defaultdict(list)
    for r in rows:
        per_key[r["user_id"]].append((r["us"], r["event_id"],
                                      r["event_type"]))
    want = defaultdict(int)
    for k, obs in per_key.items():
        obs.sort()
        for i, (us, _id, st) in enumerate(obs):
            if i + 1 < len(obs):
                eus = obs[i + 1][0]
            else:
                eus = (us // W + 1) * W  # held to own bucket end
            b = us // W * W
            while b < eus:
                lo, hi = max(us, b), min(eus, b + W)
                if hi > lo:
                    want[(k, b, st)] += hi - lo
                b += W

    partials = state_partials(ev, "ts", ["user_id"], "event_type",
                              "event_id", "1 hour")
    got = {}
    for r in state_interpolated(partials, ["user_id"], "1 hour").collect():
        b = r["bucket"].replace(tzinfo=dt.timezone.utc)
        bus = int(b.timestamp() * 1_000_000)
        for st, dur in r["durs"].items():
            if dur > 0:
                got[(r["user_id"], bus, st)] = dur

    assert len(got) > 0 and got == dict(want)


def test_state_rollup_keep_seams_is_valid_coarse_partial(spark, sf_dir):
    """rollup(state_partials(hourly), keep_seams=True) must equal
    state_partials computed directly at the daily width on EVERY
    column including the seam columns — making the rolled output a
    drop-in input for state_interpolated and further rollups."""
    from timescale_cdc_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    rolled = state_rollup(
        state_partials(ev, "ts", ["user_id"], "event_type", "event_id",
                       "1 hour"),
        ["user_id"],
        "1 day",
        keep_seams=True,
    )
    direct = state_partials(ev, "ts", ["user_id"], "event_type",
                            "event_id", "1 day")
    cols = sorted(direct.columns)
    assert sorted(rolled.columns) == cols
    a = rolled.select(cols).withColumn("durs", F.map_entries("durs"))
    b = direct.select(cols).withColumn("durs", F.map_entries("durs"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert direct.count() > 0
