"""Hypothesis property tests (SURVEY.md §5 item 3): replay invariant
over generated op sequences; time_bucket algebraic laws. Spark jobs
are expensive per example, so example counts are small and each
example batches its data into a single DataFrame."""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from timescale_cdc_spark.cdc import cdc_transform, latest_state
from timescale_cdc_spark.functions.time import bucket_seconds, time_bucket
from timescale_cdc_spark.schemas import ASSETS_SCHEMA

T0 = dt.datetime(2025, 6, 1, 12, 0, 0)

slow_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def op_walks(draw):
    """A sequence of table snapshots from random insert/update/delete."""
    steps = draw(st.integers(min_value=1, max_value=6))
    state: dict[int, str] = {}
    snapshots = [dict(state)]
    next_id = 1
    for _ in range(steps):
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        if op == "insert" or not state:
            state[next_id] = f"v0-{next_id}"
            next_id += 1
        elif op == "update":
            k = draw(st.sampled_from(sorted(state)))
            state[k] = state[k] + "+"
        else:
            k = draw(st.sampled_from(sorted(state)))
            del state[k]
        snapshots.append(dict(state))
    return snapshots


@slow_settings
@given(op_walks())
@pytest.mark.slow
def test_replay_equals_final_state(spark, snapshots):
    def to_df(snap, ts):
        rows = [(k, name, f"SN{k:04d}", ts, ts) for k, name in sorted(snap.items())]
        return spark.createDataFrame(rows, schema=ASSETS_SCHEMA)

    envs = []
    for i in range(1, len(snapshots)):
        ts = T0 + dt.timedelta(minutes=i)
        env = cdc_transform(
            to_df(snapshots[i - 1], T0),
            to_df(snapshots[i], T0),
            "id",
            "dataschema",
            "assets",
            F.lit(ts),
        ).withColumn("event_id", F.lit(0))  # ids assigned below
        envs.append(env)
    log = envs[0]
    for e in envs[1:]:
        log = log.unionByName(e)
    # assign ids in (ts, operation) order — EventLog.append's rule
    from pyspark.sql import Window

    log = log.drop("event_id").withColumn(
        "event_id",
        F.row_number().over(
            Window.orderBy("ts", "schema_name", "table_name", "operation")
        ),
    )
    final = latest_state(log, "id", ASSETS_SCHEMA)
    got = {(r["id"], r["name"]) for r in final.collect()}
    want = {(k, v) for k, v in snapshots[-1].items()}
    assert got == want


@slow_settings
@given(
    st.lists(
        st.integers(min_value=0, max_value=2_000_000_000), min_size=1, max_size=50
    ),
    st.sampled_from(
        ["90 seconds", "5 minutes", "15 minutes", "1 hour", "1 day",
         "7 days", "1 week"]
    ),
)
def test_time_bucket_laws(spark, epochs, width):
    from timescale_cdc_spark.functions.time import TS_ORIGIN_EPOCH

    secs = bucket_seconds(width)
    df = spark.createDataFrame([(e,) for e in epochs], "epoch long").select(
        F.timestamp_seconds("epoch").alias("ts")
    )
    out = df.select(
        "ts",
        time_bucket(width, "ts").alias("b"),
        time_bucket(width, time_bucket(width, "ts")).alias("bb"),
    ).collect()
    for r in out:
        b_epoch = int(r.b.replace(tzinfo=dt.timezone.utc).timestamp())
        ts_epoch = int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp())
        # aligned to the Timescale 2000-01-03 origin grid (equals plain
        # epoch alignment for widths dividing a day; differs for 7-day/
        # week widths, where the grid starts Mondays)
        assert (b_epoch - TS_ORIGIN_EPOCH) % secs == 0
        assert b_epoch <= ts_epoch < b_epoch + secs  # contains its input
        assert r.bb == r.b  # idempotent


@slow_settings
@given(
    st.lists(
        st.integers(min_value=0, max_value=2_000_000_000), min_size=1, max_size=50
    ),
    st.sampled_from(["1 month", "3 months", "1 year"]),
)
def test_time_bucket_month_laws(spark, epochs, width):
    n = {"1 month": 1, "3 months": 3, "1 year": 12}[width]
    df = spark.createDataFrame([(e,) for e in epochs], "epoch long").select(
        F.timestamp_seconds("epoch").alias("ts")
    )
    out = df.select(
        "ts",
        time_bucket(width, "ts").alias("b"),
        time_bucket(width, time_bucket(width, "ts")).alias("bb"),
    ).collect()
    for r in out:
        # bucket start is a month boundary on the 2000-01 grid
        assert r.b.day == 1 and (r.b.hour, r.b.minute, r.b.second) == (0, 0, 0)
        assert ((r.b.year - 2000) * 12 + r.b.month - 1) % n == 0
        assert r.b <= r.ts.replace(tzinfo=None) if r.ts.tzinfo else r.b <= r.ts
        assert r.bb == r.b  # idempotent


@slow_settings
@given(
    st.floats(min_value=0.0, max_value=4.0, allow_nan=False),
    st.integers(min_value=1, max_value=60),
)
def test_mixture_epochs_laws(spark, w, n_rows):
    """Every row of a source with weight w appears floor(w) or
    floor(w)+1 times (never anything else), and the same (id, salt)
    always makes the same floor-vs-ceil choice."""
    from timescale_cdc_spark.operators.sampling import mixture_epochs

    df = spark.createDataFrame(
        [(i, "s") for i in range(n_rows)], "id long, src string"
    )
    out = (
        mixture_epochs(df, "src", {"s": w}, ["id"], salt="p")
        .groupBy("id")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    import math

    lo = math.floor(w)
    counts = {r["id"]: r["c"] for r in out}
    for c in counts.values():
        assert c in (lo, lo + 1)
    # rows absent from the output correspond to copies == 0 (w < 1)
    assert len(counts) == n_rows or lo == 0
    # deterministic: identical second evaluation
    again = {
        r["id"]: r["c"]
        for r in mixture_epochs(df, "src", {"s": w}, ["id"], salt="p")
        .groupBy("id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert counts == again
