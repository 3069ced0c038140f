"""Property-based replay invariant (SURVEY.md §5 item 3): for random
op sequences applied to a table, replaying the captured event log
reconstructs exactly the final table state, at every prefix."""

from __future__ import annotations

import pytest

import datetime as dt
import random

from pyspark.sql import functions as F

from timescale_cdc_spark.cdc import EventLog, cdc_transform, latest_state, state_as_of
from timescale_cdc_spark.schemas import ASSETS_SCHEMA

T0 = dt.datetime(2025, 6, 1, 12, 0, 0)


def _random_walk(seed: int, steps: int):
    """Generate a deterministic sequence of table snapshots by random
    inserts/updates/deletes over integer keys."""
    rng = random.Random(seed)
    state: dict[int, tuple] = {}
    snapshots = [dict(state)]
    next_id = 1
    for _ in range(steps):
        op = rng.choice(["insert", "insert", "update", "delete"])
        if op == "insert" or not state:
            state[next_id] = (f"name-{next_id}-v0", f"SN{next_id:04d}")
            next_id += 1
        elif op == "update":
            k = rng.choice(list(state))
            name, sn = state[k]
            version = int(name.rsplit("v", 1)[1]) + 1
            state[k] = (f"name-{k}-v{version}", sn)
        else:
            k = rng.choice(list(state))
            del state[k]
        snapshots.append(dict(state))
    return snapshots


def _to_df(spark, snap, ts):
    rows = [
        (k, name, sn, ts, ts) for k, (name, sn) in sorted(snap.items())
    ]
    return spark.createDataFrame(rows, schema=ASSETS_SCHEMA)


@pytest.mark.slow
def test_replay_reconstructs_every_prefix(spark, tmp_path):
    snapshots = _random_walk(seed=42, steps=12)
    log = EventLog(spark, str(tmp_path / "log"))
    times = []
    for i in range(1, len(snapshots)):
        ts = T0 + dt.timedelta(minutes=i)
        times.append(ts)
        env = cdc_transform(
            _to_df(spark, snapshots[i - 1], T0),
            _to_df(spark, snapshots[i], T0),
            "id",
            "dataschema",
            "assets",
            F.lit(ts),
        )
        log.append(env)

    table_log = log.read_table("dataschema", "assets")

    # final state
    final = latest_state(table_log, "id", ASSETS_SCHEMA)
    got = {(r["id"], r["name"], r["serialnumber"]) for r in final.collect()}
    want = {
        (k, name, sn) for k, (name, sn) in snapshots[-1].items()
    }
    assert got == want

    # every prefix (as-of) matches the corresponding snapshot
    for i in (3, 6, 9):
        asof = state_as_of(table_log, "id", ASSETS_SCHEMA, str(times[i - 1]))
        got_i = {(r["id"], r["name"]) for r in asof.collect()}
        want_i = {(k, name) for k, (name, _) in snapshots[i].items()}
        assert got_i == want_i, f"prefix {i} mismatch"

    # event ids stay dense and monotone across all appends
    ids = [r["event_id"] for r in log.read().orderBy("event_id").collect()]
    assert ids == list(range(1, len(ids) + 1))
