"""Property-based delivery invariant for the incremental poller
(SURVEY.md §5 item 3 companion to test_replay_property): under any
deterministic interleaving of appends, polls, empty polls, crashed
fetches (fetch without ack), and poller restarts, every event is
delivered AT LEAST once across fetch/ack cycles, committed cycles
never re-deliver, and the union of committed batches is exactly the
log — the connector's offset-commit contract (reference
docker-compose.yml:74, readme.md:266)."""

from __future__ import annotations

import pytest

import datetime as dt
import random

from pyspark.sql import functions as F

from timescale_cdc_spark.cdc import EventLog, cdc_transform
from timescale_cdc_spark.cdc.incremental import IncrementalPoller
from timescale_cdc_spark.schemas import ASSETS_SCHEMA

T0 = dt.datetime(2025, 6, 1, 12, 0, 0)


def _assets(spark, rows):
    return spark.createDataFrame(rows, schema=ASSETS_SCHEMA)


@pytest.mark.slow
def test_poller_interleaving_delivers_exactly_once(spark, tmp_path):
    rng = random.Random(7)
    log = EventLog(spark, str(tmp_path / "log"))
    offset_path = str(tmp_path / "offset.json")
    poller = IncrementalPoller(offset_path, start_ts="2025-01-01 00:00:00")

    prev_rows: list[tuple] = []
    next_key = 1
    appended_total = 0
    delivered: list[int] = []  # event_ids from COMMITTED batches only
    minute = 0

    for step in range(30):
        action = rng.choice(["append", "append", "poll", "crash_fetch", "restart"])
        if action != "append" and not log.exists():
            continue  # nothing written yet — the parquet source has no path
        if action == "append":
            minute += 1
            n_new = rng.randint(1, 3)
            new_rows = prev_rows + [
                (next_key + i, f"Asset {next_key + i}", f"SN{next_key + i:04d}",
                 T0, T0)
                for i in range(n_new)
            ]
            next_key += n_new
            ts = T0 + dt.timedelta(minutes=minute)
            n = log.append(
                cdc_transform(
                    _assets(spark, prev_rows), _assets(spark, new_rows),
                    "id", "dataschema", "assets", F.lit(ts),
                )
            )
            appended_total += n
            prev_rows = new_rows
        elif action == "poll":
            batch, off = poller.fetch(log.read())
            got = [r["event_id"] for r in batch.collect()]
            poller.ack(off)
            delivered.extend(got)
            # a committed batch may never overlap earlier commits
            assert len(set(delivered)) == len(delivered), "re-delivery after ack"
        elif action == "crash_fetch":
            # consumer fetches, collects, then dies before ack: nothing
            # is committed, so the SAME events must come back later
            batch, _ = poller.fetch(log.read())
            batch.collect()
        else:  # restart: a fresh poller resumes from the persisted offset
            poller = IncrementalPoller(offset_path)

    # drain
    batch, off = poller.fetch(log.read())
    delivered.extend(r["event_id"] for r in batch.collect())
    poller.ack(off)

    assert len(set(delivered)) == len(delivered)
    assert sorted(delivered) == list(range(1, appended_total + 1)), (
        "committed batches must union to exactly the log"
    )
