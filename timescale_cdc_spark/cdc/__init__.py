"""CDC core: Spark-native re-expression of the reference's capture →
event-log → view-routing pipeline (reference: timescale/init.sql).

- capture.py   — snapshot-diff op derivation + envelope transform
                 (trigger functions init.sql:11-38, A1-A4)
- log.py       — append-only, date-partitioned event log with dense
                 monotone event_id (hypertable + sequence,
                 init.sql:41-72, A5-A9)
- views.py     — filtered per-table projections (init.sql:75-84, A11)
- replay.py    — latest-state / as-of reconstruction (B23/B30)
- retention.py — partition-granular retention (init.sql:71, A10)
- incremental.py — (ts, event_id) offset polling
                 (cdc-timescale-connector.json:9-15, B1-B2)
"""

from timescale_cdc_spark.cdc.capture import cdc_transform, snapshot_diff
from timescale_cdc_spark.cdc.log import EventLog
from timescale_cdc_spark.cdc.replay import latest_state, replay_table, state_as_of
from timescale_cdc_spark.cdc.views import event_log_view

__all__ = [
    "EventLog",
    "cdc_transform",
    "event_log_view",
    "latest_state",
    "replay_table",
    "snapshot_diff",
    "state_as_of",
]
