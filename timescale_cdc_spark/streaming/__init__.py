"""Structured Streaming delivery layer (SURVEY.md §2 B41-B48): the
Spark-native replacement for the reference's Kafka Connect poll →
topic publish path (readme.md:50-56).

- pipeline.py — readStream on the event log, foreachBatch fan-out to
  per-table `cdc-<name>` sinks, checkpointed exactly-once delivery
- monitor.py  — windowed monitoring aggregations (tumbling / sliding /
  session) and watermark policies
- state.py    — stateful per-key processing (running current-state)
- joins.py    — stream-stream watermarked interval join
"""

from timescale_cdc_spark.streaming.joins import stream_stream_interval_join
from timescale_cdc_spark.streaming.pipeline import (
    CdcStreamPipeline,
    stream_event_log,
)

__all__ = [
    "CdcStreamPipeline",
    "stream_event_log",
    "stream_stream_interval_join",
]
