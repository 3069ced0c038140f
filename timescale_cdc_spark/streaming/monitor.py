"""Windowed monitoring aggregations over the event stream — the
Kafka-UI "watch the topics" surface (reference readme.md:124-126)
done as queries (B42-B44).

All three builders accept either a batch or a streaming DataFrame
(same Catalyst plan either way); streaming adds the watermark for
state eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_per_window(
    df: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    key: str = "table_name",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """B43 tumbling (or sliding, when ``slide`` is given) counts per
    key — events-per-minute per table. With ``watermark`` set (B42),
    late rows beyond the horizon are dropped deterministically —
    explicit semantics where the reference's timestamp polling skips
    them silently (SURVEY B42)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        df.groupBy(win.alias("win"), F.col(key))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key,
            "n",
        )
    )


def session_bursts(
    df: DataFrame,
    gap: str = "5 minutes",
    key: str = "table_name",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """B44 session windows: activity bursts per key — sessions close
    after ``gap`` of silence (burst detection per sensor)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("sess"), F.col(key))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key,
            "n",
        )
    )
