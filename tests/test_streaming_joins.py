"""B47 stream-static join + A19 capture registration tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timescale_cdc_spark.cdc import EventLog, cdc_transform
from timescale_cdc_spark.cdc.views import register_table_views
from timescale_cdc_spark.schemas import ASSETS_SCHEMA, EVENT_LOG_SCHEMA

T0 = dt.datetime(2025, 6, 1, 12, 0, 0)


def test_stream_static_join(spark, tmp_path):
    """B47: enrich the envelope stream with a static dimension — the
    'events joined with current entity snapshot' delivery shape."""
    rows = [
        (T0, "dataschema", "assets", "UPDATE", None, '{"id": 1}', 1),
        (T0, "dataschema", "assets", "UPDATE", None, '{"id": 2}', 2),
        (T0, "dataschema", "assets", "UPDATE", None, '{"id": 3}', 3),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema=EVENT_LOG_SCHEMA).write.parquet(src)

    static_dim = spark.createDataFrame(
        [(1, "Water Pump"), (2, "Steam Trap")], "id long, name string"
    )
    stream = spark.readStream.schema(EVENT_LOG_SCHEMA).parquet(src)
    enriched = (
        stream.withColumn("pk", F.get_json_object("after", "$.id").cast("long"))
        .join(static_dim, F.col("pk") == static_dim.id, "left")
        .select("event_id", "pk", "name")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: r.name for r in spark.sql("SELECT * FROM enriched_out").collect()}
    assert got == {1: "Water Pump", 2: "Steam Trap", 3: None}


def test_register_table_views(spark, tmp_path):
    """A19 trigger binding analog: capture registration = per-table
    view registry over the shared log (init.sql:106-113's CREATE
    TRIGGER ... FOR EACH ROW becomes 'register this table's view')."""
    log = EventLog(spark, str(tmp_path / "log"))
    seed = spark.createDataFrame(
        [(1, "Water Pump", "WP001", T0, T0)], schema=ASSETS_SCHEMA
    )
    empty = spark.createDataFrame([], schema=ASSETS_SCHEMA)
    log.append(cdc_transform(empty, seed, "id", "dataschema", "assets", F.lit(T0)))
    log.append(cdc_transform(empty, seed, "id", "dataschema", "anomaly", F.lit(T0)))

    views = register_table_views(
        log, [("dataschema", "assets"), ("dataschema", "anomaly")]
    )
    assert set(views) == {"event_log_assets", "event_log_anomaly"}
    # SQL over the registered views — the reference's psql surface
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM event_log_assets WHERE operation = 'INSERT'"
    ).collect()[0]["n"]
    assert n == 1
    total = spark.sql("SELECT COUNT(*) AS n FROM event_log").collect()[0]["n"]
    assert total == 2


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream watermarked interval join: each reading matches
    maintenance events on the same asset within the 10-minute
    lookback; older or other-asset events never join. The same
    builder on batch frames must produce the identical result set
    (batch parity = the oracle for the streaming plan)."""
    from timescale_cdc_spark.streaming import stream_stream_interval_join

    m = dt.timedelta(minutes=1)
    readings = [
        (1, T0 + 20 * m, 98.5),   # joins maint at +15m (5m before)
        (2, T0 + 20 * m, 71.2),   # maint for asset 2 is 20m earlier -> no join
        (3, T0 + 40 * m, 55.0),   # no maint at all
    ]
    maint = [
        (1, T0 + 15 * m, "greased"),
        (1, T0 + 31 * m, "replaced"),  # AFTER the reading -> no join
        (2, T0 + 0 * m, "inspected"),  # 20m before reading, > lookback
    ]
    r_dir, mnt_dir = str(tmp_path / "readings"), str(tmp_path / "maint")
    r_schema = "asset_id long, r_ts timestamp, value double"
    m_schema = "asset_id long, m_ts timestamp, action string"
    r_batch = spark.createDataFrame(readings, r_schema)
    m_batch = spark.createDataFrame(maint, m_schema)
    r_batch.write.parquet(r_dir)
    m_batch.write.parquet(mnt_dir)

    def build(left, right):
        return stream_stream_interval_join(
            left, right, on=["asset_id"],
            left_ts="r_ts", right_ts="m_ts", lookback="10 minutes",
        )

    # streaming run
    out = build(
        spark.readStream.schema(r_schema).parquet(r_dir),
        spark.readStream.schema(m_schema).parquet(mnt_dir),
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.asset_id, r.value, r.action)
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }
    assert got == {(1, 98.5, "greased")}

    # batch parity: identical plan minus watermarks, same rows
    batch_got = {
        (r.asset_id, r.value, r.action)
        for r in build(r_batch, m_batch).collect()
    }
    assert batch_got == got

    # same-name ts columns must be rejected, not silently mis-joined
    import pytest

    with pytest.raises(ValueError):
        stream_stream_interval_join(r_batch, m_batch, on=["asset_id"])


def test_stream_stream_interval_join_rejects_column_clash(spark):
    """ADVICE r3 low: shared non-key column names across the two sides
    would yield duplicate output columns — must raise up front, like
    the identical-ts-name check."""
    import pytest

    from timescale_cdc_spark.streaming import stream_stream_interval_join

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)],
        "asset_id long, l_ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 2.0)],
        "asset_id long, r_ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="value"):
        stream_stream_interval_join(
            left, right, on=["asset_id"], left_ts="l_ts", right_ts="r_ts"
        )
    # disjoint names still work
    ok = stream_stream_interval_join(
        left,
        right.withColumnRenamed("value", "r_value"),
        on=["asset_id"],
        left_ts="l_ts",
        right_ts="r_ts",
    )
    assert ok.count() == 1


def test_stream_stream_interval_join_left_outer(spark, tmp_path):
    """Left-outer: readings with no in-window maintenance survive with
    nulls (streaming left-outer emits them once the watermark passes;
    with availableNow + watermark the unmatched rows flush at end)."""
    from timescale_cdc_spark.streaming import stream_stream_interval_join

    m = dt.timedelta(minutes=1)
    readings = [(1, T0 + 20 * m, 98.5), (3, T0 + 40 * m, 55.0)]
    maint = [(1, T0 + 15 * m, "greased")]
    r_schema = "asset_id long, r_ts timestamp, value double"
    m_schema = "asset_id long, m_ts timestamp, action string"
    r_batch = spark.createDataFrame(readings, r_schema)
    m_batch = spark.createDataFrame(maint, m_schema)

    out = stream_stream_interval_join(
        r_batch, m_batch, on=["asset_id"],
        left_ts="r_ts", right_ts="m_ts", lookback="10 minutes",
        how="left_outer",
    )
    got = {(r.asset_id, r.value, r.action) for r in out.collect()}
    assert got == {(1, 98.5, "greased"), (3, 55.0, None)}
