"""The timing facts streaming/harness.py documents, asserted directly
(the b41_b48_streaming_semantics entry RELIES on them; the oracle
parity test would fail opaquely if a Spark upgrade changed them, these
fail with the actual story).

Verified-by-execution facts (Spark 4.1):
1. stage_stream_batches + maxFilesPerTrigger=1 replays the list order
   exactly (mtime-ordered admission).
2. Late-row filtering uses the ONE-BATCH-LAGGED watermark
   (SPARK-40925 watermarkForLateEvents): rows outdated only by the
   immediately preceding batch are NOT dropped; rows outdated by two
   batches ago are.
3. Append-mode emission finalizes windows whose end <= the in-effect
   watermark — a trailing flusher batch is what pushes completed
   windows to the sink.
"""

from __future__ import annotations

import pytest

import datetime as dt
import os

from pyspark.sql import functions as F

from timescale_cdc_spark.streaming.harness import (
    run_to_completion,
    stage_stream_batches,
)

T0 = dt.datetime(2024, 1, 1)


def _day(d: int, h: int = 12) -> dt.datetime:
    return dt.datetime(2024, 1, d, h)


def test_staged_batches_replay_in_list_order(spark, tmp_path):
    parts = [
        spark.createDataFrame([(i, _day(10 + i))], "id long, ts timestamp")
        for i in range(4)
    ]
    src = stage_stream_batches(parts, str(tmp_path / "src"))
    seen: list[list[int]] = []

    def sink(batch, batch_id):
        seen.append([r.id for r in batch.select("id").collect()])

    q = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    assert seen == [[0], [1], [2], [3]]


@pytest.mark.slow
def test_late_filter_lags_one_batch_and_flusher_emits(spark, tmp_path):
    """One scenario pinning facts 2 and 3: a day-2 row arriving ONE
    batch after the day-10..12 spine survives; a day-3 row arriving
    TWO batches after is dropped; only windows at or below the final
    in-effect watermark reach the sink."""
    schema = "ts timestamp, v long"
    parts = [
        # b0: spine, max ts = day 12 -> wm after b0 = day 9
        spark.createDataFrame(
            [(_day(d), 1) for d in (10, 11, 12)], schema
        ),
        # b1: day-2 row; late vs wm(b0) but the LATE filter in b1 uses
        # the wm lagged one batch further (= epoch) -> survives
        spark.createDataFrame([(_day(2), 1)], schema),
        # b2: day-3 row; late filter now uses wm after b0 (= day 9)
        # -> dropped. day-30 row pushes the watermark for b3.
        spark.createDataFrame([(_day(3), 1), (_day(30), 1)], schema),
        # b3: flusher (stays in state itself; its batch's in-effect wm
        # = day 27 evicts/emits everything ending <= day 27)
        spark.createDataFrame([(_day(30, 13), 1)], schema),
    ]
    src = stage_stream_batches(parts, str(tmp_path / "src"))
    agg = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "3 days")
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").cast("date").alias("d"), "n")
    )
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    run_to_completion(q)
    got = {
        (str(r.d), r.n)
        for r in spark.read.parquet(out).collect()
    }
    # day-2 (one-batch late) survived; day-3 (two-batch late) dropped;
    # day-30 rows retained in state, never emitted
    assert got == {
        ("2024-01-02", 1),
        ("2024-01-10", 1),
        ("2024-01-11", 1),
        ("2024-01-12", 1),
    }


def test_streaming_physical_operators(spark, tmp_path):
    """The b41_b48 entry's families claim specific STATEFUL streaming
    operators; pin that Spark actually plans them (a silent fallback
    to a batch-style operator would void the state-eviction story):
    stream-stream interval join → StreamingSymmetricHashJoin,
    dropDuplicatesWithinWatermark → StreamingDeduplicateWithinWatermark,
    watermarked window agg → StateStoreSave."""
    from timescale_cdc_spark.streaming.joins import (
        stream_stream_interval_join,
    )

    schema = "user_id long, ts timestamp"
    rows = [(1, _day(10)), (1, _day(10, 13)), (2, _day(11))]
    left_src = stage_stream_batches(
        [spark.createDataFrame(rows, "user_id long, p_ts timestamp")],
        str(tmp_path / "l"),
    )
    right_src = stage_stream_batches(
        [spark.createDataFrame(rows, "user_id long, c_ts timestamp")],
        str(tmp_path / "r"),
    )
    ssj = stream_stream_interval_join(
        spark.readStream.schema("user_id long, p_ts timestamp").parquet(left_src),
        spark.readStream.schema("user_id long, c_ts timestamp").parquet(right_src),
        on=["user_id"],
        left_ts="p_ts",
        right_ts="c_ts",
        lookback="4 hours",
        watermark="2 days",
    )
    ev_src = stage_stream_batches(
        [spark.createDataFrame(rows, schema)], str(tmp_path / "e")
    )
    ev_stream = spark.readStream.schema(schema).parquet(ev_src)
    from pyspark.sql import functions as F2

    cases = {
        "StreamingSymmetricHashJoin": ssj,
        "StreamingDeduplicateWithinWatermark": (
            ev_stream.withWatermark("ts", "2 days")
            .dropDuplicatesWithinWatermark(["user_id"])
        ),
        "StateStoreSave": (
            ev_stream.withWatermark("ts", "2 days")
            .groupBy(F2.window("ts", "1 day"))
            .count()
        ),
    }
    for i, (op, df) in enumerate(cases.items()):
        q = (
            df.writeStream.format("parquet")
            .option("path", str(tmp_path / f"out{i}"))
            .option("checkpointLocation", str(tmp_path / f"ck{i}"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        run_to_completion(q)
        plan = q._jsq.explainInternal(True)
        assert op in plan, f"{op} missing from executed plan:\n{plan}"


@pytest.mark.slow
def test_relay_resume_is_in_the_registry_entry(spark, sf_dir):
    """The registry entry's relay family re-runs the pipeline from one
    checkpoint with an append in between — spot-check the topic dirs it
    leaves behind carry MORE THAN ONE delivered batch id, i.e. the
    resume actually split delivery (a fresh checkpoint would restart
    at batch 0 and overwrite)."""
    from timescale_cdc_spark.queries import QUERIES
    from timescale_cdc_spark.queries.base import scratch_path

    df = QUERIES["b41_b48_streaming_semantics"](spark, sf_dir)
    fams = dict(
        df.groupBy("family").count().collect()
    )
    assert set(f["family"] for f in df.select("family").distinct().collect()) == {
        "relay", "late", "join", "dedup", "ssjoin", "ssjoin_outer",
        "scagg", "scagg_day", "state", "vecsync",
    }
    assert fams  # non-empty
    # ssjoin_outer must carry BOTH halves: matches emitted as found
    # AND null-side rows emitted at watermark expiry (an emission bug
    # silently drops the 'unmatched' half)
    sso = {
        r["k"].rsplit("|", 1)[1]
        for r in df.filter(F.col("family") == "ssjoin_outer")
        .select("k")
        .collect()
    }
    assert sso == {"matched", "unmatched"}
    # scagg must span the LATE-backfilled days (10-12), the base
    # refresh (13-16), and the real-time tail (17-22) — a dead
    # backfill or tail path truncates the key range
    sc_days = sorted(
        r["k"][:10]
        for r in df.filter(F.col("family") == "scagg").select("k").collect()
    )
    assert sc_days[0] == "2024-01-10" and sc_days[-1] == "2024-01-22"
    topics = os.path.join(
        scratch_path(sf_dir, "streaming_semantics"), "topics", "cdc-activity"
    )
    batch_dirs = [d for d in os.listdir(topics) if d.startswith("_batch_id=")]
    assert len(batch_dirs) >= 2, batch_dirs
