"""Tier A (CDC) operators expressed over the driver fixtures, so every
capture-path operator has a DuckDB-checkable queries() entry
(SURVEY.md §2 Tier A). The golden-scenario pytest suite
(tests/test_cdc.py) covers the same modules on reference-shaped data;
these queries pin them to the oracle.

Consolidated mapping (one registry entry can cover several §2 rows —
the full map lives in README.md):
A1 → a1; A2/A3/A4 → a2 (row-level envelope incl. row→JSON + event
timestamping); A6/A7/A14 → a6 (dedup + dense id assignment);
A10 → a10; A11-A13 → a11; A15/A17 → a15 (multi-row literal insert
with defaulted columns); A16 → a16; A18 → b34 (functions_surface);
A20 → cdc_scd2_history (row-preserving full-table scan) and
b25 (full-scan aggregate); B1/B2 → b1; B30 → b30 (via the real
replay module). (A5/A9 physical sink layout and A8 ordering are
exercised by b14 and b28; A19 trigger registration is structural —
tests/test_cdc.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescale_cdc_spark.cdc.capture import changes_to_envelope, snapshot_diff
from timescale_cdc_spark.cdc.incremental import IncrementalPoller, Offset
from timescale_cdc_spark.queries.base import register, scratch_path, t

#: Deterministic event_type → TG_OP mapping (init.sql:16's op domain)
#: used to treat the `events` fixture as a change stream.
OP_CASE = (
    "CASE WHEN event_type = 'signup' THEN 'INSERT' "
    "WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPDATE' END"
)


def _op_col() -> F.Column:
    return (
        F.when(F.col("event_type") == "signup", "INSERT")
        .when(F.col("event_type") == "error", "DELETE")
        .otherwise("UPDATE")
    )


@register(
    "a1_snapshot_diff",
    """
    WITH old_snap AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
    ),
    new_snap AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 5 <> 0
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'INSERT'
                WHEN n.c_custkey IS NULL THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           o.c_acctbal AS before_acctbal,
           n.c_acctbal AS after_acctbal
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_acctbal <> n.c_acctbal OR o.c_name <> n.c_name
    """,
)
def a1_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 row-change capture, batch form: snapshot_diff derives
    INSERT/UPDATE/DELETE from two deterministic customer snapshots —
    exactly the trigger's op classification (reference init.sql:11-22)
    as ONE full-outer join on the PK."""
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    old = cust.filter(F.col("c_custkey") % 3 != 0)
    new = cust.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 10.0).otherwise(
            F.col("c_acctbal")
        ),
    )
    diff = snapshot_diff(old, new, "c_custkey")
    return diff.select(
        F.coalesce(F.col("after.c_custkey"), F.col("before.c_custkey")).alias(
            "c_custkey"
        ),
        "operation",
        F.col("before.c_acctbal").alias("before_acctbal"),
        F.col("after.c_acctbal").alias("after_acctbal"),
    )


@register(
    "a2_capture_envelope",
    f"""
    SELECT ts,
           'dataschema' AS schema_name,
           'anomaly' AS table_name,
           {OP_CASE} AS operation,
           to_json(struct_pack(event_id := event_id, user_id := user_id,
                               event_type := event_type))::VARCHAR AS payload_json
    FROM events
    """,
)
def a2_capture_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3/A4 in one row-level query: the events stream becomes
    envelope rows via changes_to_envelope with explicit parameterized
    (schema, table) identity (TG_ARGV, init.sql:25-38), each row
    carrying its event timestamp (A4 ≙ NOW(), init.sql:18) and its
    row→JSON payload (A3: to_json(struct(*)) ≙ row_to_json,
    init.sql:18,34 — both engines emit compact {"k":v} JSON in
    struct-field order, so the strings compare byte-equal; the payload
    carries long/string fields, the cross-engine-stable JSON types)."""
    ev = t(spark, sf_dir, "events").withColumn("op", _op_col())
    env = changes_to_envelope(
        ev, "op", "dataschema", "anomaly", "ts",
        ["event_id", "user_id", "event_type"],
    )
    return env.select(
        "ts",
        "schema_name",
        "table_name",
        "operation",
        F.coalesce("after", "before").alias("payload_json"),
    )


@register(
    "a6_event_ids_pk_dedup",
    """
    WITH deduped AS (
      SELECT DISTINCT event_id, ts FROM
        (SELECT event_id, ts FROM events
         UNION ALL SELECT event_id, ts FROM events)
    )
    SELECT event_id,
           ROW_NUMBER() OVER (ORDER BY ts, event_id) + 1000 AS assigned_id
    FROM deduped
    """,
)
def a6_event_ids_pk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7/A14 as one ingest pipeline: at-least-once re-delivery of
    the whole stream (doubled) collapses back to unique (event_id, ts)
    pairs via composite-PK dropDuplicates (A7, PK init.sql:61-62), then
    dense monotone surrogate ids are assigned via row_number over
    (ts, tiebreak) + high-watermark (A6/A14 — the sequence replacement,
    init.sql:51-59, used by EventLog.append in cdc/log.py). Dense +
    gap-free is what makes `event_id > last_seen_id` polling valid
    (readme.md:266-267)."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select("event_id", "ts")
    deduped = ev.unionAll(ev).dropDuplicates(["event_id", "ts"])
    w = Window.orderBy("ts", "event_id")
    return deduped.select(
        "event_id", (F.row_number().over(w) + F.lit(1000)).alias("assigned_id")
    )


@register(
    "a10_retention_horizon",
    """
    SELECT event_type, COUNT(*) AS n, MIN(ts) AS min_ts
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
    GROUP BY event_type
    """,
)
def a10_retention_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 retention predicate: rows surviving a 7-day horizon off the
    log head (init.sql:71's add_retention_policy interval). The
    physical partition-drop job is cdc/retention.py::apply_retention
    (tested in tests/test_cdc.py); this pins the horizon arithmetic."""
    ev = t(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("cutoff")
    )
    return (
        ev.join(F.broadcast(horizon))
        .filter(F.col("ts") >= F.col("cutoff"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.min("ts").alias("min_ts"))
    )


@register(
    "a11_view_routing",
    f"""
    WITH env AS (
      SELECT ts, 'dataschema' AS schema_name,
             CASE WHEN event_type IN ('click','view') THEN 'assets'
                  ELSE 'anomaly' END AS table_name,
             {OP_CASE} AS operation,
             user_id, value, event_id
      FROM events
    )
    SELECT ts, schema_name, table_name, operation, user_id, value, event_id
    FROM env
    WHERE schema_name = 'dataschema' AND table_name = 'assets'
    """,
)
def a11_view_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/A12/A13 filtered-projection view: route the shared log into
    a per-table stream (cdc.event_log_assets, init.sql:75-84) — a
    conjunctive equality filter + explicit projection that Catalyst
    pushes into the scan."""
    ev = t(spark, sf_dir, "events")
    env = ev.select(
        "ts",
        F.lit("dataschema").alias("schema_name"),
        F.when(F.col("event_type").isin("click", "view"), "assets")
        .otherwise("anomaly")
        .alias("table_name"),
        _op_col().alias("operation"),
        "user_id",
        "value",
        "event_id",
    )
    return env.filter(
        (F.col("schema_name") == "dataschema") & (F.col("table_name") == "assets")
    ).select(
        "ts", "schema_name", "table_name", "operation", "user_id", "value", "event_id"
    )


@register(
    "a15_a16_seed_unique",
    """
    SELECT 'seed' AS variant, id, name, serialnumber,
           COALESCE(priority, 'DEFAULT-PRIORITY') AS priority_filled,
           CAST(NULL AS BIGINT) AS user_id,
           CAST(NULL AS VARCHAR) AS event_type,
           CAST(NULL AS TIMESTAMP) AS first_ts,
           CAST(NULL AS BIGINT) AS first_event_id
    FROM (VALUES
      (1, 'Water Pump', 'WP001', '1-URGENT'),
      (2, 'Steam Trap', 'STM002', NULL),
      (3, 'Compressor', 'CMP003', NULL)
    ) AS t(id, name, serialnumber, priority)
    UNION ALL
    SELECT 'unique' AS variant, CAST(NULL AS INT) AS id,
           CAST(NULL AS VARCHAR) AS name,
           CAST(NULL AS VARCHAR) AS serialnumber,
           CAST(NULL AS VARCHAR) AS priority_filled,
           user_id, event_type, ts AS first_ts, event_id AS first_event_id
    FROM (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) r WHERE rn = 1
    """,
)
def a15_a16_seed_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed insert with defaults (A15+A17) + uniqueness enforcement
    (A16) as one variant-tagged union — merged in round 8 (the
    b27/b34_b35/b37_b38 pattern) to free a registry slot for the
    round-7 library-family entries while keeping every row and column
    of both former entries hash-checked.

    variant='seed' (former a15_seed_insert_defaults): the reference's
    seed assets as a multi-row literal insert (init.sql:99-103,
    createDataFrame) with absent column values filled by a declared
    default at ingest (DEFAULT ... columns, init.sql:94-95) —
    coalesce-to-default is the engine's default-value mechanism.

    variant='unique' (former a16_unique_enforcement): keep the first
    row per natural key (the serialnumber UNIQUE analog, init.sql:93)
    — deterministic keep-first window, the same machinery as C1
    dedup."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    seeded = spark.createDataFrame(
        [
            (1, "Water Pump", "WP001", "1-URGENT"),
            (2, "Steam Trap", "STM002", None),
            (3, "Compressor", "CMP003", None),
        ],
        schema="id int, name string, serialnumber string, priority string",
    )
    seed = seeded.select(
        F.lit("seed").alias("variant"),
        "id",
        "name",
        "serialnumber",
        F.coalesce("priority", F.lit("DEFAULT-PRIORITY")).alias(
            "priority_filled"
        ),
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast("string").alias("event_type"),
        # match the fixture's ts type (TIMESTAMP vs TIMESTAMP_NTZ
        # varies by parquet annotation; a union across the two fails)
        F.lit(None).cast(ev.schema["ts"].dataType).alias("first_ts"),
        F.lit(None).cast("long").alias("first_event_id"),
    )
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    uniq = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.lit("unique").alias("variant"),
            F.lit(None).cast("int").alias("id"),
            F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("string").alias("serialnumber"),
            F.lit(None).cast("string").alias("priority_filled"),
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
        )
    )
    return seed.unionByName(uniq)


@register(
    "b1_incremental_poll",
    """
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
       OR (ts = TIMESTAMP '2024-01-15 00:00:00' AND event_id > 5000)
    """,
)
def b1_incremental_poll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 timestamp+incrementing poll (and B2's initial offset): rows
    strictly beyond the composite (ts, event_id) offset — the
    connector's generated incremental SELECT
    (cdc-timescale-connector.json:9-10,15; readme.md:266-267). The
    pinned offset here IS a configured initial offset (B2,
    cdc-timescale-connector.json:13): the first poll from a configured
    start.timestamp uses exactly this predicate; subsequent polls
    advance it. Uses IncrementalPoller.poll_frame."""
    poller = IncrementalPoller.__new__(IncrementalPoller)
    poller.state_path = ""  # pinned offset, no persistence needed
    poller._offset = Offset(ts="2024-01-15 00:00:00", event_id=5000)
    return poller.poll_frame(t(spark, sf_dir, "events")).select(
        "event_id", "ts", "user_id", "event_type"
    )


@register(
    "cdc_scd2_history",
    """
    SELECT user_id,
           value AS state_value,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM events
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history from the change log: each event's image is valid
    [its ts, next event's ts) per key; the open-ended row is current —
    the slowly-changing-dimension materialization of the event log
    (replay's history-preserving sibling). Also the registry's
    row-preserving full-table scan (A20: no filter, every event row in,
    one output row out — the readme's SELECT-the-log smoke query,
    readme.md:119-121)."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("value").alias("state_value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "b30_latest_state_replay",
    f"""
    WITH ranked AS (
      SELECT user_id, event_id, value, {OP_CASE} AS operation,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM ranked WHERE rn = 1 AND operation <> 'DELETE'
    """,
)
def b30_latest_state_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30 latest-state reconstruction through the REAL replay module:
    events → envelope (JSON after-images via changes_to_envelope) →
    cdc/replay.py::latest_state parses the JSON back and folds
    last-event-wins per key, dropping keys whose final op is DELETE
    (the core CDC replay, reference readme.md:214-220). The oracle
    computes the same fold directly over the raw events — proving the
    envelope serialize→parse round-trip is lossless."""
    from pyspark.sql import types as T

    from timescale_cdc_spark.cdc.replay import latest_state

    ev = t(spark, sf_dir, "events").withColumn("op", _op_col())
    env = changes_to_envelope(
        ev, "op", "dataschema", "user_state", "ts",
        ["user_id", "event_id", "value"],
    ).withColumn("event_id", F.get_json_object(
        F.coalesce("after", "before"), "$.event_id").cast("long"))
    row_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    state = latest_state(env, "user_id", row_schema)
    return state.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


@register(
    "cdc_continuous_aggregate",
    """
    WITH hourly AS (
      SELECT 'hour' AS level, event_type,
             make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT)
                            * 3600 * 1000000) AS bucket,
             COUNT(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             min(value) AS min_value,
             max(value) AS max_value
      FROM events GROUP BY 2, 3
    ),
    daily AS (
      SELECT 'day' AS level, event_type,
             make_timestamp(CAST(floor(epoch(ts) / 86400) AS BIGINT)
                            * 86400 * 1000000) AS bucket,
             COUNT(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             min(value) AS min_value,
             max(value) AS max_value
      FROM events GROUP BY 2, 3
    )
    SELECT * FROM hourly UNION ALL SELECT * FROM daily
    """,
)
def cdc_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIERARCHICAL continuous aggregates (cdc/caggs.py — the
    TimescaleDB continuous-aggregate analog over the hypertables the
    reference creates, init.sql:69-72; hierarchy = Timescale 2.9
    caggs-on-caggs) driven end-to-end: an HOURLY per-event-type cagg
    over the facts and a DAILY cagg sourced from the hourly PARTIALS
    are cascade-refreshed (``cascade_refresh`` — the daily window
    capped at the hourly watermark, complete-bucket semantics) for
    everything before 2024-01-20; the remaining days stay
    unmaterialized on both levels. The result unions the two REAL-TIME
    views, level-tagged: level='hour' is the hourly view (materialized
    ∪ post-watermark tail), level='day' is the hierarchy view
    (``day.query`` over the hourly view — ``query_hierarchy``
    unrolled, the hourly view materialized once for both branches) —
    the daily tail aggregates the hourly VIEW, so it is exact even
    where neither level is materialized.

    The daily sum rolls up the hourly DECIMAL partial (``sum_dec``),
    so rollup == direct is exact, not an IEEE reorder (the double cast
    happens once, at the end, on identical exact decimals in both
    engines). The oracle computes both widths DIRECTLY from the facts:
    a hash match proves refresh → manifest → cascade → union == one
    one-shot aggregate at every level and any refresh lag (round 9,
    VERDICT r8 #1 — hierarchical caggs become driver-visible)."""
    import shutil

    from timescale_cdc_spark.cdc.caggs import (
        ContinuousAggregate,
        cascade_refresh,
    )

    path_h = scratch_path(sf_dir, "cagg_hier_hour")
    path_d = scratch_path(sf_dir, "cagg_hier_day")
    shutil.rmtree(path_h, ignore_errors=True)
    shutil.rmtree(path_d, ignore_errors=True)

    def hour_aggs():
        return [
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        ]

    def day_aggs():
        # rollup algebra over the hourly level's PARTIAL columns
        return [
            F.sum("n").alias("n"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        ]

    ev = t(spark, sf_dir, "events")
    hour = ContinuousAggregate(
        spark, path_h, "1 hour", "ts", ["event_type"], hour_aggs
    )
    day = ContinuousAggregate(
        spark, path_d, "1 day", "bucket", ["event_type"], day_aggs
    )
    # materialize both levels through 2024-01-19 inclusive; the tail
    # stays real-time on both. start_s=0 ("refresh everything before
    # the split" — the refresh_continuous_aggregate(NULL, end) idiom)
    # makes the window fully explicit, so cascade_refresh skips its
    # min/max bounds aggregation — one full facts scan per refresh
    # (round 15 opt; interleaved A/B in OPTIMIZATION_r15.md).
    # NOTE (round-15 advisor): start_s=0 is an EPOCH-0 floor, not the
    # NULL idiom's open start — a source row with ts < 1970 would fall
    # outside both the materialized window [0, split) and the
    # real-time tail (ts >= watermark). Unreachable with this dataset
    # (2024 timestamps, oracle-guarded); a dataset with pre-epoch rows
    # must clamp start_s to min(0, observed min) instead.
    split_s = 1705708800  # 2024-01-20T00:00:00Z
    cascade_refresh([hour, day], ev, start_s=0, end_s=split_s)

    def project(df: DataFrame, level: str) -> DataFrame:
        return df.select(
            F.lit(level).alias("level"),
            "event_type",
            "bucket",
            "n",
            F.col("sum_dec").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
        )

    # The hourly real-time view feeds BOTH union branches (the hour
    # level, and the daily view's source — query_hierarchy([hour,
    # day], ev) == day.query(hour.query(ev))). Left as two plan
    # copies, the post-watermark fact-tail aggregation executed once
    # per branch; materializing the view once (instance-scoped
    # localCheckpoint, rebuilt from parquet every pass — the same
    # shape as the lib entries' rolled frames) runs it once. Lazy:
    # the union's single action materializes it in place (round 15
    # opt; bit-identity + A/B in OPTIMIZATION_r15.md). Cluster note
    # (round-15 advisor): localCheckpoint truncates lineage and pins
    # partitions to executor block storage — fine in the local-mode
    # bench, but under executor loss / dynamic allocation the union
    # fails instead of recomputing; gate the checkpoint (or unpersist
    # the prior pass's RDD explicitly) before running this entry on a
    # cluster with dynamic allocation.
    hv = hour.query(ev).localCheckpoint(eager=False)
    return project(hv, "hour").unionByName(project(day.query(hv), "day"))
