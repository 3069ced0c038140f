"""Tier A (CDC) operators expressed over the driver fixtures, so every
capture-path operator has a DuckDB-checkable queries() entry
(SURVEY.md §2 Tier A). The golden-scenario pytest suite
(tests/test_cdc.py) covers the same modules on reference-shaped data;
these queries pin them to the oracle.

Mapping: A1/A2 → a1/a2, A3 → a3, A6 → a6, A7 → a7, A10 → a10,
A11-A13 → a11, A15 → a15, A17 → a17, A18 → a18, A20 → a20,
B1/B2 → b1/b2. (A4 current_timestamp, A5/A9 physical sink layout,
A8 ordering, A14/A16 ingest constraints are exercised in
tests/test_cdc.py — they are side-effecting or nondeterministic, not
oracle-hashable.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescale_cdc_spark.cdc.capture import changes_to_envelope, snapshot_diff
from timescale_cdc_spark.cdc.incremental import IncrementalPoller, Offset
from timescale_cdc_spark.queries.base import register, t

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
    SELECT {OP_CASE} AS operation,
           COUNT(*) AS n, MIN(ts) AS min_ts, MAX(ts) AS max_ts
    FROM events GROUP BY 1
    """,
)
def a2_capture_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 parameterized capture (TG_ARGV schema/table identity,
    init.sql:25-38): the events stream becomes envelope rows via
    changes_to_envelope with explicit (schema, table) parameters; the
    envelope is then aggregated per operation."""
    ev = t(spark, sf_dir, "events").withColumn("op", _op_col())
    env = changes_to_envelope(
        ev, "op", "dataschema", "anomaly", "ts",
        ["event_id", "user_id", "event_type", "value"],
    )
    return env.groupBy("operation").agg(
        F.count("*").alias("n"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@register(
    "a3_row_to_json",
    """
    SELECT r_regionkey,
           to_json(struct_pack(r_regionkey := r_regionkey, r_name := r_name))::VARCHAR
             AS row_json
    FROM region
    """,
)
def a3_row_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 row→JSON serialization: to_json(struct(*)) ≙ row_to_json
    (init.sql:18,34). Both engines emit compact {"k":v} JSON with
    struct-field order, so the strings compare byte-equal."""
    re = t(spark, sf_dir, "region")
    return re.select(
        "r_regionkey",
        F.to_json(F.struct("r_regionkey", "r_name")).alias("row_json"),
    )


@register(
    "a6_event_id_assignment",
    """
    SELECT event_id,
           ROW_NUMBER() OVER (ORDER BY ts, event_id) + 1000 AS assigned_id
    FROM events
    """,
)
def a6_event_id_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 dense monotone event_id: row_number over (ts, tiebreak) +
    high-watermark — the sequence replacement (init.sql:51-59) used by
    EventLog.append (cdc/log.py). Dense + gap-free is what makes
    `event_id > last_seen_id` polling valid (readme.md:266-267)."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    return ev.select(
        "event_id", (F.row_number().over(w) + F.lit(1000)).alias("assigned_id")
    )


@register(
    "a7_pk_dedup",
    """
    SELECT COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM (SELECT DISTINCT event_id, ts FROM
           (SELECT event_id, ts FROM events
            UNION ALL SELECT event_id, ts FROM events))
    """,
)
def a7_pk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 composite-PK enforcement: at-least-once re-delivery of the
    whole stream collapses back to unique (event_id, ts) pairs via
    ingest-time dropDuplicates (PK init.sql:61-62)."""
    ev = t(spark, sf_dir, "events").select("event_id", "ts")
    doubled = ev.unionAll(ev)
    deduped = doubled.dropDuplicates(["event_id", "ts"])
    return deduped.agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
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
    "a15_default_values",
    """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'DEFAULT-PRIORITY')
             AS priority_filled
    FROM orders
    """,
)
def a15_default_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 default column values: coalesce-to-default at ingest
    (DEFAULT NOW() columns, init.sql:94-95)."""
    od = t(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")),
            F.lit("DEFAULT-PRIORITY"),
        ).alias("priority_filled"),
    )


@register(
    "a17_seed_insert",
    """
    SELECT * FROM (VALUES
      (1, 'Water Pump', 'WP001'),
      (2, 'Steam Trap', 'STM002'),
      (3, 'Compressor', 'CMP003')
    ) AS t(id, name, serialnumber)
    """,
)
def a17_seed_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17 multi-row literal insert: the reference's seed assets
    (init.sql:99-103) as createDataFrame."""
    return spark.createDataFrame(
        [(1, "Water Pump", "WP001"), (2, "Steam Trap", "STM002"),
         (3, "Compressor", "CMP003")],
        schema="id int, name string, serialnumber string",
    )


@register(
    "a18_interval_arithmetic",
    """
    SELECT event_id, ts,
           ts - INTERVAL 1 HOUR AS ts_minus_1h,
           ts + INTERVAL 20 MINUTE AS ts_plus_20m
    FROM events
    """,
)
def a18_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18 timestamp interval arithmetic: NOW() - INTERVAL '1 hour' …
    '20 minutes' (init.sql:130-136, readme.md:114)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "ts",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("ts_minus_1h"),
        (F.col("ts") + F.expr("INTERVAL 20 MINUTE")).alias("ts_plus_20m"),
    )


@register("a20_full_scan", "SELECT * FROM events")
def a20_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20 full-table scan: SELECT * FROM cdc.event_log — the readme's
    smoke query (readme.md:119-121)."""
    return t(spark, sf_dir, "events")


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
    """B1 timestamp+incrementing poll: rows strictly beyond the
    composite (ts, event_id) offset — the connector's generated
    incremental SELECT (cdc-timescale-connector.json:9-10,15;
    readme.md:266-267). Uses IncrementalPoller.poll_frame with a
    pinned offset."""
    poller = IncrementalPoller.__new__(IncrementalPoller)
    poller.state_path = ""  # pinned offset, no persistence needed
    poller._offset = Offset(ts="2024-01-15 00:00:00", event_id=5000)
    return poller.poll_frame(t(spark, sf_dir, "events")).select(
        "event_id", "ts", "user_id", "event_type"
    )


@register(
    "b2_initial_offset",
    """
    SELECT COUNT(*) AS n, MIN(ts) AS first_ts
    FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    """,
)
def b2_initial_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 initial offset: ignore rows before start.timestamp
    (cdc-timescale-connector.json:13)."""
    ev = t(spark, sf_dir, "events")
    return ev.filter(
        F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp")
    ).agg(F.count("*").alias("n"), F.min("ts").alias("first_ts"))


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
    (replay's history-preserving sibling; guide 'CDC/SCD2' pattern)."""
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
    "cdc_replay_roundtrip",
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
def cdc_replay_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30 through the REAL replay module: events → envelope (JSON
    after-images via changes_to_envelope) → cdc/replay.py::latest_state
    parses the JSON back and folds last-event-wins, dropping keys whose
    final op is DELETE. The oracle computes the same fold directly —
    proving the envelope serialize→parse round-trip is lossless."""
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
