"""Canonical schemas.

EVENT_LOG_SCHEMA mirrors the reference's CDC envelope table
``cdc.event_log`` (reference: timescale/init.sql:41-49); null rules per
readme.md:252-267 (``before`` NULL on INSERT, ``after`` NULL on DELETE).
ASSETS_SCHEMA / ANOMALY_SCHEMA mirror the captured source tables
(init.sql:90-96, 119-123). Fixture schemas match TESTDATA.md.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- CDC domain (reference DDL) -------------------------------------------

#: cdc.event_log envelope — init.sql:41-49. `before`/`after` stay JSON
#: strings at rest (schema-free, exactly like the reference's `json`
#: columns); typed access happens on demand via from_json (see
#: cdc/replay.py).
EVENT_LOG_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),  # init.sql:42
        T.StructField("schema_name", T.StringType(), False),  # init.sql:43
        T.StructField("table_name", T.StringType(), False),  # init.sql:44
        T.StructField("operation", T.StringType(), False),  # init.sql:45
        T.StructField("before", T.StringType(), True),  # init.sql:46
        T.StructField("after", T.StringType(), True),  # init.sql:47
        T.StructField("event_id", T.LongType(), False),  # init.sql:48
    ]
)

#: dataschema.assets — init.sql:90-96.
ASSETS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),  # SERIAL, init.sql:91
        T.StructField("name", T.StringType(), False),  # init.sql:92
        T.StructField("serialnumber", T.StringType(), False),  # UNIQUE, init.sql:93
        T.StructField("created_at", T.TimestampType(), False),  # init.sql:94
        T.StructField("updated_at", T.TimestampType(), False),  # init.sql:95
    ]
)

#: dataschema.anomaly — init.sql:119-123 (jsonb payload kept as JSON string).
ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),  # init.sql:120
        T.StructField("sensorid", T.StringType(), False),  # init.sql:121
        T.StructField("event", T.StringType(), False),  # init.sql:122
    ]
)

VALID_OPERATIONS = ("INSERT", "UPDATE", "DELETE")  # init.sql:16

# --- Driver fixtures (TESTDATA.md / FIXTURES.md §2) ------------------------

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
