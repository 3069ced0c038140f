"""Kafka source/sink wrappers — the reference's delivery bus
(readme.md:34-35, topics ``cdc-<relation>`` with JSON-serialized rows,
docker-compose.yml:76-79).

The spark-sql-kafka package is not on this container's classpath, so
construction is gated: ``kafka_available(spark)`` probes for the jar
and the wrappers raise a clear error when absent. The directory-based
topic sinks in streaming/pipeline.py provide the same pub/sub contract
locally (one dir ≙ one topic; readers ≙ consumer groups via their own
checkpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescale_cdc_spark.schemas import EVENT_LOG_SCHEMA


def kafka_available(spark: SparkSession) -> bool:
    """True when the kafka data source is registered on the classpath.

    Probes via Spark's ``Utils.classForName`` — a bare py4j attribute
    access (``spark._jvm.org...KafkaSourceProvider``) NEVER raises for
    a missing class (the JVM view resolves packages lazily and hands
    back a JavaPackage stub), and plain ``Class.forName`` resolves
    against the root/system classloader, missing jars that
    spark.jars/spark.jars.packages load into Spark's mutable context
    classloader in client mode (ADVICE r6). Utils.classForName uses
    getContextOrSparkClassLoader — the same resolution the kafka
    DataSource lookup itself performs."""
    try:
        spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider", True, False
        )
        return True
    except Exception:
        return False


def _require_kafka(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka is not on the classpath in this environment; "
            "use streaming/pipeline.py's directory topic sinks (same "
            "routing/ordering contract)"
        )


#: Kafka Connect JSON schema for the envelope value, as the reference's
#: JsonConverter (docker-compose.yml:76-79, schemas.enable defaulting
#: to true) frames every record produced by the JDBC source connector:
#: {"schema": <this>, "payload": <row>}. Field order and logical types
#: follow cdc.event_log (init.sql:41-49); TIMESTAMPTZ rides as int64
#: epoch-millis tagged with the Connect Timestamp logical name.
CONNECT_VALUE_SCHEMA = (
    '{"type":"struct","fields":['
    '{"type":"int64","optional":false,'
    '"name":"org.apache.kafka.connect.data.Timestamp","version":1,'
    '"field":"ts"},'
    '{"type":"string","optional":false,"field":"schema_name"},'
    '{"type":"string","optional":false,"field":"table_name"},'
    '{"type":"string","optional":false,"field":"operation"},'
    '{"type":"string","optional":true,"field":"before"},'
    '{"type":"string","optional":true,"field":"after"},'
    '{"type":"int64","optional":false,"field":"event_id"}],'
    '"optional":false,"name":"event_log"}'
)


def envelope_to_kafka(
    df: DataFrame, topic_prefix: str = "cdc-", connect_framing: bool = False
) -> DataFrame:
    """Serialize envelope rows to the Kafka wire shape: JSON value +
    per-table topic routing (B4/B7 — JsonConverter + `cdc-<name>`
    naming, cdc-timescale-connector.json:16). Pure transform: testable
    without a broker; output pinned by golden files
    (tests/golden/kafka_wire_*.jsonl).

    ``connect_framing=True`` reproduces the reference's exact
    JsonConverter record shape — ``{"schema": ..., "payload": ...}``
    with schemas.enable defaulting to true (docker-compose.yml:76-79):
    explicit nulls for absent before/after images and the timestamp as
    Connect-Timestamp epoch-millis. The bare mode (default) is the
    schemas.enable=false shape this repo's directory topics use. The
    record key is event_id (an extension — the reference's connector
    sets no key and relies on tasks.max=1 for ordering; a keyed record
    preserves per-key order under partitioned topics)."""
    topic = F.concat(F.lit(topic_prefix), F.col("table_name")).alias("topic")
    key = F.col("event_id").cast("string").alias("key")
    if not connect_framing:
        return df.select(
            topic,
            key,
            F.to_json(
                F.struct(*[f.name for f in EVENT_LOG_SCHEMA.fields])
            ).alias("value"),
        )
    payload = F.to_json(
        F.struct(
            F.unix_millis("ts").alias("ts"),
            "schema_name",
            "table_name",
            "operation",
            "before",
            "after",
            "event_id",
        ),
        {"ignoreNullFields": "false"},  # JsonConverter writes nulls
    )
    value = F.concat(
        F.lit('{"schema":' + CONNECT_VALUE_SCHEMA + ',"payload":'),
        payload,
        F.lit("}"),
    ).alias("value")
    return df.select(topic, key, value)


def write_stream_to_kafka(
    df: DataFrame, bootstrap_servers: str, checkpoint: str
):  # pragma: no cover — needs broker + jar
    """writeStream into Kafka with exactly-once checkpointing (B9)."""
    spark = df.sparkSession
    _require_kafka(spark)
    return (
        envelope_to_kafka(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_stream_from_kafka(
    spark: SparkSession, bootstrap_servers: str, topics: str
) -> DataFrame:  # pragma: no cover — needs broker + jar
    """readStream from Kafka topics; value parsed back into the
    envelope (B7 consume side)."""
    _require_kafka(spark)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENT_LOG_SCHEMA).alias("e")
    ).select("e.*")
