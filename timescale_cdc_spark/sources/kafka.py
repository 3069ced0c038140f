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
    """True when the kafka data source is registered on the classpath."""
    try:
        spark._jvm.org.apache.spark.sql.kafka010.KafkaSourceProvider  # noqa: B018
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


def envelope_to_kafka(df: DataFrame, topic_prefix: str = "cdc-") -> DataFrame:
    """Serialize envelope rows to the Kafka wire shape: JSON value +
    per-table topic routing (B4/B7 — JsonConverter + `cdc-<name>`
    naming, cdc-timescale-connector.json:16). Pure transform: testable
    without a broker."""
    return df.select(
        F.concat(F.lit(topic_prefix), F.col("table_name")).alias("topic"),
        F.col("event_id").cast("string").alias("key"),
        F.to_json(F.struct(*[f.name for f in EVENT_LOG_SCHEMA.fields])).alias(
            "value"
        ),
    )


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
