"""Scalar/collection function surface (SURVEY.md §2 B13-B14, B33-B40,
B43 batch analog). The reference exposes the full Postgres function
surface over the log (readme.md:107-121); these queries pin the Spark
equivalents against DuckDB semantics.

Engine-parity notes baked into each oracle:
* Spark ``dayofweek`` is 1=Sunday; DuckDB ``extract(dow)`` is
  0=Sunday → oracle adds 1.
* Spark ``unix_timestamp`` floors; DuckDB ``epoch()`` keeps the
  fraction → oracle floors before casting.
* Spark ``ceil(double)`` returns BIGINT; DuckDB returns DOUBLE →
  both sides cast explicitly.
* DuckDB list indexing is 1-based, same as Spark ``element_at``.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timescale_cdc_spark.queries.base import register, t

IO_SCRATCH = os.path.join(tempfile.gettempdir(), "timescale_cdc_spark_io")


def _scratch(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(IO_SCRATCH, tag, name)


# ---------------------------------------------------------------------------
# B13/B14 — non-parquet sources and partitioned sink round-trips
# ---------------------------------------------------------------------------


@register(
    "b13_scan_csv_roundtrip",
    """
    SELECT event_id, user_id, event_type, props FROM events
    """,
)
def b13_scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source (B13): write events to CSV, read back with an explicit
    schema (never inferSchema on the hot path) — result must equal the
    parquet original. Raw-feed ingest path of the engine."""
    path = _scratch(sf_dir, "events_csv")
    src = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "props"
    )
    src.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("props", T.StringType()),
        ]
    )
    return spark.read.schema(schema).option("header", True).csv(path)


@register(
    "b13_scan_json_roundtrip",
    """
    SELECT event_id, ts, event_type, value FROM events
    """,
)
def b13_scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source (B13): envelope-style serialization round-trip
    (the wire format of the reference's JsonConverter,
    docker-compose.yml:76-79)."""
    path = _scratch(sf_dir, "events_json")
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"  # keep microseconds
    src = t(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    src.write.mode("overwrite").option("timestampFormat", ts_fmt).json(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).option("timestampFormat", ts_fmt).json(path)


@register(
    "b14_partitioned_sink",
    """
    SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def b14_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink (B14 = A5+A9): the event-log layout —
    Hive-style event_date partitions standing in for hypertable chunks
    (reference init.sql:70). Reading back and aggregating per partition
    proves partition pruning-compatible layout."""
    path = _scratch(sf_dir, "events_partitioned")
    src = t(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    src.write.mode("overwrite").partitionBy("event_date").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("event_date").cast("date").alias("event_date"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# B33-B39 scalar function families
# ---------------------------------------------------------------------------


@register(
    "b33_string_fns",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           lower(p_type) AS type_lc,
           substring(p_name, 1, 4) AS name_prefix,
           length(p_name) AS name_len,
           trim(concat(' ', p_name, ' ')) AS name_trimmed,
           string_split(p_name, ' ')[1] AS first_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
    FROM part
    """,
)
def b33_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (B33): the serialnumber-prefix parsing family
    (reference seeds 'WP001','STM002','CMP003', init.sql:101-103)."""
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
    )


@register(
    "b34_datetime_fns",
    """
    SELECT event_id,
           date_trunc('hour', ts) AS hour_ts,
           CAST(extract(hour FROM ts) AS INT) AS hh,
           CAST(extract(day FROM ts) AS INT) AS dd,
           CAST(extract(dow FROM ts) + 1 AS INT) AS dow,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           CAST(ts AS DATE) + 7 AS week_later
    FROM events
    """,
)
def b34_datetime_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions (B34): date_trunc is the time_bucket analog
    (Timescale's hypertable bucketing, SURVEY B34); interval arithmetic
    mirrors init.sql:132-136."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("hour_ts"),
        F.hour("ts").cast("int").alias("hh"),
        F.dayofmonth("ts").cast("int").alias("dd"),
        F.dayofweek("ts").cast("int").alias("dow"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_add(F.col("ts").cast("date"), 7).alias("week_later"),
    )


@register(
    "b35_math_fns",
    """
    SELECT event_id,
           round(value, 1) AS value_r1,
           abs(value - 100.0) AS dist_100,
           CAST(ceil(value) AS BIGINT) AS value_ceil,
           CAST(floor(value) AS BIGINT) AS value_floor,
           value * value AS value_sq,
           sqrt(value) AS value_sqrt,
           round(ln(value + 1.0), 4) AS value_ln
    FROM events
    """,
)
def b35_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (B35). sqrt/abs/* are IEEE-exact cross-engine;
    ln is transcendental so it is pinned at 4 decimals."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round("value", 1).alias("value_r1"),
        F.abs(F.col("value") - 100.0).alias("dist_100"),
        F.ceil("value").cast("bigint").alias("value_ceil"),
        F.floor("value").cast("bigint").alias("value_floor"),
        (F.col("value") * F.col("value")).alias("value_sq"),
        F.sqrt("value").alias("value_sqrt"),
        F.round(F.log(F.col("value") + 1.0), 4).alias("value_ln"),
    )


@register(
    "b36_json_fns",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           COUNT(*) AS n,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
    FROM events
    GROUP BY 1
    """,
)
def b36_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions (B36): extract fields from the schema-flexible
    payload — exactly how the engine reads the envelope's before/after
    JSON documents (reference init.sql:46-47, jsonb payload
    init.sql:122)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min(k).alias("k_min"),
            F.max(k).alias("k_max"),
        )
    )


@register(
    "b37_array_fns",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> x * x)), 4) AS norm2,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           len(list_filter(embedding, x -> x > 0)) AS n_pos
    FROM embeddings
    """,
)
def b37_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions (B37): transform/aggregate/filter over embedding
    vectors — the JVM-side (codegen) path for vector math; no Python
    UDF in sight (this is the 100 TB-safe form of C3's dot products)."""
    em = t(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.expr(
                "aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
            ),
            4,
        ).alias("norm2"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.size(F.expr("filter(embedding, x -> x > 0)")).alias("n_pos"),
    )


@register(
    "b38_map_fns",
    """
    SELECT user_id, event_type, n FROM (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    """,
)
def b38_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions (B38): build a per-user map of event-type counts
    (map_from_entries over sorted struct entries), then explode it back
    to rows — the props-map access pattern. The oracle is the flat
    group-by the round-trip must reproduce."""
    ev = t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    mapped = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id", F.explode("type_counts").alias("event_type", "n")
    )


@register(
    "b39_conditional_fns",
    """
    SELECT CASE WHEN event_type = 'signup' THEN 'INSERT'
                WHEN event_type = 'error'  THEN 'DELETE'
                ELSE 'UPDATE' END AS operation,
           COALESCE(NULLIF(event_type, 'view'), 'VIEWED') AS type_decoded,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def b39_conditional_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null functions (B39): op-code decode — the CASE
    mapping from app events to CDC operations (INSERT|UPDATE|DELETE,
    reference init.sql:16)."""
    ev = t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "INSERT")
        .when(F.col("event_type") == "error", "DELETE")
        .otherwise("UPDATE")
    )
    decoded = F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit("VIEWED"))
    return ev.groupBy(
        op.alias("operation"), decoded.alias("type_decoded")
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# B40 Pandas UDF (the sanctioned slow path)
# ---------------------------------------------------------------------------


@register(
    "b40_pandas_udf_tokens",
    """
    SELECT doc_id,
           len(text) - len(replace(text, ' ', '')) + 1 AS n_tokens
    FROM documents
    """,
)
def b40_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF (B40): Arrow-vectorized token counting. The UDF
    mirrors `space_count + 1` exactly so the oracle is pure SQL. This
    is the pattern for anything built-ins can't express: batch-
    vectorized, never row-at-a-time."""

    @F.pandas_udf(T.LongType())
    def token_count(texts: pd.Series) -> pd.Series:
        return texts.str.count(" ").astype("int64") + 1

    return t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )


# ---------------------------------------------------------------------------
# B43 batch analog — tumbling-window aggregation
# ---------------------------------------------------------------------------


@register(
    "b43_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def b43_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window aggregation (B43): events-per-hour per type —
    the Kafka-UI-style monitoring rollup (reference readme.md:124-126).
    Uses F.window (the streaming-native operator) in batch mode; its
    1-hour buckets are epoch-aligned, identical to date_trunc."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(10,2))"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
