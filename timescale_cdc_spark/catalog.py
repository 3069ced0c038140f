"""Fixture catalog: load the driver's parquet tables and register views.

The reference's operating model is "query the log with any Postgres
client" (reference: readme.md:107-121); our equivalent is Spark SQL over
registered temp views. Reads are plain ``spark.read.parquet`` so
Catalyst gets predicate pushdown + column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timescale_cdc_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy scan).

    ``events.parquet`` has shipped with TIMESTAMP(NANOS) in some
    driver generations (Spark's parquet reader rejects it) and plain
    TIMESTAMP(MICROS)/NTZ in others. The nanosAsLong escape hatch +
    conditional ``ts DIV 1000`` truncation handles the former — the
    same conversion DuckDB applies, so oracle comparisons stay exact —
    and is a no-op when the column already reads as a timestamp type.
    """
    # Timestamp semantics must be UTC regardless of who built the
    # session (the DuckDB oracle is tz-naive UTC); runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; returns the frames.

    Temp views are inlined into the logical plan by Catalyst, so a
    ``spark.sql`` query over them gets identical optimization to the
    DataFrame API (SURVEY.md §4: view inlining ≙ Postgres view rewrite
    of init.sql:75-84).
    """
    frames: dict[str, DataFrame] = {}
    for name in FIXTURE_TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)  # nanos-safe for events
            df.createOrReplaceTempView(name)
            frames[name] = df
    # SQL-callable Timescale functions ride along with the views so
    # the EP3 surface accepts time_bucket() in pasted SQL.
    from timescale_cdc_spark.functions.time import register_sql_functions

    register_sql_functions(spark)
    return frames
