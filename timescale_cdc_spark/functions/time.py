"""time_bucket — the Timescale `time_bucket(interval, ts)` analog
(hypertable bucketing, reference readme.md:220 motivation; SURVEY §4
'optional syntactic sugar').

Implemented as epoch-floor arithmetic so ANY bucket width works (not
just the calendar units date_trunc supports) and the result is
engine-portable: to_timestamp(floor(epoch/width)*width), epoch-aligned
exactly like F.window's tumbling windows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNITS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}


def bucket_seconds(width: str) -> int:
    """Parse '15 minutes' / '1 hour' / '90 seconds' into seconds."""
    parts = width.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _UNITS:
        raise ValueError(f"unsupported bucket width: {width!r}")
    return int(parts[0]) * _UNITS[parts[1].lower()]


def time_bucket(width: str, ts: Column | str) -> Column:
    """Floor `ts` to the start of its `width`-sized epoch-aligned
    bucket — `time_bucket('15 minutes', ts)`."""
    col = F.col(ts) if isinstance(ts, str) else ts
    secs = bucket_seconds(width)
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(col) / secs).cast("long") * secs
    )


#: SQL-text width→seconds fragment shared by the SQL time_bucket
#: (must accept exactly what bucket_seconds() accepts).
_SQL_WIDTH_SECS = """
  (CAST(split_part({w}, ' ', 1) AS INT) *
   CASE lower(split_part({w}, ' ', 2))
     WHEN 'second' THEN 1 WHEN 'seconds' THEN 1
     WHEN 'minute' THEN 60 WHEN 'minutes' THEN 60
     WHEN 'hour' THEN 3600 WHEN 'hours' THEN 3600
     WHEN 'day' THEN 86400 WHEN 'days' THEN 86400
   END)
"""


def register_sql_functions(spark) -> None:
    """Make ``time_bucket(width, ts)`` callable from ``spark.sql`` —
    the Timescale SQL UX over the EP3 entry point (readme.md:107-121's
    'use your favorite client' surface; the reference's ad-hoc SQL can
    then be pasted near-verbatim).

    Registered as a Spark SQL-defined function (``CREATE TEMPORARY
    FUNCTION ... RETURN <expr>``): pure expression, inlined by
    Catalyst into whole-stage codegen — NOT a Python UDF, zero
    serialization cost."""
    secs = _SQL_WIDTH_SECS.format(w="width")
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION time_bucket(
            width STRING, ts TIMESTAMP)
        RETURNS TIMESTAMP
        RETURN timestamp_seconds(
            CAST(floor(unix_timestamp(ts) / {secs}) AS BIGINT) * {secs})
        """
    )
