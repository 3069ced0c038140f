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
