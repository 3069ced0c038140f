"""Engine function helpers — the Timescale function surface over
built-in Spark functions: ``time_bucket`` (the one custom function
the reference surface itself motivates, SURVEY.md §4) plus the
hyperfunction families added beyond it — gapfill/LOCF/TWA/stats/
percentile/candlestick/counter/HLL (hyper), state/liveness (state),
heavy hitters (freq), and saturating i32 arithmetic (saturating).
Every family's per-bucket partial is mergeable by its ``*_rollup``,
the continuous-aggregate two-step algebra."""

from timescale_cdc_spark.functions.freq import freq_agg, freq_rollup, topn
from timescale_cdc_spark.functions.hyper import (
    stats_agg,
    stats_rollup,
    time_bucket_gapfill,
)
from timescale_cdc_spark.functions.ident import sql_ident
from timescale_cdc_spark.functions.saturating import (
    saturating_add,
    saturating_mul,
    saturating_sub,
)
from timescale_cdc_spark.functions.state import (
    duration_in,
    heartbeat_rollup,
    heartbeat_summary,
    live_at,
    state_agg,
    state_at,
    state_rollup,
    state_timeline,
)
from timescale_cdc_spark.functions.time import time_bucket

__all__ = [
    "duration_in",
    "freq_agg",
    "freq_rollup",
    "heartbeat_rollup",
    "heartbeat_summary",
    "live_at",
    "saturating_add",
    "saturating_mul",
    "saturating_sub",
    "sql_ident",
    "state_agg",
    "state_at",
    "state_rollup",
    "state_timeline",
    "stats_agg",
    "stats_rollup",
    "time_bucket",
    "time_bucket_gapfill",
    "topn",
]
