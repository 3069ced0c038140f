"""Stream-stream joins over CDC topic streams (SURVEY.md §2 B47
extension): correlate two live change streams — e.g. match each
sensor reading with maintenance events on the same asset shortly
before it — without landing either stream first. The reference's
consumers do this as a batch join after Kafka landing
(readme.md:124-126); Structured Streaming does it online with
bounded state.

Scale shape: a watermark on BOTH inputs plus a two-sided event-time
bound on the join condition is what lets Spark evict join state —
without them the state store grows without bound and a 100 TB/day
stream OOMs its executors. The join itself is a key-partitioned
stateful equi-join: each side shuffles on the equality keys once and
state lives with the key's partition, so throughput scales with
executors like any other keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two (streaming or batch) frames on equality keys where the
    right event happened in ``(left_ts - lookback, left_ts]`` — the
    streaming analogue of the bounded as-of/range join
    (operators/timejoin.py), with watermark-driven state eviction.

    ``left_ts``/``right_ts`` must be distinct column names (rename
    before calling if both streams call it ``ts``), and so must every
    non-key column across the two sides — the output carries both
    sides' columns by name, so a shared name would make downstream
    by-name selection ambiguous. Both conditions raise up front. The
    equality ``on`` keys are deduplicated to a single output column.
    Batch frames pass through the same plan minus the watermarks, so
    the semantics are oracle-testable in batch mode.
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct column names "
            f"(both are {left_ts!r}); rename one side first"
        )
    clash = (set(left.columns) & set(right.columns)) - set(on)
    if clash:
        raise ValueError(
            "non-key columns shared by both sides would produce "
            f"ambiguous duplicate output columns: {sorted(clash)}; "
            "rename or drop them on one side first"
        )
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    l, r = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    joined = l.join(r, cond, how)
    # keep one copy of each equality key (they are identical by the
    # join condition; outer joins null the missing side's copy)
    keep_keys = [F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in on]
    l_rest = [F.col(f"l.{c}") for c in left.columns if c not in on]
    r_rest = [F.col(f"r.{c}") for c in right.columns if c not in on]
    return joined.select(*keep_keys, *l_rest, *r_rest)
