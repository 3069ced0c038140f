"""Log replay: reconstruct table state from the change stream.

The reference's event log is explicitly "a replayable record of all
changes" (readme.md:214-220); these are the two canonical folds:

- ``latest_state`` (B30): last event per PK wins; rows whose last op
  is DELETE vanish; the surviving ``after`` JSON is materialized into
  typed columns via from_json (per-table schema, SURVEY §7 hard
  part 2).
- ``state_as_of`` (B23): same fold over events with ts <= T — row
  state as of an instant, the hypertable time-travel query.

Scale: one shuffle on the PK for the window; the from_json projection
is JVM-side codegen. No driver collection anywhere. At 100 TB the
window's partition key (the PK) is high-cardinality → even spread.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _last_event_per_key(log: DataFrame, key_expr: Column) -> DataFrame:
    w = Window.partitionBy(key_expr).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return log.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)


def latest_state(
    table_log: DataFrame,
    pk_json_path: str,
    row_schema: T.StructType,
) -> DataFrame:
    """Fold a single table's event slice into its current state.

    ``pk_json_path`` is the PK field inside the after/before JSON
    (e.g. ``"id"``). Last event per PK wins (ts DESC, event_id DESC —
    the composite order the reference's polling relies on,
    readme.md:266-267); DELETE rows drop out; survivors materialize
    ``after``.
    """
    key = F.coalesce(
        F.get_json_object("after", f"$.{pk_json_path}"),
        F.get_json_object("before", f"$.{pk_json_path}"),
    )
    last = _last_event_per_key(table_log, key)
    return (
        last.filter(F.col("operation") != "DELETE")
        .select(F.from_json("after", row_schema).alias("row"))
        .select("row.*")
    )


def state_as_of(
    table_log: DataFrame,
    pk_json_path: str,
    row_schema: T.StructType,
    as_of: str | Column,
) -> DataFrame:
    """Row state as of time T: replay only events with ts <= T.
    With a date-partitioned log the ts predicate prunes partitions
    before the window runs."""
    ts = F.lit(as_of).cast("timestamp") if isinstance(as_of, str) else as_of
    return latest_state(table_log.filter(F.col("ts") <= ts), pk_json_path, row_schema)


def replay_table(
    table_log: DataFrame,
    pk_json_path: str,
    row_schema: T.StructType,
    as_of: str | Column | None = None,
) -> DataFrame:
    """Convenience wrapper: latest_state or state_as_of."""
    if as_of is None:
        return latest_state(table_log, pk_json_path, row_schema)
    return state_as_of(table_log, pk_json_path, row_schema, as_of)
