"""Change capture: derive INSERT/UPDATE/DELETE events and build the
envelope — the batch form of the reference's row-level triggers.

Reference parity:
- ``cdc.change_data_capture()`` (init.sql:11-22) and its hypertable
  variant (init.sql:25-38) fire per-row and append
  ``(NOW(), TG_TABLE_SCHEMA, TG_TABLE_NAME, TG_OP, row_to_json(OLD),
  row_to_json(NEW))`` to ``cdc.event_log``.
- Spark has no triggers; the equivalent source of changes is a
  snapshot pair (batch) or a change feed (streaming). ``snapshot_diff``
  derives the op set from two snapshots with ONE full-outer join on
  the primary key; ``cdc_transform`` serializes to the envelope with
  ``to_json(struct(...))`` ≙ ``row_to_json`` (init.sql:18,34).

Scale: the full-outer join shuffles both snapshots on the PK — the
minimum possible data movement for a diff. At 100 TB both sides are
bucketed/partitioned by PK so the join is co-located; nothing here
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: TG_OP values captured by the reference (init.sql:16).
INSERT, UPDATE, DELETE = "INSERT", "UPDATE", "DELETE"


def _row_struct(df: DataFrame, cols: list[str], side: str) -> Column:
    return F.struct(*[F.col(f"{side}.{c}").alias(c) for c in cols])


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk: list[str] | str,
) -> DataFrame:
    """Diff two snapshots of a table into change rows.

    Returns one row per changed PK with columns:
    ``operation`` (INSERT|UPDATE|DELETE), ``before`` (struct of the old
    row, NULL on INSERT), ``after`` (struct of the new row, NULL on
    DELETE). Unchanged rows produce no event — same as a row trigger
    that never fires.
    """
    pk_cols = [pk] if isinstance(pk, str) else list(pk)
    data_cols = old.columns
    if new.columns != data_cols:
        raise ValueError(
            f"snapshot column mismatch: old={data_cols} new={new.columns}"
        )

    o, n = old.alias("o"), new.alias("n")
    cond = [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in pk_cols]
    joined = o.join(n, cond, "full_outer")

    old_present = F.col(f"o.{pk_cols[0]}").isNotNull()
    new_present = F.col(f"n.{pk_cols[0]}").isNotNull()
    before = _row_struct(joined, data_cols, "o")
    after = _row_struct(joined, data_cols, "n")

    operation = (
        F.when(~old_present, F.lit(INSERT))
        .when(~new_present, F.lit(DELETE))
        .when(~before.eqNullSafe(after), F.lit(UPDATE))
        .otherwise(F.lit(None))
    )

    return (
        joined.select(
            operation.alias("operation"),
            F.when(old_present, before).alias("before"),
            F.when(new_present, after).alias("after"),
        )
        .filter(F.col("operation").isNotNull())
    )


def cdc_transform(
    old: DataFrame,
    new: DataFrame,
    pk: list[str] | str,
    schema_name: str,
    table_name: str,
    capture_ts: Column | None = None,
) -> DataFrame:
    """Snapshot pair → event-log envelope rows (no event_id yet —
    EventLog.append assigns it, like the sequence default
    init.sql:59).

    Envelope: (ts, schema_name, table_name, operation, before, after)
    with before/after as JSON strings via ``to_json(struct(...))``
    (≙ row_to_json, init.sql:18,34); NULL rules per readme.md:252-267.
    ``capture_ts`` defaults to current_timestamp() (≙ NOW(),
    init.sql:18) — pass a deterministic column in tests.
    """
    diff = snapshot_diff(old, new, pk)
    ts = capture_ts if capture_ts is not None else F.current_timestamp()
    return diff.select(
        ts.alias("ts"),
        F.lit(schema_name).alias("schema_name"),
        F.lit(table_name).alias("table_name"),
        F.col("operation"),
        F.to_json("before").alias("before"),
        F.to_json("after").alias("after"),
    )


def changes_to_envelope(
    changes: DataFrame,
    op_col: str,
    schema_name: str,
    table_name: str,
    ts_col: str,
    data_cols: list[str],
) -> DataFrame:
    """Row-stream form (A1/A2 streaming shape): a DataFrame of change
    rows that already carry an operation + timestamp column becomes
    envelope rows. ``before`` is NULL except on DELETE, ``after`` NULL
    on DELETE — the single-row-visibility a trigger has (OLD is only
    available for UPDATE in trigger context when the source provides
    it; a pure event stream carries the new image).
    """
    row = F.struct(*[F.col(c) for c in data_cols])
    return changes.select(
        F.col(ts_col).alias("ts"),
        F.lit(schema_name).alias("schema_name"),
        F.lit(table_name).alias("table_name"),
        F.col(op_col).alias("operation"),
        F.when(F.col(op_col) == DELETE, F.to_json(row)).alias("before"),
        F.when(F.col(op_col) != DELETE, F.to_json(row)).alias("after"),
    )
