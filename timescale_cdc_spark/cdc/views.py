"""Filtered-projection views over the event log — stream routing.

Reference parity: ``cdc.event_log_assets`` (init.sql:75-84) is a
7-column SELECT of the log filtered to one captured table, giving the
1:1 view↔topic mapping (readme.md:270-272). Catalyst inlines temp
views into the consuming plan, so a query over a view compiles to a
filtered scan of the log — exactly Postgres' view rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timescale_cdc_spark.cdc.log import ENVELOPE_COLS, EventLog


def event_log_view(
    log_df: DataFrame, schema_name: str, table_name: str
) -> DataFrame:
    """The A11/A12/A13 composition: conjunctive equality filter +
    explicit envelope projection (init.sql:76-84)."""
    return log_df.filter(
        (F.col("schema_name") == schema_name) & (F.col("table_name") == table_name)
    ).select(*ENVELOPE_COLS)


def register_table_views(
    log: EventLog, tables: list[tuple[str, str]], prefix: str = "event_log"
) -> dict[str, DataFrame]:
    """Register one temp view per captured table, named
    ``{prefix}_{table}`` (the reference's cdc.event_log_assets naming).
    Returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    base = log.read()
    base.createOrReplaceTempView(prefix)
    for schema_name, table_name in tables:
        name = f"{prefix}_{table_name}"
        view = event_log_view(base, schema_name, table_name)
        view.createOrReplaceTempView(name)
        out[name] = view
    return out
