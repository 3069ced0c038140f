"""External sources (SURVEY.md §2 B12-B13, B1; north star: 'Structured
Streaming + Postgres CDC source').

- postgres_cdc.py — JDBC incremental source with timestamp+incrementing
  semantics (the Aiven connector's polling contract, re-owned natively)
- kafka.py — Kafka source/sink wrappers, gated behind the kafka jars
  (not present in this container)

File-based sources (parquet/CSV/JSON incl. the NANOS-timestamp escape
hatch) live in catalog.py / queries/functions_surface.py.
"""

from timescale_cdc_spark.sources.postgres_cdc import (
    PostgresCdcSource,
    build_incremental_query,
)

__all__ = ["PostgresCdcSource", "build_incremental_query"]
