"""timescale_cdc_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the carlospsikick/timescale-cdc
reference (a TimescaleDB→Kafka CDC pipeline; see SURVEY.md).

The engine re-expresses the reference's CDC semantics — change capture
(reference: timescale/init.sql:11-38), append-only event log
(init.sql:41-72), filtered view routing (init.sql:75-84), incremental
polling (connectors/cdc-timescale-connector.json:9-15) — as idiomatic
Spark: DataFrame/SQL for the relational surface, Structured Streaming
for delivery, Parquet date-partitioning for hypertable chunking.
"""

from timescale_cdc_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
