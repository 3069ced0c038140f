"""Query registry package. Importing this package populates
QUERIES/ORACLES from every query module (the driver contract in
__spark_entry__.py reads them verbatim)."""

from timescale_cdc_spark.queries.base import ORACLES, QUERIES, register

# Populate the registry (import order = registry order).
from timescale_cdc_spark.queries import relational  # noqa: E402,F401
from timescale_cdc_spark.queries import functions_surface  # noqa: E402,F401
from timescale_cdc_spark.queries import cdc_queries  # noqa: E402,F401
from timescale_cdc_spark.queries import llm_queries  # noqa: E402,F401
from timescale_cdc_spark.queries import extras  # noqa: E402,F401
from timescale_cdc_spark.queries import sql_surface  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
