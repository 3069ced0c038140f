"""Query registry package. Importing this package populates
QUERIES/ORACLES from every query module (the driver contract in
__spark_entry__.py reads them verbatim)."""

from timescale_cdc_spark.queries.base import ORACLES, QUERIES, register

# Populate the registry (import order = registry order). Round 2: the
# registry is consolidated to exactly 50 entries — one per SURVEY §2
# operator family — so EVERY entry lands inside the driver's
# correctness window (round 1 registered 80 and the driver evaluated
# only the first 50, leaving all Tier C entries without a hard
# correctness signal).
from timescale_cdc_spark.queries import relational  # noqa: E402,F401
from timescale_cdc_spark.queries import functions_surface  # noqa: E402,F401
from timescale_cdc_spark.queries import cdc_queries  # noqa: E402,F401
from timescale_cdc_spark.queries import llm_queries  # noqa: E402,F401
from timescale_cdc_spark.queries import sql_surface  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
