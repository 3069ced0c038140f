"""The SQL entry point (SURVEY.md §3 EP3): the reference's operating
model is 'query the log with any Postgres client' (readme.md:107-121);
our engine's equivalent is spark.sql over registered views
(catalog.register_views). This query runs ONE ANSI-SQL text through
BOTH engines — Spark executes it verbatim, DuckDB is the oracle — so
the SQL surface itself (not just the DataFrame API) is parity-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from timescale_cdc_spark.catalog import register_views
from timescale_cdc_spark.queries.base import register

#: ANSI SQL valid in both Spark SQL and DuckDB, byte-identical.
PORTABLE_SQL = """
WITH g AS (
  SELECT n_name,
         date_trunc('year', o_orderdate) AS order_year,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
         COUNT(*) AS n_orders
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, date_trunc('year', o_orderdate)
)
SELECT n_name, order_year, total_price, n_orders,
       ROW_NUMBER() OVER (PARTITION BY order_year
                          ORDER BY total_price DESC, n_name) AS yr_rank
FROM g
WHERE n_orders >= 2
"""


@register("sql_surface_portable", PORTABLE_SQL)
def sql_surface_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 SQL read path: register fixture views, run the identical
    ANSI text Spark-side that DuckDB runs as oracle. Catalyst's parse→
    analyze→optimize on SQL text lands on the same physical plan as
    the DataFrame API (SURVEY §3)."""
    register_views(spark, sf_dir)
    return spark.sql(PORTABLE_SQL)
