"""Engine function helpers — Timescale-flavored sugar over built-in
Spark functions (SURVEY.md §4: the only 'custom function' the
reference surface motivates is time_bucket, a one-line wrapper)."""

from timescale_cdc_spark.functions.ident import sql_ident
from timescale_cdc_spark.functions.time import time_bucket

__all__ = ["sql_ident", "time_bucket"]
