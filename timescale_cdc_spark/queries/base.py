"""Query registry: one (PySpark callable, DuckDB oracle SQL) pair per
operator in SURVEY.md §2. The driver's harness (__spark_entry__.py)
reads QUERIES/ORACLES verbatim.

Determinism conventions (so the driver's order-insensitive value hash
matches bit-exact):

* Money aggregates go through DECIMAL: fixture doubles are exactly
  2-dp (verified), so ``CAST(x AS DECIMAL(18,2))`` is lossless, decimal
  sums are exact in both engines, and the final ``CAST(... AS DOUBLE)``
  of an identical exact decimal yields identical bits.
* Averages = exact decimal sum cast to double, divided by count —
  one IEEE division of identical operands on both sides.
* Top-K / ranking queries order by (rounded score, id) with
  ``row_number`` so ties break identically in both engines.
* Every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from timescale_cdc_spark.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name``; ``oracle`` is DuckDB-dialect SQL
    over the pre-registered fixture views (None → rows-only check for
    genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Shorthand fixture-table loader used by query functions."""
    return load_table(spark, sf_dir, name)


def scratch_path(sf_dir: str, name: str) -> str:
    """Local scratch path for registered queries that materialize an
    index/sink as part of their plan. Keyed by (sf, pid): the scratch
    artifact is rebuilt on every call (each site rmtree's first), so
    cross-process reuse never happens anyway — and without the pid a
    concurrent run at the same sf (pytest alongside the driver's
    verify, or two driver phases overlapping) rmtree's the other
    process's in-flight build mid-read."""
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        "timescale_cdc_spark_io",
        os.path.basename(sf_dir.rstrip("/")),
        f"pid{os.getpid()}",
        name,
    )


# Reusable Spark SQL expression fragments (DataFrame .selectExpr /
# F.expr side) mirrored by identical DuckDB fragments in oracles.
DEC_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
DEC_DISC = "CAST(l_discount AS DECIMAL(3,2))"
REVENUE_EXPR = f"{DEC_PRICE} * (CAST(1.00 AS DECIMAL(3,2)) - {DEC_DISC})"
