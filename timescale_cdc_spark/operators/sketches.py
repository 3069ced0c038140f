"""Approximate/sketch aggregations (SURVEY.md §2 B26 family depth):
the bounded-memory summaries an analytics engine runs where exact
answers would shuffle the world.

All three are built-in Spark sketches (JVM-side, mergeable partials —
the property that makes them scale: each executor summarizes its
partitions and only sketch bytes move):

- ``approx_distinct_by``: HyperLogLog++ distinct counts per group
  (`approx_count_distinct`), rsd-tunable.
- ``approx_quantiles``: Greenwald-Khanna quantile summaries
  (`percentile_approx`), error bounded by 1/accuracy.
- ``frequent_items``: the heavy-hitters sketch (`df.stat.freqItems`).

Bloom-filter join pruning is NOT wrapped here: Spark 4 applies it
automatically session-wide (runtime.bloomFilter.enabled, session.py)
and its SQL surface (bloom_filter_agg/might_contain) is internal-only
— a Python-side probe would be a row-at-a-time UDF, the forbidden
path.

Rows-only by nature (sketch internals are engine-specific — same
status as the HLL note in VERDICT r1); the tests bound the error
against exact answers instead of an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.05
) -> DataFrame:
    """HLL++ distinct ``value_col`` per group; relative standard
    deviation ``rsd`` trades sketch size for accuracy."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct"),
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles, optionally per group.
    Rank error ≤ 1/accuracy of the row count."""
    agg = F.percentile_approx(
        value_col, list(probabilities), accuracy
    ).alias("quantiles")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def frequent_items(
    df: DataFrame, cols: list[str], support: float = 0.01
) -> DataFrame:
    """Heavy hitters: items appearing in more than ``support`` fraction
    of rows (may include false positives — the sketch contract)."""
    return df.stat.freqItems(cols, support)


