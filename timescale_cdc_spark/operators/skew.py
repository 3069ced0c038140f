"""Skew mitigation (SURVEY.md 'Partitioning & shuffle': salting for
skew). AQE's skew-join splitting (enabled in session.py) handles most
cases at runtime; explicit salting remains the tool when one join key
dominates so heavily that even split partitions bottleneck, or when
AQE statistics are unavailable (streaming foreachBatch).

``salted_join``: replicate the small side R times; spread the big
side's hot rows across R salt buckets. The join key becomes
(key, salt) — each hot key's rows land on R different reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with R-way salting.

    The big side gets a deterministic pseudo-random salt derived from
    its full row hash (spreads a hot key evenly without an RNG — keeps
    the plan deterministic/replayable); the small side is exploded
    R-fold so every (key, salt) pair finds its match. Small-side
    replication costs R×|small| — only use when |small| ≪ |big|,
    which is exactly the skewed-dimension case.
    """
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_salted, [on, "_salt"], how)
    return out.drop("_salt")


def key_histogram(df: DataFrame, on: str, top: int = 20) -> DataFrame:
    """Skew diagnostic: row count of the hottest keys — run this before
    choosing between AQE, salting, or broadcast."""
    return (
        df.groupBy(on)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .limit(top)
    )
