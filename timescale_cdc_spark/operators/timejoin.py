"""Time-series join operators Spark lacks natively (SURVEY.md §2
B22/B23): bucketed range join and as-of join, as compositions of
built-in ops (the sanctioned order: compose before UDF, SURVEY §2 B40).

Scale design: a naive range join with no equi key is a nested-loop
cross product. Bucketing ts to the tolerance width converts it into an
equi-join on the bucket id (each left row probes its bucket ±1), which
Spark executes as a hash join — candidate pairs are bounded by bucket
occupancy, not |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int,
    extra_on: Column | None = None,
) -> DataFrame:
    """All (left, right) pairs with |right_ts - left_ts| ≤ tolerance —
     'anomaly events within ±5 min of an asset change'
    (Timescale-idiomatic, SURVEY B22).

    Both sides get a bucket id = floor(epoch/tolerance); the right side
    explodes to (b-1, b, b+1) so every qualifying pair shares a bucket
    key; the exact range predicate filters residuals after the hash
    join. ``extra_on`` adds an optional equi-conjunct (e.g. sensor id).
    """
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / tolerance_seconds)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / tolerance_seconds)
    l = left.withColumn("_bucket", lb)
    r = right.withColumn(
        "_bucket",
        F.explode(F.array(rb - 1, rb, rb + 1)),
    )
    cond = (l["_bucket"] == r["_bucket"]) & (
        F.abs(
            F.unix_timestamp(l[left_ts]) - F.unix_timestamp(r[right_ts])
        )
        <= tolerance_seconds
    )
    if extra_on is not None:
        cond = cond & extra_on
    return l.join(r, cond).drop("_bucket")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    left_id: str = None,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, the single latest right row with
    right_ts <= left_ts (direction='backward'; 'forward' for the
    earliest ≥) sharing the ``on`` key — pandas' merge_asof semantics,
    the 'state as of T' reconstruction (SURVEY B23, readme.md:214-220).

    Composition: equi-join on the key + the inequality as a residual,
    then row_number over (left row id) ordered by right_ts keeps
    exactly one match. ``left_id`` must uniquely identify left rows
    (defaults to ``left_ts``+``on``, valid when that pair is unique).
    One shuffle on the key; no driver involvement.
    """
    l = left.alias("l")
    r = right.alias("r")
    if direction == "backward":
        resid = F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")
        order = [F.desc(f"r.{right_ts}")]
    elif direction == "forward":
        resid = F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")
        order = [F.asc(f"r.{right_ts}")]
    else:
        raise ValueError(f"unknown direction: {direction!r}")
    if tiebreak:
        order.append(
            F.desc(f"r.{tiebreak}") if direction == "backward" else F.asc(f"r.{tiebreak}")
        )

    joined = l.join(
        r, (F.col(f"l.{on}") == F.col(f"r.{on}")) & resid, "left"
    )
    part = (
        [F.col(f"l.{left_id}")]
        if left_id
        else [F.col(f"l.{on}"), F.col(f"l.{left_ts}")]
    )
    w = Window.partitionBy(*part).orderBy(*order)
    picked = joined.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(f"right_{c}") for c in right_cols
    ]
    return picked.select(*out_cols)
