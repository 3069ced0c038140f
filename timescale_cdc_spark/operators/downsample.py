"""Time-series downsampling: Timescale toolkit ``lttb`` (largest
triangle, three buckets — Steinarsson 2013) per series, the standard
"shrink 10M points to 1k for a dashboard without losing the shape"
operator over hypertable-shaped data (reference hypertables
init.sql:69-72 exist to serve exactly these dashboard reads).

Execution shape: LTTB is inherently sequential WITHIN a series (each
bucket's pick depends on the previous pick), so the honest Spark
mapping is one Arrow batch per series via ``applyInPandas`` — series
are independent, so the operator scales horizontally with the number
of series (the dashboard case: thousands of devices × bounded points
each). A single series must fit in one executor's memory; for a
series too large for that, thin FIRST with the M4 pre-pass
(:func:`m4_downsample` — pure JVM min/max/first/last per pixel
bucket, no Python), which is the standard visual-fidelity reduction
and preserves exactly the extremes LTTB would almost surely pick.

This is the repo's one deliberate applyInPandas operator family —
vectorized numpy inside (no per-row Python), Arrow-batched transfer,
and the groupBy key is the series key so the shuffle is the minimal
one-pass repartition any per-series algorithm needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timescale_cdc_spark.functions.hyper import epoch_bucket


def lttb_numpy(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices LTTB keeps for one series already sorted by ``x``.

    Canonical algorithm: always keep the first and last point; split
    the interior into ``n_out - 2`` equal-count buckets; walk the
    buckets left to right keeping, per bucket, the point forming the
    largest triangle with the PREVIOUSLY KEPT point and the average
    of the NEXT bucket. Pure numpy (one vectorized area computation
    per bucket); deterministic (ties break to the earliest point, via
    argmax)."""
    n = len(x)
    if n_out >= n:
        return np.arange(n)
    if n_out < 3:
        raise ValueError("lttb needs n_out >= 3")
    # interior bucket boundaries: n_out-2 equal-count slices of [1, n-1)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    keep = np.empty(n_out, dtype=np.int64)
    keep[0] = 0
    keep[-1] = n - 1
    a = 0  # index of the previously kept point
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        # average of the NEXT bucket (or the final point for the last)
        nlo, nhi = (edges[i + 1], edges[i + 2]) if i < n_out - 3 else (
            n - 1,
            n,
        )
        ax, ay = x[a], y[a]
        bx, by = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        cx, cy = x[lo:hi], y[lo:hi]
        area = np.abs((ax - bx) * (cy - ay) - (ax - cx) * (by - ay))
        a = lo + int(np.argmax(area))
        keep[i + 1] = a
    return keep


def lttb(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    n_out: int,
) -> DataFrame:
    """Timescale toolkit ``lttb(ts, value, n_out)`` per series: keep
    ``n_out`` visually representative points (always including the
    first and last), ordered deterministically by (ts, value).

    Returns ``key_cols + [ts_col, value_col]`` — a strict subset of
    the input's rows per series.
    """
    if n_out < 3:
        raise ValueError("lttb needs n_out >= 3")
    fields = [df.schema[c] for c in key_cols] + [
        df.schema[ts_col],
        T.StructField(value_col, T.DoubleType()),
    ]
    out_schema = T.StructType(fields)

    def _one_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
        x = pdf[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        idx = lttb_numpy(x, y, n_out)
        return pdf.iloc[idx][[c.name for c in fields]]

    projected = df.select(
        *key_cols, ts_col, F.col(value_col).cast("double").alias(value_col)
    )
    return projected.groupBy(*key_cols).applyInPandas(
        _one_series, schema=out_schema
    )


def m4_downsample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    width: str,
) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per (series, pixel
    bucket) keep the rows achieving min(v), max(v), first(ts),
    last(ts) — the four points that make a line rendering of the
    bucket pixel-exact. Pure JVM aggregation (one exchange, min_by/
    max_by), no Python — so it serves directly at any scale, and as
    the pre-thinning pass for :func:`lttb` on series too large for
    one Arrow batch.

    Returns distinct kept rows (a bucket's extremes may coincide),
    with ``bucket`` retained for provenance.
    """
    eb = epoch_bucket(ts_col, width)
    base = df.select(
        *key_cols,
        eb,
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    agg = base.groupBy(*key_cols, "_eb").agg(
        F.min_by(F.struct("_ts", "_v"), F.struct("_us", "_v")).alias("_first"),
        F.max_by(F.struct("_ts", "_v"), F.struct("_us", "_v")).alias("_last"),
        F.min_by(F.struct("_ts", "_v"), F.struct("_v", "_us")).alias("_min"),
        F.max_by(F.struct("_ts", "_v"), F.struct("_v", "_us")).alias("_max"),
    )
    kept = agg.select(
        *key_cols,
        F.timestamp_seconds("_eb").alias("bucket"),
        F.explode(
            F.array_distinct(
                F.array("_first", "_last", "_min", "_max")
            )
        ).alias("_p"),
    )
    return kept.select(
        *key_cols,
        "bucket",
        F.col("_p._ts").alias(ts_col),
        F.col("_p._v").alias(value_col),
    )
