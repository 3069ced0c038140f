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


def _exact_int_sum(a: np.ndarray) -> int:
    """Exact integer sum of an int array without int64 wraparound:
    each value splits as ``(v >> 32) * 2**32 + (v & 0xFFFFFFFF)``
    (holds for negatives under arithmetic shift / two's-complement),
    the halves sum safely inside int64 (high ≈ value/2^32 per
    element, low < 2^32 per element), and a Python int recombines
    them — vectorized, overflow-free up to ~2^31 elements."""
    a = a.astype(np.int64, copy=False)
    hi = int((a >> 32).sum())
    lo = int((a & np.int64(0xFFFFFFFF)).sum())
    return (hi << 32) + lo


def lttb_numpy(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices LTTB keeps for one series already sorted by ``x``.

    Canonical algorithm: always keep the first and last point; split
    the interior into ``n_out - 2`` equal-count buckets; walk the
    buckets left to right keeping, per bucket, the point forming the
    largest triangle with the PREVIOUSLY KEPT point and the average
    of the NEXT bucket. Pure numpy (one vectorized area computation
    per bucket); deterministic (ties break to the earliest point, via
    argmax).

    CROSS-ENGINE DETERMINISM (round 14, the DuckDB-oracle contract):
    the selection is pinned to an exactly reproducible arithmetic so
    a SQL engine walking the same spec picks the same points:

    * bucket edges are EXACT integers —
      ``edges[j] = 1 + (j * (n - 2)) // (n_out - 2)`` — not a float
      linspace (same equal-count grid, no float-truncation ambiguity);
    * the next-bucket AVERAGE never divides: the triangle area is
      scaled through by the bucket count ``cn`` (a per-bucket positive
      constant — argmax-invariant), so the only inputs are the bucket
      SUMS. When ``x``/``y`` are integer dtypes those sums are exact,
      and every double op below is a single correctly-rounded IEEE
      step in a FIXED order:
      ``|(ax*cn - sum_x)*(cy - ay) - (ax - cx)*(sum_y - cn*ay)|`` —
      bit-identical in any IEEE-754 engine evaluating the same
      expression tree (numpy ufuncs and DuckDB both materialize each
      binary op; neither fuses).
    Float inputs remain supported (generic use); exactness of the
    sums — and thus cross-engine bit-parity — is only guaranteed for
    integer inputs, which is what :func:`lttb` feeds."""
    n = len(x)
    if n_out >= n:
        return np.arange(n)
    if n_out < 3:
        raise ValueError("lttb needs n_out >= 3")
    # interior bucket boundaries: n_out-2 equal-count slices of [1, n-1)
    j = np.arange(n_out - 1, dtype=np.int64)
    edges = 1 + (j * (n - 2)) // (n_out - 2)
    xs = x.astype(np.float64)
    ys = y.astype(np.float64)
    keep = np.empty(n_out, dtype=np.int64)
    keep[0] = 0
    keep[-1] = n - 1
    a = 0  # index of the previously kept point
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        # the NEXT bucket (or the final point alone for the last)
        nlo, nhi = (edges[i + 1], edges[i + 2]) if i < n_out - 3 else (
            n - 1,
            n,
        )
        cn = float(nhi - nlo)
        # EXACT bucket sums, then one conversion to double — mirrors
        # SQL SUM(HUGEINT) + CAST. For integer inputs the sum goes
        # through _exact_int_sum (split 32-bit halves, recombined as
        # a Python int): a straight int64 .sum() silently WRAPS once
        # bucket_size × |values| passes 2^63 — ~5200 µs-epoch
        # timestamps per bucket, i.e. series beyond ~510k points at
        # n_out=100 — and the oracle's HUGEINT sums would not.
        if x.dtype.kind in "iu":
            sxn = float(_exact_int_sum(x[nlo:nhi]))
        else:
            sxn = float(x[nlo:nhi].sum())
        if y.dtype.kind in "iu":
            syn = float(_exact_int_sum(y[nlo:nhi]))
        else:
            syn = float(y[nlo:nhi].sum())
        ax, ay = xs[a], ys[a]
        t1 = ax * cn - sxn
        t3 = syn - cn * ay
        area = np.abs(t1 * (ys[lo:hi] - ay) - (ax - xs[lo:hi]) * t3)
        a = int(lo) + int(np.argmax(area))
        keep[i + 1] = a
    return keep


def lttb(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    n_out: int,
    sel_decimals: int = 6,
) -> DataFrame:
    """Timescale toolkit ``lttb(ts, value, n_out)`` per series: keep
    ``n_out`` visually representative points (always including the
    first and last), ordered deterministically by (ts, value).

    Returns ``key_cols + [ts_col, value_col]`` — a strict subset of
    the input's rows per series.

    The SELECTION runs on an exact integer grid — (µs timestamps,
    value quantized to ``sel_decimals`` decimal places via
    ``floor(v * 10^d + 0.5)``) — so the picked point set is
    bit-reproducible by any IEEE engine walking the same spec (the
    driver's DuckDB oracle does, round 14). Emitted values are the
    UNTOUCHED input doubles; quantization only disambiguates the
    triangle-area argmax, visually sub-pixel at any plausible
    ``sel_decimals``. Pass ``sel_decimals=None`` to select on raw
    doubles (single-engine use)."""
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
        if sel_decimals is not None:
            # floor(v*10^d + 0.5), NOT rint: half-to-even vs
            # half-away must not differ between engines
            y = np.floor(y * float(10.0 ** sel_decimals) + 0.5).astype(
                np.int64
            )
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


def asap_params(
    y: np.ndarray, max_window: int | None = None
) -> tuple[int, float, float]:
    """Window search for one series (ASAP — Rong & Bailis, VLDB'17):
    pick the moving-average window that MINIMIZES roughness (std of
    the smoothed series' first differences) while PRESERVING kurtosis
    (smoothed kurtosis >= original — the paper's guard against
    smoothing away real spikes). Candidates are the autocorrelation
    peak lags (periodicity-aligned windows smooth without phase
    artifacts) plus a sqrt-spaced fallback grid. Returns (window,
    roughness, original kurtosis). Pure numpy, deterministic."""
    n = len(y)
    if n < 4:
        return 1, 0.0, 0.0

    def _kurt(v: np.ndarray) -> float:
        m = v.mean()
        d = v - m
        m2 = float((d * d).mean())
        if m2 <= 1e-30:
            return 0.0
        return float((d ** 4).mean() / (m2 * m2))

    def _rough(v: np.ndarray) -> float:
        return float(np.diff(v).std()) if len(v) > 1 else 0.0

    def _sma(v: np.ndarray, w: int) -> np.ndarray:
        c = np.cumsum(np.concatenate(([0.0], v)))
        return (c[w:] - c[:-w]) / w

    max_w = max_window or max(2, n // 10)
    # ACF via FFT over the mean-removed series
    d = y - y.mean()
    f = np.fft.rfft(d, 2 * n)
    acf = np.fft.irfft(f * np.conj(f))[:n].real
    if acf[0] > 0:
        acf = acf / acf[0]
    # interior local maxima of the ACF within [2, max_w]
    cand = [
        lag
        for lag in range(2, min(max_w, n - 2))
        if acf[lag] > acf[lag - 1] and acf[lag] >= acf[lag + 1]
        and acf[lag] > 0.2
    ]
    # sqrt-spaced fallback grid so aperiodic series still search
    grid = {max(2, int(round((i / 10.0) ** 2 * max_w))) for i in
            range(1, 11)}
    cands = sorted({c for c in [*cand, *grid, 2] if 2 <= c <= max_w})
    orig_kurt = _kurt(y)
    best_w, best_r = 1, _rough(y)
    for w in cands:
        sm = _sma(y, w)
        if _kurt(sm) >= orig_kurt and _rough(sm) < best_r:
            best_w, best_r = w, _rough(sm)
    return best_w, best_r, orig_kurt


def asap_smooth(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    resolution: int = 800,
) -> DataFrame:
    """Timescale toolkit ``asap_smooth(ts, value, resolution)`` per
    series: automatically-chosen moving average for a smooth,
    outlier-preserving dashboard rendering at ~``resolution`` points.

    Per the paper's pixel-aware optimization, a series longer than
    ``2 * resolution`` is first mean-aggregated into ``2 *
    resolution`` equal-count buckets (vectorized), then the ASAP
    window search runs on the reduced series and the chosen SMA is
    emitted at window-center timestamps.

    Same execution shape (and the same honest caveat) as
    :func:`lttb`: sequential within a series → one Arrow batch per
    series via applyInPandas, scaling with the number of series;
    pre-thin with :func:`m4_downsample` first if one series exceeds
    executor memory."""
    fields = [df.schema[c] for c in key_cols] + [
        df.schema[ts_col],
        T.StructField(value_col, T.DoubleType()),
    ]
    out_schema = T.StructType(fields)
    names = [c.name for c in fields]

    def _one_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
        x = pdf[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(y)
        m = 2 * resolution
        if n > m:
            # equal-count bucket means (vectorized bincount)
            idx = (np.arange(n) * m) // n
            cnt = np.bincount(idx, minlength=m)
            y = np.bincount(idx, weights=y, minlength=m) / cnt
            x = (np.bincount(idx, weights=x.astype(np.float64),
                             minlength=m) / cnt).astype(np.int64)
        w, _, _ = asap_params(y)
        sm = (
            y
            if w <= 1
            else np.convolve(y, np.full(w, 1.0 / w), mode="valid")
        )
        cx = x if w <= 1 else (
            (np.cumsum(np.concatenate(([0.0], x.astype(np.float64))))[w:]
             - np.cumsum(np.concatenate(([0.0], x.astype(np.float64))))[:-w]
             ) / w
        ).astype(np.int64)
        out = pd.DataFrame({
            ts_col: pd.to_datetime(cx, unit="us"),
            value_col: sm,
        })
        for c in key_cols:
            out[c] = pdf[c].iloc[0]
        return out[names]

    projected = df.select(
        *key_cols, ts_col, F.col(value_col).cast("double").alias(value_col)
    )
    return projected.groupBy(*key_cols).applyInPandas(
        _one_series, schema=out_schema
    )
