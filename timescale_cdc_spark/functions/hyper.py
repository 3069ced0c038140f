"""Timescale hyperfunction analogs over hypertable-shaped data:
``time_bucket_gapfill`` + ``locf`` + ``interpolate``, per-bucket
time-weighted average, and first/last-by-time — the standard
TimescaleDB query patterns over the hypertables the reference creates
(init.sql:69-72; readme.md:220 motivates hypertables precisely for
this bucketed time-series querying).

Everything is plain DataFrame/window composition — no UDFs, no
collect. The dense bucket grid is keys × sequence(min..max bucket),
built from a one-row global-bounds aggregate broadcast into a cross
join (O(1) rows on the build side at any scale); gap filling is a
left join onto that grid; LOCF/interpolation are ignore-nulls window
functions riding one per-key exchange.

Determinism (driver hash-parity) follows queries/base.py conventions:
value sums go through DECIMAL (exact), time weights are exact integer
microseconds, and each final double is produced by one IEEE op on
identical operands in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timescale_cdc_spark.functions.time import bucket_seconds


def epoch_bucket(ts: Column | str, width: str) -> Column:
    """Epoch-aligned bucket start as a LONG epoch-second value
    (``time_bucket`` minus the timestamp conversion — the join/series
    key for gapfill grids)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    secs = bucket_seconds(width)
    return (F.floor(F.unix_timestamp(col) / secs).cast("long") * secs).alias(
        "_eb"
    )


def dense_grid(
    df: DataFrame, width: str, ts_col: str, key_cols: list[str]
) -> DataFrame:
    """Dense (key..., _eb) grid: every key × every ``width`` bucket
    between the GLOBAL min and max observed bucket (Timescale
    ``time_bucket_gapfill`` with the default whole-range bounds).

    Scale shape: the bounds aggregate is one row (broadcast into the
    cross join); the grid itself is |keys| × |buckets| rows generated
    by ``sequence`` + ``explode`` — never a shuffle of the fact table.
    """
    secs = bucket_seconds(width)
    eb = epoch_bucket(ts_col, width)
    bounds = df.select(eb).agg(
        F.min("_eb").alias("_mn"), F.max("_eb").alias("_mx")
    )
    keys = df.select(*key_cols).distinct()
    return (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("_mn"), F.col("_mx"), F.lit(secs))
            ).alias("_eb"),
        )
    )


def locf(value: Column | str, key_cols: list[str], order_col: str) -> Column:
    """Last-observation-carried-forward (Timescale ``locf()``): the
    most recent non-null value at or before this row, per key. Null
    until the first observation."""
    col = F.col(value) if isinstance(value, str) else value
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return F.last(col, ignorenulls=True).over(w)


def interpolate(
    value: str, key_cols: list[str], epoch_col: str
) -> Column:
    """Linear interpolation across gaps (Timescale ``interpolate()``):
    rows with a value keep it; gap rows get the straight line between
    the surrounding observations; rows before the first / after the
    last observation stay null.

    ``epoch_col`` must be a numeric (epoch-seconds) bucket column so
    the interpolation fractions are exact integer differences cast to
    double — one IEEE multiply+add per row, identical cross-engine.
    """
    v = F.col(value)
    e = F.col(epoch_col)
    wp = (
        Window.partitionBy(*key_cols)
        .orderBy(epoch_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy(*key_cols)
        .orderBy(epoch_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    pv = F.last(v, ignorenulls=True).over(wp)
    pe = F.last(F.when(v.isNotNull(), e), ignorenulls=True).over(wp)
    nv = F.first(v, ignorenulls=True).over(wn)
    ne = F.first(F.when(v.isNotNull(), e), ignorenulls=True).over(wn)
    frac = (e - pe).cast("double") / (ne - pe).cast("double")
    return F.when(v.isNotNull(), v).otherwise(pv + (nv - pv) * frac)


def bucketed_hyperaggs(
    df: DataFrame,
    width: str,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per (key, bucket) hyperfunction aggregates in ONE shuffle:

    - ``n_events`` — plain count;
    - ``avg_value`` — exact DECIMAL sum / count (base.py convention);
    - ``twa`` — LOCF time-weighted average within the bucket
      (Timescale ``time_weight('LOCF')``): each observation's value
      holds until the next observation (or the bucket end), weights
      are exact integer microseconds, numerator an exact decimal sum;
    - ``first_val`` / ``last_val`` — value at the earliest/latest
      ``(ts, id)`` in the bucket (Timescale ``first()``/``last()``);
    - ``delta`` — ``last_val - first_val`` (counter-delta style).

    The lead/first/last window functions ride the exact exchange the
    groupBy needs (same partitioning keys), so the whole thing is one
    shuffle of the fact table — the 100 TB shape.
    """
    secs = bucket_seconds(width)
    eb = epoch_bucket(ts_col, width)
    base = df.select(
        *key_cols,
        eb,
        F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_v"),
        F.col(id_col).alias("_id"),
        # fixture ts is TIMESTAMP_NTZ; cast is identity under the
        # session's UTC timezone and unix_micros requires TIMESTAMP
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    wb = Window.partitionBy(*key_cols, "_eb").orderBy("_ts", "_id")
    end_us = (F.col("_eb") + F.lit(secs)) * F.lit(1_000_000)
    dec_v = F.col("_v").cast("decimal(18,2)")
    annotated = base.select(
        *key_cols,
        "_eb",
        "_v",
        dec_v.alias("_dv"),
        (F.coalesce(F.lead("_us").over(wb), end_us) - F.col("_us")).alias(
            "_w_us"
        ),
        F.row_number().over(wb).alias("_rn"),
        F.row_number()
        .over(
            Window.partitionBy(*key_cols, "_eb").orderBy(
                F.desc("_ts"), F.desc("_id")
            )
        )
        .alias("_rn_desc"),
    )
    num = F.sum(F.col("_dv") * F.col("_w_us"))
    den = F.sum("_w_us")
    first_v = F.min(F.when(F.col("_rn") == 1, F.col("_v")))
    last_v = F.min(F.when(F.col("_rn_desc") == 1, F.col("_v")))
    return annotated.groupBy(*key_cols, "_eb").agg(
        F.count("*").alias("n_events"),
        (
            F.sum("_dv").cast("double") / F.count("*")
        ).alias("avg_value"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("twa"),
        first_v.alias("first_val"),
        last_v.alias("last_val"),
        (last_v - first_v).alias("delta"),
    )


def time_bucket_gapfill(
    df: DataFrame,
    width: str,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """The composed hyperfunction surface: bucketed aggregates on a
    DENSE per-key bucket grid (``time_bucket_gapfill``), with
    ``locf_avg`` and ``interp_avg`` filled across the gaps.

    Returns one row per (key, bucket) for every bucket in the global
    observed range — gap rows carry null raw aggregates, LOCF'd and
    interpolated averages where defined.
    """
    agged = bucketed_hyperaggs(df, width, ts_col, key_cols, value_col, id_col)
    grid = dense_grid(df, width, ts_col, key_cols)
    dense = grid.join(agged, [*key_cols, "_eb"], "left")
    return dense.select(
        *key_cols,
        F.timestamp_seconds("_eb").alias("bucket"),
        "n_events",
        "avg_value",
        locf("avg_value", key_cols, "_eb").alias("locf_avg"),
        F.round(interpolate("avg_value", key_cols, "_eb"), 6).alias(
            "interp_avg"
        ),
        "twa",
        "first_val",
        "last_val",
        "delta",
    )


def twa_partials(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    width: str,
) -> DataFrame:
    """Timescale ``time_weight('LOCF')`` partial state per (key,
    bucket), mergeable by :func:`twa_rollup`: LOCF numerator ``num_us``
    (Σ value × microseconds-held, each observation held to the next
    observation or the bucket end), covered duration ``den_us``
    (bucket end − first observation), the boundary data a cross-bucket
    merge needs (``first_us``, ``end_us``, ``last_val``), and ``n``.

    Same one-shuffle shape as ``bucketed_hyperaggs``: the lead window
    rides the exact exchange the groupBy needs.
    """
    secs = bucket_seconds(width)
    eb = epoch_bucket(ts_col, width)
    base = df.select(
        *key_cols,
        eb,
        F.col(value_col).alias("_v"),
        F.col(id_col).alias("_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    wb = Window.partitionBy(*key_cols, "_eb").orderBy("_us", "_id")
    end_us = (F.col("_eb") + F.lit(secs)) * F.lit(1_000_000)
    annotated = base.select(
        *key_cols,
        "_eb",
        "_v",
        "_us",
        (F.coalesce(F.lead("_us").over(wb), end_us) - F.col("_us")).alias(
            "_w_us"
        ),
        F.row_number()
        .over(
            Window.partitionBy(*key_cols, "_eb").orderBy(
                F.desc("_us"), F.desc("_id")
            )
        )
        .alias("_rn_desc"),
    )
    out = annotated.groupBy(*key_cols, "_eb").agg(
        F.count("*").alias("n"),
        F.sum(F.col("_v") * F.col("_w_us")).alias("num_us"),
        F.sum("_w_us").alias("den_us"),
        F.min("_us").alias("first_us"),
        F.min(F.when(F.col("_rn_desc") == 1, F.col("_v"))).alias("last_val"),
    ).withColumn(
        "end_us", (F.col("_eb") + F.lit(secs)) * F.lit(1_000_000)
    )
    return out.withColumn("bucket", F.timestamp_seconds("_eb")).drop("_eb")


def twa_rollup(
    partials: DataFrame,
    key_cols: list[str],
    width: str,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Timescale ``rollup(time_weight)``: merge stored per-bucket LOCF
    TWA partials (:func:`twa_partials`) to coarser buckets without
    re-reading facts — the one rollup in this module that is NOT a
    plain sum, because LOCF carries value ACROSS bucket boundaries:

    - between one partial's bucket end and the next partial's first
      observation (including across empty buckets), the previous
      bucket's last value holds — a ``last_val × gap`` term the
      stored numerators cannot contain;
    - after the final partial's bucket end, its last value holds to
      the COARSE bucket end (matching the to-bucket-end semantics a
      direct computation at the coarse width would produce).

    The merge is the same deterministic JVM fold as
    :func:`stats_rollup` (aggregate over an array_sort'ed
    collect_list, chronological because ``first_us`` leads the
    struct), with the list bounded by fine-buckets-per-coarse-bucket.
    Output matches ``bucketed_hyperaggs``'s ``twa`` exactly when the
    observations are identical — pinned by test.
    """
    secs = bucket_seconds(width)
    df = partials.withColumn("_ceb", epoch_bucket(bucket_col, width))
    st = F.struct(
        "first_us", "end_us", "num_us", "den_us", "last_val", "n"
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("first_us"),
        F.lit(0).cast("long").alias("end_us"),
        F.lit(0.0).alias("num_us"),
        F.lit(0).cast("long").alias("den_us"),
        F.lit(0.0).alias("last_val"),
        F.lit(0).cast("long").alias("n"),
    )

    def _merge(acc, p):
        gap = (p["first_us"] - acc["end_us"]).cast("long")
        first_merge = acc["n"] == 0
        return F.struct(
            F.when(first_merge, p["first_us"])
            .otherwise(acc["first_us"])
            .alias("first_us"),
            p["end_us"].alias("end_us"),
            (
                F.when(first_merge, p["num_us"]).otherwise(
                    acc["num_us"] + acc["last_val"] * gap + p["num_us"]
                )
            ).alias("num_us"),
            (
                F.when(first_merge, p["den_us"]).otherwise(
                    acc["den_us"] + gap + p["den_us"]
                )
            ).alias("den_us"),
            p["last_val"].alias("last_val"),
            (acc["n"] + p["n"]).alias("n"),
        )

    merged = df.groupBy(*key_cols, "_ceb").agg(
        F.aggregate(
            F.array_sort(F.collect_list(st)), zero, _merge
        ).alias("_s")
    )
    s = F.col("_s")
    coarse_end_us = (F.col("_ceb") + F.lit(secs)) * F.lit(1_000_000)
    tail_us = (coarse_end_us - s["end_us"]).cast("long")
    num = s["num_us"] + s["last_val"] * tail_us
    den = s["den_us"] + tail_us
    return merged.select(
        *key_cols,
        F.timestamp_seconds("_ceb").alias("bucket"),
        s["n"].alias("n"),
        F.round(num / den.cast("double"), 6).alias("twa"),
    )


def counter_delta(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    width: str | None = None,
) -> DataFrame:
    """Reset-aware counter delta (Timescale ``counter_agg`` →
    ``delta()``): for a monotonically-increasing counter that may
    RESET (restart from ~0 — process restarts, rollovers), the true
    increase over a period is Σ over consecutive observations of
    ``v_i - v_{i-1}`` when the counter grew, and ``v_i`` after a reset
    (the counter restarted below the previous reading, so everything
    up to ``v_i`` is new growth). A plain ``max - min`` or
    ``last - first`` under-counts across resets.

    With ``width`` the delta is per (key, bucket) — each bucket's
    first observation contributes nothing (no prior reading inside the
    bucket, Timescale's non-interpolated bucket semantics); without
    it, one row per key over the whole frame.

    One shuffle: the lag window and the aggregate share the same
    partitioning keys.
    """
    parts: list = list(key_cols)
    if width is not None:
        df = df.withColumn("_eb", epoch_bucket(ts_col, width))
        parts = [*key_cols, "_eb"]
    w = Window.partitionBy(*parts).orderBy(ts_col, id_col)
    v = F.col(value_col)
    annotated = df.withColumn("_prev", F.lag(value_col).over(w))
    prev = F.col("_prev")
    contrib = F.when(prev.isNull(), F.lit(0.0)).when(
        v >= prev, v - prev
    ).otherwise(v)
    out = (
        annotated.withColumn("_contrib", contrib)
        .withColumn("_reset", (v < prev).cast("int"))
        .groupBy(*parts)
        .agg(
            F.sum("_contrib").alias("delta"),
            F.coalesce(F.sum("_reset"), F.lit(0)).alias("n_resets"),
            F.count("*").alias("n_obs"),
        )
    )
    if width is not None:
        out = out.withColumn("bucket", F.timestamp_seconds("_eb")).drop("_eb")
    return out


def stats_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    y_col: str,
    width: str | None = None,
    x_col: str | None = None,
) -> DataFrame:
    """Timescale ``stats_agg`` analog: per-key (optionally per
    time-bucket) 1-D and 2-D statistical aggregates in ONE hash
    aggregate —

    - 1-D over ``y``: ``n``, ``avg_y``, ``stddev_y`` (sample),
      ``var_y`` (sample);
    - 2-D over ``(x, y)``: ``covar_xy`` (sample), ``corr_xy``,
      ``slope`` / ``intercept`` / ``r2`` (least-squares ``y ~ x``) —
      the toolkit's ``slope()/intercept()/determination_coeff()``
      accessors.

    ``x`` defaults to the observation time in epoch seconds
    (fractional), the toolkit's own default for trend-over-time
    regression; pass ``x_col`` for value-vs-value regression.

    Every statistic rides built-in JVM declarative moment aggregates
    (``var_pop``/``covar_pop`` & co. — numerically-stable Welford
    co-moments with map-side partial aggregation), so the plan is
    partial-agg → one shuffle on (keys, bucket) → final-agg: the same
    map-side-combine shape as a plain count at 100 TB, with no window,
    no second pass, and no Python. Mergeability of the underlying
    moment sketches is exactly why the toolkit stores stats_agg
    partials in continuous aggregates; Spark's partial aggregation is
    the same algebra.

    corr/slope/intercept/r2 are derived from the co-moments in a
    post-aggregate projection rather than via ``F.corr``/``F.regr_*``
    directly: under Spark 4's default ANSI mode those raise
    DIVIDE_BY_ZERO on zero-variance groups, where the SQL-standard
    (and Timescale/DuckDB/Postgres) answer is NULL — except
    ``regr_r2``, which is 1.0 for a perfectly-fit constant ``y`` over
    varying ``x`` (the Postgres ``syy == 0`` special case).
    """
    if x_col is None:
        # unix_micros (exact long) / 1e6 — one IEEE division, avoids
        # unix_timestamp's second truncation
        x = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1e6)
    else:
        x = F.col(x_col).cast("double")
    parts: list = list(key_cols)
    base = df.withColumn("_x", x).withColumn(
        "_y", F.col(y_col).cast("double")
    )
    if width is not None:
        base = base.withColumn("_eb", epoch_bucket(ts_col, width))
        parts = [*key_cols, "_eb"]
    agg = base.groupBy(*parts).agg(
        F.count("_y").alias("n"),
        F.avg("_y").alias("avg_y"),
        F.avg("_x").alias("_avg_x"),
        F.stddev_samp("_y").alias("stddev_y"),
        F.var_samp("_y").alias("var_y"),
        F.covar_samp("_x", "_y").alias("covar_xy"),
        F.var_pop("_x").alias("_vpx"),
        F.var_pop("_y").alias("_vpy"),
        F.covar_pop("_x", "_y").alias("_cpxy"),
    )
    vpx, vpy, cpxy = F.col("_vpx"), F.col("_vpy"), F.col("_cpxy")
    slope = F.when(vpx > 0, cpxy / vpx)
    corr = F.when(
        (vpx > 0) & (vpy > 0), cpxy / F.sqrt(vpx * vpy)
    )
    r2 = (
        F.when((vpx > 0) & (vpy > 0), F.pow(cpxy, 2) / (vpx * vpy))
        .when((vpx > 0) & (vpy == 0), F.lit(1.0))
    )
    out = agg.select(
        *parts,
        "n",
        "avg_y",
        "stddev_y",
        "var_y",
        "covar_xy",
        corr.alias("corr_xy"),
        slope.alias("slope"),
        F.when(
            vpx > 0, F.col("avg_y") - (cpxy / vpx) * F.col("_avg_x")
        ).alias("intercept"),
        r2.alias("r2"),
    )
    if width is not None:
        out = out.withColumn("bucket", F.timestamp_seconds("_eb")).drop("_eb")
    return out


def stats_partial_columns(
    ts_col: str, y_col: str, x_col: str | None = None
) -> list[Column]:
    """The MERGEABLE partial state behind :func:`stats_agg`, as
    aggregate Columns for use inside any (keys, bucket) groupBy — in
    particular as a `ContinuousAggregate` agg_builder, which is
    exactly Timescale's two-step-aggregation story: store ``stats_agg``
    partials in the cagg, ``rollup()`` them to coarser buckets later
    without re-reading facts.

    State per group: ``n``, means ``mx``/``my``, centered second
    moments ``m2x``/``m2y`` (= var_pop·n) and co-moment ``cxy``
    (= covar_pop·n) — the Welford/Chan summary. Centered moments, not
    raw power sums: raw Σx² of epoch-second x is ~3e18 and subtracting
    it to recover a within-bucket variance of ~1e8 would lose ~10
    significant digits to cancellation; the centered form keeps every
    stored quantity at the scale of the data's spread.
    """
    if x_col is None:
        x = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1e6)
    else:
        x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    n = F.count(y)
    return [
        n.alias("n"),
        F.avg(x).alias("mx"),
        F.avg(y).alias("my"),
        (F.var_pop(x) * n).alias("m2x"),
        (F.var_pop(y) * n).alias("m2y"),
        (F.covar_pop(x, y) * n).alias("cxy"),
    ]


def stats_agg_partials(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    y_col: str,
    width: str,
    x_col: str | None = None,
) -> DataFrame:
    """Per-(key, bucket) mergeable stats partials (see
    :func:`stats_partial_columns`) with a ``bucket`` timestamp column
    — the storable form that :func:`stats_rollup` re-aggregates."""
    out = (
        df.withColumn("_eb", epoch_bucket(ts_col, width))
        .groupBy(*key_cols, "_eb")
        .agg(*stats_partial_columns(ts_col, y_col, x_col))
    )
    return out.withColumn("bucket", F.timestamp_seconds("_eb")).drop("_eb")


def stats_rollup(
    partials: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    width: str | None = None,
) -> DataFrame:
    """Timescale ``rollup(stats_agg)``: merge stored per-bucket stats
    partials to coarser buckets (``width``) or one row per key
    (``width=None``), producing the SAME output schema as
    :func:`stats_agg` — without touching the fact table.

    Merging uses the exact Chan et al. pairwise-combination formulas,
    applied as a deterministic JVM fold (``aggregate`` over an
    ``array_sort``-ed ``collect_list`` of partial structs — a
    whole-stage-codegen higher-order expression, no Python, no
    window). The per-group list is bounded by fine-buckets-per-coarse-
    bucket (24 for hour→day, 60 for minute→hour), NOT by fact rows —
    at 100 TB the rollup input is the cagg's |keys| × |buckets| rows,
    so the collect is a few hundred bytes per output row and the whole
    rollup is one |groups|-sized shuffle.
    """
    parts: list = list(key_cols)
    df = partials
    if width is not None:
        df = df.withColumn("_ceb", epoch_bucket(bucket_col, width))
        parts = [*key_cols, "_ceb"]
    st = F.struct("n", "mx", "my", "m2x", "m2y", "cxy")
    zero = F.struct(
        F.lit(0).cast("long").alias("n"),
        *[F.lit(0.0).alias(c) for c in ("mx", "my", "m2x", "m2y", "cxy")],
    )

    def _merge(acc, e):
        nt = acc["n"] + e["n"]
        dx = e["mx"] - acc["mx"]
        dy = e["my"] - acc["my"]
        w = acc["n"].cast("double") * e["n"] / nt
        return F.struct(
            nt.alias("n"),
            (acc["mx"] + dx * e["n"] / nt).alias("mx"),
            (acc["my"] + dy * e["n"] / nt).alias("my"),
            (acc["m2x"] + e["m2x"] + dx * dx * w).alias("m2x"),
            (acc["m2y"] + e["m2y"] + dy * dy * w).alias("m2y"),
            (acc["cxy"] + e["cxy"] + dx * dy * w).alias("cxy"),
        )

    merged = df.groupBy(*parts).agg(
        F.aggregate(
            F.array_sort(F.collect_list(st)), zero, _merge
        ).alias("_s")
    )
    s = F.col("_s")
    n = s["n"]
    nd = n.cast("double")
    m2x, m2y, cxy = s["m2x"], s["m2y"], s["cxy"]
    var_y = F.when(n > 1, m2y / (nd - 1))
    slope = F.when(m2x > 0, cxy / m2x)
    out = merged.select(
        *parts,
        n.alias("n"),
        s["my"].alias("avg_y"),
        F.sqrt(var_y).alias("stddev_y"),
        var_y.alias("var_y"),
        F.when(n > 1, cxy / (nd - 1)).alias("covar_xy"),
        F.when((m2x > 0) & (m2y > 0), cxy / F.sqrt(m2x * m2y)).alias(
            "corr_xy"
        ),
        slope.alias("slope"),
        F.when(m2x > 0, s["my"] - (cxy / m2x) * s["mx"]).alias("intercept"),
        F.when((m2x > 0) & (m2y > 0), F.pow(cxy, 2) / (m2x * m2y))
        .when((m2x > 0) & (m2y == 0), F.lit(1.0))
        .alias("r2"),
    )
    if width is not None:
        out = out.withColumn("bucket", F.timestamp_seconds("_ceb")).drop(
            "_ceb"
        )
    return out


def percentile_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    percentiles: list[float],
    width: str | None = None,
    accuracy: int = 10000,
    exact: bool = False,
) -> DataFrame:
    """Timescale ``percentile_agg`` → ``approx_percentile()`` analog:
    per-key (optionally per time-bucket) quantiles of ``value`` as an
    array column ``quantiles`` aligned with ``percentiles``, plus
    ``n`` and ``max_err_rank`` (the sketch's rank-error bound,
    n/(2·accuracy) — the analog of uddsketch's published error).

    Default is Spark's ``approx_percentile`` — an internal
    QuantileSummaries (Greenwald-Khanna) sketch that is MERGEABLE
    across partitions, the same reason the toolkit stores uddsketch
    partials in continuous aggregates: partial-agg → one shuffle →
    final merge, bounded memory per group at any corpus size.
    ``exact=True`` swaps in the exact ``percentile`` aggregate
    (linear-interpolated, matches DuckDB ``quantile_cont``) — it
    buffers each group's values, so reserve it for small groups.
    """
    parts: list = list(key_cols)
    base = df
    if width is not None:
        base = base.withColumn("_eb", epoch_bucket(ts_col, width))
        parts = [*key_cols, "_eb"]
    ps = F.array(*[F.lit(float(p)) for p in percentiles])
    v = F.col(value_col).cast("double")
    if exact:
        q = F.percentile(v, ps)
    else:
        q = F.percentile_approx(v, ps, F.lit(accuracy))
    out = base.groupBy(*parts).agg(
        F.count(v).alias("n"),
        q.alias("quantiles"),
    ).withColumn(
        "max_err_rank",
        F.lit(0.0) if exact else (F.col("n") / F.lit(2.0 * accuracy)),
    )
    if width is not None:
        out = out.withColumn("bucket", F.timestamp_seconds("_eb")).drop("_eb")
    return out


def candlestick_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    width: str,
) -> DataFrame:
    """Timescale ``candlestick_agg`` analog: per-(key, bucket) OHLC —
    ``open``/``close`` are the values at the earliest/latest
    ``(ts, id)`` in the bucket, ``high``/``low`` the extremes, plus
    ``open_time``/``close_time`` and ``volume`` (count).

    open/close ride ``min_by``/``max_by`` over a ``(ts, id)`` struct
    key — declarative JVM aggregates, so the whole candle is ONE
    partial-aggregated hash aggregate with no window and no second
    pass (``bucketed_hyperaggs`` needs the window form because TWA
    weights are positional; a candle does not).
    """
    key = F.struct(F.col(ts_col), F.col(id_col))
    v = F.col(value_col)
    return (
        df.withColumn("_eb", epoch_bucket(ts_col, width))
        .groupBy(*key_cols, "_eb")
        .agg(
            F.min_by(v, key).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, key).alias("close"),
            F.min(ts_col).alias("open_time"),
            F.max(ts_col).alias("close_time"),
            F.count("*").alias("volume"),
        )
        .withColumn("bucket", F.timestamp_seconds("_eb"))
        .drop("_eb")
    )


def candlestick_rollup(
    candles: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    width: str | None = None,
) -> DataFrame:
    """Timescale ``rollup(candlestick_agg)``: merge stored fine-bucket
    candles to coarser buckets (or one candle per key) without
    re-reading facts. Candles merge associatively — open follows the
    earliest ``open_time`` (``min_by``), close the latest
    ``close_time`` (``max_by``), high/low/volume are max/min/sum — so
    the rollup is one partial-aggregated hash aggregate over the
    cagg-sized candle table, same declarative shape as
    :func:`candlestick_agg` itself.
    """
    parts: list = list(key_cols)
    df = candles
    if width is not None:
        df = df.withColumn("_ceb", epoch_bucket(bucket_col, width))
        parts = [*key_cols, "_ceb"]
    out = df.groupBy(*parts).agg(
        F.min_by("open", "open_time").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", "close_time").alias("close"),
        F.min("open_time").alias("open_time"),
        F.max("close_time").alias("close_time"),
        F.sum("volume").alias("volume"),
    )
    if width is not None:
        out = out.withColumn("bucket", F.timestamp_seconds("_ceb")).drop(
            "_ceb"
        )
    return out


def uddsketch_partials(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    width: str,
    lo: float = 1e-6,
    hi: float = 1e9,
    alpha: float = 0.01,
) -> DataFrame:
    """Timescale ``percentile_agg``'s ACTUAL sketch — UDDSketch — as a
    storable, vector-addition-mergeable partial per (key, bucket):
    a log-bucketed count array where positive value ``v`` lands in bin
    ``floor(log(v / lo) / log(gamma))``, ``gamma = (1+alpha)/(1-alpha)``,
    so any quantile read from the array has relative error ≤ ~alpha.
    Non-positive values count in ``n_nonpos`` and are read back as 0
    (the fixtures' measure columns are positive; Timescale's own
    sketch splits signs the same way).

    Unlike the Greenwald-Khanna state inside ``approx_percentile``
    (not exposed for merging), these partials are PLAIN DATA: rollup
    is element-wise array addition — deterministic, associative,
    loss-free — so a coarse sketch rolled up from fine buckets is
    IDENTICAL to one built directly at the coarse width (pinned by
    test, a stronger property than HLL's deterministic union).

    Shape: one count shuffle on (keys, bucket, bin) then a dense-array
    assembly per group (the :func:`histogram` pattern); the stored
    array is ``nbins`` longs (~log(hi/lo)/alpha ≈ 1.7k bins at the
    defaults, ~14 KB per group) — cagg-partial sized, not fact sized.
    """
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    nbins = int(math.ceil(math.log(hi / lo) / math.log(gamma)))
    v = F.col(value_col).cast("double")
    idx = F.least(
        F.greatest(
            F.floor(F.log(v / F.lit(lo)) / F.lit(math.log(gamma))),
            F.lit(0),
        ),
        F.lit(nbins - 1),
    ).cast("int")
    base = df.withColumn("_eb", epoch_bucket(ts_col, width)).withColumn(
        "_bin", F.when(v > 0, idx)
    )
    counts = base.groupBy(*key_cols, "_eb", "_bin").agg(
        F.count("*").alias("_c")
    )
    sparse = counts.groupBy(*key_cols, "_eb").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(F.coalesce("_bin", F.lit(-1)).alias("b"), "_c")
            )
        ).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(nbins - 1)),
        lambda i: F.coalesce(F.element_at("_m", i.cast("int")), F.lit(0)),
    )
    out = sparse.select(
        *key_cols,
        "_eb",
        dense.alias("counts"),
        F.coalesce(F.element_at("_m", -1), F.lit(0)).alias("n_nonpos"),
        F.lit(float(lo)).alias("lo"),
        F.lit(float(gamma)).alias("gamma"),
    ).withColumn(
        "n",
        F.aggregate("counts", F.lit(0).cast("long"), lambda a, x: a + x)
        + F.col("n_nonpos"),
    )
    return out.withColumn("bucket", F.timestamp_seconds("_eb")).drop("_eb")


def uddsketch_rollup(
    partials: DataFrame,
    key_cols: list[str],
    width: str | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Timescale ``rollup(percentile_agg)``: element-wise sum of
    stored UDDSketch count arrays to coarser buckets (or one sketch
    per key). Pure vector addition in a JVM fold — the merged sketch
    is bit-identical to one built directly at the coarse width.

    Partials merged into one group MUST share a sketch config (same
    ``lo``/``gamma``/array length — the same requirement
    :func:`hll_partial_columns` documents for ``lg_k``): mixed
    configs would silently sum counts from incompatible log grids
    (zip_with over different-length arrays null-pads) and read back
    wrong quantiles. The merge carries an in-plan guard — any group
    mixing configs raises at execution instead of merging silently."""
    parts: list = list(key_cols)
    df = partials
    if width is not None:
        df = df.withColumn("_ceb", epoch_bucket(bucket_col, width))
        parts = [*key_cols, "_ceb"]
    merged = df.groupBy(*parts).agg(
        F.aggregate(
            F.collect_list("counts"),
            F.transform(
                F.sequence(F.lit(1), F.size(F.first("counts"))),
                lambda _: F.lit(0).cast("long"),
            ),
            lambda acc, e: F.zip_with(acc, e, lambda a, b: a + b),
        ).alias("_counts"),
        F.sum("n_nonpos").alias("n_nonpos"),
        F.sum("n").alias("n"),
        F.first("lo").alias("lo"),
        F.first("gamma").alias("gamma"),
        # config guard inputs — cheap scalar min/max per group
        F.min("lo").alias("_lo_mn"),
        F.max("lo").alias("_lo_mx"),
        F.min("gamma").alias("_g_mn"),
        F.max("gamma").alias("_g_mx"),
        F.min(F.size("counts")).alias("_sz_mn"),
        F.max(F.size("counts")).alias("_sz_mx"),
    )
    config_ok = (
        (F.col("_lo_mn") == F.col("_lo_mx"))
        & (F.col("_g_mn") == F.col("_g_mx"))
        & (F.col("_sz_mn") == F.col("_sz_mx"))
    )
    # guard is load-bearing (it produces the counts column), so
    # Catalyst cannot prune it
    merged = merged.withColumn(
        "counts",
        F.when(config_ok, F.col("_counts")).otherwise(
            F.raise_error(
                "uddsketch_rollup: partials in one group have mixed "
                "sketch configs (lo/gamma/array length differ); merge "
                "only same-config sketches"
            )
        ),
    ).drop(
        "_counts", "_lo_mn", "_lo_mx", "_g_mn", "_g_mx", "_sz_mn", "_sz_mx"
    )
    if width is not None:
        merged = merged.withColumn(
            "bucket", F.timestamp_seconds("_ceb")
        ).drop("_ceb")
    return merged


def uddsketch_quantiles(
    sketch: DataFrame, percentiles: list[float]
) -> DataFrame:
    """Read quantile estimates off UDDSketch rows (from
    :func:`uddsketch_partials` or :func:`uddsketch_rollup`): adds a
    ``quantiles`` array aligned with ``percentiles``, each value the
    log-space bucket midpoint ``lo * gamma^(bin + 0.5)`` (relative
    error ≤ ~alpha), or 0.0 when the rank falls in the non-positive
    mass. Pure higher-order expressions — estimating off a stored
    sketch touches no facts and no Python."""
    idxed = F.zip_with(
        F.col("counts"),
        F.sequence(F.lit(0), F.size("counts") - 1),
        lambda c, i: F.struct(c.alias("c"), i.alias("i")),
    )

    def est(p):
        rank = F.greatest(F.ceil(F.lit(p) * F.col("n")), F.lit(1))
        walk = F.aggregate(
            idxed,
            F.struct(
                F.col("n_nonpos").cast("long").alias("cum"),
                F.lit(-1).cast("long").alias("found"),
            ),
            lambda acc, e: F.struct(
                (acc["cum"] + e["c"]).alias("cum"),
                F.when(acc["found"] >= 0, acc["found"])
                .when(acc["cum"] + e["c"] >= rank, e["i"].cast("long"))
                .otherwise(F.lit(-1).cast("long"))
                .alias("found"),
            ),
        )
        return F.when(
            F.col("n_nonpos") >= rank, F.lit(0.0)
        ).otherwise(
            F.col("lo")
            * F.pow(F.col("gamma"), walk["found"].cast("double") + 0.5)
        )

    return sketch.withColumn(
        "quantiles", F.array(*[est(p) for p in percentiles])
    )


def hll_partial_columns(count_col: str, lg_k: int = 12) -> list[Column]:
    """Timescale ``hyperloglog(value)`` partial state: a DataSketches
    HLL sketch (binary) of ``count_col`` plus the raw row count, as
    aggregate Columns for a (keys, bucket) groupBy — storable in a
    `ContinuousAggregate` and union-mergeable later. ``lg_k`` fixes
    the sketch's 2^lg_k buckets (relative error ≈ 1.04/√2^lg_k,
    ~1.6% at the default 12) — use the SAME lg_k at rollup."""
    return [
        F.hll_sketch_agg(F.col(count_col), F.lit(lg_k)).alias("hll"),
        F.count(count_col).alias("n_rows"),
    ]


def approx_distinct_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    count_col: str,
    width: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-(key, bucket) approximate distinct count (Timescale
    ``hyperloglog`` → ``distinct_count()``) with the sketch kept
    alongside the estimate so the result doubles as the storable
    partial for :func:`hll_rollup`."""
    out = (
        df.withColumn("_eb", epoch_bucket(ts_col, width))
        .groupBy(*key_cols, "_eb")
        .agg(*hll_partial_columns(count_col, lg_k))
        .withColumn(
            "distinct_est", F.hll_sketch_estimate("hll")
        )
    )
    return out.withColumn("bucket", F.timestamp_seconds("_eb")).drop("_eb")


def hll_rollup(
    partials: DataFrame,
    key_cols: list[str],
    bucket_col: str = "bucket",
    width: str | None = None,
) -> DataFrame:
    """Timescale ``rollup(hyperloglog)``: union stored per-bucket HLL
    sketches to coarser buckets (or one row per key) and estimate —
    distinct counts over any coarser window without re-reading facts,
    and (unlike exact count-distinct) without re-shuffling raw values:
    the shuffle carries 2^lg_k-byte sketches per group. ``hll_union_agg``
    is a declarative aggregate, so this is one partial-aggregated
    exchange like every other rollup in this module."""
    parts: list = list(key_cols)
    df = partials
    if width is not None:
        df = df.withColumn("_ceb", epoch_bucket(bucket_col, width))
        parts = [*key_cols, "_ceb"]
    out = df.groupBy(*parts).agg(
        F.hll_union_agg("hll").alias("hll"),
        F.sum("n_rows").alias("n_rows"),
    ).withColumn("distinct_est", F.hll_sketch_estimate("hll"))
    if width is not None:
        out = out.withColumn("bucket", F.timestamp_seconds("_ceb")).drop(
            "_ceb"
        )
    return out


def counter_partials(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    id_col: str,
    width: str,
) -> DataFrame:
    """Timescale ``counter_agg`` partial state per (key, bucket),
    mergeable by :func:`counter_rollup`: the within-bucket reset-aware
    ``delta``/``n_resets`` (exactly :func:`counter_delta`'s bucketed
    output) plus the boundary readings a cross-bucket merge needs —
    ``first_val``/``last_val`` at the earliest/latest ``(ts, id)`` —
    and ``first_us`` to order the fold."""
    eb = epoch_bucket(ts_col, width)
    base = df.select(
        *key_cols,
        eb,
        F.col(value_col).alias("_v"),
        F.col(id_col).alias("_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    w = Window.partitionBy(*key_cols, "_eb").orderBy("_us", "_id")
    v = F.col("_v")
    prev = F.lag("_v").over(w)
    contrib = F.when(prev.isNull(), F.lit(0.0)).when(
        v >= prev, v - prev
    ).otherwise(v)
    annotated = base.select(
        *key_cols,
        "_eb",
        "_v",
        "_us",
        contrib.alias("_contrib"),
        (v < prev).cast("int").alias("_reset"),
        F.row_number().over(w).alias("_rn"),
        F.row_number()
        .over(
            Window.partitionBy(*key_cols, "_eb").orderBy(
                F.desc("_us"), F.desc("_id")
            )
        )
        .alias("_rn_desc"),
    )
    out = annotated.groupBy(*key_cols, "_eb").agg(
        F.count("*").alias("n"),
        F.sum("_contrib").alias("delta"),
        F.coalesce(F.sum("_reset"), F.lit(0)).cast("long").alias("n_resets"),
        F.min("_us").alias("first_us"),
        F.min(F.when(F.col("_rn") == 1, F.col("_v"))).alias("first_val"),
        F.min(F.when(F.col("_rn_desc") == 1, F.col("_v"))).alias("last_val"),
    )
    return out.withColumn("bucket", F.timestamp_seconds("_eb")).drop("_eb")


def counter_rollup(
    partials: DataFrame,
    key_cols: list[str],
    width: str | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Timescale ``rollup(counter_agg)``: merge stored per-bucket
    counter partials to coarser buckets (or one row per key) without
    re-reading facts. Within-bucket deltas sum, but each BOUNDARY
    between consecutive partials contributes like one more counter
    reading pair: if the next bucket opens at or above the previous
    bucket's closing reading the counter grew by the difference,
    otherwise it reset and everything up to the opening reading is new
    growth. This reproduces :func:`counter_delta` computed directly at
    the coarse width exactly (same observation chain, same reset
    rule) — pinned by test. Same deterministic JVM fold shape as the
    other rollups; list bounded by fine-buckets-per-coarse-bucket.
    """
    parts: list = list(key_cols)
    df = partials
    if width is not None:
        df = df.withColumn("_ceb", epoch_bucket(bucket_col, width))
        parts = [*key_cols, "_ceb"]
    st = F.struct(
        "first_us", "first_val", "last_val", "delta", "n_resets", "n"
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("first_us"),
        F.lit(0.0).alias("first_val"),
        F.lit(0.0).alias("last_val"),
        F.lit(0.0).alias("delta"),
        F.lit(0).cast("long").alias("n_resets"),
        F.lit(0).cast("long").alias("n"),
    )

    def _merge(acc, p):
        first_merge = acc["n"] == 0
        grew = p["first_val"] >= acc["last_val"]
        boundary = F.when(
            grew, p["first_val"] - acc["last_val"]
        ).otherwise(p["first_val"])
        return F.struct(
            F.when(first_merge, p["first_us"])
            .otherwise(acc["first_us"])
            .alias("first_us"),
            F.when(first_merge, p["first_val"])
            .otherwise(acc["first_val"])
            .alias("first_val"),
            p["last_val"].alias("last_val"),
            (
                F.when(first_merge, p["delta"]).otherwise(
                    acc["delta"] + boundary + p["delta"]
                )
            ).alias("delta"),
            (
                acc["n_resets"]
                + p["n_resets"]
                + F.when(first_merge | grew, F.lit(0)).otherwise(F.lit(1))
            ).alias("n_resets"),
            (acc["n"] + p["n"]).alias("n"),
        )

    merged = df.groupBy(*parts).agg(
        F.aggregate(
            F.array_sort(F.collect_list(st)), zero, _merge
        ).alias("_s")
    )
    s = F.col("_s")
    out = merged.select(
        *parts,
        s["delta"].alias("delta"),
        s["n_resets"].alias("n_resets"),
        s["n"].alias("n_obs"),
    )
    if width is not None:
        out = out.withColumn("bucket", F.timestamp_seconds("_ceb")).drop(
            "_ceb"
        )
    return out


def histogram(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    lo: float,
    hi: float,
    nbuckets: int,
) -> DataFrame:
    """Per-key value histogram (Timescale ``histogram(value, lo, hi,
    nbuckets)``): an array of ``nbuckets + 2`` counts — index 0 is the
    underflow bucket (< lo), indexes 1..nbuckets the equi-width
    buckets over [lo, hi), index nbuckets+1 the overflow (>= hi).

    Shape: one count-aggregate shuffle on (keys, bucket-index), then a
    per-key map assembly densified over the full index range — no
    pivot, no second pass over the facts.
    """
    v = F.col(value_col)
    idx = (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(nbuckets + 1))
        .otherwise(
            (F.floor((v - lo) / ((hi - lo) / nbuckets)) + 1).cast("int")
        )
    )
    counts = (
        df.withColumn("_hb", idx)
        .groupBy(*key_cols, "_hb")
        .agg(F.count("*").alias("_c"))
    )
    sparse = counts.groupBy(*key_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("_hb", "_c"))).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(nbuckets + 1)),
        lambda i: F.coalesce(F.element_at("_m", i), F.lit(0)),
    )
    return sparse.select(*key_cols, dense.alias("counts"))
