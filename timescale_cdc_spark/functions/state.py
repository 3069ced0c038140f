"""Timescale toolkit state/liveness hyperfunction analogs:
``state_agg`` (time-in-state with LOCF semantics), ``state_timeline``
(compact run-length transition list), and ``heartbeat_agg``
(liveness islands from a heartbeat stream) — the toolkit families a
user of the reference's hypertables (init.sql:69-72) reaches for to
answer "how long was each device in each state" and "what fraction of
the hour was this service alive".

Same engineering rules as functions/hyper.py:

- everything is DataFrame/window composition; no Python UDFs, no
  collect — every function here keeps the plan inside whole-stage
  codegen;
- per-bucket partials are MERGEABLE: ``state_rollup`` /
  ``heartbeat_rollup`` reproduce the direct computation at a coarser
  width exactly (integer microseconds end to end, so equality is
  bit-exact, pinned by tests);
- one exchange per family: the annotate window rides the same
  (key, bucket) hash exchange the groupBy needs, and the rollup is a
  single groupBy over stored partials with a deterministic JVM fold
  (``aggregate`` over a comparator-sorted ``collect_list``).

Boundary semantics (mirrors twa_partials/twa_rollup): a state holds
from its observation to the NEXT observation or the bucket end
(LOCF-to-bucket-end). The rollup re-attributes the seam: the gap
between one partial's bucket end and the next partial's first
observation — including across empty buckets — belongs to the
previous partial's last state, and the tail after the final partial's
bucket end belongs to its last state, so rollup(fine) == direct
(coarse) exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timescale_cdc_spark.functions.hyper import epoch_bucket
from timescale_cdc_spark.functions.time import bucket_seconds

_LONG0 = "cast(0 as long)"


def _map_sum_sql(m1: str, m2: str) -> str:
    """SQL text of the element-wise map<string,long> sum (key union).
    Text, not a Column lambda: py4j lambda construction costs ~0.1 s
    per lambda at plan-build time, and the state fold nests this
    twice per merge step (round 13)."""
    z = "cast(0 as long)"
    return (
        f"map_zip_with({m1}, {m2}, "
        f"(_k, a, b) -> coalesce(a, {z}) + coalesce(b, {z}))"
    )


def state_partials(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    state_col: str,
    id_col: str,
    width: str,
) -> DataFrame:
    """Timescale ``state_agg`` partial per (key, bucket), mergeable by
    :func:`state_rollup`: ``durs`` (map state → microseconds held
    inside the bucket, each observation held to the next observation
    or the bucket end), within-bucket ``n_transitions`` (state !=
    previous state), and the seam data a cross-bucket merge needs
    (``first_us``/``end_us``/``first_state``/``last_state``).

    One shuffle: the lead/lag window rides the exact (key, bucket)
    exchange the two-level groupBy needs (the inner groupBy adds
    ``state`` — a superset of the clustering, so no new exchange).
    """
    from timescale_cdc_spark.functions.ident import sql_ident

    secs = bucket_seconds(width)
    # selectExpr/F.expr SQL text throughout (round 16, VERDICT r15
    # #3): the Column-tree form cost ~0.19 s of py4j chatter per
    # construction — a real per-pass cost for the lib entries, which
    # rebuild every bench pass. Expression for expression identical
    # to the Column form it replaces (plan-diffed byte-identical
    # modulo expr ids; see OPTIMIZATION_r16.md).
    ks = [sql_ident(c) for c in key_cols]
    kcsv = ", ".join(ks)
    base = df.selectExpr(
        *ks,
        f"cast(floor(unix_timestamp({sql_ident(ts_col)}) / {secs}) "
        f"as bigint) * {secs} as _eb",
        f"{sql_ident(state_col)} as _st",
        f"{sql_ident(id_col)} as _id",
        f"unix_micros(cast({sql_ident(ts_col)} as timestamp)) as _us",
    )
    wb = f"(partition by {kcsv}, _eb order by _us, _id)"
    # first/last state via min_by/max_by (round 15 — the candlestick
    # shape): the former descending row_number was a SECOND sort of
    # the fact-sized frame inside the same exchange. Each per-state
    # group carries its earliest/latest (_us, _id) struct; the outer
    # aggregate picks the state owning the bucket-global extreme —
    # the identical row the row_number selected ((_us, _id) unique).
    annotated = base.selectExpr(
        *ks,
        "_eb",
        "_st",
        "_us",
        "_id",
        f"coalesce(lead(_us) over {wb}, (_eb + {secs}) * 1000000) - _us "
        "as _held_us",
        f"cast((lag(_st) over {wb}) != _st as long) as _is_transition",
    )
    per_state = annotated.groupBy(*key_cols, "_eb", "_st").agg(
        F.expr("sum(_held_us) as _dur_us"),
        F.expr("count(*) as _n"),
        F.expr("sum(coalesce(_is_transition, 0)) as _trans"),
        F.expr("min(_us) as _first_us"),
        F.expr("min(struct(_us, _id)) as _mn"),
        F.expr("max(struct(_us, _id)) as _mx"),
    )
    out = per_state.groupBy(*key_cols, "_eb").agg(
        F.expr(
            "map_from_entries(array_sort(collect_list("
            "struct(_st, _dur_us)))) as durs"
        ),
        F.expr("sum(_n) as n"),
        F.expr("sum(_trans) as n_transitions"),
        F.expr("min(_first_us) as first_us"),
        F.expr("min_by(_st, _mn) as first_state"),
        F.expr("max_by(_st, _mx) as last_state"),
    )
    return out.selectExpr(
        *ks,
        "durs",
        "n",
        "n_transitions",
        "first_us",
        "first_state",
        "last_state",
        f"(_eb + {secs}) * 1000000 as end_us",
        "timestamp_seconds(_eb) as bucket",
    )


def state_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    state_col: str,
    id_col: str,
    width: str,
) -> DataFrame:
    """Direct Timescale ``state_agg`` per (key, bucket): time-in-state
    map + observation/transition counts. The direct computation IS the
    partial view minus the seam columns — which is what makes
    ``state_rollup(state_partials(fine)) == state_agg(coarse)`` an
    exact (integer-microsecond) equality, pinned by tests."""
    return state_partials(
        df, ts_col, key_cols, state_col, id_col, width
    ).select(*key_cols, "bucket", "durs", "n", "n_transitions")


def duration_in(durs: Column | str, state: str) -> Column:
    """Timescale ``duration_in(agg, state)``: microseconds spent in
    ``state`` (0 if never observed)."""
    col = F.col(durs) if isinstance(durs, str) else durs
    return F.coalesce(
        F.element_at(col, F.lit(state)), F.lit(0).cast("long")
    )


def state_rollup(
    partials: DataFrame,
    key_cols: list[str],
    width: str,
    bucket_col: str = "bucket",
    keep_seams: bool = False,
) -> DataFrame:
    """Timescale ``rollup(state_agg)``: merge stored fine-bucket state
    partials (:func:`state_partials`) to coarser buckets without
    re-reading facts. Like :func:`~timescale_cdc_spark.functions.hyper.
    twa_rollup` the merge is NOT a plain sum — LOCF carries the state
    ACROSS bucket boundaries:

    - the seam between one partial's bucket end and the next
      partial's first observation (including across empty fine
      buckets) is attributed to the previous partial's ``last_state``;
    - the tail after the final partial's bucket end runs to the
      COARSE bucket end in the same state;
    - a transition is added at the seam when ``last_state`` !=
      the next partial's ``first_state``.

    The fold sorts the collected partials chronologically with a
    comparator lambda (the struct carries a map, which is not
    naturally orderable — the comparator sidesteps the orderability
    requirement), so the merge is deterministic and bounded by
    fine-buckets-per-coarse-bucket.

    ``keep_seams=True`` additionally emits the merged boundary
    columns (``first_us``/``end_us``/``first_state``/``last_state``)
    so the output is itself a VALID coarse partial — equal to
    ``state_partials`` computed directly at ``width`` — and can feed
    :func:`state_interpolated` or a further rollup without re-reading
    facts.
    """
    secs = bucket_seconds(width)
    df = partials.withColumn("_ceb", epoch_bucket(bucket_col, width))
    # The whole fold as ONE SQL string (round 13): the Column-lambda
    # form (comparator + merge step + two nested _map_sum lambdas)
    # cost ~0.5 s of py4j construction per call — a real per-pass cost
    # for the bench's biggest headline entry. Same expressions, same
    # NULL semantics (CASE WHEN chains are the F.when chains).
    st = (
        "struct(first_us, end_us, first_state, last_state, durs, n, "
        "n_transitions)"
    )
    zero = (
        "named_struct('first_us', cast(0 as long), "
        "'end_us', cast(0 as long), "
        "'first_state', cast(null as string), "
        "'last_state', cast(null as string), "
        "'durs', cast(map() as map<string,long>), "
        "'n', cast(0 as long), 'n_transitions', cast(0 as long))"
    )
    cmp_ = (
        "(a, b) -> CASE WHEN a.first_us < b.first_us THEN -1 "
        "WHEN a.first_us > b.first_us THEN 1 ELSE 0 END"
    )
    gap_map = (
        "map_from_arrays(array(acc.last_state), "
        "array(cast(p.first_us - acc.end_us as long)))"
    )
    merged_durs = (
        "CASE WHEN acc.n = 0 THEN p.durs ELSE "
        + _map_sum_sql(_map_sum_sql("acc.durs", gap_map), "p.durs")
        + " END"
    )
    merge = (
        "(acc, p) -> named_struct("
        "'first_us', CASE WHEN acc.n = 0 THEN p.first_us "
        "ELSE acc.first_us END, "
        "'end_us', p.end_us, "
        "'first_state', CASE WHEN acc.n = 0 THEN p.first_state "
        "ELSE acc.first_state END, "
        "'last_state', p.last_state, "
        f"'durs', {merged_durs}, "
        "'n', acc.n + p.n, "
        "'n_transitions', acc.n_transitions + p.n_transitions + "
        "CASE WHEN acc.n = 0 OR acc.last_state = p.first_state "
        "THEN 0 ELSE 1 END)"
    )
    merged = df.groupBy(*key_cols, "_ceb").agg(
        F.expr(
            f"aggregate(array_sort(collect_list({st}), {cmp_}), "
            f"{zero}, {merge})"
        ).alias("_s")
    )
    coarse_end_us = f"((_ceb + {secs}) * 1000000)"
    tail_map = (
        "map_from_arrays(array(_s.last_state), "
        f"array(cast({coarse_end_us} - _s.end_us as long)))"
    )
    seam_cols = (
        [
            F.expr("_s.first_us").alias("first_us"),
            F.expr(f"cast({coarse_end_us} as long)").alias("end_us"),
            F.expr("_s.first_state").alias("first_state"),
            F.expr("_s.last_state").alias("last_state"),
        ]
        if keep_seams
        else []
    )
    return merged.select(
        *key_cols,
        F.timestamp_seconds("_ceb").alias("bucket"),
        F.expr(
            "map_from_entries(array_sort(map_entries("
            + _map_sum_sql("_s.durs", tail_map)
            + ")))"
        ).alias("durs"),
        F.expr("_s.n").alias("n"),
        F.expr("_s.n_transitions").alias("n_transitions"),
        *seam_cols,
    )


def state_timeline(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    state_col: str,
    id_col: str,
) -> DataFrame:
    """Timescale ``state_timeline`` over the whole series: one row per
    state RUN per key (consecutive observations of the same state
    merged), with the run's start/end timestamps — the end is the
    next run's start, null for the final (still-open) run.

    Run-length encoding via the classic gaps-and-islands window: a
    run starts where the state differs from the previous observation;
    the run id is a running count of starts; both windows plus the
    groupBy ride one (key) exchange.
    """
    base = df.select(
        *key_cols,
        F.col(state_col).alias("state"),
        F.col(id_col).alias("_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    )
    w = Window.partitionBy(*key_cols).orderBy("_us", "_id")
    annotated = base.select(
        *key_cols,
        "state",
        "_us",
        "_id",
        F.coalesce(
            (F.lag("state").over(w) != F.col("state")).cast("long"),
            F.lit(1),
        ).alias("_is_start"),
    ).withColumn(
        "_run",
        # (_us, _id) — the SAME total order the _is_start lag used.
        # Ordering by _us alone would leave run segmentation under
        # duplicate timestamps to whichever sort Catalyst happens to
        # reuse (plan-dependent, not guaranteed).
        F.sum("_is_start").over(
            Window.partitionBy(*key_cols)
            .orderBy("_us", "_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    runs = annotated.groupBy(*key_cols, "_run").agg(
        F.min_by("state", F.struct("_us", "_id")).alias("state"),
        F.min("_us").alias("_start_us"),
    )
    # _run ids are assigned along the (_us, _id) total order, so they
    # are themselves a deterministic total order over runs — two runs
    # CAN share a _start_us when duplicate timestamps straddle a state
    # change, so ordering the lead by _start_us alone would be
    # ambiguous there.
    wr = Window.partitionBy(*key_cols).orderBy("_run")
    return runs.select(
        *key_cols,
        "state",
        F.timestamp_micros(F.col("_start_us")).alias("start_ts"),
        F.timestamp_micros(F.lead("_start_us").over(wr)).alias("end_ts"),
    )


# ---------------------------------------------------------------------------
# heartbeat_agg: liveness islands from a heartbeat stream
# ---------------------------------------------------------------------------


def heartbeat_islands(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    lease: str,
) -> DataFrame:
    """Merged liveness intervals per key (Timescale ``heartbeat_agg``
    ranges): each heartbeat asserts liveness for ``[ts, ts+lease)``;
    overlapping/touching assertions merge into islands.

    Classic gaps-and-islands: a new island starts where the heartbeat
    begins after the running max of all previous coverage ends; the
    island id is a running count of starts. One (key) exchange; both
    windows and the groupBy ride it.
    """
    from timescale_cdc_spark.functions.ident import sql_ident

    lease_us = bucket_seconds(lease) * 1_000_000
    # SQL text throughout (round 16, VERDICT r15 #3 — construct py4j
    # chatter): identical expressions to the Column form it replaces,
    # plan-diffed byte-identical modulo expr ids.
    ks = [sql_ident(c) for c in key_cols]
    kcsv = ", ".join(ks)
    base = df.selectExpr(
        *ks,
        f"unix_micros(cast({sql_ident(ts_col)} as timestamp)) as _s_us",
    ).selectExpr("*", f"_s_us + {lease_us} as _e_us")
    annotated = base.selectExpr(
        "*",
        "CASE WHEN _s_us > coalesce(max(_e_us) over "
        f"(partition by {kcsv} order by _s_us "
        "rows between unbounded preceding and 1 preceding), "
        "cast(-1 as long)) THEN 1 ELSE 0 END as _new_island",
    ).selectExpr(
        "*",
        f"sum(_new_island) over (partition by {kcsv} order by _s_us "
        "rows between unbounded preceding and current row) as _island",
    )
    return annotated.groupBy(*key_cols, "_island").agg(
        F.expr("min(_s_us) as start_us"),
        F.expr("max(_e_us) as end_us"),
        F.expr("count(*) as n_heartbeats"),
    ).drop("_island")


def _clip_islands_to_buckets(
    islands: DataFrame, key_cols: list[str], width: str
) -> DataFrame:
    """Explode islands across the ``width`` buckets they span, clipped
    to each bucket — one row per (key, bucket, clipped range). The
    explode side is |islands| × buckets-spanned rows; no fact-table
    shuffle."""
    from timescale_cdc_spark.functions.ident import sql_ident

    secs = bucket_seconds(width)
    w_us = secs * 1_000_000
    ks = [sql_ident(c) for c in key_cols]
    exploded = islands.selectExpr(
        *ks,
        "start_us",
        "end_us",
        "n_heartbeats",
        f"explode(sequence(cast(floor(start_us / {w_us}) * {w_us} as "
        f"long), cast(floor((end_us - 1) / {w_us}) * {w_us} as long), "
        f"{w_us})) as _b_us",
    )
    return exploded.selectExpr(
        *ks,
        "_b_us",
        "greatest(start_us, _b_us) as _cs",
        f"least(end_us, _b_us + {w_us}) as _ce",
        # attribute the island's heartbeat count to the bucket the
        # island STARTS in (so per-bucket n sums to the key total)
        "CASE WHEN start_us >= _b_us THEN n_heartbeats ELSE 0 END "
        "as _n_hb",
    )


def heartbeat_partials(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    lease: str,
    width: str,
) -> DataFrame:
    """Timescale ``heartbeat_agg`` partial per (key, bucket),
    mergeable by :func:`heartbeat_rollup`: the bucket's liveness
    ranges CLIPPED to the bucket (sorted array of [start,end)
    microsecond structs), plus ``live_us``/``n_ranges``/
    ``n_heartbeats``. Clipping at fine-bucket seams splits islands
    exactly at the boundary (prev.end == next.start), which is what
    lets the rollup re-merge them losslessly."""
    from timescale_cdc_spark.functions.ident import sql_ident

    islands = heartbeat_islands(df, ts_col, key_cols, lease)
    clipped = _clip_islands_to_buckets(islands, key_cols, width)
    out = clipped.groupBy(*key_cols, "_b_us").agg(
        F.expr(
            "array_sort(collect_list(named_struct('s', _cs, 'e', _ce)))"
            " as ranges"
        ),
        F.expr("sum(_ce - _cs) as live_us"),
        F.expr("count(*) as n_ranges"),
        F.expr("sum(_n_hb) as n_heartbeats"),
    )
    return out.selectExpr(
        *[sql_ident(c) for c in key_cols],
        "timestamp_seconds(cast(_b_us / 1000000 as long)) as bucket",
        "ranges",
        "live_us",
        "n_ranges",
        "n_heartbeats",
    )


def _merge_sorted_ranges_sql(expr: str) -> str:
    """SQL text of the sorted-range union fold: merge each range into
    the accumulator's last island when it overlaps or touches
    (s <= last.e), else append a new island. Emitted as ONE parsed
    string because py4j Column-lambda construction costs ~0.1 s per
    lambda at plan-build time (round 13 — the lib entries rebuild per
    bench pass, so build cost is measured cost); the CASE chain is the
    exact F.when chain the Column form used."""
    last = "element_at(acc, -1)"
    ext = (
        "concat(slice(acc, 1, size(acc) - 1), "
        f"array(named_struct('s', {last}.s, "
        f"'e', greatest({last}.e, x.e))))"
    )
    return (
        f"aggregate({expr}, "
        "cast(array() as array<struct<s:bigint,e:bigint>>), "
        "(acc, x) -> CASE WHEN size(acc) = 0 THEN array(x) "
        f"WHEN x.s <= {last}.e THEN {ext} "
        "ELSE concat(acc, array(x)) END)"
    )


def heartbeat_rollup(
    partials: DataFrame,
    key_cols: list[str],
    width: str,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Timescale ``rollup(heartbeat_agg)``: merge stored fine-bucket
    liveness partials to coarser buckets without re-reading the
    heartbeat stream. Ranges from adjacent fine buckets that were
    split at the seam (prev.e == next.s) — or that overlap because a
    lease spans the seam — re-merge in a deterministic JVM fold over
    the start-sorted flattened range arrays, so
    ``heartbeat_rollup(heartbeat_partials(fine)) ==
    heartbeat_summary(direct at coarse)`` exactly (integer
    microseconds; pinned by tests).

    One exchange: groupBy (key, coarse bucket) over the partials;
    flatten + sort + fold are all post-aggregation expressions."""
    from timescale_cdc_spark.functions.ident import sql_ident

    secs = bucket_seconds(width)
    w_us = secs * 1_000_000
    ks = [sql_ident(c) for c in key_cols]
    df = partials.selectExpr(
        "*",
        f"cast(floor(unix_timestamp({sql_ident(bucket_col)}) / {secs}) "
        f"as bigint) * {secs} as _ceb",
    )
    merged = df.groupBy(*key_cols, "_ceb").agg(
        F.expr("flatten(collect_list(ranges)) as _all"),
        F.expr("sum(n_heartbeats) as n_heartbeats"),
    )
    out = merged.selectExpr(
        *ks,
        "timestamp_seconds(_ceb) as bucket",
        _merge_sorted_ranges_sql("array_sort(_all)") + " as ranges",
        "n_heartbeats",
    )
    return out.selectExpr(
        *ks,
        "bucket",
        "ranges",
        "aggregate(ranges, cast(0 as long), "
        "(acc, x) -> acc + (x.e - x.s)) as live_us",
        "size(ranges) as n_ranges",
        "n_heartbeats",
    ).selectExpr(
        "*",
        f"cast({w_us} as long) - live_us as dead_us",
    ).selectExpr(
        "*",
        f"round(live_us / cast(cast({w_us} as long) as double), 6) "
        "as uptime",
    )


def heartbeat_summary(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    lease: str,
    width: str,
) -> DataFrame:
    """Direct per (key, bucket) liveness summary at ``width`` —
    live/dead time, uptime ratio, island count — computed straight
    from the heartbeat stream. The rollup equivalence target."""
    islands = heartbeat_islands(df, ts_col, key_cols, lease)
    clipped = _clip_islands_to_buckets(islands, key_cols, width)
    width_us = bucket_seconds(width) * 1_000_000
    out = clipped.groupBy(*key_cols, "_b_us").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("_cs").alias("s"), F.col("_ce").alias("e")
                )
            )
        ).alias("ranges"),
        F.sum(F.col("_ce") - F.col("_cs")).alias("live_us"),
        F.count("*").alias("n_ranges"),
        F.sum("_n_hb").alias("n_heartbeats"),
    )
    return out.select(
        *key_cols,
        F.timestamp_seconds(
            (F.col("_b_us") / 1_000_000).cast("long")
        ).alias("bucket"),
        "ranges",
        "live_us",
        "n_ranges",
        "n_heartbeats",
        (F.lit(width_us).cast("long") - F.col("live_us")).alias(
            "dead_us"
        ),
        F.round(
            F.col("live_us") / F.lit(float(width_us)), 6
        ).alias("uptime"),
    )


def state_at(
    timeline: DataFrame, at, key_cols: list[str]
) -> DataFrame:
    """Timescale ``state_at(agg, ts)``: the state each key was in at
    instant ``at`` (a datetime or ISO string), read from a
    :func:`state_timeline` frame — the run whose [start_ts, end_ts)
    contains the instant (end null = still open). Keys whose first
    observation is later than ``at`` produce no row (no state yet).
    Pure filter over the timeline — no shuffle beyond the timeline's
    own."""
    ts = F.lit(at).cast("timestamp")
    return timeline.where(
        (F.col("start_ts") <= ts)
        & (F.col("end_ts").isNull() | (F.col("end_ts") > ts))
    ).select(*key_cols, F.col("state"), F.col("start_ts"))


def live_at(
    summary: DataFrame,
    at,
    key_cols: list[str],
    width: str | None = None,
) -> DataFrame:
    """Timescale ``live_at(heartbeat_agg, ts)``: was each key's
    liveness asserted at instant ``at``? Evaluated against the stored
    ``ranges`` arrays of a :func:`heartbeat_summary` /
    :func:`heartbeat_rollup` row set (one `exists` over the bounded
    per-bucket range array — no re-read of the heartbeat stream).
    Rows whose bucket does not contain the instant are filtered out;
    keys with no bucket at that instant were trivially dead (emit no
    row, same convention as :func:`state_at`).

    The containing-bucket filter needs the bucket width: pass
    ``width`` explicitly, or rely on ``live_us + dead_us`` when the
    input carries ``dead_us`` (summary/rollup rows do). Inputs with
    NEITHER (e.g. raw ``heartbeat_partials``) are rejected — without a
    width the filter would degrade to ``bucket <= at`` and emit one
    row per historical bucket per key."""
    at_us = F.unix_micros(F.lit(at).cast("timestamp"))
    bucket_us = F.unix_micros(F.col("bucket"))
    in_bucket = bucket_us <= at_us
    if width is not None:
        in_bucket = in_bucket & (
            at_us < bucket_us + F.lit(bucket_seconds(width) * 1_000_000)
        )
    elif "dead_us" in summary.columns:
        in_bucket = in_bucket & (
            at_us < bucket_us + F.col("live_us") + F.col("dead_us")
        )
    else:
        raise ValueError(
            "live_at needs the bucket width: pass width=... or use an "
            "input that carries dead_us (heartbeat_summary/"
            "heartbeat_rollup rows)"
        )
    return summary.where(in_bucket).select(
        *key_cols,
        "bucket",
        F.exists(
            "ranges",
            lambda r: (r["s"] <= at_us) & (at_us < r["e"]),
        ).alias("live"),
    )


def state_interpolated(
    partials: DataFrame,
    key_cols: list[str],
    width: str,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Timescale ``interpolated_duration_in`` semantics over stored
    state partials (:func:`state_partials` at the SAME ``width``):
    time-in-state per (key, bucket) with LOCF carried ACROSS bucket
    boundaries, on a DENSE per-key bucket grid.

    Plain ``durs`` covers only [first_obs_in_bucket, bucket_end) and
    only observed buckets; with interpolation

    - the head [bucket_start, first_obs) of every observed bucket is
      attributed to the state carried in from the key's previous
      observed bucket (``last_state``, LOCF across any gap);
    - every EMPTY bucket between a key's first and last observed
      bucket becomes a row whose full width is attributed to the
      carried state (the gapfill+locf aggregate Timescale composes
      interpolated accessors with);
    - each key's first bucket keeps its observed coverage (NULL prev,
      Timescale's convention).

    The net effect: every observation is accounted from its own
    timestamp to the NEXT observation (across buckets), with the
    key's final observation held to its bucket end — which is exactly
    the segment-clipping formulation the cross-engine oracle computes
    directly, making rollup-shaped storage and clipping-shaped truth
    provably equal (driver entry + test).

    Scale shape: one per-key bounds aggregate + sequence/explode grid
    (|keys| × |buckets| rows, same as dense_grid's per-key mode), a
    left join back to the cagg-sized partials table, and ONE lag-LOCF
    window over it — facts are never re-read, no Python. The map
    adjustment is bounded higher-order expressions over the ≤|states|
    entry array.
    """
    from timescale_cdc_spark.functions.ident import sql_ident

    secs = bucket_seconds(width)
    w_us = secs * 1_000_000
    ks = [sql_ident(c) for c in key_cols]
    kcsv = ", ".join(ks)
    p = partials.selectExpr(
        "*",
        f"cast(unix_micros({sql_ident(bucket_col)}) / 1000000 as long) "
        "as _eb",
    )
    grid = (
        p.groupBy(*key_cols)
        .agg(F.expr("min(_eb) as _mn"), F.expr("max(_eb) as _mx"))
        .selectExpr(
            *ks,
            f"explode(sequence(_mn, _mx, {secs})) as _eb",
        )
    )
    # carry / head_us / entries materialize as NAMED columns so the
    # map adjustment can be one parsed SQL string (round 13 — Column
    # lambdas cost ~0.1 s each at build time; same expressions, same
    # F.when CASE semantics)
    dense = grid.join(p, [*key_cols, "_eb"], "left").selectExpr(
        "*",
        f"last(last_state, true) over (partition by {kcsv} "
        "order by _eb rows between unbounded preceding and "
        "1 preceding) as _carry",
        "cast(first_us - _eb * 1000000 as long) as _head_us",
        "map_entries(coalesce(durs, cast(map() as map<string,long>)))"
        " as _entries",
    )
    bumped = (
        "transform(_entries, e -> named_struct('key', e.key, "
        "'value', e.value + CASE WHEN e.key = _carry THEN _head_us "
        "ELSE cast(0 as long) END))"
    )
    head_entry = (
        "array(named_struct('key', _carry, 'value', "
        f"CASE WHEN n IS NOT NULL THEN _head_us "
        f"ELSE cast({w_us} as long) END))"
    )
    interp_entries = (
        "CASE WHEN _carry IS NULL THEN _entries "
        "WHEN n IS NOT NULL AND "
        f"exists(_entries, e -> e.key = _carry) THEN {bumped} "
        f"ELSE concat(_entries, {head_entry}) END"
    )
    return dense.selectExpr(
        *ks,
        "timestamp_seconds(_eb) as bucket",
        f"map_from_entries(array_sort({interp_entries})) as durs",
        "coalesce(n, 0) as n",
    )
