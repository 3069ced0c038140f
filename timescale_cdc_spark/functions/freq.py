"""Timescale toolkit ``freq_agg`` / ``topn_agg`` analog: a MERGEABLE
heavy-hitters summary per (key, time bucket) using the Misra-Gries
algorithm — the classic bounded-memory frequent-items sketch whose
merge (Agarwal et al., "Mergeable Summaries", PODS 2012) is: sum the
counter maps, then decrement every counter by the (k+1)-th largest
and drop the non-positive ones.

Guarantees carried by every summary (and preserved by
:func:`freq_rollup`, pinned by tests):

- undercount only: ``est <= true`` for every tracked item;
- bounded error: ``true - est <= err`` (the summary's scalar error
  column — the sum of all compression decrements applied);
- completeness: any item with ``true > err`` IS in the summary, so
  with ``max_size`` counters no item with frequency above ``n /
  (max_size + 1)`` of a merge-path's mass can be missed;
- exactness in the small regime: if a group never holds more than
  ``max_size`` distinct items, ``err == 0`` and the summary equals
  the exact groupBy counts (DuckDB-parity-tested).

Everything is JVM expressions — exact per-bucket counts from a
two-level groupBy riding ONE (key, bucket) repartition, compression
and merge as higher-order array/map folds, no Python eval, no
collect. Rollup merges stored partials to coarser buckets without
re-reading facts, same contract as the other rollup families in
functions/hyper.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timescale_cdc_spark.functions.hyper import epoch_bucket
from timescale_cdc_spark.functions.state import _map_sum_sql


def _entries_desc_sql(mg: str) -> str:
    """SQL text: map entries sorted by count DESC, item ASC
    (deterministic). Text, not Column lambdas — py4j lambda
    construction costs ~0.1 s per lambda at plan-build time
    (round 13; see state._map_sum_sql)."""
    return (
        f"array_sort(map_entries({mg}), "
        "(a, b) -> CASE WHEN a.value > b.value THEN -1 "
        "WHEN a.value < b.value THEN 1 "
        "WHEN a.key < b.key THEN -1 "
        "WHEN a.key > b.key THEN 1 ELSE 0 END)"
    )


def _compress_struct_sql(mg: str, max_size: int) -> str:
    """SQL text of the Misra-Gries compression to ``max_size``
    counters — subtract the (max_size+1)-th largest count from every
    counter and drop the non-positive — returned as ONE
    ``struct(mg, err)`` expression. ``get`` (0-based) yields NULL —
    not an ANSI error — when the summary is already small enough.

    Round 15 (optimization guide §1.2 step 2): the previous form
    returned separate (map, decrement) SQL strings whose textual
    expansion evaluated the sorted-entries array FOUR times per row /
    per fold step (once in the decrement, once in the filter, twice
    via the decrement embedded in the filter body and subtraction) —
    and in :func:`freq_rollup` each of those re-evaluated the
    ``map_zip_with`` counter sum feeding it. Higher-order functions
    are CodegenFallback expressions: codegen subexpression
    elimination never sees them, so textual duplication IS repeated
    runtime work. The sorted entries (``_se``) and the decrement
    (``_t``) are now let-bound via single-element ``transform``
    arrays — each evaluated exactly once; the arithmetic is
    unchanged expression for expression.

    Small-regime short-circuit (round 15): with ≤ ``max_size``
    counters the (max_size+1)-th largest does not exist, so the
    decrement is 0 and the compression is the identity — but the old
    expression still SORTED the entries, filtered, subtracted 0 and
    rebuilt the map at every fold step. Misra-Gries summaries hold
    at most max_size counters by invariant, so in the common
    low-cardinality regime EVERY merge step took the no-op path at
    full price. The guard returns ``struct(mg, 0)`` directly; entry
    content is identical (every counter is positive by the MG
    invariant, and the decrement-by-0 rebuild changed nothing but
    map-entry ORDER, which no consumer observes — rows are exploded
    sets, ``topn`` re-sorts, and the merge's map_zip_with is
    key-keyed)."""
    entries = _entries_desc_sql("_mg")
    t = f"coalesce(get(_se, {max_size}).value, cast(0 as long))"
    new_mg = (
        "map_from_entries(transform(filter(_se, e -> e.value > _t), "
        "e -> named_struct('key', e.key, 'value', e.value - _t)))"
    )
    inner = (
        f"get(transform(array({t}), _t -> "
        f"named_struct('mg', {new_mg}, 'err', _t)), 0)"
    )
    compress = f"get(transform(array({entries}), _se -> {inner}), 0)"
    small = (
        f"named_struct('mg', _mg, 'err', cast(0 as long))"
    )
    return (
        f"get(transform(array({mg}), _mg -> "
        f"CASE WHEN size(_mg) <= {max_size} THEN {small} "
        f"ELSE {compress} END), 0)"
    )


def freq_partials(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    item_col: str,
    width: str,
    max_size: int = 16,
) -> DataFrame:
    """``freq_agg`` partial per (key, bucket), mergeable by
    :func:`freq_rollup`: ``mg`` (item → undercounted frequency, at
    most ``max_size`` entries), ``err`` (max undercount of any item,
    0 when the bucket held <= max_size distinct items), and exact
    ``n`` (total observations).

    One exchange: an explicit (key, bucket) repartition that BOTH
    groupBys ride — the exact per-item count clusters on a superset
    of it, and the per-bucket collect clusters on it exactly."""
    base = df.select(
        *key_cols,
        epoch_bucket(ts_col, width),
        F.col(item_col).cast("string").alias("_item"),
    ).repartition(*[F.col(c) for c in key_cols], F.col("_eb"))
    exact = base.groupBy(*key_cols, "_eb", "_item").agg(
        F.count("*").alias("_c")
    )
    collected = exact.groupBy(*key_cols, "_eb").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_item", "_c")))
        ).alias("_exact"),
        F.sum("_c").alias("n"),
    )
    # compression as ONE struct column in its OWN select (two field
    # references below keep the producer materialized — the
    # CollapseProject rule inlines single-reference producers, which
    # would re-duplicate the work the struct form exists to share)
    return collected.select(
        *key_cols,
        "_eb",
        F.expr(_compress_struct_sql("_exact", max_size)).alias("_cs"),
        "n",
    ).select(
        *key_cols,
        F.timestamp_seconds("_eb").alias("bucket"),
        F.col("_cs.mg").alias("mg"),
        F.col("_cs.err").cast("long").alias("err"),
        "n",
    )


def freq_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    item_col: str,
    width: str,
    max_size: int = 16,
) -> DataFrame:
    """Direct Timescale ``freq_agg`` per (key, bucket) — the partial
    view (a Misra-Gries summary IS the queryable aggregate)."""
    return freq_partials(
        df, ts_col, key_cols, item_col, width, max_size
    )


def freq_rollup(
    partials: DataFrame,
    key_cols: list[str],
    width: str,
    max_size: int = 16,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Timescale ``rollup(freq_agg)``: merge stored fine-bucket
    Misra-Gries summaries to coarser buckets without re-reading
    facts. Each fold step sums the counter maps (undercounts add),
    adds the scalar errors, and re-compresses to ``max_size`` —
    the PODS'12 mergeable-summaries construction, which preserves
    the undercount/completeness guarantees at every width.

    Deterministic: the fold runs in bucket-chronological order via a
    comparator sort (the struct carries a map, so natural ordering is
    unavailable), and compression tie-breaks are (count desc, item
    asc)."""
    df = partials.withColumn("_ceb", epoch_bucket(bucket_col, width))
    # the whole fold as ONE SQL string — see state.state_rollup
    # (round 13) for the build-time rationale; expressions and NULL
    # semantics are the exact Column forms this replaced
    from timescale_cdc_spark.functions.ident import sql_ident

    st = (
        f"struct(unix_micros({sql_ident(bucket_col)}) AS b_us, "
        "mg, err, n)"
    )
    zero = (
        "named_struct('b_us', cast(0 as long), "
        "'mg', cast(map() as map<string,long>), "
        "'err', cast(0 as long), 'n', cast(0 as long))"
    )
    cmp_ = (
        "(a, b) -> CASE WHEN a.b_us < b.b_us THEN -1 "
        "WHEN a.b_us > b.b_us THEN 1 ELSE 0 END"
    )
    summed = _map_sum_sql("acc.mg", "p.mg")
    # let-bind the compressed struct per merge step: the counter sum
    # and its sort run ONCE per step (the old two-string form
    # re-evaluated both 4x — see _compress_struct_sql)
    merge = (
        f"(acc, p) -> get(transform(array({_compress_struct_sql(summed, max_size)}), "
        "_cs -> named_struct("
        "'b_us', p.b_us, "
        "'mg', _cs.mg, "
        "'err', acc.err + p.err + _cs.err, "
        "'n', acc.n + p.n)), 0)"
    )
    merged = df.groupBy(*key_cols, "_ceb").agg(
        F.expr(
            f"aggregate(array_sort(collect_list({st}), {cmp_}), "
            f"{zero}, {merge})"
        ).alias("_s")
    )
    return merged.select(
        *key_cols,
        F.timestamp_seconds("_ceb").alias("bucket"),
        F.expr("_s.mg").alias("mg"),
        F.expr("_s.err").alias("err"),
        F.expr("_s.n").alias("n"),
    )


def topn(
    agg: DataFrame,
    n: int,
    key_cols: list[str],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Timescale ``topn(agg, n)`` accessor: the top-``n`` tracked
    items per (key, bucket) with their frequency BOUNDS — the
    summary's estimate undercounts, so the true count lies in
    ``[min_freq, max_freq] = [est, est + err]`` — plus the fraction
    bounds against the exact total ``n``."""
    exploded = agg.select(
        *key_cols,
        bucket_col,
        "err",
        F.col("n").alias("total"),
        F.explode(
            F.expr(f"slice({_entries_desc_sql('mg')}, 1, {n})")
        ).alias("_e"),
    )
    return exploded.select(
        *key_cols,
        bucket_col,
        F.col("_e")["key"].alias("item"),
        F.col("_e")["value"].alias("min_freq"),
        (F.col("_e")["value"] + F.col("err")).alias("max_freq"),
        F.round(
            F.col("_e")["value"] / F.col("total").cast("double"), 6
        ).alias("min_frac"),
        F.round(
            (F.col("_e")["value"] + F.col("err"))
            / F.col("total").cast("double"),
            6,
        ).alias("max_frac"),
        "total",
    )
