"""Additional query-surface coverage: cube, pivot, extended window
frames, time_bucket, approximate quantiles (SURVEY.md §2 B27/B29/B34
completions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timescale_cdc_spark.functions.time import time_bucket
from timescale_cdc_spark.queries.base import register, t


@register(
    "b27_cube",
    """
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(user_id % 5 AS VARCHAR), 'ALL') AS user_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE (event_type, CAST(user_id % 5 AS VARCHAR))
    """,
)
def b27_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (B27): all grouping-set combinations in one pass — Spark
    expands to a single aggregate over the grouping-id expansion, no
    multi-scan."""
    ev = t(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 5).cast("string")
    )
    return (
        ev.cube("event_type", "user_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(10,2))"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("user_bucket", F.lit("ALL")).alias("user_bucket"),
            "n",
            "total_value",
        )
    )


@register(
    "b27_pivot",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
)
def b27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (B27 family): event-type counts as columns per user.
    Explicit pivot values keep it a single-pass aggregate (no distinct
    pre-scan) — required form at scale."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "b29_window_frames",
    """
    SELECT event_id, user_id, ts,
           LEAD(event_type) OVER w AS next_type,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS final_type,
           CAST(SUM(CAST(value AS DECIMAL(10,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS avg_value_3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def b29_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames (B29 completion): lead / first / last / sliding
    3-row moving average (decimal-exact)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    last3 = w.rowsBetween(-2, 0)
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(full).alias("final_type"),
        (
            F.sum(F.expr("CAST(value AS DECIMAL(10,2))"))
            .over(last3)
            .cast("double")
            / F.count("*").over(last3)
        ).alias("avg_value_3"),
    )


@register(
    "b34_time_bucket",
    """
    SELECT to_timestamp(floor(epoch(ts) / 900) * 900) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def b34_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time_bucket (B34): Timescale's signature bucketing function as
    epoch-floor sugar (functions/time.py) — 15-minute buckets over the
    event stream."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(time_bucket("15 minutes", "ts").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(10,2))"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register("b26_approx_quantiles")  # t-digest/GK sketches are engine-specific
def b26_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (B26 at-scale family): percentile_approx
    over order values — single-pass mergeable sketch, the 100 TB
    replacement for exact percentiles (rows-only check: sketch
    boundaries are engine-specific)."""
    od = t(spark, sf_dir, "orders")
    return od.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95, 0.99], 10000).alias(
            "price_quantiles"
        ),
        F.count("*").alias("n"),
    )


@register(
    "b22_range_join_bucketed",
    """
    SELECT s.event_id AS signup_id, e.event_id AS error_id
    FROM events s
    JOIN events e
      ON e.event_type = 'error'
     AND abs(CAST(floor(epoch(e.ts)) AS BIGINT)
             - CAST(floor(epoch(s.ts)) AS BIGINT)) <= 300
    WHERE s.event_type = 'signup'
    """,
)
def b22_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22 without an equi key: every error event within ±5 minutes of
    any signup — the pure time-proximity join. Implemented with the
    bucketed range join (operators/timejoin.py): tolerance-width
    buckets turn the would-be nested loop into a hash join on bucket
    id; the oracle is the naive non-equi join."""
    from timescale_cdc_spark.operators.timejoin import range_join_bucketed

    ev = t(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    return range_join_bucketed(s, e, "s_ts", "e_ts", tolerance_seconds=300).select(
        "signup_id", "error_id"
    )


@register(
    "b44_sessionize",
    """
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - epoch(LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                    OR LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS session_id
      FROM o
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
)
def b44_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, batch analog (B44): per-user sessions closing
    after 30 minutes of silence, via F.session_window — the streaming-
    native operator run in batch mode; the oracle is the classic
    gaps-and-islands formulation (lag + cumulative flag sum), proving
    the two formulations agree."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sess"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "a16_unique_enforcement",
    """
    WITH r AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id
    FROM r WHERE rn = 1
    """,
)
def a16_unique_enforcement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 uniqueness constraint at ingest: keep the first row per
    natural key (the serialnumber UNIQUE analog, init.sql:93) —
    deterministic keep-first window, the same machinery as C1 dedup."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
        )
    )


@register(
    "b33_string_fns2",
    """
    SELECT doc_id,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           rpad(lang, 4, '.') AS lang_padded,
           replace(source, 'src', 'source-') AS source_renamed,
           translate(lang, 'aeiou', 'AEIOU') AS lang_vowels_uc,
           strpos(text, 'the') AS first_the_pos,
           reverse(lang) AS lang_rev,
           repeat(lang, 2) AS lang_x2
    FROM documents
    """,
)
def b33_string_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions, second family (B33): pad/replace/translate/
    locate/reverse/repeat — Spark locate == DuckDB strpos (both
    1-based, 0 when absent)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.rpad("lang", 4, ".").alias("lang_padded"),
        F.regexp_replace("source", "src", "source-").alias("source_renamed"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_vowels_uc"),
        F.locate("the", F.col("text")).alias("first_the_pos"),
        F.reverse("lang").alias("lang_rev"),
        F.repeat("lang", 2).alias("lang_x2"),
    )


@register(
    "b35_math_fns2",
    """
    SELECT event_id,
           round(exp(value / 100.0), 6) AS value_exp,
           CAST(sign(value - 50.0) AS DOUBLE) AS sign_centered,
           mod(CAST(round(value * 100) AS BIGINT), 7) AS cents_mod7,
           greatest(value, 100.0 - value) AS max_side,
           least(value, 100.0 - value) AS min_side,
           round(power(value, 0.5), 6) AS value_pow_half,
           round(log10(value + 1.0), 6) AS value_log10
    FROM events
    """,
)
def b35_math_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions, second family (B35): exp/sign/mod/greatest/
    least/fractional power/log10 — transcendentals pinned at 6
    decimals (cross-engine libm last-ulp differences)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(F.exp(F.col("value") / 100.0), 6).alias("value_exp"),
        F.signum(F.col("value") - 50.0).cast("double").alias("sign_centered"),
        # explicit round: Spark's double→bigint cast truncates while
        # DuckDB's rounds — never cast an unrounded double to int
        (F.round(F.col("value") * 100, 0).cast("bigint") % 7).alias("cents_mod7"),
        F.greatest(F.col("value"), 100.0 - F.col("value")).alias("max_side"),
        F.least(F.col("value"), 100.0 - F.col("value")).alias("min_side"),
        F.round(F.pow(F.col("value"), 0.5), 6).alias("value_pow_half"),
        F.round(F.log10(F.col("value") + 1.0), 6).alias("value_log10"),
    )


@register(
    "b16_regex_filters",
    """
    SELECT event_id, event_type, props
    FROM events
    WHERE regexp_matches(props, '"k": [0-9]?[0-9]}$')
      AND event_type ILIKE '%I%'
    """,
)
def b16_regex_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + case-insensitive LIKE filters (B16 completion): Spark
    rlike == DuckDB regexp_matches (unanchored search), Spark ilike ==
    DuckDB ILIKE."""
    ev = t(spark, sf_dir, "events")
    return ev.filter(
        F.col("props").rlike('"k": [0-9]?[0-9]}$')
        & F.col("event_type").ilike("%I%")
    ).select("event_id", "event_type", "props")


@register(
    "b27_grouping_sets",
    """
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS event_day,
           COUNT(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
    """,
)
def b27_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (B27): by-type, by-day, and grand total
    in one aggregate pass — expressed through the engine's SQL entry
    point (Spark SQL text identical in spirit to the oracle)."""
    ev = t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(CAST(CAST(ts AS DATE) AS STRING), 'ALL') AS event_day,
               COUNT(*) AS n
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
        """
    )


@register(
    "b37_posexplode",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           generate_subscripts(words, 1) - 1 AS pos,
           unnest(words) AS word
    FROM w
    """,
)
def b37_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (B37 completion): tokens with ordinal positions —
    the order-preserving flatten (Spark pos is 0-based; oracle aligns
    with generate_subscripts - 1)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    )


@register(
    "b27_unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
)
def b27_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (B27 family): wide measures → (measure, value) rows via
    stack() — single-scan, vs the oracle's 3-scan UNION ALL
    formulation (same result, one pass)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
        " AS (measure, value)",
    )
