"""Relational query surface (SURVEY.md §2 Tier B, B12-B40 + B43 batch
analog). The reference's operating model is ad-hoc SQL over the event
log and entity tables (reference: readme.md:107-121, indexes
init.sql:64-66); each function here is one operator family expressed
Spark-first, with an exactly-matching DuckDB oracle.

Scale notes are in each docstring: what Catalyst does with the plan and
why it survives 100 TB (pushdown, broadcast, partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from timescale_cdc_spark.queries.base import REVENUE_EXPR, register, t

# ---------------------------------------------------------------------------
# Flagship (entry() smoke): join + agg + window in one plan.
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
WITH g AS (
  SELECT c_mktsegment,
         date_trunc('month', o_orderdate) AS order_month,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
              AS DOUBLE) AS revenue,
         COUNT(DISTINCT o_orderkey) AS n_orders
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment, order_month, revenue, n_orders,
       ROW_NUMBER() OVER (PARTITION BY order_month
                          ORDER BY revenue DESC, c_mktsegment) AS rev_rank
FROM g
"""


@register("flagship_segment_revenue", FLAGSHIP_ORACLE)
def flagship_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment per order month, ranked within month.

    Scale: lineitem⋈orders is a shuffle join on orderkey (both huge);
    customer joins broadcast-or-shuffle per AQE. Aggregation is
    partial (map-side) before the shuffle. Decimal arithmetic keeps the
    result bit-exact vs the oracle.
    """
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    g = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(
            "c_mktsegment",
            F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        )
        .agg(
            F.sum(F.expr(REVENUE_EXPR)).alias("rev_dec"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .select(
            "c_mktsegment",
            "order_month",
            F.col("rev_dec").cast("double").alias("revenue"),
            "n_orders",
        )
    )
    w = W.partitionBy("order_month").orderBy(F.desc("revenue"), F.asc("c_mktsegment"))
    return g.withColumn("rev_rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# B12 scan + projection (pushdown), B15-B17 filters/projection
# ---------------------------------------------------------------------------


@register(
    "b12_scan_projection",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def b12_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with column pruning + predicate pushdown (B12).

    The physical plan must show ReadSchema with exactly 5 columns and
    PushedFilters: [GreaterThanOrEqual(l_quantity,45.0)] — at 100 TB
    this is the difference between reading 4 columns and 16.
    """
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "b15_filter_time_slice",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def b15_filter_time_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range slice (B15) — the hypertable chunk-pruning analog
    (reference init.sql:70): with an event_date-partitioned log this
    becomes Hive partition pruning; on raw parquet it is row-group
    min/max skipping on ts."""
    ev = t(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    ).select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "b16_filter_in_like_null",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_orderdate IS NOT NULL
    """,
)
def b16_filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / LIKE / IS NULL predicates (B16) — the null-convention
    filters of the envelope (reference readme.md:262-265:
    `before IS NULL` ⇔ INSERT)."""
    od = t(spark, sf_dir, "orders")
    return od.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@register(
    "b17_projection_computed",
    """
    SELECT event_id,
           CAST(ts AS DATE) AS event_date,
           upper(event_type) AS event_type_uc,
           value * 2.0 AS value_x2
    FROM events
    """,
)
def b17_projection_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed columns (B17): derive event_date exactly
    as the log's partition column derivation (SURVEY §1.3)."""
    return t(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("date").alias("event_date"),
        F.upper("event_type").alias("event_type_uc"),
        (F.col("value") * 2.0).alias("value_x2"),
    )


# ---------------------------------------------------------------------------
# B18-B24 join family
# ---------------------------------------------------------------------------


@register(
    "b18_join_inner",
    """
    SELECT n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def b18_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (B18): fact⋈dim enrich, the 'asset events joined
    to current asset row' pattern. Catalyst picks broadcast for nation
    automatically (25 rows)."""
    od = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    na = t(spark, sf_dir, "nation")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(na, cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(14,2))"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "b19_join_left_outer",
    """
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 0) AS DOUBLE)
             AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def b19_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (B19): customers kept with zero orders — the
    snapshot-diff building block (full-outer variant drives CDC op
    derivation, see cdc/capture.py)."""
    cu = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.expr("CAST(o_totalprice AS DECIMAL(14,2))")), F.lit(0)
            )
            .cast("double")
            .alias("total_spend"),
        )
    )


@register(
    "b20_join_semi",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers_with_orders
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def b20_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (B20): 'assets that have ≥1 change event'. Semi
    join never duplicates the left side — cheaper than inner+distinct."""
    cu = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_with_orders"))
    )


@register(
    "b20_join_anti",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-05-01 00:00:00')
    """,
)
def b20_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (B20): 'assets with no change event in the recent
    window' — the dormant-entity audit."""
    cu = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-05-01 00:00:00").cast("timestamp")
    )
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "b21_join_broadcast",
    """
    SELECT r_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def b21_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast join (B21): region/nation are tiny dims —
    F.broadcast() pins the hash-join side so the 100 TB fact table
    never shuffles for them."""
    od = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    na = t(spark, sf_dir, "nation")
    re = t(spark, sf_dir, "region")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(14,2))"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "b22_range_join",
    """
    SELECT s.event_id AS signup_event_id, s.user_id,
           COUNT(c.event_id) AS clicks_within_1h
    FROM events s
    LEFT JOIN events c
      ON c.user_id = s.user_id
     AND c.event_type = 'click'
     AND c.ts > s.ts
     AND c.ts <= s.ts + INTERVAL 1 HOUR
    WHERE s.event_type = 'signup'
    GROUP BY s.event_id, s.user_id
    """,
)
def b22_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (B22): 'anomaly events within a window of an
    asset change' (Timescale-idiomatic). The user_id equi-key keeps it
    a hash join with a range residual — never a nested-loop cross
    product. At 100 TB: both sides also bucketed by time to bound
    per-key fan-out."""
    ev = t(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").alias("s")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    joined = s.join(
        c,
        (F.col("c.user_id") == F.col("s.user_id"))
        & (F.col("c.ts") > F.col("s.ts"))
        & (F.col("c.ts") <= F.col("s.ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy(
        F.col("s.event_id").alias("signup_event_id"),
        F.col("s.user_id").alias("user_id"),
    ).agg(F.count("c.event_id").alias("clicks_within_1h"))


@register(
    "b23_asof_join",
    """
    WITH cand AS (
      SELECT p.event_id AS purchase_event_id, p.user_id, p.ts AS purchase_ts,
             c.value AS click_value,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM events p
      JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
      WHERE p.event_type = 'purchase'
    )
    SELECT purchase_event_id, user_id, purchase_ts, click_value
    FROM cand WHERE rn = 1
    """,
)
def b23_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (B23): latest click at-or-before each purchase, per
    user — the 'row state as of time T' reconstruction pattern
    (reference's log replay, readme.md:214-220). Spark lacks a native
    as-of join; equi-join on the key + row_number over (ts DESC,
    event_id DESC) is the composition (SURVEY B23)."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    j = p.join(
        c,
        (F.col("c.user_id") == F.col("p.user_id")) & (F.col("c.ts") <= F.col("p.ts")),
        "inner",
    )
    w = W.partitionBy("p.event_id").orderBy(F.desc("c.ts"), F.desc("c.event_id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p.event_id").alias("purchase_event_id"),
            F.col("p.user_id").alias("user_id"),
            F.col("p.ts").alias("purchase_ts"),
            F.col("c.value").alias("click_value"),
        )
    )


@register(
    "b24_cross_join",
    """
    SELECT r_name, d.event_type, COUNT(*) AS n_combos
    FROM region CROSS JOIN (SELECT DISTINCT event_type FROM events) d
    GROUP BY r_name, d.event_type
    """,
)
def b24_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join (B24): dimension scaffold (all region ×
    event-type combos). Cross joins are only ever allowed on provably
    tiny sides — the all-pairs version of similarity is banned at scale
    (SURVEY §7 'never all-pairs')."""
    re = t(spark, sf_dir, "region")
    d = t(spark, sf_dir, "events").select("event_type").distinct()
    return (
        re.crossJoin(d)
        .groupBy("r_name", "event_type")
        .agg(F.count("*").alias("n_combos"))
    )


# ---------------------------------------------------------------------------
# B25-B27 aggregation family
# ---------------------------------------------------------------------------


@register(
    "b25_agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def b25_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate (B25), TPC-H Q1 shape: the canonical 'events per
    (schema, table, operation)' rollup of the CDC log. Map-side partial
    aggregation means the shuffle carries |groups| rows per partition,
    not |input| — the reason this survives 100 TB."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr("CAST(l_quantity AS DECIMAL(12,2))")).alias("qty_dec"),
            F.sum(F.expr("CAST(l_extendedprice AS DECIMAL(12,2))")).alias("base_dec"),
            F.sum(F.expr(REVENUE_EXPR)).alias("disc_dec"),
            F.sum(F.expr("CAST(l_discount AS DECIMAL(3,2))")).alias("disc_sum_dec"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("qty_dec").cast("double").alias("sum_qty"),
            F.col("base_dec").cast("double").alias("sum_base_price"),
            F.col("disc_dec").cast("double").alias("sum_disc_price"),
            (F.col("qty_dec").cast("double") / F.col("count_order")).alias("avg_qty"),
            (F.col("disc_sum_dec").cast("double") / F.col("count_order")).alias(
                "avg_disc"
            ),
            "count_order",
        )
    )


@register(
    "b26_distinct_counts",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def b26_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct / count-distinct (B26). Exact count-distinct expands to
    a two-phase aggregate; at 100 TB prefer approx_count_distinct
    (see b26_approx_distinct, rows-only check)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@register("b26_approx_distinct")  # HLL sketches differ per engine → rows-only check
def b26_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (B26 at-scale form): HyperLogLog++ sketch,
    single pass, constant memory — the 100 TB answer to COUNT(DISTINCT).
    No oracle: sketch estimates are engine-specific by construction."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
    )


@register(
    "b27_rollup",
    """
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS event_day,
           COUNT(*) AS n
    FROM events
    GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
    """,
)
def b27_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup / grouping sets (B27): op counts by (table), (table,op),
    () — the multi-granularity monitoring rollup."""
    ev = t(spark, sf_dir, "events").withColumn(
        "event_day_raw", F.col("ts").cast("date")
    )
    return (
        ev.rollup("event_type", "event_day_raw")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("event_day_raw").cast("string"), F.lit("ALL")).alias(
                "event_day"
            ),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# B28-B31 window / ordering family
# ---------------------------------------------------------------------------


@register(
    "b28_window_rank_recent",
    """
    WITH r AS (
      SELECT event_id, ts, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_id, ts, user_id, event_type, value, rn
    FROM r WHERE rn <= 3
    """,
)
def b28_window_rank_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (B28): top-3 most recent events per type — what
    the reference's btree (schema,table,ts DESC,event_id) serves
    (init.sql:65). In Spark: partitioned window, no global sort."""
    w = W.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_id", "ts", "user_id", "event_type", "value", "rn")
    )


@register(
    "b29_window_analytic",
    """
    SELECT event_id, user_id, ts, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           CAST(SUM(CAST(value AS DECIMAL(10,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_n
    FROM events
    """,
)
def b29_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window (B29): lag + running aggregates per key — the
    'previous value per key' CDC diff primitive. Decimal running sum
    keeps cumulative totals bit-exact."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.sum(F.expr("CAST(value AS DECIMAL(10,2))"))
        .over(frame)
        .cast("double")
        .alias("running_value"),
        F.count("*").over(frame).alias("running_n"),
    )


@register(
    "b30_latest_state",
    """
    WITH r AS (
      SELECT user_id, ts, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, ts AS last_ts, event_id AS last_event_id,
           event_type AS last_event_type, value AS last_value
    FROM r WHERE rn = 1
    """,
)
def b30_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state reconstruction (B30): fold the log → current row
    per key, last event wins — the core CDC replay (cdc/replay.py
    applies this to real envelopes; this is the fixture-table form)."""
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "b31_sort_limit_topk",
    """
    SELECT event_id, ts, user_id, event_type
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 50
    """,
)
def b31_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT N (B31): Spark plans TakeOrderedAndProject —
    per-partition top-N then a K-way driver merge; no global sort ever
    materializes (what the reference's ts DESC index serves,
    init.sql:66)."""
    return (
        t(spark, sf_dir, "events")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
        .select("event_id", "ts", "user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# B32 set operations
# ---------------------------------------------------------------------------


@register(
    "b32_set_except",
    """
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS event_day
    FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT DISTINCT user_id, CAST(ts AS DATE)
    FROM events WHERE event_type = 'purchase'
    """,
)
def b32_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (B32): 'events in the log but not in a topic sink' lag
    audit shape — (user, day) pairs that clicked but did not purchase."""
    ev = t(spark, sf_dir, "events").withColumn(
        "event_day", F.col("ts").cast("date")
    )
    click = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "event_day")
        .distinct()
    )
    buy = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "event_day")
        .distinct()
    )
    return click.exceptAll(buy)


@register(
    "b32_set_union_intersect",
    """
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT 'union' AS tag, COUNT(*) AS n FROM (SELECT * FROM c UNION SELECT * FROM p)
    UNION ALL
    SELECT 'intersect' AS tag, COUNT(*) AS n
    FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
    """,
)
def b32_set_union_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT (B32): re-merge per-table views into the full
    log (A11 ⊕ B32 invariant of SURVEY §5)."""
    ev = t(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    p = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    u = c.union(p).distinct().agg(F.count("*").alias("n")).select(
        F.lit("union").alias("tag"), "n"
    )
    i = c.intersect(p).agg(F.count("*").alias("n")).select(
        F.lit("intersect").alias("tag"), "n"
    )
    return u.union(i)
