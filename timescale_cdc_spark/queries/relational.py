"""Relational query surface (SURVEY.md §2 Tier B, B12-B32 + B43 batch
analog). The reference's operating model is ad-hoc SQL over the event
log and entity tables (reference: readme.md:107-121, indexes
init.sql:64-66); each function here is one operator family expressed
Spark-first, with an exactly-matching DuckDB oracle.

Round 2: the registry is consolidated to <= 50 entries (one per §2
operator) so EVERY entry lands inside the driver's correctness window.
Merged entries note the operators they cover in their docstring; the
full §2 -> entry map lives in README.md.

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
# B12+B17 scan/projection (pushdown) — merged; B15/B16 filters
# ---------------------------------------------------------------------------


@register(
    "b12_b17_scan_projection_computed",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           CAST(l_shipdate AS DATE) AS ship_date,
           lower(l_returnflag) AS flag_lc,
           l_extendedprice * 2.0 AS price_x2
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def b12_b17_scan_projection_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with column pruning + predicate pushdown (B12) and
    computed projection columns (B17) in one plan.

    The physical plan must show ReadSchema with exactly the 6 source
    columns and PushedFilters: [GreaterThanOrEqual(l_quantity,45.0)] —
    at 100 TB this is the difference between reading 6 columns and 16.
    Computed columns (date cast, case fold, arithmetic) stay inside
    whole-stage codegen.
    """
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.col("l_shipdate").cast("date").alias("ship_date"),
            F.lower("l_returnflag").alias("flag_lc"),
            (F.col("l_extendedprice") * 2.0).alias("price_x2"),
        )
    )


@register(
    "b15_b16_filter_predicates",
    """
    SELECT 'time_slice' AS variant, event_id, ts, user_id, event_type,
           value, CAST(NULL AS VARCHAR) AS props
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    UNION ALL
    SELECT 'predicates' AS variant, event_id, CAST(NULL AS TIMESTAMP) AS ts,
           CAST(NULL AS BIGINT) AS user_id, event_type,
           CAST(NULL AS DOUBLE) AS value, props
    FROM events
    WHERE event_type IN ('click', 'view', 'signup')
      AND props LIKE '%"k"%'
      AND ts IS NOT NULL
      AND regexp_matches(props, '"k": [0-9]?[0-9]}$')
      AND event_type ILIKE '%I%'
    """,
)
def b15_b16_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 + B16 filter families, variant-tagged (round-9 merge — the
    a15_a16/b18_b24 pattern; every row of both former entries stays
    hash-checked; the freed registry slot went to c4_decontamination).

    variant='time_slice' (B15): time-range slice — the hypertable
    chunk-pruning analog (reference init.sql:70): with an
    event_date-partitioned log this becomes Hive partition pruning; on
    raw parquet it is row-group min/max skipping on ts.

    variant='predicates' (B16): the predicate family in one
    conjunction: IN / LIKE / IS NULL (the envelope's null-convention
    filters, reference readme.md:262-265) plus regex (rlike == DuckDB
    regexp_matches, unanchored) and case-insensitive LIKE (ilike ==
    ILIKE). IN/LIKE/NULL push into the parquet scan; regex evaluates
    post-scan inside codegen — per UNION branch, pushdown is
    unchanged from the standalone entries."""
    ev = t(spark, sf_dir, "events")
    ts_type = ev.schema["ts"].dataType
    time_slice = ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast(ts_type))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast(ts_type))
    ).select(
        F.lit("time_slice").alias("variant"),
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.lit(None).cast("string").alias("props"),
    )
    predicates = ev.filter(
        F.col("event_type").isin("click", "view", "signup")
        & F.col("props").like('%"k"%')
        & F.col("ts").isNotNull()
        & F.col("props").rlike('"k": [0-9]?[0-9]}$')
        & F.col("event_type").ilike("%I%")
    ).select(
        F.lit("predicates").alias("variant"),
        "event_id",
        F.lit(None).cast(ts_type).alias("ts"),
        F.lit(None).cast("bigint").alias("user_id"),
        "event_type",
        F.lit(None).cast("double").alias("value"),
        "props",
    )
    return time_slice.unionByName(predicates)


# ---------------------------------------------------------------------------
# B18-B24 join family
# ---------------------------------------------------------------------------


@register(
    "b18_b24_join_inner_cross",
    """
    SELECT 'inner' AS variant, n_name AS name,
           CAST(NULL AS VARCHAR) AS event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    UNION ALL
    SELECT 'cross' AS variant, r_name AS name, d.event_type,
           COUNT(*) AS n, CAST(NULL AS DOUBLE) AS total_price
    FROM region CROSS JOIN (SELECT DISTINCT event_type FROM events) d
    GROUP BY r_name, d.event_type
    """,
)
def b18_b24_join_inner_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (B18) + bounded cross join (B24) as one
    variant-tagged union — merged in round 8 (the b27/b34_b35/b37_b38
    pattern) to free a registry slot for the round-7 library-family
    entries while keeping every row and column of both former entries
    hash-checked.

    variant='inner' (former b18_join_inner): fact⋈dim enrich, the
    'asset events joined to current asset row' pattern. Catalyst picks
    broadcast for nation automatically (25 rows).

    variant='cross' (former b24_cross_join): dimension scaffold (all
    region × event-type combos). Cross joins are only ever allowed on
    provably tiny sides — the all-pairs version of similarity is
    banned at scale (SURVEY §7 'never all-pairs')."""
    od = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    na = t(spark, sf_dir, "nation")
    inner = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(na, cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(o_totalprice AS DECIMAL(14,2))"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.lit("inner").alias("variant"),
            F.col("n_name").alias("name"),
            F.lit(None).cast("string").alias("event_type"),
            "n",
            "total_price",
        )
    )
    re = t(spark, sf_dir, "region")
    d = t(spark, sf_dir, "events").select("event_type").distinct()
    cross = (
        re.crossJoin(d)
        .groupBy("r_name", "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("cross").alias("variant"),
            F.col("r_name").alias("name"),
            "event_type",
            "n",
            F.lit(None).cast("double").alias("total_price"),
        )
    )
    return inner.unionByName(cross)


@register(
    "b19_b20_join_outer_semi_anti",
    """
    SELECT 'left_outer' AS variant,
           CAST(c_custkey AS VARCHAR) AS key1, c_name AS key2,
           COUNT(o_orderkey) AS n,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 0) AS DOUBLE)
             AS amount
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    UNION ALL
    SELECT 'semi', c_mktsegment, NULL, COUNT(*), NULL
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'anti', c_mktsegment, NULL, COUNT(*), NULL
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-05-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def b19_b20_join_outer_semi_anti(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """B19 left-outer + B20 semi/anti joins, variant-tagged in one
    entry (round 9 merge — the b18_b24 pattern; every merged
    operator's rows stay hash-checked; the freed slot went to the
    LTTB/ASAP downsample entry).

    variant='left_outer': customers kept with zero orders — the
    snapshot-diff building block (full-outer variant drives CDC op
    derivation, see cdc/capture.py). variant='semi': 'assets with ≥1
    change event' per segment — semi never duplicates the left side,
    cheaper than inner+distinct. variant='anti': the dormant-entity
    audit ('no change event in the recent window')."""
    cu = t(spark, sf_dir, "customer")
    od = t(spark, sf_dir, "orders")
    outer = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n"),
            F.coalesce(
                F.sum(F.expr("CAST(o_totalprice AS DECIMAL(14,2))")), F.lit(0)
            )
            .cast("double")
            .alias("amount"),
        )
        .select(
            F.lit("left_outer").alias("variant"),
            F.col("c_custkey").cast("string").alias("key1"),
            F.col("c_name").alias("key2"),
            "n",
            "amount",
        )
    )
    semi = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("semi").alias("variant"),
            F.col("c_mktsegment").alias("key1"),
            F.lit(None).cast("string").alias("key2"),
            "n",
            F.lit(None).cast("double").alias("amount"),
        )
    )
    recent = od.filter(
        F.col("o_orderdate") >= F.lit("2001-05-01 00:00:00").cast("timestamp")
    )
    anti = (
        cu.join(recent, cu.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("anti").alias("variant"),
            F.col("c_mktsegment").alias("key1"),
            F.lit(None).cast("string").alias("key2"),
            "n",
            F.lit(None).cast("double").alias("amount"),
        )
    )
    return outer.unionByName(semi).unionByName(anti)


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
    """Range/interval join (B22), keyless form: every error event
    within ±5 minutes of any signup — the pure time-proximity join
    ('anomaly events near an asset change', Timescale-idiomatic).

    Implemented with the bucketed range join (operators/timejoin.py):
    tolerance-width epoch buckets turn the would-be nested-loop
    cross product into a hash join on bucket id (the plan contains NO
    CartesianProduct / BroadcastNestedLoopJoin — pinned in
    tests/test_plans.py). The equi-key + interval variant (clicks
    within 1h of a signup per user) is the easy case — the same
    operator takes ``extra_on`` for it — and is exercised in
    tests/test_timejoin.py. The oracle is the naive non-equi join."""
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
    "b23_asof_join",
    """
    WITH cand AS (
      SELECT p.event_id AS purchase_event_id, p.user_id, p.ts AS purchase_ts,
             c.value AS click_value,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM events p
      JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click'
       AND c.ts <= p.ts
       AND c.ts >  p.ts - INTERVAL 7 DAY
      WHERE p.event_type = 'purchase'
    )
    SELECT purchase_event_id, user_id, purchase_ts, click_value
    FROM cand WHERE rn = 1
    """,
)
def b23_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (B23) with a bounded lookback: latest click at-or-
    before each purchase, per user, looking back at most 7 days — the
    'row state as of time T' reconstruction pattern (reference's log
    replay, readme.md:214-220).

    Spark lacks a native as-of join; equi-join on the key +
    row_number over (ts DESC, event_id DESC) is the composition
    (SURVEY B23). The TWO-SIDED time bound (c.ts in (p.ts - 7d, p.ts])
    is what makes this scale: per-key candidate fan-out is bounded by
    the horizon instead of growing with the full history of a hot key
    (the classic as-of blowup). The bound is pinned in
    tests/test_plans.py."""
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    j = p.join(
        c,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("c.ts") <= F.col("p.ts"))
        & (F.col("c.ts") > F.col("p.ts") - F.expr("INTERVAL 7 DAY")),
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
    not |input| — the reason this survives 100 TB. Also the full-scan
    aggregate (A20's SELECT-the-world over the biggest fixture)."""
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
           COUNT(*) AS n_events,
           CASE WHEN approx_count_distinct(user_id)
                     BETWEEN 0.9 * COUNT(DISTINCT user_id)
                         AND 1.1 * COUNT(DISTINCT user_id)
                THEN 1 ELSE 0 END AS approx_users_ok,
           CASE WHEN approx_quantile(value, 0.5)
                     BETWEEN quantile_cont(value, 0.4)
                         AND quantile_cont(value, 0.6)
                THEN 1 ELSE 0 END AS approx_p50_ok
    FROM events GROUP BY event_type
    """,
)
def b26_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct / approx-distinct / approx-quantile (B26, whole family).

    Exact COUNT(DISTINCT) expands to a two-phase aggregate; at 100 TB
    the single-pass mergeable sketches are the answer —
    approx_count_distinct (HyperLogLog++) and percentile_approx. Sketch
    VALUES are engine-specific by construction, so the oracle checks
    the sketch's ACCURACY CONTRACT instead: each engine computes its
    own estimate and flags whether it lands within the documented error
    bound of its own exact answer (HLL rsd=0.01 vs a ±10% band; approx
    p50 vs the exact p40..p60 corridor). Both engines must flag 1 —
    a hard, hash-checked signal that the sketches are wired correctly."""
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.01)
    q40 = F.expr("percentile(value, 0.4)")
    q60 = F.expr("percentile(value, 0.6)")
    ap50 = F.percentile_approx("value", 0.5, 10000)
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            exact.alias("n_users"),
            F.count("*").alias("n_events"),
            F.when(
                approx.between(0.9 * exact, 1.1 * exact), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("approx_users_ok"),
            F.when(ap50.between(q40, q60), F.lit(1))
            .otherwise(F.lit(0))
            .alias("approx_p50_ok"),
        )
        .select(
            "event_type", "n_users", "n_events", "approx_users_ok", "approx_p50_ok"
        )
    )


_GM_ROLLUP_SQL = """
    SELECT 'rollup' AS variant,
           COALESCE(event_type, 'ALL') AS key1,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS key2,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
"""

_GM_CUBE_SQL = """
    SELECT 'cube' AS variant,
           COALESCE(event_type, 'ALL') AS key1,
           COALESCE(CAST(user_id % 5 AS VARCHAR), 'ALL') AS key2,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE (event_type, CAST(user_id % 5 AS VARCHAR))
"""

_GM_GSETS_SQL = """
    SELECT 'grouping_sets' AS variant,
           COALESCE(event_type, 'ALL') AS key1,
           COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS key2,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
"""

# Pivot→unpivot round-trip leg aligned to the grouping schema: the
# dense user×type scaffold with zeros proves pivot's fill plus
# unpivot's flatten are lossless inverses (total_value is NULL — the
# leg carries counts only).
_GM_PIVOT_SQL = """
    SELECT 'pivot_unpivot' AS variant,
           CAST(u.user_id AS VARCHAR) AS key1,
           ty.event_type AS key2,
           COALESCE(c.n, 0) AS n,
           CAST(NULL AS DOUBLE) AS total_value
    FROM (SELECT DISTINCT user_id FROM events) u
    CROSS JOIN (SELECT * FROM (VALUES ('click'), ('error'), ('purchase'),
                                      ('signup'), ('view')) t(event_type)) ty
    LEFT JOIN (SELECT user_id, event_type, COUNT(*) AS n
               FROM events GROUP BY 1, 2) c
      ON c.user_id = u.user_id AND c.event_type = ty.event_type
"""


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "b27_grouping_pivot_unpivot",
    f"{_GM_ROLLUP_SQL} UNION ALL {_GM_CUBE_SQL} UNION ALL {_GM_GSETS_SQL}"
    f" UNION ALL {_GM_PIVOT_SQL}",
)
def b27_grouping_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full B27 multi-granularity family in one aligned result:
    ROLLUP, CUBE, explicit GROUPING SETS, and a pivot→unpivot
    round-trip, each tagged by ``variant``.

    (Round 7: merged from the former ``b27_rollup_cube_gsets`` +
    ``b27_pivot_unpivot`` entries — one registry slot instead of two,
    so every registered query fits the driver's 50-entry correctness
    window; both halves stay hash-checked against the combined
    oracle.)

    Grouping legs: op counts by (table), (table, op), () at every
    granularity — the monitoring rollup. Each variant is ONE aggregate
    pass over the grouping-id expansion (no multi-scan); the GROUPING
    SETS leg runs through the engine's SQL entry point (spark.sql) to
    pin the SQL text surface too.

    Pivot leg: event-type counts pivot to wide columns per user
    (explicit pivot values — single-pass aggregate, no distinct
    pre-scan, the required form at scale), then stack() unpivots back
    to (user_id, event_type, n) long form, zeros included — pinned
    against the dense user×type oracle scaffold."""
    ev = t(spark, sf_dir, "events")
    dec_sum = F.sum(F.expr("CAST(value AS DECIMAL(10,2))")).cast("double")

    rolled = (
        ev.withColumn("event_day_raw", F.col("ts").cast("date"))
        .rollup("event_type", "event_day_raw")
        .agg(F.count("*").alias("n"), dec_sum.alias("total_value"))
        .select(
            F.lit("rollup").alias("variant"),
            F.coalesce("event_type", F.lit("ALL")).alias("key1"),
            F.coalesce(F.col("event_day_raw").cast("string"), F.lit("ALL")).alias(
                "key2"
            ),
            "n",
            "total_value",
        )
    )
    cubed = (
        ev.withColumn("user_bucket", (F.col("user_id") % 5).cast("string"))
        .cube("event_type", "user_bucket")
        .agg(F.count("*").alias("n"), dec_sum.alias("total_value"))
        .select(
            F.lit("cube").alias("variant"),
            F.coalesce("event_type", F.lit("ALL")).alias("key1"),
            F.coalesce("user_bucket", F.lit("ALL")).alias("key2"),
            "n",
            "total_value",
        )
    )
    ev.createOrReplaceTempView("_gs_events")
    gsets = spark.sql(
        """
        SELECT 'grouping_sets' AS variant,
               COALESCE(event_type, 'ALL') AS key1,
               COALESCE(CAST(CAST(ts AS DATE) AS STRING), 'ALL') AS key2,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
        """
    )

    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .count()
        .na.fill(0)
    )
    stack_expr = "stack({}, {}) AS (event_type, n)".format(
        len(_PIVOT_TYPES),
        ", ".join(f"'{v}', `{v}`" for v in _PIVOT_TYPES),
    )
    pivoted = wide.selectExpr("user_id", stack_expr).select(
        F.lit("pivot_unpivot").alias("variant"),
        F.col("user_id").cast("string").alias("key1"),
        F.col("event_type").alias("key2"),
        "n",
        F.lit(None).cast("double").alias("total_value"),
    )
    return (
        rolled.unionByName(cubed).unionByName(gsets).unionByName(pivoted)
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
    "b29_window_analytic_frames",
    """
    SELECT event_id, user_id, ts, value, event_type,
           LAG(value) OVER w AS prev_value,
           CAST(SUM(CAST(value AS DECIMAL(10,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_n,
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
def b29_window_analytic_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions + explicit frames (B29, whole family):
    lag / lead / first / last / running aggregates / sliding 3-row
    moving average per key — the 'previous value per key' CDC diff
    primitive plus every frame form. One window spec, several frames;
    all frames share the single sort-per-partition. Decimal running
    sums keep cumulative totals bit-exact."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    last3 = w.rowsBetween(-2, 0)
    dec_val = F.expr("CAST(value AS DECIMAL(10,2))")
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "event_type",
        F.lag("value").over(w).alias("prev_value"),
        F.sum(dec_val).over(run).cast("double").alias("running_value"),
        F.count("*").over(run).alias("running_n"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(full).alias("final_type"),
        (
            F.sum(dec_val).over(last3).cast("double") / F.count("*").over(last3)
        ).alias("avg_value_3"),
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
    "b32_set_ops",
    """
    WITH cd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS event_day
                FROM events WHERE event_type = 'click'),
         pd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS event_day
                FROM events WHERE event_type = 'purchase'),
         c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT 'except' AS tag, COUNT(*) AS n
    FROM (SELECT * FROM cd EXCEPT ALL SELECT * FROM pd)
    UNION ALL
    SELECT 'union' AS tag, COUNT(*) AS n
    FROM (SELECT * FROM c UNION SELECT * FROM p)
    UNION ALL
    SELECT 'intersect' AS tag, COUNT(*) AS n
    FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
    """,
)
def b32_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (B32), tagged: EXCEPT ALL ('events in the log but
    not in a topic sink' lag audit — (user, day) pairs that clicked but
    did not purchase), UNION, and INTERSECT (re-merging per-table views
    into the full log, the A11 ⊕ B32 invariant of SURVEY §5)."""
    ev = t(spark, sf_dir, "events").withColumn("event_day", F.col("ts").cast("date"))
    cd = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "event_day")
        .distinct()
    )
    pd_ = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "event_day")
        .distinct()
    )
    c = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    p = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    ex = cd.exceptAll(pd_).agg(F.count("*").alias("n")).select(
        F.lit("except").alias("tag"), "n"
    )
    un = c.union(p).distinct().agg(F.count("*").alias("n")).select(
        F.lit("union").alias("tag"), "n"
    )
    it = c.intersect(p).agg(F.count("*").alias("n")).select(
        F.lit("intersect").alias("tag"), "n"
    )
    return ex.union(un).union(it)
