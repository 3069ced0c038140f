"""Sketch aggregations: error-bounded against exact answers (engine-
specific sketch internals have no cross-engine oracle — VERDICT r1's
HLL note; the bound IS the correctness contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from timescale_cdc_spark.catalog import load_table
from timescale_cdc_spark.operators.sketches import (
    approx_distinct_by,
    approx_quantiles,
    frequent_items,
)


def test_hll_distinct_within_rsd(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r["o_orderpriority"]: r["approx_distinct"]
        for r in approx_distinct_by(
            orders, ["o_orderpriority"], "o_custkey", rsd=0.05
        ).collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.15 * n), (k, approx[k], n)


def test_gk_quantiles_within_rank_error(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    [q50, q90, q99] = approx_quantiles(
        li, "l_extendedprice", [0.5, 0.9, 0.99], accuracy=10000
    ).collect()[0]["quantiles"]
    n = li.count()
    vals = [r["l_extendedprice"] for r in
            li.select("l_extendedprice").orderBy("l_extendedprice").collect()]
    for got, p in [(q50, 0.5), (q90, 0.9), (q99, 0.99)]:
        lo = vals[max(0, int((p - 0.01) * n) - 1)]
        hi = vals[min(n - 1, int((p + 0.01) * n))]
        assert lo <= got <= hi, (p, got, lo, hi)


def test_frequent_items_contains_true_heavy_hitters(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # l_returnflag has 3 values, each way above 10% support
    out = frequent_items(li, ["l_returnflag"], support=0.1).collect()[0]
    found = set(out["l_returnflag_freqItems"])
    true_vals = {r["l_returnflag"] for r in
                 li.select("l_returnflag").distinct().collect()}
    assert true_vals <= found
