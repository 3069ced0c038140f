"""Bucketed co-located join (SURVEY 'Partitioning & shuffle':
bucketing for shuffle-free joins): saving both sides bucketed on the
join key lets Catalyst plan a sort-merge join with NO Exchange — the
layout strategy for repeated 100 TB fact⋈fact joins."""

from __future__ import annotations

import pytest

from timescale_cdc_spark.catalog import load_table
from timescale_cdc_spark.plans.inspect import formatted_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse.dir is a static conf — tables land in the default
    # ./spark-warehouse (gitignored) and are dropped after.
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    (
        od.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("bktest.orders_b")
    )
    (
        cu.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("bktest.customer_b")
    )
    yield "bktest.orders_b", "bktest.customer_b"
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_b, customer_b = bucketed_tables
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = spark.table(orders_b).join(
            spark.table(customer_b),
            spark.table(orders_b).o_custkey == spark.table(customer_b).c_custkey,
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
