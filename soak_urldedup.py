#!/usr/bin/env python3
"""Adversarial-skew soak for dedup_by_key / normalize_url /
reservoir_per_group (round 13, VERDICT r12 #4).

The url-dedup and source-cap stages are plan-pinned at fixture scale,
but a crawl's REAL key distribution is skewed in three specific ways
this soak plants simultaneously in one 2M-doc corpus:

  (a) 90% of rows have NO usable URL (NULL / blank / whitespace /
      scheme-only) — the regime where a naive key-window funnels 1.8M
      rows into one NULL partition;
  (b) ONE url with 100k duplicates (tracking-param re-crawl variants
      that all normalize to the same key) — the hot-key regime;
  (c) ONE source holding 50% of the corpus — the regime where the
      per-source cap's window sends 1M rows at one task unless the
      WindowGroupLimit pushdown bounds it.

Checks, all on EXECUTED plans (not plan text):

  1. EXACT-survivor equality for dedup_by_key: the survivor id set is
     re-derived through an independent groupBy(min(id)) plan (agg,
     not window) plus the NULL-key passthrough; exceptAll in both
     directions must be empty.
  2. EXACT-survivor characterization for reservoir_per_group: per
     source, |kept| == least(|group|, k), kept ⊆ group, and
     max(kept (hash, id)) < min(dropped (hash, id)) — which uniquely
     identifies the k-smallest set — plus a second run returning the
     identical id set (determinism).
  3. NO-HOT-TASK: per-task shuffle-read record counts of the window
     stage, read from the Spark UI REST API (taskSummary quantiles):
     - dedup: max task <= 2x median — the NULL spread plus the
       rank-1 WindowGroupLimit (the 100k-dup URL forwards <=
       |upstream partitions| candidates, not 100k) keep the stage
       flat; a broken spread puts 1.8M rows in one task (~30x).
     - srccap: max task <= max(3x median, upstream_parts * k + 2x
       median) — the megasource's input is bounded by the pushdown
       (parts x k candidates), never by its 1M group size — and
       total stage records <= 1.2x the post-pushdown expectation
       (without the pushdown the stage reads all 2M).

Prints one JSON line for SCALE.md.

Usage: python soak_urldedup.py [n_rows] [cap_k]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timescale_cdc_spark.operators.dedup import (  # noqa: E402
    dedup_by_key,
    normalize_url,
)
from timescale_cdc_spark.operators.sampling import (  # noqa: E402
    det_hash,
    reservoir_per_group,
)
from timescale_cdc_spark.session import get_spark  # noqa: E402


def build_corpus(spark: SparkSession, n: int) -> DataFrame:
    """2M-row corpus with the three skew regimes planted."""
    blank = (
        F.when(F.col("id") % 4 == 0, F.lit(None).cast("string"))
        .when(F.col("id") % 4 == 1, F.lit(""))
        .when(F.col("id") % 4 == 2, F.lit("   "))
        .otherwise(F.lit("https://"))  # scheme-only -> '' -> NULL key
    )
    hot = F.concat(
        F.lit("https://HotSite.com/Promo?utm_campaign=c"),
        (F.col("id") % 977).cast("string"),
    )  # 100k re-crawl variants, ONE normalized key
    cold = F.concat(
        F.lit("https://example.com/page/"), F.col("id").cast("string")
    )
    url = (
        F.when(F.col("id") % 10 != 9, blank)  # (a) 90% no usable URL
        .when(F.col("id") % 20 == 19, hot)  # (b) one 100k-dup URL
        .otherwise(cold)  # 5% distinct URLs
    )
    source = F.when(F.col("id") < n // 2, F.lit("megasource")).otherwise(
        F.concat(F.lit("s"), (F.col("id") % 997).cast("string"))
    )  # (c) one source = 50% of the corpus
    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("id"),
            url.alias("url"),
            source.alias("source"),
        )
    )


# -- Spark UI REST helpers ---------------------------------------------------


def _rest(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def _completed_stage_ids(spark: SparkSession) -> set[int]:
    return {
        s["stageId"]
        for s in _rest(spark, "/stages?status=complete")
    }


def window_stage_stats(
    spark: SparkSession, before: set[int]
) -> dict:
    """Of the stages completed since ``before``, pick the one with the
    largest shuffle-read record count (the key-window stage) and
    return its per-task read-record quantiles + total."""
    stages = [
        s
        for s in _rest(spark, "/stages?status=complete")
        if s["stageId"] not in before
    ]
    target = max(stages, key=lambda s: s.get("shuffleReadRecords", 0))
    summary = _rest(
        spark,
        f"/stages/{target['stageId']}/{target['attemptId']}/taskSummary"
        "?quantiles=0.0,0.5,1.0",
    )
    recs = summary["shuffleReadMetrics"]["readRecords"]
    return {
        "stage_id": target["stageId"],
        "total_records": target.get("shuffleReadRecords", 0),
        "min_task": recs[0],
        "median_task": recs[1],
        "max_task": recs[2],
        "n_tasks": target.get("numCompleteTasks"),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cap_k = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark(
        app_name="soak_urldedup",
        extra_conf={"spark.ui.enabled": "true"},  # REST task metrics
    )
    parts = spark.sparkContext.defaultParallelism
    docs = build_corpus(spark, n).localCheckpoint()
    n_hot = docs.filter(
        (F.col("id") % 10 == 9) & (F.col("id") % 20 == 19)
    ).count()

    # ---- 1. dedup_by_key: exact survivors + no hot task -------------------
    before = _completed_stage_ids(spark)
    t0 = time.perf_counter()
    kept = dedup_by_key(docs, normalize_url("url"), "id").select("id")
    kept_n = kept.count()
    t_dedup = time.perf_counter() - t0
    dd_stats = window_stage_stats(spark, before)

    keyed = docs.withColumn("k", normalize_url("url"))
    expected = (
        keyed.filter(F.col("k").isNull())
        .select("id")
        .unionByName(
            keyed.filter(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.min("id").alias("id"))
            .select("id")
        )
    )
    exp_n = expected.count()
    assert kept_n == exp_n, (kept_n, exp_n)
    assert kept.exceptAll(expected).count() == 0
    assert expected.exceptAll(kept).count() == 0
    # regime arithmetic: 90% null-key + 1 hot survivor + all distinct
    assert kept_n == (n - n // 10) + 1 + (n // 10 - n_hot), kept_n
    # no-hot-task: NULL spread + rank-1 pushdown keep the stage flat
    assert dd_stats["max_task"] <= 2 * max(dd_stats["median_task"], 1), (
        dd_stats
    )

    # ---- 2. reservoir_per_group: exact k-smallest + bounded hot task ------
    before = _completed_stage_ids(spark)
    t0 = time.perf_counter()
    capped = reservoir_per_group(
        docs, ["source"], cap_k, on=["id"], salt="soak"
    )
    cap_n = capped.count()
    t_cap = time.perf_counter() - t0
    sc_stats = window_stage_stats(spark, before)

    sizes = docs.groupBy("source").agg(F.count("*").alias("n_grp"))
    kept_sizes = capped.groupBy("source").agg(F.count("*").alias("n_kept"))
    bad_counts = (
        sizes.join(kept_sizes, "source", "left")
        .withColumn(
            "want", F.least(F.col("n_grp"), F.lit(cap_k))
        )
        .filter(F.coalesce(F.col("n_kept"), F.lit(0)) != F.col("want"))
        .count()
    )
    assert bad_counts == 0
    # k-smallest characterization: per source, every kept (hash, id)
    # precedes every dropped (hash, id)
    h = det_hash(["id"], "soak")
    marked = docs.join(
        capped.select("id", F.lit(True).alias("_kept")), "id", "left"
    ).select(
        "source",
        h.alias("_h"),
        "id",
        F.coalesce(F.col("_kept"), F.lit(False)).alias("_kept"),
    )
    border = marked.groupBy("source").agg(
        F.max(F.when(F.col("_kept"), F.struct("_h", "id"))).alias("hi_kept"),
        F.min(F.when(~F.col("_kept"), F.struct("_h", "id"))).alias(
            "lo_dropped"
        ),
    )
    overlaps = border.filter(
        F.col("lo_dropped").isNotNull()
        & (F.col("hi_kept") >= F.col("lo_dropped"))
    ).count()
    assert overlaps == 0
    # determinism: a second run returns the identical id set — BOTH
    # exceptAll directions (one direction only proves a subset; a
    # run-2 that nondeterministically LOST rows would pass it)
    again = reservoir_per_group(docs, ["source"], cap_k, on=["id"],
                                salt="soak").select("id")
    assert again.exceptAll(capped.select("id")).count() == 0
    assert capped.select("id").exceptAll(again).count() == 0
    # hot-task bound: megasource's task input is bounded by the
    # pushdown (parts x k candidates), never by its 1M group size
    med = max(sc_stats["median_task"], 1)
    bound = max(3 * med, parts * cap_k + 2 * med)
    assert sc_stats["max_task"] <= bound, (sc_stats, bound)
    # ...and the pushdown actually shed the megasource bulk
    post_pushdown = (n - n // 2) + parts * cap_k  # smalls + mega cands
    assert sc_stats["total_records"] <= 1.2 * post_pushdown, (
        sc_stats,
        post_pushdown,
    )

    print(
        json.dumps(
            {
                "soak": "urldedup_srccap_skew",
                "n_rows": n,
                "cap_k": cap_k,
                "no_url_rows": n - n // 10,
                "hot_url_dups": n_hot,
                "dedup_survivors": kept_n,
                "dedup_s": round(t_dedup, 2),
                "dedup_window_stage": dd_stats,
                "srccap_survivors": cap_n,
                "srccap_s": round(t_cap, 2),
                "srccap_window_stage": sc_stats,
                "parts": parts,
            }
        )
    )


if __name__ == "__main__":
    main()
