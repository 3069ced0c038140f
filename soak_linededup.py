#!/usr/bin/env python3
"""Adversarial-skew soak for dedupe_lines (round 14) — the CCNet
line/paragraph-level dedup at crawl-shaped skew.

The operator is plan-pinned (WindowGroupLimit) and unit-tested at
fixture scale; a real crawl's line distribution is skewed the way a
boilerplate banner is: ONE normalized line occurring in a huge
fraction of documents. This soak plants, in one 2M-doc corpus
(4 lines/doc, 8M lines):

  (a) one newsletter banner in 50% of docs, PLUS a case/whitespace
      variant of the same banner in a further 10% — 1.2M occurrences
      of one normalized line (the hot-key regime for the keep-first
      shuffle, and the normalization-collision check at scale);
  (b) 1000 per-site copyright footers, each shared by ~2000 docs
      (the mid-frequency regime);
  (c) ~4.8M unique lines (the long tail).

Checks, all on EXECUTED plans:

  1. EXACT-survivor equality: the (doc_id, line) multiset of the
     operator's reassembled output must equal an INDEPENDENT
     derivation (explode → groupBy(sha2(norm)) → min(struct(id,pos))
     — agg, not window), exceptAll in both directions.
  2. Survivor arithmetic: unique lines all kept + 1 banner + 1000
     footers.
  3. NO-HOT-TASK: per-task shuffle-read records of the largest
     shuffle stage (the keep-first window), from the Spark UI REST
     API: max task <= 2x median. The 1.2M-occurrence banner forwards
     <= |upstream partitions| candidates through the WindowGroupLimit
     pushdown — a regression to a full window funnels 1.2M rows into
     one task (~hundreds x median).

Prints one JSON line for SCALE.md.

Usage: python soak_linededup.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from soak_urldedup import (  # noqa: E402
    _completed_stage_ids,
    window_stage_stats,
)
from timescale_cdc_spark.operators.dedup import (  # noqa: E402
    dedupe_lines,
    normalize_line,
)
from timescale_cdc_spark.session import get_spark  # noqa: E402

BANNER = "Subscribe to our newsletter"
BANNER_VARIANT = "  SUBSCRIBE   to our NEWSLETTER "  # same normalized


def build_corpus(spark, n):
    i = F.col("id")
    line_a = F.concat(F.lit("alpha doc "), i.cast("string"), F.lit(" body"))
    line_b = F.when(i % 2 == 0, F.lit(BANNER)).otherwise(
        F.concat(F.lit("beta doc "), i.cast("string"), F.lit(" misc"))
    )
    line_c = F.concat(
        F.lit("copyright site"),
        (i % 1000).cast("string"),
        F.lit(" all rights reserved"),
    )
    line_d = F.when(i % 10 == 3, F.lit(BANNER_VARIANT)).otherwise(
        F.concat(F.lit("delta doc "), i.cast("string"), F.lit(" tail"))
    )
    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            i.alias("doc_id"),
            F.concat_ws("\n", line_a, line_b, line_c, line_d).alias(
                "text"
            ),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(
        app_name="soak_linededup",
        extra_conf={"spark.ui.enabled": "true"},  # REST task metrics
    )
    docs = build_corpus(spark, n).localCheckpoint()

    before = _completed_stage_ids(spark)
    t0 = time.perf_counter()
    out = dedupe_lines(docs, "text", "doc_id").localCheckpoint()
    n_docs_kept = out.count()
    t_dedup = time.perf_counter() - t0
    stats = window_stage_stats(spark, before)

    # 1. exact survivors vs an independent agg-plan derivation
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split("text", "\n")).alias("pos", "line"),
    ).withColumn("_h", F.sha2(normalize_line(F.col("line")), 256))
    expected = (
        lines.groupBy("_h")
        .agg(F.min(F.struct("doc_id", "pos")).alias("w"))
        .select(F.col("w.doc_id").alias("doc_id"), F.col("w.pos").alias("pos"))
        .join(lines, ["doc_id", "pos"])
        .select("doc_id", "line")
    )
    got = out.select(
        "doc_id",
        F.explode(F.split("text", "\n")).alias("line"),
    )
    n_exp, n_got = expected.count(), got.count()
    assert n_exp == n_got, (n_exp, n_got)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0

    # 2. survivor arithmetic: every unique line + 1 banner + 1000 footers
    n_mod3 = (n + 6) // 10  # |{i in [0,n): i % 10 == 3}|
    n_banner_docs = n // 2 + n_mod3  # id%2==0 plus the id%10==3 variant
    want = n + (n - n // 2) + (n - n_mod3) + 1 + 1000
    # (alpha uniques) + (beta uniques: odd ids) + (delta uniques:
    # id%10!=3) + the banner + the footers
    assert n_got == want, (n_got, want, n_banner_docs)

    # 3. no-hot-task on the biggest shuffle stage (keep-first window)
    assert stats["max_task"] <= 2 * max(stats["median_task"], 1), stats

    print(
        json.dumps(
            {
                "soak": "linededup_hot_banner",
                "n_docs": n,
                "n_lines": 4 * n,
                "banner_occurrences": n_banner_docs,
                "docs_kept": n_docs_kept,
                "lines_kept": n_got,
                "dedup_s": round(t_dedup, 2),
                "window_stage": stats,
            }
        )
    )


if __name__ == "__main__":
    main()
