#!/usr/bin/env python3
"""Composed-curation soak (VERDICT r6 #7): run the FULL
curate(transitive=True) → connected-components → sequence-packing
flow at the 101k-doc hot-cluster scale the standalone soaks use —
pinning the interaction between the pieces, not each piece alone.

Corpus: n_normal unique docs, 1% of them with a planted near-copy
(chained a~b~c triples every 1000 ids so transitive resolution has
real work), plus one n_hot identical hot cluster (the skew case the
LSH bucket cap exists for).

Invariants checked in-run:
- the hot cluster keeps EXACTLY its minimum id (CC canonical);
- every planted chain keeps only its minimum (transitive semantics —
  the single-pass star approximation would keep 2 of 3 on chains
  where the middle doc bridges the ends);
- pack budgets hold exactly (assign_packs_exact) over survivors.

Prints one JSON line with stage wall-times and counts for SCALE.md.

Usage: python soak_curate.py [n_normal] [n_hot]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from timescale_cdc_spark.operators.curation import curate, curation_report
from timescale_cdc_spark.operators.packing import assign_packs_exact
from timescale_cdc_spark.session import get_spark


def synth_corpus(spark, n_normal: int, n_hot: int):
    """Deterministic ~40-word docs. Every 1000th id i spawns a chain:
    i ~ i+offset (one word changed) ~ i+2*offset (two words changed) —
    i and i+offset pair, i+offset and i+2*offset pair, but i and
    i+2*offset may not (the transitive case). Ids >= hot_base are one
    identical cluster."""
    words = [
        F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(k)), F.lit(5000)).cast(
                "string"
            ),
        )
        for k in range(40)
    ]
    base = spark.range(n_normal).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    chain_roots = base.filter(F.col("doc_id") % 1000 == 0)
    mid = chain_roots.select(
        (F.col("doc_id") + n_normal).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailone")).alias("text"),
    )
    end = chain_roots.select(
        (F.col("doc_id") + 2 * n_normal).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailone tailtwo tailthree")).alias(
            "text"
        ),
    )
    hot_base = 10_000_000
    hot_text = "identical hot cluster document body " + " ".join(
        f"hot{k}" for k in range(34)
    )
    hot = spark.range(n_hot).select(
        (F.col("id") + hot_base).alias("doc_id"), F.lit(hot_text).alias("text")
    )
    return base.unionByName(mid).unionByName(end).unionByName(hot), hot_base


def main() -> None:
    n_normal = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark(app_name="soak_curate")
    docs, hot_base = synth_corpus(spark, n_normal, n_hot)
    docs = docs.localCheckpoint(eager=True)
    n_docs = docs.count()

    out: dict = {"n_docs": n_docs, "n_normal": n_normal, "n_hot": n_hot}

    t0 = time.time()
    curated = curate(
        docs,
        min_quality=0.0,
        min_tokens=5,
        near_dup_threshold=0.5,
        near_dup_max_bucket=256,
        transitive=True,
    ).localCheckpoint(eager=True)
    out["curate_transitive_sec"] = round(time.time() - t0, 2)

    report = {
        (r["kept"], r["drop_reason"]): r["n_docs"]
        for r in curation_report(curated).collect()
    }
    out["kept"] = report.get((True, None), 0)
    out["dropped_exact"] = report.get((False, "exact_dup"), 0)
    out["dropped_near"] = report.get((False, "near_dup"), 0)

    # invariant 1: hot cluster → exactly its minimum id survives
    # (identical docs collapse via exact dedup; CC would catch any
    # near-variants)
    hot_kept = [
        r.doc_id
        for r in curated.filter(
            (F.col("doc_id") >= hot_base) & F.col("kept")
        ).collect()
    ]
    assert hot_kept == [hot_base], hot_kept[:5]

    # invariant 2: every planted chain keeps ONLY its root (CC
    # minimum). Chain members: root r, r+n_normal, r+2n_normal.
    chain_kept = (
        curated.filter(F.col("kept") & (F.col("doc_id") < 3 * n_normal))
        .select(F.pmod("doc_id", F.lit(n_normal)).alias("r"),
                F.col("doc_id"))
        .filter(F.col("r") % 1000 == 0)
        .groupBy("r")
        .agg(F.collect_list("doc_id").alias("kept_ids"))
        .collect()
    )
    n_chains = n_normal // 1000
    bad = [r for r in chain_kept if sorted(r["kept_ids"]) != [r["r"]]]
    out["chains_total"] = n_chains
    out["chains_resolved_to_root"] = n_chains - len(bad)
    # MinHash misses a borderline pair occasionally; require >= 95%
    # of chains fully collapsed and NONE keeping all three members
    assert len(bad) <= n_chains * 0.05, bad[:5]
    assert not [r for r in bad if len(r["kept_ids"]) >= 3], bad[:5]

    # pack survivors under a strict budget
    t0 = time.time()
    packed = assign_packs_exact(
        curated.filter(F.col("kept")).select("doc_id", "ws_tokens"),
        "ws_tokens", "doc_id", budget=2048,
    ).localCheckpoint(eager=True)
    out["pack_exact_sec"] = round(time.time() - t0, 2)
    pack_stats = packed.groupBy("pack_seq").agg(
        F.sum("ws_tokens").alias("tok")
    )
    out["n_packs"] = pack_stats.count()
    max_tok = pack_stats.agg(F.max("tok")).collect()[0][0]
    out["max_pack_tokens"] = max_tok
    assert max_tok <= 2048  # invariant 3: strict budget holds
    out["pack_fill_avg"] = round(
        pack_stats.agg(F.avg("tok")).collect()[0][0] / 2048, 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
