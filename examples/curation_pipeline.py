#!/usr/bin/env python3
"""End-to-end training-data curation — the Tier C pipeline on the
driver's documents fixture, stage by stage with yield accounting:

  1. curate(): URL dedup (round 12 — normalized crawl-URL
     keep-lowest-id) → quality filter → eval-set decontamination
     (every 37th doc stands in as the "benchmark" corpus) →
     per-source cap (round 12 — 20 docs/source) → exact dedup →
     MinHash-LSH near-dedup (transitive component resolution) →
     token stats, with per-document drop_reason provenance
  2. assign_packs(): pack the survivors into fixed token-budget
     sequences (partition-local greedy — the pretraining batch shape)
  3. print the corpus datasheet: per-stage yields, pack fill rate

Run:  python3 examples/curation_pipeline.py [sf_dir]
      (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from timescale_cdc_spark.catalog import load_table
from timescale_cdc_spark.operators.curation import curate
from timescale_cdc_spark.operators.packing import assign_packs
from timescale_cdc_spark.session import get_spark

BUDGET = 1024


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="curation_pipeline", master="local[8]",
                      shuffle_partitions=8)
    all_docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).withColumn(
        # stand-in crawl URL (the fixture has none): unique per doc,
        # with tracking-param noise normalize_url strips
        "url",
        F.concat(
            F.lit("https://www."), F.col("source"),
            F.lit(".example/d/"), F.col("doc_id").cast("string"),
            F.lit("?utm_source=crawl"),
        ),
    )
    # every 37th doc plays the held-out benchmark; the rest is train
    eval_docs = all_docs.filter(F.col("doc_id") % 37 == 0)
    docs = all_docs.filter(F.col("doc_id") % 37 != 0)
    n0 = docs.count()

    curated = curate(
        docs, transitive=True, eval_docs=eval_docs, decontam_n=5,
        # round 12: the RefinedWeb opening + cap stages
        url_col="url", source_col="source", source_cap=20,
    ).cache()
    yields = {
        r["drop_reason"]: r["n"]
        for r in curated.groupBy("drop_reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kept = curated.filter(F.col("kept"))

    packed = assign_packs(
        kept.select("doc_id", "ws_tokens"),
        "ws_tokens", "doc_id", BUDGET, num_partitions=8,
    )
    packs = (
        packed.groupBy("pack_id").agg(F.sum("ws_tokens").alias("tok")).cache()
    )
    n_packs = packs.count()
    total_tok = packs.agg(F.sum("tok")).collect()[0][0] or 0

    print("=== corpus datasheet ===")
    print(f"input docs            {n0}")
    for reason in ("url_dup", "quality", "contaminated",
                   "source_capped", "exact_dup", "near_dup"):
        print(f"dropped: {reason:<13} {yields.get(reason, 0)}")
    print(f"kept                  {yields.get(None, 0)}")
    print(f"packs (budget {BUDGET})   {n_packs}")
    if n_packs:
        print(f"mean pack fill        {total_tok / (n_packs * BUDGET):.1%}")

    # Round 11: the export tail — materialize the actual training
    # sequences and write them in a deterministic global order as
    # balanced shards with a re-derivable manifest (the step the
    # trainer's loader reads; operators/sharding.py).
    import tempfile

    from timescale_cdc_spark.operators.packing import pack_sequences
    from timescale_cdc_spark.operators.sharding import write_shards

    seqs = pack_sequences(
        packed.join(docs, "doc_id"), "text", "doc_id",
        token_col="ws_tokens",
    )
    with tempfile.TemporaryDirectory() as d:
        manifest = write_shards(
            seqs, f"{d}/shards", ["pack_id"], n_shards=4, salt="demo"
        )
        print("=== shard export ===")
        for k in sorted(manifest["shards"]):
            s = manifest["shards"][k]
            print(
                f"shard {k}: {s['n_rows']} packs, "
                f"digest {s['digest'][:12]}…"
            )

    # Ingest-time complement of the batch pass above: the streaming
    # near-dup gate admits only documents that aren't near-copies of
    # anything previously admitted (persisted signature index; see
    # operators/curation.py::StreamingNearDedup).
    import tempfile

    from timescale_cdc_spark.operators.curation import StreamingNearDedup

    with tempfile.TemporaryDirectory() as d:
        gate = StreamingNearDedup(spark, f"{d}/sig_index")
        batch1 = docs.limit(50)
        # 50 re-crawled copies under NEW doc ids + 10 genuinely new
        # docs (same-ID re-ingest is idempotent by design — see the
        # class docstring; content dedup applies to new ids)
        batch2 = docs.limit(50).withColumn(
            "doc_id", F.col("doc_id") + 100000
        ).unionByName(
            docs.orderBy(F.desc("doc_id")).limit(10)
        )
        n1 = gate.process_batch(batch1, 0).count()
        n2 = gate.process_batch(batch2, 1).count()
        print("=== streaming ingest gate ===")
        print(f"batch 1 admitted      {n1}/50")
        print(f"batch 2 admitted      {n2}/60 (50 re-crawls rejected)")
    spark.stop()


if __name__ == "__main__":
    main()
