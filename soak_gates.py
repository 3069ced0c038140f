#!/usr/bin/env python3
"""Streaming ingest-gate soak (round 6): drive StreamingNearDedup and
StreamingVectorDedup through N batches and measure per-batch
wall-clock as the persisted index grows — the honest scaling question
for an ingest gate is not one batch's cost but the CURVE: the lookup
joins a linearly growing index, so per-batch time should grow gently
(scan-bound) until the index is bucketed/compacted, and compaction
should restore it.

Prints one JSON line: per-batch seconds for each gate, rejected
counts (planted cross-batch dups must all be caught), and the
post-compaction batch time.

Usage: python soak_gates.py [n_batches] [batch_docs] [batch_vecs]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

from timescale_cdc_spark.operators.ann_index import StreamingVectorDedup
from timescale_cdc_spark.operators.curation import StreamingNearDedup
from timescale_cdc_spark.session import get_spark


def synth_docs(spark, n: int, batch: int, dup_fraction: float = 0.01):
    """Batch of ~40-word docs; ``dup_fraction`` of them are exact
    copies of batch-0 docs (cross-batch dups once batch > 0)."""
    gid = F.col("id") + batch * n
    base = spark.range(n).select(
        gid.alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"w{w}_"),
                    F.pmod(F.xxhash64(gid, F.lit(w)), F.lit(5000)),
                )
                for w in range(40)
            ],
        ).alias("text"),
    )
    if batch == 0:
        return base
    n_dup = int(n * dup_fraction)
    originals = synth_docs(spark, n, 0).filter(F.col("doc_id") < n_dup)
    dups = originals.withColumn(
        "doc_id", F.col("doc_id") + batch * n + 900000
    )
    return base.filter(F.col("doc_id") % F.lit(n) >= n_dup).unionByName(dups)


def synth_vecs(spark, n: int, batch: int, dup_fraction: float = 0.01):
    gid = F.col("id") + batch * n
    comps = [
        (
            F.pmod(F.xxhash64(gid, F.lit(d)), F.lit(2_000_001))
            - 1_000_000
        )
        / 1_000_000.0
        for d in range(64)
    ]
    base = spark.range(n).select(
        gid.alias("vec_id"),
        F.array(*[c.cast("float") for c in comps]).alias("embedding"),
    )
    if batch == 0:
        return base
    n_dup = int(n * dup_fraction)
    originals = synth_vecs(spark, n, 0).filter(F.col("vec_id") < n_dup)
    dups = originals.withColumn(
        "vec_id", F.col("vec_id") + batch * n + 900000
    )
    return base.filter(F.col("vec_id") % F.lit(n) >= n_dup).unionByName(dups)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    batch_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    spark = get_spark(app_name="soak_gates")

    out: dict = {"n_batches": n_batches, "batch_docs": batch_docs,
                 "batch_vecs": batch_vecs}
    with tempfile.TemporaryDirectory() as d:
        text_gate = StreamingNearDedup(spark, f"{d}/text_idx")
        times, rejected = [], 0
        for b in range(n_batches):
            batch = synth_docs(spark, batch_docs, b)
            n_in = batch.count()
            t0 = time.time()
            n_out = text_gate.process_batch(batch, b).count()
            times.append(round(time.time() - t0, 2))
            rejected += n_in - n_out
        out["text_batch_sec"] = times
        out["text_rejected_total"] = rejected
        # expected: (n_batches-1) × 1% planted cross-batch dups
        out["text_rejected_expected_min"] = (n_batches - 1) * int(
            batch_docs * 0.01
        )
        text_gate.compact()
        batch = synth_docs(spark, batch_docs, n_batches)
        t0 = time.time()
        text_gate.process_batch(batch, n_batches).count()
        out["text_post_compact_sec"] = round(time.time() - t0, 2)

        vec_gate = StreamingVectorDedup(spark, f"{d}/vec_idx")
        vtimes, vrejected = [], 0
        for b in range(n_batches):
            batch = synth_vecs(spark, batch_vecs, b)
            n_in = batch.count()
            t0 = time.time()
            n_out = vec_gate.process_batch(batch, b).count()
            vtimes.append(round(time.time() - t0, 2))
            vrejected += n_in - n_out
        out["vec_batch_sec"] = vtimes
        out["vec_rejected_total"] = vrejected
        out["vec_rejected_expected_min"] = (n_batches - 1) * int(
            batch_vecs * 0.01
        )
        vec_gate.compact()
        batch = synth_vecs(spark, batch_vecs, n_batches)
        t0 = time.time()
        vec_gate.process_batch(batch, n_batches).count()
        out["vec_post_compact_sec"] = round(time.time() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
