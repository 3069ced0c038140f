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

Round 7 adds the SEEDED mode (``--seeded``): pre-load each gate's
index with 100× the batch size, compact into the bucket-pruned base
layout, and measure what one batch's lookup actually OPENS — pruned
files/bytes vs the full base — asserting per-batch input is bounded
by the batch's touched partitions, not the corpus (VERDICT r6 #2
done-criterion).

Usage: python soak_gates.py [n_batches] [batch_docs] [batch_vecs]
       python soak_gates.py --seeded [seed_multiple] [batch_docs]
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


def _scan_stats(paths: list[str]) -> tuple[int, int]:
    import os

    n_bytes = sum(
        os.path.getsize(p.removeprefix("file:")) for p in paths
    )
    return len(paths), n_bytes


def seeded_main(seed_multiple: int, batch_docs: int) -> None:
    """For each seed size in {seed_multiple/10, seed_multiple}×batch:
    bulk-seed the index, compact (auto-scaled prefix_mod), then
    measure what ONE batch's lookup opens — pruned vs full base
    files/bytes. The scale claim under test: with mod ∝ corpus,
    per-batch pruned bytes stay ~FLAT as the index grows 10×, while
    the full-scan bytes grow 10×."""
    spark = get_spark(app_name="soak_gates_seeded")
    out: dict = {"mode": "seeded", "seed_multiple": seed_multiple,
                 "batch_docs": batch_docs, "text": {}, "vec": {}}

    def measure(gate, synth, mult: int) -> dict:
        """Two compaction cycles: bulk seed → compact (the observed
        bulk batches keep the layout COARSE — full scans stay cheap),
        then a few trigger-sized batches → compact again (median
        batch est drops, layout goes FINE, pruning kicks in). The
        probe measurement reads the adapted fine layout."""
        r: dict = {"seed_docs": mult * batch_docs}
        half = mult * batch_docs // 2
        t0 = time.time()
        gate.process_batch(synth(spark, half, 0), 0).count()
        gate.process_batch(synth(spark, half, 1), 1).count()
        r["seed_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        gate.compact()
        r["compact1_sec"] = round(time.time() - t0, 2)
        r["mod_after_bulk"] = gate._gen_meta(gate._gen_dirs()[0]).get(
            "prefix_mod"
        )
        for b in (2, 3, 4):  # steady-state batches re-train the estimate
            gate.process_batch(synth(spark, batch_docs, b), b).count()
        t0 = time.time()
        gate.compact()
        r["compact2_sec"] = round(time.time() - t0, 2)
        r["prefix_mod"] = gate._gen_meta(gate._gen_dirs()[0]).get(
            "prefix_mod"
        )
        batch = synth(spark, batch_docs, 5)
        sigs = gate._banded(batch).persist()
        r["pruned_files"], r["pruned_bytes"] = _scan_stats(
            gate._base_df(sigs).inputFiles()
        )
        r["full_files"], r["full_bytes"] = _scan_stats(
            gate._base_df().inputFiles()
        )
        sigs.unpersist()
        t0 = time.time()
        r["admitted"] = gate.process_batch(batch, 5).count()
        r["batch_sec"] = round(time.time() - t0, 2)
        assert r["pruned_bytes"] <= r["full_bytes"]
        return r

    with tempfile.TemporaryDirectory() as d:
        for mult in (max(1, seed_multiple // 10), seed_multiple):
            out["text"][f"x{mult}"] = measure(
                StreamingNearDedup(spark, f"{d}/text_idx_{mult}"),
                synth_docs, mult,
            )
            out["vec"][f"x{mult}"] = measure(
                StreamingVectorDedup(spark, f"{d}/vec_idx_{mult}"),
                synth_vecs, mult,
            )
    for fam in ("text", "vec"):
        small, big = list(out[fam].values())
        # full scan grows ~linearly with the corpus; the pruned scan
        # must grow far slower (flat once mod scales: ≤ ~2× across a
        # 10× corpus — band-key collisions add a little)
        out[f"{fam}_pruned_growth"] = round(
            big["pruned_bytes"] / max(1, small["pruned_bytes"]), 2
        )
        out[f"{fam}_full_growth"] = round(
            big["full_bytes"] / max(1, small["full_bytes"]), 2
        )
        assert out[f"{fam}_pruned_growth"] < out[f"{fam}_full_growth"] / 2, fam
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--seeded":
        seeded_main(
            int(sys.argv[2]) if len(sys.argv) > 2 else 100,
            int(sys.argv[3]) if len(sys.argv) > 3 else 2_000,
        )
        return
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

        # Takedown leg (round 15, VERDICT r14 #4): delete the batch-0
        # originals the planted dups copy, then probe with fresh
        # copies — copies of DELETED docs must be admitted, copies of
        # still-live docs must keep being rejected; a compact then
        # purges the tombstoned rows from the compacted base.
        n_dup = int(batch_docs * 0.01)
        t0 = time.time()
        assert text_gate.delete(list(range(n_dup))) == n_dup
        out["text_delete_sec"] = round(time.time() - t0, 2)
        probe = (
            synth_docs(spark, batch_docs, 0)
            .filter(F.col("doc_id") < 2 * n_dup)
            .withColumn("doc_id", F.col("doc_id") + 5_000_000)
        )
        t0 = time.time()
        admitted = {
            r.doc_id - 5_000_000
            for r in text_gate.process_batch(
                probe, n_batches + 1
            ).collect()
        }
        out["text_takedown_batch_sec"] = round(time.time() - t0, 2)
        assert admitted == set(range(n_dup)), sorted(admitted)[:20]
        t0 = time.time()
        text_gate.compact()
        out["text_takedown_compact_sec"] = round(time.time() - t0, 2)
        import os as _os

        assert not _os.path.isdir(f"{d}/text_idx/tombstones")

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

        # Takedown leg — the vector gate inherits the same
        # BandedIndexStore.delete; identical assertions
        n_vdup = int(batch_vecs * 0.01)
        t0 = time.time()
        assert vec_gate.delete(list(range(n_vdup))) == n_vdup
        out["vec_delete_sec"] = round(time.time() - t0, 2)
        vprobe = (
            synth_vecs(spark, batch_vecs, 0)
            .filter(F.col("vec_id") < 2 * n_vdup)
            .withColumn("vec_id", F.col("vec_id") + 5_000_000)
        )
        t0 = time.time()
        vadmitted = {
            r.vec_id - 5_000_000
            for r in vec_gate.process_batch(
                vprobe, n_batches + 1
            ).collect()
        }
        out["vec_takedown_batch_sec"] = round(time.time() - t0, 2)
        assert vadmitted == set(range(n_vdup)), sorted(vadmitted)[:20]
        t0 = time.time()
        vec_gate.compact()
        out["vec_takedown_compact_sec"] = round(time.time() - t0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
